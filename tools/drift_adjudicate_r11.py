"""Same-session adjudication of the r10 bench drift (VERDICT r10 task 6).

BENCH_r09 -> BENCH_r10 showed dedup_embedding_lsh +31%, q7 +34%, scd2 +36%
on UNTOUCHED code. Bench absolutes are machine-state dependent (see
MEMORY: the multimodal codecs measured 0.04-0.12 s in one driver round vs
~0.5 s locally at the SAME commit), so the only valid comparison is both
commits timed back-to-back on the same host state. This tool runs the
three drifted queries from a scratch worktree pinned at the r10-start
commit AND from the current HEAD, interleaved A/B/A/B, and prints both
medians — if the two commits time the same, the drift was host state, not
a plan regression.

Usage: python tools/drift_adjudicate_r11.py <r10_commit> [query ...]
       (runs each tree in its own subprocess so imports can't mix)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

QUERIES = ["dedup_embedding_lsh", "q7_avg_diversity_per_hour", "scd2_priority_history"]
SF_DIR = "/root/testdata/sf0.1"

_CHILD = r"""
import json, sys, time
sys.path.insert(0, sys.argv[1])
from music_streaming_services_etl_pipeline_with_airflow_spark.session import get_spark
from music_streaming_services_etl_pipeline_with_airflow_spark.plans.registry import all_specs

names = sys.argv[3].split(",")
spark = get_spark("drift")
spark.sparkContext.setLogLevel("ERROR")
specs = all_specs()
# warmup
for n in names:
    specs[n].fn(spark, sys.argv[2]).write.format("noop").mode("overwrite").save()
out = {}
for n in names:
    walls = []
    for _ in range(3):
        df = specs[n].fn(spark, sys.argv[2])
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        walls.append(time.time() - t0)
    out[n] = sorted(walls)[1]
print("RESULT " + json.dumps(out))
"""


def run_tree(tree: str, queries: list[str]) -> dict[str, float]:
    with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as fh:
        fh.write(_CHILD)
        path = fh.name
    try:
        res = subprocess.run(
            [sys.executable, path, tree, SF_DIR, ",".join(queries)],
            capture_output=True,
            text=True,
            timeout=1200,
        )
        for line in res.stdout.splitlines():
            if line.startswith("RESULT "):
                return json.loads(line[len("RESULT "):])
        raise RuntimeError(f"no RESULT line from {tree}:\n{res.stdout[-2000:]}\n{res.stderr[-2000:]}")
    finally:
        os.unlink(path)


def main() -> None:
    commit = sys.argv[1]
    queries = sys.argv[2:] or QUERIES
    head_tree = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    old_tree = tempfile.mkdtemp(prefix="drift_r10_")
    subprocess.run(
        ["git", "worktree", "add", "--detach", old_tree, commit],
        cwd=head_tree,
        check=True,
        capture_output=True,
    )
    try:
        # A/B/A/B: two passes per tree so a host-noise burst cannot brand
        # one tree; report per-tree min-of-medians
        acc: dict[str, dict[str, list[float]]] = {"old": {}, "head": {}}
        for _ in range(2):
            for label, tree in (("old", old_tree), ("head", head_tree)):
                got = run_tree(tree, queries)
                for q, v in got.items():
                    acc[label].setdefault(q, []).append(v)
        print(f"{'query':<32} {commit[:9]:>10} {'HEAD':>10} ratio")
        for q in queries:
            a = min(acc["old"][q])
            b = min(acc["head"][q])
            print(f"{q:<32} {a:>9.2f}s {b:>9.2f}s {b / a:>5.2f}x")
    finally:
        subprocess.run(
            ["git", "worktree", "remove", "--force", old_tree],
            cwd=head_tree,
            capture_output=True,
        )


if __name__ == "__main__":
    main()
