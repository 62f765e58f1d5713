"""Compute the driver-head rotation for plans/registry._PRIORITY.

The driver's per-round CORRECTNESS budget re-verifies exactly the FIRST 50
registry entries, so each round the head must be: this round's new/changed
queries first (they have no green row for their current behavior), then the
stalest oracle-green queries (oldest latest-driver-row first, name as the
tie-break). Rounds 1-10 maintained that rotation by hand in a ~90-line
budget comment — the most fragile link in the verification pipeline. This
tool computes it from the CORRECTNESS_r*.json history instead, and
tests/test_registry_head.py pins _PRIORITY to its output, so a stale or
phantom head fails pytest instead of silently burning driver slots.

History rows from rounds >= registry.HEAD_ROUND are ignored: the head for
round N is a function of what was known when round N STARTED (rounds < N),
so the pin keeps passing after the round-N driver writes its own
CORRECTNESS file; bumping HEAD_ROUND at the start of round N+1 is what
forces the next rotation.

Usage: python tools/next_head.py            # print the head + a diff vs _PRIORITY
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

SLOTS = 50
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def latest_rounds(repo_root: str = _REPO, before_round: int | None = None) -> dict[str, int]:
    """query name -> latest driver round with a row for it, considering
    only CORRECTNESS_r{N}.json with N < before_round (all files if None)."""
    hist: dict[str, int] = {}
    for p in sorted(glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json"))):
        # fullmatch on the basename: a stray CORRECTNESS_r11_backup.json
        # matches the glob but is not a driver round file — skip it
        # instead of crashing every pytest run on .group(1) of None
        m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", os.path.basename(p))
        if m is None:
            continue
        rnd = int(m.group(1))
        if before_round is not None and rnd >= before_round:
            continue
        with open(p) as fh:
            rows = json.load(fh)
        for name in rows:
            hist[name] = max(hist.get(name, 0), rnd)
    return hist


def compute_head(
    new_or_changed: tuple[str, ...],
    hist: dict[str, int],
    oracle_backed: set[str],
    slots: int = SLOTS,
) -> tuple[str, ...]:
    """new/changed first (declared order, deduped), then stalest-first.

    Staleness key is (latest driver round, name): a query never driver-
    checked sorts as round 0, ahead of everything; names break ties so the
    head is deterministic. Every entry must be a registered oracle-backed
    query — a typo fails loudly here, not in the driver."""
    head = list(dict.fromkeys(new_or_changed))
    for q in head:
        if q not in oracle_backed:
            raise ValueError(f"new/changed entry is not a registered oracle-backed query: {q}")
    seen = set(head)
    rest = sorted(
        (q for q in oracle_backed if q not in seen),
        key=lambda q: (hist.get(q, 0), q),
    )
    return tuple(head + rest[: max(0, slots - len(head))])


def main() -> int:
    sys.path.insert(0, _REPO)
    from music_streaming_services_etl_pipeline_with_airflow_spark.plans import registry

    specs = registry.all_specs()
    oracle_backed = {n for n, s in specs.items() if s.oracle is not None}
    hist = latest_rounds(before_round=registry.HEAD_ROUND)
    head = compute_head(registry.ROUND_NEW_OR_CHANGED, hist, oracle_backed)
    print(f"# head for round {registry.HEAD_ROUND} "
          f"({len(registry.ROUND_NEW_OR_CHANGED)} new/changed + stalest)")
    for q in head:
        r = hist.get(q, 0)
        tag = "new/changed" if q in registry.ROUND_NEW_OR_CHANGED else f"last row r{r}"
        print(f'    "{q}",  # {tag}')
    cur = registry._PRIORITY
    if tuple(cur) == head:
        print("# _PRIORITY matches.")
        return 0
    print("# _PRIORITY DIFFERS:")
    for i, (a, b) in enumerate(zip(cur, head)):
        if a != b:
            print(f"#   slot {i}: _PRIORITY={a!r} computed={b!r}")
    if len(cur) != len(head):
        print(f"#   length: _PRIORITY={len(cur)} computed={len(head)}")
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
