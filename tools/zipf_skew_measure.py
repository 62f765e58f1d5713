"""Zipf-skew replicas: measure the ops whose scale claims depend on KEY
DISTRIBUTION, not just volume (VERDICT r8 item 8). The fresh-growth tools
scale bytes but keep keys uniform — "hash-parallel on a cluster" is only
proven against the skew that actually breaks it:

- S1 kcore-hub: power-law edge list (one endpoint Zipf-ranked) so the hub
  vertex's DEGREE grows with the graph. This is exactly the shape the r8
  collect_list H-index would OOM on (one row holding an O(degree) array);
  the r9 counting form keeps per-row state O(1) and per-node window
  partitions O(distinct core values). 10x edges => ~10x hub degree; wall
  should stay ~linear in edges.
- S2 bm25-zipf-df: documents whose tokens are Zipf draws from a vocab, so
  the top term's df grows ~linearly with the corpus (hot-reducer hazard in
  the (term) df aggregate and the query-term candidate join). The tf/df
  aggregates are map-side combined, so the hot term's partials collapse
  per-partition before the shuffle.
- S3 er-zipf-blocks: customer accounts drawn so blocking keys (acct div
  10) are Zipf — a hot block of B mentions makes the within-block pair
  join emit O(B^2) candidates. That cost is INHERENT to blocking ER (the
  honest fix at 100 TB is a block-size cap / secondary blocking key, not
  a Spark trick); this measures it so the SCALING row documents the real
  exponent instead of a uniform-key fiction.

Each scenario runs at 1x and 10x, best-of-2 after a warmup run, noop sink.
Usage: python tools/zipf_skew_measure.py [s1|s2|s3 ...]  (default: all)
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from music_streaming_services_etl_pipeline_with_airflow_spark.session import get_spark

ROOT = "/tmp/spark_engine_zipf_skew"
ZIPF_A = 1.3  # shape: heavy enough that rank-1 takes ~25% of the mass
SEED = 20260815


def timed(df) -> float:
    best = None
    for _ in range(2):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        best = dt if best is None or dt < best else best
    return round(best, 2)


def zipf_ranks(rng, size: int, n_ranks: int) -> np.ndarray:
    """Zipf(a) draws truncated to [1, n_ranks] (rejection-free: resample
    the tail mass uniformly into the head — fine for a load generator)."""
    z = rng.zipf(ZIPF_A, size=size)
    over = z > n_ranks
    z[over] = rng.integers(1, n_ranks + 1, size=int(over.sum()))
    return z


def s1_kcore(spark, scale: int) -> None:
    from pyspark.sql import functions as F

    from music_streaming_services_etl_pipeline_with_airflow_spark.operators.components import kcore

    rng = np.random.default_rng(SEED)
    m = 150_000 * scale
    n = 20_000 * scale
    u = rng.integers(0, n, size=m)
    v = zipf_ranks(rng, m, n) - 1  # node 0 is the hub
    pa, pb = np.minimum(u, v), np.maximum(u, v)
    keep = pa != pb
    import pandas as pd

    edges = (
        spark.createDataFrame(
            pd.DataFrame({"pa": pa[keep], "pb": pb[keep]})
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    sym = edges.union(edges.select("pb", "pa"))
    hub = (
        sym.groupBy("pa").count().agg(F.max("count")).first()[0]
    )
    # kcore() iterates with eager localCheckpoints, so the work happens at
    # CALL time — time the whole call, not a lazy write of its result
    best = None
    for _ in range(2):
        t0 = time.time()
        kcore(edges).write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        best = dt if best is None or dt < best else best
    t = round(best, 2)
    print(
        f"RESULT s1_kcore scale={scale} edges={edges.count()} "
        f"max_degree={hub} wall={t}s"
    )


def s2_bm25(spark, scale: int) -> None:
    from music_streaming_services_etl_pipeline_with_airflow_spark.plans.registry import all_specs

    rng = np.random.default_rng(SEED)
    n_docs = 6_000 * scale
    vocab = 30_000
    doc_len = 40
    toks = zipf_ranks(rng, n_docs * doc_len, vocab).reshape(n_docs, doc_len)
    import pandas as pd

    texts = [" ".join(f"t{r}" for r in row) for row in toks]
    d = f"{ROOT}/bm25_x{scale}"
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d)
    pdf = pd.DataFrame(
        {
            "doc_id": np.arange(n_docs, dtype=np.int64),
            "text": texts,
            "lang": "en",
            "source": "zipf",
        }
    )
    spark.createDataFrame(pdf).write.parquet(f"{d}/documents.parquet")
    fn = all_specs()["text_bm25_topk"].fn
    t = timed(fn(spark, d))
    # df of the hottest term ~ P(term1 appears in a doc) * n_docs
    print(f"RESULT s2_bm25 scale={scale} docs={n_docs} wall={t}s")


def s4_maxsim(spark, scale: int) -> None:
    """Full-corpus MaxSim vs the r9 two-stage twin on the SAME Zipf doc
    fixture (s2 must have run first at this scale): the exact baseline's
    token cross product scales with the corpus; the twin's stage 2 scores
    a fixed 3x50-doc pool, so its growth should track ONLY the shared
    BM25 stage 1."""
    from music_streaming_services_etl_pipeline_with_airflow_spark.plans.registry import all_specs

    d = f"{ROOT}/bm25_x{scale}"
    if not os.path.isdir(d):
        raise SystemExit(f"run s2 first to build {d}")

    # BOTH variants run eager work inside fn() (the scored .first()
    # action; the twin's checkpointed pool) — time fn()+write together
    # so the comparison is honest end-to-end
    def end_to_end(name: str) -> float:
        best = None
        for _ in range(2):
            t0 = time.time()
            all_specs()[name].fn(spark, d).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        return round(best, 2)

    full = end_to_end("retrieval_maxsim_late_interaction")
    two = end_to_end("retrieval_maxsim_two_stage")
    print(
        f"RESULT s4_maxsim scale={scale} full_corpus={full}s two_stage={two}s"
    )


def s5_vocab(spark, scale: int) -> None:
    """build_vocab on a fixture whose VOCABULARY grows with scale (the s2
    fixture holds vocab fixed): 30k -> 300k distinct tokens. The r8 form
    sorted the whole post-floor vocabulary in ONE task; the r9 two-phase
    form ranks range-partitioned slices in parallel, so wall should track
    bytes, not concentrate on the vocab sort."""
    from music_streaming_services_etl_pipeline_with_airflow_spark.plans.registry import all_specs

    rng = np.random.default_rng(SEED)
    n_docs = 6_000 * scale
    vocab = 30_000 * scale
    doc_len = 40
    toks = zipf_ranks(rng, n_docs * doc_len, vocab).reshape(n_docs, doc_len)
    import pandas as pd

    texts = [" ".join(f"t{r}" for r in row) for row in toks]
    d = f"{ROOT}/vocab_x{scale}"
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d)
    pdf = pd.DataFrame(
        {
            "doc_id": np.arange(n_docs, dtype=np.int64),
            "text": texts,
            "lang": "en",
            "source": "zipf",
        }
    )
    spark.createDataFrame(pdf).write.parquet(f"{d}/documents.parquet")

    best = None
    for _ in range(2):  # fn() ranks eagerly — time fn()+sink
        t0 = time.time()
        all_specs()["build_vocab"].fn(spark, d).write.format("noop").mode(
            "overwrite"
        ).save()
        dt = time.time() - t0
        best = dt if best is None or dt < best else best
    print(
        f"RESULT s5_vocab scale={scale} docs={n_docs} vocab_ranks={vocab} "
        f"wall={round(best, 2)}s"
    )


def s3_er(spark, scale: int) -> None:
    from music_streaming_services_etl_pipeline_with_airflow_spark.plans.registry import all_specs

    rng = np.random.default_rng(SEED)
    n_cust = 3_000 * scale
    # Zipf-ranked BLOCKS: block b gets Zipf mass, acct = block*10 + i%10.
    # The hot block's mention count grows ~linearly with n_cust, so the
    # within-block candidate pairs grow ~quadratically — the measurement
    # target.
    n_blocks = max(n_cust // 20, 10)
    blocks = zipf_ranks(rng, n_cust, n_blocks) - 1
    accts = blocks * 10 + rng.integers(0, 10, size=n_cust)
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "c_custkey": np.arange(n_cust, dtype=np.int64),
            "c_name": [f"Customer Record {a:09d}" for a in accts],
        }
    )
    d = f"{ROOT}/er_x{scale}"
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d)
    spark.createDataFrame(pdf).write.parquet(f"{d}/customer.parquet")
    hot = int(pd.Series(blocks).value_counts().iloc[0])
    fn = all_specs()["er_resolve_customers"].fn
    t = timed(fn(spark, d))
    # r10: the representative-star cap on the SAME Zipf fixture — the
    # uncapped clique is O(B^2) in the hot (blk, acct) group, the capped
    # star O(ER_CAP * B); both walls print so the trade is measured, not
    # asserted
    capped = timed(all_specs()["er_resolve_customers_capped"].fn(spark, d))
    print(
        f"RESULT s3_er scale={scale} customers={n_cust} "
        f"hot_block_mentions={hot * 4} wall={t}s capped_wall={capped}s"
    )


def s6_hotsource(spark, scale: int) -> None:
    """Hot-SOURCE corpus replica (r10): one source holds ~97% of all
    documents — the shape the testdata fixtures (20 uniform sources, 25
    docs each) never exercise, and exactly what breaks per-source
    operators at 100 TB. Measures the source-keyed family:
    - pack_sequences_hierarchical (BASELINE: level 1 packs the hot
      source as ONE pandas group; level 2 packs ALL summaries in one
      group) vs pack_sequences_sharded (r10 twin: every group bounded
      by a constant) — the twin's wall should track bytes while the
      baseline concentrates in single Python workers;
    - corpus_source_mix (hash agg with map-side partials: the hot key
      collapses per-partition before the shuffle — should stay flat);
    - corpus_mixture_sample (row_number over a per-source window: the
      hot source funnels through ONE task — measured to document it);
    - curate_training_corpus (groups by text hash, not source:
      Zipf-source should not move it — the control).
    """
    import pandas as pd

    from music_streaming_services_etl_pipeline_with_airflow_spark.plans.registry import all_specs

    rng = np.random.default_rng(SEED)
    n_docs = 20_000 * scale
    doc_len = 40
    # 97% of docs behind src0; the rest uniform over 99 cold sources
    hot = rng.random(n_docs) < 0.97
    srcs = np.where(
        hot, "src0", np.char.add("src", rng.integers(1, 100, n_docs).astype(str))
    )
    toks = rng.integers(0, 50_000, size=(n_docs, doc_len))
    texts = [" ".join(f"w{t}" for t in row) for row in toks]
    d = f"{ROOT}/hotsource_x{scale}"
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d)
    pdf = pd.DataFrame(
        {
            "doc_id": np.arange(n_docs, dtype=np.int64),
            "text": texts,
            "lang": "en",
            "source": srcs,
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        }
    )
    spark.createDataFrame(pdf).write.parquet(f"{d}/documents.parquet")
    specs = all_specs()
    hier = timed(specs["pack_sequences_hierarchical"].fn(spark, d))
    shard = timed(specs["pack_sequences_sharded"].fn(spark, d))
    mix = timed(specs["corpus_source_mix"].fn(spark, d))
    samp = timed(specs["corpus_mixture_sample"].fn(spark, d))
    cur = timed(specs["curate_training_corpus"].fn(spark, d))

    # the scale-safe mixture twins run EAGER work inside fn() (the
    # two-phase rank's localCheckpoint + offset collect), so time
    # fn()+sink together — same convention as bench.py's EAGER_FN set
    def eager(name: str) -> float:
        best = None
        for _ in range(2):
            t0 = time.time()
            specs[name].fn(spark, d).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        return round(best, 2)

    samp2 = eager("corpus_mixture_sample_scale_safe")
    temp = timed(specs["corpus_temperature_mixture"].fn(spark, d))
    temp2 = eager("corpus_temperature_mixture_scale_safe")
    print(
        f"RESULT s6_hotsource scale={scale} docs={n_docs} "
        f"hot_share=0.97 pack_hier_baseline={hier}s pack_sharded={shard}s "
        f"source_mix={mix}s mixture_sample={samp}s "
        f"mixture_sample_scale_safe={samp2}s "
        f"temperature_mixture={temp}s temperature_scale_safe={temp2}s "
        f"curate={cur}s"
    )


def main() -> None:
    which = set(sys.argv[1:]) or {"s1", "s2", "s3", "s4", "s5", "s6"}
    os.makedirs(ROOT, exist_ok=True)
    spark = get_spark("zipf-skew-measure")
    spark.sparkContext.setLogLevel("ERROR")
    for scale in (1, 10):
        if "s1" in which:
            s1_kcore(spark, scale)
        if "s2" in which:
            s2_bm25(spark, scale)
        if "s3" in which:
            s3_er(spark, scale)
        if "s4" in which:
            s4_maxsim(spark, scale)
        if "s5" in which:
            s5_vocab(spark, scale)
        if "s6" in which:
            s6_hotsource(spark, scale)
    spark.stop()


if __name__ == "__main__":
    main()
