"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with the noop sink (full computation of
every output column, no write/collect overhead) — the honest measure of
plan cost, not just of the count-pruned subtree.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from music_streaming_services_etl_pipeline_with_airflow_spark.session import get_spark
from music_streaming_services_etl_pipeline_with_airflow_spark.plans.registry import all_specs


def _prev_bench(repo_root: str):
    """Parse the newest BENCH_r*.json for (round, total, calib_sec,
    per-query medians). Driver BENCH files store only the TAIL of the
    output line, so this extracts the trailing fields by regex — the
    queries dict is flat, calib_sec and value print after it by the field
    order contract below. Returns None for pre-calibration rounds (< r11)
    or unparseable tails: the comparison is then simply omitted."""
    import glob as _glob

    best = None
    for p in _glob.glob(os.path.join(repo_root, "BENCH_r*.json")):
        m = re.fullmatch(r"BENCH_r(\d+)\.json", os.path.basename(p))
        if m and (best is None or int(m.group(1)) > best[0]):
            best = (int(m.group(1)), p)
    if best is None:
        return None
    rnd, p = best
    try:
        with open(p) as fh:
            tail = json.load(fh).get("tail", "")
        calib = float(re.search(r'"calib_sec": ([0-9.]+)', tail).group(1))
        total = float(re.search(r'"value": ([0-9.]+)\}\s*$', tail).group(1))
        qm = re.search(r'"queries": (\{[^{}]*\})', tail)
        # second probe shape (r13+): absent in older rounds — the
        # comparison then falls back to the codegen probe alone
        m2 = re.search(r'"calib_shuffle_sec": ([0-9.]+)', tail)
        return {
            "round": rnd,
            "total": total,
            "calib_sec": calib,
            "calib_shuffle_sec": float(m2.group(1)) if m2 else None,
            "queries": json.loads(qm.group(1)) if qm else {},
        }
    except (AttributeError, ValueError, json.JSONDecodeError):
        return None

# Headline set: the two full pipelines, the heaviest standalone operators,
# the SQL surface, and (as they land) the scale-path extension operators.
HEADLINE = [
    "genre_kpis_daily",
    "genre_kpis_daily_strparse",
    "genre_kpis_daily_onepass",
    "hourly_kpis",
    "a1_group_multi_agg",
    "a2_argmax_per_group",
    "a3_hourly_distinct_counts",
    "o2_top1_per_group",
    "j1_broadcast_left_join",
    "q1_total_listens_per_genre",
    "q7_avg_diversity_per_hour",
    "j4_multiway_dim_rollup",
    "sessionize_events",
    "dedup_exact",
    "dedup_minhash_lsh",
    "text_quality_scores",
    "text_tfidf_top_terms",
    "similarity_topk_bruteforce",
    # LLM-pipeline flagships (round 2) — regressions on the extension
    # surface must show up round-over-round
    "curate_training_corpus",
    "merge_upsert_relational",
    "scd2_priority_history",
    "dedup_simhash_banded",
    "dedup_containment_banded",
    "dedup_embedding_lsh",
    "graph_pagerank_parts",
    # round 6: the reworked PQ-ADC path (sampled local Lloyd + Arrow encode
    # + broadcast ADC fold) joins the headline so its cost stays watched,
    # as does the new any-alignment winnowed-fingerprint dedup
    "similarity_pq_topk",
    "dedup_winnowed_shingles",
    # round 7: the composed IVF-PQ production ANN shape (trained coarse
    # quantizer + residual PQ + exact rerank) joins the headline
    "similarity_ivfpq_topk",
    # late round 6: the two new scale-path flagships — int8-quantized ANN
    # (4× index-byte reduction + exact rerank) and canonicalized exact
    # dedup (normalization scan-side, 32-byte keys shuffle)
    "similarity_int8_topk",
    "dedup_normalized_exact",
    # final round-6 wave: the char-mass Gopher suite, the interpolated
    # bigram LM scorer, and the cross-doc trigram novelty audit
    "gopher_repetition_full",
    "text_bigram_logprob",
    "corpus_trigram_novelty",
    # round 8: PII redaction — single-pass regex scrub, the curation step
    # that gates text export; watched so regex-engine cost stays visible
    "text_pii_redact",
    # round-6 second half: incremental sessionization (IVM), the
    # support-thresholded oriented triangle count, and the dHash
    # perceptual-hash image dedup — each a new family whose cost should
    # stay watched round-over-round
    "ivm_incremental_sessions",
    "graph_triangle_counts",
    "multimodal_phash_dedup",
    # round 7: the real PNG/JPEG codec round-trips (CPU-bound Arrow
    # kernels — the cost to watch is Python-side codec throughput).
    # warehouse_snapshot_time_travel is deliberately NOT here: its work
    # (commits + MERGE) runs eagerly inside fn(), which run_once calls
    # BEFORE the timer, so a headline number would report only the final
    # diff read; its honest timing lives in tools/scaling_bench.py, which
    # times fn()+sink together.
    "multimodal_png_pixel_roundtrip",
    "multimodal_jpeg_entropy_roundtrip",
    # round-8 continuation: the retrieval pair (BM25 lexical + RRF hybrid
    # fusion) joins the headline. ml_perceptron_quality_distill,
    # warehouse_compact_small_files and sink_orc_partitioned_roundtrip are
    # NOT here for the snapshot_time_travel reason: their work (training
    # epochs / commits / fixture writes) runs eagerly inside fn(), before
    # the timer — a headline number would report only the final projection
    # (measured 0.09 s vs the honest 3.3 s incl. training). Their honest
    # end-to-end timings live in SCALING.md (tools/growth_measure_r8b.py).
    "text_bm25_topk",
    "retrieval_rrf_hybrid",
    "retrieval_bm25_cosine_rerank",
    "retrieval_maxsim_late_interaction",
    # round 9: the two-stage MaxSim twin (should stay well under the
    # full-corpus baseline above) and the two-phase global-rank quartile
    # assignment (watched so the range-repartition + offset-join path's
    # cost stays visible round-over-round)
    "retrieval_maxsim_two_stage",
    "w4_quartiles_scale_safe",
    "w6_relative_ranks_scale_safe",
    # round 10: the sharded packer (repartition + ordered mapInPandas
    # stream, bounded state per (source, shard) group) — the scale twin
    # of the per-source applyInPandas baseline
    "pack_sequences_sharded",
]

# Intentional EXACT BASELINES (r10 split): each is the correctness anchor
# for a scale-safe twin that holds its own headline row, kept out of the
# default headline set so the default total tracks the paths users would
# actually run at scale — run `python bench.py --baselines` to time them
# too (both totals print; the driver records the default set).
#   similarity_topk_bruteforce  -> twins similarity_{pq,ivfpq,int8}_topk
#   retrieval_maxsim_late_interaction -> twin retrieval_maxsim_two_stage
BASELINES = [
    "similarity_topk_bruteforce",
    "retrieval_maxsim_late_interaction",
]
HEADLINE = [n for n in HEADLINE if n not in BASELINES]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None

    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))

    with_baselines = "--baselines" in sys.argv

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    # JVM/codegen warm-up outside the measurement (standard benchmarking
    # practice; does not cache any query result)
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    specs = all_specs()
    names = [n for n in HEADLINE if n in specs]
    baseline_names = [n for n in BASELINES if n in specs] if with_baselines else []
    names = names + baseline_names
    # n≥3 runs per query, ROUND-ROBIN (pass 1 over all queries, then pass 2,
    # …) so a scheduler-noise burst lands on one pass of many queries, not
    # on all runs of one query. Median is the reported number (robust to the
    # one-slow-outlier pattern best-of-2 could not distinguish from drift);
    # spread = (max-min)/median (trimmed at >=5 samples) flags queries whose
    # number is untrustworthy, and noisy queries get adaptive top-up passes
    # (see NOISE CONTROL below). Plans are re-built per run — nothing is
    # result-cached.
    # one untimed warmup pass: JIT/codegen/broadcast-build costs land here,
    # not in run 1 of the measurement (they are session artifacts, not plan
    # cost; nothing is result-cached — plans rebuild per run)
    # Since the r8 contract-oracle conversions, the registry serves
    # similarity_{pq,ivfpq}_topk as AUDITS: exact brute-force top-k (so
    # the driver can value-hash it) + a recall flag, which runs the
    # brute-force BASELINE in addition to the ANN under audit. Bench
    # times the PRODUCT operator — the ANN search itself; the baseline
    # keeps its own headline row (similarity_topk_bruteforce), so both
    # costs stay watched and the r7-vs-r8 per-query comparison stays
    # apples-to-apples.
    from music_streaming_services_etl_pipeline_with_airflow_spark.operators.components import (
        q_pagerank_parts,
    )
    from music_streaming_services_etl_pipeline_with_airflow_spark.operators.similarity import (
        q_topk_ivfpq,
        q_topk_pq,
    )

    bench_fn = {
        "similarity_pq_topk": q_topk_pq,
        "similarity_ivfpq_topk": q_topk_ivfpq,
        "graph_pagerank_parts": q_pagerank_parts,
    }

    def fn_of(name: str):
        return bench_fn.get(name, specs[name].fn)

    for name in names:
        fn_of(name)(spark, sf_dir).write.format("noop").mode("overwrite").save()

    # CALIBRATION PROBE (round 11): a fixed, data- and repo-independent
    # JVM-side job (whole-stage-codegen xxhash64 fold over a range) timed
    # after warm-up. Bench absolute numbers drift with machine state —
    # r10 saw a uniform +6.7% on untouched code, and the multimodal
    # codecs measured 0.04-0.12 s in one driver round vs ~0.5 s locally
    # AT THE SAME COMMIT — so cross-round totals can only be adjudicated
    # against a constant-work yardstick measured in the same session.
    # Recorded as calib_sec; compare (total / calib_sec) across rounds to
    # separate plan regressions from host drift.
    def calibration_probe() -> float:
        t0 = time.time()
        # pmod bounds the summand so the fold cannot overflow long under
        # ANSI mode (sum of raw 64-bit hashes does); 800M rows ≈ 1 s on
        # 32 cores — long enough that scheduler jitter stays a small
        # fraction of the yardstick (a 0.3 s probe measured ±20%)
        spark.range(0, 800_000_000, 1, 32).selectExpr(
            "sum(pmod(xxhash64(id), 1000000)) as s"
        ).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    calib = round(sorted(calibration_probe() for _ in range(3))[1], 3)

    # SECOND PROBE SHAPE (round 13, VERDICT r12 ask 8): the codegen fold
    # above exercises only whole-stage codegen — if host drift moves
    # shuffle machinery (disk, page cache, IPC) differently from pure
    # CPU, a single-shape yardstick mis-adjudicates every shuffle-heavy
    # query. This probe is a real two-exchange aggregate (hash partition
    # -> partial/final agg) over the same data-independent range source.
    # Both probes are recorded; vs_prev normalizes by their GEOMEAN when
    # the previous round carries both, so a probe-vs-workload mix shift
    # is measurable instead of argued.
    def calibration_probe_shuffle() -> float:
        t0 = time.time()
        (
            spark.range(0, 20_000_000, 1, 32)
            .selectExpr("pmod(xxhash64(id), 2000000) as k", "id as v")
            .groupBy("k")
            .agg({"v": "sum"})
            .selectExpr("sum(`sum(v)`) as s")
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        return time.time() - t0

    calib_shuffle = round(
        sorted(calibration_probe_shuffle() for _ in range(3))[1], 3
    )

    # Queries whose fn() runs EAGER work (two_phase_row_number's
    # checkpoint + offsets collect; the two-stage MaxSim's materialized
    # lexical pool): the timer must wrap fn() too, or the headline number
    # reports only the final projection. Kept as an explicit set so every
    # other query's timing stays comparable round-over-round.
    EAGER_FN = {
        "retrieval_maxsim_two_stage",
        "w4_quartiles_scale_safe",
        "w6_relative_ranks_scale_safe",
    }

    def run_once(name: str) -> float:
        if name in EAGER_FN:
            t0 = time.time()
            fn_of(name)(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            return time.time() - t0
        df = fn_of(name)(spark, sf_dir)
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    samples: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(n_runs):
        for name in names:
            samples[name].append(run_once(name))

    def median(xs: list[float]) -> float:
        ys = sorted(xs)
        mid = len(ys) // 2
        return ys[mid] if len(ys) % 2 else (ys[mid - 1] + ys[mid]) / 2

    def trimmed(xs: list[float]) -> list[float]:
        # with >= 5 samples, drop the single max and min first — one
        # scheduler burst should not brand a stable query as noisy
        ys = sorted(xs)
        return ys[1:-1] if len(ys) >= 5 else ys

    def spread_of(xs: list[float]) -> float:
        ys = trimmed(xs)
        m = median(ys)
        return (ys[-1] - ys[0]) / m if m > 0 else 0.0

    # NOISE CONTROL (round 7): queries whose spread exceeds 30% of median
    # AND 0.2 s absolute after the base passes get up to 2 extra top-up
    # ROUNDS (median-of-5+), so round-over-round deltas stay adjudicable
    # without paying 5 passes for queries that were already stable. The
    # absolute floor keeps sub-second queries — where scheduler jitter is
    # a large fraction of a tiny median but irrelevant to any comparison —
    # from burning top-up passes; their spread column is host-noise-bound
    # by construction.
    def is_noisy(xs: list[float]) -> bool:
        ys = trimmed(xs)
        return spread_of(xs) > 0.30 and (ys[-1] - ys[0]) > 0.2

    extra_rounds = 0
    for _ in range(2):
        noisy = [n for n in names if is_noisy(samples[n])]
        if not noisy:
            break
        extra_rounds += 1
        for name in noisy:
            samples[name].append(run_once(name))
    spark.stop()

    timings = {n: round(median(v), 3) for n, v in samples.items()}
    spread = {n: round(spread_of(v), 2) for n, v in samples.items()}
    headline_timings = {n: t for n, t in timings.items() if n not in BASELINES}
    baseline_timings = {n: t for n, t in timings.items() if n in BASELINES}

    # CALIBRATED ROUND COMPARISON (round 12): the r11 drift adjudication
    # proved cross-round ABSOLUTE seconds are host-state noise (untouched
    # queries moved ±30-40% between driver rounds, 0.94-0.99x when both
    # commits ran interleaved in one session) — so every BENCH line now
    # carries its own verdict vs the previous round, normalized by the
    # constant-work calibration probe: ratio_calibrated =
    # (total/calib) / (prev_total/prev_calib). Per-query calibrated
    # drifters (>1.25x or <0.8x, and big enough that jitter isn't the
    # whole story) are named so the next round adjudicates from the file
    # instead of re-arguing drift from memory.
    total_val = round(sum(headline_timings.values()), 3)
    prev = _prev_bench(os.path.dirname(os.path.abspath(__file__)))
    vs_prev = None
    if prev and prev["total"] > 0 and prev["calib_sec"] > 0:
        def cal_ratio(now_s: float, then_s: float) -> float:
            r1 = (now_s / calib) / (then_s / prev["calib_sec"])
            # geomean across probe shapes once both rounds carry both
            # (r13+); single-probe fallback against pre-r13 rounds
            if prev.get("calib_shuffle_sec") and calib_shuffle > 0:
                r2 = (now_s / calib_shuffle) / (
                    then_s / prev["calib_shuffle_sec"]
                )
                return (r1 * r2) ** 0.5
            return r1

        vs_prev = {
            "round": prev["round"],
            "ratio_raw": round(total_val / prev["total"], 3),
            "ratio_calibrated": round(cal_ratio(total_val, prev["total"]), 3),
            "drifters_calibrated": {
                n: round(cal_ratio(headline_timings[n], prev["queries"][n]), 2)
                for n in headline_timings
                if prev["queries"].get(n, 0) > 0
                and max(headline_timings[n], prev["queries"][n]) > 0.3
                and not (
                    0.8
                    <= cal_ratio(headline_timings[n], prev["queries"][n])
                    <= 1.25
                )
            },
        }
        # each drifter's RAW ratio rides along (r14): the adjudication
        # table is then self-contained — a query flagged calibrated-slow
        # whose raw wall is FLAT on a probe-faster host is the
        # fixed-job-overhead artifact (small queries don't scale with
        # probe speed), not a plan regression; the same-host A/B harness
        # remains the ground truth either way
        vs_prev["drifters_raw"] = {
            n: round(headline_timings[n] / prev["queries"][n], 2)
            for n in vs_prev["drifters_calibrated"]
        }
        # TWO-SIGNAL RULE (r15, VERDICT r14 ask 5): both probe-model
        # failure modes have now occurred — r13's probe-slower host
        # manufactured calibrated MISSES, r14's probe-faster host
        # manufactured 12 calibrated FLAGS out of raw speedups (all 12
        # A/B'd same-host at 0.84-1.23x). A query therefore demands an
        # A/B session only when BOTH the calibrated AND the raw ratio
        # exceed 1.25x slow; a calibrated-only flag is annotated as a
        # probe artifact by construction. (Raw-only slowdowns surface in
        # ratio_raw and the same-host A/B stays the ground truth.)
        vs_prev["drifters_confirmed"] = {
            n: c
            for n, c in vs_prev["drifters_calibrated"].items()
            if c > 1.25 and vs_prev["drifters_raw"].get(n, 0) > 1.25
        }
    # r16 (VERDICT r15 "What's wrong" #4): the r14 comparison was LOST to
    # tail truncation of this one-line JSON — the driver records only the
    # tail of the line, and the vs_prev/spread bookkeeping had inflated it
    # past the captured window, front-truncating into unparseable JSON.
    # The printed line now carries ONLY the contract fields (queries, sf,
    # metric, unit, value) plus the two short calibration probes; all
    # diagnostics (spread, sample counts, baselines split, vs_prev with
    # the two-signal drifter rule) go to bench_diagnostics.json next to
    # the repo, printed as their own line FIRST so the contract line
    # stays last and short.
    diag = {
        "spread": spread,
        "runs": n_runs,
        "extra_rounds": extra_rounds,
        "n_samples": {n: len(v) for n, v in samples.items() if len(v) > n_runs},
        "stat": "median",
        # the exact-baseline split (r10): names always listed so every
        # run records what the default total excludes; timings and
        # their own total appear only under --baselines
        "baselines_excluded": [n for n in BASELINES if n in specs],
        **(
            {
                "baselines": baseline_timings,
                "baselines_total": round(sum(baseline_timings.values()), 3),
            }
            if baseline_timings
            else {}
        ),
        **({"vs_prev": vs_prev} if vs_prev else {}),
    }
    diag_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "bench_diagnostics.json")
    try:
        with open(diag_path, "w") as fh:
            json.dump(diag, fh, indent=1)
        print(json.dumps({"diagnostics_file": diag_path}))
    except OSError:
        print(json.dumps({"diagnostics_inline": diag}))
    out = {
        "calib_shuffle_sec": calib_shuffle,
        "calib_sec": calib,
        "queries": headline_timings,
        "sf": sf,
        "metric": "headline_queries_total_wall",
        "unit": "sec",
        "value": total_val,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
