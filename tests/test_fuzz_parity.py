"""Cross-engine fuzz parity: hypothesis-generated adversarial `events`
tables run through event-only registry queries on BOTH Spark and their
DuckDB oracles, compared with exact value equality.

The fixed-testdata parity gate (tools/check_parity.py) proves the oracles
on one distribution; this suite hunts data-dependent divergence the fixed
data can't reach — duplicate timestamps on the tie-break path, exact
session-gap spacing, empty/unicode group keys, negative/zero/huge values,
single-row groups (the n-1 variance guard), users with one event (null
lag), and empty filter matches.

Query choice is deliberate: only queries whose outputs are integers,
strings, timestamps, or single IEEE divisions of integers — engine-exact
by construction on ANY input, so a mismatch here is a real semantics bug,
never float-rounding noise.
"""

from __future__ import annotations

import datetime as dt
import math

import pytest

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    _HAS_HYP = True
except ImportError:  # pragma: no cover
    _HAS_HYP = False

pytestmark = pytest.mark.skipif(not _HAS_HYP, reason="hypothesis not installed")

# integer-exact / tie-broken queries over the events table only
FUZZ_QUERIES = [
    "a14_filtered_agg",
    "a16_value_histogram",
    "w10_mad_outliers",
    "w5_first_last_per_user",
    "w9_running_distinct",
    "evt_transition_matrix",
    "sessionize_events",
    # round-6 additions: calendar gap-fill (dense date spine vs sparse
    # events), the ordered funnel, and weekly cohort retention — all
    # event-only with integer outputs
    "w3_gapfill_daily_by_type",
    "funnel_signup_click_purchase",
    "retention_weekly_cohorts",
    # round-6 second half: selection-only OHLC (engine-exact on any data)
    # and incremental sessionization — fuzz dates are 2024-03, all AFTER
    # the 2024-01-21 IVM cutoff, so this also pins the empty-base path of
    # the state merge
    "w11_ohlc_resample",
    "ivm_incremental_sessions",
]

_BASE = dt.datetime(2024, 3, 1, 0, 0, 0)

# offsets in seconds: includes duplicates-by-construction (small pool),
# exact 30-minute (1800 s) session-gap spacing, and far-apart stragglers
_OFFSETS = st.integers(min_value=0, max_value=5400)
_GAPPY = st.sampled_from([0, 1, 1799, 1800, 1801, 3600, 5400, 86_400])
_TYPES = st.sampled_from(["purchase", "error", "view", "", "söng", "click"])
# |cents| <= 2e8 keeps Σx² far inside int64 for any row count here
_VALUES = st.one_of(
    st.sampled_from([0.0, -0.01, 0.005, -1.5, 123.456, 1999999.99, -2e6]),
    st.floats(min_value=-2e6, max_value=2e6, allow_nan=False, width=64),
)


@st.composite
def _events(draw):
    n = draw(st.integers(min_value=1, max_value=30))
    rows = []
    for i in range(n):
        off = draw(_GAPPY) if draw(st.booleans()) else draw(_OFFSETS)
        rows.append(
            (
                i + 1,  # event_id: unique, the tie-break of last resort
                _BASE + dt.timedelta(seconds=off),
                draw(st.integers(min_value=1, max_value=4)),  # user_id
                draw(_TYPES),
                draw(_VALUES),
            )
        )
    return rows


def _canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        return repr(v)
    return str(v)


def _norm_spark(df):
    """Spark DataFrame → canonical sorted rows via collect(): DATE columns
    stay datetime.date (toPandas would too, but the DuckDB side must
    match — see _norm_duck)."""
    cols = sorted(df.columns)
    return sorted(
        tuple(_canon(r[c]) for c in cols) for r in df.collect()
    )


def _norm_duck(con, sql):
    """DuckDB oracle → canonical sorted rows via fetchall(): unlike
    fetchdf(), the native cursor returns datetime.date for DATE columns
    instead of upcasting to pandas datetime64 (which would stringify as
    'YYYY-MM-DD 00:00:00' and falsely diverge from Spark's date)."""
    cur = con.execute(sql)
    names = [d[0] for d in cur.description]
    order = sorted(range(len(names)), key=lambda i: names[i])
    return sorted(
        tuple(_canon(row[i]) for i in order) for row in cur.fetchall()
    )


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_events())
def test_event_queries_match_oracle_on_fuzzed_tables(spark, tmp_path_factory, rows):
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from music_streaming_services_etl_pipeline_with_airflow_spark.plans.registry import all_specs

    d = tmp_path_factory.mktemp("fuzzev")
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
                "value": pa.array([r[4] for r in rows], pa.float64()),
            }
        ),
        str(d / "events.parquet"),
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet')"
    )
    specs = all_specs()
    for name in FUZZ_QUERIES:
        spec = specs[name]
        got = _norm_spark(spec.fn(spark, str(d)))
        want = _norm_duck(con, spec.oracle)
        assert got == want, f"{name}: spark != oracle on fuzzed input"


def test_normalize_text_cross_engine_on_unicode(spark):
    """Spark (Java toLowerCase) and DuckDB (utf8proc) disagree on some
    unicode lowerings pre-strip — 'İ' → 'i̇' vs 'i', final sigma 'ς' vs
    'σ' — but every divergent output falls outside [a-z0-9 ] and is
    deleted by the strip stage, so the CANONICAL form converges. This
    pins that convergence on the adversarial cases plus the
    folds-into-ascii ones (Kelvin sign, fullwidth letters)."""
    import duckdb

    from music_streaming_services_etl_pipeline_with_airflow_spark.operators.dedup import (
        _normalize_sql,
        normalize_text,
    )
    from pyspark.sql import functions as F

    cases = [
        "İstanbul CITY",
        "ΣΙΣΥΦΟΣ myth",
        "STRASSE ẞ 12",
        "KK Kelvin",  # ASCII K + Kelvin sign
        "Ａｂｃ fullwidth",
        "mixed\tWS\r\nand!!punct",
        "",
    ]
    sdf = spark.createDataFrame([(c,) for c in cases], ["text"])
    got = {
        r.text: r.n
        for r in sdf.select("text", normalize_text(F.col("text")).alias("n")).collect()
    }
    con = duckdb.connect()
    for c in cases:
        want = con.execute(
            f"SELECT {_normalize_sql('?')}", [c]
        ).fetchone()[0]
        assert got[c] == want, (c, got[c], want)


# integer-exact / single-division queries over the documents table only.
# (The log2-based LM scorers are deliberately absent: engine log2 may
# differ in the last ulp on adversarial counts, which the milli-floor can
# amplify into an off-by-one — their parity is proven on the fixed gate
# data instead.)
DOC_FUZZ_QUERIES = [
    "text_token_stats",
    # the two mapInPandas pixel kernels read UTF-8 BYTES; their oracles
    # read hex(encode(text)) slices — this suite (whose pool includes
    # 'söng') is the regression net for byte-vs-character indexing
    "multimodal_resize_thumbnail",
    "multimodal_feature_stats",
    # round-6 second half: the audio/scene/dHash kernels share the same
    # bytes-vs-hex contract (plus 32-bit hash packing and lag windows)
    "multimodal_audio_energy",
    "multimodal_scene_cuts",
    "multimodal_phash_dedup",
    # round 7: the real PNG codec round-trip — adversarial unicode bytes
    # flow through encode(filters)+deflate and back; the oracle recomputes
    # the decoded-pixel stats straight from the text
    "multimodal_png_pixel_roundtrip",
    "multimodal_jpeg_entropy_roundtrip",
    "gopher_repetition",
    "gopher_repetition_full",
    "corpus_trigram_novelty",
    "text_chunk_fixed",
]

# small pool ⇒ shared n-grams across docs by construction; includes empty
# token (double-space on join), unicode, and single-char tokens
_DOC_TOKENS = st.sampled_from(
    ["a", "b", "the", "of", "söng", "x1", "", "zzz", "Q"]
)


@st.composite
def _documents(draw):
    n = draw(st.integers(min_value=1, max_value=8))
    docs = []
    for i in range(n):
        k = draw(st.integers(min_value=0, max_value=12))
        docs.append((i + 1, " ".join(draw(_DOC_TOKENS) for _ in range(k))))
    return docs


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=_documents())
def test_doc_queries_match_oracle_on_fuzzed_tables(spark, tmp_path_factory, docs):
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from music_streaming_services_etl_pipeline_with_airflow_spark.plans.registry import all_specs

    d = tmp_path_factory.mktemp("fuzzdoc")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in docs], pa.int64()),
                "text": pa.array([r[1] for r in docs], pa.string()),
            }
        ),
        str(d / "documents.parquet"),
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')"
    )
    specs = all_specs()
    for name in DOC_FUZZ_QUERIES:
        spec = specs[name]
        got = _norm_spark(spec.fn(spark, str(d)))
        want = _norm_duck(con, spec.oracle)
        assert got == want, f"{name}: spark != oracle on fuzzed input"


def test_log2_milli_floor_converges_cross_engine(spark):
    """The LM scorers floor -log2(p)*1000 to integer milli-bits; a last-ulp
    log2 divergence between the JVM and DuckDB could flip a floor boundary.
    Pin exact agreement over an exhaustive grid of the probabilities the
    unigram/bigram models can actually produce at gate scale: p = c/n and
    the interpolated 0.5*a/b + 0.5*c/n forms, every count 1..120."""
    import duckdb

    from pyspark.sql import functions as F

    rows = [
        (c, n, a, b)
        for n in (7, 120, 997, 30_000)
        for c in range(1, 121)
        for (a, b) in ((c, n), (1, 120), (119, 120))
    ]
    sdf = spark.createDataFrame(rows, ["c", "n", "a", "b"])
    got = (
        sdf.select(
            "c", "n", "a", "b",
            F.expr(
                "CAST(FLOOR(-LOG2(0.5 * CAST(a AS DOUBLE) / CAST(b AS DOUBLE)"
                " + 0.5 * CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) * 1000)"
                " AS BIGINT)"
            ).alias("bits"),
        )
        .toPandas()
        .sort_values(["c", "n", "a", "b"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("grid", got[["c", "n", "a", "b"]])
    want = con.execute(
        """SELECT CAST(FLOOR(-LOG2(0.5 * CAST(a AS DOUBLE) / CAST(b AS DOUBLE)
                              + 0.5 * CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) * 1000)
                   AS BIGINT) AS bits
           FROM grid ORDER BY c, n, a, b"""
    ).fetchdf()
    assert list(got["bits"]) == list(want["bits"])


# ---------------------------------------------------------------------------
# TPC-H money math: fuzzed lineitem through the exact-BIGINT integerization
# ---------------------------------------------------------------------------

# lineitem-only queries with the FLOOR(x*scale + 0.5) integerization
# contract; a divergence here means a real cross-engine IEEE/boundary bug
TPCH_FUZZ_QUERIES = ["tpch_q1_pricing_summary", "tpch_q6_forecast_revenue"]

_SHIP_DATES = st.sampled_from(
    [
        # straddle the Q6 window edges exactly...
        dt.datetime(1995, 12, 31, 23, 59, 59),
        dt.datetime(1996, 1, 1, 0, 0, 0),
        dt.datetime(1996, 7, 4, 12, 0, 0),
        dt.datetime(1996, 12, 31, 23, 59, 59),
        dt.datetime(1997, 1, 1, 0, 0, 0),
        # ...and the Q1 <= cutoff exactly
        dt.datetime(2001, 8, 5, 0, 0, 0),
        dt.datetime(2001, 8, 6, 0, 0, 0),
        dt.datetime(2001, 8, 7, 0, 0, 0),
    ]
)
# money/rate pools hammer the FLOOR(x*scale + 0.5) half-way boundaries:
# .005 cents edges, the Q6 BETWEEN 500..700 bp edges, halves of quantity
_PRICES = st.one_of(
    st.sampled_from([0.0, 0.005, 0.004999999999999999, 901.505, 104999.995, 0.01]),
    st.floats(min_value=0.0, max_value=105_000.0, allow_nan=False, width=64),
)
_RATES = st.one_of(
    st.sampled_from([0.0, 0.05, 0.049999999999999996, 0.07, 0.07000000000000001, 0.0500499, 0.1]),
    st.floats(min_value=0.0, max_value=0.2, allow_nan=False, width=64),
)
_QTYS = st.sampled_from([1.0, 23.0, 23.5, 24.0, 24.5, 25.0, 49.5, 50.0])
_FLAGS = st.sampled_from(["A", "N", "R", ""])
_STATUS = st.sampled_from(["O", "F"])


@st.composite
def _lineitems(draw):
    n = draw(st.integers(min_value=1, max_value=40))
    rows = []
    for i in range(n):
        rows.append(
            (
                i // 4 + 1,  # l_orderkey
                draw(st.integers(min_value=1, max_value=50)),  # l_partkey
                draw(st.integers(min_value=1, max_value=10)),  # l_suppkey
                i % 4 + 1,  # l_linenumber
                draw(_QTYS),
                draw(_PRICES),
                draw(_RATES),  # l_discount
                draw(_RATES),  # l_tax
                draw(_FLAGS),
                draw(_STATUS),
                draw(_SHIP_DATES),
            )
        )
    return rows


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_lineitems())
def test_tpch_money_math_matches_oracle_on_fuzzed_lineitem(
    spark, tmp_path_factory, rows
):
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from music_streaming_services_etl_pipeline_with_airflow_spark.plans.registry import all_specs

    d = tmp_path_factory.mktemp("fuzzli")
    cols = list(zip(*rows))
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(cols[0], pa.int64()),
                "l_partkey": pa.array(cols[1], pa.int64()),
                "l_suppkey": pa.array(cols[2], pa.int64()),
                "l_linenumber": pa.array(cols[3], pa.int32()),
                "l_quantity": pa.array(cols[4], pa.float64()),
                "l_extendedprice": pa.array(cols[5], pa.float64()),
                "l_discount": pa.array(cols[6], pa.float64()),
                "l_tax": pa.array(cols[7], pa.float64()),
                "l_returnflag": pa.array(cols[8], pa.string()),
                "l_linestatus": pa.array(cols[9], pa.string()),
                "l_shipdate": pa.array(cols[10], pa.timestamp("us")),
            }
        ),
        str(d / "lineitem.parquet"),
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{d}/lineitem.parquet')"
    )
    specs = all_specs()
    for name in TPCH_FUZZ_QUERIES:
        spec = specs[name]
        got = _norm_spark(spec.fn(spark, str(d)))
        want = _norm_duck(con, spec.oracle)
        assert got == want, f"{name}: spark != oracle on fuzzed lineitem"


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_fuzz_cdc_bucketed_apply_matches_latest_change_oracle(
    spark, tmp_path_factory, data
):
    """The bucketed CDC applier under RANDOM batch sequences: arrival
    order is independent of event time (duplicated timestamps fall back
    to the event_id tie-break), keys collide inside 4 buckets, and
    deletes interleave with upserts — the final live state must equal the
    global latest-change-per-key oracle, every non-final version must
    remain readable (time travel), and every commit after the first must
    carry at least the untouched buckets by reference."""
    import math

    from music_streaming_services_etl_pipeline_with_airflow_spark.snapshots import (
        SnapshotTable,
    )
    from music_streaming_services_etl_pipeline_with_airflow_spark.streaming.ingest import (
        make_cdc_applier,
    )

    n_batches = data.draw(st.integers(min_value=1, max_value=3))
    eid = 0
    batches = []
    for _ in range(n_batches):
        n = data.draw(st.integers(min_value=1, max_value=10))
        rows = []
        for _i in range(n):
            eid += 1
            rows.append(
                (
                    eid,
                    _BASE + dt.timedelta(seconds=data.draw(_OFFSETS)),
                    data.draw(st.integers(min_value=1, max_value=6)),
                    data.draw(st.sampled_from(["purchase", "error", "view"])),
                    data.draw(_VALUES),
                    None,
                )
            )
        batches.append(rows)

    t = SnapshotTable(str(tmp_path_factory.mktemp("cdc_fuzz") / "state"))
    apply_batch = make_cdc_applier(t, n_buckets=4)
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    )
    prev_map = None
    for bi, rows in enumerate(batches):
        apply_batch(spark.createDataFrame(rows, schema), bi)
        cur_map = t._bucket_map(t.latest_version())
        if prev_map is not None:
            carried = [b for b in prev_map if cur_map.get(b) == prev_map[b]]
            touched = [b for b in cur_map if cur_map[b] != prev_map.get(b)]
            # every bucket is either carried by reference or rewritten
            assert set(carried) | set(touched) == set(cur_map)
        prev_map = cur_map

    # oracle: latest (ts, event_id) change per key decides the live state
    latest = {}
    for rows in batches:
        for (e, ts, u, typ, v, _p) in rows:
            if u not in latest or (ts, e) > (latest[u][0], latest[u][1]):
                latest[u] = (ts, e, typ, v)
    want = {
        u: math.floor(v * 1000)
        for u, (_ts, _e, typ, v) in latest.items()
        if typ != "error"
    }
    got = {
        r.user_id: r.value_milli
        for r in t.read(spark).filter("NOT deleted").collect()
    }
    assert got == want
    # time travel: every version still reads
    for v in t.versions():
        t.read(spark, v).count()


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_fuzz_snapshot_format_against_model(spark, tmp_path_factory, data):
    """Model-based fuzz of the snapshot table format: a random sequence of
    commit(overwrite|append) / delete_where / restore / compact / expire
    ops runs against both the real table and an in-memory model; after
    every op the table's current read — and every surviving historical
    version — must equal the model exactly. Catches lineage bugs (append
    chains, restore-by-reference, refcounted expiration) that single-op
    tests can't reach."""
    from music_streaming_services_etl_pipeline_with_airflow_spark.snapshots import (
        SnapshotTable,
    )

    t = SnapshotTable(str(tmp_path_factory.mktemp("snap_fuzz") / "tbl"))
    model: dict[int, list[tuple]] = {}  # version -> rows
    next_id = [0]

    def fresh_rows():
        n = data.draw(st.integers(min_value=0, max_value=6))
        rows = []
        for _ in range(n):
            next_id[0] += 1
            rows.append((next_id[0], data.draw(st.integers(0, 99))))
        return rows

    def table_rows(version=None):
        if (version or t.latest_version()) == 0:
            return []
        return sorted(map(tuple, t.read(spark, version).collect()))

    def to_df(rows):
        return spark.createDataFrame(rows, "id long, v long")

    n_ops = data.draw(st.integers(min_value=3, max_value=7))
    for _ in range(n_ops):
        cur = t.latest_version()
        choices = ["overwrite", "append"]
        if cur > 0:
            choices += ["delete", "restore", "compact", "expire"]
        op = data.draw(st.sampled_from(choices))
        if op == "overwrite":
            rows = fresh_rows()
            v = t.commit(to_df(rows), mode="overwrite")
            model[v] = list(rows)
        elif op == "append":
            rows = fresh_rows()
            v = t.commit(to_df(rows), mode="append")
            model[v] = (model.get(cur, []) if cur > 0 else []) + list(rows)
        elif op == "delete":
            cut = data.draw(st.integers(0, 99))
            v = t.delete_where(spark, f"v >= {cut}")
            model[v] = [r for r in model[cur] if r[1] < cut]
        elif op == "restore":
            target = data.draw(st.sampled_from(sorted(model)))
            v = t.restore(target)
            model[v] = list(model[target])
        elif op == "compact":
            v = t.compact(spark)
            if v != cur:
                model[v] = list(model[cur])
        else:  # expire
            keep = data.draw(st.integers(1, max(1, len(model))))
            expired = t.expire(keep_last=keep)
            for v in expired:
                del model[v]
        live = t.latest_version()
        assert sorted(model[live]) == table_rows(), f"after {op}"
    # every surviving historical version must still reconstruct exactly
    assert sorted(t.versions()) == sorted(model)
    for v, rows in model.items():
        assert sorted(rows) == table_rows(v), f"version {v}"


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_fuzz_bucketed_lineage_against_model(spark, tmp_path_factory, data):
    """Model-based fuzz of the BUCKETED snapshot lineage: random sequences
    of merge_bucketed (upserts with summing updates), append-mode
    commit_buckets (grow-only inserts), compact_appended (the r11 LSM
    fold — content-neutral by contract, fuzzed r12), delete_where,
    restore and expire against an in-memory dict model — after every op
    the live table equals the model, the bucket map stays readable
    (read_buckets over all buckets == full read), and plain commit()
    keeps refusing to strand the lineage."""
    import pytest as _pytest

    from music_streaming_services_etl_pipeline_with_airflow_spark.snapshots import (
        SnapshotTable,
    )
    from pyspark.sql import functions as F

    n_buckets = 4
    schema = "id long, v long"
    t = SnapshotTable(str(tmp_path_factory.mktemp("bfuzz") / "tbl"))
    versions: dict[int, dict[int, int]] = {}  # version -> {id: v}

    def seed_delta():
        n = data.draw(st.integers(min_value=1, max_value=8))
        ids = data.draw(
            st.lists(
                st.integers(min_value=0, max_value=20),
                min_size=n, max_size=n, unique=True,
            )
        )
        return {i: data.draw(st.integers(min_value=1, max_value=9)) for i in ids}

    def table_state():
        if t.latest_version() == 0:
            return {}
        return {r.id: r.v for r in t.read(spark).collect()}

    n_ops = data.draw(st.integers(min_value=3, max_value=6))
    for _ in range(n_ops):
        cur = t.latest_version()
        ops = ["merge", "append"]
        if cur > 0:
            ops += ["delete", "restore", "expire", "compact"]
        op = data.draw(st.sampled_from(ops))
        if op == "append":
            # append-mode is for grow-only keyed state: NEW ids only
            # (duplicate keys would break the dict model, as they would
            # break any keyed consumer of an append lineage)
            base = versions.get(cur, {})
            pool = [i for i in range(21, 60) if i not in base]
            n = data.draw(st.integers(min_value=1, max_value=5))
            ids = data.draw(
                st.lists(st.sampled_from(pool), min_size=n, max_size=n, unique=True)
            )
            delta = {
                i: data.draw(st.integers(min_value=1, max_value=9)) for i in ids
            }
            dfb = spark.createDataFrame(
                [(k, dv) for k, dv in delta.items()], schema
            ).withColumn("_bucket", SnapshotTable.bucket_of(F.col("id"), n_buckets))
            touched = sorted(
                r["_bucket"] for r in dfb.select("_bucket").distinct().collect()
            )
            v = t.commit_buckets(dfb, touched, n_buckets=n_buckets, append=True)
            versions[v] = {**base, **delta}
        elif op == "compact":
            # content-neutral whatever the threshold: the model is COPIED
            max_dirs = data.draw(st.integers(min_value=0, max_value=3))
            v = t.compact_appended(spark, schema, "id", n_buckets, max_dirs)
            if v is not None:
                versions[v] = dict(versions[cur])
        elif op == "merge":
            delta = seed_delta()
            df = spark.createDataFrame(
                [(k, dv) for k, dv in delta.items()], "id long, dv long"
            )
            v = t.merge_bucketed(
                spark, df, on="id",
                update={"v": "v + dv"},
                insert_defaults={"v": "dv"},
                n_buckets=n_buckets, schema=schema,
            )
            m = dict(versions.get(cur, {}))
            for k, dv in delta.items():
                m[k] = m.get(k, 0) + dv
            versions[v] = m
        elif op == "delete":
            cut = data.draw(st.integers(min_value=1, max_value=9))
            v = t.delete_where(spark, f"v >= {cut}")
            versions[v] = {
                k: x for k, x in versions[cur].items() if x < cut
            }
        elif op == "restore":
            target = data.draw(st.sampled_from(sorted(versions)))
            v = t.restore(target)
            versions[v] = dict(versions[target])
        else:  # expire
            keep = data.draw(st.integers(1, max(1, len(versions))))
            for dead in t.expire(keep_last=keep):
                del versions[dead]
        live = t.latest_version()
        assert table_state() == versions[live], f"after {op}"
        # bucket map stays complete and readable
        via_buckets = {
            r.id: r.v
            for r in t.read_buckets(
                spark, list(range(n_buckets)), schema
            ).collect()
        }
        assert via_buckets == versions[live]
    if t.latest_version() > 0:
        with _pytest.raises(ValueError):
            t.commit(spark.createDataFrame([(1, 1)], schema))
    # every surviving historical version reconstructs
    for v, m in versions.items():
        got = {r.id: r.v for r in t.read(spark, v).collect()}
        assert got == m, f"version {v}"


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_fuzz_zonemap_cdf_against_model(spark, tmp_path_factory, data):
    """Model-based fuzz of the round-8 format surfaces together: random
    commit(stats_cols)/append/delete_where/compact_small sequences, and
    after EVERY op (a) the current read equals the model, (b) a random
    read_pruned range returns exactly the model's rows in range (zone-map
    pruning must be conservative, never lossy), and (c) the change feed
    from the previous version equals the model's bag diff — fast path and
    EXCEPT-ALL fallback both land here depending on the op drawn."""
    from collections import Counter

    from music_streaming_services_etl_pipeline_with_airflow_spark.snapshots import (
        SnapshotTable,
    )

    t = SnapshotTable(str(tmp_path_factory.mktemp("zm_fuzz") / "tbl"))
    model: dict[int, list[tuple]] = {}
    next_id = [0]

    def fresh_rows():
        n = data.draw(st.integers(min_value=0, max_value=6))
        rows = []
        for _ in range(n):
            next_id[0] += 1
            rows.append((next_id[0], data.draw(st.integers(0, 99))))
        return rows

    def to_df(rows):
        return spark.createDataFrame(rows, "id long, v long")

    n_ops = data.draw(st.integers(min_value=3, max_value=6))
    for _ in range(n_ops):
        cur = t.latest_version()
        choices = ["overwrite", "append"]
        if cur > 0:
            choices += ["delete", "compact_small", "restore"]
        op = data.draw(st.sampled_from(choices))
        if op == "overwrite":
            rows = fresh_rows()
            v = t.commit(to_df(rows), mode="overwrite", stats_cols=["v"])
            model[v] = list(rows)
        elif op == "append":
            rows = fresh_rows()
            v = t.commit(to_df(rows), mode="append", stats_cols=["v"])
            model[v] = (model.get(cur, []) if cur > 0 else []) + list(rows)
        elif op == "delete":
            cut = data.draw(st.integers(0, 99))
            v = t.delete_where(spark, f"v >= {cut}")
            model[v] = [r for r in model[cur] if r[1] < cut]
        elif op == "restore":
            target = data.draw(st.sampled_from(sorted(model)))
            v = t.restore(target)
            model[v] = list(model[target])
        else:
            v = t.compact_small(spark, small_bytes=1 << 30)
            if v != cur:
                model[v] = list(model[cur])
        live = t.latest_version()
        got = sorted(map(tuple, t.read(spark, live).collect())) if live else []
        assert got == sorted(model.get(live, [])), f"read after {op}"
        # (b) zone-map pruned range read == model filter
        lo = data.draw(st.integers(0, 99))
        hi = lo + data.draw(st.integers(0, 40))
        df, scanned, total = t.read_pruned(spark, "v", lo, hi)
        want = sorted(r for r in model[live] if lo <= r[1] <= hi)
        got = sorted(
            map(tuple, df.filter(f"v BETWEEN {lo} AND {hi}").collect())
        )
        assert got == want, f"pruned read after {op} [{lo},{hi}]"
        assert 0 <= scanned <= total
        # (c) change feed from the op's parent == bag diff of the model
        if cur > 0 and v > cur and cur in model:
            feed = Counter(
                (r.id, r.v, r._change_type)
                for r in t.changes(spark, cur, v).collect()
            )
            before, after = Counter(model[cur]), Counter(model[v])
            want_feed = Counter()
            for row, n in (after - before).items():
                want_feed[(*row, "insert")] = n
            for row, n in (before - after).items():
                want_feed[(*row, "delete")] = n
            assert feed == want_feed, f"change feed after {op}"


if _HAS_HYP:
    _RANK_VALS = st.integers(min_value=-5, max_value=5)

    @st.composite
    def _rank_rows(draw):
        n = draw(st.integers(min_value=0, max_value=60))
        groups = ["a", "b", "HUGE"]
        return [
            (i, draw(st.sampled_from(groups)), draw(_RANK_VALS))
            for i in range(n)
        ]

    @given(rows=_rank_rows())
    @settings(max_examples=20, deadline=None)
    def test_two_phase_rank_helpers_fuzzed(spark, rows):
        """Property fuzz for the r9 two-phase ranking helpers: on random
        tiny/empty/tie-heavy inputs, both must equal the plain global /
        grouped ROW_NUMBER window under the same strict total order. Ties
        in the value column force boundary ties; empty input must not
        crash (the 0-partition offset path)."""
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        from music_streaming_services_etl_pipeline_with_airflow_spark.functions.ranking import (
            two_phase_grouped_row_number,
            two_phase_row_number,
        )

        df = spark.createDataFrame(
            rows, "id long, grp string, v long"
        ) if rows else spark.createDataFrame([], "id long, grp string, v long")

        ranked, total = two_phase_row_number(
            df, [F.desc("v"), F.asc("id")], id_col="rn"
        )
        got = {r.id: r.rn for r in ranked.collect()}
        w = Window.orderBy(F.desc("v"), F.asc("id"))
        want = {
            r.id: r.rn
            for r in df.select(
                "id", F.row_number().over(w).cast("long").alias("rn")
            ).collect()
        }
        assert got == want and total == len(rows)

        granked = two_phase_grouped_row_number(
            df, ["grp"], [F.desc("v"), F.asc("id")], id_col="rn", total_col="n"
        )
        ggot = {r.id: (r.rn, r.n) for r in granked.collect()}
        gw = Window.partitionBy("grp").orderBy(F.desc("v"), F.asc("id"))
        gwant = {
            r.id: (r.rn, r.n)
            for r in df.select(
                "id",
                F.row_number().over(gw).cast("long").alias("rn"),
                F.count("*")
                .over(Window.partitionBy("grp"))
                .cast("long")
                .alias("n"),
            ).collect()
        }
        assert ggot == gwant

        # cardinality guard: grouping by the unique id makes the offset
        # map exactly len(rows) entries (every singleton group lives in
        # one partition), so whether a cap of 3 trips is deterministic
        import pytest

        if len(rows) > 3:
            with pytest.raises(ValueError, match="cardinality is too high"):
                two_phase_grouped_row_number(
                    df,
                    ["id"],
                    [F.desc("v"), F.asc("id")],
                    max_offset_rows=3,
                )


if _HAS_HYP:

    @st.composite
    def _pack_corpus_and_cuts(draw):
        n = draw(st.integers(min_value=0, max_value=70))
        ids = sorted(
            draw(
                st.sets(
                    st.integers(min_value=0, max_value=600),
                    min_size=n,
                    max_size=n,
                )
            )
        )
        rows = [
            (
                i,
                draw(st.sampled_from(["sA", "sB"])),
                draw(st.integers(min_value=1, max_value=60)),
            )
            for i in ids
        ]
        cuts = sorted(
            draw(st.sets(st.integers(min_value=0, max_value=n), max_size=5))
        )
        return rows, cuts

    @given(data=_pack_corpus_and_cuts())
    @settings(max_examples=15, deadline=None)
    def test_seeded_packer_random_batch_boundaries(spark, data):
        """The maintained == recomputed drills elsewhere use a fixed
        4-file split; this drives greedy_stream_kernel_seeded + the tail
        recurrence over RANDOM batch partitions of a random corpus
        (random doc_id gaps, random sources, random token sizes, 0-6
        batches including empty ones) and asserts the accumulated packs
        equal pack_documents_sharded over the whole corpus. Splitting a
        doc_id-sorted corpus at arbitrary positions preserves the
        per-shard monotone-arrival contract by construction."""
        import pandas as pd

        from music_streaming_services_etl_pipeline_with_airflow_spark.operators.packing import (
            PACK_BUDGET,
            SHARD_SPAN,
            greedy_stream_kernel_seeded,
            pack_documents_sharded,
        )

        rows, cuts = data
        out_cols = ["source", "shard", "doc_id", "n_tokens", "pack_id", "pack_used"]
        kernel = greedy_stream_kernel_seeded(
            ["source", "shard"], "n_tokens", PACK_BUDGET, out_cols
        )
        tails: dict = {}  # (source, shard) -> (pack_id, used)
        packs: dict = {}  # doc_id -> (source, shard, pack_id, pack_used)
        bounds = [0, *cuts, len(rows)]
        for lo, hi in zip(bounds, bounds[1:]):
            batch = rows[lo:hi]
            if not batch:
                continue
            recs = [
                (
                    src,
                    did // SHARD_SPAN,
                    did,
                    tok,
                    *(tails.get((src, did // SHARD_SPAN)) or (None, None)),
                )
                for did, src, tok in batch
            ]
            pdf = pd.DataFrame(
                # shard-contiguous + doc_id-ordered, what the applier's
                # repartition + sortWithinPartitions guarantees
                sorted(recs, key=lambda r: (r[0], r[1], r[2])),
                columns=[*out_cols[:4], "_init_pack_id", "_init_used"],
            )
            for out in kernel(iter([pdf])):
                for r in out.itertuples(index=False):
                    packs[r.doc_id] = (r.source, r.shard, r.pack_id, r.pack_used)
                    # tail merge: per shard, the max-doc_id row wins —
                    # rows arrive doc_id-sorted, so last write is it
                    tails[(r.source, r.shard)] = (r.pack_id, r.pack_used)
        df = (
            spark.createDataFrame(
                # " ".join (no trailing space): split(text,' ') must count
                # exactly t tokens
                [(d, s, " ".join(["w"] * t)) for d, s, t in rows],
                "doc_id long, source string, text string",
            )
            if rows
            else spark.createDataFrame([], "doc_id long, source string, text string")
        )
        want = {
            r.doc_id: (r.source, r.shard, r.pack_id, r.pack_used)
            for r in pack_documents_sharded(df).collect()
        }
        assert packs == want


if _HAS_HYP:

    @st.composite
    def _mh_corpus_and_cuts(draw):
        # families of near-dups: docs in the same family share a long
        # common prefix and differ in one trailing token; families are
        # token-disjoint. Some members are EXACT copies of their family's
        # first text (exercising the r12 exact-collapse front across
        # arbitrary arrival orders). Random family sizes, random SPLIT.
        n_fam = draw(st.integers(min_value=1, max_value=4))
        rows = []
        did = 0
        for f in range(n_fam):
            size = draw(st.integers(min_value=1, max_value=4))
            base = " ".join(f"f{f}w{j}" for j in range(10))
            for m in range(size):
                if m > 0 and draw(st.booleans()):
                    text = base + f" tail{f}_0"  # exact copy of member 0
                else:
                    text = base + f" tail{f}_{m}"
                rows.append((did, text))
                did += draw(st.integers(min_value=1, max_value=7))
        perm = draw(st.permutations(rows))
        cuts = sorted(
            draw(st.sets(st.integers(min_value=0, max_value=len(rows)), max_size=3))
        )
        return perm, cuts

    @given(data=_mh_corpus_and_cuts())
    @settings(max_examples=6, deadline=None)
    def test_minhash_index_random_batch_boundaries(spark, tmp_path_factory, data):
        """The near-dup index claims ARRIVAL-ORDER INDEPENDENCE: after any
        batch partitioning of any corpus, maintained pairs equal the
        whole-corpus batch operator. Drive the applier over a random
        PERMUTATION of a random dup-family corpus split at random cut
        points (unlike the pack index, no monotonicity is required) and
        assert exact pair-set equality including Jaccard values."""
        from music_streaming_services_etl_pipeline_with_airflow_spark.operators.dedup import (
            JACCARD_THRESHOLD,
            _pair_jaccard,
            doc_shingles,
            lsh_candidate_pairs,
            minhash_signatures,
        )
        from music_streaming_services_etl_pipeline_with_airflow_spark.snapshots import (
            SnapshotTable,
        )
        from music_streaming_services_etl_pipeline_with_airflow_spark.streaming.ingest import (
            make_minhash_index_applier,
            serve_minhash_pairs,
        )
        from pyspark.sql import functions as F

        rows, cuts = data
        d = tmp_path_factory.mktemp("mhfuzz")
        pairs_t = SnapshotTable(str(d / "pairs"))
        bands_t = SnapshotTable(str(d / "bands"))
        shingles_t = SnapshotTable(str(d / "shingles"))
        groups_t = SnapshotTable(str(d / "groups"))
        members_t = SnapshotTable(str(d / "members"))
        apply_batch = make_minhash_index_applier(
            pairs_t, bands_t, shingles_t, groups_t, members_t, n_buckets=4
        )
        schema = "doc_id long, text string"
        bounds = [0, *cuts, len(rows)]
        bid = 0
        for lo, hi in zip(bounds, bounds[1:]):
            if rows[lo:hi]:
                apply_batch(spark.createDataFrame(rows[lo:hi], schema), bid)
                bid += 1
        stored = (
            {
                (r.da, r.db, round(r.jaccard, 9))
                for r in serve_minhash_pairs(
                    spark, pairs_t, groups_t, members_t
                ).collect()
            }
            if pairs_t.latest_version() > 0
            else set()
        )
        df = spark.createDataFrame(rows, schema)
        sh = doc_shingles(df)
        want = {
            (r.da, r.db, round(r.jaccard, 9))
            for r in _pair_jaccard(
                sh, lsh_candidate_pairs(minhash_signatures(sh))
            )
            .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
            .collect()
        }
        assert stored == want
