"""Snapshot table format properties: atomic manifest commits, time travel,
append vs overwrite lineage, orphan invisibility, crash-retry safety."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from music_streaming_services_etl_pipeline_with_airflow_spark.snapshots import SnapshotTable


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_overwrite_time_travel(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    d1 = spark.range(5).select(F.col("id"), F.lit("a").alias("tag"))
    d2 = spark.range(3).select(F.col("id"), F.lit("b").alias("tag"))
    v1 = t.commit(d1)
    v2 = t.commit(d2)
    assert (v1, v2) == (1, 2)
    assert t.versions() == [1, 2]
    # latest == v2; v1 still reconstructs bit-for-bit
    assert _rows(t.read(spark)) == _rows(d2)
    assert _rows(t.read(spark, v1)) == _rows(d1)


def test_append_extends_parent(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    d1 = spark.range(0, 4).select("id")
    d2 = spark.range(4, 6).select("id")
    t.commit(d1)
    t.commit(d2, mode="append")
    assert _rows(t.read(spark)) == [(i,) for i in range(6)]
    assert _rows(t.read(spark, 1)) == [(i,) for i in range(4)]


def test_orphan_data_dir_is_invisible(spark, tmp_path):
    """A data dir without a manifest (crash between data write and commit)
    must never be read, and a subsequent commit must not collide with it."""
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.commit(spark.range(3).select("id"))
    # simulate a crashed attempt at version 2: data written, no manifest
    orphan = str(tmp_path / "tbl" / "data" / "v000002")
    spark.range(100, 200).select("id").write.parquet(orphan)
    assert t.latest_version() == 1
    assert _rows(t.read(spark)) == [(0,), (1,), (2,)]
    # the retry lands beside the orphan and commits cleanly
    v2 = t.commit(spark.range(50, 53).select("id"))
    assert v2 == 2
    assert _rows(t.read(spark)) == [(50,), (51,), (52,)]
    assert os.path.exists(orphan)  # orphan left in place, still dark


def test_manifest_publish_is_atomic(tmp_path):
    """No partially-written manifest is ever visible under the final name:
    the temp file lives in the same dir and lands via os.replace."""
    t = SnapshotTable(str(tmp_path / "tbl"))
    t._write_manifest({"version": 1, "parent": 0, "mode": "overwrite", "dirs": []})
    names = os.listdir(t._mdir)
    assert names == ["v000001.json"]  # no .tmp residue


def test_merge_branches(spark, tmp_path):
    """WHEN MATCHED updates, WHEN NOT MATCHED inserts with defaults,
    untouched target rows pass through — and the pre-merge version is
    still readable afterwards."""
    t = SnapshotTable(str(tmp_path / "tbl"))
    tgt = spark.createDataFrame(
        [(1, "x", 0), (2, "y", 0)], "k long, seg string, cnt long"
    )
    v1 = t.commit(tgt)
    delta = spark.createDataFrame([(2, 7), (3, 9)], "k long, d long")
    v2 = t.merge(
        spark,
        delta,
        on="k",
        update={"seg": "'ACTIVE'", "cnt": "d"},
        insert_defaults={"seg": "'NEW'", "cnt": "d"},
    )
    assert _rows(t.read(spark, v2)) == [
        (1, "x", 0),  # untouched passes through
        (2, "ACTIVE", 7),  # matched: updated
        (3, "NEW", 9),  # not matched: inserted with defaults
    ]
    assert _rows(t.read(spark, v1)) == _rows(tgt)


def test_expire_refcounts_shared_dirs(spark, tmp_path):
    """Expiration must not delete a data dir that a surviving version still
    references through append lineage, and must delete dirs only dead
    versions reference; expired versions stop being readable."""
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.commit(spark.range(0, 2).select("id"))  # v1
    t.commit(spark.range(2, 4).select("id"), mode="append")  # v2 = v1 dirs + new
    t.commit(spark.range(4, 6).select("id"), mode="append")  # v3 = v1+v2+new
    v1_dir = t._manifest(1)["dirs"][0]
    expired = t.expire(keep_last=1)
    assert expired == [1, 2]
    assert t.versions() == [3]
    # v1's dir survives: v3's append lineage still references it
    assert os.path.isdir(v1_dir)
    assert _rows(t.read(spark)) == [(i,) for i in range(6)]
    # now overwrite and expire: the whole old lineage is dead
    t.commit(spark.range(9, 10).select("id"), mode="overwrite")  # v4
    t.expire(keep_last=1)
    assert not os.path.isdir(v1_dir)
    assert _rows(t.read(spark)) == [(9,)]
    assert t.versions() == [4]


def test_delete_where_copy_on_write(spark, tmp_path):
    """delete_where removes predicate-TRUE rows into a new version, keeps
    the parent readable (time travel), rewrites ONLY the dirs that contain
    matches (untouched dirs carry over by reference), and keeps rows where
    the predicate evaluates to NULL (SQL DELETE three-valued logic)."""
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.commit(
        spark.createDataFrame([(1, 10), (2, 20)], "id long, v long")
    )  # v1: no matches for v > 90
    t.commit(
        spark.createDataFrame([(3, 95), (4, 40), (5, None)], "id long, v long"),
        mode="append",
    )  # v2 adds the only matching dir (and a NULL-predicate row)
    clean_dir = t._manifest(1)["dirs"][0]
    v3 = t.delete_where(spark, "v > 90")
    assert v3 == 3
    # predicate-TRUE row gone; FALSE and NULL rows kept
    assert _rows(t.read(spark, v3).select("id")) == [(1,), (2,), (4,), (5,)]
    # parent version still shows the deleted row (time travel isolation)
    assert _rows(t.read(spark, 2).select("id")) == [(1,), (2,), (3,), (4,), (5,)]
    # the match-free dir was carried over by reference, not rewritten
    assert clean_dir in t._manifest(v3)["dirs"]
    # a delete matching nothing commits a manifest-only version
    v4 = t.delete_where(spark, "v > 1000")
    assert _rows(t.read(spark, v4).select("id")) == [(1,), (2,), (4,), (5,)]
    assert set(t._manifest(v4)["dirs"]) == set(t._manifest(v3)["dirs"])
    # expire(1) physically removes the pre-delete lineage dirs that the
    # surviving version no longer references (the GDPR completion step)
    import os as _os

    dead = [d for d in t._manifest(2)["dirs"] if d not in t._manifest(v4)["dirs"]]
    t.expire(keep_last=1)
    assert dead and all(not _os.path.isdir(d) for d in dead)


def test_compact_rewrites_fragmented_lineage(spark, tmp_path):
    """compact() folds a multi-dir append lineage into one dir with
    identical content; an already-compact table is a no-op; expire then
    physically drops the fragments."""
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.commit(spark.range(0, 2).select("id"))
    t.commit(spark.range(2, 4).select("id"), mode="append")
    t.commit(spark.range(4, 6).select("id"), mode="append")
    assert len(t._manifest(3)["dirs"]) == 3
    v4 = t.compact(spark)
    assert v4 == 4
    assert len(t._manifest(v4)["dirs"]) == 1
    assert _rows(t.read(spark)) == [(i,) for i in range(6)]
    # already compact -> no new version
    assert t.compact(spark) == v4
    # fragments die with their last referencing manifest
    import os as _os

    frags = t._manifest(3)["dirs"]
    t.expire(keep_last=1)
    assert all(not _os.path.isdir(d) for d in frags)
    assert _rows(t.read(spark)) == [(i,) for i in range(6)]


def test_restore_is_manifest_only(spark, tmp_path):
    """restore() flips the table back to an earlier version as a new
    commit without touching data: same dirs by reference, the bad history
    stays readable, and expire() keeps shared dirs alive."""
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.commit(spark.range(0, 3).select("id"))  # v1: good
    t.commit(spark.range(90, 91).select("id"))  # v2: the bad deploy
    v3 = t.restore(1)
    assert v3 == 3
    assert _rows(t.read(spark)) == [(0,), (1,), (2,)]
    # manifest-only: v3 references v1's dir, no new data dir was written
    assert t._manifest(3)["dirs"] == t._manifest(1)["dirs"]
    # forensics: the bad version is still readable
    assert _rows(t.read(spark, 2)) == [(90,)]
    # expire to the restored head: v1's dir survives (v3 references it)
    t.expire(keep_last=1)
    assert _rows(t.read(spark)) == [(0,), (1,), (2,)]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        t.restore(99)


def test_history_describes_every_commit(spark, tmp_path):
    """DESCRIBE HISTORY: one row per version with mode lineage — commit,
    append, delete, restore — from manifest metadata alone."""
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.commit(spark.createDataFrame([(1, 5)], "id long, v long"))
    t.commit(spark.createDataFrame([(2, 95)], "id long, v long"), mode="append")
    t.delete_where(spark, "v > 90")
    t.restore(2)
    got = sorted(
        (r.version, r.mode, r.parent, r.restored_from)
        for r in t.history(spark).collect()
    )
    assert got == [
        (1, "overwrite", 0, None),
        (2, "append", 1, None),
        (3, "delete", 2, None),
        (4, "restore", 3, 2),
    ]


def test_commit_buckets_rewrites_only_touched(spark, tmp_path):
    """Bucketed copy-on-write: a commit that touches a subset of buckets
    rewrites only those dirs; every other bucket's manifest entry is the
    SAME path as the parent's (carried by reference, zero bytes written);
    read() and time travel see the flat dir union with no phantom
    partition column."""
    t = SnapshotTable(str(tmp_path / "tbl"))
    n = 8
    d = spark.range(0, 64).select(
        F.col("id"), (F.col("id") * 10).alias("v")
    ).withColumn("_bucket", SnapshotTable.bucket_of(F.col("id"), n))
    v1 = t.commit_buckets(d, touched=list(range(n)))
    m1 = t._bucket_map(v1)

    # rewrite only key 7's bucket
    b7 = (
        spark.range(7, 8)
        .select(F.col("id"), F.lit(999).alias("v"))
        .withColumn("_bucket", SnapshotTable.bucket_of(F.col("id"), n))
    )
    touched = b7.select("_bucket").first()["_bucket"]
    # new bucket content = old rows of that bucket with id 7 replaced
    old = t.read_buckets(spark, [touched], "id long, v long").filter("id <> 7")
    v2 = t.commit_buckets(
        old.withColumn("_bucket", SnapshotTable.bucket_of(F.col("id"), n))
        .unionByName(b7),
        touched=[touched],
    )
    m2 = t._bucket_map(v2)
    for b in map(str, range(n)):
        if int(b) == touched:
            assert m2[b] != m1[b]
        else:
            assert m2[b] == m1[b], f"untouched bucket {b} was rewritten"

    got = dict(_rows(t.read(spark)))
    assert got[7] == 999 and got[6] == 60 and len(got) == 64
    assert "_bucket" not in t.read(spark).columns  # partition col stays out
    # time travel to v1 still shows the old value
    assert dict(_rows(t.read(spark, v1)))[7] == 70
    # an emptied touched bucket becomes an empty entry, not a dangling dir
    empty = spark.createDataFrame([], "id long, v long").withColumn(
        "_bucket", SnapshotTable.bucket_of(F.col("id"), n)
    )
    v3 = t.commit_buckets(empty, touched=[touched])
    assert t._bucket_map(v3)[str(touched)] == []
    assert 7 not in dict(_rows(t.read(spark)))


def test_cdc_applier_prunes_buckets(spark, tmp_path):
    """The CDC applier's per-batch work is bucket-pruned: a batch touching
    one key rewrites exactly that key's bucket dir and reads no other
    bucket; results stay equal to latest-change-per-key semantics."""
    import datetime as dt

    from music_streaming_services_etl_pipeline_with_airflow_spark.streaming.ingest import (
        make_cdc_applier,
    )

    t = SnapshotTable(str(tmp_path / "state"))
    n = 8
    apply_batch = make_cdc_applier(t, n_buckets=n)
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    )

    def _ev(eid, minute, u, typ, v):
        return (eid, dt.datetime(2024, 1, 1, 10, minute), u, typ, v, None)

    apply_batch(
        spark.createDataFrame(
            [_ev(i, 0, u, "view", float(u)) for i, u in enumerate(range(1, 33))],
            schema,
        ),
        0,
    )
    m1 = t._bucket_map(t.latest_version())
    assert sum(len(ds) for ds in m1.values()) >= 2  # state spans buckets

    apply_batch(spark.createDataFrame([_ev(100, 5, 1, "click", 42.0)], schema), 1)
    m2 = t._bucket_map(t.latest_version())
    changed = [b for b in m1 if m2[b] != m1[b]]
    assert len(changed) == 1, f"expected 1 rewritten bucket, got {changed}"
    live = {
        r.user_id: r.value_milli
        for r in t.read(spark).filter("NOT deleted").collect()
    }
    assert live[1] == 42000 and live[2] == 2000 and len(live) == 32


def test_schema_evolution_additive(spark, tmp_path):
    """Additive schema evolution: an append whose schema adds a column
    flips the lineage to merged reads — old rows surface NULL in the new
    column (Delta/Iceberg ADD COLUMN semantics), time travel to the
    pre-evolution version keeps the OLD schema untouched, delete/restore
    carry the evolution flag, and an overwrite resets the table to
    single-schema reads."""
    t = SnapshotTable(str(tmp_path / "tbl"))
    v1 = t.commit(spark.createDataFrame([(1, 10), (2, 20)], "id long, v long"))
    v2 = t.commit(
        spark.createDataFrame([(3, 30, "x")], "id long, v long, tag string"),
        mode="append",
    )
    cur = t.read(spark)
    assert set(cur.columns) == {"id", "v", "tag"}
    got = {r.id: r.tag for r in cur.collect()}
    assert got == {1: None, 2: None, 3: "x"}
    # pre-evolution version: old schema, no phantom column
    assert set(t.read(spark, v1).columns) == {"id", "v"}
    # delete on the evolved lineage keeps merged reads working
    v3 = t.delete_where(spark, "v = 20")
    assert {r.id for r in t.read(spark, v3).collect()} == {1, 3}
    assert set(t.read(spark, v3).columns) == {"id", "v", "tag"}
    # restore to the evolved version carries the flag
    v4 = t.restore(v2)
    assert {r.id: r.tag for r in t.read(spark, v4).collect()} == {
        1: None, 2: None, 3: "x"
    }
    # delete with a predicate on the ADDED column: pre-evolution dirs
    # must read NULL there (ADD COLUMN semantics), not crash
    v4b = t.delete_where(spark, "tag = 'x'")
    assert {r.id for r in t.read(spark, v4b).collect()} == {1, 2}
    # overwrite resets: single schema again, flag off
    v5 = t.commit(spark.createDataFrame([(9, 90)], "id long, v long"))
    assert not t._manifest(v5)["mixed_schemas"]
    assert set(t.read(spark).columns) == {"id", "v"}


def test_merge_bucketed_rewrites_only_touched(spark, tmp_path):
    """merge_bucketed: identical WHEN MATCHED / NOT MATCHED semantics to
    plain merge, but only the delta's key buckets are read and rewritten;
    untouched buckets carry over by reference. Matches a plain-merge twin
    row-for-row."""
    n = 8
    schema = "id long, v long, tag string"

    def seed(t):
        d = spark.createDataFrame(
            [(i, i * 10, "old") for i in range(32)], schema
        )
        t.commit_buckets(
            d.withColumn("_bucket", SnapshotTable.bucket_of(F.col("id"), n)),
            touched=list(range(n)),
        )

    tb = SnapshotTable(str(tmp_path / "bucketed"))
    seed(tb)
    m1 = tb._bucket_map(tb.latest_version())
    delta = spark.createDataFrame([(1, 999, "x"), (100, 5, "x")], schema)
    tb.merge_bucketed(
        spark,
        delta.select("id", F.col("v").alias("dv")),
        on="id",
        update={"v": "dv", "tag": "'upd'"},
        insert_defaults={"v": "dv", "tag": "'new'"},
        n_buckets=n,
        schema=schema,
    )
    m2 = tb._bucket_map(tb.latest_version())
    want_touched = {
        r["_b"]
        for r in delta.select(
            SnapshotTable.bucket_of(F.col("id"), n).alias("_b")
        ).collect()
    }
    changed = {int(b) for b in m2 if m2[b] != m1.get(b)}
    assert changed == want_touched
    got = {(r.id, r.v, r.tag) for r in tb.read(spark).collect()}
    # plain-merge twin on an unbucketed copy
    tp = SnapshotTable(str(tmp_path / "plain"))
    tp.commit(spark.createDataFrame([(i, i * 10, "old") for i in range(32)], schema))
    tp.merge(
        spark,
        delta.select("id", F.col("v").alias("dv")),
        on="id",
        update={"v": "dv", "tag": "'upd'"},
        insert_defaults={"v": "dv", "tag": "'new'"},
    )
    want = {(r.id, r.v, r.tag) for r in tp.read(spark).collect()}
    assert got == want
    assert (1, 999, "upd") in got and (100, 5, "new") in got
    # duplicate-key delta rejected on the bucketed path too
    import pytest as _pytest

    dup = spark.createDataFrame([(1, 1, "a"), (1, 2, "b")], schema).select(
        "id", F.col("v").alias("dv")
    )
    with _pytest.raises(ValueError):
        tb.merge_bucketed(
            spark, dup, on="id", update={"v": "dv"},
            insert_defaults={"v": "dv"}, n_buckets=n, schema=schema,
        )


def test_bucketed_lineage_survives_delete_and_restore(spark, tmp_path):
    """Cross-op interactions on a BUCKETED table: delete_where rewrites
    only match-bearing bucket dirs while preserving the bucket map (dir
    identity carries the bucket — no key column needed), restore carries
    the map forward, compact refuses instead of flattening it, and
    read_buckets keeps pruning correctly through the whole lineage."""
    import pytest as _pytest

    n = 4
    t = SnapshotTable(str(tmp_path / "tbl"))
    d = spark.range(0, 40).select(
        F.col("id"), (F.col("id") % 100).alias("v")
    ).withColumn("_bucket", SnapshotTable.bucket_of(F.col("id"), n))
    v1 = t.commit_buckets(d, touched=list(range(n)))
    m1 = t._bucket_map(v1)

    # delete rows with id in exactly one bucket; that bucket's dir is
    # rewritten, match-free buckets carry over by reference
    target = d.filter("id = 7").select("_bucket").first()["_bucket"]
    v2 = t.delete_where(spark, "id = 7")
    m2 = t._bucket_map(v2)
    assert m2[str(target)] != m1[str(target)]
    carried = [b for b in m2 if m2[b] == m1[b]]
    assert len(carried) >= 1  # buckets with no id=7 row are untouched
    assert 7 not in {r.id for r in t.read(spark).collect()}
    # read_buckets still prunes correctly post-delete
    got = {r.id for r in t.read_buckets(spark, [target], "id long, v long").collect()}
    assert 7 not in got and got  # the bucket still has its other rows

    # restore to v1 keeps the bucket map; read_buckets works on the head
    v3 = t.restore(v1)
    assert t._bucket_map(v3) == m1
    assert 7 in {r.id for r in t.read(spark).collect()}
    assert t.read_buckets(spark, list(range(n)), "id long, v long").count() == 40

    with _pytest.raises(ValueError):
        t.compact(spark)
    # a plain commit against a bucketed parent must fail FAST, not strand
    # the bucket map for the next read_buckets to trip over
    with _pytest.raises(ValueError):
        t.commit(spark.createDataFrame([(1, 1)], "id long, v long"))


def test_concurrent_commit_loses_cas_not_data(spark, tmp_path):
    """Two writers racing to the same version: the manifest publish is an
    exclusive-create CAS, so exactly one wins; the loser raises
    ConcurrentWriteError, the winner's state is intact, and the loser's
    retry (on the new latest) succeeds as the NEXT version."""
    import pytest as _pytest

    from music_streaming_services_etl_pipeline_with_airflow_spark.snapshots import (
        ConcurrentWriteError,
    )

    t1 = SnapshotTable(str(tmp_path / "tbl"))
    t2 = SnapshotTable(str(tmp_path / "tbl"))  # second handle, same table
    t1.commit(spark.createDataFrame([(1, 10)], "id long, v long"))
    # both handles see v1 and race to commit v2; t1 wins
    t1.commit(spark.createDataFrame([(2, 20)], "id long, v long"))
    # simulate t2 having computed against the stale parent: force its
    # next manifest to collide by replaying a commit for version 2
    df = spark.createDataFrame([(3, 30)], "id long, v long")
    data_dir = t2._fresh_data_dir(2)
    df.write.mode("error").parquet(data_dir)
    with _pytest.raises(ConcurrentWriteError):
        t2._write_manifest(
            {"version": 2, "parent": 1, "mode": "overwrite", "dirs": [data_dir]}
        )
    # winner's state intact
    assert _rows(t1.read(spark)) == [(2, 20)]
    # loser retries on the new latest and lands as v3
    v3 = t2.commit(df)
    assert v3 == 3
    assert _rows(t2.read(spark)) == [(3, 30)]
    assert _rows(t2.read(spark, 2)) == [(2, 20)]  # history intact


def test_streaming_matview_accumulates_and_time_travels(spark):
    """The streaming materialized view: 4 micro-batches MERGE partial
    aggregates into the bucketed snapshot table; every intermediate view
    state stays time-travel readable, versions grow per batch, and the
    final state equals the one-shot batch recompute."""
    from music_streaming_services_etl_pipeline_with_airflow_spark.plans.registry import (
        all_specs,
    )
    from music_streaming_services_etl_pipeline_with_airflow_spark.snapshots import (
        SnapshotTable,
    )
    from music_streaming_services_etl_pipeline_with_airflow_spark.workdirs import (
        _ROOT,
    )
    import os

    sf = "/root/testdata/sf0.001"
    specs = all_specs()
    got = {
        (str(r.date), r.segment): (r.n_events, r.value_cents)
        for r in specs["streaming_matview_join_enrich"].fn(spark, sf).collect()
    }
    want = {
        (str(r.date), r.segment): (r.n_events, r.value_cents)
        for r in specs["ivm_incremental_join_enrich"].fn(spark, sf).collect()
    }
    assert got == want
    # the view's history: one bucketed version per non-empty batch, all
    # readable, monotonically growing row counts
    t = SnapshotTable(os.path.join(_ROOT, "streaming_matview", "matview"))
    vs = t.versions()
    assert len(vs) >= 2  # several micro-batches committed
    counts = [t.read(spark, v).count() for v in vs]
    assert counts == sorted(counts)
    assert t._bucket_map(vs[-1])  # bucketed lineage end to end


def test_schema_evolved_delete_on_added_column_predicate(spark, tmp_path):
    """The second-review repro: delete_where with a predicate on the ADDED
    column must read pre-evolution dirs under the union schema on BOTH
    the probe AND the rewrite — 'tag IS NULL' matches every pre-evolution
    row (NULL there), deletes them, and keeps the evolved rows."""
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.commit(spark.createDataFrame([(1, 10), (2, 20)], "id long, v long"))
    t.commit(
        spark.createDataFrame([(3, 30, "x")], "id long, v long, tag string"),
        mode="append",
    )
    v = t.delete_where(spark, "tag IS NULL")
    assert {r.id for r in t.read(spark, v).collect()} == {3}
    # and the inverse predicate keeps the pre-evolution rows
    t2 = SnapshotTable(str(tmp_path / "tbl2"))
    t2.commit(spark.createDataFrame([(1, 10)], "id long, v long"))
    t2.commit(
        spark.createDataFrame([(3, 30, "x")], "id long, v long, tag string"),
        mode="append",
    )
    v2 = t2.delete_where(spark, "tag = 'x'")
    assert {r.id for r in t2.read(spark, v2).collect()} == {1}


def test_n_buckets_recorded_and_mismatch_raises(spark, tmp_path):
    """The bucket count is part of the table's identity: recorded in the
    manifest on the first bucketed commit, carried through delete/restore,
    and any reader/writer passing a DIFFERENT count fails loudly instead
    of hashing keys under the wrong mod (which would silently duplicate
    keys across buckets)."""
    import pytest as _pytest

    n = 8
    schema = "id long, v long"
    t = SnapshotTable(str(tmp_path / "tbl"))
    d = spark.createDataFrame(
        [(i, i * 10) for i in range(16)], "id long, d_v long"
    )
    t.merge_bucketed(
        spark, d, on="id", update={"v": "d_v"}, insert_defaults={"v": "d_v"},
        n_buckets=n, schema=schema,
    )
    assert t.latest_manifest_field("n_buckets") == n
    delta = spark.createDataFrame([(1, 999)], "id long, d_v long")
    with _pytest.raises(ValueError, match="n_buckets"):
        t.merge_bucketed(
            spark, delta, on="id", update={"v": "d_v"},
            insert_defaults={"v": "d_v"}, n_buckets=16, schema=schema,
        )
    with _pytest.raises(ValueError, match="n_buckets"):
        t.read_buckets(spark, [0], schema, n_buckets=4)
    # the count survives delete_where and restore
    v = t.delete_where(spark, "id = 3")
    assert t._manifest(v)["n_buckets"] == n
    v2 = t.restore(v)
    assert t._manifest(v2)["n_buckets"] == n
    # and the correct count still works after both
    t.merge_bucketed(
        spark, delta, on="id", update={"v": "d_v"},
        insert_defaults={"v": "d_v"}, n_buckets=n, schema=schema,
    )
    got = dict(_rows(t.read(spark)))
    assert got[1] == 999 and 3 not in got


def test_commit_buckets_fails_fast_on_nonbucketed_parent(spark, tmp_path):
    """Wrong-lineage commit_buckets (parent written by plain commit) must
    fail BEFORE writing any data — no orphan data dir per retry."""
    import pytest as _pytest

    t = SnapshotTable(str(tmp_path / "tbl"))
    t.commit(spark.createDataFrame([(1, 10)], "id long, v long"))
    d = spark.createDataFrame([(2, 20)], "id long, v long").withColumn(
        "_bucket", SnapshotTable.bucket_of(F.col("id"), 4)
    )
    data_root = str(tmp_path / "tbl" / "data")
    before = set(os.listdir(data_root))
    with _pytest.raises(ValueError, match="not a bucketed commit"):
        t.commit_buckets(d, touched=[0, 1, 2, 3], n_buckets=4)
    assert set(os.listdir(data_root)) == before  # zero bytes written


def test_bucketed_delete_full_bucket_records_empty_list(spark, tmp_path):
    """A delete that empties a bucket records [] for it (commit_buckets'
    empty-bucket convention), not a rows-free parquet dir that every later
    read and carry-over keeps touching."""
    n = 4
    schema = "id long, v long"
    t = SnapshotTable(str(tmp_path / "tbl"))
    d = spark.createDataFrame(
        [(i, i * 10) for i in range(16)], "id long, d_v long"
    )
    t.merge_bucketed(
        spark, d, on="id", update={"v": "d_v"}, insert_defaults={"v": "d_v"},
        n_buckets=n, schema=schema,
    )
    # find one key's bucket and delete EVERY key in that bucket
    bdf = d.withColumn("_b", SnapshotTable.bucket_of(F.col("id"), n))
    b0 = bdf.select("_b").first()["_b"]
    ids = [r.id for r in bdf.filter(F.col("_b") == b0).collect()]
    v = t.delete_where(spark, f"id IN ({','.join(map(str, ids))})")
    bm = t._bucket_map(v)
    assert bm[str(b0)] == []
    # dirs list carries no empty-bucket dir; reads stay correct
    assert all(os.path.isdir(p) for p in t._manifest(v)["dirs"])
    got = dict(_rows(t.read(spark)))
    assert set(got) == {i for i in range(16)} - set(ids)
    # and the emptied bucket reads as a typed empty relation
    assert t.read_buckets(spark, [b0], schema, n_buckets=n).count() == 0


def test_bucketed_delete_emptying_every_bucket_keeps_table_readable(
    spark, tmp_path
):
    """Fuzz-found regression pin: a delete that empties EVERY bucket leaves
    a version whose manifest references zero data dirs (each bucket is []).
    read() must rebuild the typed empty relation from the manifest's
    recorded schema — not hand spark.read.parquet() an empty path list —
    and the lineage must keep accepting merges afterwards."""
    schema = "id long, v long"
    t = SnapshotTable(str(tmp_path / "tbl"))
    d = spark.createDataFrame([(1, 5), (2, 7)], "id long, d_v long")
    t.merge_bucketed(
        spark, d, on="id", update={"v": "d_v"}, insert_defaults={"v": "d_v"},
        n_buckets=4, schema=schema,
    )
    v = t.delete_where(spark, "v >= 1")  # removes every row
    assert t._manifest(v)["dirs"] == []
    empty = t.read(spark)
    assert empty.count() == 0
    assert [f.name for f in empty.schema.fields] == ["id", "v"]
    assert t.read_buckets(spark, [0, 1, 2, 3], schema, n_buckets=4).count() == 0
    # the lineage continues: a later merge re-populates normally
    d2 = spark.createDataFrame([(3, 9)], "id long, d_v long")
    t.merge_bucketed(
        spark, d2, on="id", update={"v": "d_v"}, insert_defaults={"v": "d_v"},
        n_buckets=4, schema=schema,
    )
    assert dict(_rows(t.read(spark))) == {3: 9}


def test_matview_replay_skips_applied_batch(spark, tmp_path):
    """foreachBatch is at-least-once: replaying an already-applied batch_id
    must be a no-op (the merge SUMs partials, so a replay would otherwise
    double-count). The guard rides in the snapshot manifest so data commit
    and replay cursor advance atomically."""
    import datetime as dt

    from music_streaming_services_etl_pipeline_with_airflow_spark.streaming.ingest import (
        make_matview_applier,
    )

    t = SnapshotTable(str(tmp_path / "mv"))
    dim = spark.createDataFrame([(1, "SEG-A"), (2, "SEG-B")],
                                "user_id long, segment string")
    apply_batch = make_matview_applier(t, dim, n_buckets=4)
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    )
    b0 = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 10), 1, "view", 2.5, None),
         (2, dt.datetime(2024, 1, 1, 11), 2, "view", 1.0, None)], schema
    )
    apply_batch(b0, 0)
    state1 = _rows(t.read(spark))
    v1 = t.latest_version()
    # replay of batch 0 (crash between manifest and checkpoint commit)
    apply_batch(b0, 0)
    assert t.latest_version() == v1  # no new version
    assert _rows(t.read(spark)) == state1  # not double-summed
    # the NEXT batch still applies and accumulates
    b1 = spark.createDataFrame(
        [(3, dt.datetime(2024, 1, 1, 12), 1, "view", 1.5, None)], schema
    )
    apply_batch(b1, 1)
    got = {(str(r.date), r.segment): (r.n_events, r.value_cents)
           for r in t.read(spark).collect()}
    assert got[("2024-01-01", "SEG-A")] == (2, 400)
    assert got[("2024-01-01", "SEG-B")] == (1, 100)


def test_expire_sweeps_crashed_attempt_orphans(spark, tmp_path):
    """A crash between data write and manifest publish leaves an invisible
    v*/v*-r* attempt dir; expire's orphan sweep removes it once it is
    older than the TTL, while live data (including dirs referenced only
    through bucket subdirs) survives."""
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.commit(spark.range(3).select("id"))
    t.commit(spark.range(5).select("id"))
    data_root = str(tmp_path / "tbl" / "data")
    # crashed attempt at v3 plus a crashed RETRY sibling — no manifest
    for orphan in ("v000003", "v000003-r1"):
        spark.range(9).select("id").write.parquet(os.path.join(data_root, orphan))
    assert t.latest_version() == 2
    # fresh orphans survive a default-TTL expire (concurrent-writer guard)
    t.expire(keep_last=2)
    assert os.path.isdir(os.path.join(data_root, "v000003"))
    # ttl=0 sweeps them and keeps every live dir
    t.expire(keep_last=1, orphan_ttl_s=0)
    assert not os.path.isdir(os.path.join(data_root, "v000003"))
    assert not os.path.isdir(os.path.join(data_root, "v000003-r1"))
    assert sorted(r.id for r in t.read(spark).collect()) == list(range(5))

    # bucketed table: the manifest references data/vN/_bucket=B subdirs —
    # the sweep must see the parent vN dir as live through its children
    tb = SnapshotTable(str(tmp_path / "btbl"))
    d = spark.createDataFrame([(i, i) for i in range(8)], "id long, d_v long")
    tb.merge_bucketed(
        spark, d, on="id", update={"v": "d_v"}, insert_defaults={"v": "d_v"},
        n_buckets=4, schema="id long, v long",
    )
    broot = str(tmp_path / "btbl" / "data")
    spark.range(2).select("id").write.parquet(os.path.join(broot, "v000099"))
    tb.expire(keep_last=1, orphan_ttl_s=0)
    assert not os.path.isdir(os.path.join(broot, "v000099"))
    assert sorted(r.id for r in tb.read(spark).collect()) == list(range(8))


def _race_commit(args):
    """Worker for the two-process CAS race: try to publish a manifest for
    the given version; on losing the CAS, retry on the next version until
    one sticks. Returns (worker_id, won_version, n_cas_losses)."""
    path, worker_id = args
    import sys

    sys.path.insert(0, "/root/repo")
    from music_streaming_services_etl_pipeline_with_airflow_spark.snapshots import (
        ConcurrentWriteError,
        SnapshotTable,
    )

    t = SnapshotTable(path)
    losses = 0
    while True:
        version = t.latest_version() + 1
        data_dir = t._fresh_data_dir(version)
        try:
            # stand-in for the parquet write: Spark's mode="error" write
            # fails exactly like this when two writers race to the same
            # attempt dir — safely, BEFORE any manifest exists — and the
            # loser retries the commit, probing a fresh sibling
            os.makedirs(data_dir)
        except FileExistsError:
            losses += 1
            continue
        with open(os.path.join(data_dir, f"part-{worker_id}.txt"), "w") as fh:
            fh.write(str(worker_id))
        try:
            t._write_manifest(
                {
                    "version": version,
                    "parent": version - 1,
                    "mode": "overwrite",
                    "dirs": [data_dir],
                    "writer": worker_id,
                }
            )
            return (worker_id, version, losses)
        except ConcurrentWriteError:
            losses += 1


def test_concurrent_commit_two_process_race(tmp_path):
    """TRUE multi-process CAS race: 6 processes hammer one table
    concurrently (each publish is an os.link exclusive create). Exactly
    one writer wins each version, every loser retries onto a later
    version, no version is double-committed, and every surviving manifest
    names exactly one writer's data dir."""
    import json
    from multiprocessing import Pool

    path = str(tmp_path / "tbl")
    SnapshotTable(path)  # create layout
    n = 6
    with Pool(n) as pool:
        results = pool.map(_race_commit, [(path, w) for w in range(n)])
    t = SnapshotTable(path)
    won_versions = sorted(v for _, v, _ in results)
    # every worker landed, on a distinct version, and versions are gapless
    assert won_versions == list(range(1, n + 1))
    assert t.versions() == list(range(1, n + 1))
    # each manifest records the writer that actually won that version
    by_version = {v: w for w, v, _ in results}
    for v in t.versions():
        m = t._manifest(v)
        assert m["writer"] == by_version[v]
        assert os.path.isdir(m["dirs"][0])


def test_commit_buckets_rejects_undeclared_bucket_rows(spark, tmp_path):
    """Rows whose bucket is not in ``touched`` must fail the commit loudly —
    their partition dir would never enter the manifest and the rows would
    silently vanish from every read."""
    import pytest as _pytest

    t = SnapshotTable(str(tmp_path / "tbl"))
    df = spark.createDataFrame(
        [(1, 10, 0), (2, 20, 3)], "id long, v long, _bucket int"
    )
    with _pytest.raises(ValueError, match="not in touched"):
        t.commit_buckets(df, touched=[0], n_buckets=4)
    # nothing was published
    assert t.latest_version() == 0


def test_manifest_extra_fields_survive_delete_restore_and_carryover(
    spark, tmp_path
):
    """Caller manifest metadata (the matview's last_batch_id replay cursor)
    must survive every lineage step: a commit_buckets without extra carries
    the parent's cursor, delete_where propagates it, and restore rolls it
    back WITH the data it describes — otherwise a post-delete replay
    re-applies an already-summed batch (at-least-once double-count)."""
    t = SnapshotTable(str(tmp_path / "tbl"))
    df = spark.createDataFrame(
        [(1, 10, 0), (2, 20, 1)], "id long, v long, _bucket int"
    )
    t.commit_buckets(df, touched=[0, 1], n_buckets=4,
                     extra={"last_batch_id": 5})
    assert t.latest_manifest_field("last_batch_id") == 5
    # a later commit WITHOUT extra keeps the cursor
    d2 = spark.createDataFrame([(3, 30, 2)], "id long, v long, _bucket int")
    t.commit_buckets(d2, touched=[2], n_buckets=4)
    assert t.latest_manifest_field("last_batch_id") == 5
    # a newer cursor replaces it
    d3 = spark.createDataFrame([(4, 40, 3)], "id long, v long, _bucket int")
    t.commit_buckets(d3, touched=[3], n_buckets=4,
                     extra={"last_batch_id": 7})
    v_cursor7 = t.latest_version()
    # copy-on-write delete keeps the cursor
    t.delete_where(spark, "id = 2")
    assert t.latest_manifest_field("last_batch_id") == 7
    # restore to the batch-5 state rolls the cursor back with the data
    t.restore(2)
    assert t.latest_manifest_field("last_batch_id") == 5
    # and restoring forward recovers the newer cursor
    t.restore(v_cursor7)
    assert t.latest_manifest_field("last_batch_id") == 7


def test_compact_small_folds_only_small_dirs(spark, tmp_path):
    """compact_small() folds only the dirs under the byte threshold and
    carries the large dir BY REFERENCE (same path, file mtimes untouched);
    content is identical; fewer than two qualifying dirs is a no-op; the
    pre-compaction version stays readable; expire drops the folded
    fragments; caller manifest metadata survives the fold."""
    import os as _os

    t = SnapshotTable(str(tmp_path / "tbl"))
    t.commit(spark.range(0, 5000).select("id"))  # large batch
    t.commit(spark.range(5000, 5010).select("id"), mode="append")
    t.commit(spark.range(5010, 5020).select("id"), mode="append")
    # stamp caller metadata the fold must carry (the _extra_fields path)
    m3 = t._manifest(3)
    _os.remove(t._mdir + "/v000003.json")
    t._write_manifest({**m3, "last_batch_id": 7})

    def sz(d):
        return sum(
            _os.path.getsize(_os.path.join(r, f))
            for r, _, fs in _os.walk(d)
            for f in fs
        )

    large = t._manifest(3)["dirs"][0]
    mtimes = {
        f: _os.path.getmtime(_os.path.join(large, f))
        for f in _os.listdir(large)
    }
    v4 = t.compact_small(spark, small_bytes=sz(large))
    assert v4 == 4
    m4 = t._manifest(v4)
    assert len(m4["dirs"]) == 2 and large in m4["dirs"]
    assert m4["last_batch_id"] == 7 and m4["mode"] == "compact"
    # by reference: not a byte of the large dir was rewritten
    assert mtimes == {
        f: _os.path.getmtime(_os.path.join(large, f))
        for f in _os.listdir(large)
    }
    assert _rows(t.read(spark)) == [(i,) for i in range(5020)]
    assert _rows(t.read(spark, 3)) == [(i,) for i in range(5020)]  # time travel
    # no-op: the fold left one small dir (the new one) + one large
    assert t.compact_small(spark, small_bytes=sz(large)) == v4
    frags = [d for d in t._manifest(3)["dirs"] if d not in m4["dirs"]]
    t.expire(keep_last=1)
    assert frags and all(not _os.path.isdir(d) for d in frags)
    assert _rows(t.read(spark)) == [(i,) for i in range(5020)]


def test_compact_small_bucketed_refuses_and_mixed_schema_folds(spark, tmp_path):
    """Bucketed lineage: loud refusal (a flat fold would strand the bucket
    map). Mixed-schema lineage: the fold reads under the union schema so
    pre-evolution dirs surface NULLs instead of crashing."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    b = SnapshotTable(str(tmp_path / "bt"))
    b.commit_buckets(
        spark.range(4).select(
            F.col("id").alias("k"),
            F.lit(1).alias("v"),
            SnapshotTable.bucket_of(F.col("id"), 2).alias("_bucket"),
        ),
        touched=[0, 1],
        n_buckets=2,
    )
    with _pytest.raises(ValueError, match="bucketed"):
        b.compact_small(spark, small_bytes=1 << 30)

    t = SnapshotTable(str(tmp_path / "mx"))
    t.commit(spark.range(0, 3).select("id"))
    t.commit(
        spark.range(3, 6).select("id", F.lit("x").alias("tag")), mode="append"
    )
    assert t._manifest(2)["mixed_schemas"]
    v3 = t.compact_small(spark, small_bytes=1 << 30)  # fold everything
    got = sorted((r.id, r.tag) for r in t.read(spark, v3).collect())
    assert got == [(0, None), (1, None), (2, None), (3, "x"), (4, "x"), (5, "x")]


def test_zonemap_pruning_lifecycle(spark, tmp_path):
    """Zone maps: stats-bearing commits record per-dir [min, max]; a
    range read opens only intersecting dirs; a fully-out-of-range read
    opens zero dirs yet stays correctly typed; dirs WITHOUT stats are
    scanned conservatively; delete_where keeps surviving dirs' maps
    (immutability) and the rewrite dir is conservative; compact_small
    carries maps for by-reference dirs."""
    from pyspark.sql import functions as F

    t = SnapshotTable(str(tmp_path / "zm"))
    mk = lambda a, b: spark.range(a, b).select(F.col("id").alias("k"))  # noqa: E731
    t.commit(mk(0, 100), stats_cols=["k"])
    t.commit(mk(100, 200), mode="append", stats_cols=["k"])
    t.commit(mk(200, 300), mode="append")  # no stats: conservative dir
    df, scanned, total = t.read_pruned(spark, "k", 120, 130)
    # the [100,199] dir intersects; the statless dir is always scanned
    assert (scanned, total) == (2, 3)
    assert sorted(r.k for r in df.filter(F.col("k").between(120, 130)).collect()) == list(range(120, 131))
    # fully out of range: only the statless dir
    df, scanned, total = t.read_pruned(spark, "k", 5000, 6000)
    assert (scanned, total) == (1, 3)
    # delete inside the first band: its dir is rewritten (loses stats ->
    # conservative), the second band's map survives by immutability
    t.delete_where(spark, "k < 10")
    df, scanned, total = t.read_pruned(spark, "k", 120, 130)
    assert total == 3 and scanned == 3  # rewrite dir + statless + hit
    m = t._manifest(t.latest_version())
    survived = [zm for d, zm in m["zonemaps"].items() if d in m["dirs"]]
    assert survived == [{"k": [100, 199]}]
    assert sorted(r.k for r in df.filter(F.col("k").between(120, 130)).collect()) == list(range(120, 131))
    # compact_small folds the small dirs; the map dict stays consistent
    # (folded dirs' entries dropped, no dangling keys for live dirs)
    v = t.compact_small(spark, small_bytes=1 << 30)
    m2 = t._manifest(v)
    assert set(m2.get("zonemaps", {})) <= set(m2["dirs"])
    assert sorted(r.k for r in t.read(spark).collect()) == list(range(10, 300))


def test_zonemap_empty_prune_returns_typed_empty(spark, tmp_path):
    from pyspark.sql import functions as F

    t = SnapshotTable(str(tmp_path / "zm2"))
    t.commit(
        spark.range(0, 10).select(F.col("id").alias("k")), stats_cols=["k"]
    )
    df, scanned, total = t.read_pruned(spark, "k", 100, 200)
    assert (scanned, total) == (0, 1)
    assert df.columns == ["k"] and df.count() == 0


def test_change_feed_fast_path_and_bag_diff(spark, tmp_path):
    """changes(): the append pair takes the O(delta) fast path — ONLY the
    new dir's files are read (inputFiles-pinned), shared immutable dirs
    never open; across a delete it falls back to the bag diff; updates
    (overwrite changing multiplicity) surface as delete+insert pairs;
    bad version args raise."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    t = SnapshotTable(str(tmp_path / "cdf"))
    v1 = t.commit(spark.range(0, 5).select(F.col("id").alias("k")))
    v2 = t.commit(
        spark.range(5, 8).select(F.col("id").alias("k")), mode="append"
    )
    feed = t.changes(spark, v1, v2)
    assert sorted((r.k, r._change_type) for r in feed.collect()) == [
        (5, "insert"), (6, "insert"), (7, "insert")
    ]
    new_dir = [d for d in t._manifest(v2)["dirs"] if d not in t._manifest(v1)["dirs"]]
    files = [f.replace("file://", "").replace("file:", "") for f in feed.inputFiles()]
    assert new_dir and files
    assert all(any(f.startswith(d) for d in new_dir) for f in files)
    # delete -> bag diff fallback
    v3 = t.delete_where(spark, "k >= 6")
    feed2 = sorted((r.k, r._change_type) for r in t.changes(spark, v2, v3).collect())
    assert feed2 == [(6, "delete"), (7, "delete")]
    # multiplicity change via overwrite: duplicate one row
    v4 = t.commit(
        spark.createDataFrame([(0,), (1,), (2,), (3,), (4,), (5,), (5,)], "k long")
    )
    feed3 = sorted((r.k, r._change_type) for r in t.changes(spark, v3, v4).collect())
    assert feed3 == [(5, "insert")]  # one extra copy of 5, nothing else
    with _pytest.raises(ValueError):
        t.changes(spark, v2, v2)
    with _pytest.raises(ValueError):
        t.changes(spark, 1, 99)
    # no-op step (delete matching nothing): empty feed via the fast path
    v5 = t.delete_where(spark, "k > 1000")
    assert t.changes(spark, v4, v5).count() == 0


def test_timestamp_as_of(spark, tmp_path):
    """version_as_of/read_as_of: the commit instant is the manifest's
    mtime; a timestamp between commits resolves to the earlier version,
    after the last commit to the latest, and before the first raises."""
    import os as _os
    import pytest as _pytest
    from pyspark.sql import functions as F

    t = SnapshotTable(str(tmp_path / "asof"))
    v1 = t.commit(spark.range(0, 3).select(F.col("id").alias("k")))
    v2 = t.commit(spark.range(3, 6).select(F.col("id").alias("k")))
    m1 = _os.path.getmtime(t._mdir + "/v000001.json")
    m2 = _os.path.getmtime(t._mdir + "/v000002.json")
    # force distinct commit instants without sleeping
    _os.utime(t._mdir + "/v000001.json", (m1 - 10, m1 - 10))
    assert t.version_as_of(m1 - 10) == v1
    assert t.version_as_of((m1 - 10 + m2) / 2) == v1
    assert t.version_as_of(m2 + 1) == v2
    assert _rows(t.read_as_of(spark, m1 - 10)) == [(0,), (1,), (2,)]
    assert _rows(t.read_as_of(spark, m2 + 1)) == [(3,), (4,), (5,)]
    with _pytest.raises(ValueError):
        t.version_as_of(m1 - 100)


def test_change_feed_across_schema_evolution(spark, tmp_path):
    """CDF × ADD COLUMN composition: the feed always presents rows in
    v_to's union schema. (1) Fast path across the evolution: the new
    dir's rows carry their tag, pre-evolution rows aren't in the feed.
    (2) Fast path when a LATER append reverts to the narrow schema: the
    evolved dir's tag values must still surface (regression: typing new
    dirs by the last commit's narrow manifest schema silently dropped
    them). (3) Bag diff across a delete on the evolved lineage must not
    crash on the column-count mismatch and shows old rows' tag as NULL."""
    from pyspark.sql import functions as F

    t = SnapshotTable(str(tmp_path / "cdfevo"))
    v1 = t.commit(spark.range(0, 3).select(F.col("id").alias("k")))
    v2 = t.commit(
        spark.range(3, 5).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("tag")
        ),
        mode="append",
    )
    feed = sorted(
        (r.k, r.tag, r._change_type) for r in t.changes(spark, v1, v2).collect()
    )
    assert feed == [(3, 30, "insert"), (4, 40, "insert")]
    # (2) narrow append after the evolution
    v3 = t.commit(spark.range(5, 6).select(F.col("id").alias("k")), mode="append")
    feed2 = sorted(
        (r.k, r.tag, r._change_type) for r in t.changes(spark, v1, v3).collect()
    )
    assert feed2 == [(3, 30, "insert"), (4, 40, "insert"), (5, None, "insert")]
    # (3) bag diff across a delete touching the pre-evolution dir
    v4 = t.delete_where(spark, "k = 0")
    feed3 = sorted(
        (r.k, r.tag, r._change_type) for r in t.changes(spark, v1, v4).collect()
    )
    assert feed3 == [
        (0, None, "delete"),
        (3, 30, "insert"),
        (4, 40, "insert"),
        (5, None, "insert"),
    ]


def test_change_feed_bucketed_touched_only(spark, tmp_path):
    """Bucketed CDF fast path: a merge touching one bucket yields a feed
    computed from THAT bucket's dirs only (inputFiles-pinned — the
    untouched bucket's bytes are never read), with update rows surfacing
    as delete+insert pairs."""
    from pyspark.sql import functions as F

    t = SnapshotTable(str(tmp_path / "bcdf"))
    n_buckets = 2

    def with_bucket(df):
        return df.withColumn(
            "_bucket", SnapshotTable.bucket_of(F.col("k"), n_buckets)
        )

    base = spark.createDataFrame(
        [(i, 100 + i) for i in range(8)], "k long, val long"
    )
    v1 = t.commit_buckets(
        with_bucket(base), touched=[0, 1], n_buckets=n_buckets
    )
    # find a key in bucket 0 to update
    b0_keys = [
        r.k
        for r in with_bucket(base).filter(F.col("_bucket") == 0).collect()
    ]
    ku = b0_keys[0]
    delta = spark.createDataFrame([(ku, 999)], "k long, d long")
    v2 = t.merge_bucketed(
        spark,
        delta,
        on="k",
        update={"val": "d"},
        insert_defaults={"val": "d"},
        n_buckets=n_buckets,
        schema="k long, val long",
    )

    feed = t.changes(spark, v1, v2)
    got = sorted((r.k, r.val, r._change_type) for r in feed.collect())
    assert got == [(ku, 100 + ku, "delete"), (ku, 999, "insert")]
    # only bucket 0's dirs were opened
    b0_dirs = set(
        t._manifest(v1)["buckets"]["0"] + t._manifest(v2)["buckets"]["0"]
    )
    files = [f.replace("file://", "").replace("file:", "") for f in feed.inputFiles()]
    assert files and all(any(f.startswith(d) for d in b0_dirs) for f in files)


def test_bucketed_schema_stability_enforced(spark, tmp_path):
    """Bucketed lineages are schema-stable by contract (r9, ADVICE): a
    partial-touch commit that changes the data schema fails BEFORE any
    data is written (no orphan dir), because untouched buckets would
    carry old-schema dirs that every one-schema bucket read (read_buckets
    / merge_bucketed / the CDF fast path) silently mistypes. A FULL
    rewrite — every non-empty bucket replaced in one commit — may change
    the schema (the overwriteSchema shape), and the CDF fast path across
    it reads each side under its own recorded schema."""
    import os

    import pytest
    from pyspark.sql import functions as F

    t = SnapshotTable(str(tmp_path / "bstable"))
    n_buckets = 2

    def with_bucket(df):
        return df.withColumn(
            "_bucket", SnapshotTable.bucket_of(F.col("k"), n_buckets)
        )

    base = spark.createDataFrame(
        [(i, 100 + i) for i in range(8)], "k long, val long"
    )
    v1 = t.commit_buckets(
        with_bucket(base), touched=[0, 1], n_buckets=n_buckets
    )
    ndirs_before = len(os.listdir(f"{t.path}/data"))
    wide = spark.createDataFrame([(0, 100, 7)], "k long, val long, tag long")
    with pytest.raises(ValueError, match="schema-stable"):
        t.commit_buckets(with_bucket(wide), touched=[0], n_buckets=n_buckets)
    # fail-fast: no orphan data dir was written by the rejected commit
    assert len(os.listdir(f"{t.path}/data")) == ndirs_before
    # full rewrite MAY evolve the schema
    wide_all = spark.createDataFrame(
        [(i, 100 + i, 7 * i) for i in range(8)], "k long, val long, tag long"
    )
    v2 = t.commit_buckets(
        with_bucket(wide_all), touched=[0, 1], n_buckets=n_buckets
    )
    assert t.read(spark, v2).columns == ["k", "val", "tag"]
    # the bucketed CDF fast path across the full rewrite types each side
    # by its OWN recorded schema: old rows delete with tag=NULL (padded
    # into v_to's union), new rows insert with real tag values
    feed = {
        (r.k, r.tag, r._change_type)
        for r in t.changes(spark, v1, v2).collect()
    }
    assert feed == {(i, None, "delete") for i in range(8)} | {
        (i, 7 * i, "insert") for i in range(8)
    }


def test_read_pruned_normalizes_date_bounds(spark, tmp_path):
    """read_pruned bounds normalization (r9, ADVICE): a caller may pass a
    datetime.date object or its ISO string interchangeably — both are
    normalized through _zm_value, so they compare in the stored bounds'
    str() domain instead of raising TypeError (object vs str) or
    silently mis-pruning."""
    import datetime as dt

    from pyspark.sql import functions as F

    t = SnapshotTable(str(tmp_path / "zmdate"))
    days = lambda a, b: spark.range(a, b).select(  # noqa: E731
        F.date_add(F.lit("2024-01-01").cast("date"), F.col("id").cast("int")).alias("d")
    )
    t.commit(days(0, 10), stats_cols=["d"])  # 2024-01-01 .. 2024-01-10
    t.commit(days(40, 50), mode="append", stats_cols=["d"])  # feb 10..19
    for lo, hi in [
        (dt.date(2024, 2, 1), dt.date(2024, 2, 28)),
        ("2024-02-01", "2024-02-28"),
    ]:
        df, scanned, total = t.read_pruned(spark, "d", lo, hi)
        assert (scanned, total) == (1, 2)
        assert df.count() == 10
    df, scanned, total = t.read_pruned(
        spark, "d", dt.date(2025, 1, 1), dt.date(2025, 12, 31)
    )
    assert (scanned, total) == (0, 2)


def test_bloom_point_lookup_skips_dirs(spark, tmp_path):
    """Per-dir bloom index (r9): point lookups open only dirs whose bloom
    could contain the key — including when zone maps CANNOT help because
    every dir spans the full value range (scattered high-cardinality
    keys). Carried by reference across append/delete/compact_small
    (immutability); missing entries scan conservatively; a fully-pruned
    lookup returns a typed empty frame; false-negatives are impossible
    (every present key's dir is always scanned)."""
    from pyspark.sql import functions as F

    t = SnapshotTable(str(tmp_path / "bloomidx"))
    # three batches of DISJOINT key sets, each spanning the full numeric
    # range (k, k+1000, k+2000 interleaved) so zone maps can't skip
    mk = lambda lo: spark.range(lo, lo + 300).select(  # noqa: E731
        (F.col("id") * 7 % 3000 + (lo // 300) * 3000).alias("k"),
        (F.col("id") * 10).alias("val"),
    )
    t.commit(mk(0), bloom_cols=["k"])
    t.commit(mk(300), mode="append", bloom_cols=["k"])
    t.commit(mk(600), mode="append")  # NO bloom: conservative dir
    # pick a key that exists only in batch 1
    key = [r.k for r in t.read(spark).filter(F.col("k") < 3000).limit(1).collect()][0]
    df, scanned, total = t.read_point(spark, "k", key)
    assert total == 3
    assert scanned <= 2  # batch-1 dir (+ the conservative statless dir)
    got = df.filter(F.col("k") == key).count()
    assert got == 1
    # absent key: only the conservative dir can open (false positives
    # aside — with 300 keys in 2^14 bits the fp odds are ~0.1%)
    df, scanned, total = t.read_point(spark, "k", 10_000_000)
    assert scanned <= 2 and df.filter(F.col("k") == 10_000_000).count() == 0
    # blooms survive delete_where on untouched dirs (immutability carry)
    t.delete_where(spark, "k >= 6000 AND k < 6010")
    df, scanned, total = t.read_point(spark, "k", key)
    assert scanned <= 3 and df.filter(F.col("k") == key).count() == 1
    m = t._manifest(t.latest_version())
    assert set(m.get("blooms", {})) <= set(m["dirs"])


def test_point_lookup_composes_zonemaps_and_blooms(spark, tmp_path):
    """read_point intersects BOTH skipping indexes (r10): a dir is opened
    only if its zone map contains the value AND its bloom could contain
    it. The fixture pins the composition with a dir each index keeps
    alone but the other skips:
      - dir A (even keys 0..198, zonemap + bloom): a probe for an ODD key
        inside [0,198] passes the zone map but the bloom skips it;
      - dir B (keys 1000..1099, zonemap only, NO bloom): bloom absence
        keeps it conservatively but the zone map skips out-of-range
        probes.
    So probing 51 scans ZERO dirs — neither index alone achieves that."""
    from pyspark.sql import functions as F

    t = SnapshotTable(str(tmp_path / "zmbloom"))
    evens = spark.range(100).select((F.col("id") * 2).alias("k"))
    t.commit(evens, stats_cols=["k"], bloom_cols=["k"])
    t.commit(
        spark.range(1000, 1100).select(F.col("id").alias("k")),
        mode="append",
        stats_cols=["k"],
    )
    # odd key in A's range: zonemap keeps A, bloom skips A; zonemap skips B
    df, scanned, total = t.read_point(spark, "k", 51)
    assert (scanned, total) == (0, 2)
    assert df.count() == 0
    # key only in B: zonemap skips A (bloom would keep A only on a false
    # positive, irrelevant — the intersection still skips); B opens via
    # conservative bloom absence
    df, scanned, total = t.read_point(spark, "k", 1050)
    assert scanned == 1 and df.filter(F.col("k") == 1050).count() == 1
    # key only in A: both of A's indexes keep it; B's zonemap skips
    df, scanned, total = t.read_point(spark, "k", 42)
    assert scanned == 1 and df.filter(F.col("k") == 42).count() == 1


def test_point_lookup_type_mismatch_scans_conservatively(spark, tmp_path):
    """A bloom entry records the column type it was hashed under (r10):
    probing a dir whose bits were set under a DIFFERENT type than the
    probe literal's would hash to different xxhash64 bits — a silent
    false negative, the one bloom failure that loses rows. read_point
    must treat a type-mismatched entry as absent and scan that dir
    conservatively. The mismatch is injected by rewriting one manifest
    entry's recorded type (the shape a legacy or external manifest
    writer produces — the format's own commit paths are additive-only,
    so they can never retype a column mid-lineage)."""
    import json
    import os

    from pyspark.sql import functions as F

    t = SnapshotTable(str(tmp_path / "bloomtype"))
    t.commit(
        spark.range(100).select(F.col("id").alias("k")),
        bloom_cols=["k"],
    )
    t.commit(
        spark.range(1000, 1100).select(F.col("id").alias("k")),
        mode="append",
        bloom_cols=["k"],
    )
    v = t.latest_version()
    mpath = f"{t._mdir}/v{v:06d}.json"
    with open(mpath) as fh:
        m = json.load(fh)
    assert all(ent["k"]["type"] == '"long"' for ent in m["blooms"].values())
    # sanity: with consistent types the absent-key probe skips everything
    _, scanned, total = t.read_point(spark, "k", 50_000)
    assert (scanned, total) == (0, 2)
    # inject: dir A's bits were "hashed under int" per its recorded type
    dir_a = m["dirs"][0]
    m["blooms"][dir_a]["k"]["type"] = '"integer"'
    os.remove(mpath)
    with open(mpath, "w") as fh:
        json.dump(m, fh)
    # key only in dir A: its bloom can no longer be trusted for the
    # long-typed probe -> conservative open, the row is still found
    df, scanned, total = t.read_point(spark, "k", 42)
    assert (scanned, total) == (1, 2)
    assert df.filter(F.col("k") == 42).count() == 1
    # absent key: dir A opens conservatively, dir B still bloom-skips
    _, scanned, total = t.read_point(spark, "k", 50_000)
    assert (scanned, total) == (1, 2)


def test_cdc_applier_torn_commit_recovers_exactly_once(spark, tmp_path):
    """Mid-commit CRASH drill for the CDC applier (r10): kill the commit
    between the bucket-data write and the manifest publish, then replay
    the same micro-batch (what a restarted stream does — foreachBatch
    effects land before the checkpoint offset commits). Exactly-once must
    come out of the table format's protocol: the torn attempt's data dir
    stays dark forever (no manifest references it), the retry probes a
    fresh sibling dir instead of colliding, and the replayed merge
    converges to the same state a crash-free run produces."""
    import datetime as dt

    import pytest

    from music_streaming_services_etl_pipeline_with_airflow_spark.streaming.ingest import (
        make_cdc_applier,
    )

    t = SnapshotTable(str(tmp_path / "state"))
    apply_batch = make_cdc_applier(t, n_buckets=4)
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    )

    def _ev(eid, minute, u, typ, v):
        return (eid, dt.datetime(2024, 1, 1, 10, minute), u, typ, v, None)

    apply_batch(
        spark.createDataFrame(
            [_ev(i, 0, u, "view", float(u)) for i, u in enumerate(range(1, 9))],
            schema,
        ),
        0,
    )
    v1 = t.latest_version()
    state1 = {r.user_id: (r.value_milli, r.deleted) for r in t.read(spark).collect()}

    batch2 = spark.createDataFrame(
        [
            _ev(100, 5, 1, "click", 42.0),  # newer change: user 1 -> 42
            _ev(101, 5, 2, "error", 0.0),  # tombstone: user 2 deleted
            _ev(102, 5, 9, "view", 9.0),  # brand-new key
        ],
        schema,
    )
    real_publish = SnapshotTable._write_manifest
    try:
        def torn(self, manifest):
            raise RuntimeError("simulated crash before manifest publish")

        SnapshotTable._write_manifest = torn
        with pytest.raises(RuntimeError, match="simulated crash"):
            apply_batch(batch2, 1)
    finally:
        SnapshotTable._write_manifest = real_publish

    # the torn attempt is invisible: same version, same readable state,
    # but orphan data bytes ARE on disk outside the manifest
    assert t.latest_version() == v1
    assert {
        r.user_id: (r.value_milli, r.deleted) for r in t.read(spark).collect()
    } == state1
    import os as _os

    on_disk = {f"{t.path}/data/{e}" for e in _os.listdir(f"{t.path}/data")}
    manifest_roots = {d.rsplit("/", 2)[0] + "/" + d.rsplit("/", 2)[1]
                      for d in t._manifest(v1)["dirs"]}
    orphans = on_disk - manifest_roots
    assert orphans, "torn attempt should have left an unreferenced data dir"

    # restart: the stream re-delivers the same batch
    apply_batch(batch2, 1)
    got = {r.user_id: (r.value_milli, r.deleted) for r in t.read(spark).collect()}
    want = dict(state1)
    want[1] = (42000, False)
    want[2] = (0, True)  # tombstoned; the winning change's value lands
    want[9] = (9000, False)
    assert got == want
    # the orphan stayed dark: no manifest dir lives under it
    final_dirs = t._manifest(t.latest_version())["dirs"]
    for o in orphans:
        assert not any(d.startswith(o + "/") or d == o for d in final_dirs)
    # replaying AGAIN (at-least-once redelivery) changes nothing
    apply_batch(batch2, 1)
    got2 = {r.user_id: (r.value_milli, r.deleted) for r in t.read(spark).collect()}
    assert got2 == want


def test_matview_torn_commit_replays_once(spark, tmp_path):
    """Torn-commit drill for the NON-idempotent matview merge (r10): the
    replay cursor rides the same manifest as the data commit, so the two
    failure windows resolve differently and BOTH must converge:
    - crash BEFORE the manifest publish: neither data nor cursor
      advanced — the replay re-merges and the sums land exactly once;
    - crash AFTER the manifest publish (before the checkpoint commit):
      cursor already advanced — the replay is skipped, sums unchanged."""
    import datetime as dt

    import pytest

    from music_streaming_services_etl_pipeline_with_airflow_spark.streaming.ingest import (
        make_matview_applier,
    )

    t = SnapshotTable(str(tmp_path / "mv"))
    dim = spark.createDataFrame(
        [(1, "SEG-A"), (2, "SEG-B")], "user_id long, segment string"
    )
    apply_batch = make_matview_applier(t, dim, n_buckets=4)
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    )
    b0 = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 10), 1, "view", 2.5, None)], schema
    )
    apply_batch(b0, 0)
    v1 = t.latest_version()
    assert t.latest_manifest_field("last_batch_id") == 0

    b1 = spark.createDataFrame(
        [(2, dt.datetime(2024, 1, 1, 11), 1, "view", 1.0, None),
         (3, dt.datetime(2024, 1, 1, 11), 2, "view", 4.0, None)], schema
    )
    real_publish = SnapshotTable._write_manifest
    try:
        def torn(self, manifest):
            raise RuntimeError("simulated crash before manifest publish")

        SnapshotTable._write_manifest = torn
        with pytest.raises(RuntimeError, match="simulated crash"):
            apply_batch(b1, 1)
    finally:
        SnapshotTable._write_manifest = real_publish

    # window 1: nothing advanced — data, version, AND cursor
    assert t.latest_version() == v1
    assert t.latest_manifest_field("last_batch_id") == 0
    # restart replays batch 1: the merge lands exactly once
    apply_batch(b1, 1)
    got = {(str(r.date), r.segment): (r.n_events, r.value_cents)
           for r in t.read(spark).collect()}
    assert got == {("2024-01-01", "SEG-A"): (2, 350),
                   ("2024-01-01", "SEG-B"): (1, 400)}
    v2 = t.latest_version()
    assert t.latest_manifest_field("last_batch_id") == 1
    # window 2: cursor committed, checkpoint didn't — replay is a no-op
    apply_batch(b1, 1)
    assert t.latest_version() == v2
    assert {(str(r.date), r.segment): (r.n_events, r.value_cents)
            for r in t.read(spark).collect()} == got


def test_commit_buckets_append_extends_dirs(spark, tmp_path):
    """commit_buckets(append=True) must EXTEND the touched buckets' dir
    lists (O(df) write bytes — the postings/LSM shape for grow-only keyed
    state) while replacement mode keeps replacing; reads see the union;
    and a schema change is rejected against ANY non-empty bucket, since
    appended dirs coexist with old dirs inside one bucket."""
    import pytest

    from music_streaming_services_etl_pipeline_with_airflow_spark.snapshots import (
        SnapshotTable,
    )
    from pyspark.sql import functions as F

    t = SnapshotTable(str(tmp_path / "bands"))
    nb = 4
    bucket = SnapshotTable.bucket_of(F.col("k"), nb)

    def frame(rows):
        return spark.createDataFrame(rows, "k string, v long").withColumn(
            "_bucket", bucket
        )

    def touched(df):
        return sorted(r["_b"] for r in df.select(
            F.col("_bucket").alias("_b")).distinct().collect())

    d1 = frame([("a", 1), ("b", 2)])
    t.commit_buckets(d1, touched(d1), n_buckets=nb)
    d2 = frame([("a", 3), ("c", 4)])
    t.commit_buckets(d2, touched(d2), n_buckets=nb, append=True)
    got = sorted(
        (r.k, r.v)
        for r in t.read_buckets(
            spark, list(range(nb)), "k string, v long", n_buckets=nb
        ).collect()
    )
    assert got == [("a", 1), ("a", 3), ("b", 2), ("c", 4)]
    # the shared bucket now carries TWO dirs in the manifest
    bm = t._bucket_map(t.latest_version())
    assert max(len(ds) for ds in bm.values()) == 2
    # bucket-pruned read still prunes: only 'b's bucket -> only b
    b_bucket = frame([("b", 0)]).select("_bucket").collect()[0][0]
    only_b = t.read_buckets(spark, [b_bucket], "k string, v long", n_buckets=nb)
    assert {r.k for r in only_b.collect()} <= {"a", "b", "c"}
    assert ("b", 2) in {(r.k, r.v) for r in only_b.collect()}
    # schema change on append fails fast (old dirs coexist in-bucket)
    d3 = spark.createDataFrame([("z", 1.5)], "k string, v double").withColumn(
        "_bucket", bucket
    )
    with pytest.raises(ValueError, match="schema-stable"):
        t.commit_buckets(d3, touched(d3), n_buckets=nb, append=True)


def test_minhash_index_applier_replay_and_torn_commit(spark, tmp_path):
    """Drills for the streaming near-dup index (r11): (a) maintained
    pairs equal the whole-corpus batch operator after every prefix,
    including cross-batch pairs; (b) a replayed batch_id is a no-op on
    all three tables; (c) a crash between the pairs commit and the bands
    append heals on replay (only the lagging tables apply) and the next
    batch still equals the recompute."""
    import pytest

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

    pairs_t = SnapshotTable(str(tmp_path / "pairs"))
    bands_t = SnapshotTable(str(tmp_path / "bands"))
    shingles_t = SnapshotTable(str(tmp_path / "shingles"))
    groups_t = SnapshotTable(str(tmp_path / "groups"))
    members_t = SnapshotTable(str(tmp_path / "members"))
    apply_batch = make_minhash_index_applier(
        pairs_t, bands_t, shingles_t, groups_t, members_t, n_buckets=4
    )
    schema = "doc_id long, text string"

    base = "the quick brown fox jumps over the lazy dog again and again "
    # near-dup family: doc 1/11/21 share most tokens; 2/12 another family;
    # 3, 13, 23 unique
    corpus = [
        (1, base + "alpha beta gamma delta"),
        (2, "completely different words one two three four five six seven"),
        (3, "unique content first " + "x " * 12),
        (11, base + "alpha beta gamma epsilon"),
        (12, "completely different words one two three four five six eight"),
        (13, "unique content second " + "y " * 12),
        (21, base + "alpha beta zeta delta"),
        (23, "unique content third " + "z " * 12),
    ]

    def whole_corpus_pairs(rows):
        df = spark.createDataFrame(rows, schema)
        sh = doc_shingles(df)
        cand = lsh_candidate_pairs(minhash_signatures(sh))
        return {
            (r.da, r.db, round(r.jaccard, 9))
            for r in _pair_jaccard(sh, cand)
            .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
            .collect()
        }

    def stored_pairs():
        return {
            (r.da, r.db, round(r.jaccard, 9))
            for r in serve_minhash_pairs(spark, pairs_t, groups_t, members_t)
            .select("da", "db", "jaccard")
            .collect()
        }

    b0, b1, b2 = corpus[:3], corpus[3:6], corpus[6:]
    apply_batch(spark.createDataFrame(b0, schema), 0)
    assert stored_pairs() == whole_corpus_pairs(b0)
    apply_batch(spark.createDataFrame(b1, schema), 1)
    assert stored_pairs() == whole_corpus_pairs(b0 + b1)
    # cross-batch pairs exist (1,11), (2,12) — the index probe found them
    assert any(da == 1 and db == 11 for da, db, _ in stored_pairs())

    # (b) replay is a no-op everywhere
    tables = (pairs_t, bands_t, shingles_t, groups_t, members_t)
    vs = tuple(t.latest_version() for t in tables)
    apply_batch(spark.createDataFrame(b1, schema), 1)
    assert vs == tuple(t.latest_version() for t in tables)

    # (c) torn: pairs commit lands, bands append crashes
    real_publish = SnapshotTable._write_manifest
    calls = {"n": 0}
    try:
        def torn(self, manifest):
            calls["n"] += 1
            if calls["n"] >= 2:
                raise RuntimeError("simulated crash before bands append")
            return real_publish(self, manifest)

        SnapshotTable._write_manifest = torn
        with pytest.raises(RuntimeError, match="simulated crash"):
            apply_batch(spark.createDataFrame(b2, schema), 2)
    finally:
        SnapshotTable._write_manifest = real_publish
    assert pairs_t.latest_manifest_field("last_batch_id") == 2
    assert bands_t.latest_manifest_field("last_batch_id") == 1  # behind
    # restart replays batch 2: pairs skip, the four lagging tables catch up
    apply_batch(spark.createDataFrame(b2, schema), 2)
    for t in (bands_t, shingles_t, groups_t, members_t):
        assert t.latest_manifest_field("last_batch_id") == 2
    assert stored_pairs() == whole_corpus_pairs(corpus)
    # and a further batch probes the healed index correctly
    b3 = [(31, base + "alpha beta gamma delta extra")]
    apply_batch(spark.createDataFrame(b3, schema), 3)
    assert stored_pairs() == whole_corpus_pairs(corpus + b3)


def test_minhash_index_probe_bounded_by_batch(spark, tmp_path):
    """Per-batch probe cost must track the BATCH, not the stored index:
    with ~200 history docs indexed, a 1-doc batch with no near-dups must
    read only band rows matching ITS band values (In(bval) pushdown) and
    fetch NO history shingles; a 1-doc near-dup batch fetches exactly its
    candidates' shingles."""
    from music_streaming_services_etl_pipeline_with_airflow_spark.snapshots import (
        SnapshotTable,
    )
    from music_streaming_services_etl_pipeline_with_airflow_spark.streaming import (
        ingest,
    )

    pairs_t = SnapshotTable(str(tmp_path / "pairs"))
    bands_t = SnapshotTable(str(tmp_path / "bands"))
    shingles_t = SnapshotTable(str(tmp_path / "shingles"))
    groups_t = SnapshotTable(str(tmp_path / "groups"))
    members_t = SnapshotTable(str(tmp_path / "members"))
    apply_batch = ingest.make_minhash_index_applier(
        pairs_t,
        bands_t,
        shingles_t,
        groups_t,
        members_t,
        n_buckets=4,
        record_stats=True,
    )
    schema = "doc_id long, text string"
    # 200 history docs with fully DISJOINT token sets (no shared shingles
    # at all, so no band collisions among them)
    hist = [
        (i, " ".join(f"tok{i}_{j}" for j in range(10))) for i in range(200)
    ]
    apply_batch(spark.createDataFrame(hist, schema), 0)
    n_band_rows = bands_t.read(spark).count()
    assert n_band_rows >= 200  # N_BANDS rows per doc

    # unrelated 1-doc batch: no collisions, no shingle fetches
    apply_batch(
        spark.createDataFrame(
            [(1000, "totally unrelated q w e r t y u i o p")], schema
        ),
        1,
    )
    st = apply_batch.last_stats
    assert st["cand_hist_docs"] == 0 and st["pairs_appended"] == 0
    # the probe read only rows matching the batch's band values — far
    # below the index population (0 here: nothing shares a band value)
    assert st["hist_band_rows_read"] < n_band_rows / 10
    # driver traffic is O(batch + touched buckets): 1 th + N_BANDS bvals
    # + a handful of bucket ids for a 1-doc batch — never index-sized
    assert st["driver_collected_rows"] < 30

    # near-dup 1-doc batch (doc 7 with one token changed): candidates
    # bounded by its own collisions
    near = " ".join(f"tok7_{j}" for j in range(9)) + " tokX"
    apply_batch(spark.createDataFrame([(2000, near)], schema), 2)
    st = apply_batch.last_stats
    assert 1 <= st["cand_hist_docs"] <= 5
    assert st["pairs_appended"] >= 1


def test_minhash_index_erase_and_serve(spark, tmp_path):
    """GDPR erase on the near-dup index, planted so the target HAS pairs:
    after erasing doc 1, (a) its pairs are gone while unrelated pairs
    survive, (b) its band rows and shingles are physically absent (a new
    near-dup of it no longer collides), and (c) the rewritten buckets'
    appended dir lists are COMPACTED back to one dir."""
    from music_streaming_services_etl_pipeline_with_airflow_spark.snapshots import (
        SnapshotTable,
    )
    from music_streaming_services_etl_pipeline_with_airflow_spark.streaming.ingest import (
        erase_doc_from_minhash_index,
        make_minhash_index_applier,
        serve_minhash_pairs,
    )

    pairs_t = SnapshotTable(str(tmp_path / "pairs"))
    bands_t = SnapshotTable(str(tmp_path / "bands"))
    shingles_t = SnapshotTable(str(tmp_path / "shingles"))
    groups_t = SnapshotTable(str(tmp_path / "groups"))
    members_t = SnapshotTable(str(tmp_path / "members"))
    nb = 4
    apply_batch = make_minhash_index_applier(
        pairs_t, bands_t, shingles_t, groups_t, members_t, n_buckets=nb
    )

    def served():
        return {
            (r.da, r.db)
            for r in serve_minhash_pairs(
                spark, pairs_t, groups_t, members_t
            ).collect()
        }
    schema = "doc_id long, text string"
    fam = "the quick brown fox jumps over the lazy dog again and again "
    # two batches so the index tables carry APPENDED dirs before the erase
    apply_batch(
        spark.createDataFrame(
            [(1, fam + "alpha beta"), (2, "totally unrelated " + "q w e r t y u i o p")],
            schema,
        ),
        0,
    )
    apply_batch(
        spark.createDataFrame(
            [(11, fam + "alpha gamma"), (12, "totally unrelated " + "q w e r t y u i o z")],
            schema,
        ),
        1,
    )
    pre = served()
    assert (1, 11) in pre and (2, 12) in pre
    # appended dirs exist pre-erase
    bm_pre = bands_t._bucket_map(bands_t.latest_version())
    assert max(len(ds) for ds in bm_pre.values()) >= 2

    erase_doc_from_minhash_index(
        spark, pairs_t, bands_t, shingles_t, groups_t, members_t, nb, 1
    )
    post = served()
    assert (1, 11) not in post and (2, 12) in post
    assert bands_t.read(spark).filter("doc_id = 1").count() == 0
    assert shingles_t.read(spark).filter("doc_id = 1").count() == 0
    # (c) the rewritten band buckets are compacted to <= 1 dir
    bm_post = bands_t._bucket_map(bands_t.latest_version())
    changed = [b for b in bm_post if bm_post[b] != bm_pre.get(b)]
    assert changed and all(len(bm_post[b]) <= 1 for b in changed)
    # (b) a new near-dup of the erased doc finds NO collision with it
    apply_batch(
        spark.createDataFrame([(21, fam + "alpha delta")], schema), 2
    )
    final = served()
    assert (11, 21) in final and (1, 21) not in final


def test_append_mode_buckets_auto_compact(spark, tmp_path):
    """An append-mode lineage accumulates one dir per touching batch —
    O(batches) manifest growth and per-read file counts. The applier's
    opportunistic compact_appended must fold crowded buckets back to one
    dir (content-neutral) while calm buckets carry by reference: after
    many 1-doc batches with a low threshold, no bucket's dir list may
    exceed threshold+1, and the maintained pairs still equal the
    whole-corpus recompute."""
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
    from music_streaming_services_etl_pipeline_with_airflow_spark.streaming import (
        ingest,
    )
    from pyspark.sql import functions as F

    prev = ingest.MH_IDX_MAX_DIRS
    ingest.MH_IDX_MAX_DIRS = 3
    try:
        pairs_t = SnapshotTable(str(tmp_path / "pairs"))
        bands_t = SnapshotTable(str(tmp_path / "bands"))
        shingles_t = SnapshotTable(str(tmp_path / "shingles"))
        groups_t = SnapshotTable(str(tmp_path / "groups"))
        members_t = SnapshotTable(str(tmp_path / "members"))
        apply_batch = ingest.make_minhash_index_applier(
            pairs_t, bands_t, shingles_t, groups_t, members_t, n_buckets=2
        )
        schema = "doc_id long, text string"
        fam = "the quick brown fox jumps over the lazy dog again and again "
        corpus = [
            (i, fam + f"alpha tail{i}") if i % 3 == 0
            else (i, " ".join(f"tok{i}_{j}" for j in range(10)))
            for i in range(12)
        ]
        for bid, (row) in enumerate(corpus):
            apply_batch(spark.createDataFrame([row], schema), bid)
        for t, label in (
            (bands_t, "bands"),
            (shingles_t, "shingles"),
            (members_t, "members"),
        ):
            bm = t._bucket_map(t.latest_version())
            worst = max(len(ds) for ds in bm.values())
            assert worst <= 3 + 1, f"{label}: {worst} dirs in one bucket"
        # the flat PAIRS append chain folds the same way (r12): 12
        # one-commit batches must not leave 12 data dirs in the manifest
        pairs_dirs = len(pairs_t._manifest(pairs_t.latest_version())["dirs"])
        assert pairs_dirs <= 3 + 1, f"pairs: {pairs_dirs} dirs"
        stored = {
            (r.da, r.db, round(r.jaccard, 9))
            for r in ingest.serve_minhash_pairs(
                spark, pairs_t, groups_t, members_t
            ).collect()
        }
        df = spark.createDataFrame(corpus, schema)
        sh = doc_shingles(df)
        want = {
            (r.da, r.db, round(r.jaccard, 9))
            for r in _pair_jaccard(
                sh, lsh_candidate_pairs(minhash_signatures(sh))
            )
            .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
            .collect()
        }
        assert stored == want and len(stored) >= 3
    finally:
        ingest.MH_IDX_MAX_DIRS = prev


def test_minhash_index_hot_cluster_stays_linear(spark, tmp_path):
    """The r12 exact-collapse front: a document repeated 500 times across
    batches (the viral-doc / boilerplate reality of web corpora) must cost
    the near-dup machinery ONE signature, not 500 — copy batches band
    nothing, verify nothing, collect O(1) driver rows, and the index
    stores one canonical's bands/shingles. The full 500x499/2 pair clique
    (plus every copy's pair with a near-dup) is reconstructed at serve
    time from membership alone."""
    from music_streaming_services_etl_pipeline_with_airflow_spark.operators.dedup import (
        N_BANDS,
        _pair_jaccard,
        doc_shingles,
    )
    from music_streaming_services_etl_pipeline_with_airflow_spark.snapshots import (
        SnapshotTable,
    )
    from music_streaming_services_etl_pipeline_with_airflow_spark.streaming.ingest import (
        make_minhash_index_applier,
        serve_minhash_pairs,
    )
    from pyspark.sql import functions as F

    pairs_t = SnapshotTable(str(tmp_path / "pairs"))
    bands_t = SnapshotTable(str(tmp_path / "bands"))
    shingles_t = SnapshotTable(str(tmp_path / "shingles"))
    groups_t = SnapshotTable(str(tmp_path / "groups"))
    members_t = SnapshotTable(str(tmp_path / "members"))
    apply_batch = make_minhash_index_applier(
        pairs_t,
        bands_t,
        shingles_t,
        groups_t,
        members_t,
        n_buckets=4,
        record_stats=True,
    )
    schema = "doc_id long, text string"
    viral = "breaking news the same viral boilerplate paragraph shared everywhere " + "pad " * 5
    near = viral.replace("shared", "copied")
    copies = [(i, viral) for i in range(500)]
    # 5 batches of 100 copies, then the near-dup alone
    for b in range(5):
        apply_batch(
            spark.createDataFrame(copies[b * 100 : (b + 1) * 100], schema), b
        )
        st = apply_batch.last_stats
        if b == 0:
            assert st["batch_bvals"] == N_BANDS  # ONE canonical banded
        else:
            # pure-copy batch: nothing shingled, banded, probed, verified
            assert st["batch_bvals"] == 0
            assert st["cand_hist_docs"] == 0
            assert st["pairs_appended"] == 0
            # driver traffic: 1 distinct th + 0 bvals + a few bucket ids
            assert st["driver_collected_rows"] <= 5
    # index state is CANONICAL-sized, not corpus-sized
    assert bands_t.read(spark).count() == N_BANDS
    assert shingles_t.read(spark).select("doc_id").distinct().count() == 1
    assert members_t.read(spark).count() == 500
    apply_batch(spark.createDataFrame([(1000, near)], schema), 5)
    st = apply_batch.last_stats
    assert st["cand_hist_docs"] == 1  # the canonical — never the 500 copies
    # serve: the full clique + the near-dup's pair with EVERY copy
    served = serve_minhash_pairs(spark, pairs_t, groups_t, members_t)
    n_within = served.where(F.col("jaccard") == 1.0).count()
    assert n_within == 500 * 499 // 2
    two = spark.createDataFrame([(0, viral), (1000, near)], schema)
    sh2 = doc_shingles(two)
    want_j = round(
        _pair_jaccard(
            sh2, spark.createDataFrame([(0, 1000)], "da long, db long")
        )
        .first()["jaccard"],
        9,
    )
    cross = served.where(F.col("db") == 1000)
    assert cross.count() == 500
    assert {round(r["jaccard"], 9) for r in cross.collect()} == {want_j}
    assert served.count() == 500 * 499 // 2 + 500


def test_minhash_index_erase_rewrites_bounded_dirs(spark, tmp_path):
    """GDPR-erase cost pins (r12): erasing an exact COPY rewrites exactly
    one members bucket + one groups bucket and must not touch pairs,
    bands or shingles (the group's signature stays serveable for the
    survivors); erasing the LAST member of a group additionally rewrites
    <= N_BANDS band buckets + 1 shingle bucket — never a table scan,
    whatever the index population."""
    from music_streaming_services_etl_pipeline_with_airflow_spark.operators.dedup import (
        N_BANDS,
    )
    from music_streaming_services_etl_pipeline_with_airflow_spark.snapshots import (
        SnapshotTable,
    )
    from music_streaming_services_etl_pipeline_with_airflow_spark.streaming.ingest import (
        erase_doc_from_minhash_index,
        make_minhash_index_applier,
        serve_minhash_pairs,
    )

    pairs_t = SnapshotTable(str(tmp_path / "pairs"))
    bands_t = SnapshotTable(str(tmp_path / "bands"))
    shingles_t = SnapshotTable(str(tmp_path / "shingles"))
    groups_t = SnapshotTable(str(tmp_path / "groups"))
    members_t = SnapshotTable(str(tmp_path / "members"))
    nb = 8
    apply_batch = make_minhash_index_applier(
        pairs_t, bands_t, shingles_t, groups_t, members_t, n_buckets=nb
    )
    schema = "doc_id long, text string"
    # a large-ish index population so "bounded" is distinguishable from
    # "proportional": 60 distinct docs + a 3-copy group
    filler = [
        (100 + i, " ".join(f"w{i}_{j}" for j in range(10))) for i in range(60)
    ]
    dup = "the exact duplicated paragraph with plenty of shared tokens here"
    apply_batch(spark.createDataFrame(filler[:30] + [(1, dup)], schema), 0)
    apply_batch(spark.createDataFrame(filler[30:] + [(2, dup), (3, dup)], schema), 1)

    def vmaps():
        return {
            "pairs_v": pairs_t.latest_version(),
            "bands_v": bands_t.latest_version(),
            "sh_v": shingles_t.latest_version(),
            "bands_bm": bands_t._bucket_map(bands_t.latest_version()),
            "sh_bm": shingles_t._bucket_map(shingles_t.latest_version()),
            "mem_bm": members_t._bucket_map(members_t.latest_version()),
            "grp_bm": groups_t._bucket_map(groups_t.latest_version()),
        }

    def changed(pre_bm, post_bm):
        keys = set(pre_bm) | set(post_bm)
        return [b for b in keys if pre_bm.get(b) != post_bm.get(b)]

    # (a) copy erase: group survives — near-dup state untouched
    pre = vmaps()
    erase_doc_from_minhash_index(
        spark, pairs_t, bands_t, shingles_t, groups_t, members_t, nb, 3
    )
    post = vmaps()
    assert post["pairs_v"] == pre["pairs_v"]  # no pairs rewrite
    assert post["bands_v"] == pre["bands_v"]  # no band rewrite
    assert post["sh_v"] == pre["sh_v"]  # no shingle rewrite
    assert len(changed(pre["mem_bm"], post["mem_bm"])) == 1
    assert len(changed(pre["grp_bm"], post["grp_bm"])) == 1
    served = serve_minhash_pairs(spark, pairs_t, groups_t, members_t)
    assert {(r.da, r.db) for r in served.collect()} == {(1, 2)}

    # (b) drain the group: the LAST member's erase clears the signature
    # with <= N_BANDS band buckets + 1 shingle bucket rewritten
    erase_doc_from_minhash_index(
        spark, pairs_t, bands_t, shingles_t, groups_t, members_t, nb, 2
    )
    pre = vmaps()
    erase_doc_from_minhash_index(
        spark, pairs_t, bands_t, shingles_t, groups_t, members_t, nb, 1
    )
    post = vmaps()
    assert 1 <= len(changed(pre["bands_bm"], post["bands_bm"])) <= N_BANDS
    assert len(changed(pre["sh_bm"], post["sh_bm"])) == 1
    assert bands_t.read(spark).filter("doc_id = 1").count() == 0
    assert shingles_t.read(spark).filter("doc_id = 1").count() == 0
    assert serve_minhash_pairs(spark, pairs_t, groups_t, members_t).count() == 0
    # the filler population was never rewritten: its rows still served
    assert bands_t.read(spark).count() >= 60 * N_BANDS


def test_minhash_index_hot_band_candidates_stay_distributed(spark, tmp_path):
    """Hot-BAND drill (r12): 300 DISTINCT near-dup docs (shared
    boilerplate, unique tails) pile their band rows onto a handful of hot
    bvals. A 1-doc probe against that index legitimately yields ~300
    candidates — the pin is that those ids never ride through the driver
    (driver_collected_rows stays O(buckets), the r11 collect would have
    been O(candidates)) and every candidate is REAL (the band collision
    is output-proportional at this threshold, not a false-positive
    explosion)."""
    from music_streaming_services_etl_pipeline_with_airflow_spark.snapshots import (
        SnapshotTable,
    )
    from music_streaming_services_etl_pipeline_with_airflow_spark.streaming.ingest import (
        make_minhash_index_applier,
    )

    pairs_t = SnapshotTable(str(tmp_path / "pairs"))
    bands_t = SnapshotTable(str(tmp_path / "bands"))
    shingles_t = SnapshotTable(str(tmp_path / "shingles"))
    groups_t = SnapshotTable(str(tmp_path / "groups"))
    members_t = SnapshotTable(str(tmp_path / "members"))
    apply_batch = make_minhash_index_applier(
        pairs_t,
        bands_t,
        shingles_t,
        groups_t,
        members_t,
        n_buckets=8,
        record_stats=True,
    )
    schema = "doc_id long, text string"
    boiler = "subscribe to our newsletter for the latest updates and offers"
    hot = [(i, f"{boiler} item{i}") for i in range(300)]
    apply_batch(spark.createDataFrame(hot[:150], schema), 0)
    apply_batch(spark.createDataFrame(hot[150:], schema), 1)
    # the 1-doc probe: collides with every stored boilerplate doc
    apply_batch(
        spark.createDataFrame([(9999, f"{boiler} item_fresh")], schema), 2
    )
    st = apply_batch.last_stats
    assert st["cand_hist_docs"] >= 250  # nearly all 300 collide
    # r12 invariant: candidate ids stayed executor-side — driver traffic
    # is 1 th + N_BANDS bvals + touched-bucket ids, NOT ~300 candidate ids
    assert st["driver_collected_rows"] <= 30
    # and the collisions were real work, not waste: the probe doc pairs
    # with (almost) every boilerplate doc at jaccard >= 0.5
    assert st["pairs_appended"] >= 250


def test_delete_probe_dir_attribution_and_divergence_guard():
    """The one-job delete probe's file->dir attribution (r12): local and
    scheme-qualified URIs map back to their manifest dirs under one
    normal form, and a hit that maps to no manifest dir (path
    representations diverged) raises instead of silently classifying
    every dir untouched."""
    import pytest as _pytest

    from music_streaming_services_etl_pipeline_with_airflow_spark.snapshots import (
        _attribute_hit_dirs,
    )

    dirs = ["/tmp/t/data-v1-a", "/tmp/t/data-v2-b", "s3a://bkt/t/data-v3-c"]
    got = _attribute_hit_dirs(
        [
            "file:///tmp/t/data-v1-a/part-0.parquet",
            "s3a://bkt/t/data-v3-c/part-1.parquet",
        ],
        dirs,
        "t",
    )
    assert got == {"/tmp/t/data-v1-a", "s3a://bkt/t/data-v3-c"}
    # no hits -> nothing touched
    assert _attribute_hit_dirs([], dirs, "t") == set()
    # a hit outside every manifest dir must fail loudly
    with _pytest.raises(ValueError, match="diverged"):
        _attribute_hit_dirs(
            ["file:///elsewhere/data-v1-a/part-0.parquet"], dirs, "t"
        )
    # same-path different-authority is NOT the same dir
    with _pytest.raises(ValueError, match="diverged"):
        _attribute_hit_dirs(
            ["s3a://other-bkt/t/data-v3-c/part-1.parquet"], dirs, "t"
        )


def test_minhash_fsck_repairs_torn_multi_member_erase(spark, tmp_path):
    """The minhash twin of the semantic index's fsck (r12): simulate the
    one non-resumable erase window (member row removed, counter not
    decremented) — the audit detects the drift and recounts; an orphaned
    0-member group (torn last-member erase) is completed by the fsck
    itself (signature cleared, group row dropped)."""
    from pyspark.sql import functions as F

    from music_streaming_services_etl_pipeline_with_airflow_spark.snapshots import (
        SnapshotTable,
    )
    from music_streaming_services_etl_pipeline_with_airflow_spark.streaming.ingest import (
        _MH_MEMBERS_SCHEMA,
        audit_and_repair_minhash_index,
        erase_doc_from_minhash_index,
        make_minhash_index_applier,
        serve_minhash_pairs,
    )

    pairs_t = SnapshotTable(str(tmp_path / "pairs"))
    bands_t = SnapshotTable(str(tmp_path / "bands"))
    shingles_t = SnapshotTable(str(tmp_path / "shingles"))
    groups_t = SnapshotTable(str(tmp_path / "groups"))
    members_t = SnapshotTable(str(tmp_path / "members"))
    nb = 4
    apply_batch = make_minhash_index_applier(
        pairs_t, bands_t, shingles_t, groups_t, members_t, n_buckets=nb
    )
    fam = "the quick brown fox jumps over the lazy dog again and again "
    apply_batch(
        spark.createDataFrame(
            [
                (1, fam + "alpha beta"),
                (2, fam + "alpha beta"),  # exact copy of 1 -> group {1,2}
                (3, fam + "alpha gamma"),  # near-dup neighbor
            ],
            "doc_id long, text string",
        ),
        0,
    )
    assert audit_and_repair_minhash_index(
        spark, pairs_t, bands_t, shingles_t, groups_t, members_t, nb
    ) == []
    # torn multi-member erase of doc 2: member row out, counter untouched
    mem_bucket = SnapshotTable.bucket_of(F.col("doc_id"), nb)
    mb = (
        spark.createDataFrame([(2,)], "doc_id long")
        .select(mem_bucket.alias("_b"))
        .first()[0]
    )
    bucket_mem = members_t.read_buckets(
        spark, [mb], _MH_MEMBERS_SCHEMA, n_buckets=nb
    ).localCheckpoint(eager=True)
    members_t.commit_buckets(
        bucket_mem.where(F.col("doc_id") != 2).withColumn("_bucket", mem_bucket),
        [mb],
        n_buckets=nb,
    )
    rep = audit_and_repair_minhash_index(
        spark, pairs_t, bands_t, shingles_t, groups_t, members_t, nb
    )
    assert len(rep) == 1 and rep[0]["action"] == "recounted"
    assert rep[0]["stored_n"] == 2 and rep[0]["live_n"] == 1
    # the repaired index now erases doc 1 (the true last member) fully
    erase_doc_from_minhash_index(
        spark, pairs_t, bands_t, shingles_t, groups_t, members_t, nb, 1
    )
    assert shingles_t.read(spark).where("doc_id = 1").count() == 0
    assert pairs_t.read(spark).where("da = 1 OR db = 1").count() == 0
    # orphan: remove doc 3's member row with no erase at all; fsck
    # completes the interrupted last-member erase end-to-end
    mb3 = (
        spark.createDataFrame([(3,)], "doc_id long")
        .select(mem_bucket.alias("_b"))
        .first()[0]
    )
    bm3 = members_t.read_buckets(
        spark, [mb3], _MH_MEMBERS_SCHEMA, n_buckets=nb
    ).localCheckpoint(eager=True)
    members_t.commit_buckets(
        bm3.where(F.col("doc_id") != 3).withColumn("_bucket", mem_bucket),
        [mb3],
        n_buckets=nb,
    )
    rep2 = audit_and_repair_minhash_index(
        spark, pairs_t, bands_t, shingles_t, groups_t, members_t, nb
    )
    assert len(rep2) == 1 and rep2[0]["action"] == "dropped"
    assert groups_t.read(spark).count() == 0
    assert {
        (r.da, r.db)
        for r in serve_minhash_pairs(spark, pairs_t, groups_t, members_t).collect()
    } == set()


def test_minhash_clear_crash_before_shingles_commit_retry_converges(
    spark, tmp_path
):
    """ADVICE r12 repro for the minhash twin, inverted by the r13 fix:
    the clear now deletes the derived band rows FIRST and the shingles
    row (the only source for recomputing the bval set) LAST. A crash
    between the two retains the shingles — so a plain retry recomputes
    the bvals and converges; the old order (shingles first) leaked the
    band rows forever."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from music_streaming_services_etl_pipeline_with_airflow_spark.snapshots import (
        SnapshotTable,
    )
    from music_streaming_services_etl_pipeline_with_airflow_spark.streaming.ingest import (
        audit_and_repair_minhash_index,
        erase_doc_from_minhash_index,
        make_minhash_index_applier,
        serve_minhash_pairs,
    )

    pairs_t = SnapshotTable(str(tmp_path / "pairs"))
    bands_t = SnapshotTable(str(tmp_path / "bands"))
    shingles_t = SnapshotTable(str(tmp_path / "shingles"))
    groups_t = SnapshotTable(str(tmp_path / "groups"))
    members_t = SnapshotTable(str(tmp_path / "members"))
    nb = 4
    apply_batch = make_minhash_index_applier(
        pairs_t, bands_t, shingles_t, groups_t, members_t, n_buckets=nb
    )
    fam = "the quick brown fox jumps over the lazy dog again and again "
    apply_batch(
        spark.createDataFrame(
            [(1, fam + "alpha beta"), (2, fam + "alpha gamma")],
            "doc_id long, text string",
        ),
        0,
    )
    assert bands_t.read(spark).filter("doc_id = 1").count() > 0
    # inject a crash exactly before the SHINGLES commit (now the LAST
    # commit of the clear)
    real_commit = shingles_t.commit_buckets
    state = {"calls": 0}

    def crashing(*a, **k):
        state["calls"] += 1
        if state["calls"] == 1:
            raise RuntimeError("simulated crash before SHINGLES commit")
        return real_commit(*a, **k)

    shingles_t.commit_buckets = crashing
    with _pytest.raises(RuntimeError, match="simulated crash"):
        erase_doc_from_minhash_index(
            spark, pairs_t, bands_t, shingles_t, groups_t, members_t, nb, 1
        )
    # torn state: derived band rows gone, shingles (recompute source)
    # retained, member/group rows still present
    assert bands_t.read(spark).filter("doc_id = 1").count() == 0
    assert shingles_t.read(spark).filter("doc_id = 1").count() > 0
    assert members_t.read(spark).filter("doc_id = 1").count() == 1
    # plain retry converges end-to-end
    erase_doc_from_minhash_index(
        spark, pairs_t, bands_t, shingles_t, groups_t, members_t, nb, 1
    )
    assert state["calls"] >= 2
    assert shingles_t.read(spark).filter("doc_id = 1").count() == 0
    assert bands_t.read(spark).filter("doc_id = 1").count() == 0
    assert members_t.read(spark).filter("doc_id = 1").count() == 0
    assert pairs_t.read(spark).filter("da = 1 OR db = 1").count() == 0
    assert audit_and_repair_minhash_index(
        spark, pairs_t, bands_t, shingles_t, groups_t, members_t, nb
    ) == []
    # doc 2 still serves alone (no pairs), its state intact
    assert shingles_t.read(spark).filter("doc_id = 2").count() > 0
    assert serve_minhash_pairs(spark, pairs_t, groups_t, members_t).count() == 0


def test_delete_probe_attribution_normalizes_uri_representation(tmp_path):
    """r13 (ADVICE): benign URI-representation differences — hostname
    case, explicit-vs-implicit default port, symlinked local dirs — must
    attribute, not abort: a deployment where Spark reports
    hdfs://NN:8020/... for a manifest dir written hdfs://nn/... was
    aborting every delete with the divergence guard."""
    from music_streaming_services_etl_pipeline_with_airflow_spark.snapshots import (
        _attribute_hit_dirs,
    )

    # hostname case + explicit default port fold to the manifest's form
    dirs = ["hdfs://nn/t/data-v1-a", "s3a://Bkt/t/data-v2-b"]
    got = _attribute_hit_dirs(
        [
            "hdfs://NN:8020/t/data-v1-a/part-0.parquet",
            "s3a://bkt/t/data-v2-b/part-1.parquet",
        ],
        dirs,
        "t",
    )
    assert got == set(dirs)
    # a NON-default port is identity, not representation: still diverges
    import pytest as _pytest

    with _pytest.raises(ValueError, match="diverged"):
        _attribute_hit_dirs(
            ["hdfs://nn:9000/t/data-v1-a/part-0.parquet"], dirs, "t"
        )
    # symlinked local dir: manifest names the symlink, Spark reports the
    # resolved real path — both sides realpath to one normal form
    real = tmp_path / "real"
    real.mkdir()
    link = tmp_path / "link"
    link.symlink_to(real)
    got2 = _attribute_hit_dirs(
        [f"file://{real}/part-0.parquet"], [str(link)], "t"
    )
    assert got2 == {str(link)}


def test_commit_buckets_replace_all_allows_bucket_count_change(
    spark, tmp_path
):
    """replace_all_buckets (r13): the ONE commit shape under which a
    bucketed lineage may change its bucket count — nothing carries over
    by reference, so the hash-mod drift _check_n_buckets protects
    against cannot occur. Content survives the rebucket, extras (replay
    cursors) carry forward, and the plain-path mismatch still fails."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from music_streaming_services_etl_pipeline_with_airflow_spark.snapshots import (
        SnapshotTable,
    )

    t = SnapshotTable(str(tmp_path / "t"))
    rows = spark.createDataFrame(
        [(i, f"v{i}") for i in range(40)], "k long, val string"
    )
    b4 = SnapshotTable.bucket_of(F.col("k"), 4)
    t.commit_buckets(
        rows.withColumn("_bucket", b4),
        list(range(4)),
        n_buckets=4,
        extra={"last_batch_id": 7},
    )
    # plain path still refuses a different count
    b8 = SnapshotTable.bucket_of(F.col("k"), 8)
    with _pytest.raises(ValueError, match="n_buckets"):
        t.commit_buckets(
            rows.withColumn("_bucket", b8), list(range(8)), n_buckets=8
        )
    # full-replacement rebucket: 4 -> 8
    t.commit_buckets(
        rows.withColumn("_bucket", b8),
        list(range(8)),
        n_buckets=8,
        replace_all_buckets=True,
    )
    v = t.latest_version()
    assert t._manifest(v)["n_buckets"] == 8
    assert t.latest_manifest_field("last_batch_id") == 7  # cursor carried
    got = {(r.k, r.val) for r in t.read(spark).collect()}
    assert got == {(i, f"v{i}") for i in range(40)}
    # bucket-pruned reads under the NEW count see exactly their keys
    some = t.read_buckets(
        spark, [0, 3], "k long, val string", n_buckets=8
    )
    expect = {
        r.k
        for r in rows.withColumn("_b", b8).where(F.col("_b").isin([0, 3])).collect()
    }
    assert {r.k for r in some.collect()} == expect
    # later plain commits validate against the NEW stored count
    with _pytest.raises(ValueError, match="n_buckets"):
        t.commit_buckets(
            rows.withColumn("_bucket", b4), list(range(4)), n_buckets=4
        )


def test_minhash_fsck_purges_pre_r13_orphan_band_rows(spark, tmp_path):
    """Minhash twin of the semantic orphan purge: a pre-r13 clear that
    deleted the shingles row first and crashed before the bands delete
    left band rows keyed by a gid with no shingles — permanently, since
    the retry recomputed an empty bval set. fsck phase 2 (r13) anti-joins
    BANDS against shingles and purges exactly the orphans' bval buckets."""
    from pyspark.sql import functions as F

    from music_streaming_services_etl_pipeline_with_airflow_spark.snapshots import (
        SnapshotTable,
    )
    from music_streaming_services_etl_pipeline_with_airflow_spark.streaming.ingest import (
        _MH_SHINGLES_SCHEMA,
        audit_and_repair_minhash_index,
        erase_doc_from_minhash_index,
        make_minhash_index_applier,
    )

    pairs_t = SnapshotTable(str(tmp_path / "pairs"))
    bands_t = SnapshotTable(str(tmp_path / "bands"))
    shingles_t = SnapshotTable(str(tmp_path / "shingles"))
    groups_t = SnapshotTable(str(tmp_path / "groups"))
    members_t = SnapshotTable(str(tmp_path / "members"))
    nb = 4
    apply_batch = make_minhash_index_applier(
        pairs_t, bands_t, shingles_t, groups_t, members_t, n_buckets=nb
    )
    fam = "the quick brown fox jumps over the lazy dog again and again "
    apply_batch(
        spark.createDataFrame(
            [(1, fam + "alpha beta"), (2, fam + "delta gamma")],
            "doc_id long, text string",
        ),
        0,
    )
    n_band_rows_1 = bands_t.read(spark).where("doc_id = 1").count()
    assert n_band_rows_1 > 0
    # manufacture the pre-r13 order: shingles row deleted FIRST, crash
    # before the bands delete
    id_bucket = SnapshotTable.bucket_of(F.col("doc_id"), nb)
    sb = (
        spark.createDataFrame([(1,)], "doc_id long")
        .select(id_bucket.alias("_b"))
        .first()[0]
    )
    bucket_sh = shingles_t.read_buckets(
        spark, [sb], _MH_SHINGLES_SCHEMA, n_buckets=nb
    ).localCheckpoint(eager=True)
    shingles_t.commit_buckets(
        bucket_sh.where(F.col("doc_id") != 1).withColumn("_bucket", id_bucket),
        [sb],
        n_buckets=nb,
    )
    # the pre-r13 retry: clear finds no shingles, no-ops on bands;
    # member/group drop — band rows orphaned
    erase_doc_from_minhash_index(
        spark, pairs_t, bands_t, shingles_t, groups_t, members_t, nb, 1
    )
    assert bands_t.read(spark).where("doc_id = 1").count() == n_band_rows_1
    rep = audit_and_repair_minhash_index(
        spark, pairs_t, bands_t, shingles_t, groups_t, members_t, nb
    )
    assert rep == [{"doc_id": 1, "action": "orphan_bands_purged"}]
    assert bands_t.read(spark).where("doc_id = 1").count() == 0
    assert bands_t.read(spark).where("doc_id = 2").count() > 0
    assert audit_and_repair_minhash_index(
        spark, pairs_t, bands_t, shingles_t, groups_t, members_t, nb
    ) == []


def test_minhash_pending_clear_blocks_resurrection_until_resolved(
    spark, tmp_path
):
    """The r13 pending-clear marker: a last-member erase that crashes
    MID-CLEAR leaves the group row alive with its signature partially
    gone — without the marker, an exact copy arriving before the retry
    would member-append into the half-cleared group and serve would
    silently lose its pairs forever. With it: (a) the applier fails
    loudly on the marked text; (b) a different group's last-member erase
    refuses to start; (c) the erase retry completes and clears the
    marker; (d) the copy then ingests as a FRESH group, re-bands, and
    re-pairs with its near-dup — serve matches the oracle-recompute
    expectation exactly."""
    import pytest as _pytest
    from pyspark.sql import functions as F  # noqa: F401

    from music_streaming_services_etl_pipeline_with_airflow_spark.snapshots import (
        SnapshotTable,
    )
    from music_streaming_services_etl_pipeline_with_airflow_spark.streaming.ingest import (
        audit_and_repair_minhash_index,
        erase_doc_from_minhash_index,
        make_minhash_index_applier,
        serve_minhash_pairs,
    )

    pairs_t = SnapshotTable(str(tmp_path / "pairs"))
    bands_t = SnapshotTable(str(tmp_path / "bands"))
    shingles_t = SnapshotTable(str(tmp_path / "shingles"))
    groups_t = SnapshotTable(str(tmp_path / "groups"))
    members_t = SnapshotTable(str(tmp_path / "members"))
    nb = 4
    apply_batch = make_minhash_index_applier(
        pairs_t, bands_t, shingles_t, groups_t, members_t, n_buckets=nb
    )
    fam = "the quick brown fox jumps over the lazy dog again and again "
    schema = "doc_id long, text string"
    apply_batch(
        spark.createDataFrame(
            [(1, fam + "alpha beta"), (2, fam + "alpha gamma")], schema
        ),
        0,
    )
    pre = {
        (r.da, r.db)
        for r in serve_minhash_pairs(spark, pairs_t, groups_t, members_t).collect()
    }
    assert pre == {(1, 2)}
    # tear the erase of doc 1 mid-clear (bands commit dies; the marker
    # is already in the GROUPS manifest)
    real_commit = bands_t.commit_buckets
    try:
        def crash(*a, **k):
            raise RuntimeError("mid-clear crash")

        bands_t.commit_buckets = crash
        with _pytest.raises(RuntimeError, match="mid-clear"):
            erase_doc_from_minhash_index(
                spark, pairs_t, bands_t, shingles_t, groups_t, members_t,
                nb, 1,
            )
    finally:
        bands_t.commit_buckets = real_commit
    assert (groups_t.latest_manifest_field("pending_clear") or "").startswith("1@")
    # (a) a copy of the half-cleared text is REFUSED
    with _pytest.raises(ValueError, match="INCOMPLETE last-member erase"):
        apply_batch(
            spark.createDataFrame([(3, fam + "alpha beta")], schema), 1
        )
    # (b) a different group's last-member erase refuses to start
    with _pytest.raises(ValueError, match="pending for another group"):
        erase_doc_from_minhash_index(
            spark, pairs_t, bands_t, shingles_t, groups_t, members_t, nb, 2
        )
    # (c) the retry completes the marked erase and clears the marker
    erase_doc_from_minhash_index(
        spark, pairs_t, bands_t, shingles_t, groups_t, members_t, nb, 1
    )
    assert not groups_t.latest_manifest_field("pending_clear")
    # (d) the copy now ingests as a fresh group and re-pairs with doc 2
    apply_batch(spark.createDataFrame([(3, fam + "alpha beta")], schema), 1)
    post = {
        (r.da, r.db)
        for r in serve_minhash_pairs(spark, pairs_t, groups_t, members_t).collect()
    }
    assert post == {(2, 3)}
    assert audit_and_repair_minhash_index(
        spark, pairs_t, bands_t, shingles_t, groups_t, members_t, nb
    ) == []


def test_minhash_fsck_completes_marked_erase(spark, tmp_path):
    """fsck resolution path for a marked (crashed mid-clear) last-member
    erase: phase 0 re-clears idempotently, drops the victim's member and
    group rows, clears the marker — and the index then accepts copies of
    the text as a fresh group."""
    import pytest as _pytest
    from pyspark.sql import functions as F  # noqa: F401

    from music_streaming_services_etl_pipeline_with_airflow_spark.snapshots import (
        SnapshotTable,
    )
    from music_streaming_services_etl_pipeline_with_airflow_spark.streaming.ingest import (
        audit_and_repair_minhash_index,
        erase_doc_from_minhash_index,
        make_minhash_index_applier,
        serve_minhash_pairs,
    )

    pairs_t = SnapshotTable(str(tmp_path / "pairs"))
    bands_t = SnapshotTable(str(tmp_path / "bands"))
    shingles_t = SnapshotTable(str(tmp_path / "shingles"))
    groups_t = SnapshotTable(str(tmp_path / "groups"))
    members_t = SnapshotTable(str(tmp_path / "members"))
    nb = 4
    apply_batch = make_minhash_index_applier(
        pairs_t, bands_t, shingles_t, groups_t, members_t, n_buckets=nb
    )
    fam = "the quick brown fox jumps over the lazy dog again and again "
    schema = "doc_id long, text string"
    apply_batch(
        spark.createDataFrame(
            [(1, fam + "alpha beta"), (2, fam + "alpha gamma")], schema
        ),
        0,
    )
    real_commit = bands_t.commit_buckets
    try:
        def crash(*a, **k):
            raise RuntimeError("mid-clear crash")

        bands_t.commit_buckets = crash
        with _pytest.raises(RuntimeError, match="mid-clear"):
            erase_doc_from_minhash_index(
                spark, pairs_t, bands_t, shingles_t, groups_t, members_t,
                nb, 1,
            )
    finally:
        bands_t.commit_buckets = real_commit
    rep = audit_and_repair_minhash_index(
        spark, pairs_t, bands_t, shingles_t, groups_t, members_t, nb
    )
    assert any(r.get("action") == "pending_clear_completed" for r in rep)
    assert not groups_t.latest_manifest_field("pending_clear")
    assert members_t.read(spark).where("doc_id = 1").count() == 0
    assert shingles_t.read(spark).where("doc_id = 1").count() == 0
    assert bands_t.read(spark).where("doc_id = 1").count() == 0
    # re-ingest of the text works and re-pairs
    apply_batch(spark.createDataFrame([(3, fam + "alpha beta")], schema), 1)
    post = {
        (r.da, r.db)
        for r in serve_minhash_pairs(spark, pairs_t, groups_t, members_t).collect()
    }
    assert post == {(2, 3)}
    assert audit_and_repair_minhash_index(
        spark, pairs_t, bands_t, shingles_t, groups_t, members_t, nb
    ) == []


def test_delete_where_fails_loudly_on_duplicate_dir_spellings(
    spark, tmp_path
):
    """r14 (ADVICE): two manifest dir spellings normalizing to one
    (authority, path) would make the hit-attribution dict last-wins — a
    hit in the dropped spelling silently attributes to the kept one, so
    delete_where would rewrite the wrong dir and leave matching rows
    behind. A manifest never legally lists one dir twice, so the
    attribution now fails loudly on a normalization collision."""
    import json

    import pytest as _pytest

    from music_streaming_services_etl_pipeline_with_airflow_spark.snapshots import SnapshotTable

    t = SnapshotTable(str(tmp_path / "t"))
    t.commit(spark.createDataFrame([(1, "x"), (2, "y")], "k long, s string"))
    m = t._manifest(1)
    d = m["dirs"][0]
    # forge v2 with a second spelling (trailing slash) of the same dir
    forged = dict(m)
    forged.update({"version": 2, "parent": 1, "dirs": [d, d + "/"]})
    with open(f"{t._mdir}/v000002.json", "w") as fh:
        json.dump(forged, fh)
    with _pytest.raises(ValueError, match="normalize to the same location"):
        t.delete_where(spark, "k = 1")
    # and no delete committed: v2 (the forgery) is still current and
    # the pre-forgery data still serves both rows
    assert t.latest_version() == 2
    assert t.read(spark, version=1).count() == 2


def test_minhash_batch_erase_serializes_last_member_clears_with_crash(
    spark, tmp_path
):
    """r14 (VERDICT r13 ask 4): a compliance sweep erases a LIST of docs,
    several of which are last members of their groups — the single
    pending_clear marker would make naive sequential single-erases fail
    on the second one if the first ever tore. erase_docs_from_minhash_
    index orders the clears internally (resolve-then-next). Drill: a
    3-last-member batch crashes MID-CLEAR on the second id; re-running
    the SAME call converges — the torn clear resolves from its marker,
    erased ids early-return, the walk finishes — and serve matches the
    survivors-only recompute with a clean fsck."""
    import pytest as _pytest

    from music_streaming_services_etl_pipeline_with_airflow_spark.snapshots import (
        SnapshotTable,
    )
    from music_streaming_services_etl_pipeline_with_airflow_spark.streaming import ingest as ing

    pairs_t = SnapshotTable(str(tmp_path / "pairs"))
    bands_t = SnapshotTable(str(tmp_path / "bands"))
    shingles_t = SnapshotTable(str(tmp_path / "shingles"))
    groups_t = SnapshotTable(str(tmp_path / "groups"))
    members_t = SnapshotTable(str(tmp_path / "members"))
    nb = 4
    apply_batch = ing.make_minhash_index_applier(
        pairs_t, bands_t, shingles_t, groups_t, members_t, n_buckets=nb
    )
    fam = "the quick brown fox jumps over the lazy dog again and again "
    other = "completely different words about snapshot table manifests "
    schema = "doc_id long, text string"
    apply_batch(
        spark.createDataFrame(
            [
                (1, fam + "alpha beta"),
                (2, fam + "alpha gamma"),
                (3, fam + "alpha delta"),
                (4, other + "one two"),
                (5, other + "one two"),  # exact copy of 4
            ],
            schema,
        ),
        0,
    )
    pre = {
        (r.da, r.db)
        for r in ing.serve_minhash_pairs(
            spark, pairs_t, groups_t, members_t
        ).collect()
    }
    assert {(1, 2), (1, 3), (2, 3), (4, 5)} <= pre
    # crash on the SECOND last-member clear of the batch (id 2): its
    # marker is already committed, its signature partially intact
    real_clear = ing._clear_minhash_signature
    calls = {"n": 0}

    def flaky_clear(*a, **k):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("mid-batch crash")
        return real_clear(*a, **k)

    try:
        ing._clear_minhash_signature = flaky_clear
        with _pytest.raises(RuntimeError, match="mid-batch crash"):
            ing.erase_docs_from_minhash_index(
                spark, pairs_t, bands_t, shingles_t, groups_t, members_t,
                nb, [1, 2, 3],
            )
    finally:
        ing._clear_minhash_signature = real_clear
    assert (groups_t.latest_manifest_field("pending_clear") or "").startswith(
        "2@"
    )
    # re-running the SAME batch call converges end-to-end
    ing.erase_docs_from_minhash_index(
        spark, pairs_t, bands_t, shingles_t, groups_t, members_t,
        nb, [1, 2, 3],
    )
    assert not groups_t.latest_manifest_field("pending_clear")
    post = {
        (r.da, r.db)
        for r in ing.serve_minhash_pairs(
            spark, pairs_t, groups_t, members_t
        ).collect()
    }
    assert post == {(4, 5)}
    for t, col in ((members_t, "doc_id"), (shingles_t, "doc_id")):
        assert t.read(spark).where(f"{col} in (1,2,3)").count() == 0
    assert bands_t.read(spark).where("doc_id in (1,2,3)").count() == 0
    assert ing.audit_and_repair_minhash_index(
        spark, pairs_t, bands_t, shingles_t, groups_t, members_t, nb
    ) == []


def test_minhash_bulk_seed_equals_incremental_build(spark, tmp_path):
    """r15: bulk_seed_minhash_index — the 100-TB bootstrap path for the
    lexical near-dup index. Pin: the bulk-seeded five-table state is
    CONTENT-IDENTICAL to the applier ingesting the same corpus in
    ascending-id chunks (pairs incl. jaccard, bands, shingles, group
    counters/shingled flags, members), cursors live, and a continuation
    batch applied to BOTH indexes leaves their served pair sets
    identical."""
    import pytest as _pytest

    from music_streaming_services_etl_pipeline_with_airflow_spark.snapshots import (
        SnapshotTable,
    )
    from music_streaming_services_etl_pipeline_with_airflow_spark.streaming import ingest as ing

    fam = "the quick brown fox jumps over the lazy dog again and again "
    other = "completely different words about snapshot table manifests "
    rows = [
        (1, fam + "alpha beta"),
        (2, fam + "alpha gamma"),       # near-dup of 1
        (3, fam + "alpha beta"),        # exact copy of 1
        (4, other + "one two"),
        (5, other + "one two"),         # exact copy of 4
        (6, "xy"),                      # too short to shingle
        (7, "xy"),                      # exact copy of the unshingleable
        (8, other + "one three"),       # near-dup of 4
    ]
    schema = "doc_id long, text string"
    extra = [(20, other + "one two"), (21, fam + "alpha delta")]
    nb = 4

    def tables(sub):
        names = ("pairs", "bands", "shingles", "groups", "members")
        return tuple(SnapshotTable(str(tmp_path / sub / n)) for n in names)

    it = tables("incr")
    apply_incr = ing.make_minhash_index_applier(*it, n_buckets=nb)
    for i, chunk in enumerate((rows[:3], rows[3:6], rows[6:])):
        apply_incr(spark.createDataFrame(chunk, schema), i)

    bt = tables("bulk")
    ing.bulk_seed_minhash_index(
        spark, *bt, spark.createDataFrame(rows, schema), nb, batch_id=2
    )

    def content(t, cols):
        return sorted(tuple(r) for r in t.read(spark).select(*cols).collect())

    for i_t, b_t, cols in (
        (it[0], bt[0], ["da", "db", "jaccard"]),
        (it[1], bt[1], ["doc_id", "g", "band", "bval"]),
        (it[2], bt[2], ["doc_id", "s"]),
        (it[3], bt[3], ["th", "gid", "shingled", "n_members"]),
        (it[4], bt[4], ["doc_id", "gid", "th"]),
    ):
        assert content(b_t, cols) == content(i_t, cols)
    assert bt[1].latest_manifest_field("n_buckets") == it[
        1
    ].latest_manifest_field("n_buckets")
    with _pytest.raises(ValueError, match="FRESH tables"):
        ing.bulk_seed_minhash_index(
            spark, *bt, spark.createDataFrame(rows, schema), nb
        )
    # the stream continues on the bootstrapped index: same served sets
    apply_bulk = ing.make_minhash_index_applier(*bt, n_buckets=nb)
    batch = spark.createDataFrame(extra, schema)
    apply_bulk(batch, 3)
    apply_incr(batch, 3)
    serve = lambda t: sorted(  # noqa: E731
        (r.da, r.db)
        for r in ing.serve_minhash_pairs(spark, t[0], t[3], t[4]).collect()
    )
    got = serve(bt)
    assert got == serve(it)
    assert (4, 20) in got and (1, 3) in got and (1, 21) in got
    assert not any(6 in pr or 7 in pr for pr in got)  # unshingleable


def test_minhash_batch_erase_survivor_mass_is_set_oriented_with_crash(
    spark, tmp_path
):
    """r15 (VERDICT r14 ask 1): the batch erase's NON-last-member mass
    erases in THREE commits regardless of N — one MEMBERS
    delete_where(doc_id IN ...) that atomically records the groups'
    ABSOLUTE surviving counts in a pending_group_sync marker, one GROUPS
    bucket-set rewrite applying them, one marker-clear metadata commit.
    Drill: the GROUPS rewrite crashes; the applier refuses to ingest a
    copy of an affected group's text while the marker is pending; re-
    running the SAME erase call applies the recorded sync (idempotent
    absolute counts) and converges; fsck clean."""
    import pytest as _pytest

    from music_streaming_services_etl_pipeline_with_airflow_spark.snapshots import (
        SnapshotTable,
    )
    from music_streaming_services_etl_pipeline_with_airflow_spark.streaming import ingest as ing

    pairs_t = SnapshotTable(str(tmp_path / "pairs"))
    bands_t = SnapshotTable(str(tmp_path / "bands"))
    shingles_t = SnapshotTable(str(tmp_path / "shingles"))
    groups_t = SnapshotTable(str(tmp_path / "groups"))
    members_t = SnapshotTable(str(tmp_path / "members"))
    nb = 4
    apply_batch = ing.make_minhash_index_applier(
        pairs_t, bands_t, shingles_t, groups_t, members_t, n_buckets=nb
    )
    text_a = "the quick brown fox jumps over the lazy dog alpha beta "
    text_b = "completely different words about snapshot table manifests "
    schema = "doc_id long, text string"
    apply_batch(
        spark.createDataFrame(
            [(1, text_a), (2, text_a), (3, text_a), (4, text_b), (5, text_b)],
            schema,
        ),
        0,
    )
    v_members_before = members_t.latest_version()
    # erase 1 and 2 — group A keeps member 3, so this is pure survivor
    # mass: no signature may be cleared, three commits total
    real = groups_t.commit_buckets
    def crash(*a, **k):
        raise RuntimeError("mid-sync crash")
    try:
        groups_t.commit_buckets = crash
        with _pytest.raises(RuntimeError, match="mid-sync crash"):
            ing.erase_docs_from_minhash_index(
                spark, pairs_t, bands_t, shingles_t, groups_t, members_t,
                nb, [1, 2],
            )
    finally:
        groups_t.commit_buckets = real
    # torn: member rows gone, sync marker recorded, counter still stale
    sync = members_t.latest_manifest_field("pending_group_sync")
    assert sync and ": 1" in sync  # absolute target is 3-2=1 survivor
    assert members_t.read(spark).where("doc_id in (1,2)").count() == 0
    assert (
        groups_t.read(spark)
        .where("n_members = 3")
        .count()
        == 1
    )
    # the applier fails loudly on a copy of the affected group's text
    with _pytest.raises(ValueError, match="pending_group_sync"):
        apply_batch(spark.createDataFrame([(9, text_a)], schema), 1)
    # re-running the SAME call converges: the sync applies, marker clears
    ing.erase_docs_from_minhash_index(
        spark, pairs_t, bands_t, shingles_t, groups_t, members_t,
        nb, [1, 2],
    )
    assert not members_t.latest_manifest_field("pending_group_sync")
    counts = {
        r["n_members"]
        for r in groups_t.read(spark).select("n_members").collect()
    }
    assert counts == {1, 2}  # group A -> 1 survivor, group B untouched
    # the surviving member still serves its group's signature: 4-5 pair
    # survives, no pair can name 1 or 2
    post = {
        (r.da, r.db)
        for r in ing.serve_minhash_pairs(
            spark, pairs_t, groups_t, members_t
        ).collect()
    }
    assert post == {(4, 5)}
    assert ing.audit_and_repair_minhash_index(
        spark, pairs_t, bands_t, shingles_t, groups_t, members_t, nb
    ) == []
    # O(tables) commit shape: the converged erase added exactly TWO
    # MEMBERS versions (the IN-delete + the marker clear) on top of the
    # crash run's — never one commit per id
    assert members_t.latest_version() <= v_members_before + 3


def test_rebucket_migrates_count_preserves_content_and_cursors(
    spark, tmp_path
):
    """r14 (VERDICT r13 ask 2): SnapshotTable.rebucket — content-neutral
    bucket-count migration through commit_buckets(replace_all_buckets=
    True). Content identical, replay cursor carried, the NEW count
    recorded (old-count callers now fail the _check_n_buckets guard,
    new-count bucket reads prune correctly), appended dir chains folded
    to ~1 dir per bucket, and bucket_occupancy (the trigger metric)
    reflects the migration."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from music_streaming_services_etl_pipeline_with_airflow_spark.snapshots import SnapshotTable

    t = SnapshotTable(str(tmp_path / "t"))
    schema = "k long, s string"
    bucket2 = SnapshotTable.bucket_of(F.col("k"), 2)
    # two append commits -> multi-dir buckets under count 2
    for lo in (0, 100):
        df = spark.range(lo, lo + 100).select(
            F.col("id").alias("k"), F.concat(F.lit("v"), F.col("id")).alias("s")
        )
        t.commit_buckets(
            df.withColumn("_bucket", bucket2),
            [0, 1],
            n_buckets=2,
            append=True,
            extra={"last_batch_id": lo},
        )
    before = {(r.k, r.s) for r in t.read(spark).collect()}
    occ2 = t.bucket_occupancy(spark, "k")
    assert occ2["n_buckets"] == 2 and occ2["n_rows"] == 200
    assert occ2["mean_bucket_rows"] == 100.0
    t.rebucket(spark, "k", 8)
    # content identical, cursor preserved, count migrated
    assert {(r.k, r.s) for r in t.read(spark).collect()} == before
    assert t.latest_manifest_field("last_batch_id") == 100
    assert t.latest_manifest_field("n_buckets") == 8
    occ8 = t.bucket_occupancy(spark, "k")
    assert occ8["n_buckets"] == 8 and occ8["n_rows"] == 200
    assert occ8["mean_bucket_rows"] == 25.0
    assert occ8["max_bucket_rows"] < occ2["max_bucket_rows"]
    # every bucket folded to <= 1 dir by the rewrite
    bm = t._bucket_map(t.latest_version())
    assert all(len(ds) <= 1 for ds in bm.values())
    # old-count access is now refused; new-count pruned reads are exact
    with _pytest.raises(ValueError, match="bucketed with n_buckets=8"):
        t.read_buckets(spark, [0], schema, n_buckets=2)
    b8 = SnapshotTable.bucket_of(F.col("k"), 8)
    want0 = {r.k for r in t.read(spark).where(b8 == 0).collect()}
    got0 = {
        r.k for r in t.read_buckets(spark, [0], schema, n_buckets=8).collect()
    }
    assert got0 == want0 and want0
    # non-bucketed lineages are refused fast
    flat = SnapshotTable(str(tmp_path / "flat"))
    flat.commit(spark.createDataFrame([(1, "x")], schema))
    with _pytest.raises(ValueError, match="not a bucketed commit"):
        flat.rebucket(spark, "k", 4)


def test_maybe_rebucket_triggers_only_past_target(spark, tmp_path):
    """r14: the trigger->migration loop in one call — within bounds it
    is a no-write audit (None); past the target it doubles to the first
    power-of-two multiple that restores the bound, preserving content
    and cursors through rebucket."""
    from pyspark.sql import functions as F

    from music_streaming_services_etl_pipeline_with_airflow_spark.snapshots import SnapshotTable

    t = SnapshotTable(str(tmp_path / "t"))
    b4 = SnapshotTable.bucket_of(F.col("k"), 4)
    df = spark.range(1000).select(
        F.col("id").alias("k"), F.col("id").cast("string").alias("s")
    )
    t.commit_buckets(
        df.withColumn("_bucket", b4), [0, 1, 2, 3], n_buckets=4,
        extra={"last_batch_id": 7},
    )
    # mean 250/bucket, target 300: within bounds -> no-op, same version
    v = t.latest_version()
    assert t.maybe_rebucket(spark, "k", 300) is None
    assert t.latest_version() == v
    # target 100: 1000 rows need 16 buckets (4->8 gives 125 > 100)
    assert t.maybe_rebucket(spark, "k", 100) == v + 1
    assert t.latest_manifest_field("n_buckets") == 16
    assert t.latest_manifest_field("last_batch_id") == 7
    assert t.read(spark).count() == 1000
    # idempotent once within bounds again
    assert t.maybe_rebucket(spark, "k", 100) is None


def test_maybe_rebucket_guards_identity_lineages_and_bad_target(
    spark, tmp_path
):
    """r15 (VERDICT r14 ask 3 + ADVICE): (a) a lineage whose manifest
    records a non-hash bucket_scheme (the IVF index's identity lists)
    fails LOUDLY in bucket_occupancy/maybe_rebucket/rebucket instead of
    silently re-hashing the layout out from under read_buckets callers;
    (b) with a bucket_expr(_of) override the audit reports the TRUE
    identity distribution and the migration preserves it; (c)
    rows_per_bucket_target <= 0 raises instead of looping forever; (d)
    a non-bucketed lineage gets the friendly _bucket_map error."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from music_streaming_services_etl_pipeline_with_airflow_spark.snapshots import SnapshotTable

    t = SnapshotTable(str(tmp_path / "ivfish"))
    # identity-bucketed: bucket == cid, skewed 7/1 across 4 lists
    df = spark.range(8).select(
        F.col("id").alias("vec_id"),
        F.when(F.col("id") < 7, F.lit(2)).otherwise(F.lit(0)).alias("cid"),
    )
    t.commit_buckets(
        df.withColumn("_bucket", F.col("cid").cast("int")),
        [0, 2],
        n_buckets=4,
        extra={"bucket_scheme": "identity:cid"},
    )
    # (a) default-hash calls fail loudly
    with _pytest.raises(ValueError, match="bucket_scheme"):
        t.bucket_occupancy(spark, "cid")
    with _pytest.raises(ValueError, match="bucket_scheme"):
        t.maybe_rebucket(spark, "cid", 1)
    with _pytest.raises(ValueError, match="bucket_scheme"):
        t.rebucket(spark, "cid", 8)
    # (b) with the override: true identity occupancy (max list = 7)
    occ = t.bucket_occupancy(
        spark, "cid", bucket_expr=F.col("cid").cast("int")
    )
    assert occ == {
        "n_rows": 8, "n_buckets": 4, "max_bucket_rows": 7,
        "mean_bucket_rows": 2.0,
    }
    # and maybe_rebucket with bucket_expr_of keeps the identity rule:
    # mean 2.0 > target 1 -> migrates to 8 buckets, content preserved,
    # rows still in their cid-named buckets under the new count
    v2 = t.maybe_rebucket(
        spark, "cid", 1, bucket_expr_of=lambda n: F.col("cid").cast("int")
    )
    assert v2 is not None
    assert t.latest_manifest_field("n_buckets") == 8
    assert t.read_buckets(
        spark, [2], "vec_id long, cid int", n_buckets=8
    ).count() == 7
    # (c) a non-positive target fails instead of looping forever
    with _pytest.raises(ValueError, match="rows_per_bucket_target"):
        t.maybe_rebucket(
            spark, "cid", 0,
            bucket_expr_of=lambda n: F.col("cid").cast("int"),
        )
    # (d) non-bucketed lineage: the friendly error, not a KeyError
    nb = SnapshotTable(str(tmp_path / "plain"))
    nb.commit(spark.createDataFrame([(1,)], "k long"))
    with _pytest.raises(ValueError, match="not a bucketed commit"):
        nb.bucket_occupancy(spark, "k")


def test_minhash_pairs_backfill_completes_deferred_bootstrap(spark, tmp_path):
    """r15: backfill_minhash_pairs — the lexical twin of the semantic
    backlog backfill. Pin: bootstrap(with_pairs=False) + streaming
    continuation + backfill serves EXACTLY what a with_pairs=True
    bootstrap + the same continuation serves, idempotent second run."""
    from music_streaming_services_etl_pipeline_with_airflow_spark.snapshots import (
        SnapshotTable,
    )
    from music_streaming_services_etl_pipeline_with_airflow_spark.streaming import ingest as ing

    fam = "the quick brown fox jumps over the lazy dog again and again "
    other = "completely different words about snapshot table manifests "
    rows = [
        (1, fam + "alpha beta"),
        (2, fam + "alpha gamma"),       # near-dup of 1
        (3, fam + "alpha beta"),        # exact copy of 1
        (4, other + "one two"),
        (5, other + "one three"),       # near-dup of 4
    ]
    schema = "doc_id long, text string"
    extra = [(20, other + "one two"), (21, fam + "alpha delta")]
    nb = 4

    def build(sub, with_pairs):
        names = ("pairs", "bands", "shingles", "groups", "members")
        ts = tuple(SnapshotTable(str(tmp_path / sub / n)) for n in names)
        ing.bulk_seed_minhash_index(
            spark, *ts, spark.createDataFrame(rows, schema), nb,
            batch_id=0, with_pairs=with_pairs,
        )
        ing.make_minhash_index_applier(*ts, n_buckets=nb)(
            spark.createDataFrame(extra, schema), 1
        )
        return ts

    full = build("full", True)
    lazy = build("lazy", False)
    serve = lambda ts: sorted(  # noqa: E731
        (r.da, r.db)
        for r in ing.serve_minhash_pairs(spark, ts[0], ts[3], ts[4]).collect()
    )
    want = serve(full)
    assert set(serve(lazy)) < set(want)
    n = ing.backfill_minhash_pairs(spark, lazy[0], lazy[1], lazy[2])
    assert n > 0
    assert serve(lazy) == want
    assert (1, 2) in want and (4, 5) in want and (1, 21) in want
    assert lazy[0].latest_manifest_field("last_batch_id") == 1
    v = lazy[0].latest_version()
    assert ing.backfill_minhash_pairs(spark, lazy[0], lazy[1], lazy[2]) == 0
    assert lazy[0].latest_version() == v


def test_bootstrapped_minhash_index_supports_erase_and_fsck(spark, tmp_path):
    """r15 integration seam: the GDPR/maintenance tooling must work on a
    BOOTSTRAPPED index exactly as on an applier-built one (the erase and
    fsck paths read only manifest fields the bootstrap writes). Drill:
    bulk-seed, batch-erase a whole group (last-member clear included),
    serve == survivors, fsck clean."""
    from music_streaming_services_etl_pipeline_with_airflow_spark.snapshots import (
        SnapshotTable,
    )
    from music_streaming_services_etl_pipeline_with_airflow_spark.streaming import ingest as ing

    fam = "the quick brown fox jumps over the lazy dog again and again "
    other = "completely different words about snapshot table manifests "
    rows = [
        (1, fam + "alpha beta"),
        (2, fam + "alpha beta"),        # exact copy of 1
        (3, fam + "alpha gamma"),       # near-dup of 1
        (4, other + "one two"),
        (5, other + "one three"),       # near-dup of 4
    ]
    nb = 4
    names = ("pairs", "bands", "shingles", "groups", "members")
    ts = tuple(SnapshotTable(str(tmp_path / n)) for n in names)
    ing.bulk_seed_minhash_index(
        spark, *ts, spark.createDataFrame(rows, "doc_id long, text string"),
        nb, batch_id=0,
    )
    # erase docs 1 AND 2 — the whole group: exercises the last-member
    # signature clear on bootstrap-written bands/shingles
    ing.erase_docs_from_minhash_index(spark, *ts, nb, [1, 2])
    served = {
        (r.da, r.db)
        for r in ing.serve_minhash_pairs(spark, ts[0], ts[3], ts[4]).collect()
    }
    assert served == {(4, 5)}
    for t, col in ((ts[4], "doc_id"), (ts[2], "doc_id"), (ts[1], "doc_id")):
        assert t.read(spark).where(f"{col} in (1,2)").count() == 0
    assert (
        ing.audit_and_repair_minhash_index(spark, *ts, nb) == []
    )
