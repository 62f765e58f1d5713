"""Local stand-in for the driver's t2 correctness gate.

Runs every registry query on Spark and its DuckDB oracle on the same
parquet, then compares row count + (column-name-sorted, row-sorted) values
with EXACT equality — stricter than any plausible driver hash, so green
here should mean green in CORRECTNESS_r{N}.json.

Usage: python tools/check_parity.py [sf_dir] [query ...]
       PLAIN=1 python tools/check_parity.py ...   # driver simulation: vanilla
       SparkSession (ANSI on, 200 shuffle partitions) + __spark_entry__
       wrappers, exactly as the driver invokes us
"""

from __future__ import annotations

import math
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

from music_streaming_services_etl_pipeline_with_airflow_spark.schemas import TESTDATA_TABLES
from music_streaming_services_etl_pipeline_with_airflow_spark.session import get_spark
from music_streaming_services_etl_pipeline_with_airflow_spark.plans.registry import all_specs


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonical python-object form so dtype differences don't matter
    out = pd.DataFrame()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            s = s.astype("datetime64[us]").astype(str)
        out[c] = s.map(lambda v: _canon(v))
    out = out.sort_values(by=list(out.columns), kind="mergesort").reset_index(drop=True)
    return out


def _canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        return repr(v)  # full precision — exact comparison
    if hasattr(v, "tolist") and not hasattr(v, "strip"):  # numpy array/scalar
        v = v.tolist()
        if not isinstance(v, list):
            return _canon(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    try:
        if pd.isna(v):
            return "NULL"
    except (TypeError, ValueError):
        pass
    return str(v)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    # a name that isn't registered must FAIL, not silently check nothing —
    # a dropped @register once turned "check this query" into a vacuous
    # "0 failures"
    unknown = only - set(all_specs())
    if unknown:
        print(f"UNKNOWN query names (not registered): {sorted(unknown)}")
        return 1

    import os

    plain = os.environ.get("PLAIN") == "1"
    if plain:
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.master("local[8]").appName("parity-plain").getOrCreate()
    else:
        spark = get_spark("parity-check")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    specs = all_specs()
    if plain:
        import __spark_entry__ as entry_mod

        wrapped = entry_mod.queries()
        for name in specs:
            specs[name].fn = wrapped[name]
    failures = []
    for name, spec in sorted(specs.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = spec.fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if spec.oracle is None:
            ok = len(sdf) >= 0
            print(f"ROWS  {name}: {len(sdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            odf = con.execute(spec.oracle).fetchdf()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: oracle error: {e}")
            continue
        a, b = normalize(sdf), normalize(odf)
        if list(a.columns) != list(b.columns):
            failures.append(name)
            print(f"FAIL  {name}: columns {list(a.columns)} vs {list(b.columns)}")
            continue
        if len(a) != len(b):
            failures.append(name)
            print(f"FAIL  {name}: rowcount {len(a)} vs {len(b)}")
            continue
        neq = (a != b)
        if neq.any().any():
            failures.append(name)
            bad_cols = [c for c in a.columns if neq[c].any()]
            print(f"FAIL  {name}: value mismatch in {bad_cols}")
            for c in bad_cols[:2]:
                idx = neq[c].idxmax()
                print(f"      e.g. {c}[{idx}]: spark={a[c][idx]!r} oracle={b[c][idx]!r}")
            continue
        print(f"OK    {name}: {len(a)} rows, {len(a.columns)} cols [{time.time()-t0:.1f}s]")

    spark.stop()
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
