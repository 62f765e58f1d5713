"""Hashing / shingling column expressions shared by the dedup + text
operators.

Cross-engine determinism: every hash is built from ``md5`` (identical hex
output in Spark and DuckDB) so DuckDB oracles can mirror the computation
exactly. MinHash uses the *lexicographic minimum of seeded md5 strings* —
``min(md5(seed || ':' || shingle))`` — which is engine-order independent
and needs no custom integer-hash parity.

Scale notes: all expressions are Catalyst built-ins (whole-stage codegen,
no Python). Shingling explodes ~n_tokens rows per doc — at 100 TB that is
a flatMap feeding a hash-partitioned aggregate, the canonical distributed
MinHash construction.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HEX_DIGITS = "0123456789abcdef"


def tokens(text: Column | str) -> Column:
    """Whitespace tokens (documents use single-space separation)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def word_shingles(toks_col: str, n: int = 3) -> Column:
    """Distinct n-word shingles from an array<string> column (by name).
    Empty array when the doc has <n tokens.

    0-based Spark indexing: sequence(0, size-n) mirrors DuckDB's 1-based
    generate_series(1, len-n+1).
    """
    lam = "i -> concat_ws(' ', " + ", ".join(f"{toks_col}[i+{j}]" for j in range(n)) + ")"
    expr = f"array_distinct(transform(sequence(0, size({toks_col}) - {n}), {lam}))"
    return F.when(F.size(F.col(toks_col)) >= n, F.expr(expr)).otherwise(
        F.array().cast("array<string>")
    )


def shingles_sql(n: int = 3, toks: str = "t") -> str:
    """DuckDB twin of word_shingles (1-based list indexing)."""
    body = " || ' ' || ".join(f"{toks}[i+{j}]" for j in range(n))
    return (
        f"list_distinct(list_transform(generate_series(1, len({toks}) - {n - 1}),"
        f" i -> {body}))"
    )


def seeded_md5(seed: int, col: Column) -> Column:
    """md5('<seed>:' || value) — identical in both engines."""
    return F.md5(F.concat(F.lit(f"{seed}:"), col))


def seeded_md5_sql(seed: int, col: str) -> str:
    return f"md5('{seed}:' || {col})"


def hex8_to_long(hexcol: Column) -> Column:
    """First 8 hex chars → 32-bit non-negative integer (as LONG).

    Spark ``conv(hex, 16, 10)`` — the DuckDB twin (hex8_to_long_sql) uses a
    digit-position sum because DuckDB has no conv(); both are exact integer
    math, so results agree.
    """
    return F.conv(F.substring(hexcol, 1, 8), 16, 10).cast("long")


def hex8_to_long_sql(hexcol: str) -> str:
    terms = " + ".join(
        f"(strpos('{HEX_DIGITS}', substr({hexcol}, {d + 1}, 1)) - 1) * {16 ** (7 - d)}"
        for d in range(8)
    )
    return f"CAST({terms} AS BIGINT)"
