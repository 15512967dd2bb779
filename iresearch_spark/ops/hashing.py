"""Deterministic 60-bit hashes derived from md5 — engine-portable.

Every dedup/fingerprint op hashes with the SAME function on the Spark
side and in the DuckDB oracle SQL: the top 15 hex chars of md5, read as
a 60-bit integer (fits a signed BIGINT in both engines). Seeded hash
families are built by prefixing the seed: h_i(x) = h(concat(i, ':', x)),
so the minhash family needs no shared random state.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def hash60(col: Column) -> Column:
    """Spark: 60-bit integer from md5(col). DuckDB equivalent:
    CAST(('0x' || substr(md5(x), 1, 15)) AS UBIGINT)::BIGINT"""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def hash60_sql(expr: str) -> str:
    """The DuckDB-side rendering of the same hash."""
    return f"CAST(CAST(('0x' || substr(md5({expr}), 1, 15)) AS UBIGINT) AS BIGINT)"


def seeded_hash60(col: Column, seed: int) -> Column:
    return hash60(F.concat(F.lit(f"{seed}:"), col))


def seeded_hash60_sql(expr: str, seed: int) -> str:
    return hash60_sql(f"'{seed}:' || {expr}")
