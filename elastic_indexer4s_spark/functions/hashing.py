"""Portable deterministic hashing shared by the dedup/similarity operators.

Every hash used for dedup fingerprints, MinHash permutations, SimHash bit
draws, and LSH hyperplanes is derived from md5 — NOT from Spark's xxhash64 /
DuckDB's hash() — so the exact same value is computable in Spark (JVM,
whole-stage codegen), in DuckDB (the driver's oracle), and in plain Python.
Truncating md5 to 15 hex chars (60 bits) keeps the value positive in a signed
64-bit long on every engine.

Scale note: md5 is ~2-3x slower than xxhash64 per call but both run JVM-side
inside codegen; at 100 TB the hash cost is dwarfed by the shuffle these
operators feed, and cross-engine reproducibility is what makes the index
verifiable (north_rule: per-row invariants checked against the source).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MASK31 = (1 << 31) - 1


def md5_long(col: Column) -> Column:
    """First 60 bits of md5(col) as a non-negative bigint (JVM-side)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def md5_long_sql(expr: str) -> str:
    """DuckDB SQL producing the identical value as :func:`md5_long`."""
    return f"cast(('0x' || substring(md5({expr}), 1, 15)) as bigint)"


def md5_double_longs(col: Column) -> tuple[Column, Column]:
    """Two independent non-negative bigints from ONE md5: bits [0,60) and
    [64,120) of the digest (hex chars 1-15 and 16-29).

    The two halves of one digest are independent uniform draws, so
    families that need many hashes per value (MinHash permutations) get
    TWO independent hash functions per md5 — half the digest cost of one
    md5 per (value, h).  Both values stay non-negative in a signed 64-bit
    long on every engine.
    """
    m = F.md5(col)
    h1 = F.conv(F.substring(m, 1, 15), 16, 10).cast("long")
    h2 = F.conv(F.substring(m, 16, 14), 16, 10).cast("long")
    return h1, h2


def md5_double_longs_sql(expr: str) -> tuple[str, str]:
    """DuckDB twins of :func:`md5_double_longs`."""
    return (f"cast(('0x' || substring(md5({expr}), 1, 15)) as bigint)",
            f"cast(('0x' || substring(md5({expr}), 16, 14)) as bigint)")
