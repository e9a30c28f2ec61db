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
