"""Deterministic, scalable dense doc-id assignment.

The reference lets callers pick document ids via ``RequestBuilder``
(`ElasticIndexer4s.scala:39-43`, README.md:114-116) and defaults to ES
auto-ids.  A posting-list engine wants DENSE ids (small delta gaps → varint
compresses to ~1-2 bytes/doc), assigned DETERMINISTICALLY (resume/verify
depend on stable ids), WITHOUT a global sort or
``monotonically_increasing_id`` (non-deterministic under retries).

Two schemes:

* ``dense="shard"`` (default, the 10^12-file path) — ids are dense PER SHARD:
  ``doc_id = shard << SHARD_BITS | row_number``.  ONE hash shuffle, zero
  global coordination (no counts job, no offset broadcast).  Posting lists
  are built per shard, so per-shard density gives the same varint sizes as
  global density; the inter-shard jump costs one ~5-byte leading varint per
  (shard, term) list.
* ``dense="global"`` — ids are dense 0..N-1: per-partition counts are
  collected (P tiny rows) and turned into offsets via a broadcast join.  One
  extra pass over the source; use when downstream systems require contiguous
  global ids.

Both are pure functions of the data: partition = hash(key) % P, order = the
unique key sorted within partition — reproducible across runs and retries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SHARD_BITS = 33  # up to 8.5e9 docs per shard, 2^30 shards


def with_doc_ids(df: DataFrame, key_cols: list[str], num_partitions: int,
                 shard_col: str = "shard", dense: str = "shard") -> DataFrame:
    """Add deterministic ``doc_id`` (long) + ``shard`` (int) columns."""
    part = df.repartition(num_partitions, *key_cols)
    part = part.withColumn("_pid", F.spark_partition_id())
    w = Window.partitionBy("_pid").orderBy(*key_cols)

    if dense == "shard":
        return (
            part.withColumn("_rn", F.row_number().over(w))
            .withColumn(
                "doc_id",
                F.expr(f"shiftleft(cast(_pid as bigint), {SHARD_BITS})")
                + F.col("_rn").cast("long") - F.lit(1).cast("long"))
            .withColumn(shard_col, F.col("_pid").cast("int"))
            .drop("_pid", "_rn")
        )

    counts = part.groupBy("_pid").agg(F.count(F.lit(1)).alias("_cnt"))
    rows = sorted((r["_pid"], r["_cnt"]) for r in counts.collect())
    offsets, acc = [], 0
    for pid, cnt in rows:
        offsets.append((pid, acc))
        acc += cnt
    off_df = part.sparkSession.createDataFrame(offsets, "_pid int, _off long")
    return (
        part.withColumn("_rn", F.row_number().over(w))
        .join(F.broadcast(off_df), "_pid")
        .withColumn("doc_id", (F.col("_off") + F.col("_rn") - F.lit(1)).cast("long"))
        .withColumn(shard_col, F.col("_pid").cast("int"))
        .drop("_pid", "_rn", "_off")
    )
