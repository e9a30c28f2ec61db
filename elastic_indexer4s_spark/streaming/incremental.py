"""Structured-Streaming incremental index build + streaming observability.

The reference is a one-shot batch pipeline (nightly full rebuild,
`README.md:16-18`) whose only streaming trait is back-pressure + a
processing-time throughput meter (`FullStream.scala:15-23`).  This module is
the engine's forward-looking path: documents arriving continuously become
index SEGMENTS — one immutable generation per micro-batch — published under a
shared alias; queries fan out over segments and merge top-k, exactly how
Lucene serves while indexing.

Scale notes: foreachBatch reuses the whole batch build (tokenize -> postings
-> dictionary -> lineage), so each segment inherits the batch path's
partitioning/skew handling; the checkpoint directory gives exactly-once file
tracking across restarts (the streaming analog of SURVEY §2 B9 resume).
Segment-local BM25 stats (df, avg_dl) make scores per-segment — the standard
Lucene-segment approximation; a periodic compaction into one generation
restores corpus-exact scores.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import IndexConfig
from ..operators.build import build_index
from ..operators.query import topk
from ..plans.catalog import GenerationCatalog
from ..results import RunResult

SEGMENT_ALIAS = "live-segments"


def incremental_index(spark: SparkSession, stream_df: DataFrame,
                      index_root: str, cfg: IndexConfig,
                      checkpoint_dir: str,
                      alias: str = SEGMENT_ALIAS) -> list[str]:
    """Drain `stream_df` (a streaming DataFrame of corpus rows) into per-batch
    segment generations; returns the segment names built in THIS drain.

    Runs with trigger(availableNow): processes everything unprocessed and
    stops — rerunning after new files arrive builds only the delta (the
    checkpoint proves resumability).
    """
    cat = GenerationCatalog(index_root)
    built: list[str] = []

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if len(batch_df.take(1)) == 0:
            return
        name = f"{cfg.index_prefix}_seg{epoch_id:06d}"
        gen_dir = cat.path(name)
        res = build_index(spark, batch_df, cfg, gen_dir)
        if not isinstance(res, RunResult):
            raise RuntimeError(f"segment build failed: {res}")
        cat.register(name)
        cat.add_alias(alias, name)
        built.append(name)

    q = (stream_df.writeStream
         .foreachBatch(process_batch)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return built


def topk_multi(spark: SparkSession, index_root: str,
               query_terms: list[str], k: int = 10, *,
               alias: str = SEGMENT_ALIAS, wand: bool = True) -> DataFrame:
    """Scatter-gather top-k across every segment under `alias`: per-segment
    top-k (doc ids are segment-local) merged by score -> (segment, doc_id,
    score).  The per-segment plans are lazily UNIONED into one DataFrame, and
    the readers carry explicit schemas (operators/query._readers_for), so an
    N-segment query is exactly ONE Spark action — no per-segment jobs."""
    cat = GenerationCatalog(index_root)
    segments = cat.indices_by_age_for(alias)
    parts = []
    for name in segments:
        parts.append(
            topk(spark, cat.path(name), query_terms, k, wand=wand)
            .withColumn("segment", F.lit(name)))
    if not parts:
        return spark.createDataFrame(
            [], "doc_id long, score double, segment string")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy(F.col("score").desc(), F.col("segment"),
                       F.col("doc_id")).limit(k)


def windowed_doc_counts(stream_df: DataFrame, ts_col: str,
                        window: str = "1 minute",
                        watermark: str = "2 minutes") -> DataFrame:
    """Event-time tumbling-window ingest counts with late-data handling — the
    event-time upgrade of the reference's processing-time throughput meter
    (`FullStream.scala:15-23` groupedWithin count)."""
    return (stream_df
            .withWatermark(ts_col, watermark)
            .groupBy(F.window(F.col(ts_col), window).alias("win"))
            .agg(F.count(F.lit(1)).alias("n_docs"))
            .select(F.col("win.start").alias("window_start"),
                    F.col("win.end").alias("window_end"), "n_docs"))
