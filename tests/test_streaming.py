"""Structured-Streaming incremental index build: per-batch segments,
checkpointed resume, multi-segment scatter-gather query, event-time windows."""

import os

import pytest
from pyspark.sql import functions as F

from elastic_indexer4s_spark.config import IndexConfig
from elastic_indexer4s_spark.plans.catalog import GenerationCatalog
from elastic_indexer4s_spark.streaming.incremental import (
    incremental_index, topk_multi, windowed_doc_counts)

SCHEMA = "repo string, path string, commit string, lang string, content string"


def _write_batch(spark, in_dir: str, tag: str, rows):
    (spark.createDataFrame(rows, SCHEMA)
     .coalesce(1).write.mode("append").parquet(in_dir))
    _ = tag


@pytest.fixture()
def stream_dirs(tmp_path):
    return (str(tmp_path / "in"), str(tmp_path / "idx"), str(tmp_path / "ck"))


def _rows(tag: str, n: int, marker: str = ""):
    return [(f"org/{tag}", f"src/{tag}/f{i}.py", f"c{tag}{i}", "python",
             f"def handler_{tag}_{i}(): return {marker or 'value'} + spark_job")
            for i in range(n)]


def test_incremental_segments_and_resume(spark, stream_dirs):
    in_dir, idx_root, ck = stream_dirs
    cfg = IndexConfig(index_prefix="seg", num_shards=2, block_size=16)
    _write_batch(spark, in_dir, "b1", _rows("alpha", 20, "zqfirstmarker"))

    stream = spark.readStream.schema(SCHEMA).parquet(in_dir)
    built1 = incremental_index(spark, stream, idx_root, cfg, ck)
    assert len(built1) == 1

    # new arrivals -> a second drain builds ONLY the delta (checkpoint resume)
    _write_batch(spark, in_dir, "b2", _rows("beta", 30, "zqsecondmarker"))
    stream = spark.readStream.schema(SCHEMA).parquet(in_dir)
    built2 = incremental_index(spark, stream, idx_root, cfg, ck)
    assert len(built2) == 1 and built2[0] not in built1

    cat = GenerationCatalog(idx_root)
    sizes = [cat.size_for(s) for s in built1 + built2]
    assert sizes == [20, 30]

    # marker from batch 1 only hits segment 1; common term hits both
    hits1 = topk_multi(spark, idx_root, ["zqfirstmarker"], k=50).collect()
    assert {r["segment"] for r in hits1} == set(built1)
    assert len(hits1) == 20
    both = topk_multi(spark, idx_root, ["spark"], k=100).collect()
    assert {r["segment"] for r in both} == set(built1 + built2)
    assert len(both) == 50

    # draining again with nothing new builds nothing
    stream = spark.readStream.schema(SCHEMA).parquet(in_dir)
    assert incremental_index(spark, stream, idx_root, cfg, ck) == []


def test_windowed_doc_counts(spark, tmp_path):
    in_dir = str(tmp_path / "ev")
    rows = [("2024-01-01 00:00:10",), ("2024-01-01 00:00:50",),
            ("2024-01-01 00:01:10",), ("2024-01-01 00:03:05",)]
    (spark.createDataFrame(rows, "ts_s string")
     .select(F.col("ts_s").cast("timestamp").alias("ts"))
     .coalesce(1).write.parquet(in_dir))
    stream = (spark.readStream.schema("ts timestamp").parquet(in_dir))
    # complete mode: a single availableNow batch never advances the watermark
    # past its own data, so append would (correctly) seal no windows yet.
    out_q = (windowed_doc_counts(stream, "ts")
             .writeStream.format("memory").queryName("win_counts")
             .outputMode("complete")
             .option("checkpointLocation", str(tmp_path / "ck2"))
             .trigger(availableNow=True).start())
    out_q.awaitTermination()
    got = {(str(r["window_start"]), r["n_docs"])
           for r in spark.sql("SELECT * FROM win_counts").collect()}
    assert ("2024-01-01 00:00:00", 2) in got
    assert ("2024-01-01 00:01:00", 1) in got
    assert ("2024-01-01 00:03:00", 1) in got


def test_compact_segments(spark, stream_dirs):
    from elastic_indexer4s_spark.operators.query import count_index, topk
    from elastic_indexer4s_spark.streaming.incremental import compact_segments

    in_dir, idx_root, ck = stream_dirs
    cfg = IndexConfig(index_prefix="seg", num_shards=2, block_size=16)
    _write_batch(spark, in_dir, "b1", _rows("alpha", 15))
    stream = spark.readStream.schema(SCHEMA).parquet(in_dir)
    incremental_index(spark, stream, idx_root, cfg, ck)
    _write_batch(spark, in_dir, "b2", _rows("beta", 10))
    stream = spark.readStream.schema(SCHEMA).parquet(in_dir)
    incremental_index(spark, stream, idx_root, cfg, ck)
    cat = GenerationCatalog(idx_root)
    segments = cat.indices_by_age_for("live-segments")
    assert len(segments) >= 2

    full_src = spark.read.parquet(in_dir)
    name = compact_segments(spark, idx_root, full_src, cfg)
    assert cat.indices_by_age_for("live-segments") == [name]
    # replaced segments are gone from the catalog
    remaining = {i.index for i in cat.all_indices_with_info()}
    assert not (set(segments) & remaining)
    gen = cat.path(name)
    assert count_index(spark, gen) == 25
    # corpus-exact scores: compacted generation == a from-scratch build
    ref_gen = str(idx_root) + "/_ref"
    from elastic_indexer4s_spark.operators.build import build_index
    build_index(spark, full_src, cfg, ref_gen)
    got = [(r["score"],) for r in topk(spark, gen, ["spark_job"], 5).collect()]
    ref = [(r["score"],) for r in topk(spark, ref_gen, ["spark_job"], 5).collect()]
    assert got == ref


def test_streaming_session_counts_stateful_resume(spark, tmp_path):
    from datetime import datetime, timedelta

    from elastic_indexer4s_spark.streaming.incremental import (
        streaming_session_counts,
    )

    in_dir, ck = str(tmp_path / "ev_in"), str(tmp_path / "ev_ck")
    ev_schema = "user_id long, event_id long, ts timestamp"
    t0 = datetime(2026, 1, 1, 12, 0, 0)

    def drain(tag):
        got = {}

        def sink(batch_df, epoch_id):
            for r in batch_df.collect():
                got[r["user_id"]] = (r["n_sessions"], r["n_events"])

        stream = spark.readStream.schema(ev_schema).parquet(in_dir)
        out = streaming_session_counts(stream, gap_minutes=10)
        q = (out.writeStream.foreachBatch(sink)
             .outputMode("update")
             .option("checkpointLocation", ck)
             .trigger(availableNow=True).start())
        q.awaitTermination()
        return got

    (spark.createDataFrame(
        [(1, 1, t0), (1, 2, t0 + timedelta(minutes=1)), (2, 3, t0)],
        ev_schema).coalesce(1).write.mode("append").parquet(in_dir))
    got1 = drain("a")
    assert got1[1] == (1, 2)   # two events, one session
    assert got1[2] == (1, 1)

    # second drain from the SAME checkpoint: state survives the restart
    (spark.createDataFrame(
        [(1, 4, t0 + timedelta(minutes=31)),   # > gap -> new session
         (2, 5, t0 + timedelta(minutes=5))],   # within gap -> same session
        ev_schema).coalesce(1).write.mode("append").parquet(in_dir))
    got2 = drain("b")
    assert got2[1] == (2, 3)
    assert got2[2] == (1, 2)


def test_streaming_exact_dedup_across_batches_and_restart(spark, tmp_path):
    """First occurrence of each content survives; duplicates are dropped
    across micro-batches AND across a query restart (state store via
    checkpoint) — the property a per-batch dropDuplicates cannot give."""
    from elastic_indexer4s_spark.streaming.incremental import (
        streaming_exact_dedup)

    in_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    schema = "doc_id long, text string"
    seen: list = []

    def sink(bdf, _bid):
        seen.extend((r["doc_id"], r["text"]) for r in bdf.collect())

    def run_once():
        stream = spark.readStream.schema(schema).parquet(in_dir)
        q = (streaming_exact_dedup(stream).writeStream
             .foreachBatch(sink).option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "alpha")], schema
    ).coalesce(1).write.mode("append").parquet(in_dir)
    run_once()
    texts = sorted(t for _, t in seen)
    assert texts == ["alpha", "beta"]          # in-batch duplicate dropped

    # restart with new files: duplicates of already-seen content must be
    # dropped by restored state; only genuinely new content passes
    spark.createDataFrame(
        [(4, "beta"), (5, "gamma"), (6, "alpha")], schema
    ).coalesce(1).write.mode("append").parquet(in_dir)
    run_once()
    texts = sorted(t for _, t in seen)
    assert texts == ["alpha", "beta", "gamma"]
    assert (5, "gamma") in seen
