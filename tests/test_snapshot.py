"""Snapshot pinning (north rule: resumable from Iceberg-snapshot
checkpoints): a pinned build must resume against the table version it
originally saw even after the table mutates, and a resume against a
different snapshot must fail loudly instead of mixing table versions."""

import json
import os

import pytest
from pyspark.sql import functions as F

from elastic_indexer4s_spark.config import IndexConfig
from elastic_indexer4s_spark.operators.build import (
    build_index, resume_build_from_snapshot)
from elastic_indexer4s_spark.results import RunResult
from elastic_indexer4s_spark.sources.snapshot import (
    SnapshotDriftError, capture_file_snapshot, open_snapshot,
    pinned_snapshot, verify_file_snapshot)


def _write_corpus(spark, path, n, start=0, mode="overwrite"):
    rows = [(f"repo{i % 3}", f"doc/{i:012d}.txt", f"c{i}", "py",
             f"def func{i}(): return sparkJoin windowBatch {i}")
            for i in range(start, start + n)]
    (spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, "
              "content string")
     .repartition(2).write.mode(mode).parquet(path))


def test_snapshot_capture_is_deterministic_and_append_sensitive(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    _write_corpus(spark, tbl, 50)
    s1 = capture_file_snapshot(tbl)
    s2 = capture_file_snapshot(tbl)
    assert s1.snapshot_id == s2.snapshot_id and s1.files == s2.files
    _write_corpus(spark, tbl, 10, start=50, mode="append")
    s3 = capture_file_snapshot(tbl)
    assert s3.snapshot_id != s1.snapshot_id
    assert len(s3.files) > len(s1.files)


def test_pinned_resume_ignores_appended_files(spark, tmp_path):
    """Pin -> build -> table gains files -> resume: the resume must see the
    ORIGINAL 40 docs (all shards fingerprint-match -> nothing to build),
    not the appended ones."""
    tbl = str(tmp_path / "tbl")
    gen = str(tmp_path / "gen")
    _write_corpus(spark, tbl, 40)
    snap = capture_file_snapshot(tbl)
    cfg = IndexConfig(num_shards=4, block_size=16)
    res = build_index(spark, open_snapshot(spark, snap), cfg, gen,
                      snapshot=snap)
    assert isinstance(res, RunResult), str(res)
    # snapshot embedded in the generation + stamped into lineage
    assert pinned_snapshot(gen).snapshot_id == snap.snapshot_id
    lin = spark.read.parquet(os.path.join(gen, "lineage"))
    sids = {r["snapshot_id"] for r in lin.select("snapshot_id").collect()}
    assert sids == {snap.snapshot_id}

    _write_corpus(spark, tbl, 25, start=40, mode="append")    # table commits

    res2 = resume_build_from_snapshot(spark, cfg, gen)
    assert isinstance(res2, RunResult), str(res2)
    assert any("nothing to build" in s.msg
               for s in res2.succeeded_stages)
    with open(os.path.join(gen, "stats.json")) as f:
        assert json.load(f)["num_docs"] == 40       # appended docs invisible


def test_resume_against_new_snapshot_detects_drift(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    gen = str(tmp_path / "gen")
    _write_corpus(spark, tbl, 30)
    snap1 = capture_file_snapshot(tbl)
    cfg = IndexConfig(num_shards=2, block_size=16)
    res = build_index(spark, open_snapshot(spark, snap1), cfg, gen,
                      snapshot=snap1)
    assert isinstance(res, RunResult), str(res)
    _write_corpus(spark, tbl, 10, start=30, mode="append")
    snap2 = capture_file_snapshot(tbl)
    with pytest.raises(SnapshotDriftError, match="pinned to snapshot"):
        build_index(spark, open_snapshot(spark, snap2), cfg, gen,
                    resume=True, snapshot=snap2)


def test_vanished_pinned_file_is_drift(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    _write_corpus(spark, tbl, 20)
    snap = capture_file_snapshot(tbl)
    victim = snap.files[0][0]
    os.remove(victim)
    with pytest.raises(SnapshotDriftError, match="missing"):
        verify_file_snapshot(snap)
    with pytest.raises(SnapshotDriftError):
        open_snapshot(spark, snap)


def test_same_size_rewrite_is_drift(spark, tmp_path):
    """An in-place rewrite that PRESERVES byte length (a compaction
    rewriting row groups, a same-length content fix-up) must be detected —
    size-only verification passes it silently, which was round 3's hole."""
    tbl = str(tmp_path / "tbl")
    _write_corpus(spark, tbl, 20)
    snap = capture_file_snapshot(tbl)
    victim = snap.files[0][0]
    with open(victim, "rb") as f:
        data = f.read()
    # same length, different bytes, and a bumped mtime (the rewrite itself
    # bumps it; utime makes the test immune to fs timestamp granularity)
    with open(victim, "wb") as f:
        f.write(data[:-1] + bytes([data[-1] ^ 0xFF]))
    os.utime(victim, ns=(snap.files[0][2] + 10**9,) * 2)
    assert os.path.getsize(victim) == snap.files[0][1]
    with pytest.raises(SnapshotDriftError, match="rewritten in place"):
        verify_file_snapshot(snap)


def test_legacy_size_only_snapshot_still_verifies(spark, tmp_path):
    """Round-3 snapshot.json pinned (path, size) pairs only: they must stay
    loadable, and verification falls back to the size-only check."""
    from elastic_indexer4s_spark.sources.snapshot import TableSnapshot

    tbl = str(tmp_path / "tbl")
    _write_corpus(spark, tbl, 10)
    snap = capture_file_snapshot(tbl)
    legacy = TableSnapshot.from_json({
        "table": snap.table, "snapshot_id": snap.snapshot_id,
        "kind": "files",
        "files": [[p, sz] for p, sz, _tok in snap.files]})
    assert all(f[2] is None for f in legacy.files)
    verify_file_snapshot(legacy)                    # size-only: passes
    df = open_snapshot(spark, legacy)
    assert df.count() == 10


def test_unpinned_generation_refuses_snapshot_resume(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    gen = str(tmp_path / "gen")
    _write_corpus(spark, tbl, 20)
    cfg = IndexConfig(num_shards=2, block_size=16)
    res = build_index(spark, spark.read.parquet(tbl), cfg, gen)
    assert isinstance(res, RunResult), str(res)
    with pytest.raises(FileNotFoundError, match="snapshot.json"):
        resume_build_from_snapshot(spark, cfg, gen)


def test_iceberg_capture_error_contract(spark):
    """No Iceberg runtime in this container: the capture must fail with a
    clear, actionable error (not an opaque Py4J trace)."""
    with pytest.raises(SnapshotDriftError, match="Iceberg"):
        from elastic_indexer4s_spark.sources.snapshot import (
            capture_iceberg_snapshot)
        capture_iceberg_snapshot(spark, "nosuch.catalog_tbl")


def test_nested_struct_metadata_passthrough(spark, tmp_path):
    """Reference test objects are NESTED (TestObjects.scala:17-19,36-43 —
    User(name, age, address: Address) with object mapping): a StructType
    metadata column must ride through build -> doclen untouched, survive a
    snapshot-pinned resume, and not disturb content verification."""
    tbl = str(tmp_path / "tbl")
    gen = str(tmp_path / "gen")
    rows = [(f"r{i % 2}", f"doc/{i:012d}.txt", f"c{i}", "py",
             f"class User{i}: sparkJoin = {i}",
             (f"user{i}", 20 + i, (f"street {i}", f"zip{i:05d}")))
            for i in range(30)]
    schema = ("repo string, path string, commit string, lang string, "
              "content string, "
              "user struct<name:string, age:int, "
              "address:struct<street:string, zip:string>>")
    spark.createDataFrame(rows, schema).repartition(2) \
        .write.mode("overwrite").parquet(tbl)
    snap = capture_file_snapshot(tbl)
    cfg = IndexConfig(num_shards=2, block_size=16)
    res = build_index(spark, open_snapshot(spark, snap), cfg, gen,
                      snapshot=snap, verify_sha=True)
    assert isinstance(res, RunResult), str(res)

    doclen = spark.read.parquet(os.path.join(gen, "doclen"))
    assert "user" in doclen.columns
    got = {r["path"]: (r["user"]["name"], r["user"]["age"],
                       r["user"]["address"]["street"],
                       r["user"]["address"]["zip"])
           for r in doclen.select("path", "user").collect()}
    exp = {p: (u[0], u[1], u[2][0], u[2][1])
           for _, p, _, _, _, u in rows}
    assert got == exp

    # fingerprints must still line up on a pinned resume
    res2 = resume_build_from_snapshot(spark, cfg, gen, verify_sha=True)
    assert isinstance(res2, RunResult), str(res2)
    assert any("nothing to build" in s.msg for s in res2.succeeded_stages)
