"""Round-2 hardening tests: FS abstraction, Decider skip semantics,
caller doc identity, lineage crash-safety, resume stale-shard GC,
throughput meter, dedup skew guards.
"""

from __future__ import annotations

import io

import pytest
from pyspark.sql import functions as F

from elastic_indexer4s_spark import fs as FS
from elastic_indexer4s_spark.config import IndexConfig
from elastic_indexer4s_spark.operators.build import (
    build_index,
    verify_content_sha,
)
from elastic_indexer4s_spark.results import IndexError, RunResult


def _corpus_df(spark, n=60, poison=()):
    rows = []
    for i in range(n):
        text = f"def handler_{i}(): return sparkJoin_{i % 7} + batchWindow"
        if i in poison:
            text = f"POISON_{i}"
        rows.append((f"repo{i % 3}", f"src/f{i:04d}.py", f"c{i:04d}",
                     "python", text))
    return spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, "
              "content string")


# ---------------------------------------------------------------------------
# FS layer
# ---------------------------------------------------------------------------

def test_fs_roundtrip(tmp_path):
    root = f"file://{tmp_path}/sub"
    FS.mkdirs(FS.join(root, "a/b"))
    assert FS.exists(FS.join(root, "a/b"))
    FS.write_json(FS.join(root, "a/meta.json"), {"x": 1}, atomic=True)
    assert FS.read_json(FS.join(root, "a/meta.json")) == {"x": 1}
    names = sorted(i.base_name for i in FS.ls(FS.join(root, "a")))
    assert names == ["b", "meta.json"]
    FS.move(FS.join(root, "a"), FS.join(root, "a2"))
    assert not FS.exists(FS.join(root, "a"))
    assert FS.read_json(FS.join(root, "a2/meta.json")) == {"x": 1}
    FS.delete_dir(FS.join(root, "a2"))
    FS.delete_dir(FS.join(root, "a2"))  # idempotent on missing
    assert not FS.exists(FS.join(root, "a2"))


def test_fs_cached_resolve_strips_authority(tmp_path):
    """Cache hits must re-derive the inner path the way from_uri does:
    hdfs://host:8020/a/b -> "/a/b" on EVERY call (the round-2 cache returned
    "host:8020/a/b" on hits), while s3-style schemes keep the bucket in the
    path; distinct authorities must not share a cached client."""
    sentinel_h, sentinel_s = object(), object()
    FS._FS_CACHE["hdfs://host:8020"] = (sentinel_h, "from_uri")
    FS._FS_CACHE["s3://bucketa"] = (sentinel_s, "from_uri")
    try:
        fs, p = FS.resolve("hdfs://host:8020/a/b")
        assert fs is sentinel_h and p == "/a/b"
        fs, p = FS.resolve("hdfs://host:8020/a/b")  # stable across hits
        assert fs is sentinel_h and p == "/a/b"
        fs, p = FS.resolve("s3://bucketa/k/obj")
        assert fs is sentinel_s and p == "bucketa/k/obj"
        # a different authority must NOT reuse the cached client
        assert FS._FS_CACHE.get("hdfs://other:8020") is None
        assert "hdfs://host:8020" != "hdfs://other:8020"
    finally:
        FS._FS_CACHE.pop("hdfs://host:8020", None)
        FS._FS_CACHE.pop("s3://bucketa", None)
    # file:// path derivation is identical on miss and hit
    root = f"file://{tmp_path}/authfs"
    FS.mkdirs(root)
    _, p1 = FS.resolve(FS.join(root, "x"))
    _, p2 = FS.resolve(FS.join(root, "x"))
    assert p1 == p2 == f"{tmp_path}/authfs/x"


def test_build_and_serve_on_file_uri(spark, tmp_path):
    """End-to-end build + LocalSearcher against a file://-prefixed root:
    nothing in the build/query/serving path may assume bare POSIX paths."""
    from elastic_indexer4s_spark.operators.query import topk
    from elastic_indexer4s_spark.serving import LocalSearcher

    gen = f"file://{tmp_path}/uri_gen"
    cfg = IndexConfig(num_shards=2, block_size=16)
    res = build_index(spark, _corpus_df(spark), cfg, gen)
    assert isinstance(res, RunResult), str(res)
    via_spark = [(r["doc_id"], round(r["score"], 6)) for r in
                 topk(spark, gen, ["sparkJoin"], 5).collect()]
    searcher = LocalSearcher(gen)
    via_local = [(d, round(s, 6)) for d, s in
                 searcher.search(["sparkJoin"], 5)]
    assert via_spark == via_local
    assert len(via_spark) == 5
    assert searcher.count() == 60


# ---------------------------------------------------------------------------
# Decider (A16): per-row failure policy with skip accounting
# ---------------------------------------------------------------------------

def _make_fragile_analyzer():
    # defined via closure so cloudpickle ships it BY VALUE (a module-level
    # function in tests/ would be pickled by reference and the executor
    # workers cannot import the tests package)
    def fragile_analyzer(content: str) -> list:
        if content.startswith("POISON"):
            raise ValueError("malformed document")
        return [t.lower() for t in content.replace("(", " ")
                .replace(")", " ").replace(":", " ").replace("_", " ")
                .split() if len(t) >= 2]
    return fragile_analyzer


def test_decider_skip_drops_and_counts(spark, tmp_path):
    gen = str(tmp_path / "gen_skip")
    cfg = IndexConfig(num_shards=2, block_size=16, on_error="skip")
    res = build_index(spark, _corpus_df(spark, poison={3, 17}), cfg, gen,
                      analyzer=_make_fragile_analyzer())
    assert isinstance(res, RunResult), str(res)
    stats = FS.read_json(FS.join(gen, "stats.json"))
    assert stats["num_docs"] == 58
    assert stats["skipped_docs"] == 2
    doclen = spark.read.parquet(FS.join(gen, "doclen"))
    assert doclen.count() == 58
    assert doclen.filter(F.col("path").isin(
        "src/f0003.py", "src/f0017.py")).count() == 0


def test_decider_fail_aborts(spark, tmp_path):
    gen = str(tmp_path / "gen_fail")
    cfg = IndexConfig(num_shards=2, block_size=16, on_error="fail")
    res = build_index(spark, _corpus_df(spark, poison={3}), cfg, gen,
                      analyzer=_make_fragile_analyzer())
    assert isinstance(res, IndexError)
    # railway: stages before the failure are preserved in the log
    assert any("Created index generation" in str(s)
               for s in res.succeeded_stages)


def test_decider_clean_corpus_no_skips(spark, tmp_path):
    gen = str(tmp_path / "gen_clean")
    cfg = IndexConfig(num_shards=2, block_size=16, on_error="skip")
    res = build_index(spark, _corpus_df(spark), cfg, gen,
                      analyzer=_make_fragile_analyzer())
    assert isinstance(res, RunResult)
    stats = FS.read_json(FS.join(gen, "stats.json"))
    assert stats["num_docs"] == 60
    assert stats["skipped_docs"] == 0


# ---------------------------------------------------------------------------
# Caller doc identity (A2)
# ---------------------------------------------------------------------------

def _custom_key_df(spark, n=40, drop=()):
    rows = [(f"bucket{i % 4}", i, f"text tokenRun_{i} commonTerm", "go")
            for i in range(n) if i not in drop]
    return spark.createDataFrame(
        rows, "bucket string, file_id long, content string, lang string")


def test_custom_doc_key_build_query_verify(spark, tmp_path):
    from elastic_indexer4s_spark.operators.query import topk

    gen = str(tmp_path / "gen_key")
    cfg = IndexConfig(num_shards=2, block_size=16,
                      doc_key=("bucket", "file_id"))
    src = _custom_key_df(spark)
    res = build_index(spark, src, cfg, gen)
    assert isinstance(res, RunResult), str(res)
    doclen = spark.read.parquet(FS.join(gen, "doclen"))
    assert set(doclen.columns) >= {"bucket", "file_id", "dl", "sha256",
                                   "doc_id", "shard"}
    assert doclen.count() == 40
    hits = topk(spark, gen, ["commonTerm"], k=40).collect()
    assert len(hits) == 40
    assert verify_content_sha(spark, src, gen,
                              doc_key=["bucket", "file_id"]) == 0


def test_custom_doc_key_resume(spark, tmp_path):
    gen = str(tmp_path / "gen_key_resume")
    cfg = IndexConfig(num_shards=2, block_size=16,
                      doc_key=("bucket", "file_id"))
    res = build_index(spark, _custom_key_df(spark), cfg, gen)
    assert isinstance(res, RunResult)
    # unchanged input: resume is a no-op
    res2 = build_index(spark, _custom_key_df(spark), cfg, gen, resume=True)
    assert isinstance(res2, RunResult)
    assert any("nothing to build" in str(s) for s in res2.succeeded_stages)


# ---------------------------------------------------------------------------
# Lineage crash-safety + resume metadata repair
# ---------------------------------------------------------------------------

def test_resume_repairs_missing_metadata(spark, tmp_path):
    """A generation whose shards committed but whose dictionary/stats are
    missing (crash between lineage commit and stats) must NOT resume as a
    silent no-op success — resume rebuilds the metadata stages."""
    gen = str(tmp_path / "gen_crash")
    cfg = IndexConfig(num_shards=2, block_size=16)
    src = _corpus_df(spark)
    res = build_index(spark, src, cfg, gen)
    assert isinstance(res, RunResult)
    FS.delete_dir(FS.join(gen, "dictionary"))
    FS.delete_file(FS.join(gen, "stats.json"))
    res2 = build_index(spark, src, cfg, gen, resume=True)
    assert isinstance(res2, RunResult), str(res2)
    assert not any("nothing to build" in str(s)
                   for s in res2.succeeded_stages)
    assert FS.exists(FS.join(gen, "dictionary"))
    stats = FS.read_json(FS.join(gen, "stats.json"))
    assert stats["num_docs"] == 60


def test_lineage_not_committed_before_dictionary(spark, tmp_path,
                                                 monkeypatch):
    """If the dictionary stage dies, the (overlapped) lineage write must not
    be visible to resume: rerunning with resume must rebuild, not report
    'nothing to build' on a generation with no dictionary/stats."""
    from pyspark.sql.readwriter import DataFrameReader

    gen = str(tmp_path / "gen_dictfail")
    cfg = IndexConfig(num_shards=2, block_size=16)
    src = _corpus_df(spark)

    orig = DataFrameReader.parquet
    calls = {"n": 0}

    def fail_dictionary_read(self, *paths, **kw):
        if (any(str(p).endswith("/postings") for p in paths)
                and calls["n"] == 0):
            calls["n"] += 1
            raise RuntimeError("simulated dictionary-stage crash")
        return orig(self, *paths, **kw)

    monkeypatch.setattr(DataFrameReader, "parquet", fail_dictionary_read)
    res = build_index(spark, src, cfg, gen)
    monkeypatch.setattr(DataFrameReader, "parquet", orig)
    assert isinstance(res, IndexError)
    assert not FS.exists(FS.join(gen, "lineage")), \
        "lineage committed despite dictionary failure"
    res2 = build_index(spark, src, cfg, gen, resume=True)
    assert isinstance(res2, RunResult), str(res2)
    assert not any("nothing to build" in str(s)
                   for s in res2.succeeded_stages)
    assert FS.exists(FS.join(gen, "dictionary"))
    assert FS.exists(FS.join(gen, "lineage"))
    assert FS.read_json(FS.join(gen, "stats.json"))["num_docs"] == 60


def test_resume_deletes_vanished_shards(spark, tmp_path):
    """Docs removed from the source: their shard partitions must be deleted
    on resume so the served artifact matches stats/lineage."""
    from elastic_indexer4s_spark.operators.query import count_index

    gen = str(tmp_path / "gen_shrink")
    # many shards so that removing one repo's files empties >= 1 shard
    cfg = IndexConfig(num_shards=8, block_size=16)
    res = build_index(spark, _corpus_df(spark, n=24), cfg, gen)
    assert isinstance(res, RunResult)
    # keep only 4 docs -> several shards vanish entirely
    small = _corpus_df(spark, n=4)
    res2 = build_index(spark, small, cfg, gen, resume=True)
    assert isinstance(res2, RunResult), str(res2)
    assert count_index(spark, gen) == 4
    stats = FS.read_json(FS.join(gen, "stats.json"))
    assert stats["num_docs"] == 4
    assert verify_content_sha(spark, small, gen) == 0


# ---------------------------------------------------------------------------
# Throughput meter (A5)
# ---------------------------------------------------------------------------

def test_meter_counts_and_logs(spark, tmp_path):
    from elastic_indexer4s_spark.metrics import ThroughputMeter

    out = io.StringIO()
    meter = ThroughputMeter(spark.sparkContext, interval=0.2, out=out)
    meter.start()
    meter.add(100)
    import time
    time.sleep(0.5)
    meter.add(50)
    total = meter.stop()
    assert total == 150
    lines = out.getvalue().strip().splitlines()
    assert any("documents in the last" in ln for ln in lines)
    assert lines[-1].startswith("[ei4s]")
    assert "150 documents total" in lines[-1]


def test_build_emits_throughput_lines(spark, tmp_path, capfd):
    gen = str(tmp_path / "gen_meter")
    cfg = IndexConfig(num_shards=2, block_size=16)
    res = build_index(spark, _corpus_df(spark), cfg, gen, log_every=0.2)
    assert isinstance(res, RunResult)
    err = capfd.readouterr().err
    assert "indexed 60 documents total" in err


# ---------------------------------------------------------------------------
# Dedup skew guards
# ---------------------------------------------------------------------------

def _stopword_corpus(spark, n=200):
    """Every doc shares one stopword-grade shingle; only consecutive pairs
    are near-duplicates."""
    rows = []
    for i in range(n):
        uniq = f"unique{i} token{i} word{i} phrase{i} item{i}"
        rows.append((i, f"the quick brown fox {uniq}"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_ngram_skew_guard_bounds_candidates(spark):
    from elastic_indexer4s_spark.operators.dedup import ngram_jaccard_pairs

    df = _stopword_corpus(spark)
    # guard at df>10: 'the quick brown'/'quick brown fox' (df=200) pruned;
    # remaining shingles unique per doc -> zero join rows survive
    guarded = ngram_jaccard_pairs(df, threshold=0.1, max_shingle_df=10)
    assert guarded.count() == 0
    # unguarded: the hot shingles join every doc with every other
    unguarded = ngram_jaccard_pairs(df, threshold=0.1, max_shingle_df=None)
    assert unguarded.count() == 200 * 199 // 2


def test_minhash_hot_bucket_cap(spark):
    from elastic_indexer4s_spark.operators.dedup import minhash_lsh_pairs

    # 100 identical docs -> one degenerate bucket per band
    rows = [(i, "same text everywhere alpha beta gamma delta")
            for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    capped = minhash_lsh_pairs(df, max_bucket_size=10)
    assert capped.count() == 0  # every band bucket exceeds the cap
    uncapped = minhash_lsh_pairs(df, max_bucket_size=None)
    assert uncapped.count() == 100 * 99 // 2


def test_minhash_signature_array_matches_exploded(spark):
    """The collapsed one-aggregation signature must equal the (id, h, min)
    view element-for-element."""
    from elastic_indexer4s_spark.operators.dedup import (
        minhash_signature_array,
        minhash_signatures,
    )

    df = _stopword_corpus(spark, n=30)
    arr = {r["doc_id"]: r["sigs"] for r in
           minhash_signature_array(df, num_hashes=8).collect()}
    for r in minhash_signatures(df, num_hashes=8).collect():
        assert arr[r["doc_id"]][r["h"]] == r["minhash"]


# ---------------------------------------------------------------------------
# Raw mapping validation (reference StringMappingSetting.unsafeString,
# MappingSettingSpec.scala:7-14)
# ---------------------------------------------------------------------------

def test_mapping_from_json_roundtrip():
    from elastic_indexer4s_spark.config import IndexConfig, mapping_from_json

    cfg = IndexConfig(num_shards=4, doc_key=("a", "b"))
    assert mapping_from_json(cfg.to_json()) == cfg


def test_mapping_from_json_rejects():
    from elastic_indexer4s_spark.config import (
        MappingSettingError,
        mapping_from_json,
    )

    for bad in ('{"num_shards": 4',           # malformed JSON
                '[1, 2]',                     # not an object
                '{"no_such_key": 1}',         # unknown key
                '{"tokenizer": {"bogus": 1}}',  # unknown nested key
                '{"tokenizer": 3}',           # tokenizer not an object
                '{"on_error": "explode"}',    # bad enum
                '{"num_shards": 0}'):         # bad range
        with pytest.raises(MappingSettingError):
            mapping_from_json(bad)


# ---------------------------------------------------------------------------
# Edge cases: empty corpus, token-free docs, unicode
# ---------------------------------------------------------------------------

def test_build_empty_corpus(spark, tmp_path):
    from elastic_indexer4s_spark.operators.query import count_index, topk
    from elastic_indexer4s_spark.serving import LocalSearcher

    gen = str(tmp_path / "gen_empty")
    cfg = IndexConfig(num_shards=2, block_size=16)
    empty = spark.createDataFrame(
        [], "repo string, path string, commit string, lang string, "
            "content string")
    res = build_index(spark, empty, cfg, gen)
    assert isinstance(res, RunResult), str(res)
    stats = FS.read_json(FS.join(gen, "stats.json"))
    assert stats["num_docs"] == 0 and stats["avg_dl"] == 0.0
    assert count_index(spark, gen) == 0
    assert topk(spark, gen, ["anything"], 5).collect() == []
    assert LocalSearcher(gen).search(["anything"], 5) == []


def test_build_tokenless_and_unicode_docs(spark, tmp_path):
    from elastic_indexer4s_spark.operators.query import topk
    from elastic_indexer4s_spark.serving import LocalSearcher

    gen = str(tmp_path / "gen_edge")
    cfg = IndexConfig(num_shards=2, block_size=16)
    rows = [
        ("r", "a.py", "c1", "py", "!!! *** !!!"),          # no tokens at all
        ("r", "b.py", "c2", "py", ""),                     # empty content
        ("r", "c.py", "c3", "py", "café 世界 snake_case"),
        ("r", "d.py", "c4", "py", "x y z"),                # all below min_len
        ("r", "e.py", "c5", "py", "normalToken snake_case"),
    ]
    df = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, "
              "content string")
    res = build_index(spark, df, cfg, gen, verify_sha=True)
    assert isinstance(res, RunResult), str(res)
    # all 5 docs are indexed (token-free docs still live in doclen, dl=0)
    doclen = spark.read.parquet(FS.join(gen, "doclen"))
    assert doclen.count() == 5
    dls = {r["path"]: r["dl"] for r in doclen.collect()}
    assert dls["a.py"] == 0 and dls["b.py"] == 0 and dls["d.py"] == 0
    # the analyzer strips non-ASCII (identifier charset), keeps snake parts
    hits = topk(spark, gen, ["snake_case"], 5).collect()
    assert {r["doc_id"] for r in hits} == \
        {r["doc_id"] for r in doclen.filter(
            F.col("path").isin("c.py", "e.py")).select("doc_id").collect()}
    via_local = LocalSearcher(gen).search(["snake_case"], 5)
    assert [(r["doc_id"], round(r["score"], 6)) for r in hits] == \
        [(d, round(s, 6)) for d, s in via_local]


def test_resume_noop_on_empty_then_metadata_ok(spark, tmp_path):
    gen = str(tmp_path / "gen_empty_resume")
    cfg = IndexConfig(num_shards=2, block_size=16)
    empty = spark.createDataFrame(
        [], "repo string, path string, commit string, lang string, "
            "content string")
    assert isinstance(build_index(spark, empty, cfg, gen), RunResult)
    res2 = build_index(spark, empty, cfg, gen, resume=True)
    assert isinstance(res2, RunResult), str(res2)
