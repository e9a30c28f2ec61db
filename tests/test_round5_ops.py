"""Round-5 fixes: exact_dedup de-skew, bounded observer collect,
single-table LSH param stamp, escaped stopword regex."""

import pytest
from pyspark.sql import functions as F

from elastic_indexer4s_spark.operators import dedup, similarity, textstats


# ---------------------------------------------------------------------------
# exact_dedup — groupBy+join shape, degenerate-corpus behavior
# ---------------------------------------------------------------------------

def _dedup_map(df):
    return {r["doc_id"]: (r["canonical_id"], r["group_size"])
            for r in df.collect()}


def test_exact_dedup_degenerate_corpus(spark):
    # >= 50% identical docs: the exact input shape the old
    # Window.partitionBy("_h") plan degenerated on (VERDICT r4 wrong #3)
    n = 400
    rows = [(i, "the same boilerplate page" if i % 2 == 0
             else f"unique text {i}") for i in range(n)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = _dedup_map(dedup.exact_dedup(df))
    assert len(got) == n
    for i in range(n):
        if i % 2 == 0:
            assert got[i] == (0, n // 2)
        else:
            assert got[i] == (i, 1)


def test_exact_dedup_no_window_in_plan(spark):
    # the de-skewed plan must be agg+join (map-side combinable,
    # AQE-splittable), not a window over the hash partition
    df = spark.createDataFrame([(1, "a"), (2, "a"), (3, "b")],
                               "doc_id long, text string")
    plan = dedup.exact_dedup(df)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "HashAggregate" in plan or "SortAggregate" in plan


def test_exact_dedup_all_unique(spark):
    df = spark.createDataFrame([(i, f"t{i}") for i in range(50)],
                               "doc_id long, text string")
    got = _dedup_map(dedup.exact_dedup(df))
    assert all(got[i] == (i, 1) for i in range(50))


# ---------------------------------------------------------------------------
# ngram observer — bounded driver collect with distributed fallback
# ---------------------------------------------------------------------------

def _boiler_docs(spark, n=30):
    trailer = "shared trailer tokens appear verbatim in every document body"
    rows = [(i, f"doc {i} body marker{i} alpha beta {trailer}")
            for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_ngram_observer_local_path(spark):
    seen = {}
    out = dedup.ngram_jaccard_pairs(
        _boiler_docs(spark), threshold=0.8, max_shingle_df=10,
        observer=seen.update)
    n_local = out.count()
    assert seen["pruned_shingles"] > 0


def test_ngram_observer_distributed_fallback(spark, monkeypatch):
    # cap=0 forces every hot shingle over the collect bound: the observer
    # must still report the true count and the anti-join must stay
    # distributed, with IDENTICAL results to the local-relation path
    seen_local = {}
    base = dedup.ngram_jaccard_pairs(
        _boiler_docs(spark), threshold=0.8, max_shingle_df=10,
        observer=seen_local.update).collect()
    monkeypatch.setattr(dedup, "_HOT_COLLECT_CAP", 0)
    seen = {}
    out = dedup.ngram_jaccard_pairs(
        _boiler_docs(spark), threshold=0.8, max_shingle_df=10,
        observer=seen.update).collect()
    assert seen["pruned_shingles"] == seen_local["pruned_shingles"] > 0
    assert sorted(map(tuple, out)) == sorted(map(tuple, base))


# ---------------------------------------------------------------------------
# single-table LSH param stamp (ADVICE r4 #1)
# ---------------------------------------------------------------------------

def _emb_df(spark, n=20, dim=8):
    import numpy as np
    rng = np.random.RandomState(7)
    rows = [(i, [float(x) for x in rng.randn(dim)]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_lsh_single_table_param_stamp(spark, tmp_path):
    emb = _emb_df(spark)
    vb = similarity.lsh_buckets(emb, n_planes=3, dim=8)
    md = vb.schema["bucket"].metadata
    assert md["n_planes"] == 3 and md["n_tables"] == 1

    # survive a parquet round-trip on the DATA columns (the materialized
    # single-table layout) and trip the lsh_topk guard on mismatch
    path = str(tmp_path / "lsh_single")
    vb.write.parquet(path)
    stored = spark.read.parquet(path)
    assert dict(stored.schema["embedding"].metadata)["n_planes"] == 3
    q = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding")
    with pytest.raises(ValueError, match="n_planes"):
        similarity.lsh_topk(stored, q, k=5, n_planes=4, dim=8)
    # matching params query fine
    out = similarity.lsh_topk(stored, q, k=5, n_planes=3, dim=8)
    assert out.count() > 0


# ---------------------------------------------------------------------------
# conditional-put lock backend (VERDICT r4 #6)
# ---------------------------------------------------------------------------

def test_create_exclusive_cas_backend():
    from elastic_indexer4s_spark import fs as FS

    store: dict[str, bytes] = {}

    def cas(path, data):
        # the store's own precondition machinery: create iff absent
        if path in store:
            return False
        store[path] = data
        return True

    FS.register_exclusive_backend("cas", cas)
    try:
        assert FS.create_exclusive("cas://bkt/lock", b"tok1") is True
        assert FS.create_exclusive("cas://bkt/lock", b"tok2") is False
        assert store["cas://bkt/lock"] == b"tok1"
        # other paths on the scheme are independent objects
        assert FS.create_exclusive("cas://bkt/other", b"x") is True
    finally:
        FS.register_exclusive_backend("cas", None)
    # unregistered again: the scheme would now need a real filesystem
    assert "cas" not in FS._EXCLUSIVE_BACKENDS


def test_catalog_lock_uses_cas_backend(tmp_path):
    """The alias-manifest lock must route through a registered
    conditional-put backend end-to-end: a ``file://`` root with an
    injected backend standing in for the store's precondition API — every
    lock acquisition must go through it, never the fallback path."""
    import os

    from elastic_indexer4s_spark import fs as FS
    from elastic_indexer4s_spark.plans.catalog import GenerationCatalog

    calls: list[str] = []

    def cas(path, data):
        calls.append(path)
        local = path[len("file://"):]
        try:  # the injected "store primitive" (atomic create-iff-absent)
            fd = os.open(local, os.O_CREAT | os.O_EXCL | os.O_WRONLY, 0o644)
        except FileExistsError:
            return False
        with os.fdopen(fd, "wb") as f:
            f.write(data)
        return True

    root = f"file://{tmp_path}/r5root"
    FS.register_exclusive_backend("file", cas)
    try:
        cat = GenerationCatalog(root)
        cat.add_alias("live", "gen_a")
        cat.add_alias("live", "gen_b")
        cat.remove_alias("live", "gen_a")
        assert cat._read_aliases() == {"live": ["gen_b"]}
        # every manifest mutation took the lock through the CAS primitive
        assert len(calls) >= 3
        assert all(p.endswith("_aliases.json.lock") for p in calls)
        # the lock was released each time (no leftover lock object)
        assert not os.path.exists(f"{tmp_path}/r5root/_aliases.json.lock")
        # a held lock makes the next CAS acquisition return False (the
        # contended branch) and the waiter times out instead of clobbering
        import time as _t
        assert FS.create_exclusive(f"{root}/_aliases.json.lock",
                                   f"{_t.time()}:held".encode())
        cat2 = GenerationCatalog(root, lock_timeout_s=0.2, lock_stale_s=60)
        with pytest.raises(TimeoutError):
            cat2.add_alias("live", "gen_c")
        assert calls[-1].endswith("_aliases.json.lock")
    finally:
        FS.register_exclusive_backend("file", None)


# ---------------------------------------------------------------------------
# resume config-drift guard / multifield publish marker (round-5 review)
# ---------------------------------------------------------------------------

def test_resume_config_drift_rejected(spark, tiny_corpus, tmp_path):
    import dataclasses

    from elastic_indexer4s_spark.config import IndexConfig
    from elastic_indexer4s_spark.operators.build import build_index
    from elastic_indexer4s_spark.results import RunResult

    rows = [(d.repo, d.path, d.commit, d.lang, d.content)
            for d in tiny_corpus[:40]]
    df = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, "
              "content string")
    gen = str(tmp_path / "gen")
    cfg = IndexConfig(num_shards=2, block_size=16)
    assert isinstance(build_index(spark, df, cfg, gen), RunResult)
    # same config resumes fine (no-op)
    res = build_index(spark, df, cfg, gen, resume=True)
    assert isinstance(res, RunResult)
    # flipping store_positions (or any config field) on resume would mix
    # incompatible shards — must fail loudly
    cfg2 = dataclasses.replace(cfg, store_positions=True)
    with pytest.raises(ValueError, match="config mismatch"):
        build_index(spark, df, cfg2, gen, resume=True)


def test_multifield_partial_failure_no_manifest(spark, tmp_path):
    import os

    from elastic_indexer4s_spark.config import IndexConfig
    from elastic_indexer4s_spark.operators.multifield import (
        FieldSpec, build_multifield_index)
    from elastic_indexer4s_spark.results import RunResult

    df = spark.createDataFrame(
        [("r", "p", "c", "l", "some body", "a title")],
        "repo string, path string, commit string, lang string, "
        "body string, title string")

    def boom(_text):
        raise RuntimeError("analyzer down")

    base = str(tmp_path / "mf")
    res = build_multifield_index(
        spark, df, IndexConfig(num_shards=1), base,
        {"body": FieldSpec("body"), "title": FieldSpec("title")},
        analyzer=boom)
    assert not any(isinstance(r, RunResult) for r in res.values())
    # the publish marker must NOT exist after a failed field build
    assert not os.path.exists(os.path.join(base, "fields.json"))


# ---------------------------------------------------------------------------
# stopword regex escaping (ADVICE r4 #3)
# ---------------------------------------------------------------------------

def test_quality_stopword_charset_assert(spark, monkeypatch):
    df = spark.createDataFrame([(1, "the cat and a dog sat here ok")],
                               "doc_id long, text string")
    # baseline still works and counts stopwords
    row = textstats.quality_metrics(df).collect()[0]
    assert row["stop_ratio"] > 0
    # a metachar-bearing stopword must fail loudly, not silently change
    # matching semantics
    monkeypatch.setattr(textstats, "EN_STOPWORDS",
                        textstats.EN_STOPWORDS + ["e.g"])
    with pytest.raises(AssertionError):
        textstats.quality_metrics(df)
