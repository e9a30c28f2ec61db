"""Round-3 fixes: atomic alias replacement, skew-guard observability,
best-effort skip ledger flag."""

from pyspark.sql import functions as F

from elastic_indexer4s_spark.operators import dedup
from elastic_indexer4s_spark.plans.catalog import GenerationCatalog


def test_set_alias_replaces_membership_atomically(tmp_path):
    cat = GenerationCatalog(str(tmp_path / "root"))
    for g in ("g1", "g2", "g3"):
        cat.register(g, creation_time=1)
    cat.add_alias("live", "g1")
    cat.add_alias("live", "g2")
    cat.add_alias("other", "g1")
    cat.set_alias("live", ["g3"])
    assert cat.indices_by_age_for("live") == ["g3"]
    assert cat.indices_by_age_for("other") == ["g1"]   # untouched
    cat.set_alias("live", [])
    assert cat.indices_by_age_for("live") == []


def test_compaction_alias_flip_is_single_publish(tmp_path, monkeypatch):
    """compact_segments must publish the final membership via ONE set_alias
    call — never an add followed by per-segment removes (a concurrent
    reader between those writes would see old+new segments and double-count
    every doc)."""
    calls = []
    orig_set = GenerationCatalog.set_alias

    def rec_set(self, alias, indices):
        calls.append(("set", alias, list(indices)))
        return orig_set(self, alias, indices)

    def rec_add(self, alias, index):
        calls.append(("add", alias, index))
        raise AssertionError("add_alias must not be used by compaction")

    monkeypatch.setattr(GenerationCatalog, "set_alias", rec_set)
    monkeypatch.setattr(GenerationCatalog, "add_alias", rec_add)
    # drive only the publication tail: fake a successful build
    import elastic_indexer4s_spark.streaming.incremental as inc

    cat = GenerationCatalog(str(tmp_path / "root"))
    for seg in ("seg_1", "seg_2"):
        cat.register(seg, creation_time=1)
    orig_set(cat, "stream_live", ["seg_1", "seg_2"])

    from elastic_indexer4s_spark.results import RunResult

    monkeypatch.setattr(inc, "build_index",
                        lambda *a, **k: RunResult(succeeded_stages=[]))
    monkeypatch.setattr(inc.IndexConfig, "generation_name",
                        lambda self: "gen_new", raising=False)
    from elastic_indexer4s_spark.config import IndexConfig
    name = inc.compact_segments(None, str(tmp_path / "root"), None,
                                IndexConfig(num_shards=2),
                                alias="stream_live", delete_old=False)
    assert [c for c in calls if c[0] == "set"] == \
        [("set", "stream_live", [name])]
    assert cat.indices_by_age_for("stream_live") == [name]


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_ngram_observer_reports_pruned_shingles(spark):
    shared = "alpha beta gamma"
    rows = [(i, f"{shared} unique{i} tail{i} end{i}") for i in range(5)]
    events = []
    out = dedup.ngram_jaccard_pairs(
        _docs(spark, rows), threshold=0.0, max_shingle_df=2,
        observer=events.append)
    out.collect()
    assert events == [{"op": "ngram_jaccard", "pruned_shingles": 1,
                       "max_shingle_df": 2}]
    # below-cap corpus: guard present but silent
    events2 = []
    dedup.ngram_jaccard_pairs(
        _docs(spark, rows[:2]), threshold=0.0, max_shingle_df=10,
        observer=events2.append).collect()
    assert events2[0]["pruned_shingles"] == 0


def test_minhash_observer_reports_dropped_buckets(spark):
    rows = [(i, "the same exact boilerplate text everywhere") for i in range(4)]
    events = []
    out = dedup.minhash_lsh_pairs(
        _docs(spark, rows), num_hashes=8, bands=2, min_est_sim=0.0,
        max_bucket_size=2, observer=events.append)
    assert out.count() == 0            # all pairs lived in dropped buckets
    assert events[0]["op"] == "minhash_lsh"
    assert events[0]["dropped_buckets"] == 2   # one per band


def test_skipped_docs_flagged_best_effort(tiny_index):
    import json
    import os
    gen, _cfg = tiny_index
    with open(os.path.join(gen, "stats.json")) as f:
        stats = json.load(f)
    assert stats["skipped_docs_exact"] is False


def test_topk_batch_matches_per_query(spark, tiny_index):
    """topk_batch (one Spark action for the whole query set) must return
    exactly what per-query topk returns, for every query, in both scorer
    modes and under AND."""
    from elastic_indexer4s_spark.operators.query import topk, topk_batch

    gen, _cfg = tiny_index
    qmap = {0: ["tokenIndex", "merge"], 1: ["sparkJoin"],
            2: ["window", "batch", "scan"], 3: ["zzabsenttermzz"]}
    for wand in (False, True):
        batch = topk_batch(spark, gen, qmap, k=5, wand=wand).collect()
        got = {}
        for r in batch:
            got.setdefault(r["query_id"], []).append(
                (r["rank"], r["doc_id"], round(r["score"], 9)))
        for qid, terms in qmap.items():
            single = [(i + 1, r["doc_id"], round(r["score"], 9))
                      for i, r in enumerate(
                          topk(spark, gen, terms, k=5, wand=wand).collect())]
            assert sorted(got.get(qid, [])) == single, (wand, qid)
    # conjunctive: same parity, absent-term query stays empty
    b_and = topk_batch(spark, gen, qmap, k=5, wand=True, mode="and").collect()
    got_and = {}
    for r in b_and:
        got_and.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"]))
    for qid, terms in qmap.items():
        single = [(i + 1, r["doc_id"]) for i, r in enumerate(
            topk(spark, gen, terms, k=5, wand=True, mode="and").collect())]
        assert sorted(got_and.get(qid, [])) == single, qid


def test_choose_scorer_cost_model():
    from elastic_indexer4s_spark.operators.query import (
        _shard_exhaustive, _shard_wand, choose_scorer)

    dense = {"a": 8000, "b": 9000}
    selective = {"a": 8000, "rare": 12}
    assert choose_scorer(False, selective, 10000) is _shard_exhaustive
    assert choose_scorer(True, dense, 10000) is _shard_exhaustive
    assert choose_scorer(True, selective, 10000) is _shard_wand
    assert choose_scorer("force", dense, 10000) is _shard_wand
    assert choose_scorer(True, {}, 10000) is _shard_exhaustive


def test_wand_hint_and_force_identical_results(spark, tiny_index):
    """The cost-based fallback must be invisible in results: hint, force,
    and exhaustive return the same rows for dense AND selective queries."""
    from elastic_indexer4s_spark.operators.query import topk

    gen, _cfg = tiny_index
    for terms in (["window", "batch", "scan"],       # dense -> fallback
                  ["zqmarker0", "merge"]):           # selective -> wand
        rows = {}
        for w in (False, True, "force"):
            rows[w] = [(r["doc_id"], round(r["score"], 9))
                       for r in topk(spark, gen, terms, k=8, wand=w).collect()]
        assert rows[False] == rows[True] == rows["force"], terms


def test_batch_query_edges(spark, tiny_index):
    from elastic_indexer4s_spark.operators.query import topk_batch
    from elastic_indexer4s_spark.serving import LocalSearcher

    gen, _cfg = tiny_index
    assert topk_batch(spark, gen, {}, k=5).count() == 0
    assert topk_batch(spark, gen, {7: ["zzabsenttermzz"]}, k=5).count() == 0
    s = LocalSearcher(gen)
    assert s.search_batch({}, k=5) == {}
    assert s.search_batch({7: ["zzabsenttermzz"]}, k=5) == {}
