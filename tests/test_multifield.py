"""Multi-field indexing + boosted multi_match (round 5)."""

import pytest
from pyspark.sql import functions as F

from elastic_indexer4s_spark.config import IndexConfig, TokenizerConfig
from elastic_indexer4s_spark.operators.multifield import (
    FieldSpec, build_multifield_index, field_dir, multi_match_topk)
from elastic_indexer4s_spark.operators.query import topk
from elastic_indexer4s_spark.results import RunResult

ROWS = [
    # (repo, path, commit, lang, body, title)
    ("r0", "a.py", "c0", "py", "alpha beta gamma shared", "unrelated title"),
    ("r1", "b.py", "c1", "py", "no match here at all",   "alpha beta title"),
    ("r2", "c.py", "c2", "py", "shared words only",      "other things"),
    ("r3", "d.py", "c3", "py", "alphaBeta camel body",   "alphaBeta whole"),
]


@pytest.fixture(scope="module")
def mf_index(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("mf") / "idx")
    df = spark.createDataFrame(
        ROWS, "repo string, path string, commit string, lang string, "
              "body string, title string")
    cfg = IndexConfig(num_shards=2, block_size=16)
    res = build_multifield_index(
        spark, df, cfg, base,
        {"body": FieldSpec("body"),
         # title keeps camelCase whole: per-field analyzer config
         "title": FieldSpec("title",
                            TokenizerConfig(split_camel=False,
                                            split_snake=False))})
    assert all(isinstance(r, RunResult) for r in res.values()), res
    return base, df


def _ids(spark, base, df_rows):
    gen = field_dir(base, "body")
    doclen = spark.read.parquet(field_dir(base, "body") + "/doclen")
    return {r["path"]: r["doc_id"] for r in doclen.collect()}


def test_doc_ids_identical_across_fields(spark, mf_index):
    base, _df = mf_index
    a = {(r["repo"], r["path"]): r["doc_id"] for r in spark.read.parquet(
        field_dir(base, "body") + "/doclen").collect()}
    b = {(r["repo"], r["path"]): r["doc_id"] for r in spark.read.parquet(
        field_dir(base, "title") + "/doclen").collect()}
    assert a == b and len(a) == len(ROWS)


def test_boost_ordering_matrix(spark, mf_index):
    base, _df = mf_index
    ids = _ids(spark, base, ROWS)
    a_id, b_id = ids["a.py"], ids["b.py"]   # alpha in body-only vs title-only

    def top_ids(boosts):
        return [r["doc_id"] for r in
                multi_match_topk(spark, base, ["alpha", "beta"],
                                 boosts, k=4).collect()]

    hi_title = top_ids({"body": 1.0, "title": 10.0})
    hi_body = top_ids({"body": 10.0, "title": 1.0})
    assert hi_title[0] == b_id and a_id in hi_title
    assert hi_body[0] == a_id and b_id in hi_body
    # matched set is boost-independent (most_fields OR semantics)
    assert sorted(hi_title) == sorted(hi_body)


def test_combined_score_is_boost_weighted_sum(spark, mf_index):
    base, _df = mf_index
    boosts = {"body": 2.0, "title": 3.0}
    per_field = {}
    for f in boosts:
        rows = topk(spark, field_dir(base, f), ["alpha", "beta"],
                    k=100, wand=False).collect()
        per_field[f] = {r["doc_id"]: round(r["score"], 6) for r in rows}
    got = {r["doc_id"]: r["score"] for r in multi_match_topk(
        spark, base, ["alpha", "beta"], boosts, k=10).collect()}
    for did, score in got.items():
        want = sum(boosts[f] * per_field[f].get(did, 0.0) for f in boosts)
        assert abs(score - want) < 1e-9, (did, score, want)


def test_per_field_analyzer(spark, mf_index):
    """camelCase query: the body field splits it (alpha+beta sub-tokens),
    the title field keeps it whole — each field matches through its OWN
    analyzer, the reference's per-field mapping semantics."""
    base, _df = mf_index
    ids = _ids(spark, base, ROWS)
    # title analyzer: "alphaBeta" stays one token -> only d.py's title has it
    t_hits = [r["doc_id"] for r in topk(
        spark, field_dir(base, "title"), ["alphaBeta"], k=10).collect()]
    assert t_hits == [ids["d.py"]]
    # body analyzer splits: alpha+beta match a.py (plain) and d.py (camel)
    b_hits = {r["doc_id"] for r in topk(
        spark, field_dir(base, "body"), ["alphaBeta"], k=10).collect()}
    assert b_hits == {ids["a.py"], ids["d.py"]}
    # combined multi_match sees both routes
    mm = {r["doc_id"] for r in multi_match_topk(
        spark, base, ["alphaBeta"], {"body": 1.0, "title": 1.0},
        k=10).collect()}
    assert mm == {ids["a.py"], ids["d.py"]}


def test_multifield_validation(spark, mf_index):
    base, df = mf_index
    with pytest.raises(ValueError, match="missing"):
        build_multifield_index(spark, df, IndexConfig(num_shards=2),
                               base + "_x", {"nope": FieldSpec("nosuchcol")})
    with pytest.raises(FileNotFoundError):
        multi_match_topk(spark, base, ["alpha"], {"ghost": 1.0}, k=5)
    with pytest.raises(ValueError, match="at least one"):
        multi_match_topk(spark, base, ["alpha"], {}, k=5)
