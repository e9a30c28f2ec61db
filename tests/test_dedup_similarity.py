"""Tests for dedup + similarity operators (SURVEY §2 extension: the
training-data-pipeline ops graded alongside the core engine)."""

import math

import pytest
from pyspark.sql import functions as F

from elastic_indexer4s_spark.operators import dedup, similarity


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),       # exact dup of 0
        (2, "the quick brown fox jumps over the lazy cat"),       # near dup
        (3, "completely different content about spark engines"),
        (4, "spark engines process distributed data pipelines"),
        (5, ""),                                                   # empty
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def vecs(spark):
    rows = [
        (0, [1.0, 0.0, 0.0], 0),
        (1, [1.0, 0.0, 0.0], 0),     # identical to 0
        (2, [0.9, 0.1, 0.0], 0),     # close to 0
        (3, [0.0, 1.0, 0.0], 0),     # orthogonal
        (4, [0.0, 0.0, 1.0], 1),     # other block
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


def test_exact_dedup_groups(docs):
    out = {r["doc_id"]: (r["canonical_id"], r["group_size"])
           for r in dedup.exact_dedup(docs).collect()}
    assert out[0] == (0, 2) and out[1] == (0, 2)
    assert out[2] == (2, 1)
    assert out[5] == (5, 1)


def test_ngram_jaccard_pairs(docs):
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in dedup.ngram_jaccard_pairs(docs, threshold=0.5).collect()}
    assert pairs[(0, 1)] == 1.0          # identical docs
    assert (0, 2) in pairs               # one-word change in 9 words
    assert all(a < b for a, b in pairs)  # canonical pair order
    assert (0, 3) not in pairs


def test_ngram_jaccard_hot_shingle_pruning(docs):
    # pruning shingles present in >1 docs removes all shared evidence for
    # 0/1 identical pair except... identical docs share ALL shingles -> all
    # pruned -> no pairs survive; sanity-check the knob wires through.
    out = dedup.ngram_jaccard_pairs(docs, threshold=0.1, max_shingle_df=1)
    assert out.count() == 0


def test_minhash_estimates_jaccard(docs):
    est = {(r["id_a"], r["id_b"]): r["est_sim"]
           for r in dedup.minhash_lsh_pairs(
               docs, num_hashes=16, bands=4, min_est_sim=0.3).collect()}
    assert est[(0, 1)] == 1.0            # identical signature
    if (0, 2) in est:                    # near dup: estimate in a wide band
        assert 0.3 <= est[(0, 2)] <= 1.0


def test_simhash_properties(docs):
    sh = {r["doc_id"]: r["simhash"] for r in dedup.simhash(docs).collect()}
    assert sh[0] == sh[1]                # identical text -> identical hash
    assert 0 <= sh[0] < (1 << 16)
    ham02 = bin(sh[0] ^ sh[2]).count("1")
    ham03 = bin(sh[0] ^ sh[3]).count("1")
    assert ham02 <= ham03                # near dup closer than unrelated


def test_simhash_pairs_hamming(docs):
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in dedup.simhash_pairs(docs, max_hamming=0).collect()}
    assert pairs[(0, 1)] == 0


def test_embedding_dup_pairs(vecs):
    pairs = {(r["id_a"], r["id_b"]): r["cosine"]
             for r in dedup.embedding_dup_pairs(vecs, threshold=0.9).collect()}
    assert pairs[(0, 1)] == 1.0
    exp = 0.9 / math.sqrt(0.9 ** 2 + 0.1 ** 2)
    assert abs(pairs[(0, 2)] - round(exp, 6)) < 1e-9
    assert (0, 3) not in pairs           # orthogonal
    assert (0, 4) not in pairs           # different block never compared


def test_brute_force_topk(spark, vecs):
    q = vecs.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding")
    out = similarity.brute_force_topk(vecs, q, k=3).collect()
    assert [r["vec_id"] for r in out] == [0, 1, 2]   # self, dup, near
    assert out[0]["cosine"] == 1.0 and out[0]["rank"] == 1


def test_lsh_buckets_deterministic(spark, vecs):
    b1 = {r["vec_id"]: r["bucket"]
          for r in similarity.lsh_buckets(vecs, n_planes=3, dim=3).collect()}
    b2 = {r["vec_id"]: r["bucket"]
          for r in similarity.lsh_buckets(vecs, n_planes=3, dim=3).collect()}
    assert b1 == b2
    assert b1[0] == b1[1]                # identical vectors -> same bucket
    assert all(0 <= v < 8 for v in b1.values())


def test_lsh_topk_subset_of_bucket(spark, vecs):
    q = vecs.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding")
    out = similarity.lsh_topk(vecs, q, k=5, n_planes=2, dim=3).collect()
    ids = [r["vec_id"] for r in out]
    assert 0 in ids and 1 in ids         # identical vecs share any bucket
    assert [r["rank"] for r in out] == list(range(1, len(out) + 1))


def test_ivf_assign_deterministic(spark, vecs):
    a1 = {r["vec_id"]: r["cell"]
          for r in similarity.ivf_assign(vecs, n_centroids=4, dim=3).collect()}
    a2 = {r["vec_id"]: r["cell"]
          for r in similarity.ivf_assign(vecs, n_centroids=4, dim=3).collect()}
    assert a1 == a2
    assert a1[0] == a1[1]                 # identical vectors -> same cell
    assert all(0 <= v < 4 for v in a1.values())


def test_ivf_topk_matches_brute_force_within_probed_cells(spark, vecs):
    q = vecs.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding")
    out = similarity.ivf_topk(vecs, q, k=5, n_centroids=4, n_probe=4,
                              dim=3).collect()
    # probing ALL cells makes IVF exhaustive: must equal brute force
    bf = similarity.brute_force_topk(vecs, q, k=5).collect()
    assert [(r["vec_id"], r["cosine"]) for r in out] == \
        [(r["vec_id"], r["cosine"]) for r in bf]
    narrow = similarity.ivf_topk(vecs, q, k=5, n_centroids=4, n_probe=1,
                                 dim=3).collect()
    # a 1-probe search returns a subset of the exhaustive ranking
    assert {r["vec_id"] for r in narrow} <= {r["vec_id"] for r in bf}
    assert 0 in {r["vec_id"] for r in narrow}  # query's own cell is probed
