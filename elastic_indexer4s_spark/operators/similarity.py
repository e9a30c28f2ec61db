"""Similarity search over an embedding column (array<float>).

Baseline: brute-force cosine top-k (exact).  Scale path: random-hyperplane
LSH buckets — queries only score vectors in their own bucket, cutting the
candidate set by ~2^n_planes while staying deterministic and cross-engine
reproducible (hyperplane components are derived from portable md5 hashes, not
an RNG, so DuckDB/Python can generate byte-identical planes).

Scale design (10^9+ vectors):

* brute_force_topk broadcasts the (tiny) query set against the big vector
  table — one scan, no shuffle of the vectors; per-query top-k via a window
  over (query_id) after a partial per-partition prune would be the next step
  at extreme k; the window shuffles only (query_id, score) pairs.
* lsh_buckets is a single narrow projection (no shuffle); the bucket id
  becomes the partition/blocking key for joins (see dedup.embedding_dup_pairs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import cosine_expr
from ..functions.hashing import md5_long


def brute_force_topk(vectors: DataFrame, queries: DataFrame, k: int = 10,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     query_id_col: str = "query_id") -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    `queries` is (query_id, embedding) and is broadcast: the big vector table
    is scanned once, never shuffled; only (query_id, id, score) rows move.
    Self-matches (same id) are excluded by the caller filtering, if desired.
    """
    q = F.broadcast(queries.select(
        F.col(query_id_col), F.col(vec_col).alias("_qv")))
    scored = (
        vectors.select(F.col(id_col), F.col(vec_col))
        .crossJoin(q)
        .withColumn("cosine", F.round(cosine_expr(F.col("_qv"), F.col(vec_col)), 6))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "rank", id_col, "cosine")
    )


def hyperplane_expr(plane: int, dim: int):
    """Deterministic pseudo-random hyperplane component in [-1, 1):
    portable across Spark / DuckDB / Python via the md5-derived hash."""
    h = md5_long(F.lit(f"plane:{plane},{dim}"))
    return ((h % F.lit(2001)) - F.lit(1000)).cast("double") / F.lit(1000.0)


def lsh_buckets(vectors: DataFrame, n_planes: int = 4, dim: int = 64,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """(id, bucket): random-hyperplane signature — bit p is set iff
    dot(vec, plane_p) > 0.  Pure projection, no shuffle; planes are constant-
    folded literals so the whole expression stays in codegen."""
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        dot = F.lit(0.0)
        for d in range(dim):
            dot = dot + F.element_at(F.col(vec_col), d + 1).cast("double") \
                * hyperplane_expr(p, d)
        bucket = bucket + F.when(dot > 0,
                                 F.lit(1 << p).cast("long")).otherwise(F.lit(0))
    return vectors.select(F.col(id_col), F.col(vec_col),
                          bucket.alias("bucket"))


def lsh_topk(vectors: DataFrame, queries: DataFrame, k: int = 10,
             n_planes: int = 4, dim: int = 64, id_col: str = "vec_id",
             vec_col: str = "embedding",
             query_id_col: str = "query_id") -> DataFrame:
    """Approximate top-k: score only vectors in the query's LSH bucket.

    The bucket equijoin replaces the cross join — with B buckets, each query
    touches ~1/B of the corpus.  Exactness is traded for a B-fold candidate
    cut; recall is tunable via n_planes (fewer planes = bigger buckets).
    """
    vb = lsh_buckets(vectors, n_planes, dim, id_col, vec_col)
    qb = F.broadcast(
        lsh_buckets(queries.withColumnRenamed(query_id_col, id_col),
                    n_planes, dim, id_col, vec_col)
        .select(F.col(id_col).alias(query_id_col), F.col(vec_col).alias("_qv"),
                "bucket"))
    scored = (
        vb.join(qb, "bucket")
        .withColumn("cosine", F.round(cosine_expr(F.col("_qv"), F.col(vec_col)), 6))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "rank", id_col, "cosine")
    )
