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


def centroid_component(c: int, d: int) -> float:
    """Deterministic pseudo-random IVF centroid component in [-1, 1) —
    identical value computable in Spark (literal), DuckDB (literal via
    repr) and Python, like the LSH hyperplanes."""
    import hashlib

    h = int(hashlib.md5(f"centroid:{c},{d}".encode()).hexdigest()[:15], 16)
    return ((h % 2001) - 1000) / 1000.0


def _cell_scores(vec_col, n_centroids: int, dim: int) -> list:
    """Per-centroid direction scores dot(vec, centroid)/|centroid| as
    constant-folded column chains (left-assoc, matching the SQL oracle's
    fp op order exactly)."""
    import math

    out = []
    for c in range(n_centroids):
        comps = [centroid_component(c, d) for d in range(dim)]
        inv = 1.0 / math.sqrt(sum(x * x for x in comps))
        dot = F.lit(0.0)
        for d in range(dim):
            dot = dot + F.element_at(vec_col, d + 1).cast("double") \
                * F.lit(comps[d])
        out.append(dot * F.lit(inv))
    return out


def _argmax_case(scores: list):
    """First index attaining the maximum, as a CASE chain — the same
    first-occurrence tie-break a CASE chain gives the SQL oracle."""
    expr = None
    for c, sc in enumerate(scores):
        cond = None
        for o, so in enumerate(scores):
            if o == c:
                continue
            cc = sc >= so
            cond = cc if cond is None else (cond & cc)
        expr = F.when(cond, F.lit(c)) if expr is None \
            else expr.when(cond, F.lit(c))
    return expr


def ivf_assign(vectors: DataFrame, n_centroids: int = 8, dim: int = 64,
               id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """(id, vec, cell): IVF coarse quantization — each vector is assigned
    to the deterministic pseudo-random centroid direction with the highest
    cosine.  Pure projection (no shuffle); ``cell`` is the partition /
    pruning key of the inverted file.  At production scale the same
    operator runs with learned centroids supplied as literals; the
    deterministic family keeps the whole path cross-engine verifiable."""
    scores = _cell_scores(F.col(vec_col), n_centroids, dim)
    return vectors.select(F.col(id_col), F.col(vec_col),
                          _argmax_case(scores).alias("cell"))


def ivf_topk(vectors: DataFrame, queries: DataFrame, k: int = 10,
             n_centroids: int = 8, n_probe: int = 2, dim: int = 64,
             id_col: str = "vec_id", vec_col: str = "embedding",
             query_id_col: str = "query_id") -> DataFrame:
    """Approximate top-k via IVF: score only vectors whose cell is among
    the query's ``n_probe`` best cells.

    The vector table is scanned once (cell assignment is a projection);
    each query probes n_probe/n_centroids of the corpus via a broadcast
    equijoin on ``cell`` — the standard IVF recall/cost dial.  With cell
    as a physical partition key the join prunes to the probed partitions.
    """
    vb = ivf_assign(vectors, n_centroids, dim, id_col, vec_col)
    qscores = _cell_scores(F.col(vec_col), n_centroids, dim)
    cells = F.array(*[
        F.struct(F.lit(c).alias("cell"), s.alias("cs"))
        for c, s in enumerate(qscores)])
    qcells = (queries.select(
        F.col(query_id_col), F.col(vec_col).alias("_qv"),
        F.explode(cells).alias("_c"))
        .select(query_id_col, "_qv",
                F.col("_c.cell").alias("cell"), F.col("_c.cs").alias("_cs")))
    wq = Window.partitionBy(query_id_col).orderBy(
        F.col("_cs").desc(), F.col("cell").asc())
    probe = F.broadcast(
        qcells.withColumn("_rn", F.row_number().over(wq))
        .filter(F.col("_rn") <= n_probe)
        .select(query_id_col, "_qv", "cell"))
    scored = (vb.join(probe, "cell")
              .withColumn("cosine",
                          F.round(cosine_expr(F.col("_qv"),
                                              F.col(vec_col)), 6)))
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(query_id_col, "rank", id_col, "cosine"))


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
