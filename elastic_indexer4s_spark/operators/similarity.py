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


def _cell_scores(vec_col: str, n_centroids: int, dim: int) -> list:
    """Per-centroid direction scores dot(vec, centroid)/|centroid| as
    constant-folded column chains (left-assoc, matching the SQL oracle's
    fp op order exactly).

    Each score is built as ONE ``F.expr`` SQL string: composing it from
    ``dim`` individual Column operations costs 2·dim py4j round-trips per
    centroid — measured ~3.5 s of pure driver-side plan CONSTRUCTION for
    8×64; the parsed expression tree (and its fp semantics) is identical.
    """
    import math

    out = []
    for c in range(n_centroids):
        comps = [centroid_component(c, d) for d in range(dim)]
        inv = 1.0 / math.sqrt(sum(x * x for x in comps))
        terms = " + ".join(
            f"(CAST(element_at({vec_col}, {d + 1}) AS DOUBLE) * "
            f"CAST('{comps[d]!r}' AS DOUBLE))"
            for d in range(dim))
        out.append(F.expr(f"(0.0D + {terms}) * CAST('{inv!r}' AS DOUBLE)"))
    return out


def _argmax_expr(score_cols: list):
    """First index attaining the maximum:
    ``array_position(arr, array_max(arr)) - 1``.

    Same first-occurrence tie-break and exact-double comparison as the
    DuckDB oracle's ``list_position(list, list_max(list)) - 1``.  An
    O(K²) CASE chain was tried first and abandoned: with K score columns
    inlined, Catalyst's constraint propagation walked the K·(K-1)
    comparisons of ~500-node subtrees and spent ~10 s PLANNING a
    2000-row join."""
    arr = F.array(*score_cols)
    return (F.array_position(arr, F.array_max(arr)) - 1).cast("int")


def ivf_assign(vectors: DataFrame, n_centroids: int = 8, dim: int = 64,
               id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """(id, vec, cell): IVF coarse quantization — each vector is assigned
    to the deterministic pseudo-random centroid direction with the highest
    cosine.  Pure projection (no shuffle); ``cell`` is the partition /
    pruning key of the inverted file.  At production scale the same
    operator runs with learned centroids supplied as literals; the
    deterministic family keeps the whole path cross-engine verifiable."""
    scores = _cell_scores(vec_col, n_centroids, dim)
    # projection boundary: score each centroid ONCE into a named column,
    # argmax over the column refs — inlining the 512-node score chains into
    # the O(K²) CASE comparisons exploded plan size ~100× (measured 41 s
    # at 5k vectors; this shape runs in ~1 s)
    scored = vectors.select(
        F.col(id_col), F.col(vec_col),
        *[s.alias(f"_s{c}") for c, s in enumerate(scores)])
    argmax = _argmax_expr([F.col(f"_s{c}") for c in range(n_centroids)])
    return scored.select(F.col(id_col), F.col(vec_col),
                         argmax.alias("cell"))


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
    qscores = _cell_scores(vec_col, n_centroids, dim)
    qscored = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("_qv"),
        *[s.alias(f"_s{c}") for c, s in enumerate(qscores)])
    cells = F.array(*[
        F.struct(F.lit(c).alias("cell"), F.col(f"_s{c}").alias("cs"))
        for c in range(n_centroids)])
    qcells = (qscored.select(
        F.col(query_id_col), "_qv", F.explode(cells).alias("_c"))
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
