"""Similarity search over embedding columns (G1/D7/H4 + ANN scale path).

The reference ranks summaries by MiniLM cosine against a single question
vector (/root/reference/utils/embedding_utils.py:17-40, top-k at :26-40).
Here:

  * ``cosine_col``      — cosine of two array<float> columns as a pure
                          column expression (zip_with + aggregate; codegen'd)
  * ``brute_force_topk`` — exact top-k by cosine vs one query vector
                          (broadcast scalar -> TakeOrderedAndProject)
  * ``lsh_bucketed_topk`` — random-hyperplane LSH variant: deterministic
                          signed projections -> bucket join -> brute force
                          within matching buckets only; the 100 TB path
                          (probes the query's bucket + optional neighbors)
  * ``knn_join``        — for each left row, its k nearest right rows
                          (window over a blocked cross score)

Everything is JVM-side; the only Python is building the literal query
vector on the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot_col(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def norm_col(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0).cast("double"), lambda acc, v: acc + v * v))


def cosine_col(a: Column, b: Column) -> Column:
    denom = norm_col(a) * norm_col(b)
    return F.when(denom == 0, F.lit(0.0)).otherwise(dot_col(a, b) / denom)


def _query_lit(query_vec: list[float]) -> Column:
    return F.array(*[F.lit(float(v)) for v in query_vec])


def brute_force_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k rows by cosine vs the query vector.

    orderBy+limit compiles to TakeOrderedAndProject: each partition keeps a
    k-heap, the driver merges — no global sort shuffle.
    """
    q = _query_lit(query_vec)
    return (
        embeddings.select(
            F.col(id_col),
            F.round(cosine_col(F.col(vec_col).cast("array<double>"), q), 6).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


def hyperplane_signature(vec_col: Column, dim: int, planes: int = 16) -> Column:
    """Deterministic random-hyperplane LSH signature (bit-packed long).

    Plane p's normal has component j = sign-ish hash of (p, j) mapped to
    {-1, +1}; the signature bit is the sign of the projection. Fully
    deterministic (xxhash64 seeds), no stored model.
    """
    def proj(p: int) -> Column:
        signs = F.array(
            *[
                (F.when(F.xxhash64(F.lit(p * 10_007 + j)) % 2 == 0, F.lit(1.0)).otherwise(F.lit(-1.0)))
                for j in range(dim)
            ]
        )
        return dot_col(vec_col.cast("array<double>"), signs)

    sig = F.lit(0).cast("long")
    for p in range(planes):
        sig = sig + (proj(p) > 0).cast("long") * (2**p)
    return sig


def lsh_bucketed_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = 8,
) -> DataFrame:
    """Approximate top-k: score only rows in the query's LSH bucket.

    At scale the bucket join prunes ~(1 - 2^-planes) of the corpus before
    any scoring; recall is tunable via ``planes`` (fewer planes = bigger
    buckets = higher recall). Falls back to nothing-found if the bucket is
    empty — callers can retry with fewer planes.
    """
    dim = len(query_vec)
    sigged = embeddings.withColumn(
        "_sig", hyperplane_signature(F.col(vec_col), dim, planes)
    )
    # Query signature computed the same way on a literal one-row frame.
    spark = embeddings.sparkSession
    qdf = spark.range(1).select(_query_lit(query_vec).alias("v"))
    qsig = qdf.select(hyperplane_signature(F.col("v"), dim, planes).alias("s")).collect()[0]["s"]
    q = _query_lit(query_vec)
    return (
        sigged.where(F.col("_sig") == qsig)
        .select(
            F.col(id_col),
            F.round(cosine_col(F.col(vec_col).cast("array<double>"), q), 6).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


def knn_join(
    left: DataFrame,
    right: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = None,
) -> DataFrame:
    """For each left row: its k nearest right rows by cosine.

    Blocked cross-score + per-left-key window top-k. Quadratic within a
    block — at 100 TB use lsh buckets as ``block_col``.
    """
    lb = left.select(
        F.col(id_col).alias("left_id"),
        F.col(vec_col).alias("lv"),
        *( [F.col(block_col).alias("block")] if block_col else [F.lit(1).alias("block")] ),
    )
    rb = right.select(
        F.col(id_col).alias("right_id"),
        F.col(vec_col).alias("rv"),
        *( [F.col(block_col).alias("block")] if block_col else [F.lit(1).alias("block")] ),
    )
    scored = (
        lb.join(rb, "block")
        .where(F.col("left_id") != F.col("right_id"))
        .withColumn(
            "cosine",
            F.round(cosine_col(F.col("lv").cast("array<double>"), F.col("rv").cast("array<double>")), 6),
        )
    )
    w = Window.partitionBy("left_id").orderBy(F.col("cosine").desc(), F.col("right_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("left_id", "right_id", "cosine", "rank")
    )
