"""Embedding-cosine near-duplicate detection over an array<float> column.

Cosine is computed entirely JVM-side with higher-order functions
(zip_with product + aggregate sum) — no Python, whole-stage codegen.
Norms are precomputed once per vector (map-only), so each candidate
pair costs one dot product.

Scale path: candidates come from a sign-bucket (random-hyperplane-LSH
degenerate case: the signs of ``n_bucket_dims`` fixed coordinates),
so the join is per-bucket, never all-pairs; near-duplicates (cos ≈ 1)
almost surely agree on every sign, and mirrored buckets can be probed
for recall. bucketed=False keeps the exact quadratic join for small
inputs / oracle parity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def with_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    return df.withColumn("_norm", _norm(F.col(vec_col)))


def embedding_near_duplicates(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    bucketed: bool = False,
    n_bucket_dims: int = 4,
) -> DataFrame:
    """Pairs (id_a < id_b, cosine) with cosine ≥ threshold (rounded to
    4 dp for cross-engine stability)."""
    base = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    base = base.withColumn("_n", _norm(F.col("v")))
    if bucketed:
        bucket = F.concat_ws(
            "", *[(F.element_at("v", i + 1) >= 0).cast("int") for i in range(n_bucket_dims)]
        )
        base = base.withColumn("_bkt", bucket)
        a, b = base.alias("a"), base.alias("b")
        joined = a.join(b, on="_bkt").where(F.col("a.id") < F.col("b.id"))
    else:
        a, b = base.alias("a"), base.alias("b")
        joined = a.join(b, F.col("a.id") < F.col("b.id"))
    cos = F.round(
        _dot(F.col("a.v"), F.col("b.v")) / (F.col("a._n") * F.col("b._n")), 4
    ).alias("cosine")
    return (
        joined.select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), cos)
        .where(F.col("cosine") >= threshold)
    )
