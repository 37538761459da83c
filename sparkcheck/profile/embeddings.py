"""Embedding-column validation — the vector analog of the scalar rule
catalog. A multimodal / retrieval corpus carries `array<float>`
columns whose failure modes scalar rules can't see: NULL vectors,
wrong dimensionality (a model-version mix-up), NaN elements (fp
overflow upstream), all-zero vectors (failed encodes — they silently
poison cosine math), and norm drift (a new encoder shifts the space).

Three surfaces, mirroring the scalar engine's shape:

  - ``embedding_violations`` — per-row flags WITH LINEAGE (id + which
    check failed + the norm), the violation-rows contract;
  - ``embedding_profile`` — ONE aggregated row (counts per failure
    mode + norm stats over the valid subset), the summary contract;
  - ``embedding_dim_profile`` — per-dimension mean/std, the drift
    BASELINE: compare two runs' outputs with the existing drift layer
    to catch encoder-version shifts per coordinate.

Scale shape: the first two are map-only flag math over the array (one
``aggregate`` fold per row for the norm — JVM codegen, no UDF) plus,
for the profile, one O(1)-row global agg with map-side partials.
``embedding_dim_profile`` posexplodes to (dim, value) but map-side
partial aggregation shrinks the shuffle to O(partitions × dim) —
never O(rows × dim) across the wire.

Reference parity: the reference's validator catalog is scalar-only
(sqltest/modules/field_validator.py); this extends the same
violation/summary contracts to vector columns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _sumsq(vec: Column) -> Column:
    """Σ x² in double — left fold over the array, NaN-propagating
    (a NaN element makes the norm NaN, which the valid mask screens
    out before any aggregate)."""
    return F.aggregate(
        vec,
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )


def embedding_violations(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    expected_dim: int | None = None,
) -> DataFrame:
    """Per-row vector QA flags with lineage: ``(id, dim, is_null,
    bad_dim, has_nan, has_null_elem, is_zero, norm)``. ``norm`` is
    NULL for invalid vectors (NULL / NaN / null-element) and exactly
    0.0 for all-zero vectors. ``bad_dim`` is NULL when no
    ``expected_dim`` was declared (nothing to conform to). Map-only."""
    vec = F.col(vec_col)
    is_null = vec.isNull()
    dim = F.when(is_null, F.lit(None)).otherwise(F.size(vec))
    has_nan = F.when(is_null, F.lit(False)).otherwise(
        F.exists(vec, lambda x: F.isnan(x.cast("double")))
    )
    has_null_elem = F.when(is_null, F.lit(False)).otherwise(
        F.exists(vec, lambda x: x.isNull())
    )
    if expected_dim is None:
        bad_dim = F.lit(None).cast("boolean")
    else:
        bad_dim = F.when(is_null, F.lit(False)).otherwise(
            F.size(vec) != F.lit(expected_dim)
        )
    invalid = is_null | has_nan | has_null_elem
    norm = F.when(invalid, F.lit(None)).otherwise(F.sqrt(_sumsq(vec)))
    return df.select(
        F.col(id_col),
        dim.cast("int").alias("dim"),
        is_null.alias("is_null"),
        bad_dim.alias("bad_dim"),
        has_nan.alias("has_nan"),
        has_null_elem.alias("has_null_elem"),
        F.coalesce(norm == 0.0, F.lit(False)).alias("is_zero"),
        norm.alias("norm"),
    )


def embedding_profile(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    expected_dim: int | None = None,
) -> DataFrame:
    """ONE summary row: ``(n_rows, null_vecs, bad_dim_vecs, nan_vecs,
    null_elem_vecs, zero_vecs, valid_vecs, norm_mean, norm_std,
    norm_min, norm_max)``. Norm stats cover only VALID vectors (right
    dim, no NULL/NaN) so a single failed encode cannot NaN the whole
    profile. Map-side partials; O(1) rows out."""
    v = embedding_violations(df, vec_col, id_col, expected_dim)
    ok = (
        ~F.col("is_null")
        & ~F.col("has_nan")
        & ~F.col("has_null_elem")
        & ~F.coalesce(F.col("bad_dim"), F.lit(False))
    )
    norm_ok = F.when(ok, F.col("norm"))
    as_cnt = lambda c: F.sum(c.cast("long")).alias  # noqa: E731
    return v.agg(
        F.count(F.lit(1)).alias("n_rows"),
        as_cnt(F.col("is_null"))("null_vecs"),
        as_cnt(F.coalesce(F.col("bad_dim"), F.lit(False)))("bad_dim_vecs"),
        as_cnt(F.col("has_nan"))("nan_vecs"),
        as_cnt(F.col("has_null_elem"))("null_elem_vecs"),
        as_cnt(F.col("is_zero"))("zero_vecs"),
        as_cnt(ok)("valid_vecs"),
        F.avg(norm_ok).alias("norm_mean"),
        F.stddev_samp(norm_ok).alias("norm_std"),
        F.min(norm_ok).alias("norm_min"),
        F.max(norm_ok).alias("norm_max"),
    )


def embedding_dim_profile(
    df: DataFrame,
    vec_col: str = "embedding",
    expected_dim: int | None = None,
) -> DataFrame:
    """Per-DIMENSION mean/std over valid vectors — the drift baseline:
    persist one run's output, compare the next run's against it with
    the drift layer (``drift/compare.py``) to localize an encoder
    shift to coordinates. Output ``(dim_idx, mean, std, n)`` with
    0-based dim_idx, one row per dimension.

    Shuffle is O(partitions × dim) thanks to map-side partial aggs —
    the (row × dim) explosion never crosses the wire."""
    vec = F.col(vec_col)
    valid = (
        vec.isNotNull()
        & ~F.exists(vec, lambda x: F.isnan(x.cast("double")))
        & ~F.exists(vec, lambda x: x.isNull())
    )
    if expected_dim is not None:
        valid = valid & (F.size(vec) == expected_dim)
    return (
        df.where(valid)
        .select(F.posexplode(vec).alias("dim_idx", "x"))
        .groupBy("dim_idx")
        .agg(
            F.avg(F.col("x").cast("double")).alias("mean"),
            F.stddev_samp(F.col("x").cast("double")).alias("std"),
            F.count(F.lit(1)).alias("n"),
        )
    )
