"""Canonical dedup materialization: keep the BEST document per
duplicate group.

After any dedup stage produces a group key (exact fingerprint, LSH
cluster id, normalized url), a training-data pipeline must pick ONE
representative per group — usually the highest-quality copy. The
Spark-first shape is a single groupBy with a struct-max aggregate
(``max(struct(quality, -id, id))``): map-side partial aggregation, one
shuffle of (group, best-so-far) pairs, NO window function — a window
would sort every group's rows on one reducer, which melts on the
boilerplate mega-groups real crawls contain.

Tie-break: highest quality, then LOWEST id (deterministic at any
parallelism — struct comparison is lexicographic, so -id turns min-id
into max-struct).

Not in the reference (it validates tabular data); this is the
materialization counterpart of its uniqueness checks
(modules/field_validator semantics: first-wins dedup ⇒ here best-wins).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def keep_best_per_group(
    df: DataFrame,
    group_col: str | Column,
    quality_col: str | Column,
    id_col: str = "doc_id",
) -> DataFrame:
    """One verdict row per group: (group, kept_id, best_quality,
    group_size). Single groupBy, no window."""
    g = F.col(group_col) if isinstance(group_col, str) else group_col
    q = F.col(quality_col) if isinstance(quality_col, str) else quality_col
    best = F.max(
        F.struct(
            q.alias("q"),
            (-F.col(id_col)).alias("neg_id"),
            F.col(id_col).alias("id"),
        )
    )
    return (
        df.groupBy(g.alias("group_key"))
        .agg(best.alias("_b"), F.count(F.lit(1)).alias("group_size"))
        .select(
            "group_key",
            F.col("_b.id").alias("kept_id"),
            F.col("_b.q").alias("best_quality"),
            "group_size",
        )
    )


def drop_duplicates_keep_best(
    df: DataFrame,
    group_col: str,
    quality_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """The deduplicated corpus itself: full rows of the kept docs.
    Semi-join on the kept ids (broadcast when the kept set is small;
    AQE decides) — the group aggregation never carries row payloads."""
    kept = keep_best_per_group(df, group_col, quality_col, id_col).select(
        F.col("kept_id").alias(id_col)
    )
    return df.join(kept, id_col, "left_semi")
