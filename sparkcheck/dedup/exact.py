"""Exact deduplication over a text/content column.

The web-corpus analog of the reference's unique rule
(validator.py:431-461, duplicated(keep=False) — ALL copies flagged,
NULLs exempt): group on a content fingerprint, flag groups with count>1.

Scale: ONE shuffle on the md5 key (16-byte strings, uniformly
distributed ⇒ no skew by construction, no salting needed). groupBy
does map-side partial counts, so shuffle volume is O(distinct keys).
``drop_exact_duplicates`` keeps the min-id representative via the same
single aggregation (no window/sort needed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def exact_duplicate_groups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", normalize: bool = False
) -> DataFrame:
    """Duplicate-content groups: (fingerprint, n_copies, min/max id),
    only groups with >1 copy, NULL content exempt."""
    t = F.col(text_col)
    if normalize:
        t = F.trim(F.regexp_replace(F.lower(t), r"\s+", " "))
    return (
        df.where(F.col(text_col).isNotNull())
        .select(F.md5(t).alias("fp"), F.col(id_col))
        .groupBy("fp")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min(id_col).alias("first_id"),
            F.max(id_col).alias("last_id"),
        )
        .where(F.col("n_copies") > 1)
    )


def drop_exact_duplicates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep exactly one representative (min id) per distinct content.
    Implemented as groupBy(fp).min(id) + semi-join back — two narrow
    shuffles on uniform keys; never a global window. NULL-content rows
    are exempt (pass through untouched), matching the unique rule's
    NULL semantics."""
    keep = (
        df.where(F.col(text_col).isNotNull())
        .groupBy(F.md5(F.col(text_col)).alias("fp"))
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    kept = df.join(keep, on=id_col, how="left_semi")
    return kept.unionByName(df.where(F.col(text_col).isNull()))
