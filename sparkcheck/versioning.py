"""Corpus snapshot versioning — what changed between two corpus
versions, and which partitions need revalidation because of it.

A web-scale corpus is re-crawled and re-ingested continuously, so
"validate the table" is really "validate the table AS OF a snapshot".
The engine's resume contract (``run/checkpoint.py``) answers *which
partitions did my interrupted run already cover*; this module answers
the complementary question — *which partitions did the DATA change
under* — and the two together give incremental revalidation: diff the
snapshots, re-run the suite only over touched partitions, splice the
rest from the previous report.

Scale shape (designed for 10^12 docs):
  - each side first collapses to ``(id, fingerprint)`` with a map-only
    md5 projection — 16-byte keys regardless of document size, so the
    join below moves hashes, not pages;
  - ONE shuffle: a full-outer join on id. If both snapshots are
    bucketed/partitioned by id (Iceberg ``bucket(N, id)``), the join is
    Exchange-free. On Iceberg the same answer also comes free from the
    changelog (incremental read between snapshot ids); this module is
    the engine-portable fallback and the oracle for that read;
  - ``revalidate_targets`` reduces the diff to DISTINCT partition
    values — output is O(partitions), never O(docs).

Reference parity: the reference validates fixed fixtures and has no
snapshot concept (closest is profile comparison,
``sqltest/modules/profiler.py`` compare paths); the diff/targets layer
is the web-scale analog that makes re-validation incremental.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F

# ASCII unit/null separators: cannot appear in the md5 hex alphabet and
# are engine-portable (chr(31)/chr(0) in DuckDB). A NULL column value
# and the literal string "<chr 0>" still collide by construction —
# acceptable for change DETECTION (same caveat as any sentinel scheme).
_SEP = "\x1f"
_NULL = "\x00"


def content_fingerprint(content_cols: Sequence[str]) -> Column:
    """md5 over the row's content columns, NULL-disambiguated: each
    column is cast to string and NULLs become a sentinel BEFORE the
    join, so (NULL, 'a') and ('a', NULL) fingerprint differently.
    Map-only; 16 bytes out regardless of document size."""
    parts = [
        F.coalesce(F.col(c).cast("string"), F.lit(_NULL)) for c in content_cols
    ]
    return F.md5(F.concat_ws(_SEP, *parts))


def snapshot_diff(
    old_df: DataFrame,
    new_df: DataFrame,
    id_col: str = "doc_id",
    content_cols: Sequence[str] = ("text",),
    carry_cols: Sequence[str] = (),
) -> DataFrame:
    """Per-id delta between two corpus snapshots. Output one row per id
    present in either side: ``(id, status, old_fp, new_fp)`` with
    status in {'added', 'removed', 'changed', 'unchanged'}, plus
    ``old_<c>``/``new_<c>`` for every ``carry_cols`` entry (NULL on the
    absent side) — carry the partition column to feed
    ``revalidate_targets`` without a second pass over the corpus.

    NULL-id rows cannot be matched across snapshots and are dropped
    from both sides (same contract as the samplers)."""

    def project(df: DataFrame, tag: str) -> DataFrame:
        cols = [
            F.col(id_col),
            content_fingerprint(content_cols).alias(f"{tag}_fp"),
        ]
        cols += [F.col(c).alias(f"{tag}_{c}") for c in carry_cols]
        return df.where(F.col(id_col).isNotNull()).select(*cols)

    old = project(old_df, "old")
    new = project(new_df, "new")
    joined = old.join(new, [id_col], "full_outer")
    status = (
        F.when(F.col("old_fp").isNull(), F.lit("added"))
        .when(F.col("new_fp").isNull(), F.lit("removed"))
        .when(F.col("old_fp") == F.col("new_fp"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(
        F.col(id_col),
        status.alias("status"),
        "old_fp",
        "new_fp",
        *[f"old_{c}" for c in carry_cols],
        *[f"new_{c}" for c in carry_cols],
    )


def diff_summary(diff: DataFrame) -> DataFrame:
    """Status counts for the report card — O(4) rows out, map-side
    partial aggregation in."""
    return diff.groupBy("status").agg(F.count(F.lit(1)).alias("n_docs"))


def revalidate_targets(
    old_df: DataFrame,
    new_df: DataFrame,
    partition_col: str,
    id_col: str = "doc_id",
    content_cols: Sequence[str] = ("text",),
) -> DataFrame:
    """DISTINCT partition values a validation run must revisit after
    the corpus moved from ``old_df`` to ``new_df`` — every partition
    holding an added/changed doc (its NEW partition), a removed doc
    (its OLD partition), or a doc whose partition value itself moved
    (BOTH partitions: the old one lost a row, the new one gained one).
    Feed the result to the checkpoint layer as the partition work list;
    everything else splices from the previous report untouched.

    Output is one column named ``partition_col`` — O(partitions) rows."""
    diff = snapshot_diff(
        old_df, new_df, id_col, content_cols, carry_cols=(partition_col,)
    )
    old_p, new_p = f"old_{partition_col}", f"new_{partition_col}"
    moved = F.col(old_p).isNotNull() & (
        F.col(new_p).isNull() | (F.col(new_p) != F.col(old_p))
    )
    touched = diff.where(
        (F.col("status") != "unchanged") | moved
    )
    return (
        touched.select(F.col(new_p).alias(partition_col))
        .unionByName(
            touched.where(moved).select(F.col(old_p).alias(partition_col))
        )
        .where(F.col(partition_col).isNotNull())
        .distinct()
    )
