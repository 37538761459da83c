"""Bucketed (co-located) tables — shuffle-free joins for repeated
integrity checks.

At 10^12 rows the referential / reconciliation joins on the same keys
run every validation cycle; bucketing both sides on the join key at
write time (`bucketBy` — or Iceberg's `bucket(N, col)` partition
transform in production) makes every subsequent join a ZERO-SHUFFLE
zip of co-located buckets. The one-time cost is the bucketed write's
own shuffle; it amortizes across every later run.

Requires saving as a catalog table (Spark's bucketing metadata lives in
the catalog, not in plain parquet paths).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 64,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed catalog table. ``sort_cols`` additionally
    sorts within buckets (enables sort-merge without the sort)."""
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two equally-bucketed catalog tables on their bucket key.
    With matching bucket counts Catalyst plans SortMergeJoin with NO
    Exchange on either side (assert via .explain — tests do)."""
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)
