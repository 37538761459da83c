"""Table-level custom checks — the §2.10 applyInPandas/mapInPandas
surface.

The reference's table-level custom rule is
``custom_function(df: pd.DataFrame, context) -> RuleResult``
(business_rules/models.py:127, engine.py:473-514) — one driver-side
pandas call over the whole table, impossible at 10^12 rows. The Spark
shape: the callable runs per GROUP (``applyInPandas``, after a shuffle
on the group key) or per ARROW BATCH (``mapInPandas``, map-only), and
returns verdict ROWS, which Spark unions distributively.

Contract for the callable: pandas DataFrame in → pandas DataFrame out
matching ``result_schema``. Exceptions inside a group/batch yield a
single failed-verdict row rather than killing the job (mirrors the
reference's 'exception ⇒ rule failure', engine.py:286-297).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Callable, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

GROUP_VERDICT_SCHEMA = T.StructType(
    [
        T.StructField("group_key", T.StringType()),
        T.StructField("n_rows", T.LongType()),
        T.StructField("n_violations", T.LongType()),
        T.StructField("passed", T.BooleanType()),
        T.StructField("message", T.StringType()),
    ]
)


def grouped_custom_check(
    df: DataFrame,
    group_cols: Sequence[str],
    fn: Callable[[pd.DataFrame], tuple[int, str]],
    max_rows_per_group: int | None = None,
) -> DataFrame:
    """Run a custom pandas check per group; ``fn(pdf) -> (n_violations,
    message)``. One shuffle on the group key; each group must fit in
    executor memory (guard with ``max_rows_per_group`` — oversize groups
    fail their verdict instead of OOMing the executor)."""

    def _check(pdf: pd.DataFrame) -> pd.DataFrame:
        key = "|".join(str(pdf[c].iloc[0]) for c in group_cols) if len(pdf) else ""
        n = len(pdf)
        if max_rows_per_group is not None and n > max_rows_per_group:
            return pd.DataFrame(
                [[key, n, n, False, f"group exceeds max_rows_per_group={max_rows_per_group}"]],
                columns=[f.name for f in GROUP_VERDICT_SCHEMA.fields],
            )
        try:
            viol, msg = fn(pdf)
        except Exception as e:  # exception ⇒ rule failure, not job failure
            return pd.DataFrame(
                [[key, n, n, False, f"check raised: {e}"]],
                columns=[f.name for f in GROUP_VERDICT_SCHEMA.fields],
            )
        return pd.DataFrame(
            [[key, n, int(viol), int(viol) == 0, msg]],
            columns=[f.name for f in GROUP_VERDICT_SCHEMA.fields],
        )

    return df.groupBy(*group_cols).applyInPandas(_check, GROUP_VERDICT_SCHEMA)


def batch_custom_check(
    df: DataFrame,
    fn: Callable[[pd.DataFrame], pd.Series],
    key_cols: Sequence[str],
) -> DataFrame:
    """Map-only custom check: ``fn(batch) -> bool Series`` (True = row
    violates). Returns the violating rows' key columns — no shuffle at
    all; the Arrow batch is the reference's 'chunk'."""
    out_schema = T.StructType([df.schema[c] for c in key_cols])

    def _scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            try:
                mask = fn(pdf).astype(bool)
            except Exception:
                mask = pd.Series([True] * len(pdf), index=pdf.index)
            yield pdf.loc[mask, list(key_cols)]

    return df.mapInPandas(_scan, out_schema)
