"""Foreign-key CANDIDATE inference (inclusion dependencies).

Closes the reference's relationship-introspection surface for catalog-
less storage: ``db/schema_introspector.py:168-455`` reads PKs/FKs from
the database catalog; parquet/Iceberg tables have no FK metadata, so
candidates are inferred from the data — a column c in table A is an FK
candidate on table B's key k when every distinct non-null value of c
appears in k (an inclusion dependency, the textbook FK test).

Scale shape, per candidate pair:

    distinct(child.c)  LEFT ANTI  distinct(parent.k)   → orphan count

- both sides are DISTINCT key sets first (groupBy map-side combine), so
  the join never touches full rows — shuffle volume is O(ndv), not
  O(rows), and a 10^12-row child with a million-value key joins as a
  million-row frame;
- Catalyst/AQE broadcasts the smaller distinct set automatically
  (dimension-sized parents ⇒ map-only anti-join);
- candidate ENUMERATION is pruned before any join runs: only
  type-compatible (child col, parent key) pairs are tested, and callers
  pass the parent key list (e.g. from profile PK candidates,
  profile/profiler.py pk_candidate) instead of all columns × all
  columns.

Results carry containment evidence, not just a verdict: distinct child
values, how many are missing from the parent, and the containment
ratio — at 100 TB a near-FK (99.9% contained) is usually a data-quality
finding, not a modeling fact, and the caller needs the number to tell.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import DataFrame, functions as F


def fk_containment(
    child: DataFrame,
    child_col: str,
    parent: DataFrame,
    parent_key: str,
) -> DataFrame:
    """One-row frame for a single candidate pair:
    (child_distinct, missing_distinct, containment) over DISTINCT
    non-null child values vs the parent key set.

    ONE child scan: the distinct child values LEFT JOIN the (distinct,
    hit-marked) parent keys, and one aggregation counts both totals —
    the earlier two-branch shape (count agg + anti-join) scanned and
    distinct-shuffled the child twice per candidate pair."""
    cvals = (
        child.select(F.col(child_col).alias("__v"))
        .where(F.col("__v").isNotNull())
        .distinct()
    )
    pvals = (
        parent.select(F.col(parent_key).alias("__v"))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    joined = cvals.join(pvals, "__v", "left")
    return joined.agg(
        F.count(F.lit(1)).alias("child_distinct"),
        F.coalesce(
            F.sum(F.col("__hit").isNull().cast("long")), F.lit(0)
        ).alias("missing_distinct"),
    ).select(
        "child_distinct",
        "missing_distinct",
        F.when(
            F.col("child_distinct") > 0,
            F.round(
                1.0 - F.col("missing_distinct") / F.col("child_distinct"), 6
            ),
        )
        .otherwise(F.lit(None).cast("double"))
        .alias("containment"),
    )


def infer_foreign_keys(
    tables: Mapping[str, DataFrame],
    keys: Mapping[str, str],
    candidates: Sequence[tuple[str, str, str]] | None = None,
    min_containment: float = 1.0,
) -> DataFrame:
    """FK-candidate report over a set of tables.

    ``keys``: parent table -> its key column (from catalog knowledge or
    profile PK inference). ``candidates``: explicit
    (child_table, child_column, parent_table) triples to test; when
    None, every type-compatible (child column, parent key) pair is
    enumerated (child != parent-key-on-itself). ``min_containment``:
    threshold for the ``is_fk_candidate`` verdict (1.0 = strict
    inclusion dependency; relax to 0.999 for dirty crawls).

    Returns one row per tested pair:
    (child_table, child_column, parent_table, parent_column,
    child_distinct, missing_distinct, containment, is_fk_candidate),
    built as a UNION of per-pair one-row aggregates — each pair is one
    distinct-distinct anti-join, independently optimized (and trivially
    parallel across a thread pool if the pair list is long)."""
    if candidates is None:
        enumerated: list[tuple[str, str, str]] = []
        for parent_name, pk in keys.items():
            if parent_name not in tables:
                raise KeyError(f"keys references unknown table {parent_name!r}")
            ptype = dict(tables[parent_name].dtypes).get(pk)
            if ptype is None:
                raise KeyError(f"{parent_name!r} has no column {pk!r}")
            for child_name, child in tables.items():
                for col, ctype in child.dtypes:
                    if child_name == parent_name and col == pk:
                        continue
                    if ctype == ptype:
                        enumerated.append((child_name, col, parent_name))
        candidates = enumerated

    pieces = []
    for child_name, child_col, parent_name in candidates:
        pk = keys[parent_name]
        one = fk_containment(
            tables[child_name], child_col, tables[parent_name], pk
        ).select(
            F.lit(child_name).alias("child_table"),
            F.lit(child_col).alias("child_column"),
            F.lit(parent_name).alias("parent_table"),
            F.lit(pk).alias("parent_column"),
            "child_distinct",
            "missing_distinct",
            "containment",
        )
        pieces.append(one)
    if not pieces:
        raise ValueError("no FK candidates to test (empty enumeration)")
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    # verdict from the UNROUNDED ratio: the displayed containment is
    # rounded to 6 dp, so at child ndv > ~2M a single orphan would round
    # to 1.0 and a "strict" inclusion dependency would be mis-flagged
    raw = 1.0 - F.col("missing_distinct") / F.col("child_distinct")
    return out.withColumn(
        "is_fk_candidate",
        (F.col("child_distinct") > 0) & (raw >= F.lit(min_containment)),
    )
