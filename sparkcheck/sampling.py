"""Deterministic sampling + dataset mixing + sequence packing — the
three sampling-shaped operations a training-data pipeline runs between
dedup and tokenization.

Reference analog: the mock/fixture sampling surface (the reference
samples fixture rows for pattern detection, sql_testing/fixtures.py) —
re-expressed at corpus scale where sampling must be DETERMINISTIC and
engine-portable, not RNG-backed:

- ``df.sample()`` draws from a per-partition RNG: resampling after a
  repartition, a retry, or on another engine yields a different subset,
  which breaks lineage audits ("why is this doc in the training set?").
- The hash-threshold construction here keeps a row iff
  ``md5(seed | id) < hex_threshold(rate)``. md5 hex is uniform over
  [0, 16^32) and identical in every engine, and fixed-length lowercase
  hex compares lexicographically as the number it encodes — so the
  SAME rows are kept at any parallelism, on re-runs, and in the DuckDB
  oracle, and nested rates compose (a 0.5 sample of a 0.5 sample is
  exactly the 0.25 sample when seeds differ).

All three operators are pure map-side Column work except the packing
window (see pack_sequences' scale note).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def hex_threshold(rate: float) -> str:
    """32-hex-digit threshold such that P(md5_hex < threshold) = rate
    for a uniform md5. rate is clamped to [0, 1]; rate=1.0 returns a
    string above every hex digest ('g' > 'f' lexicographically) so all
    rows are kept."""
    rate = min(max(float(rate), 0.0), 1.0)
    v = int(rate * 16**32)
    if v >= 16**32:
        return "g" * 32
    return format(v, "032x")


def _sample_hash(id_col: Column, seed: int) -> Column:
    """md5('<seed>|<id>') — THE sampling hash, shared by both samplers
    and mirrored literally in the oracle SQL. F.concat (not concat_ws)
    so a NULL id null-propagates: NULL-id rows are dropped by the WHERE
    in both engines, instead of all hashing to md5('<seed>|') and being
    kept or dropped as one block."""
    return F.md5(F.concat(F.lit(f"{seed}|"), id_col.cast("string")))


def _keep(id_col: Column, rate: float, seed: int) -> Column:
    return _sample_hash(id_col, seed) < F.lit(hex_threshold(rate))


def deterministic_sample(
    df: DataFrame, rate: float, id_col: str = "doc_id", seed: int = 1
) -> DataFrame:
    """Keep a deterministic ``rate`` fraction of rows, keyed by
    ``md5(seed|id)`` — reproducible at any parallelism and across
    engines (see module docstring). Map-only: no shuffle, no RNG
    state, fuses into whatever scan follows."""
    return df.where(_keep(F.col(id_col), rate, seed))


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str,
    id_col: str = "doc_id",
    default_rate: float = 0.0,
    seed: int = 1,
) -> DataFrame:
    """Per-stratum deterministic sampling — THE dataset-mixing
    primitive: ``rates`` maps a stratum value (source, language,
    quality bucket) to its keep fraction, e.g. up-weight books to 1.0
    and down-weight common-crawl to 0.1. Strata absent from ``rates``
    (and NULL strata) keep ``default_rate``. Still map-only — the
    per-stratum threshold is a CASE chain on the stratum column, not a
    join."""
    thr: Column = F.lit(hex_threshold(default_rate))
    # repr-keyed sort: only for deterministic CASE-chain construction
    # (conditions are mutually exclusive), and it tolerates mixed-type
    # strata keys (int quality buckets next to string sources) that a
    # bare sorted() would TypeError on
    for value, rate in sorted(rates.items(), key=lambda kv: repr(kv[0])):
        thr = F.when(
            F.col(strata_col) == value, F.lit(hex_threshold(rate))
        ).otherwise(thr)
    return df.where(_sample_hash(F.col(id_col), seed) < thr)


def pack_sequences(
    df: DataFrame,
    token_col: str,
    budget: int,
    id_col: str = "doc_id",
    shard_col: str | None = None,
) -> DataFrame:
    """Concat-then-chunk sequence packing (the standard LM-pretraining
    shape: documents are concatenated in a deterministic order and the
    stream is cut into ``budget``-token sequences; docs may straddle a
    boundary — that is the actual training layout, not a defect).

    Returns the input plus (seq_id, seq_offset): doc d starts at offset
    ``seq_offset`` of sequence ``seq_id`` of its shard. Derivation is
    one exclusive-prefix-sum window ordered by id:

        seq_id     = floor(cumsum_before / budget)
        seq_offset = cumsum_before % budget

    SCALE: an unpartitioned window is a single reducer — fine for one
    corpus slice, wrong at 10^12 docs. Pass ``shard_col`` (a bounded
    -cardinality column: language, source, date bucket) and the window
    partitions by it, giving per-shard sequence ids — exactly how
    multi-source training data is packed anyway (sequences never mix
    sources). NULL token counts are treated as 0-length (the doc still
    appears, at the current offset)."""
    if budget <= 0:
        raise ValueError(
            f"budget must be a positive token count, got {budget} (a zero "
            "budget would DIVIDE_BY_ZERO mid-job under ANSI mode, or yield "
            "all-NULL assignments without it)"
        )
    clash = {"_before", "seq_id", "seq_offset"} & set(df.columns)
    if clash:
        raise ValueError(
            f"input already has column(s) {sorted(clash)} — rename them "
            "before packing (the output adds seq_id/seq_offset and stages "
            "an internal _before column)"
        )
    order = [F.col(id_col)]
    w = (
        Window.partitionBy(shard_col).orderBy(*order)
        if shard_col is not None
        else Window.orderBy(*order)
    )
    before = F.coalesce(
        F.sum(F.coalesce(F.col(token_col), F.lit(0)).cast("long")).over(
            w.rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0).cast("long"),
    )
    # integer `div`, not `/`: Spark's `/` promotes to double, which
    # loses exactness past 2^53 cumulative tokens per shard — seq_id
    # would disagree with the exact long `%` offset at precisely the
    # scale this operator targets
    return df.select(
        "*", before.alias("_before")
    ).select(
        *df.columns,
        F.expr(f"_before div {int(budget)}").alias("seq_id"),
        (F.col("_before") % budget).cast("long").alias("seq_offset"),
    )
