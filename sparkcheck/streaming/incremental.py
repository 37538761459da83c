"""Incremental / streaming validation via Structured Streaming.

The reference has no true streaming engine — its closest constructs are
chunked cursor streaming with partial-result merge
(field_validator/__init__.py:208-298) and a CDC subscribe/callback stub
(db/data_operations.py:204-270). The Spark-native mapping:

- ``validate_stream`` — ``foreachBatch``: each micro-batch runs the SAME
  fused single-pass rule aggregation as batch mode (one plan, two
  execution modes), and per-batch verdict rows append to a sink the
  caller merges (the streaming analog of the reference's
  ``_merge_field_results``). Exactly-once per batch via the sink's
  (batch_id) idempotence.

- ``streaming_rule_counts`` — a fully declarative alternative: violation
  counts as a windowed streaming aggregation with a watermark, for
  dashboards that want rolling validation rates over event time.

Scale: a micro-batch over an Iceberg/Kafka source is just partitions;
the fused agg keeps the same no-row-shuffle property, so streaming
validation sustains the batch engine's docs/sec within a trigger.
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming import StreamingQuery

from sparkcheck.compile import summary_df
from sparkcheck.rules.models import Rule


def validate_stream(
    stream_df: DataFrame,
    rules: Sequence[Rule],
    on_batch: Callable[[DataFrame, int], None],
    checkpoint_dir: str,
    trigger_once: bool = True,
) -> StreamingQuery:
    """Run the fused rule suite on every micro-batch.

    ``on_batch(summary_with_batch_id, batch_id)`` receives the per-rule
    summary frame (rule_id, column, evaluated, violations, total_rows,
    violation_rate, batch_id) — write it to a table keyed by batch_id for
    idempotent exactly-once accumulation.
    """

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        summary = summary_df(batch_df, rules).withColumn(
            "batch_id", F.lit(batch_id).cast("long")
        )
        on_batch(summary, batch_id)

    writer = (
        stream_df.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def subscribe_changes(
    stream_df: DataFrame,
    on_change: Callable[[DataFrame, int], None],
    checkpoint_dir: str,
    where: F.Column | None = None,
    trigger_once: bool = True,
) -> StreamingQuery:
    """CDC-style change subscription — the working counterpart of the
    reference's subscribe/callback stub (db/data_operations.py:204-270,
    which registered callbacks but polled nothing). Each micro-batch of
    new rows (optionally filtered by ``where``) is delivered to
    ``on_change(batch_df, batch_id)``; the checkpoint makes delivery
    resume-exactly-where-it-left-off across restarts. Point it at a file/
    Kafka/Delta-CDF source; with CDF the operation column comes through
    as data."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        on_change(batch_df.where(where) if where is not None else batch_df, batch_id)

    writer = (
        stream_df.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def monitor_drift_stream(
    stream_df: DataFrame,
    baseline,
    on_batch: Callable[[list, int], None],
    checkpoint_dir: str,
    columns: Sequence[str] | None = None,
    psi_threshold: float = 0.25,
    trigger_once: bool = True,
) -> StreamingQuery:
    """Streaming distribution-drift monitor — the north star's "PSI
    against a baseline profile" run continuously: every micro-batch is
    histogrammed ON THE BASELINE'S STORED BIN EDGES (one fused
    conditional-sum aggregation for all monitored columns —
    profile.fused_histograms, no per-column jobs) and scored with PSI
    driver-side (O(bins × columns) arithmetic).

    ``baseline``: a TableProfile whose columns carry histogram +
    histogram_lo/hi (the drift baseline written by ``sparkcheck
    profile``). ``on_batch(findings, batch_id)`` receives one dict per
    monitored column: {column, psi, ks, drifted, n_rows, batch_id} —
    append it to an alerts table / history file (ks is the binned-CDF
    sup-distance, computed from the same counts at zero extra cost;
    the drifted verdict is PSI-gated like batch compare_profiles).
    Columns without a stored histogram (or with degenerate lo==hi
    edges) are skipped, same as batch ``compare_profiles``.

    Scale: EXACTLY ONE scan per micro-batch — the row count rides the
    same fused aggregation as the histogram conditional sums
    (profile.histogram_exprs); state is zero (each batch scores
    independently against the immutable baseline), so the monitor
    sustains the batch engine's throughput within a trigger."""
    from pyspark.sql import functions as _F

    from sparkcheck.drift.stats import ks_from_binned, psi_from_counts
    from sparkcheck.profile.profiler import histogram_exprs

    specs: dict[str, tuple[float, float]] = {}
    base_counts: dict[str, list[int]] = {}
    bins = None
    for name, cs in baseline.columns.items():
        if columns is not None and name not in columns:
            continue
        if not cs.histogram or cs.histogram_lo is None or cs.histogram_hi is None:
            continue
        if float(cs.histogram_hi) == float(cs.histogram_lo):
            continue
        specs[name] = (float(cs.histogram_lo), float(cs.histogram_hi))
        base_counts[name] = [int(h["count"]) for h in cs.histogram]
        bins = len(base_counts[name]) if bins is None else bins
        if len(base_counts[name]) != bins:
            raise ValueError(
                f"baseline histograms disagree on bin count at {name!r}"
            )
    if not specs:
        raise ValueError(
            "baseline has no usable histograms for the requested columns "
            "(profile with with_histograms=True)"
        )

    exprs = histogram_exprs(specs, bins=bins) + [
        _F.count(_F.lit(1)).alias("__n_rows")
    ]

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        row = batch_df.agg(*exprs).collect()[0]  # the batch's ONE job
        n_rows = int(row["__n_rows"])
        findings: list[dict] = []
        if n_rows:
            for col in specs:
                counts = [int(row[f"{col}__h{b}"] or 0) for b in range(bins)]
                try:
                    psi = psi_from_counts(base_counts[col], counts)
                    ks = ks_from_binned(base_counts[col], counts)
                except ValueError:
                    continue  # empty batch slice for this column
                findings.append({
                    "column": col,
                    "psi": psi,
                    "ks": ks,
                    "drifted": psi > psi_threshold,
                    "n_rows": n_rows,
                    "batch_id": batch_id,
                })
        on_batch(findings, batch_id)

    writer = (
        stream_df.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_rule_counts(
    stream_df: DataFrame,
    violated: F.Column,
    ts_col: str = "ts",
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Declarative rolling violation counts: tumbling event-time window
    + watermark for late data. Returns an unstarted streaming frame
    (window_start, n_rows, n_violations) the caller writes out."""
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(violated.cast("long")).alias("n_violations"),
        )
        .select(F.col("w.start").alias("window_start"), "n_rows", "n_violations")
    )
