"""Structured Streaming incremental validation tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparkcheck.rules import EnumRule, NullCheckRule, RangeRule
from sparkcheck.streaming import streaming_rule_counts, validate_stream


def test_validate_stream_foreachbatch(spark, tmp_path):
    # file streaming source over two parquet drops = two micro-batch sets
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    spark.range(100).select(
        F.col("id"),
        F.when(F.col("id") % 10 == 0, None).otherwise(F.lit("ok")).alias("status"),
    ).write.parquet(src)

    stream = spark.readStream.schema("id long, status string").parquet(src)
    rules = [
        NullCheckRule(name="nn_status", column="status"),
        RangeRule(name="rg_id", min_value=0, max_value=98, column="id"),
    ]
    batches: list[tuple[int, dict]] = []

    def on_batch(summary_df, batch_id):
        rows = {r["rule_id"]: r.asDict() for r in summary_df.collect()}
        batches.append((batch_id, rows))

    q = validate_stream(stream, rules, on_batch, ckpt, trigger_once=True)
    q.awaitTermination(120)

    assert batches, "no micro-batches processed"
    total_nn = sum(b["nn_status"]["violations"] for _, b in batches)
    total_rg = sum(b["rg_id"]["violations"] for _, b in batches)
    total_rows = sum(b["nn_status"]["total_rows"] for _, b in batches)
    assert total_rows == 100
    assert total_nn == 10   # ids 0,10,...,90
    assert total_rg == 1    # id 99 out of range
    # every batch carries its id for idempotent sinks
    assert all(set(r["batch_id"] for r in b.values()) == {bid} for bid, b in batches)


def test_streaming_rule_counts_windowed(spark, tmp_path):
    src = str(tmp_path / "wsrc")
    spark.range(120).select(
        F.to_timestamp(F.lit("2024-01-01 00:00:00")).cast("timestamp").alias("base"),
        F.col("id"),
    ).select(
        (F.col("base") + F.make_interval(secs=F.col("id"))).alias("ts"),
        F.col("id").alias("value"),
    ).write.parquet(src)

    stream = spark.readStream.schema("ts timestamp, value long").parquet(src)
    agg = streaming_rule_counts(
        stream, violated=(F.col("value") % 7 == 0), ts_col="ts", window="1 minute"
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory").queryName("rolling_verdicts")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    rows = {r["window_start"].isoformat(): r for r in
            spark.sql("SELECT * FROM rolling_verdicts").collect()}
    assert len(rows) == 2  # 120 seconds → two 1-minute windows
    assert sum(r["n_rows"] for r in rows.values()) == 120
    assert sum(r["n_violations"] for r in rows.values()) == 18  # multiples of 7 < 120


def test_streaming_dedup_across_batches(spark, tmp_path):
    """applyInPandasWithState: a fingerprint seen in batch 1 must be
    flagged as duplicate when it reappears in batch 2."""
    import time as _time

    from sparkcheck.streaming.stateful import streaming_dedup

    src = str(tmp_path / "dsrc")
    ckpt = str(tmp_path / "dckpt")
    b1 = spark.createDataFrame(
        [(0, "alpha"), (1, "beta"), (2, "alpha")], "doc_id long, text string"
    )
    b1.coalesce(1).write.mode("append").parquet(src)

    collected: dict[int, bool] = {}

    def _sink(bdf, _bid):
        for r in bdf.collect():
            collected[r["doc_id"]] = r["is_duplicate"]

    def run_once():
        stream = spark.readStream.schema("doc_id long, text string").parquet(src)
        q = (streaming_dedup(stream).writeStream.foreachBatch(_sink)
             .outputMode("append").option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    run_once()
    assert collected[0] is False and collected[1] is False
    assert collected[2] is True  # duplicate of doc 0 within batch 1

    # second drop: one repeat of batch-1 content, one new doc; the state
    # store must remember batch-1 fingerprints across query restarts
    collected.clear()
    b2 = spark.createDataFrame(
        [(3, "alpha"), (4, "gamma")], "doc_id long, text string"
    )
    b2.coalesce(1).write.mode("append").parquet(src)
    run_once()
    assert collected == {3: True, 4: False}


def test_subscribe_changes_cdc_resume(spark, tmp_path):
    """CDC-style subscription: callback sees new rows only; a restart
    from the same checkpoint delivers ONLY data that arrived since."""
    from sparkcheck.streaming import subscribe_changes

    src = str(tmp_path / "cdc_src")
    ckpt = str(tmp_path / "cdc_ckpt")
    spark.range(0, 50).selectExpr("id", "id % 2 = 0 AS flagged").write.parquet(src)
    stream = spark.readStream.schema("id long, flagged boolean").parquet(src)

    seen: list[int] = []

    def on_change(batch_df, batch_id):
        seen.extend(r["id"] for r in batch_df.collect())

    q = subscribe_changes(stream, on_change, ckpt,
                          where=F.col("flagged"), trigger_once=True)
    q.awaitTermination(120)
    assert sorted(seen) == list(range(0, 50, 2))

    # second drop + restart from checkpoint: only the new file arrives
    spark.range(50, 60).selectExpr("id", "id % 2 = 0 AS flagged").write.mode(
        "append").parquet(src)
    seen.clear()
    stream2 = spark.readStream.schema("id long, flagged boolean").parquet(src)
    q2 = subscribe_changes(stream2, on_change, ckpt,
                           where=F.col("flagged"), trigger_once=True)
    q2.awaitTermination(120)
    assert sorted(seen) == list(range(50, 60, 2))


def test_monitor_drift_stream(spark, tmp_path):
    """Streaming PSI drift monitor: batches histogrammed on the
    BASELINE's stored bin edges, PSI per column per micro-batch; an
    in-distribution batch scores low, a shifted batch flags."""
    from sparkcheck.profile import profile_table
    from sparkcheck.streaming import monitor_drift_stream

    # baseline: uniform values in [0, 100)
    base_df = spark.range(2000).selectExpr("CAST(id % 100 AS DOUBLE) AS v")
    baseline = profile_table(base_df, approx_distinct=False,
                             detect_patterns=False, with_top_k=False)

    src = str(tmp_path / "src")
    # batch 0: same distribution; batch 1: hard shift into the top decile
    spark.range(1000).selectExpr("CAST(id % 100 AS DOUBLE) AS v") \
        .coalesce(1).write.parquet(src)
    spark.range(1000).selectExpr("CAST(90 + id % 10 AS DOUBLE) AS v") \
        .coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema("v double").parquet(src)
    got: list[tuple[int, list]] = []
    q = monitor_drift_stream(
        stream, baseline, on_batch=lambda f, b: got.append((b, f)),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    findings = [f for _, fs in got for f in fs]
    # availableNow may read both files as one batch or two; either way
    # the union contains the shifted rows, so v must flag somewhere,
    # with PSI scored on 10 aligned bins
    assert findings and all(f["column"] == "v" for f in findings)
    assert any(f["drifted"] and f["psi"] > 0.25 for f in findings)
    # KS rides the same counts: even if availableNow merges both files
    # into one 50/50 batch, the CDF gap at the 9th bin edge is >= 0.45
    assert any(f["ks"] >= 0.4 for f in findings)
    assert all(0.0 <= f["ks"] <= 1.0 for f in findings)
    if len(findings) == 2:  # two batches: the in-distribution one is quiet
        by_batch = sorted(findings, key=lambda f: f["batch_id"])
        assert not by_batch[0]["drifted"] and by_batch[1]["drifted"]

    # no usable baseline histograms -> loud error, not a silent no-op
    import pytest as _pytest

    flat = profile_table(base_df, approx_distinct=False, with_histograms=False,
                         detect_patterns=False, with_top_k=False)
    with _pytest.raises(ValueError, match="histograms"):
        monitor_drift_stream(stream, flat, on_batch=lambda f, b: None,
                             checkpoint_dir=str(tmp_path / "ckpt2"))
