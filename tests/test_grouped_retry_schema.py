"""Tests for table-level custom checks, retry/timeout, and schema
introspection/conformance."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from sparkcheck.compile.grouped import batch_custom_check, grouped_custom_check
from sparkcheck.profile.schema import schema_matches, schema_report
from sparkcheck.run.retry import run_with_timeout, with_retry


@pytest.fixture(scope="module")
def sales(spark):
    rows = [(g, i, float(i * (g + 1))) for g in range(3) for i in range(10)]
    return spark.createDataFrame(rows, "grp int, seq int, amount double")


def test_grouped_custom_check(sales):
    def monotone(pdf):
        ordered = pdf.sort_values("seq")["amount"]
        viol = int((ordered.diff().dropna() <= 0).sum())
        return viol, "amount must increase with seq"

    out = {r["group_key"]: r for r in
           grouped_custom_check(sales, ["grp"], monotone).collect()}
    assert len(out) == 3
    assert all(r["passed"] and r["n_rows"] == 10 for r in out.values())


def test_grouped_custom_check_exception_is_verdict(sales):
    def boom(pdf):
        raise ValueError("nope")

    out = grouped_custom_check(sales, ["grp"], boom).collect()
    assert len(out) == 3
    assert all(not r["passed"] and "check raised" in r["message"] for r in out)


def test_grouped_custom_check_size_guard(sales):
    out = grouped_custom_check(sales, ["grp"], lambda p: (0, ""), max_rows_per_group=5).collect()
    assert all(not r["passed"] and "max_rows_per_group" in r["message"] for r in out)


def test_batch_custom_check(sales):
    viol = batch_custom_check(sales, lambda pdf: pdf["amount"] > 15.0, ["grp", "seq"])
    got = {(r["grp"], r["seq"]) for r in viol.collect()}
    expected = {(g, i) for g in range(3) for i in range(10) if i * (g + 1) > 15}
    assert got == expected


def test_with_retry_succeeds_after_failures():
    calls = []

    def flaky():
        calls.append(1)
        if len(calls) < 3:
            raise RuntimeError("transient")
        return "ok"

    assert with_retry(flaky, attempts=3, base_delay=0.01) == "ok"
    assert len(calls) == 3


def test_with_retry_exhausts():
    with pytest.raises(RuntimeError, match="always"):
        with_retry(lambda: (_ for _ in ()).throw(RuntimeError("always")),
                   attempts=2, base_delay=0.01)


def test_run_with_timeout_cancels(spark):
    sleepy = F.udf(lambda x: (time.sleep(1), x)[1], "long")

    def slow():
        # a real Spark job that would run ~40s without cancellation; the
        # UDF feeds the filter so Catalyst cannot prune it under count()
        return (
            spark.range(40)
            .repartition(4)
            .where(sleepy(F.col("id")) == F.col("id"))
            .count()
        )

    t0 = time.monotonic()
    with pytest.raises(TimeoutError):
        run_with_timeout(spark, slow, timeout_sec=3.0, description="slow rule")
    assert time.monotonic() - t0 < 20


def test_run_with_timeout_passthrough(spark):
    assert run_with_timeout(spark, lambda: spark.range(10).count(), 60.0) == 10


def test_run_with_timeout_driver_side_python_hang(spark):
    """A body that hangs in pure driver-side Python (no Spark job to
    cancel) must still raise TimeoutError promptly — the old
    ThreadPoolExecutor context manager blocked in shutdown(wait=True)
    until the body finished."""
    t0 = time.monotonic()
    with pytest.raises(TimeoutError):
        run_with_timeout(spark, lambda: time.sleep(15), timeout_sec=1.0,
                         description="python hang")
    assert time.monotonic() - t0 < 5


def test_schema_report_and_matches(sales, spark):
    rep = {r["column"]: r for r in schema_report(spark, sales, "sales").collect()}
    assert rep["amount"]["data_type"] == "double"
    ok = schema_matches(sales, {"grp": "int", "seq": "int", "amount": "double"})
    assert ok.matches
    bad = schema_matches(sales, {"grp": "bigint", "missing_col": "string"})
    assert bad.missing == ["missing_col"]
    assert bad.type_mismatch == [("grp", "bigint", "int")]
    assert set(bad.unexpected) == {"seq", "amount"}
