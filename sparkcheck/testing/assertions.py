"""Assertion engine + fluent ``expect()`` API for SQL unit tests.

Covers all 26 assertion types of the reference's dispatch table
(assertions/engine.py:32-59) re-expressed for Spark DataFrames:

- Scalar assertions (equals/greater_than/starts_with/is_null/...) apply
  to the single-cell result of a verdict query, mirroring the reference's
  single-value extraction (sql_testing/executor.py:231-236).
- Data-shaped assertions (in_range, is_unique, matches_regex over a
  column, row_count, contains) are evaluated AS SPARK AGGREGATIONS —
  one job collecting only the verdict, never the data. On a cluster a
  `contains` over a billion-row frame is a pushed-down filter + count,
  not a driver-side pandas scan (the reference pulled the full frame
  into pandas first, engine.py:863-885 — that shape dies at scale).
- equals/not_equals compare full (small) result sets with a hard cap
  (`max_rows`) so a mis-written test can't collect a table.

The fluent builder (``expect(df).row_count(equals=3)...``) mirrors
testing/assertions.py:147-246 (`assert_that`) and raises
SparkAssertionError immediately; the declarative engine
(`run_assertion`) returns AssertionOutcome records for the runner.
"""

from __future__ import annotations

import math
import re
from typing import Any, Callable, Iterable, Mapping, Sequence

from pyspark.sql import DataFrame, functions as F

from sparkcheck.testing.models import AssertionOutcome, TestAssertion


class SparkAssertionError(AssertionError):
    """Raised by the fluent API on a failed expectation."""


DEFAULT_MAX_ROWS = 10_000


# ---------------------------------------------------------------------------
# value normalization (driver side, verdict-sized data only)

def _norm_value(v: Any, tolerance: float | None) -> Any:
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if tolerance:
            return round(v / tolerance) * tolerance
        return v
    return v


def _rows_to_tuples(
    rows: Iterable[Any], columns: Sequence[str], tolerance: float | None
) -> list[tuple]:
    out = []
    for r in rows:
        d = r.asDict() if hasattr(r, "asDict") else dict(r)
        out.append(tuple(_norm_value(d.get(c), tolerance) for c in columns))
    return out


def _collect_capped(df: DataFrame, max_rows: int) -> list[Any]:
    rows = df.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise SparkAssertionError(
            f"result exceeds the {max_rows}-row assertion cap; "
            "equals/not_equals are for verdict-sized frames — use "
            "query_equals-style aggregation or raise max_rows explicitly"
        )
    return rows


def _scalar(df: DataFrame) -> Any:
    """First row, first column — the reference's single-value contract
    (executor.py:231-236). None when the frame is empty."""
    row = df.select(df.columns[0]).limit(1).collect()
    return row[0][0] if row else None


def _tol_eq(a: Any, b: Any, tolerance: float | None) -> bool:
    if tolerance is not None and isinstance(a, (int, float)) and isinstance(b, (int, float)):
        return abs(float(a) - float(b)) <= tolerance
    return a == b


# ---------------------------------------------------------------------------
# declarative engine

def _expected_rows(expected: Any) -> list[Mapping[str, Any]]:
    if isinstance(expected, Mapping):
        return [expected]
    if isinstance(expected, DataFrame):
        return [r.asDict() for r in expected.collect()]
    return list(expected)


def _check_equals(a: TestAssertion, df: DataFrame, max_rows: int) -> tuple[bool, Any, Any]:
    exp = a.expected
    if not isinstance(exp, (list, tuple, Mapping, DataFrame)):
        actual = _scalar(df)
        return _tol_eq(actual, exp, a.tolerance), exp, actual
    exp_rows = _expected_rows(exp)
    cols = df.columns
    # a mis-keyed expected dict must FAIL LOUDLY, not silently become
    # None (which would false-pass against NULL cells)
    unknown = sorted({k for r in exp_rows for k in r} - set(cols))
    if unknown:
        raise ValueError(
            f"expected rows use column(s) {unknown} not in the result "
            f"schema {cols}"
        )
    act = _collect_capped(df, max_rows)
    a_t = _rows_to_tuples(act, cols, a.tolerance)
    e_t = [tuple(_norm_value(r.get(c), a.tolerance) for c in cols) for r in exp_rows]
    if a.ignore_order:
        a_t, e_t = sorted(a_t, key=repr), sorted(e_t, key=repr)
    return a_t == e_t, e_t, a_t


def _row_predicate(row_spec: Mapping[str, Any]):
    cond = F.lit(True)
    for k, v in row_spec.items():
        cond = cond & (F.col(k).eqNullSafe(F.lit(v)))
    return cond


def _check_contains(a: TestAssertion, df: DataFrame) -> tuple[bool, Any, Any]:
    """Row-subset containment as a Spark filter+limit job (no collect of
    the data)."""
    if isinstance(a.expected, Mapping):
        hit = not df.where(_row_predicate(a.expected)).isEmpty()
        return hit, a.expected, "present" if hit else "absent"
    # scalar: any cell of the FIRST column matches
    hit = not df.where(F.col(df.columns[0]).eqNullSafe(F.lit(a.expected))).isEmpty()
    return hit, a.expected, "present" if hit else "absent"


def _str_col_check(a: TestAssertion, df: DataFrame, pred) -> tuple[bool, Any, Any]:
    """String assertions: with params.column, assert ALL non-null values
    satisfy (one Spark agg); else apply to the scalar result."""
    col = a.params.get("column")
    if col:
        viol = (
            df.where(F.col(col).isNotNull() & ~pred(F.col(col)))
            .limit(1)
            .count()
        )
        return viol == 0, a.expected, f"{viol} violating value(s)" if viol else "all match"
    v = _scalar(df)
    if v is None:
        return False, a.expected, None
    return bool(pred_py(a, str(v))), a.expected, v


def pred_py(a: TestAssertion, s: str) -> bool:
    t = a.assertion_type
    if t == "starts_with":
        return s.startswith(str(a.expected))
    if t == "ends_with":
        return s.endswith(str(a.expected))
    if t == "matches_regex":
        return re.search(str(a.expected), s) is not None
    raise ValueError(t)


def run_assertion(
    a: TestAssertion, df: DataFrame, max_rows: int = DEFAULT_MAX_ROWS
) -> AssertionOutcome:
    """Evaluate one declarative assertion against a result frame."""
    t = a.assertion_type
    msg = a.message or f"{t} assertion"
    try:
        passed: bool
        expected: Any = a.expected
        actual: Any = None

        if t in ("equals", "not_equals"):
            eq, expected, actual = _check_equals(a, df, max_rows)
            passed = eq if t == "equals" else not eq
        elif t in ("greater_than", "less_than", "greater_equal", "less_equal"):
            actual = _scalar(df)
            if actual is None:
                passed = False
            else:
                op = {
                    "greater_than": lambda x, y: x > y,
                    "less_than": lambda x, y: x < y,
                    "greater_equal": lambda x, y: x >= y,
                    "less_equal": lambda x, y: x <= y,
                }[t]
                passed = bool(op(actual, a.expected))
        elif t in ("contains", "not_contains"):
            hit, expected, actual = _check_contains(a, df)
            passed = hit if t == "contains" else not hit
        elif t in ("starts_with", "ends_with", "matches_regex"):
            pat = str(a.expected)
            spark_pred = {
                "starts_with": lambda c: c.startswith(pat),
                "ends_with": lambda c: c.endswith(pat),
                "matches_regex": lambda c: c.rlike(pat),
            }[t]
            passed, expected, actual = _str_col_check(a, df, spark_pred)
        elif t in ("is_null", "is_not_null"):
            actual = _scalar(df)
            passed = (actual is None) if t == "is_null" else (actual is not None)
        elif t in ("is_empty", "is_not_empty"):
            empty = df.isEmpty()
            actual = "empty" if empty else "non-empty"
            passed = empty if t == "is_empty" else not empty
        elif t in ("has_length", "has_min_length", "has_max_length"):
            v = _scalar(df)
            n = len(str(v)) if v is not None else None
            actual = n
            if n is None:
                passed = False
            elif t == "has_length":
                passed = n == a.expected
            elif t == "has_min_length":
                passed = n >= a.expected
            else:
                passed = n <= a.expected
        elif t in ("in_range", "not_in_range"):
            lo, hi = a.params.get("min"), a.params.get("max")
            if lo is None and hi is None:
                lo, hi = a.expected  # (min, max) tuple form
            col = a.params.get("column")
            if col:
                # whole-column range check as ONE aggregation
                row = df.agg(
                    F.min(col).alias("mn"), F.max(col).alias("mx")
                ).collect()[0]
                actual = (row["mn"], row["mx"])
                inside = (
                    row["mn"] is not None
                    and (lo is None or row["mn"] >= lo)
                    and (hi is None or row["mx"] <= hi)
                )
            else:
                v = _scalar(df)
                actual = v
                inside = v is not None and (lo is None or v >= lo) and (hi is None or v <= hi)
            expected = {"min": lo, "max": hi}
            passed = inside if t == "in_range" else not inside
        elif t in ("is_unique", "has_duplicates"):
            cols = a.params.get("columns") or (
                [a.params["column"]] if a.params.get("column") else df.columns
            )
            # per-column duplicate counts, NULLs exempt (reference
            # engine.py:863-885 semantics). One column = one plain agg;
            # several columns = ONE explode + (col, value) groupBy — N
            # count_distincts in one agg would plan an Expand that
            # replicates every row ×(N+1) (the CLAUDE.md blowup trap).
            if len(cols) == 1:
                c = cols[0]
                row = df.agg(
                    (F.count(F.col(c)) - F.count_distinct(F.col(c))).alias("d")
                ).collect()[0]
                dup_total = row["d"]
            else:
                stacked = df.select(F.explode(F.array(*[
                    F.struct(F.lit(c).alias("c"),
                             F.col(c).cast("string").alias("v"))
                    for c in cols
                ])).alias("s")).select("s.c", "s.v")
                dup_total = (
                    stacked.where(F.col("v").isNotNull())
                    .groupBy("c", "v")
                    .agg((F.count(F.lit(1)) - 1).alias("extra"))
                    .agg(F.sum("extra").alias("d"))
                    .collect()[0]["d"]
                ) or 0
            actual = f"{dup_total} duplicate value(s)"
            expected = "all values unique" if t == "is_unique" else "contains duplicates"
            passed = (dup_total == 0) if t == "is_unique" else (dup_total > 0)
        elif t == "row_count":
            exp_n = a.params.get("expected_count", a.expected)
            mn, mx = a.params.get("min_count"), a.params.get("max_count")
            n = df.count()
            actual = n
            passed = (
                (exp_n is None or n == exp_n)
                and (mn is None or n >= mn)
                and (mx is None or n <= mx)
            )
            expected = {"expected_count": exp_n, "min_count": mn, "max_count": mx}
        elif t == "column_count":
            exp_n = a.params.get("expected_count", a.expected)
            mn, mx = a.params.get("min_count"), a.params.get("max_count")
            n = len(df.columns)
            actual = n
            passed = (
                (exp_n is None or n == exp_n)
                and (mn is None or n >= mn)
                and (mx is None or n <= mx)
            )
            expected = {"expected_count": exp_n, "min_count": mn, "max_count": mx}
        elif t in ("schema_match", "schema_matches"):
            passed, expected, actual = _check_schema(a, df)
        elif t == "custom":
            res = a.custom_function(df)  # type: ignore[misc]
            if isinstance(res, Mapping):
                passed = bool(res.get("passed"))
                actual = res.get("actual")
                msg = str(res.get("message", msg))
            else:
                passed = bool(res)
        else:
            raise ValueError(f"unknown assertion type {t!r}")

        return AssertionOutcome(
            assertion_type=t, passed=passed, expected=expected, actual=actual, message=msg
        )
    except SparkAssertionError:
        raise
    except Exception as e:  # assertion machinery failed → failed outcome
        return AssertionOutcome(
            assertion_type=t, passed=False, expected=a.expected,
            actual=None, message=msg, error=str(e),
        )


def _check_schema(a: TestAssertion, df: DataFrame) -> tuple[bool, Any, Any]:
    """schema_matches (reference engine.py:977-1032): expected_columns
    presence (ordered or not), allow_extra_columns, expected_types
    (substring match on Spark simpleString types)."""
    exp = a.expected if isinstance(a.expected, Mapping) else {}
    p = {**exp, **a.params}
    expected_columns = list(p.get("expected_columns", []))
    expected_types = dict(p.get("expected_types", {}))
    strict_order = bool(p.get("strict_order", False))
    allow_extra = bool(p.get("allow_extra_columns", True))

    actual_cols = list(df.columns)
    actual_types = dict(df.dtypes)
    issues: list[str] = []
    if strict_order:
        for i in range(min(len(expected_columns), len(actual_cols))):
            if expected_columns[i] != actual_cols[i]:
                issues.append(
                    f"column {i}: expected {expected_columns[i]!r}, got {actual_cols[i]!r}"
                )
        if len(actual_cols) < len(expected_columns):
            issues.append(f"missing columns: {expected_columns[len(actual_cols):]}")
    else:
        missing = sorted(set(expected_columns) - set(actual_cols))
        if missing:
            issues.append(f"missing columns: {missing}")
    if not allow_extra:
        extra = sorted(set(actual_cols) - set(expected_columns))
        if extra:
            issues.append(f"extra columns: {extra}")
    for col, want in expected_types.items():
        if col in actual_types and str(want).lower() not in actual_types[col].lower():
            issues.append(f"column {col!r}: expected type {want!r}, got {actual_types[col]!r}")
    return (
        not issues,
        {"columns": expected_columns, "types": expected_types},
        {"columns": actual_cols, "types": actual_types, "issues": issues},
    )


# ---------------------------------------------------------------------------
# fluent API

class ColumnExpectation:
    """Column-scoped fluent assertions; every check is one Spark job."""

    def __init__(self, parent: "Expectation", column: str):
        self._p = parent
        self._c = column

    def _run(self, a: TestAssertion) -> "ColumnExpectation":
        self._p._raise_if_failed(run_assertion(a, self._p.df, self._p.max_rows))
        return self

    def is_unique(self, message: str | None = None) -> "ColumnExpectation":
        return self._run(TestAssertion("is_unique", params={"column": self._c}, message=message))

    def has_no_nulls(self, message: str | None = None) -> "ColumnExpectation":
        nulls = self._p.df.where(F.col(self._c).isNull()).limit(1).count()
        if nulls:
            raise SparkAssertionError(message or f"column {self._c!r} contains NULLs")
        return self

    def in_range(self, lo: Any = None, hi: Any = None, message: str | None = None) -> "ColumnExpectation":
        return self._run(TestAssertion(
            "in_range", params={"column": self._c, "min": lo, "max": hi}, message=message))

    def matches_regex(self, pattern: str, message: str | None = None) -> "ColumnExpectation":
        return self._run(TestAssertion(
            "matches_regex", expected=pattern, params={"column": self._c}, message=message))

    def is_in(self, values: Sequence[Any], message: str | None = None) -> "ColumnExpectation":
        viol = (
            self._p.df
            .where(F.col(self._c).isNotNull() & ~F.col(self._c).isin(list(values)))
            .limit(1).count()
        )
        if viol:
            raise SparkAssertionError(
                message or f"column {self._c!r} has values outside {list(values)!r}")
        return self

    def expect(self) -> "Expectation":
        """Back to the frame-level builder."""
        return self._p


class Expectation:
    """Fluent, chainable DataFrame expectations (the Spark counterpart of
    the reference's assert_that builder, testing/assertions.py:147-246).
    Raises SparkAssertionError on the first failure."""

    def __init__(self, df: DataFrame, max_rows: int = DEFAULT_MAX_ROWS):
        self.df = df
        self.max_rows = max_rows
        self._message: str | None = None

    def with_message(self, message: str) -> "Expectation":
        self._message = message
        return self

    def _raise_if_failed(self, out: AssertionOutcome) -> None:
        if not out.passed:
            detail = f" ({out.error})" if out.error else ""
            raise SparkAssertionError(
                f"{self._message or out.message}: expected {out.expected!r}, "
                f"actual {out.actual!r}{detail}"
            )
        self._message = None

    def _run(self, a: TestAssertion) -> "Expectation":
        self._raise_if_failed(run_assertion(a, self.df, self.max_rows))
        return self

    # frame shape ------------------------------------------------------
    def row_count(self, equals: int | None = None, at_least: int | None = None,
                  at_most: int | None = None) -> "Expectation":
        return self._run(TestAssertion("row_count", params={
            "expected_count": equals, "min_count": at_least, "max_count": at_most,
        }, message=self._message))

    def column_count(self, equals: int) -> "Expectation":
        return self._run(TestAssertion(
            "column_count", params={"expected_count": equals}, message=self._message))

    def is_empty(self) -> "Expectation":
        return self._run(TestAssertion("is_empty", message=self._message))

    def is_not_empty(self) -> "Expectation":
        return self._run(TestAssertion("is_not_empty", message=self._message))

    def schema_matches(self, columns: Sequence[str] | None = None,
                       types: Mapping[str, str] | None = None,
                       strict_order: bool = False,
                       allow_extra_columns: bool = True) -> "Expectation":
        return self._run(TestAssertion("schema_matches", params={
            "expected_columns": list(columns or []),
            "expected_types": dict(types or {}),
            "strict_order": strict_order,
            "allow_extra_columns": allow_extra_columns,
        }, message=self._message))

    # content ----------------------------------------------------------
    def equals(self, expected: Any, ignore_order: bool = True,
               tolerance: float | None = None) -> "Expectation":
        return self._run(TestAssertion(
            "equals", expected=expected, ignore_order=ignore_order,
            tolerance=tolerance, message=self._message))

    def not_equals(self, expected: Any) -> "Expectation":
        return self._run(TestAssertion("not_equals", expected=expected, message=self._message))

    def contains(self, row_or_value: Any) -> "Expectation":
        return self._run(TestAssertion("contains", expected=row_or_value, message=self._message))

    def not_contains(self, row_or_value: Any) -> "Expectation":
        return self._run(TestAssertion("not_contains", expected=row_or_value, message=self._message))

    def query_equals(self, other: DataFrame, tolerance: float | None = None) -> "Expectation":
        """Set-equality of two frames as DISTRIBUTED anti-joins — no
        collect, works at any size (the scale-safe form of equals).

        ``tolerance`` snaps float columns to multiples of the tolerance
        before comparing (floor(v/tol + 0.5)·tol): values within ~tol/2 of
        the same grid point compare equal. Grid snapping (any engine's
        finite-precision comparison works this way) can disagree with
        exact |a−b|<=tol near grid boundaries — choose a tolerance one
        order finer than the differences you care about."""
        if tolerance is not None:
            snapped = lambda d: d.select(  # noqa: E731
                *[(F.floor(F.col(c) / F.lit(tolerance) + F.lit(0.5))
                   * F.lit(tolerance)).alias(c)
                  if t in ("double", "float") else F.col(c)
                  for c, t in d.dtypes])
            a, b = snapped(self.df), snapped(other)
        else:
            a, b = self.df, other
        a_minus_b = a.exceptAll(b).limit(1).count()
        b_minus_a = b.exceptAll(a).limit(1).count()
        if a_minus_b or b_minus_a:
            raise SparkAssertionError(
                self._message or "query_equals: result sets differ "
                f"(left-only rows: {bool(a_minus_b)}, right-only rows: {bool(b_minus_a)})")
        self._message = None
        return self

    # scalar -----------------------------------------------------------
    def scalar(self) -> Any:
        """Extract the single-cell value (for python-side asserts)."""
        return _scalar(self.df)

    def scalar_equals(self, expected: Any, tolerance: float | None = None) -> "Expectation":
        return self._run(TestAssertion(
            "equals", expected=expected, tolerance=tolerance, message=self._message))

    def satisfies(self, fn: Callable[[DataFrame], Any]) -> "Expectation":
        return self._run(TestAssertion("custom", custom_function=fn, message=self._message))

    def column(self, name: str) -> ColumnExpectation:
        return ColumnExpectation(self, name)


def expect(df: DataFrame, max_rows: int = DEFAULT_MAX_ROWS) -> Expectation:
    """Start a fluent expectation chain over a DataFrame."""
    return Expectation(df, max_rows)
