"""Property tests: the vectorized rule compiler reproduces the
REFERENCE's per-row Python semantics on arbitrary data.

The checker below reimplements field_validator/validator.py's per-value
logic verbatim (re.match left-anchor, float() coercion ⇒ violation on
failure, len(str(v)), NULL-skip contract) and hypothesis drives random
value columns through both paths. This is the strongest form of the
survey's "golden matrix" test: not one planted fixture, but the whole
input space (within strategy bounds).
"""

from __future__ import annotations

import math
import re

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sparkcheck.compile import summary_df
from sparkcheck.rules.models import (
    EnumRule,
    LengthRule,
    NullCheckRule,
    RangeRule,
    RegexRule,
)

# values a webtext-ish string column can hold (avoid surrogates — parquet
# round-trip is out of scope here; Spark createDataFrame handles these)
VALUES = st.one_of(
    st.none(),
    st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF), max_size=12),
    st.sampled_from(["", " ", "abc", "ABC", "a@b.co", "123", "-4.5", "nan", "inf",
                     "1e3", "0x10", " 7 ", "None", "true"]),
)

COLUMNS = st.lists(VALUES, min_size=1, max_size=25)


def ref_regex(vals, pattern):
    """validator.py:192-227: skip None; re.match(pattern, str(v))."""
    ev = vi = 0
    rex = re.compile(pattern)
    for v in vals:
        if v is None:
            continue
        ev += 1
        if not rex.match(str(v)):
            vi += 1
    return ev, vi


def ref_range(vals, lo, hi):
    """validator.py:229-287: skip None; float() failure ⇒ violation;
    inclusive bounds. NOTE: Spark try_cast('double') accepts the same
    lexical space as float() for these strategies (no underscores or
    locale forms generated)."""
    ev = vi = 0
    for v in vals:
        if v is None:
            continue
        ev += 1
        try:
            f = float(v)
            # float('nan') parses but compares false to any bound ⇒ violation
            ok = (not math.isnan(f)) and lo <= f <= hi
        except (TypeError, ValueError):
            ok = False
        if not ok:
            vi += 1
    return ev, vi


def ref_length(vals, lo, hi):
    ev = vi = 0
    for v in vals:
        if v is None:
            continue
        ev += 1
        if not (lo <= len(str(v)) <= hi):
            vi += 1
    return ev, vi


def ref_null(vals):
    return len(vals), sum(1 for v in vals if v is None)


def ref_enum(vals, allowed, case_sensitive):
    ev = vi = 0
    for v in vals:
        if v is None:
            continue
        ev += 1
        s = str(v)
        hit = s in allowed if case_sensitive else s.lower() in {a.lower() for a in allowed}
        if not hit:
            vi += 1
    return ev, vi


RULES = [
    RegexRule(name="r", column="v", pattern="a"),
    RegexRule(name="r2", column="v", pattern=r"[0-9]+$"),
    RangeRule(name="g", column="v", min_value=-1.0, max_value=100.0),
    LengthRule(name="l", column="v", min_length=1, max_length=3),
    NullCheckRule(name="n", column="v"),
    EnumRule(name="e", column="v", allowed_values=("abc", "123")),
    EnumRule(name="ei", column="v", allowed_values=("ABC",), case_sensitive=False),
]


def reference_counts(vals):
    return {
        "r": ref_regex(vals, "a"),
        "r2": ref_regex(vals, r"[0-9]+$"),
        "g": ref_range(vals, -1.0, 100.0),
        "l": ref_length(vals, 1, 3),
        "n": ref_null(vals),
        "e": ref_enum(vals, ("abc", "123"), True),
        "ei": ref_enum(vals, ("ABC",), False),
    }


@pytest.fixture(scope="module")
def sess(spark):
    return spark


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(vals=COLUMNS)
def test_compiler_matches_reference_semantics(sess, vals):
    df = sess.createDataFrame([(v,) for v in vals], "v string")
    got = {
        r["rule_id"]: (r["evaluated"], r["violations"])
        for r in summary_df(df, RULES).collect()
    }
    want = reference_counts(vals)
    assert got == want, f"vals={vals!r}"


# ---------------------------------------------------------------------------
# assertion engine vs a pure-python reimplementation (assertions/engine.py
# data-shaped subset: row_count, in_range, is_unique, contains, equals)

ASSERT_VALUES = st.one_of(
    st.none(),
    st.integers(min_value=-1000, max_value=1000),
)


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(vals=st.lists(ASSERT_VALUES, min_size=1, max_size=30),
       lo=st.integers(min_value=-500, max_value=0),
       hi=st.integers(min_value=1, max_value=500),
       probe=st.integers(min_value=-1000, max_value=1000))
def test_assertion_engine_matches_python_semantics(spark, vals, lo, hi, probe):
    from sparkcheck.testing import TestAssertion, run_assertion

    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)],
                               "idx int, v int")
    nn = [v for v in vals if v is not None]

    out = run_assertion(TestAssertion(
        "row_count", params={"expected_count": len(vals)}), df)
    assert out.passed and out.error is None

    want_in_range = bool(nn) and all(lo <= v <= hi for v in nn)
    got = run_assertion(TestAssertion(
        "in_range", params={"column": "v", "min": lo, "max": hi}), df)
    assert got.passed is want_in_range, (vals, lo, hi, got.as_dict())

    dup = len(nn) - len(set(nn))
    got_u = run_assertion(TestAssertion("is_unique", params={"column": "v"}), df)
    assert got_u.passed is (dup == 0), (vals, got_u.as_dict())

    got_c = run_assertion(TestAssertion("contains", expected={"v": probe}), df)
    assert got_c.passed is (probe in nn), (vals, probe, got_c.as_dict())

    expected_rows = [{"idx": i, "v": v} for i, v in enumerate(vals)]
    got_e = run_assertion(TestAssertion(
        "equals", expected=list(reversed(expected_rows)), ignore_order=True), df)
    assert got_e.passed, got_e.as_dict()
