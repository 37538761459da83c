"""io: YAML config loader (env interpolation, rule factories), sources."""

from __future__ import annotations

import os

import pytest

from sparkcheck.io import generated_fixture, inline_fixture, load_rulesets
from sparkcheck.rules import (
    EnumRule,
    RangeRule,
    ReferentialIntegrityRule,
    RuleSet,
    Severity,
    UniqueRule,
)

CFG = {
    "rule_sets": [
        {
            "name": "users_checks",
            "table": "users",
            "fail_fast": True,
            "rules": [
                {"name": "email_format", "type": "regex", "column": "email",
                 "pattern": "[^@]+@[^@]+", "severity": "warning"},
                {"name": "age_range", "type": "range", "column": "age",
                 "min": 0, "max": 120},
                {"name": "status_enum", "type": "enum", "column": "status",
                 "values": ["active", "inactive"], "case_sensitive": False},
                {"name": "pk", "type": "unique", "columns": ["id"]},
                {"name": "fk", "type": "referential_integrity",
                 "child_table": "orders", "child_column": "user_id",
                 "parent_table": "users", "parent_column": "id",
                 "max_violations": 3},
                {"name": "complete", "type": "completeness", "columns": ["id", "email"]},
            ],
        }
    ]
}


def test_load_rulesets_factories():
    rs = load_rulesets(CFG)["users_checks"]
    assert isinstance(rs, RuleSet) and rs.fail_fast
    by = {r.name: r for r in rs.rules}
    assert by["email_format"].severity == Severity.WARNING
    assert isinstance(by["age_range"], RangeRule) and by["age_range"].max_value == 120
    assert isinstance(by["status_enum"], EnumRule) and not by["status_enum"].case_sensitive
    assert isinstance(by["pk"], UniqueRule) and by["pk"].key_columns == ("id",)
    fk = by["fk"]
    assert isinstance(fk, ReferentialIntegrityRule) and fk.max_violations == 3


def test_env_interpolation(monkeypatch):
    monkeypatch.setenv("MIN_AGE", "18")
    cfg = {
        "rule_sets": [{
            "name": "x",
            "rules": [{"name": "r", "type": "regex", "column": "c",
                       "pattern": "${MIN_AGE}"},
                      {"name": "d", "type": "regex", "column": "c",
                       "pattern": "${MISSING_VAR:fallback}"}],
        }]
    }
    rs = load_rulesets(cfg)["x"]
    by = {r.name: r for r in rs.rules}
    assert by["r"].pattern == "18"
    assert by["d"].pattern == "fallback"


def test_env_interpolation_missing_raises():
    cfg = {"rule_sets": [{"name": "x", "rules": [
        {"name": "r", "type": "regex", "column": "c", "pattern": "${NOPE_NOT_SET}"}]}]}
    with pytest.raises(KeyError):
        load_rulesets(cfg)


def test_inline_yaml_code_rejected():
    cfg = {"rule_sets": [{"name": "x", "rules": [
        {"name": "c", "type": "custom", "column": "v", "function": "evil"}]}]}
    with pytest.raises(KeyError, match="unregistered"):
        load_rulesets(cfg)


def test_generated_fixture_deterministic(spark):
    spec = {"id": "id", "amount": "double", "email": "email",
            "seg": "category:a|b|c"}
    a = generated_fixture(spark, 100, spec, num_partitions=2).collect()
    b = generated_fixture(spark, 100, spec, num_partitions=5).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert all(r["email"].endswith("@example.com") for r in a)
    assert {r["seg"] for r in a} <= {"a", "b", "c"}


def test_inline_fixture(spark):
    df = inline_fixture(spark, [{"id": 1, "v": "x"}, {"id": 2, "v": None}],
                        schema="id int, v string")
    assert df.count() == 2 and df.columns == ["id", "v"]
