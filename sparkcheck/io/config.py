"""YAML rule-config loader.

Mirrors the reference's two config surfaces in one unified schema:
field-validation rule sets (field_validator/config.py:36-104, typed
factories :140-302) and business-rule sets (business_rules/
config_loader.py:40-90) including ``${ENV}`` interpolation
(config_loader.py:287-338, with ``${VAR:default}`` support).

Deliberately NOT supported: inline Python source in YAML (the
reference's custom_validations.function, examples/configs/
validations.yaml:140-155). Executing config-supplied code is an
injection hazard; custom rules must be registered named functions
(pass ``custom_registry``).

Example:

    rule_sets:
      - name: users_checks
        table: users
        fail_fast: false
        rules:
          - {name: email_format, type: regex, column: email, pattern: "...", severity: warning}
          - {name: age_range, type: range, column: age, min: 0, max: 120}
          - {name: status_enum, type: enum, column: status, values: [a, b]}
          - {name: pk, type: unique, columns: [id]}
          - {name: orders_fk, type: referential_integrity,
             child_table: orders, child_column: customer_id,
             parent_table: users, parent_column: id}
          - {name: complete, type: completeness, columns: [id, email]}
          - {name: custom_sql, type: sql, sql: "SELECT ... violation_count ..."}
"""

from __future__ import annotations

import os
import re
from typing import Any, Callable, Mapping

import yaml

from sparkcheck.rules.models import (
    CompletenessRule,
    CustomRule,
    DataTypeRule,
    EnumRule,
    LengthRule,
    NullCheckRule,
    RangeRule,
    ReferentialIntegrityRule,
    RegexRule,
    Rule,
    RuleSet,
    Severity,
    SqlRule,
    UniqueRule,
)

_ENV_RE = re.compile(r"\$\{([A-Za-z_][A-Za-z0-9_]*)(?::([^}]*))?\}")
_INCLUDE_RE = re.compile(r"^\s*!include\s+[\"']?([^\"'\n]+?)[\"']?\s*$", re.MULTILINE)


class IncludeError(ValueError):
    pass


def load_yaml_with_includes(path: str, _stack: tuple[str, ...] = (), _root: str | None = None) -> Any:
    """Load a YAML file processing whole-line ``!include other.yaml``
    directives (reference business_rules/config_loader.py:235-285
    semantics: textual substitution of the included document, circular-
    include detection). Path-traversal-safe: includes resolve relative to
    the INCLUDING file and must stay under the root file's directory —
    absolute paths and ``..`` escapes are rejected."""
    apath = os.path.realpath(path)
    root = _root or os.path.dirname(apath)
    if apath in _stack:
        chain = " -> ".join([*_stack, apath])
        raise IncludeError(f"circular include detected: {chain}")
    with open(apath, encoding="utf-8") as f:
        content = f.read()

    def _sub(m: re.Match) -> str:
        inc = m.group(1).strip()
        if os.path.isabs(inc):
            raise IncludeError(f"absolute !include paths are not allowed: {inc!r}")
        resolved = os.path.realpath(os.path.join(os.path.dirname(apath), inc))
        if not (resolved + os.sep).startswith(root + os.sep) and resolved != root:
            raise IncludeError(
                f"!include {inc!r} escapes the config root {root!r}")
        data = load_yaml_with_includes(resolved, (*_stack, apath), root)
        return yaml.safe_dump(data or {}, default_flow_style=False, indent=2)

    content = _INCLUDE_RE.sub(_sub, content)
    return yaml.safe_load(content)


def _interp(val: Any) -> Any:
    """${VAR} / ${VAR:default} environment interpolation, recursive."""
    if isinstance(val, str):
        def sub(m: re.Match) -> str:
            name, default = m.group(1), m.group(2)
            v = os.environ.get(name)
            if v is None:
                if default is not None:
                    return default
                raise KeyError(f"environment variable {name!r} not set and no default")
            return v
        return _ENV_RE.sub(sub, val)
    if isinstance(val, list):
        return [_interp(v) for v in val]
    if isinstance(val, dict):
        return {k: _interp(v) for k, v in val.items()}
    return val


def _common(d: Mapping[str, Any]) -> dict[str, Any]:
    out: dict[str, Any] = {"name": d["name"]}
    if "severity" in d:
        out["severity"] = Severity(d["severity"])
    if "depends_on" in d:
        out["depends_on"] = tuple(d["depends_on"])
    if "enabled" in d:
        out["enabled"] = bool(d["enabled"])
    if "expected_violations" in d:
        out["expected_violations"] = d["expected_violations"]
    if "max_violations" in d:
        out["max_violations"] = d["max_violations"]
    return out


def rule_from_dict(
    d: Mapping[str, Any],
    custom_registry: Mapping[str, Callable] | None = None,
) -> Rule:
    t = d["type"]
    c = _common(d)
    if t == "regex":
        return RegexRule(column=d["column"], pattern=d["pattern"],
                         case_insensitive=d.get("case_insensitive", False), **c)
    if t == "range":
        return RangeRule(column=d["column"], min_value=d.get("min"),
                         max_value=d.get("max"), inclusive=d.get("inclusive", True), **c)
    if t == "length":
        return LengthRule(column=d["column"], min_length=d.get("min_length"),
                          max_length=d.get("max_length"),
                          exact_length=d.get("exact_length"), **c)
    if t in ("null_check", "not_null"):
        return NullCheckRule(column=d["column"], allow_null=d.get("allow_null", False), **c)
    if t == "enum":
        return EnumRule(column=d["column"], allowed_values=tuple(d["values"]),
                        case_sensitive=d.get("case_sensitive", True), **c)
    if t == "data_type":
        return DataTypeRule(column=d["column"], expected_type=d["expected_type"], **c)
    if t == "unique":
        cols = tuple(d.get("columns", ())) or (d["column"],)
        return UniqueRule(column=cols[0], columns=cols, **c)
    if t == "completeness":
        return CompletenessRule(required_columns=tuple(d["columns"]), **c)
    if t == "referential_integrity":
        return ReferentialIntegrityRule(
            child_table=d["child_table"], child_column=d["child_column"],
            parent_table=d["parent_table"], parent_column=d["parent_column"],
            broadcast_parent=d.get("broadcast_parent"), **c)
    if t == "sql":
        return SqlRule(sql=d["sql"], **c)
    if t == "custom":
        fname = d["function"]
        registry = custom_registry or {}
        if fname not in registry:
            raise KeyError(
                f"custom rule {d['name']!r} references unregistered function "
                f"{fname!r} — inline YAML code is not executed by design"
            )
        return CustomRule(column=d["column"], func=registry[fname], func_name=fname, **c)
    raise ValueError(f"unknown rule type {t!r}")


def load_rulesets(
    data: Mapping[str, Any],
    custom_registry: Mapping[str, Callable] | None = None,
) -> dict[str, RuleSet]:
    data = _interp(dict(data))
    out: dict[str, RuleSet] = {}
    for rs in data.get("rule_sets", []):
        rules = tuple(rule_from_dict(r, custom_registry) for r in rs.get("rules", []))
        out[rs["name"]] = RuleSet(
            name=rs["name"], rules=rules,
            description=rs.get("description", ""),
            fail_fast=rs.get("fail_fast", False),
            max_concurrent=rs.get("max_concurrent", 4),
            table=rs.get("table", ""),
        )
    return out


def load_ruleset_yaml(
    path: str,
    custom_registry: Mapping[str, Callable] | None = None,
) -> dict[str, RuleSet]:
    return load_rulesets(load_yaml_with_includes(path), custom_registry)
