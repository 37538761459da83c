"""CLI lifecycle tests (the reference's §3 entry points, pattern 4 of
SURVEY §5 — but in-process via main(argv) to reuse the session)."""

from __future__ import annotations

import json

import pytest

from sparkcheck.cli import main

DOCS = "/root/testdata/sf0.001/documents.parquet"


def test_cli_profile_validate_drift_roundtrip(spark, tmp_path):
    prof = str(tmp_path / "prof.json")
    assert main(["profile", "--table", DOCS, "--out", prof]) == 0
    p = json.load(open(prof))
    assert p["total_rows"] > 0 and "text" in p["columns"]

    rules = tmp_path / "rules.yaml"
    rules.write_text(
        "rule_sets:\n"
        "  - name: docs\n"
        "    table: documents\n"
        "    rules:\n"
        "      - {name: nn, type: null_check, column: text}\n"
        "      - {name: bad_enum, type: enum, column: lang, values: [xx]}\n"
    )
    rep = str(tmp_path / "rep.json")
    rc = main(["validate", "--table", DOCS, "--rules", str(rules), "--out", rep])
    assert rc == 2  # bad_enum fails ⇒ CI-gate exit code
    r = json.load(open(rep))
    assert r["outcomes"] and any(not o["passed"] for o in r["outcomes"])

    drift = str(tmp_path / "drift.json")
    assert main(["drift", "--table", DOCS, "--baseline", prof, "--out", drift]) == 0
    assert json.load(open(drift))["drifted_columns"] == []
