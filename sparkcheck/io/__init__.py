from sparkcheck.io.config import load_ruleset_yaml, load_rulesets
from sparkcheck.io.sources import (
    generated_fixture,
    inline_fixture,
    read_table,
)
from sparkcheck.io.sinks import write_report_json, write_violations

__all__ = [
    "load_ruleset_yaml",
    "load_rulesets",
    "read_table",
    "inline_fixture",
    "generated_fixture",
    "write_violations",
    "write_report_json",
]
