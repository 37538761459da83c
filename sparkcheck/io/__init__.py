from sparkcheck.io.config import load_ruleset_yaml, load_rulesets
from sparkcheck.io.sources import (
    generated_fixture,
    inline_fixture,
    read_table,
)
from sparkcheck.io.sinks import write_report_json, write_violations
from sparkcheck.io.bucketed import colocated_join, write_bucketed
from sparkcheck.io.html_report import render_validation_html, write_validation_html

__all__ = [
    "load_ruleset_yaml",
    "load_rulesets",
    "read_table",
    "inline_fixture",
    "generated_fixture",
    "write_violations",
    "write_report_json",
    "write_bucketed",
    "colocated_join",
    "render_validation_html",
    "write_validation_html",
]
