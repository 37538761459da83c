"""Test-run reporting: JUnit XML for CI systems + a suite HTML page.

The reference's CI/CD integration consumes JUnit `test-results.xml`
artifacts (sql_testing/ci_cd_integration.py:220-359,663) and its
TestReportGenerator renders suite dashboards
(sql_testing/reporting.py:109-516). Spark-side both are driver-only
rendering over SuiteResult objects — zero cost at any data scale.
"""

from __future__ import annotations

import html
import time
from typing import Iterable
from xml.sax.saxutils import escape, quoteattr

from sparkcheck.testing.models import SuiteResult, TestStatus


def suite_to_junit_xml(results: "SuiteResult | Iterable[SuiteResult]") -> str:
    """Standard JUnit XML: one <testsuite> per SuiteResult, one
    <testcase> per test; failed assertions become <failure>, execution
    errors <error>, skips <skipped> — the artifact shape every CI system
    ingests (reference ci_cd_integration.py emits/collects exactly this
    file)."""
    suites = [results] if isinstance(results, SuiteResult) else list(results)
    parts = ['<?xml version="1.0" encoding="UTF-8"?>', "<testsuites>"]
    for s in suites:
        parts.append(
            f"<testsuite name={quoteattr(s.suite_name)} tests={quoteattr(str(s.total_tests))} "
            f"failures={quoteattr(str(s.failed_tests))} errors={quoteattr(str(s.error_tests))} "
            f"skipped={quoteattr(str(s.skipped_tests))} time={quoteattr(f'{s.execution_time:.3f}')}>"
        )
        for r in s.test_results:
            parts.append(
                f"<testcase name={quoteattr(r.test_name)} classname={quoteattr(s.suite_name)} "
                f"time={quoteattr(f'{r.execution_time:.3f}')}>"
            )
            if r.status == TestStatus.FAILED:
                failed = [a for a in r.assertion_results if not a.passed]
                msg = "; ".join(
                    f"{a.assertion_type}: expected {a.expected!r}, actual {a.actual!r}"
                    for a in failed
                ) or "assertion failed"
                parts.append(f"<failure message={quoteattr(msg)}>{escape(msg)}</failure>")
            elif r.status == TestStatus.ERROR:
                msg = r.error_message or "error"
                parts.append(f"<error message={quoteattr(msg)}>{escape(msg)}</error>")
            elif r.status == TestStatus.SKIPPED:
                parts.append(
                    f"<skipped message={quoteattr(r.error_message or 'skipped')}/>"
                )
            parts.append("</testcase>")
        parts.append("</testsuite>")
    parts.append("</testsuites>")
    return "".join(parts)


def write_junit_xml(results: "SuiteResult | Iterable[SuiteResult]", path: str) -> None:
    with open(path, "w") as f:
        f.write(suite_to_junit_xml(results))


def render_suite_html(result: SuiteResult, title: str | None = None) -> str:
    """Suite dashboard page (reference sql_testing/reporting.py:187-460):
    per-test status, assertion counts, timings. Self-contained."""
    from sparkcheck.io.html_report import _CSS  # shared styling

    title = title or f"sparkcheck tests — {result.suite_name}"
    rows = []
    for r in result.test_results:
        badge = {
            TestStatus.PASSED: '<span class="pass">PASS</span>',
            TestStatus.FAILED: '<span class="fail">FAIL</span>',
            TestStatus.ERROR: '<span class="fail">ERROR</span>',
            TestStatus.SKIPPED: "<span>SKIP</span>",
        }.get(r.status, str(r.status))
        n_pass = sum(1 for a in r.assertion_results if a.passed)
        detail = html.escape(r.error_message or "")
        if r.status == TestStatus.FAILED:
            detail = "; ".join(
                html.escape(f"{a.assertion_type}: expected {a.expected!r}, actual {a.actual!r}")
                for a in r.assertion_results if not a.passed
            )
        rows.append(
            f"<tr><td>{html.escape(r.test_name)}</td><td>{badge}</td>"
            f"<td>{n_pass}/{len(r.assertion_results)}</td>"
            f"<td>{r.execution_time:.2f}s</td><td>{detail}</td></tr>"
        )
    verdict = ('<span class="pass">SUITE PASSED</span>'
               if result.failed_tests + result.error_tests == 0
               else '<span class="fail">SUITE FAILED</span>')
    return f"""<!doctype html><html><head><meta charset="utf-8">
<title>{html.escape(title)}</title><style>{_CSS}</style></head><body>
<h1>{html.escape(title)} — {verdict}</h1>
<p class="meta">{result.passed_tests}/{result.total_tests} passed ·
{result.skipped_tests} skipped · {result.error_tests} errors ·
{result.execution_time:.2f}s · success rate {result.success_rate:.0%} ·
generated {time.strftime('%Y-%m-%d %H:%M:%S UTC', time.gmtime())}</p>
<table><tr><th>test</th><th>status</th><th>assertions</th><th>time</th>
<th>detail</th></tr>{''.join(rows)}</table></body></html>"""
