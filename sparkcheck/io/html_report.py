"""Self-contained HTML report — the compact analog of the reference's
reporting/generators/html_generator.py (907 LoC of Chart.js dashboards).

Driver-side rendering over already-collected summaries (never touches
row data), so it costs nothing at any scale. Zero external assets: one
HTML file with inline CSS and pure-HTML bar meters, viewable anywhere.
"""

from __future__ import annotations

import html
import time
from typing import Any

_CSS = """
body{font-family:system-ui,sans-serif;margin:2rem;color:#1a1a2e}
h1{font-size:1.4rem} h2{font-size:1.1rem;margin-top:2rem}
table{border-collapse:collapse;width:100%;font-size:0.9rem}
th,td{text-align:left;padding:.4rem .6rem;border-bottom:1px solid #ddd}
th{background:#f4f4f8} .pass{color:#0a7a3d;font-weight:600}
.fail{color:#b3261e;font-weight:600}
.bar{background:#e8e8ef;border-radius:3px;height:10px;min-width:120px}
.bar>div{background:#b3261e;height:10px;border-radius:3px}
.meta{color:#666;font-size:.85rem}
"""


def _bar(rate: float) -> str:
    pct = max(0.0, min(rate * 100.0, 100.0))
    return f'<div class="bar"><div style="width:{pct:.2f}%"></div></div>'


def render_validation_html(report: Any, title: str = "sparkcheck report") -> str:
    """Render a ValidationReport (run/engine.py) to one HTML page."""
    rows = []
    for o in report.outcomes:
        status = '<span class="pass">PASS</span>' if o.passed else '<span class="fail">FAIL</span>'
        rate = (o.violations / o.evaluated) if o.evaluated else 0.0
        rows.append(
            "<tr>"
            f"<td>{html.escape(o.rule_id)}</td><td>{html.escape(o.table)}</td>"
            f"<td>{html.escape(o.column)}</td><td>{status}</td>"
            f"<td>{o.violations:,}</td><td>{o.evaluated:,}</td>"
            f"<td>{_bar(rate)}</td><td>{o.elapsed_sec:.2f}s</td>"
            "</tr>"
        )
    verdict = ('<span class="pass">SUITE PASSED</span>' if report.passed
               else '<span class="fail">SUITE FAILED</span>')
    return f"""<!doctype html><html><head><meta charset="utf-8">
<title>{html.escape(title)}</title><style>{_CSS}</style></head><body>
<h1>{html.escape(title)} — {verdict}</h1>
<p class="meta">ruleset {html.escape(report.ruleset)} ·
{len(report.outcomes)} rules · {report.total_violations:,} violations ·
{report.elapsed_sec:.2f}s · generated {time.strftime('%Y-%m-%d %H:%M:%S UTC', time.gmtime())}</p>
<h2>Rule outcomes</h2>
<table><tr><th>rule</th><th>table</th><th>column</th><th>status</th>
<th>violations</th><th>evaluated</th><th>rate</th><th>time</th></tr>
{''.join(rows)}
</table></body></html>"""


def write_validation_html(report: Any, path: str, title: str = "sparkcheck report") -> None:
    with open(path, "w") as f:
        f.write(render_validation_html(report, title))
