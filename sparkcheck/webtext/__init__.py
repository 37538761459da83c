from sparkcheck.webtext.generate import webtext_table, PLANTED, webtext_rules
from sparkcheck.webtext.hosts import (
    filter_by_host_reputation,
    host_reputation,
    host_stats,
    url_host,
)
from sparkcheck.webtext.urls import canonicalize_url, url_dedup_stats
from sparkcheck.webtext.report import corpus_report, render_corpus_html

__all__ = [
    "webtext_table",
    "PLANTED",
    "webtext_rules",
    "filter_by_host_reputation",
    "host_reputation",
    "host_stats",
    "url_host",
    "canonicalize_url",
    "url_dedup_stats",
    "corpus_report",
    "render_corpus_html",
]
