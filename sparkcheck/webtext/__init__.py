from sparkcheck.webtext.generate import webtext_table, PLANTED, webtext_rules
from sparkcheck.webtext.hosts import host_stats, url_host
from sparkcheck.webtext.urls import canonicalize_url, url_dedup_stats

__all__ = [
    "webtext_table",
    "PLANTED",
    "webtext_rules",
    "host_stats",
    "url_host",
    "canonicalize_url",
    "url_dedup_stats",
]
