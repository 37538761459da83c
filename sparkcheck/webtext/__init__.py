from sparkcheck.webtext.generate import webtext_table, PLANTED, webtext_rules
from sparkcheck.webtext.hosts import host_stats, url_host

__all__ = ["webtext_table", "PLANTED", "webtext_rules", "host_stats", "url_host"]
