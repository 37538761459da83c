from sparkcheck.webtext.generate import webtext_table, PLANTED, webtext_rules

__all__ = ["webtext_table", "PLANTED", "webtext_rules"]
