"""PII detection + redaction over a text column — the scrubbing stage
every training-data pipeline runs before corpus release.

Re-uses the reference's pattern-detection regex FAMILY
(profiler/analyzer.py:21-50) but UNANCHORED (find inside free text, not
whole-value match) and restricted to patterns whose match semantics are
identical between regex engines (no ambiguous optional-prefix chains):
email, SSN, IPv4, and a fixed-format US phone.

Both ops are pure Column pipelines — map-only projections, zero Python,
zero shuffle; at 10^12 docs they scale linearly with partitions:

- ``pii_stats``  — per-doc match counts per PII class + any_pii flag
  (the audit/verdict path; feed it to a rules threshold).
- ``pii_redact`` — chained regexp_replace producing the scrubbed text
  (the materialization path; md5 of the output makes redaction
  byte-verifiable against an oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# Unanchored, engine-portable (same matches under Java regex and RE2):
# fixed character classes, no alternation-order ambiguity.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ssn": r"[0-9]{3}-[0-9]{2}-[0-9]{4}",
    "phone_us": r"\([0-9]{3}\) [0-9]{3}-[0-9]{4}",
    "ip_address": r"([0-9]{1,3}\.){3}[0-9]{1,3}",
}


def pii_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, n_email, n_ssn, n_phone_us, n_ip_address, n_pii_total,
    any_pii) — one map-only pass; NULL text skipped (engine NULL-skip
    contract)."""
    t = F.col(text_col)
    counts = {
        # regexp_count ≡ size(regexp_extract_all(...)): same
        # non-overlapping-match count, no per-row match-array build
        name: F.regexp_count(t, F.lit(pat)).cast("long")
        for name, pat in PII_PATTERNS.items()
    }
    total = None
    for c in counts.values():
        total = c if total is None else total + c
    return df.where(t.isNotNull()).select(
        F.col(id_col),
        *[counts[name].alias(f"n_{name}") for name in PII_PATTERNS],
        total.alias("n_pii_total"),
        (total > 0).cast("int").alias("any_pii"),
    )


def pii_redact(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    replacement: str = "[PII]",
) -> DataFrame:
    """(id, redacted_text, redacted_md5): every PII match replaced by
    ``replacement``. Patterns apply in the fixed PII_PATTERNS order
    (deterministic composition — email first so its host part can't be
    half-eaten by the ip pattern). md5 makes the output byte-verifiable."""
    t = F.col(text_col)
    red = t
    for pat in PII_PATTERNS.values():
        red = F.regexp_replace(red, pat, replacement)
    return df.where(t.isNotNull()).select(
        F.col(id_col),
        red.alias("redacted_text"),
        F.md5(red).alias("redacted_md5"),
    )
