from sparkcheck.textstats.analysis import (
    STOPWORDS,
    fingerprint,
    gopher_quality_flags,
    lang_id,
    quality_score,
    rolling_fingerprints,
    token_stats,
)
from sparkcheck.textstats.pii import PII_PATTERNS, pii_redact, pii_stats

__all__ = [
    "STOPWORDS",
    "fingerprint",
    "gopher_quality_flags",
    "lang_id",
    "quality_score",
    "rolling_fingerprints",
    "token_stats",
    "PII_PATTERNS",
    "pii_stats",
    "pii_redact",
]
