from sparkcheck.textstats.analysis import (
    STOPWORDS,
    cross_doc_span_stats,
    span_contamination,
    duplicate_segment_stats,
    fingerprint,
    gopher_quality_flags,
    lang_id,
    quality_score,
    repetition_stats,
    rolling_fingerprints,
    token_stats,
    winnow_near_duplicates,
)
from sparkcheck.textstats.pii import PII_PATTERNS, pii_redact, pii_stats

__all__ = [
    "STOPWORDS",
    "fingerprint",
    "gopher_quality_flags",
    "lang_id",
    "quality_score",
    "repetition_stats",
    "cross_doc_span_stats",
    "span_contamination",
    "duplicate_segment_stats",
    "rolling_fingerprints",
    "token_stats",
    "winnow_near_duplicates",
    "PII_PATTERNS",
    "pii_stats",
    "pii_redact",
]
