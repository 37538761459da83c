from sparkcheck.textstats.analysis import (
    STOPWORDS,
    cross_doc_span_stats,
    remove_duplicate_spans,
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
from sparkcheck.textstats.lm import (
    perplexity_buckets,
    perplexity_scores,
    train_ngram_counts,
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
    "remove_duplicate_spans",
    "span_contamination",
    "duplicate_segment_stats",
    "rolling_fingerprints",
    "token_stats",
    "winnow_near_duplicates",
    "PII_PATTERNS",
    "pii_stats",
    "pii_redact",
    "train_ngram_counts",
    "perplexity_scores",
    "perplexity_buckets",
]
