from sparkcheck.textstats.analysis import (
    STOPWORDS,
    fingerprint,
    gopher_quality_flags,
    lang_id,
    quality_score,
    rolling_fingerprints,
    token_stats,
)

__all__ = [
    "STOPWORDS",
    "fingerprint",
    "gopher_quality_flags",
    "lang_id",
    "quality_score",
    "rolling_fingerprints",
    "token_stats",
]
