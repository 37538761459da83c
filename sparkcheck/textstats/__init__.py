from sparkcheck.textstats.analysis import (
    STOPWORDS,
    fingerprint,
    lang_id,
    quality_score,
    rolling_fingerprints,
    token_stats,
)

__all__ = [
    "STOPWORDS",
    "fingerprint",
    "lang_id",
    "quality_score",
    "rolling_fingerprints",
    "token_stats",
]
