from sparkcheck.drift.compare import ProfileDelta, compare_profiles
from sparkcheck.drift.stats import (
    histogram_fractions,
    ks_from_binned,
    ks_from_quantiles,
    ks_statistic,
    psi,
    psi_from_counts,
)

__all__ = [
    "ProfileDelta",
    "compare_profiles",
    "psi",
    "psi_from_counts",
    "ks_statistic",
    "ks_from_binned",
    "ks_from_quantiles",
    "histogram_fractions",
]
