from sparkcheck.drift.compare import ProfileDelta, compare_profiles
from sparkcheck.drift.stats import (
    chi2_drift,
    chi2_from_counts,
    chi2_pvalue,
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
    "chi2_drift",
    "chi2_from_counts",
    "chi2_pvalue",
]
