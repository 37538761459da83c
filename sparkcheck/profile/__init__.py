from sparkcheck.profile.models import ColumnStatistics, TableProfile
from sparkcheck.profile.merge import merge_profiles
from sparkcheck.profile.sketches import merge_ndv_sketches, ndv_sketches
from sparkcheck.profile.schema import SchemaDiff, schema_matches, schema_report
from sparkcheck.profile.embeddings import (
    embedding_dim_profile,
    embedding_profile,
    embedding_violations,
)
from sparkcheck.profile.profiler import (
    PATTERNS,
    fused_histograms,
    histogram,
    pattern_examples,
    pattern_match_rates,
    profile_table,
    top_k,
    top_k_all,
)

__all__ = [
    "ColumnStatistics",
    "embedding_dim_profile",
    "embedding_profile",
    "embedding_violations",
    "TableProfile",
    "profile_table",
    "histogram",
    "top_k",
    "top_k_all",
    "fused_histograms",
    "pattern_examples",
    "pattern_match_rates",
    "PATTERNS",
    "merge_profiles",
    "ndv_sketches",
    "merge_ndv_sketches",
    "SchemaDiff",
    "schema_matches",
    "schema_report",
]
