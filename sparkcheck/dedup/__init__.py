from sparkcheck.dedup.exact import drop_exact_duplicates, exact_duplicate_groups
from sparkcheck.dedup.jaccard import jaccard_for_pairs, jaccard_pairs, shingles
from sparkcheck.dedup.minhash import (
    append_to_band_index,
    compact_band_index,
    band_assignments,
    candidate_pairs_from_bands,
    incremental_near_duplicates,
    lsh_candidate_pairs,
    minhash_near_duplicates,
    minhash_signatures,
    write_band_index,
)
from sparkcheck.dedup.simhash import simhash, simhash_near_duplicates
from sparkcheck.dedup.embedding import auto_lsh_params, embedding_near_duplicates
from sparkcheck.dedup.canonical import drop_duplicates_keep_best, keep_best_per_group
from sparkcheck.dedup.clusters import connected_components, duplicate_clusters
from sparkcheck.dedup.pipeline import dedup_corpus, ingest_batch

__all__ = [
    "drop_exact_duplicates",
    "exact_duplicate_groups",
    "shingles",
    "jaccard_for_pairs",
    "jaccard_pairs",
    "minhash_signatures",
    "band_assignments",
    "candidate_pairs_from_bands",
    "lsh_candidate_pairs",
    "incremental_near_duplicates",
    "write_band_index",
    "append_to_band_index",
    "compact_band_index",
    "minhash_near_duplicates",
    "simhash",
    "simhash_near_duplicates",
    "auto_lsh_params",
    "embedding_near_duplicates",
    "keep_best_per_group",
    "drop_duplicates_keep_best",
    "connected_components",
    "duplicate_clusters",
    "dedup_corpus",
    "ingest_batch",
]
