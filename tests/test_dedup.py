"""Golden tests for the dedup family: exact, n-gram Jaccard,
MinHash+LSH, SimHash, embedding-cosine — planted duplicates at known
positions ⇒ exact expected pair sets."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparkcheck.dedup import (
    drop_exact_duplicates,
    embedding_near_duplicates,
    exact_duplicate_groups,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_near_duplicates,
    minhash_signatures,
    simhash,
    simhash_near_duplicates,
)


@pytest.fixture(scope="module")
def docs(spark):
    near = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        (0, "alpha beta gamma delta epsilon zeta eta theta"),
        (1, "alpha beta gamma delta epsilon zeta eta theta"),     # exact dup of 0
        (2, near),
        (3, near.replace("lazy", "sleepy")),                       # near dup of 2
        (4, "completely unrelated text about spark shuffles and joins"),
        (5, None),                                                 # null exempt
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_duplicate_groups(docs):
    groups = exact_duplicate_groups(docs).collect()
    assert len(groups) == 1
    g = groups[0]
    assert (g["n_copies"], g["first_id"], g["last_id"]) == (2, 0, 1)


def test_drop_exact_duplicates(docs):
    kept = sorted(r["doc_id"] for r in drop_exact_duplicates(docs).collect())
    assert kept == [0, 2, 3, 4]  # keeps min id 0, drops 1 and the null row


def test_jaccard_pairs(docs):
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
             jaccard_pairs(docs, k=3, threshold=0.3).collect()}
    assert pairs[(0, 1)] == 1.0
    assert (2, 3) in pairs and 0.3 <= pairs[(2, 3)] < 1.0
    assert not any(4 in p for p in pairs)


def test_minhash_signature_shape_and_determinism(docs):
    sigs = minhash_signatures(docs, num_hashes=8)
    assert [c for c in sigs.columns if c.startswith("mh_")] == [f"mh_{i}" for i in range(8)]
    a = {r["id"]: tuple(r[f"mh_{i}"] for i in range(8)) for r in sigs.collect()}
    b = {r["id"]: tuple(r[f"mh_{i}"] for i in range(8)) for r in sigs.collect()}
    assert a == b
    assert a[0] == a[1]  # identical docs → identical signatures


def test_minhash_lsh_pipeline(docs):
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
             minhash_near_duplicates(docs, num_hashes=8, rows_per_band=2,
                                     threshold=0.3).collect()}
    assert (0, 1) in pairs  # identical docs always share every band
    for (a, b) in pairs:
        assert (a, b) != (0, 4) and (a, b) != (2, 4)


def test_lsh_max_bucket_drops_hot_buckets(spark):
    same = [(i, "x y z w v u t s") for i in range(10)]
    df = spark.createDataFrame(same, ["doc_id", "text"])
    sigs = minhash_signatures(df, num_hashes=4)
    all_pairs = lsh_candidate_pairs(sigs, num_hashes=4, rows_per_band=2).count()
    capped = lsh_candidate_pairs(sigs, num_hashes=4, rows_per_band=2, max_bucket=5).count()
    assert all_pairs == 45 and capped == 0


def test_simhash_near_duplicates_banded_matches_exact(docs):
    exact = {(r["id_a"], r["id_b"]): r["hamming"] for r in
             simhash_near_duplicates(docs, bits=16, max_hamming=3, banded=False).collect()}
    band = {(r["id_a"], r["id_b"]): r["hamming"] for r in
            simhash_near_duplicates(docs, bits=16, max_hamming=3, banded=True).collect()}
    assert band == exact  # pigeonhole banding loses nothing
    assert exact[(0, 1)] == 0


def test_simhash_bits_are_binary(docs):
    rows = simhash(docs, bits=8).collect()
    for r in rows:
        for i in range(8):
            assert r[f"bit_{i}"] in (0, 1)


@pytest.fixture(scope="module")
def vecs(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.999, 0.04, 0.0, 0.0]),   # near dup of 0
        (2, [0.0, 1.0, 0.0, 0.0]),      # orthogonal
        (3, [-1.0, 0.0, 0.0, 0.0]),     # opposite
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_embedding_near_duplicates_exact(vecs):
    pairs = {(r["id_a"], r["id_b"]): r["cosine"] for r in
             embedding_near_duplicates(vecs, threshold=0.95).collect()}
    assert list(pairs) == [(0, 1)]
    assert pairs[(0, 1)] > 0.99


def test_embedding_near_duplicates_banded_finds_near_dup(vecs):
    """Banded random-hyperplane LSH recovers the planted near-dup pair:
    at cosine ≈ 0.9992 nearly every hyperplane sign agrees, so the pair
    shares a band with overwhelming (and, given fixed seed,
    deterministic) probability."""
    pairs = {(r["id_a"], r["id_b"]) for r in
             embedding_near_duplicates(vecs, threshold=0.95, bucketed=True,
                                       dim=4, bands=8, bits=4).collect()}
    assert pairs == {(0, 1)}


def test_embedding_banded_matches_exact_on_candidates(spark):
    """Banded-path cosines must equal the exact path's values on every
    pair the LSH surfaces (the prefilter may drop pairs, never alter
    values)."""
    import math

    rows = []
    for i in range(30):
        base = [math.cos(i * 0.11), math.sin(i * 0.11), 0.3, -0.2]
        rows.append((i, base))
        rows.append((100 + i, [x + 0.001 * ((i % 3) - 1) for x in base]))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    exact = {(r["id_a"], r["id_b"]): r["cosine"] for r in
             embedding_near_duplicates(df, threshold=0.9).collect()}
    banded = {(r["id_a"], r["id_b"]): r["cosine"] for r in
              embedding_near_duplicates(df, threshold=0.9, bucketed=True,
                                        dim=4, bands=4, bits=8).collect()}
    assert banded, "LSH should surface at least the planted near-dups"
    for pair, cos in banded.items():
        assert exact[pair] == cos


def test_embedding_hot_bucket_cap_bounds_candidates(spark):
    """Skewed-sign corpus (every vector in the same orthant — the shape
    that made the old fixed sign-bucket quadratic): with max_bucket the
    candidate count is bounded by bands * cap² / 2 instead of n²/2."""
    from sparkcheck.dedup.embedding import embedding_candidate_pairs

    n = 200
    rows = [(i, [1.0 + (i % 7) * 0.01, 2.0 + (i % 5) * 0.01,
                 3.0, 4.0]) for i in range(n)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    capped = embedding_candidate_pairs(
        df, dim=4, bands=4, bits=4, max_bucket=10
    ).count()
    uncapped = embedding_candidate_pairs(
        df, dim=4, bands=4, bits=4, max_bucket=None
    ).count()
    # identical-orthant vectors all land in the same bucket per band →
    # uncapped is ~n²/2; the cap drops those hot buckets entirely
    assert uncapped > n * (n - 1) / 4
    assert capped <= 4 * 10 * 9 / 2


def test_jaccard_for_pairs_matches_allpairs(docs):
    """Pair-restricted verify must equal the all-pairs result restricted
    to the same pairs (the scale fix must not change values)."""
    from sparkcheck.dedup import jaccard_for_pairs

    spark = docs.sparkSession
    full = {(r["id_a"], r["id_b"]): r["jaccard"]
            for r in jaccard_pairs(docs, threshold=0.0).collect()}
    assert full, "fixture should produce at least one pair"
    pairs = spark.createDataFrame(sorted(full), ["id_a", "id_b"])
    restricted = {(r["id_a"], r["id_b"]): r["jaccard"]
                  for r in jaccard_for_pairs(docs, pairs, threshold=0.0).collect()}
    assert restricted == full
    # and a proper subset of pairs returns exactly that subset
    some = sorted(full)[:2]
    sub = spark.createDataFrame(some, ["id_a", "id_b"])
    got = {(r["id_a"], r["id_b"]): r["jaccard"]
           for r in jaccard_for_pairs(docs, sub, threshold=0.0).collect()}
    assert got == {p: full[p] for p in some}


def test_jaccard_for_pairs_zero_intersection_dropped(spark):
    df = spark.createDataFrame(
        [(0, "aa bb cc dd"), (1, "ee ff gg hh")], ["doc_id", "text"])
    pairs = spark.createDataFrame([(0, 1)], ["id_a", "id_b"])
    from sparkcheck.dedup import jaccard_for_pairs
    assert jaccard_for_pairs(df, pairs, threshold=0.0).count() == 0


def test_keep_best_per_group(spark):
    from sparkcheck.dedup import drop_duplicates_keep_best, keep_best_per_group

    rows = [
        (1, "g1", 10), (2, "g1", 30), (3, "g1", 30),   # tie on 30 -> min id 2
        (4, "g2", 5),                                   # singleton
        (5, "g3", 7), (6, "g3", 2),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "grp", "q"])
    got = {r["group_key"]: (r["kept_id"], r["best_quality"], r["group_size"])
           for r in keep_best_per_group(df, "grp", "q").collect()}
    assert got == {"g1": (2, 30, 3), "g2": (4, 5, 1), "g3": (5, 7, 2)}
    kept = {r["doc_id"] for r in
            drop_duplicates_keep_best(df, "grp", "q").collect()}
    assert kept == {2, 4, 5}


def test_jaccard_for_pairs_duplicate_pair_rows_safe(docs):
    """Duplicated candidate-pair rows must not inflate jaccard."""
    from sparkcheck.dedup import jaccard_for_pairs

    spark = docs.sparkSession
    pairs_once = spark.createDataFrame([(0, 1)], ["id_a", "id_b"])
    pairs_dup = spark.createDataFrame([(0, 1), (0, 1)], ["id_a", "id_b"])
    j1 = jaccard_for_pairs(docs, pairs_once, threshold=0.0).collect()
    j2 = jaccard_for_pairs(docs, pairs_dup, threshold=0.0).collect()
    assert [tuple(r) for r in j1] == [tuple(r) for r in j2]
    assert j1[0]["jaccard"] == 1.0  # docs 0 and 1 are exact dups


# ---------------------------------------------------------------------------
# duplicate clusters (connected components over near-dup pairs)

def test_connected_components_golden(spark):
    """Hand-checked components: chain 1-2-3, pair 10-11, isolated pairs
    never merge across components; labels are the component minimum."""
    from sparkcheck.dedup import connected_components

    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23)],
        "id_a long, id_b long",
    )
    cc = {r["id"]: r["cluster"] for r in connected_components(pairs).collect()}
    assert cc == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10,
                  20: 20, 21: 20, 22: 20, 23: 20}


def test_duplicate_clusters_summary(spark):
    from sparkcheck.dedup import duplicate_clusters

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (7, 8)], "id_a long, id_b long"
    )
    rows = {r["cluster"]: r for r in duplicate_clusters(pairs).collect()}
    assert rows[1]["size"] == 3 and rows[1]["member_ids"] == [1, 2, 3]
    assert rows[7]["size"] == 2 and rows[7]["member_ids"] == [7, 8]


def test_connected_components_long_chain_converges(spark):
    """A 30-vertex chain needs ~29 plain-propagation rounds — must
    converge under a raised bound and label everything with the min."""
    from pyspark.sql import functions as F
    from sparkcheck.dedup import connected_components

    chain = spark.range(29).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b"))
    cc = connected_components(chain, max_iter=40).collect()
    assert all(r["cluster"] == 0 for r in cc) and len(cc) == 30


def test_dedup_corpus_end_to_end(spark):
    """Full pipeline: exact dups collapse, a 3-doc near-dup cluster
    keeps its highest-quality member, unique docs pass untouched."""
    from pyspark.sql import functions as F
    from sparkcheck.dedup import dedup_corpus

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = [
        (1, base + " one", 0.5),
        (2, base + " two", 0.9),        # near-dups of each other
        (3, base + " three", 0.7),
        (4, base + " one", 0.1),        # EXACT duplicate of doc 1's text
        (5, "completely different words with no overlap at all here", 0.2),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string, quality double")
    out = dedup_corpus(df, quality_col="quality", threshold=0.5,
                       num_hashes=8, rows_per_band=2)
    kept = sorted(r["doc_id"] for r in out.collect())
    # 4 dropped as exact dup of 1; {1,2,3} cluster -> keep 2 (quality .9)
    assert kept == [2, 5]
    # without a quality column: minimum id survives the cluster
    out2 = dedup_corpus(df, threshold=0.5, num_hashes=8, rows_per_band=2)
    assert sorted(r["doc_id"] for r in out2.collect()) == [1, 5]
