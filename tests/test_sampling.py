"""sampling.py — deterministic sampling / dataset mixing / sequence
packing goldens."""

from pyspark.sql import functions as F

from sparkcheck.sampling import (
    deterministic_sample,
    hex_threshold,
    pack_sequences,
    stratified_sample,
)


def test_hex_threshold_edges():
    assert hex_threshold(0.0) == "0" * 32
    assert hex_threshold(1.0) == "g" * 32  # above every hex digest
    assert hex_threshold(0.5) == "8" + "0" * 31
    assert hex_threshold(2.0) == "g" * 32 and hex_threshold(-1) == "0" * 32


def test_deterministic_sample_reproducible_and_calibrated(spark):
    """The SAME rows are kept at any partitioning (no per-partition RNG
    state), and the kept fraction lands near the rate."""
    df = spark.range(4000).withColumnRenamed("id", "doc_id")
    kept1 = sorted(r["doc_id"] for r in deterministic_sample(df, 0.3).collect())
    kept2 = sorted(
        r["doc_id"]
        for r in deterministic_sample(df.repartition(17), 0.3).collect()
    )
    assert kept1 == kept2
    assert 0.25 <= len(kept1) / 4000 <= 0.35
    # a different seed draws a genuinely different subset
    kept3 = sorted(r["doc_id"] for r in deterministic_sample(df, 0.3, seed=2).collect())
    assert kept3 != kept1 and 0.25 <= len(kept3) / 4000 <= 0.35


def test_null_ids_dropped_not_blocked(spark):
    """NULL-id rows null-propagate through the sampling hash (F.concat,
    not concat_ws) and are DROPPED at any rate — matching the oracle's
    'seed|' || CAST(NULL) semantics — rather than all hashing to
    md5('seed|') and being kept/dropped as one block."""
    rows = [(i,) for i in range(100)] + [(None,)] * 10
    df = spark.createDataFrame(rows, "doc_id long")
    for rate in (0.2, 0.9):
        kept = deterministic_sample(df, rate).collect()
        assert all(r["doc_id"] is not None for r in kept)


def test_stratified_sample_rates_and_null_default(spark):
    rows = [(i, ["en", "de", None][i % 3]) for i in range(3000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = stratified_sample(
        df, {"en": 1.0, "de": 0.2}, strata_col="lang", default_rate=0.0
    )
    by_lang = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert by_lang.get("en") == 1000          # rate 1.0 keeps every en row
    assert 120 <= by_lang.get("de", 0) <= 280  # rate 0.2 of 1000
    assert None not in by_lang                 # default 0.0 drops NULL strata


def test_pack_sequences_golden_and_straddle(spark):
    """Concat-then-chunk: offsets are the exclusive prefix sum within
    the shard; a doc can straddle the budget boundary (it starts in the
    sequence its start offset falls into — the standard LM packing
    layout); NULL token counts occupy zero length."""
    rows = [
        (1, "a", 3000), (2, "a", 3000),  # doc 2 starts at 3000, straddles 4096
        (3, "a", None), (4, "a", 100),   # doc 3 zero-length at 6000
        (5, "b", 5000), (6, "b", 1),     # shard b independent; doc 5 > budget
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n long")
    got = {
        r["doc_id"]: (r["seq_id"], r["seq_offset"])
        for r in pack_sequences(df, "n", 4096, shard_col="lang").collect()
    }
    assert got[1] == (0, 0)
    assert got[2] == (0, 3000)
    assert got[3] == (1, 6000 - 4096)
    assert got[4] == (1, 6000 - 4096)
    assert got[5] == (0, 0)
    assert got[6] == (1, 5000 - 4096)

    # guards: zero/negative budgets and reserved-column collisions fail
    # loudly up front instead of DIVIDE_BY_ZERO mid-job / ambiguous refs
    import pytest as _pytest
    with _pytest.raises(ValueError, match="budget"):
        pack_sequences(df, "n", 0)
    with _pytest.raises(ValueError, match="seq_id"):
        pack_sequences(pack_sequences(df, "n", 4096), "n", 4096)


def test_stratified_sample_mixed_type_strata(spark):
    """Mixed-type strata keys (int quality buckets next to string
    sources) must not TypeError in the CASE-chain sort."""
    rows = [(i, str(i % 2) if i % 3 else None) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, bucket string")
    out = stratified_sample(df, {0: 0.0, "1": 1.0, "0": 1.0},
                            strata_col="bucket", default_rate=0.5)
    assert out.count() > 0  # construction didn't raise; chain applied
