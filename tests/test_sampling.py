"""sampling.py — deterministic sampling / dataset mixing / sequence
packing goldens."""

import pytest
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


def test_sample_to_budget_rates_shortfall_and_mass(spark):
    """budget_rates derives rate = min(1, budget/total): an over-asked
    stratum caps at 1.0 with a documented shortfall; realized token
    mass lands within the sampling quantization bound of the budget;
    un-budgeted strata drop entirely."""
    from sparkcheck.sampling import budget_rates, sample_to_budget

    rows = [(i, "a", 10) for i in range(2000)]          # 20k tokens
    rows += [(10_000 + i, "b", 10) for i in range(50)]  # 500 tokens
    rows += [(20_000 + i, "c", 10) for i in range(100)]  # no budget
    df = spark.createDataFrame(rows, "doc_id long, src string, n_tok long")

    budgets = {"a": 8000, "b": 5000}
    rates = budget_rates(df, budgets, "n_tok", "src")
    assert rates["a"]["total_tokens"] == 20000 and rates["a"]["shortfall"] == 0
    assert rates["a"]["rate"] == 8000 / 20000
    # over-asked: everything kept, shortfall documented
    assert rates["b"] == {"total_tokens": 500, "rate": 1.0, "shortfall": 4500}

    out = sample_to_budget(df, budgets, "n_tok", "src", seed=3)
    by_src = {r["src"]: (r["n"], r["tok"]) for r in
              out.groupBy("src").agg(F.count("*").alias("n"),
                                     F.sum("n_tok").alias("tok")).collect()}
    assert "c" not in by_src                      # un-budgeted ⇒ dropped
    assert by_src["b"] == (50, 500)               # rate 1.0 keeps all
    n_a, tok_a = by_src["a"]
    # Bernoulli(0.4) over 2000 docs of 10 tokens: 5 sigma ≈ 1100 tokens
    assert abs(tok_a - 8000) < 1100 and tok_a == n_a * 10

    # deterministic: the same call selects the same rows
    again = sorted(r["doc_id"] for r in
                   sample_to_budget(df, budgets, "n_tok", "src", seed=3)
                   .select("doc_id").collect())
    assert again == sorted(r["doc_id"] for r in out.select("doc_id").collect())


def test_pack_spans_reconstructs_every_doc_and_tiles_sequences(spark):
    """Property pins for the manifest: per doc, takes are contiguous
    from 0 and sum to its length (straddling docs included); per
    sequence, slices tile [0, budget) exactly except each shard's
    final sequence; zero-length docs appear once with take_len 0."""
    from sparkcheck.sampling import pack_spans

    rows = [(1, "s", 70), (2, "s", 50), (3, "s", 260),   # 3 straddles twice
            (4, "s", 0), (5, "s", 20),
            (10, "t", 100), (11, "t", 100), (12, "t", 1)]
    df = spark.createDataFrame(rows, "doc_id long, shard string, n_tok long")
    spans = pack_spans(df, "n_tok", budget=100, shard_col="shard").collect()

    lengths = dict((r[0], r[2]) for r in rows)
    by_doc = {}
    for r in spans:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(lengths)
    for doc, takes in by_doc.items():
        takes.sort(key=lambda r: r["take_from"])
        assert takes[0]["take_from"] == 0
        pos = 0
        for t in takes:
            assert t["take_from"] == pos
            pos += t["take_len"]
        assert pos == lengths[doc]
    # doc 3 (260 tokens starting at offset 20 of seq 1) straddles:
    # 80 in seq 1, 100 in seq 2, 80 in seq 3
    d3 = sorted((r["seq_id"], r["seq_pos"], r["take_from"], r["take_len"])
                for r in by_doc[3])
    assert d3 == [(1, 20, 0, 80), (2, 0, 80, 100), (3, 0, 180, 80)]
    # zero-length doc 4 appears once, take_len 0, at the stream's
    # current offset (70+50+260 = 380 ⇒ seq 3, pos 80)
    assert [(r["take_len"], r["seq_id"], r["seq_pos"]) for r in by_doc[4]] \
        == [(0, 3, 80)]

    # sequences tile: every non-final sequence per shard is exactly full
    per_seq = {}
    for r in spans:
        key = (r["shard"], r["seq_id"])
        per_seq[key] = per_seq.get(key, 0) + r["take_len"]
    for shard in ("s", "t"):
        seqs = sorted(k[1] for k in per_seq if k[0] == shard)
        for sq in seqs[:-1]:
            assert per_seq[(shard, sq)] == 100, (shard, sq)
        assert per_seq[(shard, seqs[-1])] <= 100


def test_pack_manifest_grouped_matches_spans(spark):
    """pack_manifest is the grouped view of pack_spans: entries are
    ordered by position, seq_tokens is the filled length."""
    from sparkcheck.sampling import pack_manifest, pack_spans

    rows = [(i, "s", 35 + (i % 4) * 17) for i in range(1, 30)]
    df = spark.createDataFrame(rows, "doc_id long, shard string, n_tok long")
    man = pack_manifest(df, "n_tok", budget=128, shard_col="shard").collect()
    spans = pack_spans(df, "n_tok", budget=128, shard_col="shard").collect()

    flat = {}
    for r in spans:
        flat.setdefault(r["seq_id"], []).append(
            (r["seq_pos"], r["doc_id"], r["take_from"], r["take_len"]))
    for m in man:
        want = sorted(flat[m["seq_id"]])
        got = [(e["seq_pos"], e["doc_id"], e["take_from"], e["take_len"])
               for e in m["entries"]]
        assert got == want
        assert m["seq_tokens"] == sum(e[3] for e in want)
        # entries cover the sequence contiguously from 0
        pos = 0
        for e in got:
            assert e[0] == pos
            pos += e[3]


def test_deterministic_shuffle_permutation_properties(spark):
    """Seeded global shuffle: (shard_id, shard_pos) is a permutation —
    every input row appears once, positions are dense per shard — and
    it is REPRODUCIBLE at any partitioning (the df.orderBy(rand())
    failure mode this op exists to avoid)."""
    from sparkcheck.sampling import deterministic_shuffle

    df = spark.range(2000).withColumnRenamed("id", "doc_id")
    out = deterministic_shuffle(df, num_shards=8, seed=3)
    rows = out.collect()
    assert sorted(r["doc_id"] for r in rows) == list(range(2000))
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard_id"], []).append(r["shard_pos"])
    assert set(by_shard) <= set(range(8))
    for positions in by_shard.values():
        assert sorted(positions) == list(range(len(positions)))
    # shards are balanced-ish (uniform hash mod 8 over 2000 ids)
    sizes = [len(v) for v in by_shard.values()]
    assert min(sizes) > 150 and max(sizes) < 350

    again = deterministic_shuffle(df.repartition(17), num_shards=8, seed=3)
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again.collect()))

    # a different seed yields a genuinely different permutation
    other = deterministic_shuffle(df, num_shards=8, seed=4)
    assert sorted(map(tuple, rows)) != sorted(map(tuple, other.collect()))

    # the permutation is not the identity order within shards: some
    # shard's position order must disagree with doc_id order
    scrambled = any(
        [r["doc_id"] for r in sorted(rows, key=lambda r: r["shard_pos"])
         if r["shard_id"] == s]
        != sorted(r["doc_id"] for r in rows if r["shard_id"] == s)
        for s in by_shard
    )
    assert scrambled


def test_deterministic_shuffle_guards(spark):
    import pytest

    from sparkcheck.sampling import deterministic_shuffle

    df = spark.range(10).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError, match="num_shards"):
        deterministic_shuffle(df, num_shards=0)
    with pytest.raises(ValueError, match="shard_id"):
        deterministic_shuffle(df.withColumn("shard_id", F.lit(1)), num_shards=2)
    # NULL ids dropped: no stable identity => no stable position
    withnull = spark.createDataFrame(
        [(1,), (2,), (None,)], "doc_id long")
    got = deterministic_shuffle(withnull, num_shards=2).collect()
    assert sorted(r["doc_id"] for r in got) == [1, 2]


def test_assemble_sequences_string_reconstructs_stream(spark):
    """Concatenating seq_content in seq_id order reproduces the shard's
    doc stream byte-for-byte; every sequence but the last is exactly
    budget units."""
    from sparkcheck.sampling import assemble_sequences

    docs = [(i, "en", chr(ord("a") + i) * (3 + 2 * i)) for i in range(6)]
    df = spark.createDataFrame(docs, "doc_id long, lang string, text string")
    out = assemble_sequences(df, "text", budget=7, shard_col="lang")
    rows = sorted(out.collect(), key=lambda r: r["seq_id"])
    stream = "".join(r["seq_content"] for r in rows)
    assert stream == "".join(t for _, _, t in docs)
    for r in rows[:-1]:
        assert r["seq_tokens"] == 7 and len(r["seq_content"]) == 7
    assert rows[-1]["seq_tokens"] == len(stream) % 7 or len(stream) % 7 == 0
    assert all(len(r["seq_content"]) == r["seq_tokens"] for r in rows)


def test_assemble_sequences_array_token_ids(spark):
    """ARRAY content packs token ids the same way: flattened sequences
    reproduce the id stream, boundaries slice arrays mid-doc."""
    from sparkcheck.sampling import assemble_sequences

    docs = [(i, list(range(i * 10, i * 10 + 4 + i))) for i in range(5)]
    df = spark.createDataFrame(docs, "doc_id long, toks array<int>")
    out = assemble_sequences(df, "toks", budget=5)
    rows = sorted(out.collect(), key=lambda r: r["seq_id"])
    flat = [t for r in rows for t in r["seq_content"]]
    assert flat == [t for _, toks in docs for t in toks]
    assert all(len(r["seq_content"]) == r["seq_tokens"] for r in rows)
    assert all(r["seq_tokens"] == 5 for r in rows[:-1])


def test_assemble_sequences_zero_length_docs_are_identity(spark):
    from sparkcheck.sampling import assemble_sequences

    df = spark.createDataFrame(
        [(1, "aaa"), (2, ""), (3, "bbbb")], "doc_id long, text string")
    rows = sorted(assemble_sequences(df, "text", budget=4).collect(),
                  key=lambda r: r["seq_id"])
    assert "".join(r["seq_content"] for r in rows) == "aaabbbb"


def test_repeat_to_budget_epochs_remainder_and_caps(spark):
    """Over-asked budgets REPEAT: full_epochs = B // T plus a
    deterministic remainder sample; max_epochs caps passes with a
    documented shortfall; copies carry a 0-based epoch column; NULL
    ids and un-budgeted strata drop; the whole realization is
    map-only (no Exchange)."""
    import hashlib

    from sparkcheck.sampling import epoch_plan, repeat_to_budget

    rows = [(i, "a", 10) for i in range(100)]            # T=1000
    rows += [(10_000 + i, "b", 10) for i in range(100)]  # T=1000
    rows += [(20_000 + i, "c", 10) for i in range(10)]   # no budget
    # NULL id under an UN-budgeted stratum: totals are token MASS and
    # id-independent (same contract as sample_to_budget), so a NULL-id
    # row in a budgeted stratum would count toward its total while
    # never being emitted — keep the fixture's totals clean
    rows += [(None, "c", 10)]
    df = spark.createDataFrame(rows, "doc_id long, src string, n_tok long")

    budgets = {"a": 2500, "b": 400}
    plan = epoch_plan(df, budgets, "n_tok", "src")
    assert plan["a"] == {
        "total_tokens": 1000, "full_epochs": 2,
        "remainder_rate": 0.5, "shortfall": 0,
    }
    assert plan["b"]["full_epochs"] == 0
    assert plan["b"]["remainder_rate"] == 0.4

    out = repeat_to_budget(df, budgets, "n_tok", "src", seed=3)
    rowsb = out.where(F.col("src") == "b").collect()
    assert all(r.epoch == 0 for r in rowsb)  # partial pass only

    # per-doc copy counts in 'a': 2 or 3, epochs contiguous from 0,
    # and the 3-copy set IS the 52-bit remainder selection
    got = {}
    for r in out.where(F.col("src") == "a").collect():
        got.setdefault(r.doc_id, []).append(r.epoch)
    assert set(got) == set(range(100))  # every doc ≥ full epochs
    thr = 0.5 * 2.0**52
    for doc_id, epochs in got.items():
        h = int(hashlib.md5(f"3|{doc_id}".encode()).hexdigest()[:13], 16)
        expect = 3 if h < thr else 2
        assert sorted(epochs) == list(range(expect)), doc_id

    # realized mass: 'a' = 2 full epochs + ~half of one
    tok_a = sum(10 * len(e) for e in got.values())
    assert abs(tok_a - 2500) < 400

    # NULL id and un-budgeted stratum never appear
    assert out.where(F.col("doc_id").isNull()).count() == 0
    assert out.where(F.col("src") == "c").count() == 0

    # max_epochs cap: 'a' would need 2.5 passes; cap at 2 ⇒ no
    # remainder, shortfall 500
    plan2 = epoch_plan(df, budgets, "n_tok", "src", max_epochs=2)
    assert plan2["a"] == {
        "total_tokens": 1000, "full_epochs": 2,
        "remainder_rate": 0.0, "shortfall": 500,
    }
    out2 = repeat_to_budget(df, budgets, "n_tok", "src", max_epochs=2)
    assert out2.where(F.col("src") == "a").count() == 200

    # map-only after the planning agg
    plan_str = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan_str


def test_select_top_by_budget_threshold_and_boundary(spark):
    """High-score bins are kept WHOLE top-down until the budget;
    exactly one boundary bin keeps a deterministic hash fraction;
    everything below drops; degenerate (constant-score) input falls
    back to a plain rate sample; realization is map-only after the
    two planning aggs."""
    import hashlib

    from sparkcheck.sampling import select_top_by_budget

    # three well-separated score plateaus, 100 docs x 10 tokens each
    rows = [(i, 0.9, 10) for i in range(100)]
    rows += [(1000 + i, 0.5, 10) for i in range(100)]
    rows += [(2000 + i, 0.1, 10) for i in range(100)]
    rows += [(None, 0.9, 10), (3000, None, 10), (3001, 0.9, None)]
    df = spark.createDataFrame(rows, "doc_id long, score double, n_tok long")

    # budget 1500: top plateau (1000) whole, middle is the boundary
    # (rate 0.5), bottom drops; NULL score/token/id rows never appear
    out = select_top_by_budget(df, 1500, "score", "n_tok", seed=3)
    got = sorted(r.doc_id for r in out.collect())
    top = [i for i in range(100)]
    assert [i for i in got if i < 1000] == top
    assert not [i for i in got if i >= 2000]
    mid = [i for i in got if 1000 <= i < 2000]
    thr = 0.5 * 2.0**52
    expect_mid = [
        i for i in range(1000, 1100)
        if int(hashlib.md5(f"3|{i}".encode()).hexdigest()[:13], 16) < thr
    ]
    assert mid == expect_mid

    # budget >= total mass: everything (with non-NULL fields) kept
    assert select_top_by_budget(df, 10**9, "score", "n_tok").count() == 300

    # budget that an exact whole number of bins satisfies: rate 0 for
    # the next bin down
    out2 = select_top_by_budget(df, 1000, "score", "n_tok", seed=3)
    assert sorted(r.doc_id for r in out2.collect()) == top

    # degenerate: all scores equal -> plain deterministic sample
    flat = spark.createDataFrame(
        [(i, 1.0, 10) for i in range(200)],
        "doc_id long, score double, n_tok long",
    )
    out3 = select_top_by_budget(flat, 1000, "score", "n_tok", seed=3)
    n3 = out3.count()
    assert 0 < n3 < 200  # rate 0.5 sample
    plan = out3._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Sort" not in plan


# ------------------------------------------------------- per-group capping


def test_cap_per_group_exact_lowest_hashes(spark):
    import hashlib

    from sparkcheck.sampling import cap_per_group

    rows = [(i, f"g{i % 3}") for i in range(90)] + [
        (1000, None),   # NULL group: dropped
        (None, "g0"),   # NULL id: dropped
    ]
    df = spark.createDataFrame(rows, "doc_id long, grp string")
    got = {r["doc_id"] for r in cap_per_group(df, "grp", 5, seed=7).collect()}

    def h(i):
        return hashlib.md5(f"7|{i}".encode()).hexdigest()

    exp = set()
    for g in range(3):
        members = sorted((h(i), i) for i in range(90) if i % 3 == g)
        exp |= {i for _, i in members[:5]}
    assert got == exp and len(got) == 15


def test_cap_per_group_edge_caps_and_stability(spark):
    from sparkcheck.sampling import cap_per_group

    df = spark.createDataFrame(
        [(i, "g") for i in range(20)], "doc_id long, grp string"
    )
    assert cap_per_group(df, "grp", 0).count() == 0
    assert cap_per_group(df, "grp", 100).count() == 20
    # re-crawl stability: a kept doc stays kept when the group shrinks
    kept_full = {r["doc_id"] for r in cap_per_group(df, "grp", 5).collect()}
    survivor = sorted(kept_full)[0]
    shrunk = df.where(f"doc_id = {survivor} or doc_id >= 10")
    kept_shrunk = {
        r["doc_id"] for r in cap_per_group(shrunk, "grp", 5).collect()
    }
    assert survivor in kept_shrunk


def test_cap_per_group_windows_are_bucketed(spark):
    from sparkcheck.sampling import cap_per_group

    df = spark.createDataFrame(
        [(i, "hot") for i in range(50)], "doc_id long, grp string"
    )
    plan = (
        cap_per_group(df, "grp", 3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the ranking window must partition by (group, hash-prefix bucket),
    # never by the bare group — that is the mega-group reducer
    assert "row_number()" in plan
    for line in plan.splitlines():
        if "row_number()" in line:
            assert "_cpb" in line, line


def test_balance_groups_exact_equal_sizes(spark):
    from sparkcheck.sampling import balance_groups

    rows = (
        [(i, "a") for i in range(30)]
        + [(100 + i, "b") for i in range(12)]
        + [(200 + i, "c") for i in range(20)]
    )
    df = spark.createDataFrame(rows, "doc_id long, grp string")
    out = balance_groups(df, "grp").groupBy("grp").count().collect()
    assert {r["grp"]: r["count"] for r in out} == {"a": 12, "b": 12, "c": 12}
    # explicit target: small groups keep what they have
    out2 = balance_groups(df, "grp", target=15).groupBy("grp").count().collect()
    assert {r["grp"]: r["count"] for r in out2} == {"a": 15, "b": 12, "c": 15}
    # empty input
    assert balance_groups(df.limit(0), "grp").count() == 0


# ------------------------------------------- splits and temperature mixing


def test_split_corpus_partition_properties(spark):
    from sparkcheck.sampling import split_corpus

    df = spark.createDataFrame(
        [(i,) for i in range(2000)] + [(None,)], "doc_id long"
    )
    out = split_corpus(df, {"train": 0.8, "val": 0.1, "test": 0.1}).collect()
    # exhaustive + disjoint: every non-NULL row exactly one label
    assert len(out) == 2000
    by = {}
    for r in out:
        by.setdefault(r["split"], set()).add(r["doc_id"])
    assert set(by) == {"train", "val", "test"}
    assert sum(len(v) for v in by.values()) == 2000
    # proportions within binomial noise (exp 1600, std ~18)
    assert 1530 < len(by["train"]) < 1670
    # stability: a doc's split never changes when the corpus grows
    half = split_corpus(
        df.where("doc_id < 1000"), {"train": 0.8, "val": 0.1, "test": 0.1}
    ).collect()
    full_map = {r["doc_id"]: r["split"] for r in out}
    assert all(full_map[r["doc_id"]] == r["split"] for r in half)


def test_split_corpus_validation(spark):
    from sparkcheck.sampling import split_corpus

    df = spark.createDataFrame([(1,)], "doc_id long")
    with pytest.raises(ValueError, match="sum to 1"):
        split_corpus(df, {"train": 0.8, "val": 0.1})
    with pytest.raises(ValueError, match="already exists"):
        split_corpus(
            df.withColumn("split", F.lit("x")),
            {"train": 0.5, "val": 0.5},
        )


def test_temperature_rates_curve_and_caps():
    from sparkcheck.sampling import temperature_rates

    sizes = {"big": 10000, "small": 100}
    # T=1: proportional — both rates equal target/total
    r1 = temperature_rates(sizes, 1010, temperature=1.0)
    assert abs(r1["big"] - 0.1) < 1e-9 and abs(r1["small"] - 0.1) < 1e-9
    # T=2: the small stratum is up-weighted relative to the big one
    r2 = temperature_rates(sizes, 1010, temperature=2.0)
    assert r2["small"] > r2["big"]
    # over-ask caps at 1.0, never redistributes
    r3 = temperature_rates(sizes, 10**9, temperature=2.0)
    assert r3 == {"big": 1.0, "small": 1.0}
    with pytest.raises(ValueError, match="temperature"):
        temperature_rates(sizes, 10, temperature=0.0)


def test_temperature_sample_realizes_expected_mix(spark):
    from sparkcheck.sampling import temperature_rates, temperature_sample

    rows = [(i, "big" if i < 9000 else "small") for i in range(10000)]
    df = spark.createDataFrame(rows, "doc_id long, src string")
    out = temperature_sample(
        df, "src", total_target=2000, temperature=2.0, seed=19
    )
    got = {r["src"]: r["count"] for r in out.groupBy("src").count().collect()}
    rates = temperature_rates({"big": 9000, "small": 1000}, 2000, 2.0)
    for s, n in (("big", 9000), ("small", 1000)):
        exp = rates[s] * n
        assert abs(got[s] - exp) < 4 * (exp ** 0.5) + 1  # binomial noise


# ----------------------------------------- property: cap_per_group vs mirror


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    sizes=st.lists(st.integers(min_value=0, max_value=40),
                   min_size=1, max_size=4),
    cap=st.integers(min_value=0, max_value=12),
    seed=st.integers(min_value=0, max_value=3),
)
def test_cap_per_group_matches_python_mirror(spark, sizes, cap, seed):
    """Random group sizes x caps x seeds: the bucketed plan keeps
    exactly the cap lowest (md5, id) rows per group — including the
    boundary-bucket arithmetic the golden test exercises only once."""
    import hashlib

    from sparkcheck.sampling import cap_per_group

    rows, nid = [], 0
    for g, n in enumerate(sizes):
        for _ in range(n):
            rows.append((nid, f"g{g}"))
            nid += 1
    if not rows:
        rows = [(0, "g0")]
    df = spark.createDataFrame(rows, "doc_id long, grp string")
    got = {
        r["doc_id"]
        for r in cap_per_group(df, "grp", cap, seed=seed).collect()
    }
    exp = set()
    by_g: dict = {}
    for i, g in rows:
        by_g.setdefault(g, []).append(i)
    for g, ids in by_g.items():
        ranked = sorted(
            (hashlib.md5(f"{seed}|{i}".encode()).hexdigest(), i) for i in ids
        )
        exp |= {i for _, i in ranked[:cap]}
    assert got == exp
