"""Deterministic sampling + dataset mixing + sequence packing — the
three sampling-shaped operations a training-data pipeline runs between
dedup and tokenization.

Reference analog: the mock/fixture sampling surface (the reference
samples fixture rows for pattern detection, sql_testing/fixtures.py) —
re-expressed at corpus scale where sampling must be DETERMINISTIC and
engine-portable, not RNG-backed:

- ``df.sample()`` draws from a per-partition RNG: resampling after a
  repartition, a retry, or on another engine yields a different subset,
  which breaks lineage audits ("why is this doc in the training set?").
- The hash-threshold construction here keeps a row iff
  ``md5(seed | id) < hex_threshold(rate)``. md5 hex is uniform over
  [0, 16^32) and identical in every engine, and fixed-length lowercase
  hex compares lexicographically as the number it encodes — so the
  SAME rows are kept at any parallelism, on re-runs, and in the DuckDB
  oracle, and nested rates compose (a 0.5 sample of a 0.5 sample is
  exactly the 0.25 sample when seeds differ).

All three operators are pure map-side Column work except the packing
window (see pack_sequences' scale note).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window, functions as F


def hex_threshold(rate: float) -> str:
    """32-hex-digit threshold such that P(md5_hex < threshold) = rate
    for a uniform md5. rate is clamped to [0, 1]; rate=1.0 returns a
    string above every hex digest ('g' > 'f' lexicographically) so all
    rows are kept."""
    rate = min(max(float(rate), 0.0), 1.0)
    v = int(rate * 16**32)
    if v >= 16**32:
        return "g" * 32
    return format(v, "032x")


def _sample_hash(id_col: Column, seed: int) -> Column:
    """md5('<seed>|<id>') — THE sampling hash, shared by both samplers
    and mirrored literally in the oracle SQL. F.concat (not concat_ws)
    so a NULL id null-propagates: NULL-id rows are dropped by the WHERE
    in both engines, instead of all hashing to md5('<seed>|') and being
    kept or dropped as one block."""
    return F.md5(F.concat(F.lit(f"{seed}|"), id_col.cast("string")))


def _keep(id_col: Column, rate: float, seed: int) -> Column:
    return _sample_hash(id_col, seed) < F.lit(hex_threshold(rate))


def deterministic_sample(
    df: DataFrame, rate: float, id_col: str = "doc_id", seed: int = 1
) -> DataFrame:
    """Keep a deterministic ``rate`` fraction of rows, keyed by
    ``md5(seed|id)`` — reproducible at any parallelism and across
    engines (see module docstring). Map-only: no shuffle, no RNG
    state, fuses into whatever scan follows."""
    return df.where(_keep(F.col(id_col), rate, seed))


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str,
    id_col: str = "doc_id",
    default_rate: float = 0.0,
    seed: int = 1,
) -> DataFrame:
    """Per-stratum deterministic sampling — THE dataset-mixing
    primitive: ``rates`` maps a stratum value (source, language,
    quality bucket) to its keep fraction, e.g. up-weight books to 1.0
    and down-weight common-crawl to 0.1. Strata absent from ``rates``
    (and NULL strata) keep ``default_rate``. Still map-only — the
    per-stratum threshold is a CASE chain on the stratum column, not a
    join."""
    thr: Column = F.lit(hex_threshold(default_rate))
    # repr-keyed sort: only for deterministic CASE-chain construction
    # (conditions are mutually exclusive), and it tolerates mixed-type
    # strata keys (int quality buckets next to string sources) that a
    # bare sorted() would TypeError on
    for value, rate in sorted(rates.items(), key=lambda kv: repr(kv[0])):
        thr = F.when(
            F.col(strata_col) == value, F.lit(hex_threshold(rate))
        ).otherwise(thr)
    return df.where(_sample_hash(F.col(id_col), seed) < thr)


def fold_hex52(h: Column) -> Column:
    """First 13 hex digits of an md5-hex column folded to an exact
    integer in [0, 2^52) — the ENGINE-PORTABLE numeric hash form:
    13 hex digits = 52 bits ≤ the 53-bit double mantissa, so every
    downstream comparison/modulo is exact in BOTH a BIGINT and a
    DOUBLE, and a DuckDB oracle reproduces it digit-fold for
    digit-fold. Uniform over [0, 16^13) because a hex-digit prefix of
    md5 is. Shared by the budget sampler, the global shuffle, and the
    hashed-ngram classifier (textstats/classifier.py)."""
    expr: Column | None = None
    for i in range(13):
        a = F.ascii(F.substring(h, i + 1, 1))
        digit = a - 48 - F.when(a >= 97, F.lit(39)).otherwise(F.lit(0))
        term = digit.cast("long") * F.lit(16 ** (12 - i)).cast("long")
        expr = term if expr is None else expr + term
    return expr


def _hash52(id_col: Column, seed: int) -> Column:
    """``fold_hex52`` over the sampling hash. sample_to_budget derives
    its rates FROM THE DATA, so unlike the static-rate samplers it
    cannot embed a precomputed hex-threshold string; instead both
    engines compare ``hash52 < rate * 2^52`` where every operand is
    exact in a double and the rate arithmetic is the same
    correctly-rounded IEEE division — so the DuckDB oracle reproduces
    the selection bit-for-bit."""
    return fold_hex52(_sample_hash(id_col, seed))


def budget_rates(
    df: DataFrame,
    budgets: dict,
    token_col: str,
    strata_col: str,
) -> dict:
    """Per-stratum keep rates that realize absolute TOKEN BUDGETS —
    the real mixing ask is "600B tokens at 40/30/30 across sources",
    not hand-tuned rates. One groupBy agg over the budgeted strata
    (O(strata) driver collect), then ``rate = min(1, budget/total)``.

    Returns ``{stratum: {"total_tokens", "rate", "shortfall"}}``:
    an over-asked stratum (budget > available) caps at rate 1.0 and
    reports the shortfall — the caller decides whether to re-weight
    other strata or accept the smaller mix; silently scaling the
    other budgets up would corrupt the requested mixture."""
    rows = (
        df.where(F.col(strata_col).isin(list(budgets)))
        .groupBy(strata_col)
        .agg(F.sum(F.col(token_col).cast("long")).alias("_tot"))
        .collect()
    )
    totals = {r[0]: int(r[1] or 0) for r in rows}
    out = {}
    for value, budget in budgets.items():
        tot = totals.get(value, 0)
        rate = min(1.0, budget / tot) if tot > 0 else 0.0
        out[value] = {
            "total_tokens": tot,
            "rate": rate,
            "shortfall": max(0, budget - tot),
        }
    return out


def sample_to_budget(
    df: DataFrame,
    budgets: dict,
    token_col: str,
    strata_col: str,
    id_col: str = "doc_id",
    seed: int = 1,
) -> DataFrame:
    """Deterministic mixing by TARGET TOKEN BUDGET: keep a per-stratum
    fraction ``min(1, budget/total_tokens)`` of rows, with the same
    md5-keyed keep rule as the other samplers (reproducible at any
    parallelism and across engines). Strata without a budget (and NULL
    strata) are dropped — a mixture definition is exhaustive.

    Realized token mass per stratum is the budget up to sampling
    quantization (docs are kept whole): expect deviations on the order
    of sqrt(n_kept) average doc lengths, not exact hits. The derived
    rates are deterministic, so the selection itself is exactly
    reproducible — see budget_rates for the over-ask contract.

    Map-only after the one rates agg; the per-stratum threshold is a
    CASE chain (no join), same shape as stratified_sample but with the
    52-bit numeric compare (_hash52) so a SQL oracle can re-derive the
    rates from the data and still match bit-for-bit."""
    rates = budget_rates(df, budgets, token_col, strata_col)
    thr: Column = F.lit(-1.0)  # below every hash: un-budgeted strata drop
    for value, info in sorted(rates.items(), key=lambda kv: repr(kv[0])):
        thr = F.when(
            F.col(strata_col) == value, F.lit(info["rate"] * 2.0**52)
        ).otherwise(thr)
    return df.where(_hash52(F.col(id_col), seed).cast("double") < thr)


def epoch_plan(
    df: DataFrame,
    budgets: dict,
    token_col: str,
    strata_col: str,
    max_epochs: int | None = None,
) -> dict:
    """Per-stratum EPOCH plan for budgets that may EXCEED the available
    tokens — the data-constrained case (Muennighoff et al. '23, "Scaling
    Data-Constrained Language Models"): a budget B over a stratum with
    T < B tokens is realized as ``B // T`` full epochs plus a
    deterministic sample of the remainder fraction ``(B % T) / T``.

    Returns ``{stratum: {"total_tokens", "full_epochs",
    "remainder_rate", "shortfall"}}``. ``max_epochs`` caps total passes
    (full + the partial one) — repetition past ~4 epochs has sharply
    diminishing returns, so the cap reports the unmet budget as
    ``shortfall`` instead of looping further. Remainder arithmetic is
    integer-exact (``B % T`` as an int, ONE division) so a SQL oracle
    re-derives the identical rate double."""
    rows = (
        df.where(F.col(strata_col).isin(list(budgets)))
        .groupBy(strata_col)
        .agg(F.sum(F.col(token_col).cast("long")).alias("_tot"))
        .collect()
    )
    totals = {r[0]: int(r[1] or 0) for r in rows}
    out = {}
    for value, budget in budgets.items():
        tot = totals.get(value, 0)
        if tot <= 0:
            out[value] = {
                "total_tokens": 0,
                "full_epochs": 0,
                "remainder_rate": 0.0,
                "shortfall": budget,
            }
            continue
        full = int(budget) // tot
        rem_rate = (int(budget) % tot) / tot
        shortfall = 0
        if max_epochs is not None:
            passes = full + (1 if rem_rate > 0 else 0)
            if passes > max_epochs:
                # passes > cap implies full >= cap: serve exactly
                # max_epochs FULL passes, no partial one
                full = max_epochs
                rem_rate = 0.0
                shortfall = max(0, int(budget) - max_epochs * tot)
        out[value] = {
            "total_tokens": tot,
            "full_epochs": full,
            "remainder_rate": rem_rate,
            "shortfall": shortfall,
        }
    return out


def repeat_to_budget(
    df: DataFrame,
    budgets: dict,
    token_col: str,
    strata_col: str,
    id_col: str = "doc_id",
    seed: int = 1,
    max_epochs: int | None = None,
) -> DataFrame:
    """Epoch-aware mixing: like ``sample_to_budget`` but an over-asked
    stratum REPEATS instead of capping at one pass — every doc appears
    ``full_epochs`` times plus once more iff the deterministic
    remainder sample keeps it (same 52-bit keep rule and seed
    discipline as the other samplers, so the partial epoch is the SAME
    subset on every engine and re-run). Output rows carry an ``epoch``
    column (0-based) so downstream shuffling/packing can key on
    ``(id, epoch)`` and repeated copies land in different sequences.

    Shape: one O(strata) planning agg, then map-only — the copy count
    is a CASE chain plus the keep flag, materialized by exploding
    ``sequence(0, n_copies-1)`` (zero-copy rows vanish: empty array).
    No shuffle at any size; output volume is the requested token
    budget, which is the floor for ANY realization of it. Strata
    without a budget (and NULL strata / NULL ids) are dropped —
    a mixture definition is exhaustive."""
    plan = epoch_plan(df, budgets, token_col, strata_col, max_epochs)
    full: Column = F.lit(0)
    thr: Column = F.lit(-1.0)  # below every hash: un-budgeted strata drop
    for value, info in sorted(plan.items(), key=lambda kv: repr(kv[0])):
        cond = F.col(strata_col) == value
        full = F.when(cond, F.lit(info["full_epochs"])).otherwise(full)
        thr = F.when(
            cond, F.lit(info["remainder_rate"] * 2.0**52)
        ).otherwise(thr)
    keep_extra = F.when(
        _hash52(F.col(id_col), seed).cast("double") < thr, F.lit(1)
    ).otherwise(F.lit(0))
    n_copies = (full + keep_extra).cast("int")
    return (
        df.where(F.col(id_col).isNotNull())
        .withColumn("_n_copies", n_copies)
        .where(F.col("_n_copies") > 0)
        .withColumn(
            "epoch",
            F.explode(F.sequence(F.lit(0), F.col("_n_copies") - 1)),
        )
        .drop("_n_copies")
    )


def select_top_by_budget(
    df: DataFrame,
    budget: int,
    score_col: str,
    token_col: str,
    id_col: str = "doc_id",
    bins: int = 10_000,
    seed: int = 1,
) -> DataFrame:
    """Quality-ranked selection under a token budget — "keep the BEST
    documents up to N tokens" (the FineWeb-Edu-style curation step),
    NOT a random sample. Exact top-by-score would globally sort the
    corpus and run an unpartitioned prefix-sum window (one reducer at
    10^12 rows), so this uses the scalable two-phase shape:

      1. one O(1) agg finds the score range; one O(bins) agg builds a
         token-mass histogram over ``bins`` equi-width score bins;
      2. the driver walks bins top-down: bins whose cumulative mass
         fits the budget are kept WHOLE; the single boundary bin keeps
         the deterministic hash fraction ``(budget - mass_above) /
         bin_mass`` (same 52-bit keep rule as the samplers); lower
         bins drop.

    Everything after the two tiny aggs is map-only. The deviation from
    exact ranking is confined to the boundary bin (≤ 1/bins of the
    score range): inside it selection is hash-uniform, not
    score-ordered — the standard threshold-selection contract.
    Deterministic end to end, so a SQL oracle re-derives the identical
    keep set (all arithmetic is the same IEEE double ops in the same
    order). Rows with NULL score/token/id drop (unrankable)."""
    score = F.col(score_col).cast("double")
    d = df.where(
        F.col(score_col).isNotNull()
        & F.col(token_col).isNotNull()
        & F.col(id_col).isNotNull()
    )
    lo, hi = d.agg(F.min(score), F.max(score)).first()
    if lo is None:
        return d  # empty input
    if hi == lo:
        # degenerate: one bin — plain deterministic sample at the
        # budget rate
        total = d.agg(F.sum(F.col(token_col).cast("long"))).first()[0] or 0
        rate = min(1.0, budget / total) if total > 0 else 0.0
        return d.where(
            _hash52(F.col(id_col), seed).cast("double")
            < F.lit(rate * 2.0**52)
        )
    # bin arithmetic mirrored literally by the oracle: (score - lo) *
    # bins / (hi - lo), floor, clamp the score==hi row into the top bin
    bin_col = F.least(
        F.floor((score - F.lit(lo)) * F.lit(float(bins)) / F.lit(hi - lo)),
        F.lit(bins - 1),
    ).cast("long")
    mass = {
        r[0]: int(r[1])
        for r in d.groupBy(bin_col.alias("_bin"))
        .agg(F.sum(F.col(token_col).cast("long")))
        .collect()
    }
    above = 0
    boundary_rate = 0.0
    for b in sorted(mass, reverse=True):
        if above + mass[b] <= budget:
            above += mass[b]
            continue
        boundary_bin = b
        if above < budget:
            boundary_rate = (budget - above) / mass[b]
        # else: budget exactly exhausted by higher bins — rate stays 0,
        # this bin and below drop
        break
    else:
        return d  # total mass fits the budget: keep everything
    keep = (bin_col > F.lit(boundary_bin)) | (
        (bin_col == F.lit(boundary_bin))
        & (
            _hash52(F.col(id_col), seed).cast("double")
            < F.lit(boundary_rate * 2.0**52)
        )
    )
    return d.where(keep)


def deterministic_shuffle(
    df: DataFrame,
    num_shards: int,
    id_col: str = "doc_id",
    seed: int = 1,
) -> DataFrame:
    """Seeded global shuffle — the corpus-ordering step between mixing
    and packing. Training order must be (a) pseudorandom (sequential
    source order trains badly), (b) REPRODUCIBLE (re-runs, audits,
    resume-from-step), and (c) shard-parallel (no single global sort
    owner). ``df.orderBy(rand(seed))`` fails (a reshuffle or retry
    draws new randoms); this is the hash-keyed analog of the samplers
    above: every row gets

        shard_id  = hash52(seed|id) % num_shards
        shard_pos = rank of md5-digits[14:] within its shard

    Reading shards in shard_id order, rows in shard_pos order, visits
    the corpus in a fixed pseudorandom permutation keyed only by
    (seed, id) — identical at any parallelism and in the DuckDB
    oracle. Shard assignment uses the hash's first 13 hex digits,
    within-shard order its LAST 19 (disjoint digits, so position is
    independent of shard membership), doc id as the total-order
    tie-break.

    SCALE: the only wide op is one window partitioned by shard_id —
    num_shards reducers each ranking corpus/num_shards rows. Pick
    num_shards so a shard fits a task (10^12 docs / 100k shards = 10^7
    rows each); more shards = more parallelism, and the permutation
    quality does not depend on the count. NULL ids are dropped (no
    stable identity ⇒ no stable position — same contract as the
    samplers)."""
    if num_shards <= 0:
        raise ValueError(f"num_shards must be positive, got {num_shards}")
    clash = {"shard_id", "shard_pos", "_suborder"} & set(df.columns)
    if clash:
        raise ValueError(
            f"input already has column(s) {sorted(clash)} — rename them "
            "before shuffling (the output adds shard_id/shard_pos and "
            "stages an internal _suborder column)"
        )
    kid = F.col(id_col)
    shard = F.pmod(_hash52(kid, seed), F.lit(num_shards)).cast("long")
    sub = F.substring(_sample_hash(kid, seed), 14, 19)
    w = Window.partitionBy("shard_id").orderBy(F.col("_suborder"), kid)
    return (
        df.where(kid.isNotNull())
        .select("*", shard.alias("shard_id"), sub.alias("_suborder"))
        .select(
            *df.columns,
            "shard_id",
            (F.row_number().over(w) - 1).cast("long").alias("shard_pos"),
        )
    )


def pack_sequences(
    df: DataFrame,
    token_col: str,
    budget: int,
    id_col: str = "doc_id",
    shard_col: str | None = None,
) -> DataFrame:
    """Concat-then-chunk sequence packing (the standard LM-pretraining
    shape: documents are concatenated in a deterministic order and the
    stream is cut into ``budget``-token sequences; docs may straddle a
    boundary — that is the actual training layout, not a defect).

    Returns the input plus (seq_id, seq_offset): doc d starts at offset
    ``seq_offset`` of sequence ``seq_id`` of its shard. Derivation is
    one exclusive-prefix-sum window ordered by id:

        seq_id     = floor(cumsum_before / budget)
        seq_offset = cumsum_before % budget

    SCALE: an unpartitioned window is a single reducer — fine for one
    corpus slice, wrong at 10^12 docs. Pass ``shard_col`` (a bounded
    -cardinality column: language, source, date bucket) and the window
    partitions by it, giving per-shard sequence ids — exactly how
    multi-source training data is packed anyway (sequences never mix
    sources). NULL token counts are treated as 0-length (the doc still
    appears, at the current offset).

    Separator/EOS accounting: pipelines that append k separator tokens
    after each document pack on a derived column —
    ``df.withColumn("n_eff", F.col(token_col) + k)`` — rather than a
    dedicated parameter; the offsets then point at each doc's first
    CONTENT token and the k-token gap before the next doc is the
    separator's stream space."""
    if budget <= 0:
        raise ValueError(
            f"budget must be a positive token count, got {budget} (a zero "
            "budget would DIVIDE_BY_ZERO mid-job under ANSI mode, or yield "
            "all-NULL assignments without it)"
        )
    clash = {"_before", "seq_id", "seq_offset"} & set(df.columns)
    if clash:
        raise ValueError(
            f"input already has column(s) {sorted(clash)} — rename them "
            "before packing (the output adds seq_id/seq_offset and stages "
            "an internal _before column)"
        )
    order = [F.col(id_col)]
    w = (
        Window.partitionBy(shard_col).orderBy(*order)
        if shard_col is not None
        else Window.orderBy(*order)
    )
    before = F.coalesce(
        F.sum(F.coalesce(F.col(token_col), F.lit(0)).cast("long")).over(
            w.rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0).cast("long"),
    )
    # integer `div`, not `/`: Spark's `/` promotes to double, which
    # loses exactness past 2^53 cumulative tokens per shard — seq_id
    # would disagree with the exact long `%` offset at precisely the
    # scale this operator targets
    return df.select(
        "*", before.alias("_before")
    ).select(
        *df.columns,
        F.expr(f"_before div {int(budget)}").alias("seq_id"),
        (F.col("_before") % budget).cast("long").alias("seq_offset"),
    )


def pack_spans(
    df: DataFrame,
    token_col: str,
    budget: int,
    id_col: str = "doc_id",
    shard_col: str | None = None,
    carry: list[str] | None = None,
) -> DataFrame:
    """The packing layout in SEQUENCE-major form: one row per
    (sequence, doc-slice). ``pack_sequences`` places each doc at its
    START (seq_id, seq_offset) — but a doc that straddles sequence
    boundaries contributes a SLICE to every sequence it crosses, and
    the tokenizer shard consuming sequence s needs exactly those
    slices. Output columns (plus ``shard_col`` if given):

        seq_id    — the sequence this slice lands in
        seq_pos   — offset within that sequence where the slice starts
        <id_col>  — the source doc
        take_from — first token of the doc in this slice
        take_len  — tokens taken (0-token docs appear once, take_len 0,
                    so every doc is present in the manifest)

    Derivation is the pack window plus ONE explode of
    ``sequence(0, n_spans-1)`` — n_spans = 1 + (seq_offset+L-1) div
    budget — all codegen'd Column arithmetic, integer ``div`` for
    exactness past 2^53 cumulative tokens. Invariants (pytest-pinned):
    per doc, takes are contiguous from 0 and sum to its length; per
    sequence, slices tile [0, budget) except each shard's final
    sequence.

    ``carry`` columns ride along unchanged (each slice row repeats its
    doc's value) — how assemble_sequences keeps the payload next to
    the span arithmetic without a second join back to the corpus."""
    packed = pack_sequences(df, token_col, budget, id_col, shard_col)
    carry = carry or []
    L = F.coalesce(F.col(token_col), F.lit(0)).cast("long")
    n_spans = F.when(L <= 0, F.lit(1).cast("long")).otherwise(
        F.expr(f"(seq_offset + {token_col} - 1) div {int(budget)}") + 1
    )
    j = F.col("_j")
    take_from = F.when(j == 0, F.lit(0).cast("long")).otherwise(
        budget - F.col("seq_offset") + (j - 1).cast("long") * budget
    )
    shard = [shard_col] if shard_col is not None else []
    return (
        packed.select(
            *shard, id_col, *carry, "seq_id", "seq_offset",
            F.coalesce(F.col(token_col), F.lit(0)).cast("long").alias("_L"),
            F.explode(F.sequence(F.lit(0).cast("long"), n_spans - 1)).alias("_j"),
        )
        .select(
            *shard,
            *carry,
            (F.col("seq_id") + j).alias("seq_id"),
            F.when(j == 0, F.col("seq_offset"))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("seq_pos"),
            id_col,
            take_from.cast("long").alias("take_from"),
            F.least(
                F.col("_L") - take_from,
                F.when(j == 0, F.lit(budget) - F.col("seq_offset")).otherwise(
                    F.lit(budget).cast("long")
                ),
            )
            .cast("long")
            .alias("take_len"),
        )
    )


def pack_manifest(
    df: DataFrame,
    token_col: str,
    budget: int,
    id_col: str = "doc_id",
    shard_col: str | None = None,
) -> DataFrame:
    """Per-SEQUENCE manifest: ``seq_id → ordered array of
    (seq_pos, doc_id, take_from, take_len)`` — the unit a tokenizer
    shard materializes (read the listed doc slices in order,
    concatenate, emit one training sequence). One groupBy(seq_id) with
    collect_list over the pack_spans output; sort_array orders entries
    by seq_pos (struct field order makes the lexicographic sort
    positional). ``seq_tokens`` is the filled length — budget for all
    but each shard's final sequence."""
    spans = pack_spans(df, token_col, budget, id_col, shard_col)
    shard = [shard_col] if shard_col is not None else []
    entry = F.struct(
        F.col("seq_pos"), F.col(id_col), F.col("take_from"), F.col("take_len")
    )
    return (
        spans.groupBy(*shard, "seq_id")
        .agg(
            F.sort_array(F.collect_list(entry)).alias("entries"),
            F.sum("take_len").alias("seq_tokens"),
        )
    )


def assemble_sequences(
    df: DataFrame,
    content_col: str,
    budget: int,
    id_col: str = "doc_id",
    shard_col: str | None = None,
) -> DataFrame:
    """Materialize the packed layout into ACTUAL training sequences —
    the last step before the sequences hit the trainer: concatenate
    every document's content in pack order and emit one row per
    ``budget``-unit sequence, docs sliced wherever they straddle a
    boundary. Output: (``shard_col``?, seq_id, seq_tokens, seq_content)
    where seq_tokens = budget for all but each shard's final sequence.

    ``content_col`` may be a STRING (unit = character — the pre-
    tokenization layout, oracle-checkable) or an ARRAY (unit =
    element — pack real token ids the same way); dtype picks the
    slice/concat functions, the span arithmetic is shared with
    pack_spans. Token counts are derived from the content itself
    (length/size), so a slice is always within bounds by construction.

    SCALE: pack_spans carries the content through its explode (no join
    back to the corpus); each output group holds at most
    ceil(budget/1)+1 slices totalling ≤ budget units, so the
    collect_list per sequence is bounded by the budget regardless of
    corpus size — the groupBy shuffles exactly the corpus payload once,
    partitioned by sequence. Zero-length docs contribute an empty
    slice (sorted first at their position; concat-identity, so
    presence in the manifest never changes the bytes)."""
    dtype = dict(df.dtypes)[content_col]
    is_array = dtype.startswith("array")
    n = (F.size(F.col(content_col)) if is_array
         else F.length(F.col(content_col))).cast("long")
    clash = {"_n_units"} & set(df.columns)
    if clash:
        raise ValueError(
            "input already has column '_n_units' — rename it before "
            "assembling (staged internally for the span arithmetic)"
        )
    spans = pack_spans(
        df.select(*df.columns, n.alias("_n_units")),
        "_n_units", budget, id_col, shard_col, carry=[content_col],
    )
    content = F.col(content_col)
    sl = (
        F.slice(content, (F.col("take_from") + 1).cast("int"),
                F.col("take_len").cast("int"))
        if is_array
        else F.substring(content, (F.col("take_from") + 1).cast("int"),
                         F.col("take_len").cast("int"))
    )
    shard = [shard_col] if shard_col is not None else []
    entries = F.sort_array(F.collect_list(F.col("_e")))
    joined = (
        F.flatten(F.transform(entries, lambda e: e["sl"]))
        if is_array
        else F.array_join(F.transform(entries, lambda e: e["sl"]), "")
    )
    return (
        spans.select(
            *shard, "seq_id", "take_len",
            F.struct(F.col("seq_pos"), sl.alias("sl")).alias("_e"),
        )
        .groupBy(*shard, "seq_id")
        .agg(
            F.sum("take_len").cast("long").alias("seq_tokens"),
            joined.alias("seq_content"),
        )
    )


def cap_per_group(
    df: DataFrame,
    group_col: str,
    cap: int,
    id_col: str = "doc_id",
    seed: int = 7,
    prefix_len: int = 2,
) -> DataFrame:
    """Cap every group at ``cap`` rows — the domain-domination control
    of web-corpus curation (C4 and successors cap documents per host so
    boilerplate-heavy mega-domains cannot own the training mix). The
    kept rows are the cap LOWEST sampling hashes ``md5(seed|id)`` per
    group: exact, deterministic at any parallelism, engine-portable,
    and stable under re-crawls (a doc already kept stays kept unless
    cap-many lower-hash docs appear in its group).

    SCALE — the naive ``row_number() OVER (PARTITION BY group)`` ranks
    EVERY row of a 10^9-doc host on one reducer to keep 10^5. Instead:

      1. bucket each row by the first ``prefix_len`` hex digits of its
         hash (16^prefix_len ordered sub-buckets; uniform by md5);
      2. one skew-proof count agg over (group, bucket) — map-side
         partials, output O(groups * 16^prefix_len);
      3. a prefix-sum window over that TINY stats frame gives each
         bucket its number of predecessors ``cum_before``;
      4. rows join their bucket's stats and everything past the cap
         (``cum_before >= cap``) drops BEFORE any ranking — a 10^9-row
         host with cap 10^5 sheds ~all rows here;
      5. one window over (group, bucket) ranks only the survivors —
         at most ~cap + group_size/16^prefix_len rows per group, and
         partitions are 16^prefix_len-times finer than the group.

    Keep rule: ``cum_before + rank <= cap`` — exact for fully-kept
    buckets (rank never exceeds the bucket count) and for the single
    boundary bucket. NULL ids and NULL groups are dropped (no stable
    identity / no group to cap — the samplers' contract).

    The stats join is left to AQE (broadcast when groups are few,
    shuffle on the composite key — never skewed, buckets split hot
    groups 16^prefix_len ways)."""
    if cap < 0:
        raise ValueError(f"cap must be >= 0, got {cap}")
    if not 1 <= prefix_len <= 8:
        raise ValueError(f"prefix_len must be in 1..8, got {prefix_len}")
    clash = {"_cph", "_cpb", "_cpn", "_cp_before"} & set(df.columns)
    if clash:
        raise ValueError(
            f"input already has column(s) {sorted(clash)} — rename them "
            "(cap_per_group stages internal _cp* columns)"
        )
    if cap == 0:
        return df.limit(0)
    h = _sample_hash(F.col(id_col), seed)
    pre = df.where(
        F.col(id_col).isNotNull() & F.col(group_col).isNotNull()
    ).select(
        "*",
        h.alias("_cph"),
        F.substring(h, 1, prefix_len).alias("_cpb"),
    )
    stats = pre.groupBy(group_col, "_cpb").agg(
        F.count(F.lit(1)).alias("_cpn")
    )
    before = (
        Window.partitionBy(group_col)
        .orderBy("_cpb")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # fresh names on the stats side: stats derives from pre, so joining
    # on same-named columns would resolve both sides to ONE attribute
    # (Spark's trivially-true-predicate trap on self-join lineage)
    stats = stats.select(
        F.col(group_col).alias("_cpg"),
        F.col("_cpb").alias("_cpb2"),
        F.coalesce(F.sum("_cpn").over(before), F.lit(0)).alias("_cp_before"),
    )
    joined = pre.join(
        stats,
        (F.col(group_col) == F.col("_cpg")) & (F.col("_cpb") == F.col("_cpb2")),
    ).drop("_cpg", "_cpb2").where(F.col("_cp_before") < cap)
    rank_w = Window.partitionBy(group_col, "_cpb").orderBy(
        "_cph", F.col(id_col)
    )
    return (
        joined.withColumn("_cprk", F.row_number().over(rank_w))
        .where(F.col("_cp_before") + F.col("_cprk") <= cap)
        .select(*df.columns)
    )


def balance_groups(
    df: DataFrame,
    group_col: str,
    id_col: str = "doc_id",
    seed: int = 11,
    target: int | None = None,
) -> DataFrame:
    """Equal representation across groups — the REBALANCING step of
    cluster-based curation (after k-means topic clustering, shrink
    every cluster to the same size so no topic dominates the mix).
    ``target`` defaults to the smallest group's size, so the output is
    the largest exactly-balanced corpus the data admits; an explicit
    target caps at min(target, group size) per group (smaller groups
    keep everything they have — stated, not silent: the result is then
    balanced only down to the data).

    One O(groups) count agg picks the target (driver collect of group
    counts — O(groups), same contract as budget_rates); the selection
    itself is ``cap_per_group``, so it is EXACT (precisely target rows
    per group, not a statistical rate), deterministic at any
    parallelism, re-crawl-stable, and skew-proof."""
    counts = [
        int(r[1])
        for r in df.where(F.col(group_col).isNotNull())
        .groupBy(group_col)
        .agg(F.count(F.lit(1)))
        .collect()
    ]
    if not counts:
        return df.limit(0)
    cap = min(counts) if target is None else min(target, max(counts))
    return cap_per_group(df, group_col, cap, id_col=id_col, seed=seed)


def split_corpus(
    df: DataFrame,
    splits: dict[str, float],
    id_col: str = "doc_id",
    seed: int = 17,
    split_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test carving: ``splits`` maps a label to
    its fraction (must sum to 1 within 1e-9 — a corpus split is a
    PARTITION, not a family of samples). Each row gets exactly one
    label by which disjoint interval of [0, 16^32) its sampling hash
    falls in; interval edges are the cumulative ``hex_threshold``
    values, label order is the deterministic repr-sort of the keys.

    Two properties the per-split ``deterministic_sample`` calls would
    NOT give: the splits are disjoint-and-exhaustive by construction
    (independent samples overlap), and a document's label never changes
    as the corpus grows (hash intervals are fixed) — the property that
    keeps eval docs out of every future training set. Map-only; NULL
    ids are dropped (no stable identity ⇒ no stable split)."""
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    if split_col in df.columns:
        raise ValueError(f"column {split_col!r} already exists")
    cum = 0.0
    expr: Column | None = None
    h = _sample_hash(F.col(id_col), seed)
    items = sorted(splits.items(), key=lambda kv: repr(kv[0]))
    for label, frac in items[:-1]:
        cum += frac
        cond = h < F.lit(hex_threshold(cum))
        expr = (
            F.when(cond, F.lit(label))
            if expr is None
            else expr.when(cond, F.lit(label))
        )
    last = F.lit(items[-1][0])
    expr = last if expr is None else expr.otherwise(last)
    return df.where(F.col(id_col).isNotNull()).withColumn(split_col, expr)


def temperature_rates(
    sizes: dict, total_target: int, temperature: float = 2.0
) -> dict:
    """Temperature-weighted mixing rates (XLM-R style, Conneau et al.
    '19): stratum weights ∝ n_s^(1/T) — T=1 is proportional (big strata
    dominate), T→∞ is uniform. Rates realize ``total_target`` kept rows
    in expectation: ``rate_s = min(1, total_target * w_s / n_s)``.

    Engine-portability of the normalizer: Σ n_j^(1/T) is a FLOAT sum,
    and float addition is order-dependent — a SQL engine's group-sum
    order is not Python's dict order. The contract therefore pins the
    fold order: addends are summed in ascending (n_j, stratum-repr)
    order, which an oracle reproduces with an ORDER BY inside a
    list_reduce. Over-asked strata cap at 1.0 (the shortfall is NOT
    redistributed — silent redistribution would corrupt the requested
    temperature curve; callers see rates and can re-target)."""
    if temperature <= 0:
        raise ValueError(f"temperature must be > 0, got {temperature}")
    inv_t = 1.0 / temperature
    ordered = sorted(sizes.items(), key=lambda kv: (kv[1], repr(kv[0])))
    # math.sqrt for T=2 (the default): sqrt is IEEE-correctly-rounded
    # everywhere, while pow(x, 0.5) only usually equals it — the sqrt
    # form is what keeps the default temperature oracle-exact
    weights = {
        s: math.sqrt(n) if inv_t == 0.5 else float(n) ** inv_t
        for s, n in ordered
    }
    norm = 0.0
    for s, _ in ordered:
        norm += weights[s]
    return {
        s: min(1.0, total_target * (weights[s] / norm) / n) if n > 0 else 0.0
        for s, n in sizes.items()
    }


def temperature_sample(
    df: DataFrame,
    strata_col: str,
    total_target: int,
    temperature: float = 2.0,
    id_col: str = "doc_id",
    seed: int = 19,
) -> DataFrame:
    """Deterministic temperature mixing: derive per-stratum sizes (one
    O(strata) agg), convert to ``temperature_rates``, keep via the
    52-bit numeric compare (rates are data-derived, so no static hex
    threshold exists — same contract as sample_to_budget). NULL strata
    are dropped (a mixture definition is exhaustive). Map-only after
    the one agg."""
    rows = (
        df.where(F.col(strata_col).isNotNull())
        .groupBy(strata_col)
        .agg(F.count(F.lit(1)).alias("_n"))
        .collect()
    )
    sizes = {r[0]: int(r[1]) for r in rows}
    if not sizes:
        return df.limit(0)
    rates = temperature_rates(sizes, total_target, temperature)
    thr: Column = F.lit(-1.0)
    for value, rate in sorted(rates.items(), key=lambda kv: repr(kv[0])):
        thr = F.when(
            F.col(strata_col) == value, F.lit(rate * 2.0**52)
        ).otherwise(thr)
    return df.where(_hash52(F.col(id_col), seed).cast("double") < thr)
