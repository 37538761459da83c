"""Model-based quality filtering — hashed n-gram linear classifier
inference, fastText-style (Joulin et al. '16, "Bag of Tricks for
Efficient Text Classification"), the filter modern corpus pipelines
(CCNet, RefinedWeb, FineWeb-Edu) run between heuristic quality rules
and mixing: score = sigmoid(bias + Σ w[bucket(ngram)]).

This module is INFERENCE only — training happens offline (sklearn /
fastText on a labeled sample); the learned weight vector is what ships
into the Spark job. Two execution shapes, chosen by where the weights
fit:

  - ``classifier_score`` — weights as a PLAN LITERAL array,
    ``element_at`` lookups inside one ``aggregate`` over the token
    array: strictly map-only (zero shuffle, fuses into the scan,
    whole-stage codegen). Right up to ~64k buckets; beyond that the
    literal bloats the plan.
  - ``classifier_score_joined`` — weights as a DataFrame
    ``(bucket, weight)``: terms explode, broadcast-hash-join the
    weight table (map-side; the table is ≤ dim rows), then ONE
    groupBy(id) whose map-side partial aggregation shrinks the
    shuffle back to O(docs) rows. Right for fastText-scale dims
    (2^21) where no literal can carry the model.

Both produce bit-identical scores for the same (weights, dim): the
bucket hash is the engine-portable 52-bit md5 fold shared with the
samplers, weights are INTEGER micro-units (see ``classifier_score``)
so the accumulation is exact in a BIGINT regardless of token order,
and the single float op happens once per document at the end.

No reference analog — the reference validates structured rows
(``sqltest/modules/field_validator.py`` is its closest scoring
surface); this is the web-corpus operator the north-star pipeline
needs between rule validation and sampling.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F

from sparkcheck.sampling import fold_hex52

# weights are quantized to integer micro-units so the per-document
# accumulation is an EXACT BIGINT sum (order-proof, engine-portable);
# one division by SCALE at the end turns it back into logits
SCALE = 1_000_000


def quantize_weights(weights: Sequence[float]) -> list[int]:
    """Float weights → integer micro-units (round-half-even, like the
    engines' own rounding). Quantization error per weight ≤ 5e-7 —
    far below any classifier's decision noise."""
    return [round(float(w) * SCALE) for w in weights]


def _tokens(text_col: str) -> Column:
    # lowercase, split on whitespace runs, drop empties — the same
    # tokenizer contract as textstats.analysis
    return F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != ""
    )


def _terms(tokens: Column, bigrams: bool) -> Column:
    """Unigram tokens, optionally followed by space-joined bigrams.
    Bigrams via zip_with(tokens, tokens[1:]) — array ops only, no
    explode."""
    if not bigrams:
        return tokens
    tail = F.slice(tokens, 2, F.greatest(F.size(tokens) - 1, F.lit(0)))
    big = F.zip_with(tokens, tail, lambda a, b: F.concat_ws(" ", a, b))
    # zip_with pads the shorter side with NULL → last pair is
    # (last_token, NULL) → concat_ws drops the NULL → a spurious
    # unigram-shaped term; cut it off
    big = F.slice(big, 1, F.greatest(F.size(tokens) - 1, F.lit(0)))
    return F.concat(tokens, big)


def term_bucket(term: Column, dim: int, seed: int = 0) -> Column:
    """Feature-hashing bucket of one n-gram: the 52-bit md5 fold of
    ``md5('<seed>|' || term)`` mod dim — uniform, seeded, and exactly
    reproducible in DuckDB (the oracle mirrors the digit fold)."""
    return fold_hex52(F.md5(F.concat(F.lit(f"{seed}|"), term))) % F.lit(dim)


def classifier_score(
    df: DataFrame,
    weights: Sequence[float],
    text_col: str = "text",
    bias: float = 0.0,
    bigrams: bool = True,
    seed: int = 0,
    out_col: str = "clf_score",
    logits_col: str | None = None,
) -> DataFrame:
    """Literal-weights inference — map-only. ``len(weights)`` IS the
    hash dimension. Appends ``out_col`` = sigmoid(bias + Σ w[bucket])
    as a double; empty/NULL text scores sigmoid(bias). ``logits_col``
    additionally emits the raw logit — downstream THRESHOLDING
    (select_top_by_budget) should rank on it: it is derived from the
    exact integer accumulation by two IEEE ops (÷SCALE, +bias) and is
    therefore bit-identical across engines, whereas the sigmoid passes
    through libm exp whose last ulp is implementation-defined.
    Monotone-equivalent, so the selection is the same."""
    dim = len(weights)
    if dim == 0:
        raise ValueError("weights must be non-empty — its length is the dim")
    w = F.array(*[F.lit(int(q)) for q in quantize_weights(weights)])
    terms = _terms(_tokens(text_col), bigrams)
    acc = F.aggregate(
        F.coalesce(terms, F.array().cast("array<string>")),
        F.lit(0).cast("long"),
        lambda s, t: s + F.element_at(w, (term_bucket(t, dim, seed) + 1).cast("int")),
    )
    logits = F.lit(float(bias)) + acc.cast("double") / F.lit(float(SCALE))
    out = df.withColumn(out_col, F.lit(1.0) / (F.lit(1.0) + F.exp(-logits)))
    if logits_col is not None:
        out = out.withColumn(logits_col, logits)
    return out


def classifier_score_joined(
    df: DataFrame,
    weights_df: DataFrame,
    dim: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    bias: float = 0.0,
    bigrams: bool = True,
    seed: int = 0,
    out_col: str = "clf_score",
) -> DataFrame:
    """Large-model inference (fastText-scale dims): ``weights_df`` is
    ``(bucket: long, weight: double)`` — buckets absent from it weigh
    zero, so a sparse model ships only its non-zero rows. Shape: terms
    explode → broadcast join the weight table (map-side) → ONE
    groupBy(id) sum (map-side partials shrink it to O(docs)) → join
    scores back onto the input by id (docs with no terms keep
    sigmoid(bias)). Scores are bit-identical to ``classifier_score``
    with the same dense weights: the join accumulates the same
    quantized micro-units."""
    wq = weights_df.select(
        F.col("bucket").cast("long").alias("bucket"),
        F.round(F.col("weight") * SCALE).cast("long").alias("wq"),
    )
    terms = df.select(
        F.col(id_col),
        F.explode(_terms(_tokens(text_col), bigrams)).alias("term"),
    ).select(
        id_col, term_bucket(F.col("term"), dim, seed).alias("bucket")
    )
    sums = (
        terms.join(F.broadcast(wq), ["bucket"], "left")
        .groupBy(id_col)
        .agg(F.sum(F.coalesce(F.col("wq"), F.lit(0))).alias("acc"))
    )
    logits = F.lit(float(bias)) + F.coalesce(F.col("acc"), F.lit(0)).cast(
        "double"
    ) / F.lit(float(SCALE))
    return (
        df.join(sums, [id_col], "left")
        .withColumn(out_col, F.lit(1.0) / (F.lit(1.0) + F.exp(-logits)))
        .drop("acc")
    )


def train_nb_classifier(
    docs: DataFrame,
    label_col: str,
    text_col: str = "text",
    dim: int = 64,
    bigrams: bool = True,
    seed: int = 0,
    alpha: float = 1.0,
) -> tuple[list[float], float]:
    """Train the hashed-ngram quality filter IN-ENGINE — multinomial
    Naive Bayes with Laplace smoothing, the classic seed-set recipe
    (CCNet trains against Wikipedia; FineWeb-Edu against LLM labels):
    label 1 = in-domain/positive, 0 = out. Returns ``(weights, bias)``
    ready for ``classifier_score`` / ``classifier_score_joined``:

        w[b]  = ln((pos_b + a) / (POS + a*dim))
              - ln((neg_b + a) / (NEG + a*dim))
        bias  = ln(n_pos_docs / n_neg_docs)

    Training is ONE explode + ONE groupBy(bucket) with two conditional
    sums — shuffle O(dim), never O(tokens) — plus an O(dim) driver
    collect; all counts are exact BIGINTs, and both the weights and the
    bias are quantized to integer micro-units before use, so scores
    from the trained model are engine-portable end to end (the same
    discipline as inference). NULL-label docs are excluded; NULL-text
    docs contribute to the class prior but no tokens."""
    lab = F.col(label_col).cast("int")
    base = docs.where(lab.isNotNull()).select(
        lab.alias("_y"), F.col(text_col).alias("_t")
    )
    prior = base.groupBy("_y").agg(F.count(F.lit(1)).alias("n")).collect()
    n_docs = {r["_y"]: int(r["n"]) for r in prior}
    if not n_docs.get(1) or not n_docs.get(0):
        raise ValueError(
            f"both classes must be present, got doc counts {n_docs}"
        )
    terms = base.where(F.col("_t").isNotNull()).select(
        "_y", F.explode(_terms(_tokens("_t"), bigrams)).alias("term")
    )
    counts = (
        terms.select("_y", term_bucket(F.col("term"), dim, seed).alias("b"))
        .groupBy("b")
        .agg(
            F.sum(F.col("_y")).alias("pos"),
            F.sum(F.lit(1) - F.col("_y")).alias("neg"),
        )
        .collect()
    )
    import math

    pos = [0] * dim
    neg = [0] * dim
    for r in counts:
        pos[int(r["b"])] = int(r["pos"])
        neg[int(r["b"])] = int(r["neg"])
    tot_pos, tot_neg = sum(pos), sum(neg)
    weights = [
        round(
            (
                math.log((pos[b] + alpha) / (tot_pos + alpha * dim))
                - math.log((neg[b] + alpha) / (tot_neg + alpha * dim))
            )
            * SCALE
        )
        / SCALE
        for b in range(dim)
    ]
    bias = round(math.log(n_docs[1] / n_docs[0]) * SCALE) / SCALE
    return weights, bias
