"""SimHash near-duplicate fingerprints (Charikar '02, as used by Google
for web dedup — Manku et al., WWW'07).

Engine-portable bit construction: bit b of a token's hash is the parity
of the b-th hex character of ``md5(token)`` —
``ascii(substr(md5(tok), b+1, 1)) % 2`` — computable identically in
Spark and DuckDB (so the oracle reproduces fingerprints exactly).
The document's SimHash bit b is the sign of Σ_tokens (2·bit_b − 1)
weighted by token multiplicity.

Everything is one explode + one groupBy(doc) aggregation with B
conditional sums — the same fused-aggregation shape as the rule
compiler; no Python, one uniform shuffle on doc id.

``simhash_near_duplicates`` pairs docs with Hamming distance ≤ d. At
corpus scale candidates come from banding the bit vector (split into
d+1 segments — by pigeonhole two docs within distance d share ≥1 exact
segment), NOT from the all-pairs join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _token_bit(b: int):
    # parity of the b-th hex char of md5(token): '0'..'9','a'..'f' ascii.
    # Reads the PRE-COMPUTED '_md5' column: md5 inside each of the B
    # aggregate expressions would be evaluated B times per token row
    # (aggregates share no common-subexpression elimination).
    return F.ascii(F.substring(F.col("_md5"), b + 1, 1)) % 2


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 16,
) -> DataFrame:
    """(id, bit_0..bit_{B-1}) — per-doc SimHash bits (0/1 ints).
    Token multiplicity counts (no distinct), as in the original scheme."""
    toks = (
        df.where(F.col(text_col).isNotNull())
        .select(F.col(id_col).alias("id"), F.explode(F.split(F.col(text_col), " ")).alias("tok"))
        .select("id", F.md5(F.col("tok")).alias("_md5"))
    )
    aggs = [
        (F.sum(_token_bit(b) * 2 - 1) > 0).cast("int").alias(f"bit_{b}")
        for b in range(bits)
    ]
    return toks.groupBy("id").agg(*aggs)


def simhash_near_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 16,
    max_hamming: int = 3,
    banded: bool = True,
) -> DataFrame:
    """Pairs (id_a < id_b, hamming) with Hamming(simhash) ≤ max_hamming.

    banded=True (the scale path): split bits into (max_hamming+1)
    segments; by pigeonhole any pair within distance d agrees exactly on
    ≥1 segment, so candidates come from a groupBy on (segment_idx,
    segment_value) — never an all-pairs join. banded=False does the
    quadratic join (small inputs / oracle parity only).
    """
    sh = simhash(df, text_col, id_col, bits)
    a, b = sh.alias("a"), sh.alias("b")
    ham = sum(
        F.abs(F.col(f"a.bit_{i}") - F.col(f"b.bit_{i}")) for i in range(bits)
    ).alias("hamming")

    if not banded:
        return (
            a.join(b, F.col("a.id") < F.col("b.id"))
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), ham)
            .where(F.col("hamming") <= max_hamming)
        )

    nseg = max_hamming + 1
    seg_len = bits // nseg
    segs = F.array(
        *[
            F.struct(
                F.lit(j).alias("seg_idx"),
                F.concat_ws(
                    "",
                    *[
                        F.col(f"bit_{j * seg_len + r}")
                        for r in range(seg_len if j < nseg - 1 else bits - j * seg_len)
                    ],
                ).alias("seg_key"),
            )
            for j in range(nseg)
        ]
    )
    banded_df = sh.select("id", F.explode(segs).alias("s")).select(
        "id", F.col("s.seg_idx").alias("seg_idx"), F.col("s.seg_key").alias("seg_key")
    )
    ca, cb = banded_df.alias("ca"), banded_df.alias("cb")
    cands = (
        ca.join(cb, on=["seg_idx", "seg_key"])
        .where(F.col("ca.id") < F.col("cb.id"))
        .select(F.col("ca.id").alias("id_a"), F.col("cb.id").alias("id_b"))
        .distinct()
    )
    return (
        cands.join(a, cands.id_a == F.col("a.id"))
        .join(b, cands.id_b == F.col("b.id"))
        .select("id_a", "id_b", ham)
        .where(F.col("hamming") <= max_hamming)
    )
