"""Word-shingle generation + exact n-gram Jaccard similarity on pairs.

Shingling is a pure higher-order-function projection (no Python):

    tokens   = split(text, ' ')
    shingles = transform(sequence(1, n-k+1), i -> array_join(slice(tokens, i, k), ' '))

Jaccard between two docs' shingle SETS is computed distributively:
explode distinct shingles, self-join on shingle → per-pair intersection
count; per-doc set sizes from one aggregation; |A∪B| = |A|+|B|−|A∩B|.

Scale: the shingle self-join is the classic hot spot — a shingle shared
by h docs produces h² pair rows. ``max_shingle_freq`` drops
super-common shingles (stopword phrases) before the join, the standard
guard in web-scale dedup (identical semantics applied in the oracle).
Pair generation is normally fed by LSH candidates (minhash.py), not the
full cross product.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def shingles_from_tokens(toks: Column, k: int) -> Column:
    """k-word shingles of an ALREADY-MATERIALIZED token-array column.

    The token array must be a plain column reference (or cheap to
    re-evaluate): Spark's higher-order functions are interpreted, and an
    expression referenced INSIDE the lambda is re-evaluated once per
    array element — a `split()` left in the lambda body makes shingling
    O(tokens²) per document (measured 4× the whole explode stage at
    250k webtext docs)."""
    n = F.size(toks)
    return F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda i: F.array_join(F.slice(toks, i, k), " "),
        ),
    ).otherwise(F.array(F.array_join(toks, " ")))


def shingle_expr(text_col: Column, k: int) -> Column:
    """k-word shingles straight from a text column. Prefer projecting
    `split(text, ' ')` to a column first and calling
    ``shingles_from_tokens`` — see its docstring for why (quadratic
    re-evaluation inside the interpreted lambda)."""
    return shingles_from_tokens(F.split(text_col, " "), k)


def shingles(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    distinct: bool = True,
) -> DataFrame:
    """(id, shingle) rows — k-word shingles; docs shorter than k words
    contribute their whole text as one shingle. ``distinct=True`` (the
    Jaccard set semantics) pays a row shuffle; duplicate-insensitive
    consumers (MinHash min-aggregation) pass False and skip it — ONE
    definition of the shingling convention either way."""
    sh = shingles_from_tokens(F.col("_toks"), k)
    # distinct=True needs only WITHIN-DOC set semantics — array_distinct
    # before the explode computes it in-row (map-only) instead of paying
    # a corpus-wide (id, shingle) row shuffle (the pre-round-7 shape).
    # Output is identical whenever ids are unique (the engine-wide
    # contract; duplicate ids previously had their copies' shingle sets
    # merged by the global distinct, which no caller relied on).
    if distinct:
        sh = F.array_distinct(sh)
    return (
        df.where(F.col(text_col).isNotNull())
        .select(F.col(id_col).alias("id"), F.split(F.col(text_col), " ").alias("_toks"))
        .select("id", F.explode(sh).alias("shingle"))
    )


def jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.5,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """All pairs (id_a < id_b) with shingle-set Jaccard ≥ threshold.

    One explode + one self-join on shingle + one pair aggregation.
    Quadratic in docs-per-shingle — use ``max_shingle_freq`` or the
    MinHash/LSH pipeline for corpus-scale inputs.
    """
    sh = shingles(df, text_col, id_col, k).persist()
    if max_shingle_freq is not None:
        common = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("f"))
            .where(F.col("f") > max_shingle_freq)
            .select("shingle")
        )
        sh = sh.join(F.broadcast(common), "shingle", "left_anti")
    # Dictionary-encode shingles to BIGINTs before the self-join: the
    # h² pair emission then joins/aggregates on 8-byte ints instead of
    # multi-word strings (measured 7.9 → 5.8 s on the 114M-pair sf1.0
    # pair mass). The id is rank-within-hash-bucket × n_buckets +
    # bucket: an exact bijection — no hash-collision caveat, collisions
    # only co-locate shingles in a bucket — that is deterministic
    # (xxhash64 + total order within bucket) and DISTRIBUTED: a global
    # row_number window funneled every distinct shingle through one
    # task, which a 10×-vocabulary corpus measured as the stage's
    # bottleneck (the bucketed form removes the single-partition sort).
    _nb = 1024
    dic = (
        sh.select("shingle")
        .distinct()
        .withColumn("_bk", F.pmod(F.xxhash64("shingle"), F.lit(_nb)).cast("int"))
        .select(
            "shingle",
            (
                F.row_number().over(
                    Window.partitionBy("_bk").orderBy("shingle")
                ).cast("long")
                * _nb
                + F.col("_bk")
            ).alias("_sid"),
        )
    )
    # persist the ENCODED frame: it has three consumers (sizes + both
    # join sides) which would each re-run the dictionary join
    sh = (
        sh.join(F.broadcast(dic), "shingle")
        .select("id", F.col("_sid").alias("shingle"))
        .persist()
    )
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, on="shingle")
        .where(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 4
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
    return out


def jaccard_for_pairs(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact shingle-set Jaccard computed ONLY for the given candidate
    pairs (columns id_a, id_b) — the scale-safe verify stage for LSH.

    Intersections are counted by routing id_a's shingles THROUGH the
    pair frame and equi-joining to id_b's shingles on (id_b, shingle):

        pairs ⋈ shingles(id_a)            → (id_a, id_b, shingle)   [|A| rows/pair]
              ⋈ shingles  on (id_b, shingle) → intersection rows    [|A∩B| rows/pair]

    Because id_b is part of the second join key, a boilerplate shingle
    shared by h candidate docs matches exactly once per pair instead of
    re-emitting h² rows — the all-pairs quadratic (jaccard_pairs'
    self-join on shingle alone) cannot re-grow here, no matter how
    near-dup-heavy the candidate set is. Work is Σ_pairs |A| + |A∩B|,
    i.e. linear in candidate-pair shingle mass. Pairs with empty
    intersection fall out (their Jaccard is 0 < threshold).
    """
    # distinct: a duplicated pair row would double-count every
    # intersection shingle and inflate jaccard (possibly above 1.0) —
    # cheap insurance, the pair frame is the small side by construction
    p = pairs.select("id_a", "id_b").distinct()
    # Restrict to docs that appear in at least one candidate pair BEFORE
    # shingling: at low candidate density (clean corpora, few LSH
    # collisions) this turns the shingle explode + size aggregation from
    # O(corpus shingle mass) into O(candidate shingle mass) — the
    # non-candidate docs never enter the shuffle at all. No broadcast
    # hint: the candidate-id set is usually small and AQE converts the
    # semi-join to broadcast at runtime, but on a near-dup-heavy corpus
    # it can be corpus-sized and must be allowed to shuffle.
    ids = (
        p.select(F.col("id_a").alias(id_col))
        .union(p.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    # localCheckpoint: the frame has three consumers (sizes + both join
    # sides) and each would re-run the corpus semi-join + shingle
    # explode (3 corpus scans when AQE broadcasts the id set). Bounded:
    # O(candidate shingle mass) by the restriction above.
    sh = shingles(
        df.join(ids, id_col, "left_semi"), text_col, id_col, k
    ).localCheckpoint()
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    a_sh = p.join(sh.withColumnRenamed("id", "id_a"), "id_a").select(
        "id_a", "id_b", "shingle"
    )
    inter = (
        a_sh.join(sh.withColumnRenamed("id", "id_b"), ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 4
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
