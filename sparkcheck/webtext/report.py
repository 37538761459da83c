"""One-call corpus report card — the pre-training data review every
pipeline runs before a corpus ships: volume, token mass, quality,
language mix, PII exposure, repetition, and duplication, composed from
this package's verified operators into one summary dict + an HTML
section.

Cost model (documented, not hidden): one aggregation pass per metric
family — each family is a map-only projection + tree-reduce (no row
shuffle except the md5 groupBy for exact dups and the tiny lang
groupBy), so the report is ~7 pruned scans of the text column. Pass
``storage_level`` to persist the filtered base once instead (the right
call for remote/non-columnar sources; for local parquet the re-scan
usually wins — BENCH/VERDICTS_SINK.md). This is a diagnostic run, not
a hot path: correctness of each family is carried by its own
oracle-checked operator.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, functions as F


def corpus_report(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_top_k: int = 10,
    storage_level=None,
    reference_lm: DataFrame | None = None,
) -> dict[str, Any]:
    """Corpus-quality summary dict (JSON-serializable). Pass a
    ``textstats.lm.train_ngram_counts`` frame as ``reference_lm`` to
    add the CCNet perplexity family (mean / p50 / p90 vs the trusted
    corpus — one more pruned scan)."""
    base = df
    if storage_level is not None:
        base = base.persist(storage_level)
    try:
        return _collect_report(base, text_col, id_col, lang_top_k, reference_lm)
    finally:
        if storage_level is not None:
            base.unpersist()


def _collect_report(
    base: DataFrame,
    text_col: str,
    id_col: str,
    lang_top_k: int,
    reference_lm: DataFrame | None = None,
) -> dict[str, Any]:
    from sparkcheck.dedup import exact_duplicate_groups
    from sparkcheck.textstats import (
        gopher_quality_flags,
        lang_id,
        pii_stats,
        quality_score,
        repetition_stats,
        token_stats,
    )

    vol = base.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum(F.col(text_col).isNull().cast("long")).alias("null_text"),
    ).collect()[0]

    tok = token_stats(base, text_col, id_col).agg(
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.round(F.avg("n_tokens"), 2).alias("mean_tokens_per_doc"),
        F.round(F.avg(F.col("n_distinct_tokens") / F.col("n_tokens")), 4).alias(
            "mean_distinct_ratio"
        ),
    ).collect()[0]

    qual = quality_score(base, text_col, id_col).agg(
        F.round(F.avg("quality"), 4).alias("mean_quality"),
    ).collect()[0]
    keep = gopher_quality_flags(base, text_col, id_col).agg(
        F.round(F.avg("keep"), 4).alias("gopher_keep_rate"),
    ).collect()[0]

    langs = {
        r["pred_lang"]: r["n"]
        for r in (
            lang_id(base, text_col, id_col)
            .groupBy("pred_lang")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.desc("n"), "pred_lang")
            .limit(lang_top_k)
            .collect()
        )
    }

    pii = pii_stats(base, text_col, id_col).agg(
        F.round(F.avg("any_pii"), 4).alias("any_pii_rate"),
        F.sum("n_pii_total").cast("long").alias("total_pii_hits"),
    ).collect()[0]

    rep = repetition_stats(base, text_col=text_col, id_col=id_col).agg(
        F.round(F.avg("f_repetitive"), 4).alias("repetitive_rate"),
    ).collect()[0]

    dup = exact_duplicate_groups(base, text_col, id_col).agg(
        F.coalesce(F.sum(F.col("n_copies") - 1), F.lit(0)).cast("long").alias(
            "exact_dup_docs"
        ),
    ).collect()[0]
    n_docs = int(vol["docs"])
    # sum over zero rows is NULL — an empty table must return a zeroed
    # report, not a TypeError
    n_null = int(vol["null_text"] or 0)
    n_nonnull = n_docs - n_null

    ppl = None
    if reference_lm is not None:
        from sparkcheck.textstats.lm import perplexity_scores

        row = perplexity_scores(base, reference_lm, text_col, id_col).agg(
            F.round(F.avg("perplexity"), 3).alias("mean"),
            F.percentile_approx("perplexity", 0.5).alias("p50"),
            F.percentile_approx("perplexity", 0.9).alias("p90"),
        ).collect()[0]
        ppl = {
            "mean": float(row["mean"] or 0.0),
            "p50": float(row["p50"] or 0.0),
            "p90": float(row["p90"] or 0.0),
        }

    return {
        **({"perplexity": ppl} if ppl is not None else {}),
        "docs": n_docs,
        "null_text": n_null,
        "tokens": {
            "total": int(tok["total_tokens"] or 0),
            "mean_per_doc": float(tok["mean_tokens_per_doc"] or 0.0),
            "mean_distinct_ratio": float(tok["mean_distinct_ratio"] or 0.0),
        },
        "quality": {
            "mean_quality": float(qual["mean_quality"] or 0.0),
            "gopher_keep_rate": float(keep["gopher_keep_rate"] or 0.0),
        },
        "langs": langs,
        "pii": {
            "any_pii_rate": float(pii["any_pii_rate"] or 0.0),
            "total_hits": int(pii["total_pii_hits"] or 0),
        },
        "repetition": {"repetitive_rate": float(rep["repetitive_rate"] or 0.0)},
        "duplication": {
            "exact_dup_docs": int(dup["exact_dup_docs"]),
            "exact_dup_rate": round(dup["exact_dup_docs"] / n_nonnull, 4)
            if n_nonnull
            else 0.0,
        },
    }


def render_corpus_html(report: dict[str, Any], title: str = "corpus report") -> str:
    """Self-contained HTML section for a corpus_report dict (language
    mix as the same inline-SVG bars the profile dashboard uses)."""
    import html as _html

    from sparkcheck.io.html_report import _CSS, _topk_chart

    t = report["tokens"]
    q = report["quality"]
    p = report["pii"]
    d = report["duplication"]
    rows = [
        ("documents", f'{report["docs"]:,}'),
        ("null text", f'{report["null_text"]:,}'),
        ("total tokens", f'{t["total"]:,}'),
        ("mean tokens / doc", f'{t["mean_per_doc"]:.2f}'),
        ("mean distinct-token ratio", f'{t["mean_distinct_ratio"]:.4f}'),
        ("mean quality score", f'{q["mean_quality"]:.4f}'),
        ("Gopher keep rate", f'{q["gopher_keep_rate"]:.2%}'),
        ("PII: docs affected", f'{p["any_pii_rate"]:.2%}'),
        ("PII: total hits", f'{p["total_hits"]:,}'),
        ("repetitive docs", f'{report["repetition"]["repetitive_rate"]:.2%}'),
        ("exact duplicate docs", f'{d["exact_dup_docs"]:,} ({d["exact_dup_rate"]:.2%})'),
    ]
    if "perplexity" in report:
        pp = report["perplexity"]
        rows.append(
            (
                "LM perplexity (mean / p50 / p90)",
                f'{pp["mean"]:.1f} / {pp["p50"]:.1f} / {pp["p90"]:.1f}',
            )
        )
    table = "".join(
        f"<tr><td>{_html.escape(k)}</td><td>{_html.escape(v)}</td></tr>"
        for k, v in rows
    )
    lang_chart = _topk_chart(
        [{"value": k, "count": v} for k, v in report["langs"].items()]
    )
    return (
        f'<!doctype html><html><head><meta charset="utf-8">'
        f"<title>{_html.escape(title)}</title><style>{_CSS}</style></head>"
        f"<body><h1>{_html.escape(title)}</h1>"
        f"<table><tr><th>metric</th><th>value</th></tr>{table}</table>"
        f"<h2>Language mix</h2>{lang_chart}</body></html>"
    )
