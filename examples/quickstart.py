"""sparkcheck quickstart — the full engine surface on real testdata.

    python examples/quickstart.py [testdata_dir]

Profiles the documents table, runs a fused rule suite with violation
lineage, checks uniqueness + referential integrity, scores text quality,
finds near-duplicates with MinHash+LSH, detects drift between time
slices of events, and writes an HTML report.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sparkcheck.compile import summary_df, violation_rows
from sparkcheck.dedup import minhash_near_duplicates
from sparkcheck.drift import psi
from sparkcheck.integrity import orphan_summary, uniqueness_summary
from sparkcheck.io import write_validation_html
from sparkcheck.profile import profile_table
from sparkcheck.rules import EnumRule, LengthRule, NullCheckRule, RangeRule, RuleSet
from sparkcheck.run import ValidationEngine
from sparkcheck.session import get_spark
from sparkcheck.textstats import gopher_quality_flags, lang_id


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="quickstart", master="local[8]")
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    orders = spark.read.parquet(f"{sf}/orders.parquet")
    customer = spark.read.parquet(f"{sf}/customer.parquet")
    events = spark.read.parquet(f"{sf}/events.parquet")

    print("== 1. one-pass profile")
    prof = profile_table(docs, "documents")
    for name, cs in list(prof.columns.items())[:3]:
        print(f"   {name}: nulls={cs.null_count} ndv≈{cs.distinct_count} "
              f"min={cs.min_value!r} max={cs.max_value!r}")

    print("== 2. fused rule suite (ONE scan) + violation lineage")
    rules = [
        NullCheckRule(name="nn_text", column="text"),
        EnumRule(name="lang_ok", column="lang",
                 allowed_values=("en", "es", "fr", "de", "zh")),
        RangeRule(name="nchars", column="n_chars", min_value=0, max_value=1000),
        LengthRule(name="len_text", column="text", min_length=10),
    ]
    summary_df(docs, rules).show(truncate=False)
    violation_rows(docs, rules, key_cols=["doc_id"]).show(5)

    print("== 3. integrity: PK uniqueness + RI anti-join")
    uniqueness_summary(docs, ["doc_id"]).show()
    orphan_summary(orders, "o_custkey", customer, "c_custkey",
                   broadcast_parent=True).show()

    print("== 4. text quality + language ID")
    gq = gopher_quality_flags(docs)
    gq.agg(F.avg("keep").alias("keep_rate")).show()
    lang_id(docs).groupBy("pred_lang").count().show()

    print("== 5. MinHash+LSH near-duplicates")
    minhash_near_duplicates(docs, threshold=0.3).show(5)

    print("== 6. drift: PSI between event-type slices")
    print("   PSI(click vs view over value) =",
          round(psi(events, "value",
                    F.when(F.col("event_type") == "click", "a").otherwise("b"),
                    bins=10, lo=0.0, hi=500.0), 6))

    print("== 7. engine run + HTML report")
    report = ValidationEngine(spark).run(
        RuleSet(name="quickstart", rules=tuple(rules)), {"documents": docs}
    )
    out = "/tmp/sparkcheck_quickstart.html"
    write_validation_html(report, out)
    print(f"   suite passed={report.passed} → {out}")

    print("== 8. SQL unit tests (fluent + suite)")
    from sparkcheck.testing import (
        SparkTestRunner, SQLTestCase, SQLTestSuite, TestAssertion, TestFixture,
        expect,
    )

    expect(docs).row_count(at_least=1).column("doc_id").is_unique()
    suite = SQLTestSuite(name="doc_contract", tests=(
        SQLTestCase(
            name="docs_nonempty",
            sql="SELECT COUNT(*) AS n FROM d",
            fixtures=(TestFixture(name="d", table_name="d",
                                  fixture_type="parquet",
                                  data_source=f"{sf}/documents.parquet"),),
            assertions=(TestAssertion("greater_than", expected=0),),
        ),
    ))
    res = SparkTestRunner(spark).execute_suite(suite)
    print(f"   tests: {res.passed_tests}/{res.total_tests} passed")

    print("== 9. PII scrub + canonical dedup")
    from sparkcheck.dedup import keep_best_per_group
    from sparkcheck.textstats import pii_stats

    pii_stats(docs).agg(F.sum("n_pii_total").alias("pii_hits")).show()
    keep_best_per_group(
        docs.select("doc_id", F.md5("text").alias("grp"), "n_chars"),
        "grp", "n_chars",
    ).agg(F.count(F.lit(1)).alias("kept_groups")).show()


if __name__ == "__main__":
    main()
