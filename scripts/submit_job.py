"""Cluster entry point for spark-submit:

    spark-submit --py-files dist/sparkcheck.zip scripts/submit_job.py \
        --table <parquet_path> --rules <rules.yaml> --out <dir> \
        [--checkpoint <ckpt_dir> --group-col <partition_col>]

Runs the fused validation suite — with per-partition-group
checkpoint/resume when --checkpoint is given — writes the per-rule
summary JSON, and prints docs/sec. On a cluster the SparkSession config
(master, executors) comes from spark-submit.
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--table", required=True)
    ap.add_argument("--rules", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--group-col", default=None,
                    help="partition column for checkpointed per-group runs")
    ap.add_argument("--ruleset", default=None, help="rule-set name in the YAML")
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    try:
        from sparkcheck.io.config import load_ruleset_yaml
    except ModuleNotFoundError:
        # local run without --py-files: fall back to the repo checkout
        import sys

        sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        from sparkcheck.io.config import load_ruleset_yaml
    from sparkcheck.run.engine import ValidationEngine

    # Under spark-submit the driver JVM is already up and these configs
    # are inert (memory comes from --driver-memory / the cluster
    # manager). For LOCAL python runs they apply at JVM launch — the
    # 1g default heap OOMs on multi-million-row shuffles.
    spark = (
        SparkSession.builder.appName("sparkcheck-validate")
        .config("spark.driver.memory", os.environ.get("SPARKCHECK_DRIVER_MEM", "8g"))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    rulesets = load_ruleset_yaml(args.rules)
    ruleset = rulesets[args.ruleset] if args.ruleset else next(iter(rulesets.values()))
    df = spark.read.parquet(args.table)
    n = df.count()

    t0 = time.perf_counter()
    if args.checkpoint:
        from sparkcheck.rules.models import RuleSet
        from sparkcheck.run.checkpoint import CheckpointStore, checkpointed_validate
        from sparkcheck.run.engine import ValidationEngine, split_rules

        # Row-predicate rules run per partition-group with resume; join/SQL
        # rules (unique, RI) are global by nature and run once, unsplit.
        row_rules, other_rules = split_rules(ruleset.enabled_rules())
        group = F.col(args.group_col) if args.group_col else F.spark_partition_id()
        results = checkpointed_validate(
            spark, df, row_rules, group,
            CheckpointStore(args.checkpoint), suite_name=ruleset.name,
        )
        outcomes = [dict(o, group_id=r.group_id) for r in results for o in r.outcomes]
        if other_rules:
            rest = RuleSet(name=f"{ruleset.name}__global", rules=tuple(other_rules))
            report = ValidationEngine(spark).run(rest, {"table": df})
            outcomes += [
                {k: getattr(o, k) for k in
                 ("rule_id", "table", "column", "passed", "violations",
                  "evaluated", "total_rows", "severity", "skipped")}
                for o in report.outcomes
            ]
    else:
        report = ValidationEngine(spark).run(ruleset, {"table": df})
        outcomes = [
            {k: getattr(o, k) for k in
             ("rule_id", "table", "column", "passed", "violations",
              "evaluated", "total_rows", "severity", "skipped")}
            for o in report.outcomes
        ]
    elapsed = time.perf_counter() - t0

    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump({"table": args.table, "rows": n,
                   "elapsed_sec": round(elapsed, 2),
                   "docs_per_sec": round(n / elapsed, 1) if elapsed > 0 else None,
                   "outcomes": outcomes}, f, indent=2, default=str)
    print(json.dumps({"rows": n, "elapsed_sec": round(elapsed, 2),
                      "docs_per_sec": round(n / elapsed, 1)}))


if __name__ == "__main__":
    main()
