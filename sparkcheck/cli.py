"""Command-line surface — the Spark-native analog of the reference CLI
(sqltest/cli/main.py:22-69: `sqltest profile`, `sqltest validate`,
`sqltest business-rules`).

    python -m sparkcheck profile  --table <parquet> [--columns a,b] --out profile.json
    python -m sparkcheck validate --table <parquet> --rules rules.yaml --out report.json
    python -m sparkcheck drift    --table <parquet> --baseline profile.json --out drift.json

Each subcommand builds one SparkSession, runs the corresponding engine
path, writes JSON, prints a one-line summary, and exits non-zero when
validation fails / drift is detected (CI-gate friendly, like the
reference's exit codes).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys


def _spark(cpus: str | None):
    from sparkcheck.session import get_spark

    return get_spark(app_name="sparkcheck-cli",
                     master=f"local[{cpus}]" if cpus else None)


def cmd_profile(args) -> int:
    from sparkcheck.profile import profile_table

    spark = _spark(args.cpus)
    df = spark.read.parquet(args.table)
    cols = args.columns.split(",") if args.columns else None
    prof = profile_table(df, table_name=args.table, columns=cols)
    payload = dataclasses.asdict(prof)
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=2, default=str)
    print(json.dumps({"table": args.table, "rows": prof.total_rows,
                      "columns": len(prof.columns), "out": args.out}))
    return 0


def cmd_validate(args) -> int:
    from sparkcheck.io.config import load_ruleset_yaml
    from sparkcheck.io.sinks import write_report_json
    from sparkcheck.run import ValidationEngine

    spark = _spark(args.cpus)
    rulesets = load_ruleset_yaml(args.rules)
    ruleset = rulesets[args.ruleset] if args.ruleset else next(iter(rulesets.values()))
    df = spark.read.parquet(args.table)
    report = ValidationEngine(spark).run(ruleset, {"table": df})
    write_report_json(report, args.out)
    print(json.dumps({"ruleset": ruleset.name, "passed": report.passed,
                      "violations": report.total_violations, "out": args.out}))
    return 0 if report.passed else 2


def cmd_drift(args) -> int:
    import dataclasses as dc

    from sparkcheck.drift import compare_profiles
    from sparkcheck.profile import profile_table
    from sparkcheck.profile.models import ColumnStatistics, TableProfile

    spark = _spark(args.cpus)
    with open(args.baseline) as f:
        raw = json.load(f)
    raw["columns"] = {k: ColumnStatistics(**v) for k, v in raw["columns"].items()}
    field_names = {f.name for f in dc.fields(TableProfile)}
    baseline = TableProfile(**{k: v for k, v in raw.items() if k in field_names})
    # Re-bin the current table on the BASELINE's histogram edges so the
    # PSI/KS comparison is over aligned bins.
    bounds = {
        c: (cs.histogram_lo, cs.histogram_hi)
        for c, cs in baseline.columns.items()
        if cs.histogram_lo is not None and cs.histogram_hi is not None
    }
    current = profile_table(
        spark.read.parquet(args.table), table_name=baseline.table,
        histogram_bounds=bounds or None,
    )
    delta = compare_profiles(baseline, current)
    with open(args.out, "w") as f:
        json.dump(dc.asdict(delta), f, indent=2, default=str)
    print(json.dumps({"has_drift": delta.has_drift, "out": args.out}))
    return 3 if delta.has_drift else 0


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="sparkcheck")
    ap.add_argument("--cpus", default=None, help="local[N] override")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("profile", help="one-pass table profile → JSON")
    p.add_argument("--table", required=True)
    p.add_argument("--columns", default=None)
    p.add_argument("--out", required=True)
    p.set_defaults(fn=cmd_profile)

    v = sub.add_parser("validate", help="run a YAML rule suite")
    v.add_argument("--table", required=True)
    v.add_argument("--rules", required=True)
    v.add_argument("--ruleset", default=None)
    v.add_argument("--out", required=True)
    v.set_defaults(fn=cmd_validate)

    d = sub.add_parser("drift", help="compare table vs stored baseline profile")
    d.add_argument("--table", required=True)
    d.add_argument("--baseline", required=True)
    d.add_argument("--out", required=True)
    d.set_defaults(fn=cmd_drift)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
