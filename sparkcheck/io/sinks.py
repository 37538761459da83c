"""Sinks: violation rows to parquet, reports to JSON.

The reference exports summaries to JSON (business_rules/__init__.py:
443-529) and renders CSV/HTML dashboards (out of engine scope). At
cluster scale violation rows go to a partitioned parquet/Iceberg table —
NEVER to the driver; only the per-rule counters come back.
"""

from __future__ import annotations

import json
from dataclasses import asdict, is_dataclass
from typing import Any

from pyspark.sql import DataFrame


def write_violations(df: DataFrame, path: str, mode: str = "overwrite",
                     partition_by: tuple[str, ...] = ()) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_report_json(report: Any, path: str) -> None:
    if is_dataclass(report):
        payload = asdict(report)
    elif hasattr(report, "summary_dict"):
        payload = report.summary_dict()
    else:
        payload = report
    with open(path, "w") as f:
        json.dump(payload, f, indent=2, default=str)
