"""Performance benchmarking for SQL tests/queries — the Spark analog of
the reference's sql_testing/performance_benchmarking.py (timing stats,
load testing, regression detection against a stored baseline).

Driver-side timing around Spark actions; statistics over repetitions
(best/percentiles — wall-clock on shared infrastructure is noisy, so
best-of and p50 are the stable signals; means are reported but lie).
The regression gate stores baselines as JSON so CI can fail a PR that
slows a named query beyond tolerance.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import asdict, dataclass, field
from typing import Any, Callable, Sequence

from pyspark.sql import DataFrame, SparkSession


@dataclass
class BenchmarkResult:
    name: str
    reps: int
    best_sec: float
    p50_sec: float
    p95_sec: float
    mean_sec: float
    rows: int | None = None
    samples: list[float] = field(default_factory=list)

    def as_dict(self) -> dict[str, Any]:
        return asdict(self)


def _percentile(sorted_vals: Sequence[float], q: float) -> float:
    """Linear-interpolated percentile (numpy 'linear', the default)."""
    if not sorted_vals:
        return float("nan")
    k = (len(sorted_vals) - 1) * q
    lo, hi = int(k), min(int(k) + 1, len(sorted_vals) - 1)
    frac = k - lo
    return sorted_vals[lo] * (1 - frac) + sorted_vals[hi] * frac


def benchmark_query(
    spark: SparkSession,
    query: "str | Callable[[], DataFrame] | DataFrame",
    name: str = "query",
    reps: int = 5,
    warmup: int = 1,
) -> BenchmarkResult:
    """Time a query's full execution (action = count) ``reps`` times
    after ``warmup`` untimed runs. Accepts a SQL string, a zero-arg
    callable returning a DataFrame (fresh plan per rep — recommended, a
    reused DataFrame may cache shuffle files), or a DataFrame."""

    def frame() -> DataFrame:
        if isinstance(query, str):
            return spark.sql(query)
        if callable(query):
            return query()
        return query

    rows = None
    for _ in range(max(warmup, 0)):
        rows = frame().count()
    samples: list[float] = []
    for _ in range(reps):
        t0 = time.perf_counter()
        rows = frame().count()
        samples.append(time.perf_counter() - t0)
    s = sorted(samples)
    return BenchmarkResult(
        name=name,
        reps=reps,
        best_sec=round(s[0], 4),
        p50_sec=round(_percentile(s, 0.5), 4),
        p95_sec=round(_percentile(s, 0.95), 4),
        mean_sec=round(sum(s) / len(s), 4),
        rows=rows,
        samples=[round(x, 4) for x in samples],
    )


def benchmark_concurrent(
    spark: SparkSession,
    queries: Sequence[Callable[[], DataFrame]],
    workers: int = 4,
    pool: str | None = "sparkcheck-bench",
) -> dict[str, float]:
    """Load test: submit all queries concurrently from ``workers`` driver
    threads (FAIR pool) and report aggregate wall time vs the sum of
    individual times — the reference's load-testing scenario
    (performance_benchmarking.py), Spark-style: concurrency overlaps
    cluster scans, the driver threads just submit."""
    from concurrent.futures import ThreadPoolExecutor

    sc = spark.sparkContext

    def _run(fn: Callable[[], DataFrame]) -> float:
        if pool:
            sc.setLocalProperty("spark.scheduler.pool", pool)
        try:
            t0 = time.perf_counter()
            fn().count()
            return time.perf_counter() - t0
        finally:
            if pool:
                sc.setLocalProperty("spark.scheduler.pool", None)

    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=workers) as tp:
        individual = list(tp.map(_run, queries))
    wall = time.perf_counter() - t0
    return {
        "n_queries": len(queries),
        "workers": workers,
        "wall_sec": round(wall, 4),
        "sum_individual_sec": round(sum(individual), 4),
        "overlap_factor": round(sum(individual) / wall, 2) if wall > 0 else 0.0,
    }


def regression_gate(
    result: BenchmarkResult,
    baseline_path: str,
    tolerance: float = 1.5,
    metric: str = "p50_sec",
    update: bool = False,
) -> tuple[bool, float]:
    """Compare a benchmark against the stored baseline for its name.
    Returns (ok, ratio). ratio = current/baseline on ``metric``; ok when
    ratio <= tolerance (or no baseline yet). ``update=True`` (or a
    missing entry) writes the current figures back — the reference's
    regression-detection flow (performance_benchmarking.py) with a JSON
    store."""
    baselines: dict[str, Any] = {}
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            baselines = json.load(f)
    prior = baselines.get(result.name)
    cur = getattr(result, metric)
    if prior is None or update:
        baselines[result.name] = result.as_dict()
        with open(baseline_path, "w") as f:
            json.dump(baselines, f, indent=2)
        return True, 1.0
    ratio = cur / prior[metric] if prior.get(metric) else 1.0
    return ratio <= tolerance, round(ratio, 3)
