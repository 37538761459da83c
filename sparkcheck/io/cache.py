"""Shared probe-then-build parquet cache.

Three sites grew hand-rolled copies of the same pattern (pipeline stage
checkpoints, the generated-fixture cache, the bench webtext
materialization): check for Spark's ``_SUCCESS`` marker, build + write
the frame if absent, read it back. This is the single definition, with
the two correctness details the copies kept diverging on:

- the marker is probed through the **Hadoop FileSystem API**, not
  driver-local ``os.path`` — the write goes through Spark's
  filesystem, so an os-path probe is always False for hdfs:// / s3a://
  paths and the cache silently never hits there;
- probe+write holds a **per-path in-process lock** — driver threads
  (parallel test suites, orchestrated rule-sets) sharing one cold cache
  entry must not race ``mode("overwrite")`` writes to the same path
  (concurrent overwrites delete each other's in-flight _temporary dirs
  or interleave part files under one _SUCCESS). Cross-PROCESS races are
  out of scope: concurrent drivers need an external coordinator
  (the same caveat as any non-transactional parquet write; use Iceberg
  /Delta commits for that).
"""

from __future__ import annotations

import threading
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

_locks_guard = threading.Lock()
_locks: dict[str, threading.Lock] = {}


def _path_lock(path: str) -> threading.Lock:
    with _locks_guard:
        return _locks.setdefault(path, threading.Lock())


def marker_exists(spark: SparkSession, path: str) -> bool:
    """True when ``path`` exists on the filesystem Spark writes through
    (works for file://, hdfs://, s3a://, ... alike)."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(hpath))


def cached_parquet(
    spark: SparkSession, path: str, build: Callable[[], DataFrame]
) -> DataFrame:
    """Return ``spark.read.parquet(path)``, building and persisting it
    first if the ``_SUCCESS`` completion marker is absent. The marker is
    written atomically by Spark's commit protocol after all tasks
    succeed, so a killed mid-write build is rebuilt (mode=overwrite) on
    the next call."""
    path = path.rstrip("/")
    with _path_lock(path):
        if not marker_exists(spark, path + "/_SUCCESS"):
            build().write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)
