"""Custom stateful streaming operator: cross-batch deduplication.

``applyInPandasWithState`` keeps a per-key fingerprint set in the state
store, so a document whose content fingerprint was already seen in ANY
earlier micro-batch is flagged as a duplicate — the streaming analog of
exact dedup (dedup/exact.py), and the canonical "custom stateful
operator" shape of the north rule's streaming surface.

Keying: state is partitioned by a fingerprint PREFIX (the first
``prefix_len`` hex chars of md5), so state shards uniformly across
executors and each group's state holds only its prefix's fingerprints —
bounded per-shard memory at corpus scale (vs. one global set). The
output is (doc_id, fp, is_duplicate) per input row.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "doc_id long, fp string, is_duplicate boolean"
STATE_SCHEMA = "fps array<string>"


def _dedup_group(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    seen: set[str] = set(state.get[0]) if state.exists else set()
    for pdf in pdfs:
        flags = []
        for fp in pdf["fp"]:
            dup = fp in seen
            if not dup:
                seen.add(fp)
            flags.append(dup)
        yield pd.DataFrame(
            {"doc_id": pdf["doc_id"], "fp": pdf["fp"], "is_duplicate": flags}
        )
    state.update((sorted(seen),))


def streaming_dedup(
    stream_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    prefix_len: int = 2,
) -> DataFrame:
    """Flag rows whose content was seen in any earlier micro-batch.
    Returns an unstarted streaming frame (doc_id, fp, is_duplicate)."""
    fps = stream_df.select(
        F.col(id_col).alias("doc_id"),
        F.md5(F.col(text_col)).alias("fp"),
    ).withColumn("shard", F.substring("fp", 1, prefix_len))
    return fps.groupBy("shard").applyInPandasWithState(
        _dedup_group,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
