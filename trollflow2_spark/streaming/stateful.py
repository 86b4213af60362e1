"""Custom stateful streaming operators (applyInPandasWithState).

The reference keeps no cross-message state (each message is an
independent job — SURVEY §2.10); a training-data intake pipeline does:
running per-source document counts, dedup-seen sets, rate monitors.
This module shows the engine's pattern for arbitrary keyed state:
``applyInPandasWithState`` — Arrow-batched groups, explicit state
object, event-time or processing-time timeouts bounding state size.

Scale notes: state is partitioned by the group key across executors and
persisted in the state store per micro-batch; the timeout is mandatory
hygiene at 100 TB (an unbounded keyed state is a slow OOM). Group keys
must be high-cardinality/uniform — a single hot key serializes into one
state partition (salt upstream if needed).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

RUNNING_COUNT_OUTPUT = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("n_batches", T.LongType()),
    ]
)

RUNNING_COUNT_STATE = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("n_batches", T.LongType()),
    ]
)


def _running_count_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    (n_events, n_batches) = state.get if state.exists else (0, 0)
    seen = 0
    for pdf in pdfs:
        seen += len(pdf)
    n_events += seen
    n_batches += 1
    state.update((n_events, n_batches))
    yield pd.DataFrame(
        {"key": [key[0]], "n_events": [n_events], "n_batches": [n_batches]}
    )


def running_counts(
    stream: DataFrame,
    key_col: str,
    timeout: str = "NoTimeout",
) -> DataFrame:
    """Running per-key event counts across micro-batches — the minimal
    custom stateful operator; swap the kernel to carry any state
    (seen-hash sets for streaming dedup, rate windows, ...).

    ``timeout``: ``"NoTimeout"`` or ``"ProcessingTimeTimeout"`` (callers
    then set ``state.setTimeoutDuration`` in a custom kernel to expire
    idle keys — the state-bound at scale).
    """
    mode = {
        "NoTimeout": GroupStateTimeout.NoTimeout,
        "ProcessingTimeTimeout": GroupStateTimeout.ProcessingTimeTimeout,
    }[timeout]
    keyed = stream.select(stream[key_col].cast("string").alias("key"))
    return keyed.groupBy("key").applyInPandasWithState(
        _running_count_fn,
        outputStructType=RUNNING_COUNT_OUTPUT,
        stateStructType=RUNNING_COUNT_STATE,
        outputMode="update",
        timeoutConf=mode,
    )
