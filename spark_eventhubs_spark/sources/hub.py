"""SimulatedEventHubs — the file-backed event hub.

Port of the reference's test double onto parquet:
``core/src/main/scala/org/apache/spark/eventhubs/utils/SimulatedEventHubs.scala:30-258``
(in-memory name -> partitions -> Seq[EventData]; send round-robin or
pinned; receive(count, partition, seqNo); earliest/latest). Here the
backing store is a directory of parquet files in the canonical 9-column
schema (§1.2), so "the parquet reader *is* the receiver" — Spark's
vectorized scan replaces the AMQP receiver cache (ref
CachedEventHubsReceiver.scala:161-368, not needed on files).

Two modes:
- **view mode** (read-only): wraps the driver testdata ``events`` table
  through :func:`plans.hubview.hub_view`.
- **hub-dir mode** (read-write): a directory of parquet part files this
  class appends to via :meth:`send`; used by sink tests and streaming
  round-trips.

The latest-seqNo convention is last+1 and an empty partition's earliest
equals its latest (ref EventHubsClient.scala:128-134,
SimulatedEventHubs.scala:248-256).
"""

from __future__ import annotations

import os
from datetime import datetime, timezone
from typing import Dict, List, Optional, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_eventhubs_spark.conf import DEFAULT_PARTITION_COUNT
from spark_eventhubs_spark.plans.hubview import EVENT_HUBS_SCHEMA, hub_view


class SimulatedEventHubs:
    def __init__(
        self,
        spark: SparkSession,
        name: str = "events",
        partition_count: int = DEFAULT_PARTITION_COUNT,
        events_parquet: Optional[str] = None,
        hub_dir: Optional[str] = None,
        hub_log_dir: Optional[str] = None,
    ) -> None:
        if sum(x is not None for x in (events_parquet, hub_dir, hub_log_dir)) != 1:
            raise ValueError(
                "exactly one of events_parquet / hub_dir / hub_log_dir is required"
            )
        self.spark = spark
        self.name = name
        self.partition_count = partition_count
        self._events_parquet = events_parquet
        self._hub_dir = hub_dir
        self._hub_log_dir = hub_log_dir
        self._rr_next = 0  # round-robin cursor (ref SimulatedEventHubs.scala:86-101)
        if hub_dir:
            os.makedirs(hub_dir, exist_ok=True)

    # ---- read side ----
    def dataframe(self) -> DataFrame:
        """The full hub as a canonical 9-column DataFrame.

        hub-log mode is the steady-state path: sequence numbers are
        physical columns in a hive ``partition=<pid>/`` layout (written
        by ``datasource.materialize_hub`` or the write path), so range
        scans get partition pruning + parquet predicate pushdown with no
        window derivation. View mode derives the schema on the fly from
        the raw events table (one-time ingest cost, see plans/hubview)."""
        if self._hub_log_dir:
            return self.spark.read.schema(EVENT_HUBS_SCHEMA).parquet(self._hub_log_dir)
        if self._events_parquet:
            return hub_view(
                self.spark.read.parquet(self._events_parquet), self.partition_count
            )
        files = [f for f in os.listdir(self._hub_dir) if f.endswith(".parquet")]
        if not files:
            return self.spark.createDataFrame([], EVENT_HUBS_SCHEMA)
        return self.spark.read.schema(EVENT_HUBS_SCHEMA).parquet(
            *(os.path.join(self._hub_dir, f) for f in files)
        )

    def bounded_seq_nos(self) -> Dict[int, Tuple[int, int]]:
        """(earliest, latest) per partition; latest = max+1; empty
        partition: earliest == latest == 0
        (ref EventHubsClient.scala:124-139)."""
        rows = (
            self.dataframe()
            .groupBy("partition")
            .agg(
                F.min("sequenceNumber").alias("earliest"),
                (F.max("sequenceNumber") + 1).alias("latest"),
            )
            .collect()
        )
        out = {int(r["partition"]): (int(r["earliest"]), int(r["latest"])) for r in rows}
        for pid in range(self.partition_count):
            out.setdefault(pid, (0, 0))
        return out

    def earliest_seq_no(self, partition_id: int) -> int:
        return self.bounded_seq_nos()[partition_id][0]

    def latest_seq_no(self, partition_id: int) -> int:
        return self.bounded_seq_nos()[partition_id][1]

    def receive(self, partition_id: int, seq_no: int, count: int) -> List[dict]:
        """Exactly ``count`` events starting at ``seq_no``, seqNo-sorted —
        the correctness contract of the cached receiver
        (ref CachedEventHubsReceiver.scala:227-287)."""
        rows = (
            self.dataframe()
            .where(
                (F.col("partition") == str(partition_id))
                & (F.col("sequenceNumber") >= seq_no)
                & (F.col("sequenceNumber") < seq_no + count)
            )
            .orderBy("sequenceNumber")
            .collect()
        )
        if len(rows) != count:
            raise RuntimeError(
                f"receive contract violated: requested {count} events from "
                f"partition {partition_id} @ seqNo {seq_no}, got {len(rows)}"
            )
        return [r.asDict() for r in rows]

    # ---- write side (hub-dir mode) ----
    def send(
        self,
        bodies: List[bytes],
        partition_id: Optional[int] = None,
        partition_key: Optional[str] = None,
        properties: Optional[Dict[str, str]] = None,
    ) -> None:
        """Append events: pinned partition, key-hashed, or round-robin
        (ref SimulatedEventHubs.scala:86-140)."""
        if self._hub_dir is None:
            raise RuntimeError("send() requires hub-dir mode")
        if partition_id is not None and partition_key is not None:
            raise ValueError("partition and partitionKey are mutually exclusive")
        bounds = self.bounded_seq_nos()
        next_seq = {pid: bounds[pid][1] for pid in bounds}
        now = datetime.now(timezone.utc)
        rows = []
        for body in bodies:
            if partition_id is not None:
                pid = partition_id
            elif partition_key is not None:
                pid = _hash_partition_key(partition_key, self.partition_count)
            else:
                pid = self._rr_next % self.partition_count
                self._rr_next += 1
            # a send to a not-yet-seen partition id (dynamic partition
            # growth, ref EventHubsSourceSuite.scala:257-329) starts
            # its log at seqNo 0
            seq = next_seq.setdefault(pid, 0)
            next_seq[pid] = seq + 1
            rows.append(
                (
                    body if isinstance(body, (bytes, bytearray)) else str(body).encode(),
                    str(pid),
                    str(seq),
                    seq,
                    now,
                    None,
                    partition_key,
                    properties or {},
                    {},
                )
            )
        df = self.spark.createDataFrame(rows, EVENT_HUBS_SCHEMA)
        batch_no = len([f for f in os.listdir(self._hub_dir) if f.endswith(".parquet")])
        df.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(self._hub_dir, f"send-{batch_no:06d}.parquet")
        )

    def total_size(self) -> int:
        return sum(hi - lo for lo, hi in self.bounded_seq_nos().values())


def _hash_partition_key(key: str, partition_count: int) -> int:
    """Deterministic key->partition routing (stand-in for the service's
    hash; ref SimulatedEventHubs.scala key-routed send)."""
    import hashlib

    h = int.from_bytes(hashlib.md5(key.encode()).digest()[:8], "big")
    return h % partition_count
