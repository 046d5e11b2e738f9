"""Micro-batch streaming source + replay runner.

Port of ``EventHubsSource``
(core/src/main/scala/org/apache/spark/sql/eventhubs/EventHubsSource.scala):

- ``get_offset`` (ref :206-244): probe earliest/latest per partition,
  apply the proportional+performance-weighted rate limit, emit the next
  checkpoint offset.
- ``adjust_starting_offset`` (ref :246-260): clamp starts to
  service-earliest, reporting possible data loss.
- ``get_batch`` (ref :329-420): diff two offsets into OffsetRange[],
  scan them as a DataFrame. New partitions appearing mid-stream start
  at their translated default (ref :183-192, 350-366).
- initial positions come from the v1 metadata log when present —
  checkpoint recovery — else from the conf's starting positions
  (ref :118-198).

``MicroBatchRunner`` replaces Spark's MicroBatchExecution for the
file-backed hub: it drives getOffset/getBatch in a loop with
Spark-compatible checkpoint layout (``offsets/<id>`` planned before
execution, ``commits/<id>`` after — planning is exactly-once, user
processing is at-least-once, same contract as the reference sink's
batchId dedup). Executor-side per-partition receive timing flows back
through an ``applyInPandas`` measurement pass — the Spark-native
equivalent of the reference's PartitionPerformanceReceiver RPC
(PartitionPerformanceReceiver.scala:27-67) — feeding
PartitionsStatusTracker, which modulates the next batch's rate limit.

Scale: everything the driver does here is O(partitions) dict math plus
one bounded-seqNo aggregation per trigger; the scan itself is a
filtered parquet read that Catalyst prunes. Nothing on this path
collects event data to the driver.
"""

from __future__ import annotations

import logging
import os
import time
from typing import Callable, Dict, List, Optional, Tuple

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

from spark_eventhubs_spark.conf import EventHubsConf
from spark_eventhubs_spark.offsets import (
    EventHubsSourceOffset,
    NameAndPartition,
    OffsetRange,
)
from spark_eventhubs_spark.sources.batch import scan_ranges
from spark_eventhubs_spark.sources.client import SimulatedClient
from spark_eventhubs_spark.sources.hub import SimulatedEventHubs
from spark_eventhubs_spark.streaming.ratelimit import rate_limit
from spark_eventhubs_spark.streaming.tracker import PartitionsStatusTracker

log = logging.getLogger(__name__)


class EventHubsSource:
    def __init__(
        self,
        spark: SparkSession,
        conf: EventHubsConf,
        hub: SimulatedEventHubs,
        metadata_path: Optional[str] = None,
        fail_on_data_loss: bool = False,
        tracker: Optional[PartitionsStatusTracker] = None,
    ) -> None:
        self.spark = spark
        self.conf = conf
        self.hub = hub
        # AAD callback executes at client creation, exactly where the
        # reference invokes it (client/ClientConnectionPool.scala:63-80)
        from spark_eventhubs_spark.auth import acquire_connection_token

        acquire_connection_token(conf)
        self.client = SimulatedClient(hub)
        self.metadata_path = metadata_path
        self.fail_on_data_loss = fail_on_data_loss
        self.name = conf.name or hub.name
        self.slow_partition_adjustment = conf.slow_partition_adjustment
        self.tracker = tracker or PartitionsStatusTracker(
            hub.partition_count, conf.max_acceptable_batch_receive_time_ms
        )
        self.max_offsets_per_trigger: Optional[int] = None
        # bare key first, prefixed alias second (EventHubsConf.scala:711-712)
        raw = conf.get("maxEventsPerTrigger") or conf.get("eventhubs.maxEventsPerTrigger")
        if raw is not None:
            self.max_offsets_per_trigger = int(raw)
        self.current_seq_nos: Optional[Dict[int, int]] = None
        self._earliest: Optional[Dict[int, int]] = None
        self._initial: Optional[Dict[int, int]] = None

    # ---- initial positions w/ metadata log (ref :118-198) ----
    @property
    def initial_partition_seq_nos(self) -> Dict[int, int]:
        if self._initial is not None:
            return self._initial
        if self.metadata_path:
            path = os.path.join(self.metadata_path, "0")
            if os.path.exists(path):
                with open(path) as fh:
                    off = EventHubsSourceOffset.deserialize_metadata(fh.read())
                self._initial = {
                    nap.partition_id: seq
                    for nap, seq in off.partition_to_seq_nos.items()
                }
                return self._initial
        self._initial = self.client.translate(self.conf, use_start=True)
        if self.metadata_path:
            os.makedirs(self.metadata_path, exist_ok=True)
            off = EventHubsSourceOffset(
                {NameAndPartition(self.name, p): s for p, s in self._initial.items()}
            )
            with open(os.path.join(self.metadata_path, "0"), "w") as fh:
                fh.write(off.serialize_metadata())
        return self._initial

    # ---- getOffset (ref :206-244) ----
    def get_offset(self) -> EventHubsSourceOffset:
        self.initial_partition_seq_nos
        bounds = self.client.all_bounded_seq_nos()
        self._earliest = {p: e for p, (e, _) in bounds.items()}
        latest = {p: l for p, (_, l) in bounds.items()}

        if self.conf.max_rate_configured:
            # DStream-semantics per-partition clamp, kept alive for the
            # Structured Streaming source: upperBound = min(from +
            # maxRate_p, latest) (EventHubsDirectDStream.scala:97-105;
            # per-partition overrides beat the global scalar,
            # EventHubsConf.scala:344-346). Applied BEFORE the
            # proportional maxEventsPerTrigger split, so both admission
            # controls compose.
            start = (self.current_seq_nos if self.current_seq_nos is not None
                     else self.initial_partition_seq_nos)
            adjusted = self._adjust_starting_offset(start)
            # max(from, ...) mirrors the reference clamp's lower-
            # bound guard (EventHubsDirectDStream.scala:106): if the
            # hub's reported latest ever regresses below the
            # checkpointed position, hold at `from` rather than moving
            # the until-offset backwards.
            latest = {
                p: max(
                    adjusted.get(p, self._earliest.get(p, 0)),
                    min(l, adjusted.get(p, self._earliest.get(p, 0))
                        + self.conf.max_rate_per_partition_for(p)),
                )
                for p, l in latest.items()
            }

        if self.max_offsets_per_trigger is None:
            seq_nos = latest
        else:
            start = (self.current_seq_nos if self.current_seq_nos is not None
                     else self.initial_partition_seq_nos)
            adjusted = self._adjust_starting_offset(start)
            factors = None
            if self.slow_partition_adjustment:
                factors = (self.tracker.partitions_performance_percentage()
                           or self.tracker.default_percentages())
            seq_nos = rate_limit(
                self.max_offsets_per_trigger, adjusted, latest, self._earliest, factors
            )
        self.current_seq_nos = seq_nos
        return EventHubsSourceOffset(
            {NameAndPartition(self.name, p): s for p, s in seq_nos.items()}
        )

    # ---- data-loss guard (ref :246-260) ----
    def _adjust_starting_offset(self, from_seq_nos: Dict[int, int]) -> Dict[int, int]:
        assert self._earliest is not None
        out = {}
        for pid, seq in from_seq_nos.items():
            earliest = self._earliest.get(pid, 0)
            if seq < earliest:
                msg = (f"starting seqNo {seq} in partition {pid} is behind the "
                       f"earliest {earliest}; some events may have expired")
                if self.fail_on_data_loss:
                    raise RuntimeError(msg)
                log.warning("%s — clamping", msg)
                out[pid] = earliest
            else:
                out[pid] = seq
        return out

    # ---- getBatch (ref :329-420) ----
    def get_batch(
        self,
        start: Optional[EventHubsSourceOffset],
        end: EventHubsSourceOffset,
    ) -> Tuple[DataFrame, List[OffsetRange]]:
        init = self.initial_partition_seq_nos
        if start is not None:
            from_map = {nap.partition_id: s for nap, s in start.partition_to_seq_nos.items()}
        else:
            from_map = dict(init)
        until_map = {nap.partition_id: s for nap, s in end.partition_to_seq_nos.items()}

        # partitions added since the last batch start at their default
        # translated position (ref :183-192, 350-366)
        new_partitions = set(until_map) - set(from_map)
        for pid in sorted(new_partitions):
            from_map[pid] = self.conf.starting_position_for(pid).seq_no or 0

        if self._earliest is None:
            bounds = self.client.all_bounded_seq_nos()
            self._earliest = {p: e for p, (e, _) in bounds.items()}
        adjusted = self._adjust_starting_offset(from_map)

        ranges = [
            OffsetRange(
                NameAndPartition(self.name, pid),
                min(adjusted[pid], until_map[pid]),
                until_map[pid],
            )
            for pid in sorted(until_map)
        ]
        df = scan_ranges(self.hub.dataframe(), ranges)
        return df, ranges

    def stop(self) -> None:
        self.tracker.clean_up()


# measurement pass schema for the S23-equivalent metrics channel
_MEASURE_SCHEMA = "partition_id int, request_seq_no long, batch_size long, elapsed_ms long"


def measure_partition_receive(df: DataFrame, ranges: List[OffsetRange]) -> List[dict]:
    """Executor-side per-partition receive measurement: one
    applyInPandas group per hub partition times the materialization of
    its slice and ships (partition, requestSeqNo, batchSize, elapsedMs)
    back — the Spark-native PartitionPerformanceReceiver.

    With a local parquet hub real slow partitions don't occur, so tests
    drive the tracker with scripted timings; this pass proves the
    plumbing and provides real numbers on real clusters.
    """
    seq_by_pid = {r.partition_id: r.from_seq_no for r in ranges}

    def _measure(pdf: pd.DataFrame) -> pd.DataFrame:
        t0 = time.perf_counter()
        n = len(pdf)
        _ = pdf["sequenceNumber"].sum()  # touch the batch
        elapsed_ms = int((time.perf_counter() - t0) * 1000)
        pid = int(pdf["partition"].iloc[0]) if n else -1
        return pd.DataFrame(
            [[pid, -1, n, elapsed_ms]],
            columns=["partition_id", "request_seq_no", "batch_size", "elapsed_ms"],
        )

    rows = (
        df.groupBy("partition")
        .applyInPandas(_measure, _MEASURE_SCHEMA)
        .collect()
    )
    out = []
    for r in rows:
        pid = r["partition_id"]
        if pid < 0:
            continue
        out.append(
            dict(
                partition_id=pid,
                request_seq_no=seq_by_pid.get(pid, -1),
                batch_size=r["batch_size"],
                elapsed_ms=r["elapsed_ms"],
            )
        )
    return out


class MicroBatchRunner:
    """foreachBatch-style replay loop with Spark checkpoint layout.

    - ``offsets/<batchId>`` is written BEFORE running the batch
      (planned intent), ``commits/<batchId>`` after user processing —
      on restart an uncommitted planned batch is re-executed from its
      offsets file: exactly-once planning, at-least-once processing.
    - pairs with the sink's batchId dedup (write_eventhubs(batch_id=))
      for end-to-end effectively-once into a hub.
    """

    def __init__(
        self,
        source: EventHubsSource,
        checkpoint_dir: str,
        process_fn: Callable[[DataFrame, int], None],
        measure_partitions: bool = False,
        throttling_status_plugin=None,
    ) -> None:
        self.source = source
        self.checkpoint_dir = checkpoint_dir
        self.process_fn = process_fn
        self.measure_partitions = measure_partitions
        self.throttling_status_plugin = throttling_status_plugin
        os.makedirs(os.path.join(checkpoint_dir, "offsets"), exist_ok=True)
        os.makedirs(os.path.join(checkpoint_dir, "commits"), exist_ok=True)

    def _dir_ids(self, sub: str) -> List[int]:
        d = os.path.join(self.checkpoint_dir, sub)
        return sorted(int(f) for f in os.listdir(d) if f.isdigit())

    def _read_offsets(self, batch_id: int) -> EventHubsSourceOffset:
        with open(os.path.join(self.checkpoint_dir, "offsets", str(batch_id))) as fh:
            return EventHubsSourceOffset.deserialize_metadata(fh.read())

    def _write(self, sub: str, batch_id: int, content: str) -> None:
        path = os.path.join(self.checkpoint_dir, sub, str(batch_id))
        tmp = path + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(content)
        os.replace(tmp, path)

    def run(self, max_batches: Optional[int] = None) -> int:
        """Run until caught up (a trigger advances nothing) or
        ``max_batches``. Returns the number of batches executed."""
        executed = 0
        planned = self._dir_ids("offsets")
        committed = set(self._dir_ids("commits"))

        prev: Optional[EventHubsSourceOffset] = None
        next_id = 0
        if planned:
            last_planned = planned[-1]
            if last_planned in committed:
                prev = self._read_offsets(last_planned)
                self.source.current_seq_nos = {
                    nap.partition_id: s
                    for nap, s in prev.partition_to_seq_nos.items()
                }
                next_id = last_planned + 1
            else:
                # replay the planned-but-uncommitted batch
                end = self._read_offsets(last_planned)
                prev_off = (self._read_offsets(last_planned - 1)
                            if last_planned - 1 in committed or last_planned - 1 in set(planned)
                            else None)
                self._execute(last_planned, prev_off, end)
                executed += 1
                prev = end
                self.source.current_seq_nos = {
                    nap.partition_id: s for nap, s in end.partition_to_seq_nos.items()
                }
                next_id = last_planned + 1

        while max_batches is None or executed < max_batches:
            end = self.source.get_offset()
            if prev is not None and end.partition_to_seq_nos == prev.partition_to_seq_nos:
                break  # caught up
            if self.throttling_status_plugin is not None:
                self.throttling_status_plugin.on_batch_creation(
                    next_id, [], self.source.tracker.partitions_performance_percentage()
                )
            self._write("offsets", next_id, end.serialize_metadata())
            self._execute(next_id, prev, end)
            executed += 1
            prev = end
            next_id += 1
        return executed

    def _execute(
        self,
        batch_id: int,
        start: Optional[EventHubsSourceOffset],
        end: EventHubsSourceOffset,
    ) -> None:
        df, ranges = self.source.get_batch(start, end)
        tracker = self.source.tracker
        if self.source.slow_partition_adjustment:
            tracker.add_batch(batch_id, ranges)
        self.process_fn(df, batch_id)
        if self.source.slow_partition_adjustment and self.measure_partitions:
            for m in measure_partition_receive(df, ranges):
                tracker.update_partition_performance(
                    m["partition_id"], m["request_seq_no"], m["batch_size"], m["elapsed_ms"]
                )
        self._write("commits", batch_id, "v1\n{}")
