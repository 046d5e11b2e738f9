"""SimulatedClient — position translation and metadata probes.

Re-implements the driver-side client surface:
- ``translate(ehConf, partitionCount, useStart)``: resolve an
  EventPosition (offset / seqNo / enqueuedTime / start / end sentinel)
  to a per-partition sequence number
  (ref core/.../eventhubs/client/EventHubsClient.scala:264-353; the
  simulated variant utils/SimulatedClient.scala:89-113).
- ``allBoundedSeqNos``: earliest+latest per partition
  (ref EventHubsClient.scala:124-139).

Instead of the reference's per-partition service round-trips (parallel
futures + receive-one-event probes), everything here is ONE Spark
aggregation job over the hub view:
``groupBy(partition).agg(min(seqNo), max(seqNo)+1, min(seqNo) FILTER
(WHERE enqueuedTime >= t))`` — at 100 TB this is a map-side-combined
scan of one column, not N probes.

Edge cases pinned by the reference:
- seqNo positions pass through untouched (clamping happens later in the
  data-loss guard, EventHubsSource.scala:246-260).
- enqueuedTime t resolves to the earliest seqNo with enqueuedTime >= t;
  if t is past the newest event, it resolves to latest (= last+1), i.e.
  "start receiving new events from now" (EventHubsClient.scala:306-338).
- empty partitions resolve to 0 for start-of-stream and latest==earliest.
- offset positions: our offsets are stringified seqNos (as the
  reference's simulator does — EventHubsTestUtils.scala:203-205), so
  offset "-1" = start, "@latest" = end, otherwise int(offset)
  (+1 when exclusive, matching receiver inclusivity handling).
"""

from __future__ import annotations

from typing import Dict, Tuple

from pyspark.sql import functions as F

from spark_eventhubs_spark.conf import EventHubsConf
from spark_eventhubs_spark.position import EventPosition
from spark_eventhubs_spark.sources.hub import SimulatedEventHubs


class SimulatedClient:
    def __init__(self, hub: SimulatedEventHubs) -> None:
        self.hub = hub

    @property
    def partition_count(self) -> int:
        """ref EventHubsClient.scala:171-209 (dynamic discovery reads the
        service; ours reads the hub's configured width)."""
        return self.hub.partition_count

    def all_bounded_seq_nos(self) -> Dict[int, Tuple[int, int]]:
        return self.hub.bounded_seq_nos()

    def _time_seq_nos(self, ts_list) -> Dict[Tuple[int, str], int]:
        """min(seqNo) per (partition, t) for every distinct enqueuedTime
        bound needed — ONE conditional-min aggregation job for all
        partitions and times (``min(seqNo) FILTER (enqueuedTime >= t)``
        per bound), map-side combined. A (partition, t) with no event at
        or after t aggregates to NULL and is omitted, so the caller's
        fall-back-to-latest behavior is unchanged."""
        ts_list = list(ts_list)
        if not ts_list:
            return {}
        rows = (
            self.hub.dataframe()
            .groupBy("partition")
            .agg(*[
                F.min(
                    F.when(
                        F.col("enqueuedTime") >= F.lit(t),
                        F.col("sequenceNumber"),
                    )
                ).alias(f"t{i}")
                for i, t in enumerate(ts_list)
            ])
            .collect()
        )
        out: Dict[Tuple[int, str], int] = {}
        for r in rows:
            for i, t in enumerate(ts_list):
                if r[f"t{i}"] is not None:
                    out[(int(r["partition"]), str(t))] = int(r[f"t{i}"])
        return out

    def translate(self, conf: EventHubsConf, use_start: bool = True) -> Dict[int, int]:
        """Resolve starting (or ending) positions for every partition."""
        n = self.partition_count
        positions = {
            pid: (conf.starting_position_for(pid) if use_start
                  else conf.ending_position_for(pid))
            for pid in range(n)
        }
        needs_bounds = any(
            p.is_start_of_stream or p.is_end_of_stream or p.enqueued_time is not None
            for p in positions.values()
        )
        bounds = self.all_bounded_seq_nos() if needs_bounds else {}
        time_bounds = [p.enqueued_time for p in positions.values()
                       if p.enqueued_time is not None and p.seq_no is None
                       and p.offset is None]
        time_seq = self._time_seq_nos(sorted(set(time_bounds))) if time_bounds else {}

        result: Dict[int, int] = {}
        for pid, pos in positions.items():
            if pos.seq_no is not None:
                # raw pass-through, isInclusive ignored — matches
                # SimulatedClient.translate (SimulatedClient.scala:89-113):
                # a seqNo is inclusive as a start bound and exclusive as
                # an end bound because OffsetRange is [from, until)
                seq = pos.seq_no
            elif pos.is_start_of_stream:
                seq = bounds[pid][0]
            elif pos.is_end_of_stream:
                seq = bounds[pid][1]
            elif pos.offset is not None:
                # our offsets are stringified seqNos (EventHubsTestUtils.scala:203-205)
                seq = int(pos.offset)
            elif pos.enqueued_time is not None:
                seq = time_seq.get((pid, str(pos.enqueued_time)), bounds[pid][1])
            else:
                raise ValueError(f"unresolvable position {pos} for partition {pid}")
            result[pid] = seq
        return result
