"""Plugin hooks: throttling status + send/receive metrics.

Port of the reference's plugin traits
(core/src/main/scala/org/apache/spark/eventhubs/utils/ThrottlingStatusPlugin.scala:26-39,
MetricPlugin.scala:22-36) and their simple logging implementations
(SimpleThrottlingStatusPlugin.scala, SimpleLogMetricPlugin.scala).
Python protocols + default log impls; wired into MicroBatchRunner and
the writer."""

from __future__ import annotations

import logging
from typing import Dict, Protocol

log = logging.getLogger(__name__)


class ThrottlingStatusPlugin(Protocol):
    def on_batch_creation(
        self, next_batch_local_id: int, next_batch_ranges, performance_percentages
    ) -> None: ...

    def on_partitions_performance_status_update(
        self,
        latest_updated_batch_local_id: int,
        partitions_batch_sizes: Dict[int, int],
        partitions_batch_receive_time_ms: Dict[int, int],
        performance_percentages: Dict[int, float] | None,
    ) -> None: ...


class MetricPlugin(Protocol):
    def on_receive_metric(
        self, partition_id: int, event_count: int, batch_size_bytes: int, elapsed_ms: int
    ) -> None: ...

    def on_send_metric(self, event_count: int, batch_size_bytes: int, success: bool) -> None: ...


class SimpleLogThrottlingStatusPlugin:
    def on_batch_creation(self, next_batch_local_id, next_batch_ranges,
                          performance_percentages) -> None:
        log.info("throttling: batch %s ranges=%s perf=%s",
                 next_batch_local_id,
                 [str(r) for r in next_batch_ranges], performance_percentages)

    def on_partitions_performance_status_update(
        self, latest_updated_batch_local_id, partitions_batch_sizes,
        partitions_batch_receive_time_ms, performance_percentages
    ) -> None:
        log.info("throttling: perf update for batch %s sizes=%s times=%s perf=%s",
                 latest_updated_batch_local_id, partitions_batch_sizes,
                 partitions_batch_receive_time_ms, performance_percentages)


class SimpleLogMetricPlugin:
    def on_receive_metric(self, partition_id, event_count, batch_size_bytes,
                          elapsed_ms) -> None:
        log.info("metric: receive p=%s n=%s bytes=%s ms=%s",
                 partition_id, event_count, batch_size_bytes, elapsed_ms)

    def on_send_metric(self, event_count, batch_size_bytes, success) -> None:
        log.info("metric: send n=%s bytes=%s ok=%s", event_count, batch_size_bytes, success)
