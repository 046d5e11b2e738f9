"""Batch relation — bounded scan between start/end positions.

Re-implements ``EventHubsRelation.buildScan``
(core/src/main/scala/org/apache/spark/sql/eventhubs/EventHubsRelation.scala:45-71):
translate both bounds to per-partition seqNos (must be resolvable —
enforced by require at :48-54), form OffsetRanges, scan.

Spark-first: instead of an opaque TableScan RDD, the scan is a
DataFrame filter over the hub view, so Catalyst gets predicate
pushdown / column pruning / AQE for free — the reference explicitly
lacks these (it is a TableScan, not PrunedFilteredScan).

Includes the data-loss guard (``adjustStartingOffset``,
EventHubsSource.scala:246-260): requested starts are clamped up to the
service-earliest per partition.
"""

from __future__ import annotations

import logging
from functools import reduce
from typing import Dict, List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_eventhubs_spark.conf import EventHubsConf
from spark_eventhubs_spark.offsets import NameAndPartition, OffsetRange
from spark_eventhubs_spark.sources.client import SimulatedClient
from spark_eventhubs_spark.sources.hub import SimulatedEventHubs

log = logging.getLogger(__name__)


def plan_ranges(
    client: SimulatedClient,
    conf: EventHubsConf,
    fail_on_data_loss: bool = False,
) -> List[OffsetRange]:
    """translate(start) + translate(end) -> OffsetRange[] with the
    earliest-clamp data-loss guard applied."""
    name = conf.name or client.hub.name
    start = client.translate(conf, use_start=True)
    end = client.translate(conf, use_start=False)
    bounds = client.all_bounded_seq_nos()
    ranges = []
    for pid in sorted(start):
        from_seq, until_seq = start[pid], end[pid]
        earliest = bounds[pid][0]
        if from_seq < earliest:  # data-loss guard (EventHubsSource.scala:246-260)
            msg = (f"partition {pid}: requested start {from_seq} < earliest "
                   f"{earliest}; events were missed/expired")
            if fail_on_data_loss:
                raise RuntimeError(msg)
            log.warning("%s — clamping to earliest", msg)
            from_seq = earliest
        if until_seq < from_seq:
            until_seq = from_seq
        ranges.append(OffsetRange(NameAndPartition(name, pid), from_seq, until_seq))
    return ranges


def scan_ranges(hub_df: DataFrame, ranges: List[OffsetRange]) -> DataFrame:
    """Filter the hub view down to the planned ranges.

    The per-partition range predicate is a disjunction Catalyst folds
    into the scan; ranges covering nothing are dropped up front. For
    very wide hubs (>= ~256 partitions) a broadcast semi-join on a tiny
    ranges table would replace the OR-chain; partition counts here are
    single digits, and the OR-chain keeps the filter fully
    pushdown-eligible.
    """
    live = [r for r in ranges if r.count > 0]
    if not live:
        return hub_df.where(F.lit(False))
    cond = reduce(
        lambda a, b: a | b,
        (
            (F.col("partition") == str(r.partition_id))
            & (F.col("sequenceNumber") >= r.from_seq_no)
            & (F.col("sequenceNumber") < r.until_seq_no)
            for r in live
        ),
    )
    return hub_df.where(cond)


def metadata_count(ranges: List[OffsetRange]) -> int:
    """O(1) count from planner metadata, no scan
    (ref EventHubsRDD.scala:59-61)."""
    return sum(r.count for r in ranges)


def read_eventhubs(
    spark: SparkSession,
    conf: EventHubsConf,
    hub: Optional[SimulatedEventHubs] = None,
    fail_on_data_loss: bool = False,
) -> DataFrame:
    """``spark.read.format("eventhubs")`` equivalent: bounded 9-column
    DataFrame between the conf's starting and ending positions."""
    # AAD callback runs at client creation, before any scan is planned
    # (ref client/ClientConnectionPool.scala:63-80) — a bad class path
    # or failing token acquisition errors HERE, as it would for a real
    # hub. The file-backed transport needs no token afterwards.
    from spark_eventhubs_spark.auth import acquire_connection_token

    acquire_connection_token(conf)
    if hub is None:
        from spark_eventhubs_spark.connstr import ConnectionStringBuilder

        cs = conf.connection_string
        if cs is None:
            raise ValueError("eventhubs.connectionString is required")
        b = ConnectionStringBuilder.parse(cs)
        path = (b.endpoint or "").removeprefix("file://")
        entity = b.entity_path or "events"
        # Endpoint = directory, EntityPath = table: <dir>/<entity>.parquet
        if not path.endswith(".parquet"):
            path = f"{path.rstrip('/')}/{entity}.parquet"
        hub = SimulatedEventHubs(
            spark,
            name=entity,
            partition_count=conf.partition_count,
            events_parquet=path,
        )
    client = SimulatedClient(hub)
    ranges = plan_ranges(client, conf, fail_on_data_loss)
    return scan_ranges(hub.dataframe(), ranges)
