"""Canonical event-hub view over the raw ``events`` parquet table.

The reference projects AMQP messages into a fixed 9-column schema
(``EventHubsSourceProvider.eventHubsSchema``,
core/src/main/scala/org/apache/spark/sql/eventhubs/EventHubsSourceProvider.scala:152-165,
row construction :167-231). Our storage is the driver-generated
``events`` parquet (event_id, ts, user_id, event_type, value, props);
this module derives the same 9-column shape from it deterministically:

    partition      = CAST(user_id % P AS STRING)          (hash routing)
    sequenceNumber = ROW_NUMBER() OVER (PARTITION BY partition
                                        ORDER BY ts, event_id) - 1
                     -- dense, zero-based, gap-free per partition: the
                     -- load-bearing invariant (ref EventHubsRDDSuite.scala:100-118)
    offset         = CAST(sequenceNumber AS STRING)       (dummy-equal to
                     seqNo, as the reference test utils do —
                     EventHubsTestUtils.scala:203-205)
    body           = UTF-8 bytes of CAST(event_id AS STRING)
                     (reference tests send stringified ints —
                     EventHubsTestUtils.scala:65-70)
    enqueuedTime   = ts
    publisher      = NULL, partitionKey = NULL             (asserted null in
                     EventHubsSourceSuite.scala:727-728)
    properties     = map(event_type, user_id, value_cents, k)  — string->string,
                     non-strings stringified, mirroring AMQP normalization
                     (EventHubsSourceProvider.scala:183-205)
    systemProperties = empty map

Timestamp note: the physical type of ``events.ts`` is driver-controlled
and has drifted between regenerations — parquet TIMESTAMP(NANOS) (read
as bigint epoch-nanos under ``spark.sql.legacy.parquet.nanosAsLong``)
and TIMESTAMP(MICROS) (read natively as TIMESTAMP_NTZ; the legacy conf
is a no-op there). ``_enq_us`` branches on the resolved Spark dtype so
either storage collapses to the same canonical key: ``enq_us`` (BIGINT
epoch-microseconds — DuckDB's native timestamp resolution, so the
oracle reproduces it exactly via ``epoch_us(ts)``). All event-time
logic is integer math on that key; the seqNo window orders by the SAME
µs key in both engines so ordering ties resolve identically. The
9-column canonical view converts to TimestampType.

Scale note (100 TB): the ROW_NUMBER derivation is a one-time,
per-partition shuffle+sort that exists only because our storage lacks
native sequence numbers; a real hub (or an ingest job) materializes
seqNos at write time. Downstream operators read the materialized view,
so the window never appears in steady-state plans; bench materializes
the view once.

``oracle_hub_cte`` emits the matching DuckDB derivation so the driver's
oracle sees exactly the same rows.
"""

from __future__ import annotations

from typing import Dict
from weakref import WeakKeyDictionary

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from spark_eventhubs_spark.conf import DEFAULT_PARTITION_COUNT

# ref EventHubsSourceProvider.scala:152-165
EVENT_HUBS_SCHEMA = StructType(
    [
        StructField("body", BinaryType()),
        StructField("partition", StringType()),
        StructField("offset", StringType()),
        StructField("sequenceNumber", LongType()),
        StructField("enqueuedTime", TimestampType()),
        StructField("publisher", StringType()),
        StructField("partitionKey", StringType()),
        StructField("properties", MapType(StringType(), StringType(), True), True),
        StructField("systemProperties", MapType(StringType(), StringType(), True), True),
    ]
)


def configure_session(spark: SparkSession) -> SparkSession:
    """Runtime confs required to read the driver testdata and keep
    results engine-deterministic. Safe to call on any session."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark


def _enq_us(events: DataFrame) -> Column:
    # The testdata's physical type for ``ts`` has drifted across driver
    # regenerations: parquet TIMESTAMP(NANOS) reads as bigint epoch-nanos
    # under nanosAsLong, TIMESTAMP(MICROS) reads as TIMESTAMP_NTZ (the
    # legacy conf is a no-op for micros). Branch on the resolved dtype so
    # either storage yields the same BIGINT epoch-µs event-time key.
    t = dict(events.dtypes)["ts"]
    if t == "bigint":  # epoch-nanos via nanosAsLong; truncate to µs
        return F.expr("ts div 1000")
    # timestamp / timestamp_ntz (session tz is UTC, so the cast is identity)
    return F.unix_micros(F.col("ts").cast("timestamp"))


def _seq_no_col(events: DataFrame, partition_count: int) -> Column:
    w = Window.partitionBy(F.col("user_id") % F.lit(partition_count)).orderBy(
        _enq_us(events).asc(), F.col("event_id").asc()
    )
    return (F.row_number().over(w) - F.lit(1)).cast("long")


def hub_view_flat(events: DataFrame, partition_count: int = DEFAULT_PARTITION_COUNT) -> DataFrame:
    """Flat (no-map, string body, bigint event time) hub projection used
    by oracle-checked queries: same rows as :func:`hub_view` but with
    ``properties`` exploded into typed columns, ``body`` as string and
    ``enq_us`` as epoch-micros BIGINT, so results hash identically
    across Spark and DuckDB."""
    seq = _seq_no_col(events, partition_count)
    return events.select(
        F.col("event_id").cast("string").alias("body_str"),
        (F.col("user_id") % F.lit(partition_count)).cast("string").alias("partition"),
        seq.cast("string").alias("offset"),
        seq.alias("sequenceNumber"),
        _enq_us(events).alias("enq_us"),
        F.col("event_type"),
        F.col("user_id").cast("string").alias("user_id_str"),
        F.round(F.col("value") * 100).cast("long").alias("value_cents"),
        F.get_json_object(F.col("props"), "$.k").alias("prop_k"),
    )


def hub_view(events: DataFrame, partition_count: int = DEFAULT_PARTITION_COUNT) -> DataFrame:
    """Full 9-column connector schema (ref §1.2)."""
    flat = hub_view_flat(events, partition_count)
    return flat.select(
        F.col("body_str").cast("binary").alias("body"),
        F.col("partition"),
        F.col("offset"),
        F.col("sequenceNumber"),
        F.timestamp_micros(F.col("enq_us")).alias("enqueuedTime"),
        F.lit(None).cast("string").alias("publisher"),
        F.lit(None).cast("string").alias("partitionKey"),
        F.create_map(
            F.lit("event_type"), F.col("event_type"),
            F.lit("user_id"), F.col("user_id_str"),
            F.lit("value_cents"), F.col("value_cents").cast("string"),
            F.lit("k"), F.col("prop_k"),
        ).alias("properties"),
        F.map_from_arrays(
            F.array().cast("array<string>"), F.array().cast("array<string>")
        ).alias("systemProperties"),
    )


# DataFrames are immutable plans and the testdata dirs are read-only,
# so the per-session view cache below is pure memoization: it skips the
# repeated parquet footer/schema read (~100 ms of driver time per
# spark.read.parquet) and the view-plan rebuild that otherwise dominate
# sub-second catalog queries; cache_dataframe is shared with
# queries._table.
#
# Weak keys alone cannot evict: the cached DataFrame values hold strong
# references back to their SparkSession, so an entry pins its own key.
# Eviction is therefore explicit — clear_cached_plans(spark) on session
# stop — plus the opportunistic purge of already-stopped sessions below,
# which keeps long-lived multi-session processes bounded.
_df_cache: "WeakKeyDictionary[SparkSession, Dict[tuple, DataFrame]]" = WeakKeyDictionary()


def _purge_stopped_sessions() -> None:
    for s in [s for s in _df_cache if getattr(s._sc, "_jsc", None) is None]:
        del _df_cache[s]


# Monotonic count of cache-miss builds of session-scoped INGEST
# ARTIFACTS (every cache prefix except the per-run "query" plans,
# which bench.py deliberately evicts before each timed run). bench.py
# samples the delta around each cell so a cell that paid an artifact
# rebuild — e.g. the LSH banded frame after a session recycle — is
# machine-attributable from the record alone (round-12 verdict item 2:
# the embed_neardup_pairs 5x moved with recycle alignment and could
# only be argued about in prose).
_artifact_builds = 0


def artifact_build_count() -> int:
    return _artifact_builds


def cache_dataframe(spark: SparkSession, key: tuple, build) -> DataFrame:
    global _artifact_builds
    per = _df_cache.get(spark)
    if per is None:
        _purge_stopped_sessions()
        per = _df_cache.setdefault(spark, {})
    df = per.get(key)
    if df is None:
        if key and key[0] != "query":
            _artifact_builds += 1
        df = per[key] = build()
    return df


def clear_cached_plans(spark: SparkSession, prefix: str | None = None) -> None:
    """Drop memoized DataFrame plans for a session (all, or only keys
    whose first element equals ``prefix``). This is also the eviction
    path for long-lived processes: call it when stopping a session
    (stopped sessions are additionally purged opportunistically on the
    next cache miss). bench.py clears the
    ``"query"`` entries between timed runs so every timed execution
    builds and runs a fresh plan — reusing the same DataFrame object
    would let Spark skip already-materialized shuffle stages and
    under-report query cost."""
    per = _df_cache.get(spark)
    if per is None:
        return
    if prefix is None:
        per.clear()
    else:
        for k in [k for k in per if k[0] == prefix]:
            del per[k]


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    configure_session(spark)
    return cache_dataframe(
        spark, ("events", sf_dir),
        lambda: spark.read.parquet(f"{sf_dir}/events.parquet"),
    )


def load_hub(spark: SparkSession, sf_dir: str,
             partition_count: int = DEFAULT_PARTITION_COUNT) -> DataFrame:
    return cache_dataframe(
        spark, ("hub", sf_dir, partition_count),
        lambda: hub_view(load_events(spark, sf_dir), partition_count),
    )


def load_hub_flat(spark: SparkSession, sf_dir: str,
                  partition_count: int = DEFAULT_PARTITION_COUNT) -> DataFrame:
    return cache_dataframe(
        spark, ("hub_flat", sf_dir, partition_count),
        lambda: hub_view_flat(load_events(spark, sf_dir), partition_count),
    )


def oracle_hub_cte(partition_count: int = DEFAULT_PARTITION_COUNT) -> str:
    """DuckDB CTE producing rows identical to :func:`hub_view_flat`.

    The driver pre-registers the raw tables as views; every oracle SQL
    string for a hub query starts with this CTE.
    """
    return f"""WITH hub AS (
  SELECT
    CAST(event_id AS VARCHAR)                    AS body_str,
    CAST(user_id % {partition_count} AS VARCHAR) AS partition,
    CAST(CAST(ROW_NUMBER() OVER (PARTITION BY user_id % {partition_count}
         ORDER BY epoch_us(ts), event_id) - 1 AS BIGINT) AS VARCHAR) AS offset,
    CAST(ROW_NUMBER() OVER (PARTITION BY user_id % {partition_count}
         ORDER BY epoch_us(ts), event_id) - 1 AS BIGINT) AS sequenceNumber,
    epoch_us(ts)                                 AS enq_us,
    event_type                                   AS event_type,
    CAST(user_id AS VARCHAR)                     AS user_id_str,
    CAST(ROUND(value * 100) AS BIGINT)           AS value_cents,
    json_extract_string(props, '$.k')            AS prop_k
  FROM events
)"""


def kafka_key(system_properties: Column = None) -> Column:
    """Kafka key of an event produced through an Event Hubs Kafka
    endpoint: the connector surfaces it as
    ``systemProperties['x-opt-kafka-key']`` (JSON-serialized bytes —
    ref docs/receive-events-sent-using-kafka-protocol.md). The value of
    a Kafka pair is simply the event ``body``."""
    col = system_properties if system_properties is not None else F.col("systemProperties")
    return F.element_at(col, "x-opt-kafka-key")
