"""Hub view / client / batch relation tests — modeled on the
reference's EventHubsRelationSuite + EventHubsRDDSuite +
SimulatedClient behaviors (SURVEY §5 tiers 1, 4, 6)."""

from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from spark_eventhubs_spark.conf import EventHubsConf
from spark_eventhubs_spark.connstr import file_hub_connection_string
from spark_eventhubs_spark.plans.hubview import EVENT_HUBS_SCHEMA, load_hub
from spark_eventhubs_spark.position import EventPosition
from spark_eventhubs_spark.sources.batch import (
    metadata_count,
    plan_ranges,
    read_eventhubs,
    scan_ranges,
)
from spark_eventhubs_spark.sources.client import SimulatedClient
from spark_eventhubs_spark.sources.hub import SimulatedEventHubs


@pytest.fixture(scope="module")
def hub(spark, sf_dir):
    return SimulatedEventHubs(spark, events_parquet=f"{sf_dir}/events.parquet")


@pytest.fixture(scope="module")
def client(hub):
    return SimulatedClient(hub)


def conf_for(sf_dir, **kw):
    return EventHubsConf(file_hub_connection_string(sf_dir, "events"))


def _names_types(schema):
    return [(f.name, f.dataType.simpleString()) for f in schema.fields]


def test_hub_schema_is_canonical(hub):
    # fixed 9-col schema (EventHubsSourceProvider.scala:152-165);
    # nullability flags are Catalyst-inferred, so compare names + types
    assert _names_types(hub.dataframe().schema) == _names_types(EVENT_HUBS_SCHEMA)


def test_seqnos_dense_per_partition(hub):
    # dense, zero-based, gap-free — EventHubsRDDSuite.scala:100-118
    rows = (
        hub.dataframe()
        .groupBy("partition")
        .agg(
            F.min("sequenceNumber").alias("lo"),
            F.max("sequenceNumber").alias("hi"),
            F.count("*").alias("n"),
            F.countDistinct("sequenceNumber").alias("nd"),
        )
        .collect()
    )
    assert len(rows) == 4
    for r in rows:
        assert r["lo"] == 0
        assert r["n"] == r["nd"] == r["hi"] + 1


def test_bounded_seq_nos_latest_is_last_plus_one(hub):
    bounds = hub.bounded_seq_nos()
    total = sum(hi - lo for lo, hi in bounds.values())
    assert total == hub.dataframe().count()


def test_translate_start_end_sentinels(client, sf_dir):
    conf = conf_for(sf_dir)  # defaults: start-of-stream → end-of-stream
    start = client.translate(conf, use_start=True)
    end = client.translate(conf, use_start=False)
    bounds = client.all_bounded_seq_nos()
    assert start == {p: b[0] for p, b in bounds.items()}
    assert end == {p: b[1] for p, b in bounds.items()}


def test_translate_seqno_passthrough(client, sf_dir):
    # seqNos pass through raw — SimulatedClient.scala:89-113
    conf = conf_for(sf_dir)
    conf.set_starting_position(EventPosition.from_sequence_number(10, is_inclusive=True))
    assert client.translate(conf, use_start=True) == {p: 10 for p in range(4)}
    conf.set_starting_position(EventPosition.from_sequence_number(10, is_inclusive=False))
    assert client.translate(conf, use_start=True) == {p: 10 for p in range(4)}


def test_translate_enqueued_time(client, hub, sf_dir):
    # time → earliest seqNo with enqueuedTime >= t (EventHubsClient.scala:306-338)
    t = datetime(2024, 1, 10, tzinfo=timezone.utc)
    conf = conf_for(sf_dir)
    conf.set_starting_position(EventPosition.from_enqueued_time(t))
    got = client.translate(conf, use_start=True)
    expected_rows = (
        hub.dataframe()
        .where(F.col("enqueuedTime") >= F.lit(t.replace(tzinfo=None)))
        .groupBy("partition")
        .agg(F.min("sequenceNumber").alias("s"))
        .collect()
    )
    expected = {int(r["partition"]): r["s"] for r in expected_rows}
    bounds = client.all_bounded_seq_nos()
    for p in range(4):
        assert got[p] == expected.get(p, bounds[p][1])


def test_time_seq_nos_job_count_independent_of_bound_count(spark, client):
    """The enqueuedTime translation is ONE conditional-min aggregation
    for ALL distinct time bounds (min(seqNo) FILTER (enqueuedTime >= t)
    per bound) — the reference resolves each bound with per-partition
    service probes (EventHubsClient.scala:306-338); ours must not run
    one Spark job per bound either. AQE may split a single action into
    several jobs, so pin that the job count does not GROW with the
    number of bounds."""
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    ts = [datetime(2024, 1, d, tzinfo=timezone.utc) for d in (5, 10, 15, 20)]
    client._time_seq_nos(ts[:1])  # warm: parquet footer reads, caches

    sc.setJobGroup("tsn-one", "one bound")
    client._time_seq_nos(ts[:1])
    sc.setJobGroup("tsn-four", "four bounds")
    four = client._time_seq_nos(ts)
    sc.setJobGroup("tsn-done", "")
    one_jobs = len(tracker.getJobIdsForGroup("tsn-one"))
    four_jobs = len(tracker.getJobIdsForGroup("tsn-four"))
    assert four_jobs == one_jobs
    # and the merged result still matches per-bound resolution
    for t in ts:
        single = client._time_seq_nos([t])
        assert single == {k: v for k, v in four.items() if k[1] == str(t)}


def test_translate_time_past_latest_resolves_to_latest(client, sf_dir):
    conf = conf_for(sf_dir)
    conf.set_starting_position(
        EventPosition.from_enqueued_time(datetime(2999, 1, 1, tzinfo=timezone.utc))
    )
    got = client.translate(conf, use_start=True)
    bounds = client.all_bounded_seq_nos()
    assert got == {p: b[1] for p, b in bounds.items()}


def test_full_scan_equals_table(spark, hub, client, sf_dir):
    conf = conf_for(sf_dir)
    df = read_eventhubs(spark, conf, hub=hub)
    assert df.count() == hub.dataframe().count()
    assert _names_types(df.schema) == _names_types(EVENT_HUBS_SCHEMA)


def test_bounded_scan_and_metadata_count(spark, hub, client, sf_dir):
    conf = conf_for(sf_dir)
    conf.set_starting_position(EventPosition.from_sequence_number(10))
    conf.set_ending_position(EventPosition.from_sequence_number(40))
    ranges = plan_ranges(client, conf)
    # [10, 40) per partition — 30 events each
    assert metadata_count(ranges) == 4 * 30
    df = scan_ranges(hub.dataframe(), ranges)
    assert df.count() == metadata_count(ranges)
    got = df.groupBy("partition").agg(
        F.min("sequenceNumber").alias("lo"), F.max("sequenceNumber").alias("hi")
    ).collect()
    for r in got:
        assert r["lo"] == 10 and r["hi"] == 39


def test_data_loss_guard_clamps_to_earliest(spark, hub, client, sf_dir, caplog):
    conf = conf_for(sf_dir)
    # per-partition earliest is 0; ask for a start "before" it via raw offset -5? use seq 0;
    # instead simulate expiry by requesting start < earliest on a shifted-view hub.
    # Here earliest==0 so exercise fail_on_data_loss path with a negative offset.
    conf.set_starting_position(EventPosition.from_offset("-5", is_inclusive=True))
    ranges = plan_ranges(client, conf, fail_on_data_loss=False)
    for r in ranges:
        assert r.from_seq_no == 0  # clamped
    with pytest.raises(RuntimeError):
        plan_ranges(client, conf, fail_on_data_loss=True)


def test_take_ordered(spark, hub, sf_dir):
    # take(num) fills from partitions in order (EventHubsRDD.scala:63-89)
    df = hub.dataframe().orderBy("partition", "sequenceNumber").limit(7)
    rows = df.collect()
    assert len(rows) == 7
    assert [int(r["sequenceNumber"]) for r in rows] == [0, 1, 2, 3, 4, 5, 6]


def test_receive_contract(hub):
    evs = hub.receive(partition_id=1, seq_no=5, count=10)
    assert len(evs) == 10
    assert [e["sequenceNumber"] for e in evs] == list(range(5, 15))
    with pytest.raises(RuntimeError):
        hub.receive(partition_id=1, seq_no=10 ** 9, count=5)


def test_kafka_key_extraction(spark):
    """Events produced via a Kafka endpoint carry their key in
    systemProperties['x-opt-kafka-key'] (ref
    docs/receive-events-sent-using-kafka-protocol.md); the helper
    surfaces it, NULL for non-Kafka events."""
    from pyspark.sql import functions as F

    from spark_eventhubs_spark.plans.hubview import kafka_key

    df = spark.createDataFrame(
        [(b"v1", {"x-opt-kafka-key": "42"}), (b"v2", {})],
        "body BINARY, systemProperties MAP<STRING,STRING>",
    )
    rows = df.select(
        F.col("body").cast("string").alias("value"),
        kafka_key().alias("key"),
    ).collect()
    assert {(r["value"], r["key"]) for r in rows} == {("v1", "42"), ("v2", None)}


def test_hub_view_survives_ts_dtype_drift(spark, tmp_path):
    """The driver's testdata has shipped ``ts`` as parquet
    TIMESTAMP(NANOS) (read as bigint epoch-nanos under nanosAsLong),
    TIMESTAMP(MICROS) (read as TIMESTAMP_NTZ — the legacy conf is a
    no-op there), and could legitimately ship raw bigint epoch-nanos.
    hub_view_flat must build and produce identical rows for all three
    physical encodings of the same instants."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from spark_eventhubs_spark.plans.hubview import hub_view_flat

    base_us = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in epoch-µs
    n = 40
    cols = {
        "event_id": pa.array(range(1, n + 1), pa.int64()),
        "user_id": pa.array([i % 7 for i in range(n)], pa.int64()),
        "event_type": pa.array(["click"] * n),
        "value": pa.array([i * 1.25 for i in range(n)], pa.float64()),
        "props": pa.array(['{"k":"%d"}' % (i % 5) for i in range(n)]),
    }
    us = [base_us + i * 1_000_003 for i in range(n)]

    # int64 -> timestamp(unit) casts interpret the integer in that unit
    variants = {
        "ns": pa.array([u * 1000 for u in us], pa.int64()).cast(pa.timestamp("ns")),
        "us": pa.array(us, pa.int64()).cast(pa.timestamp("us")),
        "bigint": pa.array([u * 1000 for u in us], pa.int64()),  # epoch-nanos
    }

    results = {}
    for name, ts_arr in variants.items():
        path = str(tmp_path / f"events_{name}.parquet")
        tbl = pa.table({"event_id": cols["event_id"], "ts": ts_arr,
                        "user_id": cols["user_id"], "event_type": cols["event_type"],
                        "value": cols["value"], "props": cols["props"]})
        pq.write_table(tbl, path)
        df = hub_view_flat(spark.read.parquet(path))
        results[name] = sorted(tuple(r) for r in df.collect())

    assert results["ns"] == results["us"] == results["bigint"]
    # and the event-time key is real epoch-µs
    assert results["us"][0][4] == base_us
