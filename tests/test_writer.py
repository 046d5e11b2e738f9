"""Write-path tests — modeled on EventHubsSinkSuite (SURVEY §5 tier 5):
round trips, partition pinning, save-mode rejection, schema errors,
batchId idempotence."""

import pytest
from pyspark.sql import functions as F

from spark_eventhubs_spark.sources.hub import SimulatedEventHubs
from spark_eventhubs_spark.sources.writer import write_eventhubs


@pytest.fixture()
def out_hub(spark, tmp_path):
    return SimulatedEventHubs(spark, hub_dir=str(tmp_path / "hub"))


def test_body_only_roundtrip(spark, out_hub):
    # EventHubsSinkSuite.scala:93-106
    df = spark.range(0, 20).select(F.col("id").cast("string").alias("body"))
    n = write_eventhubs(df, out_hub)
    assert n == 20
    back = out_hub.dataframe()
    assert back.count() == 20
    got = sorted(r["body"].decode() for r in back.select("body").collect())
    assert got == sorted(str(i) for i in range(20))


def test_pinned_partition(spark, out_hub):
    # EventHubsSinkSuite.scala:108-124
    df = spark.range(0, 10).select(
        F.lit("2").alias("partition"), F.col("id").cast("string").alias("body")
    )
    write_eventhubs(df, out_hub)
    parts = out_hub.dataframe().select("partition").distinct().collect()
    assert [r["partition"] for r in parts] == ["2"]
    seqs = sorted(
        r["sequenceNumber"] for r in out_hub.dataframe().select("sequenceNumber").collect()
    )
    assert seqs == list(range(10))  # dense from 0


def test_seqnos_continue_after_second_write(spark, out_hub):
    df = spark.range(0, 4).select(
        F.lit("1").alias("partition"), F.col("id").cast("string").alias("body")
    )
    write_eventhubs(df, out_hub)
    write_eventhubs(df, out_hub)
    seqs = sorted(
        r["sequenceNumber"] for r in out_hub.dataframe().select("sequenceNumber").collect()
    )
    assert seqs == list(range(8))


def test_partition_key_routing_deterministic(spark, out_hub):
    df = spark.createDataFrame(
        [("a", "x")] * 5 + [("b", "y")] * 5, "body string, partitionKey string"
    )
    write_eventhubs(df, out_hub)
    rows = out_hub.dataframe().select("partitionKey", "partition").distinct().collect()
    routes = {r["partitionKey"]: r["partition"] for r in rows}
    assert len(routes) == 2  # each key maps to exactly one partition


def test_properties_roundtrip(spark, out_hub):
    # EventHubsSinkSuite.scala:237-318
    df = spark.range(0, 3).select(
        F.col("id").cast("string").alias("body"),
        F.create_map(F.lit("k1"), F.lit("v1")).alias("properties"),
    )
    write_eventhubs(df, out_hub)
    props = out_hub.dataframe().select("properties").collect()
    assert all(r["properties"] == {"k1": "v1"} for r in props)


def test_save_mode_rejection(spark, out_hub):
    # EventHubsSourceProvider.scala:108-141
    df = spark.range(1).select(F.lit("x").alias("body"))
    with pytest.raises(ValueError, match="save mode"):
        write_eventhubs(df, out_hub, mode="overwrite")


def test_schema_errors(spark, out_hub):
    # EventHubsSinkSuite.scala:320-468
    with pytest.raises(ValueError, match="body"):
        write_eventhubs(spark.range(1).select(F.lit("p").alias("partition")), out_hub)
    with pytest.raises(ValueError, match="string or binary"):
        write_eventhubs(spark.range(1).select(F.col("id").alias("body")), out_hub)
    with pytest.raises(ValueError, match="partition attribute"):
        write_eventhubs(
            spark.range(1).select(F.lit("x").alias("body"), F.col("id").alias("partition")),
            out_hub,
        )
    with pytest.raises(ValueError, match="partitionKey attribute"):
        write_eventhubs(
            spark.range(1).select(F.lit("x").alias("body"), F.col("id").alias("partitionKey")),
            out_hub,
        )
    with pytest.raises(ValueError, match="Only one may be set"):
        write_eventhubs(
            spark.range(1).select(
                F.lit("x").alias("body"),
                F.lit("0").alias("partition"),
                F.lit("k").alias("partitionKey"),
            ),
            out_hub,
        )


def test_batchid_idempotence(spark, out_hub):
    # EventHubsSink.scala:35-42 — redelivered batch skipped by batchId
    df = spark.range(0, 5).select(F.col("id").cast("string").alias("body"))
    assert write_eventhubs(df, out_hub, batch_id=7) == 5
    assert write_eventhubs(df, out_hub, batch_id=7) == 0
    assert out_hub.dataframe().count() == 5


def test_to_json_struct_body(spark, out_hub):
    # EventHubsSinkSuite.scala:158-172
    df = spark.range(1, 100).select(F.to_json(F.struct("*")).alias("body"))
    assert write_eventhubs(df, out_hub) == 99


def test_writer_crash_window_contract_is_at_least_once(spark, out_hub):
    """Fault injection on the sink's write-then-marker protocol (the
    write-side twin of the r6 source restart tests). The data file
    lands BEFORE the batch commit marker, so a crash in between makes
    the redelivered batch write again — duplicates, i.e. AT-LEAST-ONCE,
    exactly the reference sink's documented contract (EventHubsSink
    provides no transactional dedup; EventHubsSink.scala:35-42 only
    skips batches whose marker survived). A crash AFTER the marker is
    exactly-once on redelivery. Both sides pinned."""
    import os

    from pyspark.sql import functions as F

    df = spark.range(0, 6).select(F.col("id").cast("string").alias("body"))
    assert write_eventhubs(df, out_hub, batch_id=3) == 6
    # crash window: data committed, marker lost
    marker = os.path.join(out_hub._hub_dir, "_batch_commits", "3")
    assert os.path.exists(marker)
    os.remove(marker)
    assert write_eventhubs(df, out_hub, batch_id=3) == 6  # re-writes
    assert out_hub.dataframe().count() == 12  # at-least-once duplicates
    # seqNos stay gapless and strictly ordered per partition even
    # across the duplicate write (continuation from current latest)
    rows = out_hub.dataframe().select("partition", "sequenceNumber").collect()
    by_part = {}
    for r in rows:
        by_part.setdefault(r["partition"], []).append(r["sequenceNumber"])
    for pid, seqs in by_part.items():
        assert sorted(seqs) == list(range(len(seqs))), (pid, seqs)
    # crash after marker: redelivery is exactly-once
    assert write_eventhubs(df, out_hub, batch_id=3) == 0
    assert out_hub.dataframe().count() == 12
