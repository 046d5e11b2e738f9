"""Salted aggregation must be bit-equal to the direct groupBy and must
actually shard hot keys in phase 1."""

from pyspark.sql import functions as F

from spark_eventhubs_spark.functions.skew import salted_agg
from spark_eventhubs_spark.plans.hubview import load_hub_flat

from conftest import SF_DIR


def test_salted_equals_direct(spark):
    hub = load_hub_flat(spark, SF_DIR)
    direct = {
        r["user_id_str"]: (r["n"], r["s"])
        for r in hub.groupBy("user_id_str")
        .agg(F.count("*").alias("n"), F.sum("value_cents").alias("s"))
        .collect()
    }
    salted = {
        r["user_id_str"]: (r["n_events"], r["total_value_c"])
        for r in salted_agg(
            hub,
            keys=["user_id_str"],
            aggs=[("count", F.lit(1), "n_events"),
                  ("sum", F.col("value_cents"), "total_value_c")],
            salt_col=F.col("sequenceNumber"),
        ).collect()
    }
    assert salted == direct


def test_phase1_shards_hot_key(spark):
    hub = load_hub_flat(spark, SF_DIR)
    hot = (
        hub.groupBy("user_id_str").count().orderBy(F.desc("count")).first()
    )
    shards = (
        hub.where(F.col("user_id_str") == hot["user_id_str"])
        .groupBy(F.pmod(F.hash("sequenceNumber"), F.lit(16)))
        .count()
        .count()
    )
    assert shards > 1  # the hottest key splits across salt shards


def test_non_algebraic_rejected(spark):
    import pytest

    hub = load_hub_flat(spark, SF_DIR)
    with pytest.raises(ValueError, match="non-algebraic"):
        salted_agg(hub, ["user_id_str"], [("avg", F.col("value_cents"), "a")],
                   F.col("sequenceNumber"))
