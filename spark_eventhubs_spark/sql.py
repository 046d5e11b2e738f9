"""SQL entry point: register the hub + testdata tables as temp views.

The reference's query surface is "whatever Spark SQL can do over the
connector's DataFrame" (README.md:23-24 promises map/reduce/join/
window). This module gives users the same surface through plain
``spark.sql``: one call registers

    hub        — the canonical 9-column connector view (SURVEY §1.2)
    hub_flat   — oracle-friendly flat projection (string body,
                 epoch-micros BIGINT event time, typed property cols)
    region nation customer supplier part orders lineitem events
    documents embeddings — the raw parquet tables

after which any ANSI query runs, e.g.::

    register_catalog(spark, sf_dir)
    spark.sql("SELECT partition, COUNT(*) FROM hub GROUP BY 1")

Views are lazy logical plans — registration costs nothing; Catalyst
prunes/pushes through them exactly as through the DataFrame API.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from spark_eventhubs_spark.plans.hubview import (
    configure_session,
    load_hub,
    load_hub_flat,
)

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def register_catalog(spark: SparkSession, sf_dir: str) -> None:
    """Create (or replace) temp views for the hub and every table."""
    configure_session(spark)
    for t in TABLES:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)
    load_hub(spark, sf_dir).createOrReplaceTempView("hub")
    load_hub_flat(spark, sf_dir).createOrReplaceTempView("hub_flat")
