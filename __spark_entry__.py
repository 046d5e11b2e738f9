"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All implementations live in ``spark_eventhubs_spark``; this module is
the thin adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from spark_eventhubs_spark import queries as _catalog  # noqa: E402
from spark_eventhubs_spark.plans.hubview import load_hub  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's own
    end-to-end test query — tumbling event-time window aggregation over
    the hub's enqueuedTime (EventHubsSourceSuite.scala:737-778) — run
    on the canonical 9-column connector view."""
    from pyspark.sql import functions as F

    hub = load_hub(spark, "/root/testdata/sf0.001")
    return (
        hub.groupBy(F.window("enqueuedTime", "1 hour").alias("w"))
        .agg(F.count("*").alias("cnt"))
        .select(F.col("w.start").alias("window_start"), F.col("cnt"))
        .orderBy("window_start")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _catalog.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle for each query (omitted for genuinely
    non-SQL-expressible ops → driver records rows-only check)."""
    return _catalog.oracle_sql()
