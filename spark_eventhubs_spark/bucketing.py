"""Bucketed materialization — the co-located join path at 100 TB.

SURVEY §8 notes that the one remaining big shuffle in the TPC-H-shaped
joins (lineitem ⋈ orders on orderkey) disappears if both tables are
bucketed by the join key at ingest. This module materializes that
layout and is pinned by a test asserting the bucketed join plans with
NO Exchange on either side — the concrete 100 TB story:

    ingest once:   materialize_bucketed(spark, sf_dir, workdir)
    every query:   fact-fact joins on orderkey are shuffle-free

Bucket counts must match on both sides; Spark then treats bucket id as
the partitioning and sorts within buckets at write, so the join needs
neither Exchange nor (with sorted buckets) Sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DEFAULT_BUCKETS = 8


def materialize_bucketed(
    spark: SparkSession,
    sf_dir: str,
    location: str,
    n_buckets: int = DEFAULT_BUCKETS,
    tables: dict | None = None,
) -> dict:
    """Write orderkey-bucketed copies of the fact tables as external
    tables; returns {table_name: qualified_name}. Idempotent per
    location (overwrites)."""
    tables = tables or {"lineitem": "l_orderkey", "orders": "o_orderkey"}
    out = {}
    for name, key in tables.items():
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        tbl = f"bkt_{name}"
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        (
            df.write.format("parquet")
            .option("path", f"{location}/{tbl}")
            .bucketBy(n_buckets, key)
            .sortBy(key)
            .mode("overwrite")
            .saveAsTable(tbl)
        )
        out[name] = tbl
    return out


def bucketed_join(spark: SparkSession, tables: dict) -> DataFrame:
    """The Q3-shaped fact-fact join over the bucketed layout: revenue
    per order. With matching bucket counts this plans with zero
    Exchange operators (asserted in tests/test_bucketing.py)."""
    from pyspark.sql import functions as F

    li = spark.table(tables["lineitem"])
    o = spark.table(tables["orders"])
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_orderkey")
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
                .cast("bigint")
            ).alias("revenue_c")
        )
    )
