"""Ingest-once bucketed layout: shuffle-free fact-fact joins.

Materializes orderkey-bucketed copies of lineitem and orders once
(`ensure_bucketed`), then runs the per-order revenue join over the
bucketed tables and prints the plan — with matching bucket counts the
join AND the orderkey groupBy need no Exchange at all. At 100 TB this
is the difference between an all-to-all shuffle of the largest table
on every query and a purely local merge join per bucket.

Run:  python examples/bucketed_ingest.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["PYTHONPATH"] = (
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    + os.pathsep
    + os.environ.get("PYTHONPATH", "")
)

import spark_eventhubs_spark as eh
from spark_eventhubs_spark.bucketing import bucketed_join, ensure_bucketed


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = eh.build_session("bucketed-ingest-example", master="local[4]",
                             shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")

    tables = ensure_bucketed(spark, sf_dir)
    print("bucketed tables:", tables)

    # show the fact-fact plan the layout buys (disable auto-broadcast
    # so the co-located path is visible even at tiny sf)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    df = bucketed_join(spark, tables)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, "bucketed join must not shuffle"
    print("zero-Exchange fact join confirmed")

    top = df.orderBy(df["revenue_c"].desc()).limit(3).collect()
    for r in top:
        print(f"order {r['o_orderkey']}: revenue_c={r['revenue_c']}")

    spark.stop()


if __name__ == "__main__":
    main()
