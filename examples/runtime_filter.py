"""Runtime bloom-filter join pruning: shrink the probe-side shuffle.

Builds a constant-width bloom position set from a selective filtered
build side (urgent H1-1996 orders) and prunes lineitem with broadcast
semi-joins BEFORE the exact orderkey join. Prints how many probe rows
survived pruning vs the exact match count — the pruned exact join is
guaranteed identical to the unpruned one (bloom error is one-sided).
At 100 TB this is the difference between shuffling the whole fact
table and shuffling ~the matching slice.

Run:  python examples/runtime_filter.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["PYTHONPATH"] = (
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    + os.pathsep
    + os.environ.get("PYTHONPATH", "")
)

from pyspark.sql import functions as F

import spark_eventhubs_spark as eh
from spark_eventhubs_spark.operators import runtime_filter as RF


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = eh.build_session("runtime-filter-example", master="local[4]",
                             shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").where(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")

    positions = RF.bloom_positions(orders.select("o_orderkey"), "o_orderkey")
    pruned = RF.bloom_prune(lineitem, "l_orderkey", positions)

    n_probe = lineitem.count()
    n_pruned = pruned.count()
    n_exact = lineitem.join(
        orders, lineitem["l_orderkey"] == orders["o_orderkey"]
    ).count()
    n_via = pruned.join(
        orders, pruned["l_orderkey"] == orders["o_orderkey"]
    ).count()
    print(f"probe rows:          {n_probe}")
    print(f"after bloom prune:   {n_pruned}"
          f"  ({100.0 * n_pruned / max(n_probe, 1):.2f}% survive)")
    print(f"exact join rows:     {n_exact} (unpruned) vs {n_via} (pruned)")
    assert n_via == n_exact, "bloom pruning must not change the join result"

    plan = pruned._jdf.queryExecution().executedPlan().toString()
    semis = plan.count("LeftSemi")
    print(f"LeftSemi broadcast joins in the pruned plan: {semis}")
    spark.stop()


if __name__ == "__main__":
    main()
