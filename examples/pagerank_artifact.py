"""PageRank over a bucketed edge artifact: ingest once, iterate cheap.

The co-purchase graph's edge list (src, dst, deg — degree joined in at
ingest) is a pure function of the corpus. Materializing it bucketed by
``src`` (`ensure_copurchase_edges`) turns every PageRank iteration into
a join with NO shuffle on the |edges|-row side — only the |nodes|-row
ranks frame exchanges. At 100 TB that is the difference between
re-shuffling the edge list every iteration and a purely local merge
join per bucket.

Run:  python examples/pagerank_artifact.py [sf_dir]
"""

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["PYTHONPATH"] = (
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    + os.pathsep
    + os.environ.get("PYTHONPATH", "")
)

import spark_eventhubs_spark as eh
from spark_eventhubs_spark.bucketing import ensure_copurchase_edges
from spark_eventhubs_spark.operators import graph as G


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = eh.build_session("pagerank-artifact-example", master="local[4]",
                            shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")

    # explicit script-managed location: the default would leak a
    # seh_bucketed_* tempdir holding the full edge tree every run
    work = tempfile.mkdtemp(prefix="pagerank_example_")
    t0 = time.time()
    tbl = ensure_copurchase_edges(spark, sf_dir, location=work)
    n_edges = spark.table(tbl).count()
    print(f"ingest: {tbl} ({n_edges} edges, bucketed by src) "
          f"in {time.time() - t0:.2f}s")

    t0 = time.time()
    top = G.pagerank(edges=spark.table(tbl))
    rows = top.collect()
    print(f"steady-state: {G.PR_ITERS} iterations in {time.time() - t0:.2f}s")
    for r in rows[:5]:
        print(f"  part {r['partkey']}: rank {r['rank']}")

    # the plan property the layout buys: one iteration's edge join has
    # no Exchange on the bucketed scan side (force the at-scale SMJ
    # shape so it is visible at tiny sf)
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    edges = spark.table(tbl)
    ranks = (
        edges.select(F.col("src").alias("node")).distinct()
        .localCheckpoint(eager=True)
        .select("node", F.lit(1).cast("long").alias("rank"))
    )
    joined = edges.join(
        ranks.withColumnRenamed("node", "src")
        .withColumnRenamed("rank", "r_src"),
        "src",
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    n_exchange = plan.count("Exchange hashpartitioning")
    assert "Bucketed: true" in plan, plan
    assert n_exchange == 1, plan
    print(f"iteration join: bucketed scan, {n_exchange} Exchange "
          "(the ranks side only) — edge list never re-shuffles")
    # identical ranks to the from-lineitem path
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    assert sorted(map(tuple, rows)) == sorted(
        map(tuple, G.pagerank(li).collect())
    )
    print("artifact path matches from-lineitem ranks exactly")
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
