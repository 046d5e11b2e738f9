"""Streaming: rate-limited micro-batches -> watermark + tumbling window.

The reference's flagship end-to-end test query
(T/sql/eventhubs/EventHubsSourceSuite.scala:737-778) on the native
Python DataSource: spark.readStream.format("eventhubs") with
proportional rate limiting, then an event-time windowed count.

Run:  python examples/streaming_window_count.py [sf_dir]
"""

import os
import sys
import tempfile

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)
# Spark's python workers must import the package too
os.environ["PYTHONPATH"] = repo + os.pathsep + os.environ.get("PYTHONPATH", "")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from spark_eventhubs_spark.sources.datasource import (
        materialize_hub,
        register_eventhubs,
    )

    register_eventhubs(spark)
    work = tempfile.mkdtemp(prefix="eh_example_")
    hub = materialize_hub(spark, sf_dir, f"{work}/hub")

    sdf = (
        spark.readStream.format("eventhubs")
        .option("path", hub)
        .option("eventhubs.maxEventsPerTrigger", "500")
        .load()
    )
    agg = (
        sdf.withWatermark("enqueuedTime", "1 hour")
        .groupBy(F.window("enqueuedTime", "1 hour"))
        .agg(F.count("*").alias("n"))
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("windowed")
        .option("checkpointLocation", f"{work}/ckpt")
        .start()
    )
    q.processAllAvailable()
    spark.sql("SELECT * FROM windowed ORDER BY window.start").show(5, False)
    q.stop()
    spark.stop()


if __name__ == "__main__":
    main()
