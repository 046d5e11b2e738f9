"""Batch read: bounded scan of the simulated hub between positions.

Mirrors the reference's batch quickstart
(docs/structured-streaming-eventhubs-integration.md §batch): build a
conf, pick start/end positions, read a bounded 9-column DataFrame,
then run plain DataFrame ops on it.

Run:  python examples/batch_read.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from spark_eventhubs_spark.conf import EventHubsConf
from spark_eventhubs_spark.connstr import file_hub_connection_string
from spark_eventhubs_spark.plans.hubview import configure_session
from spark_eventhubs_spark.position import EventPosition
from spark_eventhubs_spark.sources.batch import read_eventhubs


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    configure_session(spark)  # testdata timestamps are TIMESTAMP(NANOS)

    conf = (
        EventHubsConf(file_hub_connection_string(sf_dir, "events"))
        .set_starting_position(EventPosition.from_sequence_number(100))
        .set_ending_position(EventPosition.from_sequence_number(200))
    )
    df = read_eventhubs(spark, conf)  # canonical 9-column schema
    df.printSchema()

    # the query surface is vanilla Spark from here on
    out = (
        df.select(F.col("body").cast("string").alias("body"), "partition")
        .groupBy("partition")
        .agg(F.count("*").alias("n"))
        .orderBy("partition")
    )
    out.show()
    spark.stop()


if __name__ == "__main__":
    main()
