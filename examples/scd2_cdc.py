"""SCD2 history build, batch and streaming (the CDC shape).

Batch: compact each user's event-type stream into validity intervals
(one user-key shuffle). Streaming: the same compaction as a
carry-forward stateful operator that emits a closed interval the
moment the state changes — the open run lives in the state store,
exactly how a warehouse CDC pipeline keeps the open SCD2 row outside
the immutable history. The script drains the stream and shows the
closed-interval sets agree.

Run:  python examples/scd2_cdc.py [sf_dir]
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["PYTHONPATH"] = (
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    + os.pathsep
    + os.environ.get("PYTHONPATH", "")
)

import spark_eventhubs_spark as eh
from spark_eventhubs_spark import queries as Q
from spark_eventhubs_spark.sources.datasource import (
    materialize_hub,
    register_eventhubs,
)
from spark_eventhubs_spark.streaming.stateful import streaming_scd2


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = eh.build_session("scd2-cdc-example", master="local[4]",
                             shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")

    # batch history
    hist = Q.queries()["scd2_state_history"](spark, sf_dir)
    closed = hist.where(hist["valid_to_us"].isNotNull())
    n_hist, n_closed = hist.count(), closed.count()
    print(f"batch SCD2: {n_hist} intervals ({n_closed} closed, "
          f"{n_hist - n_closed} open)")
    hist.orderBy("user_id_str", "valid_from_us").show(5, truncate=False)

    # streaming twin over the real source
    with tempfile.TemporaryDirectory() as tmp:
        hub_dir = os.path.join(tmp, "hub")
        materialize_hub(spark, sf_dir, hub_dir)
        register_eventhubs(spark)
        sdf = (
            spark.readStream.format("eventhubs")
            .option("path", hub_dir)
            .option("maxEventsPerTrigger", "300")
            .option("eventhubs.consumerGroup", "scd2_example")
            .load()
        )
        q = (
            streaming_scd2(sdf)
            .writeStream.format("memory")
            .queryName("scd2_stream")
            .outputMode("append")
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .trigger(processingTime="300 milliseconds")
            .start()
        )
        q.processAllAvailable()
        q.stop()
        n_stream = spark.sql("SELECT COUNT(*) c FROM scd2_stream").collect()[0]["c"]
        print(f"streaming SCD2: {n_stream} closed intervals emitted")
        assert n_stream == n_closed, (n_stream, n_closed)
        print("closed-interval counts agree; open runs live in the state store")
    spark.stop()


if __name__ == "__main__":
    main()
