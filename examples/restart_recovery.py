"""Exactly-once restart recovery: kill a stateful drain mid-backlog,
restart from the checkpoint, and verify the sink against batch truth.

Mirrors the reference's recovery-after-restart contract
(EventHubsSourceSuite.scala:419-513) on the native Python DataSource:
the offset log resumes where it stopped (no lost events) and a batch
whose sink commit landed but whose engine commit marker didn't —
the classic crash window — is replayed and deduplicated by the file
sink's own batchId ledger (no duplicates).

Run:  python examples/restart_recovery.py [sf_dir]
"""

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["PYTHONPATH"] = (
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    + os.pathsep + os.environ.get("PYTHONPATH", "")
)

import spark_eventhubs_spark as eh
from spark_eventhubs_spark.sources.datasource import (
    materialize_hub,
    register_eventhubs,
)
from spark_eventhubs_spark.streaming.stateful import streaming_scd2


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = eh.build_session("restart-recovery-example", master="local[4]",
                             shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="restart_recovery_")
    hub = os.path.join(work, "events")
    ckpt = os.path.join(work, "ckpt")
    sink = os.path.join(work, "sink")
    materialize_hub(spark, sf_dir, hub)
    register_eventhubs(spark)

    def start():
        sdf = (
            spark.readStream.format("eventhubs")
            .option("path", hub)
            .option("eventhubs.maxEventsPerTrigger", "250")
            .option("eventhubs.consumerGroup", "recovery_demo")
            .load()
        )
        return (
            streaming_scd2(sdf)  # CDC: closed per-user state intervals
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(processingTime="50 milliseconds")
            .start()
        )

    # phase 1: drain part of the backlog, then stop
    q1 = start()
    cdir = os.path.join(ckpt, "commits")
    deadline = time.time() + 120
    while time.time() < deadline:
        done = (os.path.isdir(cdir)
                and len([f for f in os.listdir(cdir) if f.isdigit()]) >= 2)
        if done:
            break
        time.sleep(0.2)
    print("stopping mid-backlog (Spark logs an ERROR for the aborted "
          "in-flight batch — that IS the kill being demonstrated)")
    q1.stop()

    # simulate a crash AFTER the sink committed batch N but BEFORE the
    # engine wrote commits/N (remove the marker + its checksum sidecar)
    newest = max(int(f) for f in os.listdir(cdir) if f.isdigit())
    os.remove(os.path.join(cdir, str(newest)))
    crc = os.path.join(cdir, f".{newest}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    print(f"simulated crash: batch {newest} will replay on restart")

    # phase 2: restart from the same checkpoint, drain to completion
    q2 = start()
    q2.processAllAvailable()
    q2.stop()

    # verify: sink == batch truth, exactly once
    got = sorted(
        (r["user_id_str"], r["state"], r["valid_from_us"],
         r["valid_to_us"], r["n_events"])
        for r in spark.read.parquet(sink).collect()
    )
    import __spark_entry__ as entry

    batch = sorted(
        (r["user_id_str"], r["state"], r["valid_from_us"],
         r["valid_to_us"], r["n_events"])
        for r in entry.queries()["scd2_state_history"](spark, sf_dir).collect()
        if r["valid_to_us"] is not None
    )
    assert got == batch, (len(got), len(batch))
    print(f"exactly-once verified: {len(got)} closed intervals, "
          f"no duplicates from the replayed batch, no losses")
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
