"""Write path — schema validation, routing, at-least-once append.

Re-implements the sink contract of
``core/src/main/scala/org/apache/spark/sql/eventhubs/EventHubsWriter.scala:41-62``
(expected schema) and ``EventHubsWriteTask.scala:118-219`` (validation +
projection + routing):

- ``body``: string or binary, required; cast to binary.
- ``partition`` / ``partitionId``: optional string — pin to a partition.
- ``partitionKey``: optional string — hash-routed.
- ``properties``: optional map<string,string>.
- setting both partition and partitionKey is an error
  (EventHubsWriteTask.scala:146-149); neither => round-robin.
- batch save mode: Append only; Overwrite/Ignore/ErrorIfExists rejected
  (EventHubsSourceProvider.scala:108-141).
- streaming sink dedups re-delivered batches by batchId only
  (EventHubsSink.scala:35-42) — at-least-once.

Spark-first: validation happens on the analyzed schema (driver), the
projection is a single ``select`` of built-in expressions (stays in
whole-stage codegen), routing is a column expression, and the append is
one distributed parquet write — no per-row driver loop.
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, MapType, StringType

from spark_eventhubs_spark.sources.hub import SimulatedEventHubs


def _validated_projection(df: DataFrame, partition_count: int) -> DataFrame:
    """Validate the write schema and project to (body, partition_route,
    partitionKey, properties) — mirrors EventHubsWriteTask.scala:156-219."""
    fields = {f.name: f.dataType for f in df.schema.fields}

    if "body" not in fields:
        raise ValueError("Required attribute 'body' not found")
    if not isinstance(fields["body"], (StringType, BinaryType)):
        raise ValueError(
            f"body attribute type must be a string or binary, got {fields['body']}"
        )

    part_col = None
    if "partition" in fields:
        part_col = "partition"
    elif "partitionId" in fields:
        part_col = "partitionId"
    if part_col is not None and not isinstance(fields[part_col], StringType):
        raise ValueError(f"{part_col} attribute type must be a string")

    has_key = "partitionKey" in fields
    if has_key and not isinstance(fields["partitionKey"], StringType):
        raise ValueError("partitionKey attribute type must be a string")

    if part_col is not None and has_key:
        # ref EventHubsWriteTask.scala:146-149
        raise ValueError(
            "Both a partitionKey and a partition were detected. Only one may be set."
        )

    if "properties" in fields:
        pt = fields["properties"]
        if not (isinstance(pt, MapType)
                and isinstance(pt.keyType, StringType)
                and isinstance(pt.valueType, StringType)):
            raise ValueError("properties attribute type must be map<string,string>")
        props = F.col("properties")
    else:
        props = F.map_from_arrays(
            F.array().cast("array<string>"), F.array().cast("array<string>")
        )

    if part_col is not None:
        route = F.col(part_col)
    elif has_key:
        # key-hashed routing: deterministic hash of the key
        route = F.pmod(F.xxhash64(F.col("partitionKey")), F.lit(partition_count)).cast("string")
    else:
        # round-robin: spread rows evenly without a shuffle. The raw
        # monotonic id jumps by 2^33 per task (so id % P == rowInTask % P,
        # biasing low partitions for small tasks); hashing it first gives
        # a uniform spread while staying deterministic within a write.
        route = F.pmod(
            F.xxhash64(F.monotonically_increasing_id()), F.lit(partition_count)
        ).cast("string")

    key = F.col("partitionKey") if has_key else F.lit(None).cast("string")
    return df.select(
        F.col("body").cast("binary").alias("body"),
        route.alias("partition"),
        key.alias("partitionKey"),
        props.alias("properties"),
    )


def write_eventhubs(
    df: DataFrame,
    hub: SimulatedEventHubs,
    mode: str = "append",
    batch_id: Optional[int] = None,
) -> int:
    """Append ``df`` to the hub. Returns rows written (0 when the
    batchId was already committed — idempotent redelivery skip).

    Sequence numbers are assigned per partition continuing from the
    hub's current latest; enqueuedTime is the write time.
    """
    if mode.lower() != "append":
        # ref EventHubsSourceProvider.scala:108-141
        raise ValueError(f"Save mode {mode} not allowed for EventHubs. "
                         f"Allowed save mode: append")
    if hub._hub_dir is None:
        raise ValueError("write_eventhubs requires a hub-dir backed hub")

    # batchId idempotence (ref EventHubsSink.scala:35-42)
    commit_log = os.path.join(hub._hub_dir, "_batch_commits")
    if batch_id is not None:
        os.makedirs(commit_log, exist_ok=True)
        marker = os.path.join(commit_log, str(batch_id))
        if os.path.exists(marker):
            return 0

    spark = df.sparkSession
    projected = _validated_projection(df, hub.partition_count)

    bounds = hub.bounded_seq_nos()
    base_df = spark.createDataFrame(
        [(str(pid), lo_hi[1]) for pid, lo_hi in bounds.items()],
        "partition string, base_seq long",
    )
    from pyspark.sql import Window

    w = Window.partitionBy("partition").orderBy(F.monotonically_increasing_id())
    out = (
        projected.join(F.broadcast(base_df), "partition", "left")
        .withColumn(
            "sequenceNumber",
            (F.coalesce(F.col("base_seq"), F.lit(0))
             + F.row_number().over(w) - 1).cast("long"),
        )
        .select(
            "body",
            "partition",
            F.col("sequenceNumber").cast("string").alias("offset"),
            "sequenceNumber",
            F.current_timestamp().alias("enqueuedTime"),
            F.lit(None).cast("string").alias("publisher"),
            "partitionKey",
            "properties",
            F.map_from_arrays(
                F.array().cast("array<string>"), F.array().cast("array<string>")
            ).alias("systemProperties"),
        )
    )
    n_before = len([f for f in os.listdir(hub._hub_dir) if f.endswith(".parquet")])
    target = os.path.join(hub._hub_dir, f"write-{n_before:06d}.parquet")
    out.write.mode("overwrite").parquet(target)
    written = spark.read.parquet(target).count()
    if batch_id is not None:
        with open(os.path.join(commit_log, str(batch_id)), "w") as fh:
            fh.write("committed")
    return int(written)
