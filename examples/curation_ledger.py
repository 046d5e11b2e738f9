"""LLM-pipeline: the per-document curation decision ledger.

Three independent screens composed into one keep/drop table per
document — the decision a training-data pipeline acts on:

- Gopher/MassiveText quality gate (word count, mean word length,
  repetition rules) — narrow JVM expressions, zero shuffle;
- passage-level exact dedup contamination (duplicate 8-token chunks
  survive only in their smallest-id owner doc);
- SemDeDup semantic screening (k-means clusters, within-cluster
  cosine witnesses) over the embeddings table.

Run:  python examples/curation_ledger.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from spark_eventhubs_spark.operators.clustering import kmeans_assign, semdedup
from spark_eventhubs_spark.operators.dedup import chunk_dedup
from spark_eventhubs_spark.operators.text import gopher_filters


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    print("Gopher quality gate (per-rule signals + keep flag):")
    gopher_filters(docs).show(5)

    print("passage dedup (cleaned text, drop counts):")
    chunk_dedup(docs).select("doc_id", "n_chunks", "n_dropped").show(5)

    print("k-means clusters (exact integer-sum centroids):")
    kmeans_assign(emb).groupBy("cluster_id").count().orderBy("cluster_id").show()

    print("SemDeDup screen (semantic near-dup witnesses):")
    sem = semdedup(emb)
    sem.groupBy("keep").count().show()

    print("composed decision: keep = quality AND not-near-dup AND low contamination")
    g = gopher_filters(docs).select("doc_id", F.col("keep").alias("q_keep"))
    c = chunk_dedup(docs).select(
        "doc_id", (F.col("n_dropped") * 2 <= F.col("n_chunks")).cast("int").alias("c_keep")
    )
    s = sem.select(F.col("vec_id").alias("doc_id"), F.col("keep").alias("s_keep"))
    ledger = (
        g.join(c, "doc_id")
        .join(s, "doc_id", "left")
        .select(
            "doc_id",
            (F.col("q_keep").eqNullSafe(1)
             & F.col("c_keep").eqNullSafe(1)
             & F.coalesce(F.col("s_keep"), F.lit(1)).eqNullSafe(1)
             ).cast("int").alias("final_keep"),
        )
    )
    ledger.groupBy("final_keep").count().show()
    spark.stop()


if __name__ == "__main__":
    main()
