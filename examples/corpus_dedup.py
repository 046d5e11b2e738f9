"""LLM-pipeline: clean a document corpus (gate -> dedup -> stats).

The composed training-data recipe over the documents table: quality +
language gating, exact dedup, MinHash-LSH near-dup removal, and
per-language corpus stats — one lazy Spark plan.

Run:  python examples/corpus_dedup.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from spark_eventhubs_spark.operators.dedup import near_dup_pairs
from spark_eventhubs_spark.operators.pipeline import clean_corpus


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
    print("near-duplicate pairs (LSH + Jaccard-verified):")
    near_dup_pairs(docs).show(10, False)

    print("cleaned corpus stats:")
    clean_corpus(docs).show()
    spark.stop()


if __name__ == "__main__":
    main()
