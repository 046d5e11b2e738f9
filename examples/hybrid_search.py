"""Hybrid retrieval: BM25 + vector search fused by RRF.

Runs the sparse leg (BM25 over whitespace tokens — the postings-only
shuffle), the dense leg (cosine top-k over the embeddings table), and
the reciprocal-rank fusion that combines them without score
calibration — the standard RAG serving recipe. Also shows the
compressed-domain alternative for the dense leg: product-quantization
ADC scoring with exact re-rank of the shortlist.

Run:  python examples/hybrid_search.py [sf_dir]
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
from spark_eventhubs_spark.operators.search import hybrid_rrf
from spark_eventhubs_spark.operators.similarity import pq_topk_rerank
from spark_eventhubs_spark.operators.text import bm25_topk


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = eh.build_session("hybrid-search-example", master="local[4]",
                             shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    print("-- sparse leg: BM25 top-5 for ['spark', 'join', 'window'] --")
    bm25_topk(docs, k=5).show()

    print("-- dense leg (compressed): PQ + ADC shortlist + exact re-rank --")
    pq_topk_rerank(emb, query_vec_id=0, k=5).show()

    print("-- fused: reciprocal-rank fusion of both legs --")
    hybrid_rrf(docs, emb, k=10).show()

    spark.stop()


if __name__ == "__main__":
    main()
