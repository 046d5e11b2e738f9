"""ANN serving path: build an on-disk IVF index, query with pruning.

Builds the cell_id-partitioned layout (`ivf_build_index`), then runs a
top-k cosine query that physically reads only the probe cells via
Spark partition pruning (`ivf_query_indexed`) — the 100 TB shape where
a query touches n_probe/n_cells of the corpus. Also shows the
corpus-management ops a training pipeline runs on the same tables:
deterministic hash split, stratified sampling, decontamination.

Run:  python examples/ann_index.py [sf_dir]
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
from spark_eventhubs_spark.operators.corpus import hash_split, stratified_sample
from spark_eventhubs_spark.operators.similarity import (
    ivf_build_index,
    ivf_query_indexed,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = eh.build_session("ann-index-example", master="local[4]",
                             shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    index_dir = tempfile.mkdtemp(prefix="ivf_index_")

    cents = ivf_build_index(emb, index_dir, n_cells=16)
    print(f"indexed {emb.count()} vectors into {len(cents)} cells at {index_dir}")

    qvec = [float(x) for x in emb.where("vec_id = 0").first()["embedding"]]
    topk = ivf_query_indexed(spark, index_dir, qvec, k=5, n_probe=4, exclude_id=0)
    print("top-5 neighbors (probe reads 4/16 cells):")
    topk.show()

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    hash_split(docs).groupBy("split").count().orderBy("split").show()
    print("stratified sample (3 per lang):")
    stratified_sample(docs, k=3).orderBy("lang", "rn").show(12)

    spark.stop()


if __name__ == "__main__":
    main()
