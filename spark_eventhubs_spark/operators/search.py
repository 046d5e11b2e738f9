"""Hybrid retrieval: BM25 text search fused with vector search by
reciprocal-rank fusion (RRF).

The standard two-tower serving recipe for LLM retrieval (RAG): run the
sparse (inverted-index / BM25) and dense (ANN) retrievers
independently, then fuse by rank — RRF needs no score calibration
between the two systems, only ranks, which makes it deterministic and
integer-exact: ``rrf = sum over lists of 1e6 // (c + rank)``.

Scale: each leg is already a top-k (TakeOrdered) plan — BM25 shuffles
only the query's postings (operators/text.bm25_topk), the dense leg is
a scan-side scoring kernel + TakeOrdered (operators/similarity) whose
scale path swaps in IVF/PQ behind the same (id, score) contract. The
fusion itself joins two k-row frames — driver-trivial at any corpus
size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

RRF_C = 60  # the standard RRF dampening constant


def hybrid_rrf(
    docs: DataFrame,
    emb: DataFrame,
    query_terms: list | None = None,
    query_vec_id: int = 0,
    k: int = 10,
    k_each: int = 20,
    c: int = RRF_C,
) -> DataFrame:
    """Top-``k`` documents by RRF over a BM25 top-``k_each`` text list
    and a cosine top-``k_each`` vector list (doc_id and vec_id share a
    key domain in the testdata). Emits (doc_id, t_rank, v_rank,
    rrf_e6); rank 0 means "absent from that list". All-integer after
    the two legs' own deterministic scoring."""
    from spark_eventhubs_spark.operators.similarity import brute_force_topk
    from spark_eventhubs_spark.operators.text import bm25_topk

    w_t = Window.orderBy(F.col("score_e3").desc(), F.col("doc_id").asc())
    text = bm25_topk(docs, query_terms, k=k_each).select(
        "doc_id", F.row_number().over(w_t).cast("long").alias("t_rank")
    )
    w_v = Window.orderBy(F.col("score_e6").desc(), F.col("vec_id").asc())
    vec = brute_force_topk(emb, query_vec_id, k=k_each).select(
        F.col("vec_id").alias("doc_id"),
        F.row_number().over(w_v).cast("long").alias("v_rank"),
    )
    fused = text.join(vec, "doc_id", "full").select(
        "doc_id",
        F.coalesce(F.col("t_rank"), F.lit(0)).cast("long").alias("t_rank"),
        F.coalesce(F.col("v_rank"), F.lit(0)).cast("long").alias("v_rank"),
    )
    rrf = F.expr(
        f"if(t_rank > 0, 1000000 div ({c} + t_rank), 0)"
        f" + if(v_rank > 0, 1000000 div ({c} + v_rank), 0)"
    )
    return (
        fused.withColumn("rrf_e6", rrf.cast("long"))
        .orderBy(F.col("rrf_e6").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def oracle_hybrid_rrf(
    query_terms: list | None = None,
    query_vec_id: int = 0,
    k: int = 10,
    k_each: int = 20,
    c: int = RRF_C,
) -> str:
    from spark_eventhubs_spark.operators.similarity import oracle_brute_force_topk
    from spark_eventhubs_spark.operators.text import oracle_bm25_topk

    bm = oracle_bm25_topk(query_terms, k=k_each)
    vq = oracle_brute_force_topk(query_vec_id, k=k_each)
    return f"""WITH bm AS (
{bm}
), bmr AS (
  SELECT doc_id,
    CAST(ROW_NUMBER() OVER (ORDER BY score_e3 DESC, doc_id ASC) AS BIGINT) AS t_rank
  FROM bm
), vq AS (
{vq}
), vr AS (
  SELECT vec_id AS doc_id,
    CAST(ROW_NUMBER() OVER (ORDER BY score_e6 DESC, vec_id ASC) AS BIGINT) AS v_rank
  FROM vq
), fused AS (
  SELECT COALESCE(b.doc_id, v.doc_id) AS doc_id,
         CAST(COALESCE(b.t_rank, 0) AS BIGINT) AS t_rank,
         CAST(COALESCE(v.v_rank, 0) AS BIGINT) AS v_rank
  FROM bmr b FULL OUTER JOIN vr v ON b.doc_id = v.doc_id
)
SELECT doc_id, t_rank, v_rank,
  CAST(CASE WHEN t_rank > 0 THEN 1000000 // ({c} + t_rank) ELSE 0 END
     + CASE WHEN v_rank > 0 THEN 1000000 // ({c} + v_rank) ELSE 0 END AS BIGINT) AS rrf_e6
FROM fused
ORDER BY rrf_e6 DESC, doc_id ASC
LIMIT {k}"""
