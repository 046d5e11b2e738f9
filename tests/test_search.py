"""Hybrid-retrieval (RRF) fusion invariants; exact values are pinned
by the DuckDB oracle in the catalog."""

from pyspark.sql import functions as F

from spark_eventhubs_spark.operators.search import RRF_C, hybrid_rrf

from conftest import SF_DIR


def test_hybrid_rrf_fusion_invariants(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    out = hybrid_rrf(docs, emb, k=10, k_each=20).collect()
    assert len(out) == 10
    for r in out:
        # ranks bounded by the per-leg list size; at least one leg hit
        assert 0 <= r["t_rank"] <= 20 and 0 <= r["v_rank"] <= 20
        assert r["t_rank"] > 0 or r["v_rank"] > 0
        # rrf recomputes from the ranks exactly
        want = (1_000_000 // (RRF_C + r["t_rank"]) if r["t_rank"] else 0) + (
            1_000_000 // (RRF_C + r["v_rank"]) if r["v_rank"] else 0
        )
        assert r["rrf_e6"] == want
    # output is sorted by (rrf desc, doc_id asc)
    keys = [(-r["rrf_e6"], r["doc_id"]) for r in out]
    assert keys == sorted(keys)
    # any doc present in BOTH legs must beat every single-leg doc whose
    # best rank is worse-or-equal to both of its ranks
    both = [r for r in out if r["t_rank"] and r["v_rank"]]
    single = [r for r in out if not (r["t_rank"] and r["v_rank"])]
    if both and single:
        assert max(r["rrf_e6"] for r in both) > min(r["rrf_e6"] for r in single)
