"""Round-14 optimization internals.

Each test pins the EQUIVALENCE an optimization claims (same rows as
the unfused form) plus the structural property that makes it an
optimization (one Python eval node / shared production).
"""

import pyspark.sql.functions as F


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


# ---- fused recall@k kernel (similarity.recall_topk_per_method) ----

def _emb(spark, n=40, dim=8):
    # deterministic spread of float vectors with some near-duplicates
    rows = []
    for i in range(n):
        v = [((i * 7 + j * 13) % 19 - 9) / 7.0 for j in range(dim)]
        if i % 11 == 3:  # near-dup of vector 0's direction
            v = [x * 1.5 + 0.01 * i for x in rows[0][1]] if rows else v
        rows.append((i, v))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_recall_topk_matches_standalone_legs(spark):
    """The fused one-pass kernel must reproduce each standalone
    operator's top-k EXACTLY (same ids, same score_e6, same tie
    order) — it replaces three corpus scans, not the algorithm."""
    from spark_eventhubs_spark.operators import similarity as S

    emb = _emb(spark)
    k, dim, n_cells = 5, 8, 4
    fused = S.recall_topk_per_method(
        emb, query_vec_id=0, k=k, dim=dim, n_cells=n_cells, n_probe=2
    )
    per = {}
    for r in fused.collect():
        per.setdefault(r["method"], set()).add((r["vec_id"], r["score_e6"]))
    brute = {
        (r["vec_id"], r["score_e6"])
        for r in S.brute_force_topk(emb, 0, k).collect()
    }
    lsh = {
        (r["vec_id"], r["score_e6"])
        for r in S.lsh_ann_topk(emb, 0, k, dim=dim).collect()
    }
    ivf = {
        (r["vec_id"], r["score_e6"])
        for r in S.ivf_ann_topk(emb, 0, k, n_cells=n_cells, n_probe=2).collect()
    }
    assert per["brute"] == brute
    assert per.get("lsh", set()) == lsh
    assert per.get("ivf", set()) == ivf


def test_recall_topk_single_python_eval(spark):
    """Structural: ONE scan, ONE Python eval node — the whole point of
    the fusion (the r13 form ran three corpus scans / two kernels)."""
    from spark_eventhubs_spark.operators import similarity as S

    emb = _emb(spark)
    df = S.recall_topk_per_method(
        emb, query_vec_id=0, k=5, dim=8, n_cells=4, n_probe=2
    )
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("MapInPandas") == 1, plan


def test_recall_topk_missing_query_raises(spark):
    from spark_eventhubs_spark.operators import similarity as S
    import pytest as _pytest

    emb = _emb(spark)
    with _pytest.raises(ValueError, match="query vector"):
        S.recall_topk_per_method(emb, query_vec_id=10_000, k=5, dim=8)


# ---- shared batch gram frame (exact_substring_spans_incremental) ----

def test_substring_incremental_accepts_precomputed_grams(spark):
    """The ingest twin persists substring_grams(batch) once per
    trigger and passes it in; the result must be IDENTICAL to the
    self-computed path."""
    from spark_eventhubs_spark.operators import dedup as D

    batch = spark.createDataFrame(
        [
            (10, "a b c d e f g h i j k l m n o p q r s t u v w x y z"),
            (11, "a b c d e f g h i j k l m n o p zz yy xx ww vv uu"),
            (12, "totally different words with no overlap at all here"),
        ],
        "doc_id long, text string",
    )
    store = spark.createDataFrame([], "h bigint, n_occ bigint")
    base = D.exact_substring_spans_incremental(batch, store)
    shared = D.exact_substring_spans_incremental(
        batch, store, grams=D.substring_grams(batch)
    )
    assert _rows(base) == _rows(shared)
