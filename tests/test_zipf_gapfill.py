"""Unit semantics for the round-11 additions: Zipf slope quantized
OLS, CCNet perplexity terciles, and time-series gap-fill linear
interpolation. The catalog oracle pins full-corpus parity; these pin
the hand-checkable math on tiny inputs."""

import math

from pyspark.sql import functions as F

from spark_eventhubs_spark.operators import text as T

SF_DIR = "/root/testdata/sf0.001"


def _expected_slope_e3(counts):
    """Replicate the per-row e3 quantization + integer-moment OLS."""
    ranked = sorted(counts, reverse=True)
    xs = [math.floor(1000.0 * math.log(r + 1)) for r in range(len(ranked))]
    ys = [math.floor(1000.0 * math.log(c)) for c in ranked]
    n = len(ranked)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    num = float(n) * float(sxy) - float(sx) * float(sy)
    den = float(n) * float(sxx) - float(sx) * float(sx)
    return math.floor(1000.0 * num / den)


def test_zipf_slope_tiny_corpus(spark):
    # token counts: aa=4, bb=2, cc=1 -> a clean 3-point log-log fit
    df = spark.createDataFrame(
        [(1, "aa aa aa", "xx"), (2, "aa bb cc bb", "xx")],
        "doc_id long, text string, lang string",
    )
    row = T.zipf_slope(df).collect()[0]
    assert row.lang == "xx" and row.n_types == 3
    assert row.slope_e3 == _expected_slope_e3([4, 2, 1])
    # a perfect Zipf spectrum c(r) = 60/r fits slope -1 (quantization
    # keeps it within a few e3 ticks)
    docs = " ".join(
        " ".join(f"t{r}" for _ in range(60 // r)) for r in range(1, 7)
    )
    df2 = spark.createDataFrame(
        [(1, docs, "yy")], "doc_id long, text string, lang string"
    )
    row2 = T.zipf_slope(df2).collect()[0]
    assert abs(row2.slope_e3 - (-1000)) < 40


def test_perplexity_terciles_balanced_and_ordered(spark):
    import __spark_entry__ as entry

    df = entry.queries()["corpus_perplexity_buckets"](spark, SF_DIR)
    rows = df.collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rs in by_lang.items():
        sizes = {b: sum(1 for r in rs if r.bucket == b)
                 for b in ("head", "middle", "tail")}
        assert max(sizes.values()) - min(sizes.values()) <= 1, (lang, sizes)
        # tercile boundaries respect the perplexity order
        assert max(r.ppl_e3 for r in rs if r.bucket == "head") <= min(
            r.ppl_e3 for r in rs if r.bucket == "tail"
        ), lang


def test_gapfill_dense_series_and_interpolation(spark):
    import __spark_entry__ as entry

    df = entry.queries()["ts_gapfill_interpolate"](spark, SF_DIR)
    pdf = df.toPandas()
    assert not pdf.value_e2.isna().any()
    for uid, g in pdf.groupby("user_id"):
        g = g.sort_values("hour_bucket").reset_index(drop=True)
        # dense: one row per hour from first to last active hour
        assert len(g) == g.hour_bucket.iloc[-1] - g.hour_bucket.iloc[0] + 1
        # endpoints are observed, never interpolated
        assert g.interpolated.iloc[0] == 0 and g.interpolated.iloc[-1] == 0
    # spot-check one interpolated run against the closed form
    g = pdf[pdf.user_id == pdf[pdf.interpolated == 1].user_id.iloc[0]]
    g = g.sort_values("hour_bucket").reset_index(drop=True)
    i = int(g[g.interpolated == 1].index[0])
    lo = i - 1
    hi = i
    while g.interpolated.iloc[hi] == 1:
        hi += 1
    pv, nv = int(g.value_e2.iloc[lo]), int(g.value_e2.iloc[hi])
    ph, nh = int(g.hour_bucket.iloc[lo]), int(g.hour_bucket.iloc[hi])
    h = int(g.hour_bucket.iloc[i])
    assert int(g.value_e2.iloc[i]) == math.floor(
        pv + (nv - pv) * (h - ph) / (nh - ph)
    )


def test_gapfill_plan_single_window_node(spark):
    """All four prev/next carries must land in ONE Window node (one
    per-user sort), and the window must reuse the grid side's
    user_id partitioning rather than adding its own Exchange."""
    import __spark_entry__ as entry

    from spark_eventhubs_spark.plans.hubview import clear_cached_plans

    clear_cached_plans(spark, "query")
    df = entry.queries()["ts_gapfill_interpolate"](spark, SF_DIR)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    nodes = [l.split(")", 1)[1].strip() for l in plan.splitlines()
             if l.strip().startswith("(")]
    assert nodes.count("Window") == 1
    assert nodes.count("Exchange") <= 2
