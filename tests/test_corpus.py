"""Semantic invariants of the corpus-management operators
(operators/corpus.py). Exact cross-engine values are pinned by the
DuckDB oracles in the catalog; these tests pin the *properties* the
operators promise: determinism, bounds, and behavior on crafted rows.
"""

import pytest
from pyspark.sql import functions as F

from spark_eventhubs_spark.operators import corpus as C

from conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_hash_split_deterministic_and_proportional(docs):
    a = C.hash_split(docs).collect()
    b = C.hash_split(docs).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    n = len(a)
    frac_train = sum(1 for r in a if r.split == "train") / n
    frac_val = sum(1 for r in a if r.split == "val") / n
    # 80/10/10 within generous tolerance at tiny sf
    assert 0.7 < frac_train < 0.9
    assert 0.03 < frac_val < 0.2
    # membership is a pure function of the id: restricting the input
    # never changes an id's split
    subset = C.hash_split(docs.where(F.col("doc_id") % 2 == 0)).collect()
    full = {r.doc_id: r.split for r in a}
    assert all(full[r.doc_id] == r.split for r in subset)


def test_stratified_sample_k_per_stratum(docs):
    out = C.stratified_sample(docs, k=5).collect()
    per = {}
    for r in out:
        per.setdefault(r.lang, []).append(r.rn)
    strata = docs.select("lang").distinct().count()
    assert len(per) == strata
    for lang, rns in per.items():
        assert len(rns) <= 5
        assert sorted(rns) == list(range(1, len(rns) + 1))


def test_pack_documents_budget_property(docs):
    budget = 128
    out = C.pack_documents(docs, budget=budget).collect()
    # within each group, packs are dense from 0 and a doc's pack is
    # preceding-cumsum // budget — recompute in Python and compare
    by_group = {}
    for r in out:
        by_group.setdefault(r.lang, []).append(r)
    for lang, rows in by_group.items():
        rows.sort(key=lambda r: r.doc_id)
        cum = 0
        for r in rows:
            assert r.pack_id == cum // budget, (lang, r)
            cum += r.n_tokens


def test_pii_scan_crafted(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at a.b+c@example.org or visit https://x.io/p?q=1 now"),
            (2, "card 1234567890123456 and plain text"),
            (3, "nothing here"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in C.pii_scan(df).collect()}
    assert rows[1].n_emails == 1 and rows[1].n_urls == 1
    assert rows[2].n_digit_runs == 1
    assert rows[3].n_emails == rows[3].n_urls == rows[3].n_digit_runs == 0
    # redaction shortens (or keeps) length, never grows for long matches
    assert rows[2].redacted_len < len("card 1234567890123456 and plain text")


def test_repetition_stats_crafted(spark):
    df = spark.createDataFrame(
        [
            (1, "same\nsame\nsame\nsame"),
            (2, "a\nb\nc\nd"),
            (3, "  \n\n  "),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in C.repetition_stats(df).collect()}
    assert rows[1].n_lines == 4 and rows[1].n_distinct_lines == 1
    assert rows[1].dup_line_bp == 7500
    assert rows[2].dup_line_bp == 0
    assert rows[3].n_lines == 0 and rows[3].dup_line_bp == 0


def test_decontaminate_flags_planted_overlap(spark):
    # doc 97 is "benchmark" (97 % 97 == 0); doc 5 copies its text and
    # must be flagged; doc 6 is unrelated
    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    df = spark.createDataFrame(
        [(97, text), (5, text + " extra tail tokens here"), (6, "totally different words with no shared runs at all")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.n_shared_fps for r in C.decontaminate(df).collect()}
    assert 5 in out and out[5] >= 1
    assert 6 not in out
    assert 97 not in out  # benchmark rows are never self-flagged


def test_quantize_roundtrip_error_bound(emb):
    q = C.quantize_embeddings(emb)
    joined = emb.join(q, "vec_id").select(
        F.arrays_zip(
            F.col("embedding").cast("array<double>"),
            F.transform(
                "codes",
                lambda c: c.cast("double") * F.col("scale_micros") / F.lit(127_000_000.0),
            ),
        ).alias("z")
    )
    max_err = joined.select(
        F.array_max(
            F.transform("z", lambda p: F.abs(p["0"] - p["1"]))
        ).alias("e")
    ).agg(F.max("e")).collect()[0][0]
    # half-step of the int8 grid, plus scale_micros truncation slack
    scale_bound = 0.5 / 127 + 2e-6
    assert max_err <= scale_bound * 1.01, max_err


def test_quantize_flat_matches_array_form(emb):
    flat = {r.vec_id: r.codes_str for r in C.quantize_embeddings_flat(emb).collect()}
    arr = {r.vec_id: ",".join(str(c) for c in r.codes) for r in C.quantize_embeddings(emb).collect()}
    assert flat == arr


def test_kernels_handle_empty_and_degenerate_docs(spark):
    """Arrow kernels must survive empty inputs, empty strings, and
    whitespace-only docs (the zero-token branches)."""
    from spark_eventhubs_spark.operators.dedup import (
        minhash_signatures,
        simhash,
    )
    from spark_eventhubs_spark.operators.text import winnowing_fingerprints

    df = spark.createDataFrame(
        [(1, ""), (2, "   \n\t  "), (3, "one"), (4, None)],
        "doc_id long, text string",
    )
    sig = {r["doc_id"]: r["mh_0"] for r in minhash_signatures(df).collect()}
    assert set(sig) == {1, 2, 3, 4}  # empty docs still get a signature
    assert sig[1] == sig[2] == sig[4]  # all tokenless -> hp=[0] -> same
    # simhash drops tokenless docs (empty multiset)
    sh = {r["doc_id"] for r in simhash(df).collect()}
    assert sh == {3}
    fps = {r["doc_id"] for r in winnowing_fingerprints(df).collect()}
    assert fps == {1, 2, 3, 4}
    # fully empty frame
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert minhash_signatures(empty).count() == 0
    assert simhash(empty).count() == 0
    assert winnowing_fingerprints(empty).count() == 0


def test_heavy_hitters_exact_vs_full_groupby(spark):
    """The Misra-Gries candidate pruning must be lossless: the two-pass
    result equals the brute-force full-vocabulary groupBy, and the
    candidate set stays within the k * n_partitions bound."""
    from pyspark.sql import functions as F

    from spark_eventhubs_spark.operators.text import (
        HH_PHI_BP,
        _mg_summary_fn,
        heavy_hitters,
        tokens_col,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = {(r["token"], r["cnt"]) for r in heavy_hitters(docs).collect()}

    toks = docs.select(F.explode(tokens_col(F.col("text"))).alias("token"))
    total = toks.count()
    thr = (total * HH_PHI_BP) // 10000
    want = {
        (r["token"], r["cnt"])
        for r in toks.groupBy("token").agg(F.count("*").alias("cnt"))
        .where(F.col("cnt") > thr).collect()
    }
    assert got == want and len(got) > 0

    # candidate set is bounded: k counters per partition max
    k = 50
    n_parts = toks.rdd.getNumPartitions()
    cands = toks.mapInPandas(_mg_summary_fn(k, "token"), "token string")
    assert cands.count() <= k * n_parts
    # even a tiny k=50 summary must keep every true heavy hitter whose
    # frequency clears the 1/(k+1) per-partition bar (here: all of them
    # at this scale's thresholds iff cnt > total/k — check the superset
    # property on those)
    cand_set = {r["token"] for r in cands.distinct().collect()}
    for tok, cnt in want:
        if cnt > total / (k + 1):
            assert tok in cand_set


def test_tfidf_top_terms_shape_and_ranks(spark):
    from spark_eventhubs_spark.operators.text import tfidf_top_terms

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = tfidf_top_terms(docs).collect()
    n_docs = docs.count()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc) == n_docs
    for rows in by_doc.values():
        ranks = sorted(r["rank"] for r in rows)
        assert ranks == list(range(1, len(ranks) + 1)) and len(ranks) <= 3
        # scores non-increasing with rank
        by_rank = sorted(rows, key=lambda r: r["rank"])
        scores = [r["score_e3"] for r in by_rank]
        assert scores == sorted(scores, reverse=True)


def test_bm25_topk_properties(spark):
    """Top-k docs must each contain >= 1 query term, scores strictly
    ordered by (score desc, doc_id asc), and a query of absent terms
    returns empty."""
    from pyspark.sql import functions as F

    from spark_eventhubs_spark.operators.text import BM25_QUERY, bm25_topk, tokens_col

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = bm25_topk(docs).collect()
    assert 0 < len(out) <= 10
    keys = [(-r["score_e3"], r["doc_id"]) for r in out]
    assert keys == sorted(keys)
    hit_ids = [r["doc_id"] for r in out]
    with_term = {
        r["doc_id"]
        for r in docs.select(
            "doc_id", F.explode(tokens_col(F.col("text"))).alias("t")
        ).where(F.col("t").isin(BM25_QUERY)).select("doc_id").distinct().collect()
    }
    assert set(hit_ids) <= with_term

    assert bm25_topk(docs, query_terms=["zzz_not_a_token"]).count() == 0


def test_temperature_mix_quota_math(spark, docs):
    """Quota sizes must follow the sqrt-temperature rule exactly, the
    selection must be the per-source hash-ranked head, and re-runs must
    return identical rows."""
    import math

    from spark_eventhubs_spark.operators.corpus import temperature_mix

    out = temperature_mix(docs, target=200).collect()
    counts = {
        r["source"]: r["c"]
        for r in docs.groupBy("source").agg(F.count("*").alias("c")).collect()
    }
    w = {s: math.floor(1e6 * math.sqrt(c)) for s, c in counts.items()}
    tw = sum(w.values())
    quota = {s: (200 * ws) // tw for s, ws in w.items()}

    per_src = {}
    for r in out:
        per_src.setdefault(r["source"], []).append(r["sel_rank"])
    for s, ranks in per_src.items():
        assert sorted(ranks) == list(range(1, quota[s] + 1))
    assert sum(len(v) for v in per_src.values()) == sum(quota.values()) <= 200

    again = temperature_mix(docs, target=200).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_bigram_lm_hand_computed(spark):
    """Pin the bigram LM semantics on a corpus small enough to score
    by hand: c(w1,w2)=corpus bigram counts, c(w1.)=continuation
    totals, per-occurrence floor(1000*ln(c1/c2)), per-doc floor-mean;
    docs with <2 tokens drop out."""
    import math

    from spark_eventhubs_spark.operators.text import bigram_lm_scores

    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c"), (3, "x")], "doc_id long, text string"
    )
    got = {r["doc_id"]: (r["n_bigrams"], r["nll_e3"])
           for r in bigram_lm_scores(df).collect()}
    # corpus: ab x3, ba x1, bc x1; c1(a)=3, c1(b)=2
    e_ab = math.floor(1000 * math.log(3 / 3))   # 0
    e_b = math.floor(1000 * math.log(2 / 1))    # 693
    assert got == {
        1: (3, (e_ab + e_b + e_ab) // 3),  # "a b a b": ab, ba, ab
        2: (2, (e_ab + e_b) // 2),         # "a b c": ab, bc
    }
    assert 3 not in got  # single-token doc has no bigrams


def test_duplicated_span_profile_hand_computed(spark):
    """Pin span-profile semantics: dup_bp counts the doc's distinct
    shingles that appear in >= 2 documents, as exact integer bp."""
    from spark_eventhubs_spark.operators.dedup import duplicated_span_profile

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),   # shingles: tqb, qbf, bfj
            (2, "the quick brown cat sleeps"),  # tqb, qbc, bcs
            (3, "totally different odd words here"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["n_shingles"], r["dup_bp"])
           for r in duplicated_span_profile(df).collect()}
    # only "the quick brown" is shared (docs 1 and 2): 1/3 of each
    assert got[1] == (3, 10000 // 3)
    assert got[2] == (3, 10000 // 3)
    assert got[3] == (3, 0)


def test_token_entropy_hand_computed(spark):
    """Pin entropy semantics: uniform tokens -> 0; distinct tokens ->
    floor(1e6*ln(n)); mixed case matches the quantized formula."""
    import math

    from spark_eventhubs_spark.operators.text import token_entropy

    df = spark.createDataFrame(
        [(1, "x x x x"), (2, "a b c d"), (3, "a a b")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["n_tokens"], r["entropy_e6"])
           for r in token_entropy(df).collect()}
    ln = lambda v: math.floor(1e6 * math.log(v))  # noqa: E731
    assert got[1] == (4, ln(4) - (4 * ln(4)) // 4)           # == 0
    assert got[1][1] == 0
    assert got[2] == (4, ln(4))                              # all distinct
    assert got[3] == (3, ln(3) - (2 * ln(2) + 1 * ln(1)) // 3)


def test_kl_divergence_hand_computed(spark):
    """Pin KL semantics on a 2-doc corpus: a doc matching the corpus
    distribution scores near 0; an outlier vocabulary scores higher."""
    import math

    from spark_eventhubs_spark.operators.text import kl_divergence_scores

    df = spark.createDataFrame(
        [(1, "a a b b"), (2, "z z z z")], "doc_id long, text string"
    )
    got = {r["doc_id"]: (r["n_tokens"], r["kl_e6"])
           for r in kl_divergence_scores(df).collect()}
    ln = lambda v: math.floor(1e6 * math.log(v))  # noqa: E731
    # corpus: a:2 b:2 z:4, N=8
    s1 = 2 * (ln(2) - ln(2)) + 2 * (ln(2) - ln(2))   # doc1: a,b
    s2 = 4 * (ln(4) - ln(4))                         # doc2: z
    assert got[1] == (4, s1 // 4 - ln(4) + ln(8))    # == ln2 ~ 693147
    assert got[2] == (4, s2 // 4 - ln(4) + ln(8))
    assert got[1][1] == got[2][1] == ln(8) - ln(4)


def test_gopher_filters_hand_computed(spark):
    """Pin the Gopher signal math on a tiny corpus, especially the
    sorted-run-fold top-word share (vs an explode/groupBy mental
    model) and the keep thresholds."""
    from spark_eventhubs_spark.operators.text import gopher_filters

    df = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "go go go go")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in gopher_filters(df).collect()}
    r1 = got[1]  # 6 words, 17 chars of words, 'the' twice
    assert r1["n_words"] == 6
    assert r1["mean_word_len_bp"] == 10000 * 17 // 6
    assert r1["dup_word_bp"] == 10000 * 1 // 6       # one duplicate occurrence
    assert r1["top_word_bp"] == 10000 * 2 // 6       # 'the' = 2/6
    assert r1["keep"] == 0                           # too short (< 25 words)
    r2 = got[2]  # 4x 'go'
    assert r2["n_words"] == 4 and r2["top_word_bp"] == 10000
    assert r2["dup_word_bp"] == 10000 * 3 // 4 and r2["keep"] == 0


def test_gopher_filters_narrow_plan_and_split(spark):
    """Zero shuffle (pure per-row expressions) and a non-vacuous
    keep/reject split on the real corpus."""
    from tests.conftest import SF_DIR
    from spark_eventhubs_spark.operators.text import gopher_filters

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = gopher_filters(docs)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    kept = out.agg({"keep": "sum"}).collect()[0][0]
    assert 0 < kept < docs.count()


def test_chunk_dedup_hand_computed(spark):
    """Passage dedup on a 3-doc corpus with w=2: a chunk shared by
    docs 1 and 2 survives only in doc 1 (the owner); doc 3 is
    untouched; clean_text preserves original chunk order."""
    from spark_eventhubs_spark.operators.dedup import chunk_dedup

    df = spark.createDataFrame(
        [
            (1, "a b c d"),          # chunks: "a b", "c d"
            (2, "a b x y"),          # "a b" duplicated -> dropped here
            (3, "p q r"),            # "p q", "r" (partial tail chunk)
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in chunk_dedup(df, w=2).collect()}
    assert got[1]["n_chunks"] == 2 and got[1]["n_dropped"] == 0
    assert got[1]["clean_text"] == "a b c d"
    assert got[2]["n_chunks"] == 2 and got[2]["n_dropped"] == 1
    assert got[2]["clean_text"] == "x y"
    assert got[3]["n_chunks"] == 2 and got[3]["n_dropped"] == 0
    assert got[3]["clean_text"] == "p q r"


def test_chunk_dedup_fully_duplicated_doc_empties(spark):
    from spark_eventhubs_spark.operators.dedup import chunk_dedup

    df = spark.createDataFrame(
        [(1, "a b"), (2, "a b")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in chunk_dedup(df, w=2).collect()}
    assert got[1]["clean_text"] == "a b"
    assert got[2]["clean_text"] == "" and got[2]["n_dropped"] == 1


def test_chunk_dedup_topology(spark):
    """Plan shape: exactly ONE explode (Generate) — ownership is a MIN
    window over the chunk key of the single exploded frame (r13: the
    old groupBy+join form re-ran the chunk production on both join
    inputs), then one doc_id reassembly shuffle — no extra production
    sneaks back in."""
    from tests.conftest import SF_DIR
    from spark_eventhubs_spark.operators.dedup import chunk_dedup

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = chunk_dedup(docs)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Generate") == 1  # chunk explode exactly once
    assert "Window" in plan  # ownership = min(doc_id) over chunk
    # conservation: every chunk row lands exactly once
    out = chunk_dedup(docs).agg({"n_chunks": "sum"}).collect()[0][0]
    import math
    exp = docs.selectExpr(
        "ceil(size(filter(split(text, '\\\\s+'), x -> x != '')) / 8.0) AS c"
    ).agg({"c": "sum"}).collect()[0][0]
    assert out == exp


def test_curation_decisions_compose(spark):
    """final_keep is exactly the conjunction of the three component
    signals, and the split is non-vacuous on the real corpus."""
    from tests.conftest import SF_DIR
    from spark_eventhubs_spark.queries import queries

    out = queries()["corpus_curation_decisions"](spark, SF_DIR).collect()
    assert len(out) > 0
    kept = 0
    for r in out:
        expect = int(
            r["gopher_keep"] == 1
            and r["sem_keep"] == 1
            and r["chunk_dup_bp"] <= 5000
        )
        assert r["final_keep"] == expect
        kept += r["final_keep"]
    assert 0 < kept < len(out)


def test_cms_one_sided_error_and_bound(spark):
    """CMS contract on real data: estimates never undercount, and the
    standard bound holds — overcount <= e/width * total_tokens with
    depth rows (loose check at the default 4x512 geometry)."""
    from tests.conftest import SF_DIR
    from spark_eventhubs_spark.operators.text import (
        CMS_WIDTH, cms_estimates, tokens_col,
    )
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    rows = cms_estimates(docs).collect()
    assert len(rows) == 10 and any(r["true_c"] > 0 for r in rows)
    total = docs.select(
        F.sum(F.size(tokens_col(F.col("text")))).alias("n")
    ).collect()[0]["n"]
    bound = 3 * total // CMS_WIDTH + 1  # ~e/width * N, slack for floor
    for r in rows:
        assert r["overcount"] >= 0
        assert r["est_c"] >= r["true_c"]
        assert r["overcount"] <= bound


def test_dsir_weights_partition_invariant_and_top20(spark, docs):
    """DSIR weights are exact integer sums of once-quantized bucket
    scores, so assignments are identical under any input partitioning;
    keep marks exactly floor(n/5) docs, the highest-weighted ones."""
    from spark_eventhubs_spark.operators.corpus import dsir_weights

    a = sorted(
        (r["doc_id"], r["n_grams"], r["logw_e6"], r["keep"])
        for r in dsir_weights(docs.repartition(7)).collect()
    )
    b = sorted(
        (r["doc_id"], r["n_grams"], r["logw_e6"], r["keep"])
        for r in dsir_weights(docs.repartition(3)).collect()
    )
    assert a == b and len(a) == docs.count()
    kept = [t for t in a if t[3] == 1]
    assert len(kept) == len(a) // 5
    # kept docs are exactly the top-m by (logw desc, doc_id asc)
    order = sorted(a, key=lambda t: (-t[2], t[0]))
    assert sorted(t[0] for t in order[: len(a) // 5]) == sorted(
        t[0] for t in kept
    )


def test_dsir_responds_to_distribution_shift(spark):
    """On a corpus with a REAL vocabulary split, DSIR must rank
    target-vocabulary docs above raw-typical ones (the testdata corpus
    is distributionally homogeneous, so this property needs a crafted
    input): docs written in the target dialect score higher than
    background docs under a target = dialect-A gate."""
    from pyspark.sql import functions as F

    from spark_eventhubs_spark.operators.corpus import dsir_weights

    rows = []
    for i in range(40):  # target dialect: vocabulary A
        rows.append((i, " ".join(f"alpha{j % 7} beta{(j + i) % 5}"
                                 for j in range(30)), 1))
    for i in range(40, 120):  # background: vocabulary B
        rows.append((i, " ".join(f"gamma{j % 9} delta{(j + i) % 4}"
                                 for j in range(30)), 0))
    for i in range(120, 140):  # held-out docs in dialect A, target=0
        rows.append((i, " ".join(f"alpha{j % 7} beta{(j + i) % 5}"
                                 for j in range(30)), 0))
    df = spark.createDataFrame(rows, "doc_id long, text string, is_a int")
    out = {
        r["doc_id"]: r["logw_e6"]
        for r in dsir_weights(df, target=F.col("is_a") == 1).collect()
    }
    held_out = [out[i] for i in range(120, 140)]
    background = [out[i] for i in range(40, 120)]
    # every held-out dialect-A doc outscores every background doc
    assert min(held_out) > max(background)


def test_dsir_quantile_keep_mode_matches_rank_up_to_cutoff_ties(spark):
    """The 100 TB keep path (keep_mode="quantile", one broadcast
    scalar cutoff, no global window) must keep a SUPERSET of the exact
    rank path's top-20%, with every extra doc sitting exactly AT the
    cutoff weight — the only divergence a threshold can have from a
    (weight DESC, doc_id) rank."""
    from spark_eventhubs_spark.operators import corpus as C
    from tests.conftest import SF_DIR

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    rank = {
        r["doc_id"]: (r["logw_e6"], r["keep"])
        for r in C.dsir_weights(docs).collect()
    }
    quant = {
        r["doc_id"]: (r["logw_e6"], r["keep"])
        for r in C.dsir_weights(docs, keep_mode="quantile").collect()
    }
    assert set(rank) == set(quant)
    # identical weights on both paths (scoring untouched)
    assert all(rank[d][0] == quant[d][0] for d in rank)
    rank_keep = {d for d, (_, k) in rank.items() if k}
    quant_keep = {d for d, (_, k) in quant.items() if k}
    assert rank_keep <= quant_keep
    # A threshold can only diverge from the exact rank at the boundary:
    # Spark's q(0.8) is the smallest value with >= 80% of elements at
    # or below it — one rank beyond the exact top-20% cutoff — so every
    # extra doc's weight must be one of the two distinct weights
    # bracketing the 20% boundary (the cutoff weight or the next one
    # down), never anything deeper.
    extras = quant_keep - rank_keep
    if extras:
        w_desc = sorted((v for v, _ in rank.values()), reverse=True)
        k = len(w_desc) // 5
        boundary = {w_desc[k - 1], w_desc[min(k, len(w_desc) - 1)]}
        assert all(quant[d][0] in boundary for d in extras), (
            extras, boundary,
        )
    # no GLOBAL window in the quantile plan: since the r13 rewrite the
    # bucket models are SUM windows partitioned by the md5-uniform
    # bucket key (scale-safe); what the quantile path must never have
    # is an unpartitioned window (the rank path's row_number over the
    # whole weight table). Assert every window spec opens with the
    # bucket partition column.
    import re

    plan = (
        C.dsir_weights(docs, keep_mode="quantile")
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    specs = re.findall(r"windowspecdefinition\(([^)]*)", plan)
    assert specs, plan  # the bucket-model windows must be present
    assert all(s.lstrip().startswith("b#") for s in specs), plan
    assert "row_number()" not in plan, plan


def test_exact_substring_spans_hand_computed(spark):
    """Maximal-span semantics on constructed docs (min_len=8):
    overlapping covered grams union into ONE span; a 10-token shared
    substring yields 3 covered 8-gram starts but one 10-token span;
    within-doc repetition counts as duplication; sub-min_len docs
    emit zero grams; clean docs emit zero spans."""
    from spark_eventhubs_spark.operators.dedup import exact_substring_spans

    common = " ".join(f"c{i}" for i in range(10))       # 10 shared tokens
    eight = " ".join(f"e{i}" for i in range(8))         # 8-token self-dup
    filler = " ".join(f"f{i}" for i in range(9))
    rows = [
        (0, f"u1 u2 {common} u3 u4"),                   # span at toks [2,12)
        (1, f"{common} v1 v2 v3"),                      # span at toks [0,10)
        (2, "z1 z2 z3 z4 z5 z6 z7"),                    # 7 toks: no grams
        (3, " ".join(f"m{i}" for i in range(9))),       # unique: no spans
        (4, f"{eight} {filler} {eight}"),               # self-dup twice
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in exact_substring_spans(df).collect()}
    assert got[0] == {"doc_id": 0, "n_tokens": 14, "n_grams": 7,
                      "n_dup_grams": 3, "n_spans": 1,
                      "longest_span_toks": 10,
                      "dup_token_bp": 10000 * 10 // 14}
    assert got[1]["n_spans"] == 1 and got[1]["longest_span_toks"] == 10
    assert got[1]["dup_token_bp"] == 10000 * 10 // 13
    assert got[2] == {"doc_id": 2, "n_tokens": 7, "n_grams": 0,
                      "n_dup_grams": 0, "n_spans": 0,
                      "longest_span_toks": 0, "dup_token_bp": 0}
    assert got[3]["n_spans"] == 0 and got[3]["n_grams"] == 2
    # doc 4: the 8-gram "e0..e7" occurs at starts 0 and 17 (disjoint,
    # gap > 0) -> two 8-token spans, 16/25 tokens covered
    assert got[4]["n_spans"] == 2 and got[4]["longest_span_toks"] == 8
    assert got[4]["n_dup_grams"] == 2
    assert got[4]["dup_token_bp"] == 10000 * 16 // 25


def test_substring_ingest_incremental_hand_computed(spark):
    """Incremental span semantics (min_len=8): coverage counts the
    stored gram frequencies PLUS the batch's own occurrences — a gram
    seen once in the store and once in the batch is covered; a gram
    twice in the batch alone is covered; a gram only once anywhere is
    not. Store generations are re-aggregated, batch_id passes through,
    and an empty store leaves only within-batch duplication."""
    from pyspark.sql import functions as F

    from spark_eventhubs_spark.operators.dedup import (
        exact_substring_spans_incremental,
        substring_grams,
    )

    common = " ".join(f"c{i}" for i in range(10))   # in store once
    eight = " ".join(f"e{i}" for i in range(8))     # batch self-dup
    rows = [
        (0, 1, f"a1 a2 {common} a3"),               # covered via store
        (1, 1, f"{eight} x1 x2 x3 x4 x5 x6 x7 x8 x9 {eight}"),
        (2, 2, " ".join(f"q{i}" for i in range(12))),  # unique: clean
    ]
    batch = spark.createDataFrame(
        rows, "doc_id long, batch_id long, text string"
    )
    store_src = spark.createDataFrame(
        [(100, common + " s1 s2")], "doc_id long, text string"
    )
    # two generations of the same store rows: must re-aggregate, not
    # double-count (each generation carries n_occ=1 per gram -> 2 ==
    # threshold only when combined with... no: 1+1=2 alone would
    # cover; so use DISTINCT halves instead)
    g = substring_grams(store_src).groupBy("h").agg(
        F.count("*").cast("long").alias("n_occ")
    )
    store = g.limit(0).unionByName(g)  # single generation + empty gen
    got = {
        r["doc_id"]: r.asDict()
        for r in exact_substring_spans_incremental(batch, store).collect()
    }
    # doc 0: the 10 'common' tokens at positions [2,12): 3 covered
    # gram starts (store count 1 + own 1 = 2), one merged span
    assert got[0]["n_spans"] == 1 and got[0]["longest_span_toks"] == 10
    assert got[0]["n_dup_grams"] == 3 and got[0]["batch_id"] == 1
    assert got[0]["dup_token_bp"] == 10000 * 10 // 13  # 13 tokens
    # doc 1: 'eight' twice within the batch doc itself -> two spans
    assert got[1]["n_spans"] == 2 and got[1]["longest_span_toks"] == 8
    # doc 2: nothing matches anywhere
    assert got[2]["n_spans"] == 0 and got[2]["n_dup_grams"] == 0
    assert got[2]["n_grams"] == 5

    # empty store: only the within-batch duplication survives
    empty = spark.createDataFrame([], "h bigint, n_occ bigint")
    got2 = {
        r["doc_id"]: r.asDict()
        for r in exact_substring_spans_incremental(batch, empty).collect()
    }
    assert got2[0]["n_spans"] == 0      # store match gone
    assert got2[1]["n_spans"] == 2      # self-dup unaffected
