"""Text-analysis operators over the ``documents`` table.

North-star LLM-pipeline operators (SURVEY §2.3): language-ID, quality
scoring, token counting, document fingerprinting. All are pure
DataFrame expressions (JVM-side, whole-stage codegen — no Python UDFs
in the hot path) and each has an exact DuckDB-SQL twin for the oracle.

Determinism conventions shared with the oracle:
- tokens = non-empty splits on ``\\s+``
- ratios are returned as integer basis points (``floor(10000 * x)``) so
  no float formatting can diverge between engines
- fingerprints are md5 hex strings of whitespace-normalized lowercased
  text (md5 is bit-identical in both engines)

Scale: every operator is a narrow projection — no shuffle, no UDF; at
100 TB these run at parquet-scan speed and column-prune to
(doc_id, text).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from spark_eventhubs_spark.functions.hashing import md5_hash64

# Small fixed English stopword list used by quality scoring + lang-ID.
# Kept tiny and hard-coded so the oracle SQL can inline it.
STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it", "for", "on"]

_PUNCT_RE = r"[^a-zA-Z0-9\s]"


def tokens_col(text: Column) -> Column:
    """Non-empty whitespace tokens (shared with oracle)."""
    return F.filter(F.split(text, r"\s+"), lambda x: x != F.lit(""))


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + a BPE-ish subword count: number of
    matches of ``[A-Za-z]{1,4}|[0-9]|[^A-Za-z0-9\\s]`` (a crude
    fixed-width stand-in for BPE merges, deterministic in SQL)."""
    toks = tokens_col(F.col(text_col))
    bpe = F.regexp_count(F.col(text_col), F.lit(r"[A-Za-z]{1,4}|[0-9]|[^A-Za-z0-9\s]"))
    return df.select(
        F.col("doc_id"),
        F.size(toks).cast("long").alias("n_tokens"),
        bpe.cast("long").alias("n_subwords"),
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword based quality features, all
    integers (basis points)."""
    text = F.col(text_col)
    toks = tokens_col(text)
    n_tok = F.size(toks).cast("long")
    n_chars = F.length(text).cast("long")
    punct_chars = F.length(F.regexp_replace(text, r"[a-zA-Z0-9\s]", "")).cast("long")
    stop_hits = F.size(
        F.filter(toks, lambda x: F.lower(x).isin(*STOPWORDS))
    ).cast("long")
    avg_tok_len_bp = F.when(n_tok > 0,
                            F.floor(F.lit(10000) * (n_chars - n_tok + 1) / n_tok)
                            ).otherwise(F.lit(0)).cast("long")
    return df.select(
        F.col("doc_id"),
        n_chars.alias("n_chars_m"),
        n_tok.alias("n_tokens"),
        F.when(n_chars > 0, F.floor(F.lit(10000) * punct_chars / n_chars))
        .otherwise(F.lit(0)).cast("long").alias("punct_bp"),
        F.when(n_tok > 0, F.floor(F.lit(10000) * stop_hits / n_tok))
        .otherwise(F.lit(0)).cast("long").alias("stopword_bp"),
        avg_tok_len_bp.alias("avg_token_len_bp"),
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Tiny deterministic language heuristic: English-stopword density.
    >= 500 bp -> 'en', >0 -> 'en-ish', else 'unknown'. (A real n-gram
    model plugs in behind the same signature; determinism is the point
    here so the oracle can replicate it.)"""
    toks = tokens_col(F.col(text_col))
    n_tok = F.size(toks).cast("long")
    stop_hits = F.size(F.filter(toks, lambda x: F.lower(x).isin(*STOPWORDS))).cast("long")
    density_bp = F.when(n_tok > 0, F.floor(F.lit(10000) * stop_hits / n_tok)).otherwise(F.lit(0))
    return df.select(
        F.col("doc_id"),
        F.when(density_bp >= 500, F.lit("en"))
        .when(density_bp > 0, F.lit("en-ish"))
        .otherwise(F.lit("unknown"))
        .alias("lang_guess"),
        density_bp.cast("long").alias("stop_density_bp"),
    )


def normalize_text(text: Column) -> Column:
    """lowercase + collapse whitespace runs to single spaces + trim."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint: md5 of normalized text (content hash for
    exact dedup and incremental recrawl detection)."""
    return df.select(
        F.col("doc_id"),
        F.md5(normalize_text(F.col(text_col))).alias("fingerprint"),
    )


# ---- DuckDB oracle twins ----

def _oracle_tokens(expr: str) -> str:
    return f"list_filter(regexp_split_to_array({expr}, '\\s+'), x -> x <> '')"


_ORACLE_STOP = "(" + ", ".join(f"'{w}'" for w in STOPWORDS) + ")"


def oracle_token_count() -> str:
    return f"""SELECT doc_id,
  CAST(len({_oracle_tokens('text')}) AS BIGINT) AS n_tokens,
  CAST(len(regexp_extract_all(text, '[A-Za-z]{{1,4}}|[0-9]|[^A-Za-z0-9\\s]')) AS BIGINT) AS n_subwords
FROM documents"""


def oracle_quality_score() -> str:
    toks = _oracle_tokens("text")
    return f"""WITH t AS (
  SELECT doc_id,
         CAST(length(text) AS BIGINT) AS n_chars_m,
         CAST(len({toks}) AS BIGINT) AS n_tokens,
         CAST(length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) AS BIGINT) AS punct_chars,
         CAST(len(list_filter({toks}, x -> lower(x) IN {_ORACLE_STOP})) AS BIGINT) AS stop_hits
  FROM documents
)
SELECT doc_id, n_chars_m, n_tokens,
  CAST(CASE WHEN n_chars_m > 0 THEN FLOOR(10000.0 * punct_chars / n_chars_m) ELSE 0 END AS BIGINT) AS punct_bp,
  CAST(CASE WHEN n_tokens > 0 THEN FLOOR(10000.0 * stop_hits / n_tokens) ELSE 0 END AS BIGINT) AS stopword_bp,
  CAST(CASE WHEN n_tokens > 0 THEN FLOOR(10000.0 * (n_chars_m - n_tokens + 1) / n_tokens) ELSE 0 END AS BIGINT) AS avg_token_len_bp
FROM t"""


def oracle_lang_id() -> str:
    toks = _oracle_tokens("text")
    return f"""WITH t AS (
  SELECT doc_id,
         CAST(len({toks}) AS BIGINT) AS n_tokens,
         CAST(len(list_filter({toks}, x -> lower(x) IN {_ORACLE_STOP})) AS BIGINT) AS stop_hits
  FROM documents
), d AS (
  SELECT doc_id,
         CASE WHEN n_tokens > 0 THEN FLOOR(10000.0 * stop_hits / n_tokens) ELSE 0 END AS density_bp
  FROM t
)
SELECT doc_id,
  CASE WHEN density_bp >= 500 THEN 'en'
       WHEN density_bp > 0 THEN 'en-ish'
       ELSE 'unknown' END AS lang_guess,
  CAST(density_bp AS BIGINT) AS stop_density_bp
FROM d"""


def oracle_fingerprint() -> str:
    return """SELECT doc_id,
  md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint
FROM documents"""


# ---- winnowing (rolling-hash) fingerprints ----

WINNOW_K = 3   # tokens per gram
WINNOW_W = 4   # grams per window


def winnowing_fingerprints(
    df: DataFrame, text_col: str = "text", k: int = WINNOW_K, w: int = WINNOW_W,
    fast: bool = False,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken):
    hash every ORDERED k-token gram, slide a w-gram window, keep each
    window's minimum hash, emit the distinct selected hashes. The
    guarantee: any shared run of >= k+w-1 tokens between two docs
    shares at least one fingerprint — the standard plagiarism /
    overlap detector.

    Default (oracle-parity) path: one Arrow-batched ``mapInPandas``
    kernel — md5 over the batch's unique tokens, polynomial k-gram
    combination (functions/hashing.shingle_poly_coeffs), vectorized
    sliding-window minima. Same interpreted-HOF elimination as the
    minhash kernel; values identical to the DuckDB twin.
    ``fast=True``: pure-JVM expression path (xxhash64 per gram
    string), no Python round-trip, not oracle-checkable.

    No shuffle before the output either way. Scale: cost is linear in
    token count; fingerprint density is ~2/(w+1).
    """
    from spark_eventhubs_spark.functions.hashing import MINHASH_PRIME, hash64

    if fast:
        toks = tokens_col(normalize_text(F.col(text_col)))
        n = F.size(toks)
        grams = F.transform(
            F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1))),
            lambda i: F.array_join(F.slice(toks, i, k), " "),
        )
        grams = F.when(n > 0, grams).otherwise(F.array(F.array_join(toks, " ")))
        hashed = df.select(
            F.col("doc_id"),
            F.transform(grams, lambda g: F.pmod(hash64(g, fast=True), F.lit(MINHASH_PRIME))).alias("gh"),
        )
        m = F.size(F.col("gh"))
        mins = F.transform(
            F.sequence(F.lit(1), F.greatest(m - (w - 1), F.lit(1))),
            lambda j: F.array_min(F.slice(F.col("gh"), j, w)),
        )
        return (
            hashed.select("doc_id", F.explode(F.array_distinct(mins)).alias("fp"))
        )

    def _kernel(batches):
        import numpy as np
        import pandas as pd

        from spark_eventhubs_spark.functions.hashing import poly_shingle_hashes_py

        for pdf in batches:
            out_ids, out_fps = [], []
            ids = list(pdf["doc_id"])
            ghs = poly_shingle_hashes_py(list(pdf[text_col]), k)
            for doc_id, gh in zip(ids, ghs):
                if len(gh) >= w:
                    mins = np.lib.stride_tricks.sliding_window_view(gh, w).min(axis=1)
                else:
                    mins = gh.min(keepdims=True)
                fps = np.unique(mins)
                out_ids.extend([doc_id] * len(fps))
                out_fps.extend(fps.tolist())
            yield pd.DataFrame({"doc_id": out_ids, "fp": out_fps}).astype(
                {"doc_id": "int64", "fp": "int64"}
            )

    return df.select("doc_id", text_col).mapInPandas(_kernel, "doc_id long, fp long")


def oracle_winnowing_fingerprints(k: int = WINNOW_K, w: int = WINNOW_W) -> str:
    from spark_eventhubs_spark.functions.hashing import (
        MINHASH_PRIME,
        oracle_md5_hash64,
        shingle_poly_coeffs,
    )

    coeffs = shingle_poly_coeffs(k)
    toks = ("list_filter(regexp_split_to_array("
            "trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '), x -> x <> '')")
    tok_hash = oracle_md5_hash64("x")
    poly = " + ".join(f"COALESCE(th[i+{j}],0) * {c}" for j, c in enumerate(coeffs))
    return f"""WITH t AS (
  SELECT doc_id, {toks} AS tk FROM documents
), th_t AS (
  SELECT doc_id,
    list_transform(tk, x -> ({tok_hash} % {MINHASH_PRIME})) AS th,
    len(tk) AS n
  FROM t
), hashed AS (
  SELECT doc_id,
    CASE WHEN n = 0 THEN [CAST(0 AS BIGINT)]
    ELSE list_transform(range(1, greatest(n - {k - 1}, 1) + 1),
                        i -> ({poly}) % {MINHASH_PRIME}) END AS gh
  FROM th_t
), wins AS (
  SELECT doc_id,
    list_distinct(list_transform(range(1, greatest(len(gh) - {w - 1}, 1) + 1),
                  j -> list_aggregate(gh[j:j+{w - 1}], 'min'))) AS fps
  FROM hashed
)
SELECT doc_id, unnest(fps) AS fp FROM wins"""


# ---- heavy hitters (Misra-Gries two-pass) ----

HH_PHI_BP = 20     # heavy = frequency > 0.2% of all corpus tokens
HH_MIN_K = 1024    # floor on summary size (>= 1/phi guarantees superset)


def _mg_summary_fn(k: int, token_col: str):
    """mapInPandas kernel: ONE Misra-Gries summary per input partition.
    Batches are merged into the running summary via value_counts; when
    the summary exceeds ``k`` entries it is compressed by subtracting
    the (k+1)-th largest weight and dropping non-positives (the
    mergeable-summaries formulation — Agarwal et al., "Mergeable
    Summaries"; undercount per item is bounded by N_p/(k+1)). The
    kernel holds at most ~2k counters regardless of partition size and
    emits only the surviving candidate tokens."""

    def fn(batches):
        import pandas as pd

        counters: dict = {}
        for pdf in batches:
            for tok, c in pdf[token_col].value_counts().items():
                counters[tok] = counters.get(tok, 0) + int(c)
            if len(counters) > k:
                sub = sorted(counters.values(), reverse=True)[k]
                counters = {t: c - sub for t, c in counters.items() if c > sub}
        yield pd.DataFrame({token_col: list(counters.keys())}, dtype=object)

    return fn


def heavy_hitters(
    df: DataFrame, phi_bp: int = HH_PHI_BP, text_col: str = "text"
) -> DataFrame:
    """EXACT corpus heavy hitters — every token whose frequency exceeds
    ``phi_bp`` basis points of the total token count — via the
    standard two-pass sketch pattern that makes this tractable at
    100 TB:

    pass 1: per-partition Misra-Gries summaries (bounded memory, zero
    shuffle) whose union is a guaranteed SUPERSET of the true heavy
    hitters (pigeonhole: a token above phi globally is above phi in
    some partition, and the summary size k >= 1/phi keeps it);
    pass 2: exact counts of the candidates only — the groupBy shuffles
    just the semi-joined token stream against a BROADCAST candidate
    set of <= k * n_partitions entries, never the full vocabulary.

    The result is exact (not approximate), so the DuckDB twin is the
    plain HAVING query. At toy scale (total tokens < k) the summary is
    the exact vocabulary and the guarantee is trivial."""
    toks = df.select(F.explode(tokens_col(F.col(text_col))).alias("token"))
    total = toks.count()
    thr = (total * phi_bp) // 10000
    # summary size: >= ceil(total/thr) keeps the superset guarantee
    # exact even when floor() makes thr/total slightly under phi
    k = max(HH_MIN_K, total if thr < 1 else -(-total // thr))
    cands = toks.mapInPandas(_mg_summary_fn(k, "token"), "token string").distinct()
    return (
        toks.join(F.broadcast(cands), "token", "semi")
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .where(F.col("cnt") > F.lit(thr))
    )


def oracle_heavy_hitters(phi_bp: int = HH_PHI_BP) -> str:
    toks = _oracle_tokens("text")
    return f"""WITH tk AS (
  SELECT unnest({toks}) AS token FROM documents
), tot AS (
  SELECT COUNT(*) AS n FROM tk
)
SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
FROM tk GROUP BY 1
HAVING COUNT(*) > (SELECT CAST(n * {phi_bp} // 10000 AS BIGINT) FROM tot)"""


# ---- TF-IDF / BM25 (deterministic integer scoring) ----
#
# Both scorers quantize the one irrational quantity (ln of a
# df-ratio) to an e3 integer ONCE per term, then do all remaining
# arithmetic in exact int64 (integer div truncation is identical in
# Spark and DuckDB for positives), so ranking ties and hashes can
# never drift between engines. BM25 constants k1=1.2, b=0.75 are
# folded into the integer formula as /10 rationals.

BM25_QUERY = ["spark", "join", "window"]  # fixed demo query (catalog determinism)


def tfidf_top_terms(df: DataFrame, top_n: int = 3, text_col: str = "text") -> DataFrame:
    """Per-document top-N terms by TF-IDF (score_e3 =
    tf * floor(1000 * ln(D/df))).

    Scale: one shuffle builds per-doc term counts (postings); term
    document-frequencies come from a COUNT window over the term key of
    that SAME frame — not a separate aggregate joined back, which
    would re-run the tokenize + explode production once per consumer
    (r13: AQE stage reuse does not fire across the differently-pruned
    subtree copies, so the "shared" Exchange executed twice; guide
    §2.4 — two operations keyed the same way share one exchange). The
    window frame is whole-partition/no-sort, state = one term's
    postings group (spill-backed); a hot term's group is the same row
    set the join build side held. D is a 1-row broadcast aggregate
    instead of an eager driver count, so the entry is one lazy plan.
    The per-doc top-N is a window over the doc key, carrying only
    (doc, term, score)."""
    from pyspark.sql import Window

    d_total = df.agg(F.count("*").cast("double").alias("d_total"))
    tf = (
        df.select("doc_id", F.explode(tokens_col(F.col(text_col))).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    w_term = Window.partitionBy("term")
    idf_e3 = F.floor(
        F.lit(1000.0) * F.log(F.col("d_total") / F.count(F.lit(1)).over(w_term))
    ).cast("long")
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score_e3").desc(), F.col("term").asc()
    )
    return (
        tf.join(F.broadcast(d_total))
        .select(
            "doc_id", "term",
            (F.col("tf") * idf_e3).cast("long").alias("score_e3"),
        )
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= top_n)
    )


def bigram_lm_scores(
    df: DataFrame, text_col: str = "text", carry_cols: tuple = ()
) -> DataFrame:
    """Per-document bigram language-model score — the CCNet-style LM
    quality gate: documents whose token transitions are improbable
    under the corpus's own bigram MLE get high negative-log-likelihood
    and can be filtered or bucketed.

    nll_e3(doc) = floor-mean over the doc's bigram occurrences of
    floor(1000 * ln(c(w1·)/c(w1,w2))), where c(w1,w2) is the corpus
    bigram count and c(w1·) the continuation total (sum of bigram
    counts with first word w1, so P(w2|w1) normalizes exactly). MLE
    needs no smoothing here: every doc bigram occurs in the corpus at
    least once by construction. Each occurrence's -ln P is quantized
    to e3 BEFORE averaging and the mean is an integer division, so
    Spark and DuckDB agree bit-for-bit (same convention as TF-IDF).

    Scale: bigram construction is a JVM zip_with over token-array
    slices (no shuffle); c(w1,w2) and c(w1·) are COUNT windows over
    the bigram / first-word keys of the ONE occurrence frame —
    c(w1·) = number of occurrences whose first word is w1, which
    equals the old sum-of-c2-over-distinct-bigrams by definition.
    Pre-r13 the two counts were separate aggregates joined back, and
    the whole tokenize + zip_with + explode production ran once per
    consumer (three times: AQE stage reuse does not fire across the
    differently-pruned subtree copies). Now: one production, two
    whole-partition/no-sort count windows (spill-backed state = one
    key's occurrence group — the same rows the join build side held),
    one per-doc aggregate, zero joins. Docs with <2 tokens drop out
    (explode of an empty array), matching the oracle's len >= 2
    filter.

    ``carry_cols`` (r13): doc-level columns to ride through the
    production and the per-doc aggregate (as extra group keys —
    functionally dependent on doc_id, so the grouping is unchanged).
    Lets a consumer that needs e.g. ``lang`` alongside the score skip
    a whole documents re-scan + join-back (guide §2.4)."""
    from pyspark.sql import Window

    toks = tokens_col(F.col(text_col))
    # slice length must be non-negative: a 0- or 1-token doc yields an
    # empty bigram array (and drops at the explode), never a negative-
    # length slice error
    n_pairs = F.greatest(F.size(toks) - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice(toks, 1, n_pairs),
        F.slice(toks, 2, n_pairs),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    bg = df.select(
        "doc_id", *carry_cols, F.explode(bigrams).alias("bigram")
    ).withColumn("w1", F.split(F.col("bigram"), " ")[0])
    w_bg = Window.partitionBy("bigram")
    w_w1 = Window.partitionBy("w1")
    occ_e3 = F.floor(
        F.lit(1000.0)
        * F.log(
            F.count(F.lit(1)).over(w_w1).cast("double")
            / F.count(F.lit(1)).over(w_bg)
        )
    ).cast("long")
    return (
        bg.select("doc_id", *carry_cols, occ_e3.alias("occ_e3"))
        .groupBy("doc_id", *carry_cols)
        .agg(F.count("*").alias("n_bigrams"), F.sum("occ_e3").alias("sum_e3"))
        .select(
            "doc_id",
            *carry_cols,
            "n_bigrams",
            F.expr("sum_e3 DIV n_bigrams").alias("nll_e3"),
        )
    )


def oracle_bigram_lm_scores() -> str:
    toks = _oracle_tokens("text")
    return f"""WITH t AS (
  SELECT doc_id, {toks} AS toks FROM documents
), bg AS (
  SELECT doc_id,
    unnest(list_transform(range(1, len(toks)),
                          i -> toks[i] || ' ' || toks[i + 1])) AS bigram
  FROM t WHERE len(toks) >= 2
), bgc AS (
  SELECT bigram, COUNT(*) AS c2 FROM bg GROUP BY 1
), w1c AS (
  SELECT split_part(bigram, ' ', 1) AS w1, SUM(c2) AS c1 FROM bgc GROUP BY 1
), scored AS (
  SELECT bg.doc_id,
    CAST(FLOOR(1000.0 * ln(CAST(w1c.c1 AS DOUBLE) / bgc.c2)) AS BIGINT) AS occ_e3
  FROM bg
  JOIN bgc USING (bigram)
  JOIN w1c ON split_part(bg.bigram, ' ', 1) = w1c.w1
)
SELECT doc_id, COUNT(*) AS n_bigrams,
  CAST(SUM(occ_e3) // COUNT(*) AS BIGINT) AS nll_e3
FROM scored GROUP BY 1"""


def token_entropy(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document token (vocabulary) entropy — the Shannon-entropy
    quality signal: repetitive or templated text scores low, diverse
    natural text scores near ln(n). Complements repetition_stats with
    a single scalar a cleaning pipeline can threshold on.

    H = ln(n) - (1/n) * sum_t c_t ln c_t over the doc's token counts.
    Each ln(c_t) is e6-quantized BEFORE the (exact integer) weighted
    sum and the 1/n is an integer division, so Spark and DuckDB agree
    bit-for-bit (the repo's standard ln-quantization convention).

    Scale: one explode + (doc_id, token) count — postings-shaped, the
    same one shuffle as TF-IDF's tf stage — then a per-doc aggregate
    of that frame. No joins, no UDFs."""
    tf = (
        df.select("doc_id", F.explode(tokens_col(F.col(text_col))).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("c"))
    )
    ln_c_e6 = F.floor(F.lit(1e6) * F.log(F.col("c").cast("double"))).cast("long")
    return (
        tf.groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.sum(F.col("c") * ln_c_e6).alias("s_e6"),
        )
        .select(
            "doc_id",
            "n_tokens",
            (
                F.floor(F.lit(1e6) * F.log(F.col("n_tokens").cast("double"))).cast("long")
                - F.expr("s_e6 DIV n_tokens")
            ).alias("entropy_e6"),
        )
    )


def oracle_token_entropy() -> str:
    toks = _oracle_tokens("text")
    return f"""WITH tf AS (
  SELECT doc_id, unnest({toks}) AS token FROM documents
), tfc AS (
  SELECT doc_id, token, COUNT(*) AS c FROM tf GROUP BY 1, 2
), agg AS (
  SELECT doc_id, SUM(c) AS n_tokens,
    SUM(c * CAST(FLOOR(1000000 * ln(CAST(c AS DOUBLE))) AS BIGINT)) AS s_e6
  FROM tfc GROUP BY 1
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
  CAST(CAST(FLOOR(1000000 * ln(CAST(n_tokens AS DOUBLE))) AS BIGINT)
       - (s_e6 // n_tokens) AS BIGINT) AS entropy_e6
FROM agg"""


def kl_divergence_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document KL divergence from the corpus token distribution —
    the domain-outlier quality signal: documents whose vocabulary
    usage diverges from the corpus (spam, boilerplate, wrong-language
    leakage) score high and can be reviewed or downweighted.

    KL(doc || corpus) = (1/n) * sum_t c_t (ln c_t - ln C_t)
                        - ln n + ln N
    with every ln e6-quantized BEFORE the exact integer weighted sum
    and 1/n as integer division (the repo's ln-quantization
    convention), so Spark and DuckDB agree bit-for-bit.

    Scale: one postings shuffle builds per-doc tf; the corpus token
    count C_t is a SUM window over the token key of that same frame
    (whole-partition/no-sort, state = one token's compacted postings
    group, spill-backed) instead of a separate vocabulary aggregate
    joined back — the join form re-ran the tokenize + explode
    production once per consumer (r13: AQE stage reuse does not fire
    across the differently-pruned subtree copies). N (the corpus
    total) comes from a narrow scan-only size() aggregate — exact
    integer, no explode, no shuffle — broadcast as a 1-row scalar."""
    from pyspark.sql import Window

    lnq = lambda col: F.floor(F.lit(1e6) * F.log(col.cast("double"))).cast("long")  # noqa: E731
    tf = (
        df.select("doc_id", F.explode(tokens_col(F.col(text_col))).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("c"))
    )
    w_t = Window.partitionBy("token")
    per_doc = (
        tf.withColumn("corpus_c", F.sum("c").over(w_t))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.sum(F.col("c") * (lnq(F.col("c")) - lnq(F.col("corpus_c")))).alias("s_e6"),
        )
    )
    total = (
        df.select(F.size(tokens_col(F.col(text_col))).cast("long").alias("nt"))
        .agg(lnq(F.sum("nt")).alias("ln_total_e6"))
    )
    return per_doc.join(F.broadcast(total)).select(
        "doc_id",
        "n_tokens",
        (
            F.expr("s_e6 DIV n_tokens")
            - lnq(F.col("n_tokens"))
            + F.col("ln_total_e6")
        ).alias("kl_e6"),
    )


def entropy_kl_signals(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document token entropy AND KL divergence from ONE pass over
    the (doc_id, token) count frame — the fusion corpus_quality_report
    uses. Both signals are per-doc aggregates of the same compacted
    postings rows (entropy needs c; KL needs c and the corpus count
    C_t, a SUM window over the token key), so computing them in one
    groupBy halves the heavy tokenize + explode + count production vs
    joining :func:`token_entropy` and :func:`kl_divergence_scores`
    (whose identical subplans did NOT get deduplicated at runtime —
    r13 measured 12 distinct shuffle stages / 12 parquet scans for the
    joined form). Quantization order is bit-identical to the
    standalone operators: same lnq-before-sum, same integer DIV."""
    from pyspark.sql import Window

    lnq = lambda col: F.floor(F.lit(1e6) * F.log(col.cast("double"))).cast("long")  # noqa: E731
    tf = (
        df.select("doc_id", F.explode(tokens_col(F.col(text_col))).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("c"))
    )
    w_t = Window.partitionBy("token")
    fused = (
        tf.withColumn("corpus_c", F.sum("c").over(w_t))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.sum(F.col("c") * lnq(F.col("c"))).alias("se_e6"),
            F.sum(F.col("c") * (lnq(F.col("c")) - lnq(F.col("corpus_c")))).alias("sk_e6"),
        )
    )
    total = (
        df.select(F.size(tokens_col(F.col(text_col))).cast("long").alias("nt"))
        .agg(lnq(F.sum("nt")).alias("ln_total_e6"))
    )
    return fused.join(F.broadcast(total)).select(
        "doc_id",
        "n_tokens",
        (lnq(F.col("n_tokens")) - F.expr("se_e6 DIV n_tokens")).alias("entropy_e6"),
        (
            F.expr("sk_e6 DIV n_tokens")
            - lnq(F.col("n_tokens"))
            + F.col("ln_total_e6")
        ).alias("kl_e6"),
    )


def oracle_kl_divergence_scores() -> str:
    toks = _oracle_tokens("text")
    return f"""WITH tf AS (
  SELECT doc_id, unnest({toks}) AS token FROM documents
), tfc AS (
  SELECT doc_id, token, COUNT(*) AS c FROM tf GROUP BY 1, 2
), ctf AS (
  SELECT token, SUM(c) AS corpus_c FROM tfc GROUP BY 1
), total AS (
  SELECT CAST(FLOOR(1000000 * ln(CAST(SUM(corpus_c) AS DOUBLE))) AS BIGINT)
    AS ln_total_e6 FROM ctf
), per_doc AS (
  SELECT t.doc_id, SUM(t.c) AS n_tokens,
    SUM(t.c * (CAST(FLOOR(1000000 * ln(CAST(t.c AS DOUBLE))) AS BIGINT)
             - CAST(FLOOR(1000000 * ln(CAST(ct.corpus_c AS DOUBLE))) AS BIGINT)))
      AS s_e6
  FROM tfc t JOIN ctf ct USING (token)
  GROUP BY 1
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
  CAST((s_e6 // n_tokens)
       - CAST(FLOOR(1000000 * ln(CAST(n_tokens AS DOUBLE))) AS BIGINT)
       + (SELECT ln_total_e6 FROM total) AS BIGINT) AS kl_e6
FROM per_doc"""


def oracle_tfidf_top_terms(top_n: int = 3) -> str:
    toks = _oracle_tokens("text")
    return f"""WITH tf AS (
  SELECT doc_id, unnest({toks}) AS term FROM documents
), tfc AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM tf GROUP BY 1, 2
), dfc AS (
  SELECT term, COUNT(*) AS df,
    CAST(FLOOR(1000.0 * ln((SELECT COUNT(*) FROM documents) / df)) AS BIGINT) AS idf_e3
  FROM tfc GROUP BY term
), scored AS (
  SELECT t.doc_id, t.term, CAST(t.tf * d.idf_e3 AS BIGINT) AS score_e3,
    CAST(ROW_NUMBER() OVER (PARTITION BY t.doc_id
         ORDER BY t.tf * d.idf_e3 DESC, t.term ASC) AS BIGINT) AS rank
  FROM tfc t JOIN dfc d USING (term)
)
SELECT doc_id, term, score_e3, rank FROM scored WHERE rank <= {top_n}"""


def bm25_topk(
    df: DataFrame, query_terms: list | None = None, k: int = 10,
    text_col: str = "text",
) -> DataFrame:
    """BM25 retrieval: top-k documents for a fixed bag-of-words query.

    score(d) = sum_t idf(t) * tf * (k1+1) / (tf + k1*(1 - b + b*dl/avgdl)),
    k1=1.2, b=0.75, idf = ln((D - df + .5)/(df + .5) + 1) quantized to
    e3, avgdl kept as the exact integer avgdl_e3 = 1000*T // D; each
    term contribution is then ONE int64 division
    (idf_e3*tf*22*avgdl_e3) // (10*avgdl_e3*tf + 3*avgdl_e3 + 9000*dl)
    and the doc score an integer sum — bit-identical across engines.

    Scale: the token ARRAY is filtered to the query terms inside the
    scan stage, before explode — non-query tokens are never generated,
    let alone shuffled — so the groupBy carries only the query's
    postings lists; corpus stats (D, T, per-term df) come from ONE
    scalar aggregation row (per-term document frequency is a |q|-wide
    set of conditional sums — pre-r13 the df map was a SECOND eager
    corpus tokenize via the tf frame, so every bm25 call paid three
    full tokenize passes instead of two); top-k is TakeOrdered. The
    full corpus is never shuffled — the inverted-index access pattern
    as a filtered scan."""
    import math

    q = sorted(set(query_terms if query_terms is not None else BM25_QUERY))
    all_toks = tokens_col(F.col(text_col))
    stats = (
        df.select(
            F.size(all_toks).cast("long").alias("dl"),
            F.filter(all_toks, lambda t: t.isin(q)).alias("qtoks"),
        )
        .select(
            "dl",
            *[
                F.array_contains("qtoks", t).cast("long").alias(f"has_{i}")
                for i, t in enumerate(q)
            ],
        )
        .agg(
            F.count("*").alias("d"),
            F.sum("dl").alias("t"),
            *[F.sum(f"has_{i}").alias(f"df_{i}") for i in range(len(q))],
        )
        .collect()[0]
    )
    d_total, t_total = int(stats["d"]), int(stats["t"])
    avgdl_e3 = (1000 * t_total) // d_total

    # dl is projected BELOW the explode (two selects): with
    # `select(size(...), explode(...))` in one projection the size()
    # lands in a Project ABOVE the Generate and re-tokenizes the text
    # once per POSTING row instead of once per document (the
    # dsir_weights lesson, operators/corpus.py).
    toks = df.select(
        "doc_id",
        F.size(all_toks).cast("long").alias("dl"),
        F.filter(all_toks, lambda t: t.isin(q)).alias("qtoks"),
    ).select("doc_id", "dl", F.explode("qtoks").alias("term"))
    tf = toks.groupBy("doc_id", "dl", "term").agg(F.count("*").alias("tf"))

    dfreq = {
        t: int(stats[f"df_{i}"]) for i, t in enumerate(q) if int(stats[f"df_{i}"])
    }
    if not dfreq:  # no query term occurs anywhere
        return tf.select(
            F.col("doc_id"), F.lit(0).cast("long").alias("score_e3")
        ).limit(0)
    idf_e3 = {
        t: math.floor(1000.0 * math.log((d_total - n + 0.5) / (n + 0.5) + 1.0))
        for t, n in dfreq.items()
    }
    idf_col = F.create_map(
        *[F.lit(x) for t in sorted(idf_e3) for x in (t, idf_e3[t])]
    )[F.col("term")].cast("long")
    contrib = F.expr(
        f"(idf_e3 * tf * 22 * {avgdl_e3}) div "
        f"(10 * {avgdl_e3} * tf + 3 * {avgdl_e3} + 9000 * dl)"
    )
    return (
        tf.withColumn("idf_e3", idf_col)
        .select("doc_id", contrib.cast("long").alias("c"))
        .groupBy("doc_id")
        .agg(F.sum("c").cast("long").alias("score_e3"))
        .orderBy(F.col("score_e3").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def oracle_bm25_topk(query_terms: list | None = None, k: int = 10) -> str:
    q = sorted(set(query_terms if query_terms is not None else BM25_QUERY))
    q_sql = ", ".join(f"'{t}'" for t in q)
    toks = _oracle_tokens("text")
    return f"""WITH stats AS (
  SELECT COUNT(*) AS d_total,
         SUM(len({toks})) AS t_total,
         CAST(1000 * SUM(len({toks})) // COUNT(*) AS BIGINT) AS avgdl_e3
  FROM documents
), tk AS (
  SELECT doc_id, CAST(len({toks}) AS BIGINT) AS dl, unnest({toks}) AS term
  FROM documents
), tf AS (
  SELECT doc_id, dl, term, COUNT(*) AS tf FROM tk
  WHERE term IN ({q_sql}) GROUP BY 1, 2, 3
), dfc AS (
  SELECT term, COUNT(*) AS df FROM tf GROUP BY 1
), idf AS (
  SELECT term,
    CAST(FLOOR(1000.0 * ln(((SELECT d_total FROM stats) - df + 0.5) / (df + 0.5) + 1.0)) AS BIGINT) AS idf_e3
  FROM dfc
), contrib AS (
  SELECT t.doc_id,
    (i.idf_e3 * t.tf * 22 * s.avgdl_e3)
      // (10 * s.avgdl_e3 * t.tf + 3 * s.avgdl_e3 + 9000 * t.dl) AS c
  FROM tf t JOIN idf i USING (term), stats s
)
SELECT doc_id, CAST(SUM(c) AS BIGINT) AS score_e3
FROM contrib GROUP BY 1
ORDER BY score_e3 DESC, doc_id ASC
LIMIT {k}"""


# ---------------------------------------------------------------------
# Gopher-style document quality filters
# ---------------------------------------------------------------------

# MassiveText/Gopher repetition + quality rules (Rae et al. 2021,
# "Scaling Language Models: ... Gopher", table A1), with thresholds
# adapted to the synthetic corpus' observed ranges (10-99 words, mean
# word length ~4.5, heavy small-vocab repetition) so each rule
# genuinely rejects documents instead of being vacuous.
GOPHER_MIN_WORDS = 25
GOPHER_MAX_WORDS = 80
GOPHER_MIN_MWL_BP = 42_000  # mean word length >= 4.2 chars
GOPHER_MAX_MWL_BP = 48_000  # mean word length <= 4.8 chars
GOPHER_MAX_DUP_BP = 6_000   # <= 60% duplicate word occurrences
GOPHER_MAX_TOP_BP = 1_200   # top word <= 12% of the document


def gopher_keep_from_metrics(
    n_words: Column, mwl_bp: Column, dup_bp: Column, top_bp: Column
) -> Column:
    """The Gopher gate's threshold predicate over ALREADY-COMPUTED
    metric columns — the single place the four rules live.
    :func:`gopher_filters` feeds it its reported metric columns (so
    the tokenize + array-fold tree is evaluated once per row, not
    twice) and :func:`gopher_keep_col` feeds it freshly-derived
    metrics for consumers that only have the text column."""
    return (
        n_words.between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS)
        & mwl_bp.between(GOPHER_MIN_MWL_BP, GOPHER_MAX_MWL_BP)
        & (dup_bp <= GOPHER_MAX_DUP_BP)
        & (top_bp <= GOPHER_MAX_TOP_BP)
    )


def _gopher_metric_cols(text: Column):
    """The four Gopher metric columns (n_words, mean-word-length bp,
    duplicate-word bp, top-word bp) derived from one tokenization —
    THE single definition of the metric math, consumed by both
    :func:`gopher_keep_col` and :func:`gopher_filters` (pre-refactor
    the ~35-line expression tree was duplicated verbatim in both, and
    any drift would silently break the invariant that dsir_weights'
    target flag matches gopher_filters' keep column). All per-row
    array folds, zero shuffle."""
    toks = tokens_col(text)
    n_words = F.size(toks).cast("long")
    sum_len = F.aggregate(
        F.transform(toks, lambda x: F.length(x).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    n_distinct = F.size(F.array_distinct(toks)).cast("long")
    zero = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
    )

    def _merge(acc, w):
        run = (
            F.when(w == acc["prev"], acc["run"] + F.lit(1).cast("long"))
            .otherwise(F.lit(1).cast("long"))
        )
        return F.struct(
            w.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    max_count = F.aggregate(
        F.sort_array(toks), zero, _merge, lambda acc: acc["best"]
    )
    mwl_bp = F.floor(F.lit(10000) * sum_len / n_words).cast("long")
    dup_bp = F.floor(F.lit(10000) * (n_words - n_distinct) / n_words).cast("long")
    top_bp = F.floor(F.lit(10000) * max_count / n_words).cast("long")
    return n_words, mwl_bp, dup_bp, top_bp


def gopher_keep_col(text: Column) -> Column:
    """The Gopher gate's keep decision as ONE narrow boolean column —
    for consumers that only need the flag as a predicate (e.g.
    corpus.dsir_weights' quality target). Thresholds live in
    :func:`gopher_keep_from_metrics`; metrics in
    :func:`_gopher_metric_cols` (shared with :func:`gopher_filters`).
    Zero shuffle: per-row array folds."""
    return gopher_keep_from_metrics(*_gopher_metric_cols(text))


def gopher_filters(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher/MassiveText-style per-document quality signals + keep
    flag, entirely in JVM expressions (narrow, zero shuffle):

    - n_words, mean word length, duplicate-word fraction;
    - top_word_bp: the most frequent word's share. Computed WITHOUT
      exploding: sort the token array and fold it once, tracking the
      longest run of equal adjacent tokens — a per-row O(n log n)
      higher-order aggregate instead of an explode + groupBy + window
      (which would shuffle corpus_tokens rows at scale).

    All ratios are integer basis points with a pinned op order
    (floor(10000 * a / b)) so both engines floor the same double.
    The keep decision applies :func:`gopher_keep_from_metrics` to the
    metric columns computed HERE (a second projection over the named
    columns), so the tokenize + sort_array + fold tree is evaluated
    once per row — not re-derived inside the keep flag. Metric math
    lives once in :func:`_gopher_metric_cols` (shared with
    :func:`gopher_keep_col`)."""
    n_words, mwl_bp, dup_bp, top_bp = _gopher_metric_cols(F.col(text_col))
    return df.select(
        F.col("doc_id"),
        n_words.alias("n_words"),
        mwl_bp.alias("mean_word_len_bp"),
        dup_bp.alias("dup_word_bp"),
        top_bp.alias("top_word_bp"),
    ).withColumn(
        "keep",
        gopher_keep_from_metrics(
            F.col("n_words"),
            F.col("mean_word_len_bp"),
            F.col("dup_word_bp"),
            F.col("top_word_bp"),
        ).cast("int"),
    )


def oracle_gopher_filters() -> str:
    toks = _oracle_tokens("text")
    return f"""WITH base AS (
  SELECT doc_id, {toks} AS toks FROM documents
), t AS (SELECT doc_id, unnest(toks) AS w FROM base),
mc AS (
  SELECT doc_id, MAX(c) AS mc
  FROM (SELECT doc_id, w, COUNT(*) AS c FROM t GROUP BY 1, 2) GROUP BY 1
), f AS (
  SELECT b.doc_id,
    CAST(len(b.toks) AS BIGINT) AS n_words,
    CAST(FLOOR(10000 * list_sum(list_transform(b.toks, x -> length(x))) / len(b.toks)) AS BIGINT) AS mean_word_len_bp,
    CAST(FLOOR(10000 * (len(b.toks) - len(list_distinct(b.toks))) / len(b.toks)) AS BIGINT) AS dup_word_bp,
    CAST(FLOOR(10000 * mc.mc / len(b.toks)) AS BIGINT) AS top_word_bp
  FROM base b JOIN mc USING (doc_id)
)
SELECT doc_id, n_words, mean_word_len_bp, dup_word_bp, top_word_bp,
  CAST(CASE WHEN n_words BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS}
    AND mean_word_len_bp BETWEEN {GOPHER_MIN_MWL_BP} AND {GOPHER_MAX_MWL_BP}
    AND dup_word_bp <= {GOPHER_MAX_DUP_BP}
    AND top_word_bp <= {GOPHER_MAX_TOP_BP}
    THEN 1 ELSE 0 END AS INTEGER) AS keep
FROM f"""


# ---------------------------------------------------------------------
# Count-min sketch (deterministic hashes -> EXACT cross-engine oracle)
# ---------------------------------------------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 512
# probe set: stable common vocabulary terms (see TESTDATA corpus)
CMS_PROBE = ["table", "row", "scan", "spark", "hash", "merge", "sort",
             "window", "value", "batch"]


def cms_estimates(
    df: DataFrame,
    probe: list | None = None,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    text_col: str = "text",
) -> DataFrame:
    """Count-min sketch over the corpus token stream, evaluated on a
    bounded probe vocabulary: per probe token, the exact count, the
    CMS estimate (min over ``depth`` md5-derived rows of ``width``
    cells), and the overcount. The hash family is the shared md5
    primitive, so the "approximate" sketch is exactly reproducible in
    SQL — the approximation is WHICH tokens collide, not randomness.

    Scale: ONE pass over the token stream builds per-token counts
    (vocabulary-sized, map-side combined); the sketch is then a
    depth-way posexplode of THAT compacted frame summed into
    depth x width cells. The probe's true counts RIDE the same
    (j, cell) aggregation as a ``collect_list(when(isin))`` side
    channel: an IN-filter on the compacted frame would push below the
    token aggregate into the scan (breaking exchange reuse) and
    re-produce the whole corpus tokenization for a 10-row answer —
    inside an aggregate expression it cannot. One corpus scan total.
    Sketch totals are sums of per-token counts — identical integers
    to counting occurrences directly (the CMS cell content is
    unchanged)."""
    probe = probe if probe is not None else list(CMS_PROBE)
    tc = (
        df.select(F.explode(tokens_col(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    cells = tc.select(
        "token",
        "n",
        F.posexplode(
            F.array(*[
                F.pmod(md5_hash64(F.col("token"), seed=j + 1), F.lit(width))
                for j in range(depth)
            ])
        ).alias("j", "cell"),
    )
    sketch = cells.groupBy("j", "cell").agg(
        F.sum("n").alias("c"),
        F.collect_list(
            F.when(F.col("token").isin(probe), F.struct("token", "n"))
        ).alias("ptoks"),
    )

    probe_df = df.sparkSession.createDataFrame(
        [(t,) for t in probe], "token string"
    )
    probe_cells = probe_df.select(
        F.col("token").alias("ptoken"),
        F.posexplode(
            F.array(*[
                F.pmod(md5_hash64(F.col("token"), seed=j + 1), F.lit(width))
                for j in range(depth)
            ])
        ).alias("j", "cell"),
    ).select("ptoken", F.col("j").cast("long").alias("j"), "cell")
    # Occupied probe cells only (inner join), exactly like the pre-r13
    # probe_cells->sketch join: an unoccupied cell contributes no row,
    # and a fully-absent probe token coalesces to 0 below. F.get (not
    # element_at) so an absent token's empty filter result is NULL
    # under ANSI instead of an index error.
    own = F.get(
        F.filter(F.col("ptoks"), lambda s: s["token"] == F.col("ptoken")), 0
    )
    per = (
        sketch.join(F.broadcast(probe_cells), ["j", "cell"])
        .groupBy(F.col("ptoken").alias("token"))
        .agg(
            F.min("c").alias("est_c"),
            F.max(own["n"]).alias("true_c"),
        )
    )
    return (
        probe_df.join(F.broadcast(per), "token", "left")
        .select(
            "token",
            F.coalesce(F.col("true_c"), F.lit(0)).alias("true_c"),
            F.coalesce(F.col("est_c"), F.lit(0)).alias("est_c"),
            (F.coalesce(F.col("est_c"), F.lit(0))
             - F.coalesce(F.col("true_c"), F.lit(0))).alias("overcount"),
        )
    )


def oracle_cms_estimates(
    probe: list | None = None,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> str:
    from spark_eventhubs_spark.functions.hashing import oracle_md5_hash64

    probe = probe if probe is not None else list(CMS_PROBE)
    probe_sql = ", ".join(f"('{t}')" for t in probe)

    def cell(expr, j):
        return f"({oracle_md5_hash64(expr, seed=j + 1)} % {width})"

    probe_cell_rows = " UNION ALL ".join(
        f"SELECT token, CAST({j} AS BIGINT) AS j, {cell('token', j)} AS cell FROM probe"
        for j in range(depth)
    )
    tok_cell_rows = " UNION ALL ".join(
        f"SELECT CAST({j} AS BIGINT) AS j, {cell('token', j)} AS cell FROM toks"
        for j in range(depth)
    )
    return f"""WITH toks AS (
  SELECT unnest(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS token
  FROM documents
), probe(token) AS (VALUES {probe_sql}
), cells AS ({tok_cell_rows}
), sketch AS (
  SELECT j, cell, COUNT(*) AS c FROM cells GROUP BY 1, 2
), pc AS ({probe_cell_rows}
), est AS (
  SELECT pc.token, MIN(s.c) AS est_c
  FROM pc JOIN sketch s ON s.j = pc.j AND s.cell = pc.cell
  GROUP BY 1
), tc AS (
  SELECT token, COUNT(*) AS true_c FROM toks
  WHERE token IN (SELECT token FROM probe) GROUP BY 1
)
SELECT p.token,
  CAST(COALESCE(tc.true_c, 0) AS BIGINT) AS true_c,
  CAST(COALESCE(est.est_c, 0) AS BIGINT) AS est_c,
  CAST(COALESCE(est.est_c, 0) - COALESCE(tc.true_c, 0) AS BIGINT) AS overcount
FROM probe p
LEFT JOIN tc ON tc.token = p.token
LEFT JOIN est ON est.token = p.token"""


def zipf_slope(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-language Zipf-law fit: OLS slope of ln(frequency) on
    ln(rank) over the token frequency spectrum. Natural text sits
    near slope -1; machine-generated or templated corpora drift off
    it, so the slope is a cheap corpus-health / synthetic-text gate
    (used alongside the Gopher and perplexity filters).

    Determinism: ln(rank) and ln(count) are quantized per row to e3
    BEFORE the sums (x_e3 = floor(1000*ln(rank)) fits well inside a
    long: |x_e3| <= ~5e4, products <= ~2.5e9/row), so every moment
    (n, Sx, Sy, Sxy, Sxx) is exact integer arithmetic; the final
    slope is one double expression over those exact integers, which
    IEEE-rounds identically in Spark and DuckDB. Rank ties break on
    the token string, so the spectrum is reproducible.

    Scale: explode -> (lang, token) count is the postings shuffle;
    the rank window sorts only the per-language VOCABULARY (types,
    not occurrences — orders of magnitude smaller than the corpus);
    the moment aggregation is a 5-column partial agg down to |langs|
    rows. No all-pairs, no driver loop.
    """
    from pyspark.sql import Window

    toks = tokens_col(F.col(text_col))
    counts = (
        df.select("lang", F.explode(toks).alias("token"))
        .groupBy("lang", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("lang").orderBy(F.desc("cnt"), F.asc("token"))
    xy = counts.select(
        "lang",
        F.floor(F.lit(1000.0) * F.log(F.row_number().over(w).cast("double")))
        .cast("long").alias("x_e3"),
        F.floor(F.lit(1000.0) * F.log(F.col("cnt").cast("double")))
        .cast("long").alias("y_e3"),
    )
    m = xy.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_types"),
        F.sum("x_e3").alias("sx"),
        F.sum("y_e3").alias("sy"),
        F.sum(F.col("x_e3") * F.col("y_e3")).alias("sxy"),
        F.sum(F.col("x_e3") * F.col("x_e3")).alias("sxx"),
    )
    num = m.n_types.cast("double") * m.sxy.cast("double") - (
        m.sx.cast("double") * m.sy.cast("double")
    )
    den = m.n_types.cast("double") * m.sxx.cast("double") - (
        m.sx.cast("double") * m.sx.cast("double")
    )
    return (
        m.where(F.col("n_types") >= 2)
        .select(
            "lang",
            "n_types",
            F.floor(F.lit(1000.0) * num / den).cast("long").alias("slope_e3"),
        )
    )


def oracle_zipf_slope() -> str:
    toks = _oracle_tokens("text")
    return f"""WITH tok AS (
  SELECT lang, unnest({toks}) AS token FROM documents
), counts AS (
  SELECT lang, token, COUNT(*) AS cnt FROM tok GROUP BY 1, 2
), xy AS (
  SELECT lang,
    CAST(FLOOR(1000.0 * ln(CAST(ROW_NUMBER() OVER (
      PARTITION BY lang ORDER BY cnt DESC, token ASC) AS DOUBLE))) AS BIGINT) AS x_e3,
    CAST(FLOOR(1000.0 * ln(CAST(cnt AS DOUBLE))) AS BIGINT) AS y_e3
  FROM counts
), m AS (
  SELECT lang, COUNT(*) AS n_types,
    CAST(SUM(x_e3) AS BIGINT) AS sx, CAST(SUM(y_e3) AS BIGINT) AS sy,
    CAST(SUM(x_e3 * y_e3) AS BIGINT) AS sxy,
    CAST(SUM(x_e3 * x_e3) AS BIGINT) AS sxx
  FROM xy GROUP BY 1
)
SELECT lang, n_types,
  CAST(FLOOR(1000.0 * (CAST(n_types AS DOUBLE) * CAST(sxy AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
            / (CAST(n_types AS DOUBLE) * CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))) AS BIGINT) AS slope_e3
FROM m WHERE n_types >= 2"""


def doc_perplexity_buckets(df: DataFrame, text_col: str = "text") -> DataFrame:
    """CCNet-style perplexity bucketing: score each document's
    perplexity under the corpus-trained bigram MLE (bigram_lm_scores)
    and split every language into head / middle / tail terciles by
    ascending perplexity — the exact shape CCNet uses to keep the
    "head" of each language for LM training data.

    ppl_e3 = floor(1000 * exp(nll_e3 / 1000)) is one double op over
    an integer, identical in both engines; terciles use NTILE(3)
    over (lang, ORDER BY nll_e3, doc_id) — a standard-SQL function
    with identical bucket-balancing semantics in Spark and DuckDB
    and a fully deterministic order (doc_id tiebreak).

    Scale: the LM scoring is the postings-shaped plan documented on
    bigram_lm_scores; the tercile window sorts per LANGUAGE (bounded
    key count — the largest language's docs sort within its
    partitions). For a skew-critical deployment the same split falls
    out of per-language approx quantiles + a broadcast join, at the
    cost of the oracle-exact tercile boundary.
    """
    from pyspark.sql import Window

    # lang rides the LM production as a carried group key (r13) — the
    # pre-r13 shape re-scanned documents and joined it back on doc_id
    lm = bigram_lm_scores(df, text_col, carry_cols=("lang",))
    w = Window.partitionBy("lang").orderBy(F.asc("nll_e3"), F.asc("doc_id"))
    scored = (
        lm.select(
            "doc_id",
            "lang",
            F.floor(
                F.lit(1000.0) * F.exp(F.col("nll_e3").cast("double") / F.lit(1000.0))
            ).cast("long").alias("ppl_e3"),
            F.ntile(3).over(w).alias("tercile"),
        )
    )
    bucket = (
        F.when(F.col("tercile") == 1, "head")
        .when(F.col("tercile") == 2, "middle")
        .otherwise("tail")
    )
    return scored.select("doc_id", "lang", "ppl_e3", bucket.alias("bucket"))


def oracle_doc_perplexity_buckets() -> str:
    lm = oracle_bigram_lm_scores()
    return f"""WITH lm AS ({lm}
), scored AS (
  SELECT lm.doc_id, d.lang,
    CAST(FLOOR(1000.0 * EXP(CAST(lm.nll_e3 AS DOUBLE) / 1000.0)) AS BIGINT) AS ppl_e3,
    NTILE(3) OVER (PARTITION BY d.lang ORDER BY lm.nll_e3 ASC, lm.doc_id ASC) AS tercile
  FROM lm JOIN documents d ON lm.doc_id = d.doc_id
)
SELECT doc_id, lang, ppl_e3,
  CASE WHEN tercile = 1 THEN 'head' WHEN tercile = 2 THEN 'middle'
       ELSE 'tail' END AS bucket
FROM scored"""
