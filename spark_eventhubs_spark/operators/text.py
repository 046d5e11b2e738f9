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
