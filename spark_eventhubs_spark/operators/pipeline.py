"""Composed training-data cleaning pipeline over ``documents``.

The north-star use case (SURVEY §2.3): one pass that chains the
individual LLM-pipeline operators into the standard corpus-prep
recipe —

  1. feature pass: token count, punctuation ratio, stopword density,
     content fingerprint (all JVM-side expressions from operators.text)
  2. quality + language gate: keep docs with enough tokens, low
     punctuation noise, and a nonzero English-stopword signal
  3. exact dedup: one survivor (min doc_id) per md5 fingerprint
  4. near-dup removal: drop the greater doc of every verified
     MinHash-LSH + Jaccard pair (operators.dedup.near_dup_pairs)
  5. corpus stats: per detected language, surviving docs / tokens /
     chars

Scale: steps 1-2 are narrow projections at parquet-scan speed; step 3
shuffles once on the 16-byte fingerprint; step 4 is the shuffle-
friendly LSH band join (no cross joins anywhere); step 5 aggregates a
handful of groups. At 100 TB each stage stays a bounded equi-shuffle —
this is the same topology Spark would pick for each stage run alone,
with the intermediate frames never materialized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_eventhubs_spark.operators import dedup as D
from spark_eventhubs_spark.operators import text as T

MIN_TOKENS = 10
MAX_PUNCT_BP = 2000
NEARDUP_BP = 7000


def clean_corpus(
    df: DataFrame,
    text_col: str = "text",
    min_tokens: int = MIN_TOKENS,
    max_punct_bp: int = MAX_PUNCT_BP,
    neardup_threshold_bp: int = NEARDUP_BP,
) -> DataFrame:
    """Per-language corpus stats after quality gate + exact and
    near dedup. Columns: lang_guess, n_docs, total_tokens,
    total_chars."""
    text = F.col(text_col)
    toks = T.tokens_col(text)
    n_tok = F.size(toks).cast("long")
    n_chars = F.length(text).cast("long")
    punct_chars = F.length(F.regexp_replace(text, r"[a-zA-Z0-9\s]", "")).cast("long")
    stop_hits = F.size(
        F.filter(toks, lambda x: F.lower(x).isin(*T.STOPWORDS))
    ).cast("long")
    density_bp = F.when(n_tok > 0, F.floor(F.lit(10000) * stop_hits / n_tok)).otherwise(F.lit(0))
    punct_bp = F.when(n_chars > 0, F.floor(F.lit(10000) * punct_chars / n_chars)).otherwise(F.lit(0))

    feats = df.select(
        F.col("doc_id"),
        n_tok.alias("n_tokens"),
        n_chars.alias("n_chars_m"),
        punct_bp.alias("punct_bp"),
        density_bp.alias("density_bp"),
        F.md5(T.normalize_text(text)).alias("fp"),
    )
    gated = feats.where(
        (F.col("n_tokens") >= min_tokens)
        & (F.col("punct_bp") < max_punct_bp)
        & (F.col("density_bp") > 0)
    )

    # exact dedup: min doc_id survives per fingerprint (deterministic).
    # The survivor test is doc_id == MIN(doc_id) over the fingerprint
    # key — a whole-partition/no-sort window over the ONE gated frame.
    # The old aggregate + left-semi-join form re-ran the tokenize +
    # quality-gate + md5 production on both join inputs (r13: AQE
    # stage reuse never deduplicates the differently-pruned subtree
    # copies); window state is one fingerprint's duplicate group,
    # bounded by the corpus's exact-dup cluster size.
    from pyspark.sql import Window

    w_fp = Window.partitionBy("fp")
    exact = gated.withColumn("min_doc", F.min("doc_id").over(w_fp)).where(
        F.col("doc_id") == F.col("min_doc")
    ).drop("min_doc")

    # near-dup removal: greedy drop of the greater doc of each verified
    # pair (pairs always have doc_a < doc_b, so min ids survive)
    dupes = (
        D.near_dup_pairs(df, text_col, threshold_bp=neardup_threshold_bp)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    # dupes is corpus-proportional (near-dup rates on crawl data run
    # 20-50%), so no broadcast hint: the anti join shuffles on the
    # uniform doc_id key (skew-free) and AQE still picks broadcast
    # when the drop set is genuinely small.
    cleaned = exact.join(dupes, "doc_id", "left_anti")

    return cleaned.select(
        F.when(F.col("density_bp") >= 500, F.lit("en"))
        .otherwise(F.lit("en-ish"))
        .alias("lang_guess"),
        "n_tokens",
        "n_chars_m",
    ).groupBy("lang_guess").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum("n_chars_m").alias("total_chars"),
    )


def oracle_clean_corpus(
    min_tokens: int = MIN_TOKENS,
    max_punct_bp: int = MAX_PUNCT_BP,
    neardup_threshold_bp: int = NEARDUP_BP,
) -> str:
    toks = "list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')"
    stop = "(" + ", ".join(f"'{w}'" for w in T.STOPWORDS) + ")"
    nd = D.oracle_near_dup_pairs(threshold_bp=neardup_threshold_bp)
    return f"""WITH feats AS (
  SELECT doc_id,
    CAST(len({toks}) AS BIGINT) AS n_tokens,
    CAST(length(text) AS BIGINT) AS n_chars_m,
    CASE WHEN length(text) > 0
      THEN FLOOR(10000.0 * length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) / length(text))
      ELSE 0 END AS punct_bp,
    CASE WHEN len({toks}) > 0
      THEN FLOOR(10000.0 * len(list_filter({toks}, x -> lower(x) IN {stop})) / len({toks}))
      ELSE 0 END AS density_bp,
    md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
  FROM documents
), gated AS (
  SELECT * FROM feats
  WHERE n_tokens >= {min_tokens} AND punct_bp < {max_punct_bp} AND density_bp > 0
), exact AS (
  SELECT g.* FROM gated g
  JOIN (SELECT fp, MIN(doc_id) AS doc_id FROM gated GROUP BY fp) s
    ON g.fp = s.fp AND g.doc_id = s.doc_id
), dupes AS (
  SELECT DISTINCT doc_b AS doc_id FROM ({nd})
), cleaned AS (
  SELECT * FROM exact WHERE doc_id NOT IN (SELECT doc_id FROM dupes)
)
SELECT CASE WHEN density_bp >= 500 THEN 'en' ELSE 'en-ish' END AS lang_guess,
  COUNT(*) AS n_docs,
  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
  CAST(SUM(n_chars_m) AS BIGINT) AS total_chars
FROM cleaned GROUP BY 1"""
