"""Corpus-management operators for large-scale training-data pipelines.

The ops a 100 TB pretraining pipeline runs between crawling and
training, beyond dedup/similarity (operators/dedup.py, similarity.py)
and per-doc text features (operators/text.py):

- deterministic train/val/test **hash split** (re-runnable, no RNG
  state: membership is a pure function of the id)
- **stratified sampling** (k docs per stratum, deterministic hash
  order — reservoir sampling without the reservoir)
- context-window **document packing** (assign docs to fixed
  token-budget bins)
- **PII scanning** (email / URL / long-digit-run counts + redacted
  text length)
- **repetition stats** (duplicate-line ratio, the classic boilerplate
  / template-page signal)
- benchmark **decontamination** (drop training docs sharing a
  winnowing fingerprint with an eval set)
- **int8 embedding quantization** (symmetric per-vector scale,
  4x memory on the ANN serving path)

All are pure DataFrame expressions or composed operators — no Python
UDFs — and each has an exact DuckDB twin so results hash-match across
engines: hashes via functions/hashing.md5_hash64, ratios in integer
basis points, float math pinned to an explicit double-op order.

Scale notes per operator are inline; none introduces a shuffle beyond
its stated keys, and the only join (decontamination) broadcasts the
eval-set fingerprints, which are small by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from spark_eventhubs_spark.functions.hashing import md5_hash64, oracle_md5_hash64
from spark_eventhubs_spark.operators.text import (
    oracle_winnowing_fingerprints,
    tokens_col,
    winnowing_fingerprints,
)

# ---------------------------------------------------------------------
# deterministic hash split
# ---------------------------------------------------------------------

SPLIT_BUCKETS = 10_000


def hash_split(
    df: DataFrame,
    key_col: str = "doc_id",
    train_bp: int = 8_000,
    val_bp: int = 1_000,
) -> DataFrame:
    """Assign every row to train/val/test by hashing its id into
    ``SPLIT_BUCKETS`` basis-point buckets: [0, train_bp) -> train,
    [train_bp, train_bp+val_bp) -> val, rest -> test.

    Membership is a pure function of the key — re-running on new data
    never reshuffles old rows between splits (the property RNG-based
    splitters lack). Scale: narrow projection, no shuffle, no RNG."""
    bucket = F.pmod(
        md5_hash64(F.concat(F.lit("split|"), F.col(key_col).cast("string"))),
        F.lit(SPLIT_BUCKETS),
    )
    return df.select(
        F.col(key_col),
        bucket.cast("long").alias("bucket_bp"),
        F.when(bucket < train_bp, F.lit("train"))
        .when(bucket < train_bp + val_bp, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )


def oracle_hash_split(train_bp: int = 8_000, val_bp: int = 1_000) -> str:
    h = oracle_md5_hash64("('split|' || CAST(doc_id AS VARCHAR))")
    return f"""WITH b AS (
  SELECT doc_id, {h} % {SPLIT_BUCKETS} AS bucket_bp FROM documents
)
SELECT doc_id, CAST(bucket_bp AS BIGINT) AS bucket_bp,
  CASE WHEN bucket_bp < {train_bp} THEN 'train'
       WHEN bucket_bp < {train_bp + val_bp} THEN 'val'
       ELSE 'test' END AS split
FROM b"""


# ---------------------------------------------------------------------
# stratified sampling
# ---------------------------------------------------------------------


def stratified_sample(
    df: DataFrame, stratum_col: str = "lang", k: int = 20
) -> DataFrame:
    """Deterministic k-per-stratum sample: rank rows inside each
    stratum by a hash of their id and keep the first k — an exact,
    re-runnable stand-in for per-group reservoir sampling.

    Scale: one shuffle on the stratum key; the rank window scans each
    stratum once. If one stratum dominates, per-partition partial top-k
    (as in similarity.knn_join) bounds the sort."""
    order = md5_hash64(F.concat(F.lit("sample|"), F.col("doc_id").cast("string")))
    w = Window.partitionBy(stratum_col).orderBy(F.col("h").asc(), F.col("doc_id").asc())
    return (
        df.select(F.col("doc_id"), F.col(stratum_col), order.alias("h"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("doc_id", stratum_col, F.col("rn").cast("long").alias("rn"))
    )


def oracle_stratified_sample(stratum_col: str = "lang", k: int = 20) -> str:
    h = oracle_md5_hash64("('sample|' || CAST(doc_id AS VARCHAR))")
    return f"""WITH r AS (
  SELECT doc_id, {stratum_col},
         ROW_NUMBER() OVER (PARTITION BY {stratum_col}
                            ORDER BY {h}, doc_id) AS rn
  FROM documents
)
SELECT doc_id, {stratum_col}, CAST(rn AS BIGINT) AS rn FROM r WHERE rn <= {k}"""


# ---------------------------------------------------------------------
# context-window packing
# ---------------------------------------------------------------------


def pack_documents(
    df: DataFrame, budget: int = 512, group_col: str = "lang"
) -> DataFrame:
    """Assign documents to fixed token-budget context windows: within
    each group (deterministic doc_id order), pack p gets the docs whose
    *preceding* cumulative token count lands in [p*budget, (p+1)*budget)
    — the streaming "fill until full, then open the next bin" packer
    expressed as one window cumsum (a doc longer than the budget simply
    spans its packs alone).

    Scale: one shuffle on the group key + a sequential per-group scan;
    token counting is a narrow projection. This is how packing runs in
    practice — per-shard, order-deterministic — not global optimal
    bin-packing (NP-hard and pointless at corpus scale). Exactness:
    cumulative counts stay far below 2^53, so floor(cum/budget) in
    double is exact and matches the oracle's integer division."""
    n_tok = F.size(tokens_col(F.col("text"))).cast("long")
    base = df.select(F.col("doc_id"), F.col(group_col), n_tok.alias("n_tokens"))
    w = (
        Window.partitionBy(group_col)
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return base.select(
        "doc_id",
        group_col,
        "n_tokens",
        F.floor(cum_before / F.lit(budget)).cast("long").alias("pack_id"),
    )


def oracle_pack_documents(budget: int = 512, group_col: str = "lang") -> str:
    toks = "list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')"
    return f"""WITH t AS (
  SELECT doc_id, {group_col}, CAST(len({toks}) AS BIGINT) AS n_tokens
  FROM documents
)
SELECT doc_id, {group_col}, n_tokens,
  CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY {group_col} ORDER BY doc_id
       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // {budget}
       AS BIGINT) AS pack_id
FROM t"""


# ---------------------------------------------------------------------
# PII scanning
# ---------------------------------------------------------------------

# Patterns restricted to syntax RE2 (DuckDB) and Java regex (Spark)
# interpret identically: no backrefs, no lookaround, explicit classes.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_URL = r"https?://[^\s]+"
PII_DIGITS = r"[0-9]{9,}"


def pii_scan(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document PII signal: counts of email / URL / long-digit-run
    matches plus the length of the text after redacting all three — the
    pre-training scrub pass. Scale: narrow projection, scan-speed."""
    text = F.col(text_col)
    pat_all = f"({PII_EMAIL})|({PII_URL})|({PII_DIGITS})"
    return df.select(
        F.col("doc_id"),
        F.regexp_count(text, F.lit(PII_EMAIL)).cast("long").alias("n_emails"),
        F.regexp_count(text, F.lit(PII_URL)).cast("long").alias("n_urls"),
        F.regexp_count(text, F.lit(PII_DIGITS)).cast("long").alias("n_digit_runs"),
        F.length(F.regexp_replace(text, pat_all, "<PII>")).cast("long").alias(
            "redacted_len"
        ),
    )


def oracle_pii_scan() -> str:
    email, url, digits = PII_EMAIL, PII_URL, PII_DIGITS
    pat_all = f"({email})|({url})|({digits})"
    return f"""SELECT doc_id,
  CAST(len(regexp_extract_all(text, '{email}')) AS BIGINT) AS n_emails,
  CAST(len(regexp_extract_all(text, '{url}')) AS BIGINT) AS n_urls,
  CAST(len(regexp_extract_all(text, '{digits}')) AS BIGINT) AS n_digit_runs,
  CAST(length(regexp_replace(text, '{pat_all}', '<PII>', 'g')) AS BIGINT) AS redacted_len
FROM documents"""


# ---------------------------------------------------------------------
# repetition / boilerplate stats
# ---------------------------------------------------------------------


def repetition_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Duplicate-line ratio per document (basis points): the standard
    boilerplate/template-page quality signal. Lines are '\\n' splits
    with surrounding whitespace trimmed; blank lines are ignored.
    Scale: narrow per-row array math, scan-speed."""
    lines = F.filter(
        F.transform(F.split(F.col(text_col), r"\n"), lambda s: F.trim(s)),
        lambda s: s != F.lit(""),
    )
    n = F.size(lines).cast("long")
    n_uniq = F.size(F.array_distinct(lines)).cast("long")
    return df.select(
        F.col("doc_id"),
        n.alias("n_lines"),
        n_uniq.alias("n_distinct_lines"),
        F.when(n > 0, F.floor(F.lit(10000) * (n - n_uniq) / n))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("dup_line_bp"),
    )


def oracle_repetition_stats() -> str:
    lines = "list_filter(list_transform(string_split(text, chr(10)), s -> trim(s)), s -> s <> '')"
    return f"""WITH t AS (
  SELECT doc_id,
         CAST(len({lines}) AS BIGINT) AS n_lines,
         CAST(len(list_distinct({lines})) AS BIGINT) AS n_distinct_lines
  FROM documents
)
SELECT doc_id, n_lines, n_distinct_lines,
  CAST(CASE WHEN n_lines > 0
       THEN FLOOR(10000.0 * (n_lines - n_distinct_lines) / n_lines)
       ELSE 0 END AS BIGINT) AS dup_line_bp
FROM t"""


# ---------------------------------------------------------------------
# benchmark decontamination
# ---------------------------------------------------------------------

DECONTAM_BENCH_MOD = 97  # doc_id % 97 == 0 plays the held-out eval set


def decontaminate(docs: DataFrame, bench_mod: int = DECONTAM_BENCH_MOD) -> DataFrame:
    """Test-set decontamination: flag every training document that
    shares a winnowing fingerprint (>= k+w-1 token overlap) with the
    benchmark set. The benchmark here is the deterministic slice
    ``doc_id % bench_mod == 0``; in production it is the eval corpus.

    Returns (doc_id, n_shared_fps) for contaminated training docs.

    Scale: fingerprints are narrow per-row math; the benchmark
    fingerprint set is tiny relative to the corpus (it is an eval set)
    and is broadcast — the corpus is never shuffled, only scanned.
    Winnowing is per-document, so each side fingerprints only ITS
    doc slice (the doc_id filter sits below the kernel): the corpus is
    fingerprinted exactly once across the two sides, where filtering a
    shared full-corpus frame would run the kernel once for the
    broadcast build and again for the probe scan."""
    is_bench = F.col("doc_id") % bench_mod == 0
    bench_fps = (
        winnowing_fingerprints(docs.where(is_bench)).select("fp").distinct()
    )
    return (
        winnowing_fingerprints(docs.where(~is_bench))
        .join(F.broadcast(bench_fps), "fp")
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_shared_fps"))
    )


def oracle_decontaminate(bench_mod: int = DECONTAM_BENCH_MOD) -> str:
    winnow = oracle_winnowing_fingerprints()
    return f"""WITH fps AS ({winnow}),
bench AS (SELECT DISTINCT fp FROM fps WHERE doc_id % {bench_mod} = 0)
SELECT f.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared_fps
FROM fps f JOIN bench b USING (fp)
WHERE f.doc_id % {bench_mod} <> 0
GROUP BY f.doc_id"""


# ---------------------------------------------------------------------
# int8 embedding quantization
# ---------------------------------------------------------------------


def quantize_embeddings(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Symmetric per-vector int8 quantization: scale = max(|v_i|),
    code_i = floor(v_i * 127 / scale + 0.5). 4x smaller vectors for
    the ANN serving path; scale is emitted in integer micros so the
    row is exactly comparable across engines.

    Exactness: elements are float32 read as exact doubles; the op
    order (v*127.0, /scale, +0.5, floor) is pinned and IEEE-identical
    in both engines. Scale: narrow per-row array math, no shuffle.
    The scale is STAGED as its own projected column before the code
    lambda references it: inlined, the array_max(transform(...))
    subtree sits inside the per-element lambda body and is
    re-evaluated for every element — O(dim^2) work per row.
    CollapseProject keeps the stage (a non-cheap alias referenced
    three times is not re-inlined), so scale is computed once per
    row."""
    v = F.col(vec_col)
    scale_expr = F.array_max(F.transform(v, lambda x: F.abs(x.cast("double"))))
    staged = df.select(
        F.col("vec_id"), v.alias("_qvec"), scale_expr.alias("_qscale")
    )
    sv = F.col("_qvec")
    scale = F.col("_qscale")
    codes = F.when(
        scale > 0,
        F.transform(
            sv,
            lambda x: F.floor(x.cast("double") * F.lit(127.0) / scale + F.lit(0.5))
            .cast("int"),
        ),
    ).otherwise(F.transform(sv, lambda x: F.lit(0)))
    return staged.select(
        F.col("vec_id"),
        F.floor(scale * F.lit(1_000_000.0)).cast("long").alias("scale_micros"),
        codes.alias("codes"),
    )


def quantize_embeddings_flat(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Catalog/oracle projection of :func:`quantize_embeddings` with the
    code array serialized to a comma-joined string — array-valued
    result columns have no pinned cross-engine hash representation, a
    plain string does."""
    q = quantize_embeddings(df, vec_col)
    return q.select(
        "vec_id",
        "scale_micros",
        F.array_join(F.col("codes"), ",").alias("codes_str"),
    )


def oracle_quantize_embeddings() -> str:
    return """WITH s AS (
  SELECT vec_id, embedding,
         list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS scale
  FROM embeddings
)
SELECT vec_id,
  CAST(FLOOR(scale * 1000000.0) AS BIGINT) AS scale_micros,
  array_to_string(CASE WHEN scale > 0
       THEN list_transform(embedding,
            x -> CAST(FLOOR(CAST(x AS DOUBLE) * 127.0 / scale + 0.5) AS INTEGER))
       ELSE list_transform(embedding, x -> 0) END, ',') AS codes_str
FROM s"""


def temperature_mix(
    df: DataFrame,
    source_col: str = "source",
    target: int = 200,
    alpha_pow: float = 0.5,
) -> DataFrame:
    """Dataset mixing with temperature-scaled source weights: sample a
    ``target``-sized training mix where source s contributes
    n_s = target * c_s^alpha / sum_t c_t^alpha rows (alpha < 1 upweights
    small sources — the standard multilingual/multi-corpus mixing rule).

    Determinism: weights are quantized once (w_e6 = floor(1e6 *
    c_s^alpha) — sqrt is an exactly-rounded IEEE op in both engines),
    quotas are exact integer division with the floored remainder
    redistributed largest-remainder-first (ties by source name), so
    the quotas sum to exactly ``target`` and the emitted mix has
    exactly ``target`` rows whenever every stratum holds at least its
    quota. The rows filling each quota are the stratum's
    md5-hash-ranked head (same construction as
    :func:`stratified_sample`), so re-runs and engines agree
    bit-for-bit.

    Scale: source counts are one map-side-combined aggregation
    (|sources| rows), quotas are driver math on that tiny frame, and
    the selection is one shuffle on the source key + a rank window —
    identical topology to stratified sampling. At extreme skew the
    per-source rank swaps for per-partition partial top-k.
    """
    if alpha_pow != 0.5:
        raise ValueError("alpha_pow=0.5 (sqrt) is the supported temperature")
    import math

    counts = {
        r["s"]: r["c"]
        for r in df.groupBy(F.col(source_col).alias("s"))
        .agg(F.count("*").alias("c"))
        .collect()
    }
    w_e6 = {s: math.floor(1e6 * math.sqrt(c)) for s, c in counts.items()}
    tw = sum(w_e6.values())
    quota = {s: (target * w) // tw for s, w in w_e6.items()}
    # largest-remainder redistribution: the floors drop up to
    # len(sources)-1 rows; hand one each to the sources with the
    # biggest truncated remainder (source name breaks ties) so the
    # quotas sum to exactly `target` — mirrored in the SQL oracle
    rem = {s: (target * w) % tw for s, w in w_e6.items()}
    for s in sorted(quota, key=lambda s: (-rem[s], s))[: target - sum(quota.values())]:
        quota[s] += 1
    quota_col = F.create_map(
        *[F.lit(x) for s in sorted(quota) for x in (s, quota[s])]
    )[F.col(source_col)]

    order = md5_hash64(F.concat(F.lit("mix|"), F.col("doc_id").cast("string")))
    w = Window.partitionBy(source_col).orderBy(F.col("h").asc(), F.col("doc_id").asc())
    return (
        df.select(F.col("doc_id"), F.col(source_col), order.alias("h"))
        .withColumn("sel_rank", F.row_number().over(w).cast("long"))
        .where(F.col("sel_rank") <= quota_col)
        .select("doc_id", source_col, "sel_rank")
    )


def oracle_temperature_mix(source_col: str = "source", target: int = 200) -> str:
    h = oracle_md5_hash64("('mix|' || CAST(doc_id AS VARCHAR))")
    return f"""WITH c AS (
  SELECT {source_col} AS s, COUNT(*) AS c FROM documents GROUP BY 1
), w AS (
  SELECT s, CAST(FLOOR(1000000 * sqrt(c)) AS BIGINT) AS w_e6 FROM c
), qbase AS (
  SELECT s,
    CAST(({target} * w_e6) // (SELECT SUM(w_e6) FROM w) AS BIGINT) AS n_base,
    CAST(({target} * w_e6) % (SELECT SUM(w_e6) FROM w) AS BIGINT) AS rem
  FROM w
), quota AS (
  -- largest-remainder redistribution (ties by source name), matching
  -- the Spark-side driver math exactly
  SELECT s, n_base + CASE
    WHEN ROW_NUMBER() OVER (ORDER BY rem DESC, s ASC)
         <= {target} - (SELECT SUM(n_base) FROM qbase)
    THEN 1 ELSE 0 END AS n_s
  FROM qbase
), ranked AS (
  SELECT doc_id, {source_col},
         CAST(ROW_NUMBER() OVER (PARTITION BY {source_col}
                                 ORDER BY {h}, doc_id) AS BIGINT) AS sel_rank
  FROM documents
)
SELECT r.doc_id, r.{source_col}, r.sel_rank
FROM ranked r JOIN quota q ON r.{source_col} = q.s
WHERE r.sel_rank <= q.n_s"""


# ---------------------------------------------------------------------
# source novelty: per-source marginal vocabulary contribution
# ---------------------------------------------------------------------


def source_novelty(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-source vocabulary footprint and NOVELTY: how many distinct
    tokens each source is the first to introduce (first occurrence =
    the token's minimum ``doc_id`` across the whole corpus — a stable
    total order, so ownership is deterministic). The marginal-novelty
    view is the curation question "which sources still add new
    language?" that per-source quality scores can't answer — a source
    can be high-quality yet contribute nothing the corpus doesn't
    already have.

    Scale: the raw postings (one row per (doc, type) — per-doc dedup
    happens map-side inside ``array_distinct``) are shuffled exactly
    ONCE, into a partial-combined rollup ``(token, source) ->
    min(doc_id)`` whose cardinality is bounded by |sources| x |vocab|,
    not by the corpus. Both outputs then come from a single LINEAR
    chain — rollup -> per-token entry list (vocabulary-sized shuffle,
    list bounded by |sources|) -> explode with an in-array argmin
    winner flag -> per-source count/sum (tiny) — with no plan branch
    at all. The r11 version branched the rollup into two consumers and
    trusted exchange reuse to dedupe the corpus shuffle; it does NOT
    fire (ADVICE r11, verified on the executed AQE plan: two separate
    ShuffleQueryStages over the same hashpartitioning(token, source)
    exchange — higher-order-function lambdas in the tokenizer defeat
    plan canonicalization), so the postings genuinely shuffled twice.
    At 100 TB that is one pass over tens of TB of shuffle vs two.
    Ties in the argmin cannot happen: a doc belongs to one source, so
    a token's per-source min_doc values are distinct. Output is
    |sources| rows; no driver collect."""
    rollup = (
        df.select(
            F.col("source"),
            F.col("doc_id"),
            F.explode(
                F.array_distinct(tokens_col(F.col(text_col)))
            ).alias("token"),
        )
        .groupBy("token", "source")
        .agg(F.min("doc_id").alias("min_doc"))
    )
    tok = rollup.groupBy("token").agg(
        F.collect_list(F.struct("min_doc", "source")).alias("entries")
    )
    return (
        tok.select(
            F.array_min("entries").getField("source").alias("w"),
            F.explode("entries").alias("e"),
        )
        .select(
            F.col("e.source").alias("source"),
            (F.col("e.source") == F.col("w")).cast("long").alias("is_first"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vocab"),
            F.sum("is_first").cast("long").alias("n_first_tokens"),
        )
    )


def oracle_source_novelty() -> str:
    toks = "list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')"
    return f"""WITH tok AS (
  SELECT source, doc_id, unnest(list_distinct({toks})) AS token
  FROM documents
), first AS (
  SELECT token, arg_min(source, doc_id) AS source FROM tok GROUP BY token
), intro AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_first_tokens
  FROM first GROUP BY 1
), vocab AS (
  SELECT source, CAST(COUNT(DISTINCT token) AS BIGINT) AS n_vocab
  FROM tok GROUP BY 1
)
SELECT v.source, v.n_vocab,
  CAST(COALESCE(i.n_first_tokens, 0) AS BIGINT) AS n_first_tokens
FROM vocab v LEFT JOIN intro i ON v.source = i.source"""


def vocab_growth(df: DataFrame, text_col: str = "text",
                 n_bins: int = 10) -> DataFrame:
    """Vocabulary growth (Heaps-law) curve: distinct tokens binned by
    WHERE in the corpus they first occur (doc_id deciles — ingestion
    order), with per-bin new-token counts and the running cumulative.
    A flattening curve says additional same-shaped data stops adding
    language — the stop-crawling / rebalance-sources signal that
    complements per-source novelty ([[source_novelty]] asks WHO adds
    vocabulary, this asks WHETHER more data still does).

    Scale: ONE corpus-sized postings shuffle into (token -> min
    doc_id), a 1-row broadcast of max(doc_id) (the documented
    scalar-broadcast pattern, never a global window), and an
    |n_bins|-row aggregate; the cumulative runs on n_bins rows.
    Output is exactly n_bins-or-fewer rows; no driver collect."""
    from pyspark.sql import Window

    first = (
        df.select(
            F.col("doc_id"),
            F.explode(
                F.array_distinct(tokens_col(F.col(text_col)))
            ).alias("token"),
        )
        .groupBy("token")
        .agg(F.min("doc_id").alias("first_doc"))
    )
    mx = df.agg(F.max("doc_id").alias("max_doc"))
    bins = (
        first.crossJoin(F.broadcast(mx))
        .select(
            F.least(
                F.lit(n_bins - 1),
                F.expr(f"first_doc * {n_bins} div (max_doc + 1)"),
            )
            .cast("long")
            .alias("bin")
        )
        .groupBy("bin")
        .agg(F.count(F.lit(1)).cast("long").alias("n_new_tokens"))
    )
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    return bins.select(
        "bin",
        "n_new_tokens",
        F.sum("n_new_tokens").over(w).cast("long").alias("cum_vocab"),
    )


def oracle_vocab_growth(n_bins: int = 10) -> str:
    toks = "list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')"
    return f"""WITH tok AS (
  SELECT doc_id, unnest(list_distinct({toks})) AS token
  FROM documents
), first AS (
  SELECT token, MIN(doc_id) AS first_doc FROM tok GROUP BY token
), mx AS (SELECT MAX(doc_id) AS max_doc FROM documents),
bins AS (
  SELECT LEAST({n_bins - 1}, first_doc * {n_bins} // (max_doc + 1)) AS bin,
         CAST(COUNT(*) AS BIGINT) AS n_new_tokens
  FROM first, mx GROUP BY 1
)
SELECT CAST(bin AS BIGINT) AS bin, n_new_tokens,
  CAST(SUM(n_new_tokens) OVER (ORDER BY bin
       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_vocab
FROM bins"""


# ---------------------------------------------------------------------
# DSIR: data selection via importance resampling (Xie et al. 2023,
# "Data Selection for Language Models via Importance Resampling")
# ---------------------------------------------------------------------

DSIR_BUCKETS = 4096


def _bigrams_col(toks):
    """Token-bigram array via JVM slice/zip_with (shared shape with
    text.bigram_lm_scores; empty for <2-token docs)."""
    n_pairs = F.greatest(F.size(toks) - 1, F.lit(0))
    return F.zip_with(
        F.slice(toks, 1, n_pairs),
        F.slice(toks, 2, n_pairs),
        lambda a, b: F.concat_ws(" ", a, b),
    )


def dsir_weights(
    df: DataFrame,
    text_col: str = "text",
    target=None,
    n_buckets: int = DSIR_BUCKETS,
    keep_mode: str = "rank",
) -> DataFrame:
    """DSIR importance weights: score every document by how much more
    likely its hashed-bigram features are under the TARGET domain's
    bucket distribution than under the RAW corpus's — the
    data-selection operator of Xie et al. 2023. ``target`` is any
    boolean Column marking the target-domain documents; the default is
    the Gopher quality gate (text.gopher_keep_col — a narrow per-row
    expression), i.e. "select documents whose n-gram profile looks
    like the quality subset", the quality-classifier-as-target
    deployment of the paper.

    Features are token bigrams hashed into ``n_buckets`` buckets (the
    paper's hashed n-gram generative model). Both bucket models use
    add-one smoothing, and each bucket's log-likelihood ratio is
    quantized ONCE:

        lam_e6(b) = floor(1e6 * ln( ((cp_b+1) * (cq_tot+B))
                                  / ((cq_b+1) * (cp_tot+B)) ))

    — a single ln of a ratio of exact integers, so Spark and DuckDB
    produce the identical double and the identical floor (the
    bigram-LM convention). A document's log-weight is the exact
    integer sum of lam_e6 over its bigram OCCURRENCES (= sum over
    buckets of count * lam), so the result is engine- and
    partition-order-exact. ``keep`` marks the TOP 20% by
    (logw_e6 DESC, doc_id) — the deterministic variant of the paper's
    weighted resampling (Gumbel sampling would not be hash-checkable;
    rank order is exactly what the paper resamples from).

    Scale: bigram construction and bucket hashing are narrow JVM
    expressions evaluated ONCE — the bucket models are SUM windows
    over the bucket key of the one compacted (doc_id, is_target,
    bucket) count frame, evaluated inline with the scoring (r13:
    the prior aggregate-and-rejoin form re-ran the tokenize + md5
    production once per consumer because AQE stage reuse never fires
    across the differently-pruned subtree copies). Global totals are
    a narrow scan-only aggregate broadcast as one row. Scoring ends
    in ONE doc_id shuffle over the compacted counts; window state is
    one bucket's compacted rows (<= |docs| each, spill-backed), and
    bucket keys are md5-uniform so the window shuffle cannot skew.
    The final top-20% rank is a global sort of the
    |docs|-row WEIGHT table (not the corpus); at 100 TB pass
    ``keep_mode="quantile"`` — the cutoff becomes one
    approximate-quantile 1-row aggregate broadcast into a narrow
    filter (no global window, single plan, shared Exchange), matching
    the rank set up to cutoff-weight ties plus the sketch's
    N/accuracy rank error; the expensive part (feature extraction +
    scoring) is unchanged.
    Overflow audit: the smoothing products stay exact in int64 while
    total bigram occurrences < ~3e9 per side
    ((cp+1)*(cq_tot+B) < 2^63); far beyond that, swap the products
    for ln(cp+1)+ln(cq_tot+B)-... at the cost of 4 lns per bucket."""
    if target is None:
        from spark_eventhubs_spark.operators.text import gopher_keep_col

        target = gopher_keep_col(F.col(text_col))
    toks = tokens_col(F.col(text_col))
    # The target flag is projected BELOW the bigram explode: with
    # `select(target, explode(...))` in one projection, Spark plans the
    # generator first and the other expressions in a Project ON TOP of
    # the Generate — so the target's array-fold tree would be evaluated
    # once per bigram OCCURRENCE (~50x per doc), which measured as
    # ~10 of this entry's 12 s at sf0.1. Projecting (doc_id, is_target,
    # bigram_array) first puts the fold on the Generate's CHILD: once
    # per document, carried through the explode as a plain column.
    base = df.select(
        "doc_id",
        target.alias("is_target"),
        _bigrams_col(toks).alias("bgs"),
    )
    occ = base.select(
        "doc_id", "is_target", F.explode("bgs").alias("bigram")
    ).select(
        "doc_id",
        "is_target",
        F.pmod(
            md5_hash64(F.concat(F.lit("dsir|"), F.col("bigram"))),
            F.lit(n_buckets),
        ).alias("b"),
    )
    # ONE pass over the expensive feature extraction: pre-r13 the
    # bucket models and the per-document scoring were two independent
    # consumers of the SAME (doc_id, is_target, b) -> n aggregation,
    # and the tokenize + gopher gate + bigram explode + md5 production
    # executed once per consumer — runtime executed plans show AQE
    # stage reuse never deduplicates the differently-pruned subtree
    # copies (relying on ReuseExchange was a fiction; same finding as
    # the r13 text-operator rewrites). Now the per-bucket model counts
    # are SUM windows over the bucket key of the one compacted frame
    # (whole-partition/no-sort, state = one bucket's <= |docs| rows,
    # spill-backed), and the global totals come from a narrow
    # scan-only aggregate (total bigrams = sum of greatest(|toks|-1,0),
    # target side gated by the same is_target expression) broadcast as
    # a 1-row scalar: exact integers, identical to summing the bucket
    # models. One production, three exchanges, zero vocabulary joins.
    doc_b = occ.groupBy("doc_id", "is_target", "b").agg(
        F.count("*").alias("n")
    )
    w_b = Window.partitionBy("b")
    cq_b = F.sum("n").over(w_b)
    cp_b = F.sum(F.when(F.col("is_target"), F.col("n")).otherwise(0)).over(w_b)
    n_bi = F.greatest(F.size(toks) - 1, F.lit(0)).cast("long")
    tot = df.select(
        n_bi.alias("nb"),
        F.when(target, n_bi).otherwise(F.lit(0)).alias("nb_p"),
    ).agg(
        F.sum("nb").alias("cq_tot"), F.sum("nb_p").alias("cp_tot")
    )
    lam_e6 = F.floor(
        F.lit(1e6)
        * F.log(
            ((cp_b + 1) * (F.col("cq_tot") + n_buckets)).cast("double")
            / ((cq_b + 1) * (F.col("cp_tot") + n_buckets)).cast("double")
        )
    ).cast("long")
    scored = (
        doc_b.join(F.broadcast(tot))
        .select("doc_id", "n", lam_e6.alias("lam_e6"))
        .groupBy("doc_id")
        .agg(
            F.sum("n").cast("long").alias("n_grams"),
            F.sum(F.col("n") * F.col("lam_e6")).cast("long").alias("logw_e6"),
        )
    )
    if keep_mode == "quantile":
        # The 100 TB keep path the docstring promises: a global sort of
        # the |docs|-row weight table is fine at catalog scale but at
        # 100 TB the cutoff comes from one approximate-quantile
        # aggregation (a 1-row frame) broadcast-cross-joined into a
        # narrow filter — no global window, no single-partition sort,
        # and ONE plan: the cutoff aggregate and the returned rows both
        # consume `scored`'s doc_id Exchange, which ReuseExchange plans
        # once (a driver-side collect would instead run the whole
        # feature pipeline twice, and would crash on an empty corpus).
        # Contract vs the exact rank path (pinned in
        # tests/test_corpus.py): the threshold keep-set matches the
        # rank keep-set up to (a) ties AT the cutoff weight (a
        # threshold cannot break them by doc_id) and (b) the sketch's
        # rank error — approx_percentile's GK sketch guarantees the
        # cutoff's rank within N/accuracy, so with ACCURACY=1e6 the
        # boundary can shift by up to 0.0001% of documents in either
        # direction. Raise ACCURACY (memory is O(accuracy) on one
        # executor) if a tighter band is needed.
        ACCURACY = 1_000_000
        cut = scored.agg(
            F.expr(
                f"approx_percentile(logw_e6, 0.8, {ACCURACY})"
            ).alias("cutoff_e6")
        )
        return scored.crossJoin(F.broadcast(cut)).select(
            "doc_id",
            "n_grams",
            "logw_e6",
            (F.col("logw_e6") >= F.col("cutoff_e6")).cast("int").alias("keep"),
        )
    if keep_mode != "rank":
        raise ValueError(f"unknown keep_mode {keep_mode!r}")
    w_rank = Window.orderBy(F.desc("logw_e6"), F.asc("doc_id"))
    w_all = Window.partitionBy()
    return scored.select(
        "doc_id",
        "n_grams",
        "logw_e6",
        (F.row_number().over(w_rank) * 5 <= F.count(F.lit(1)).over(w_all))
        .cast("int")
        .alias("keep"),
    )


def oracle_dsir_weights(n_buckets: int = DSIR_BUCKETS) -> str:
    from spark_eventhubs_spark.operators.text import (
        GOPHER_MAX_DUP_BP,
        GOPHER_MAX_MWL_BP,
        GOPHER_MAX_TOP_BP,
        GOPHER_MAX_WORDS,
        GOPHER_MIN_MWL_BP,
        GOPHER_MIN_WORDS,
        _oracle_tokens,
    )

    h = oracle_md5_hash64("('dsir|' || bigram)")
    return f"""WITH base AS (
  SELECT doc_id, {_oracle_tokens('text')} AS toks FROM documents
), tw AS (SELECT doc_id, unnest(toks) AS w FROM base),
mc AS (
  SELECT doc_id, MAX(c) AS mc
  FROM (SELECT doc_id, w, COUNT(*) AS c FROM tw GROUP BY 1, 2) GROUP BY 1
), tgt AS (
  SELECT b.doc_id,
    (CAST(len(b.toks) AS BIGINT) BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS}
     AND CAST(FLOOR(10000 * list_sum(list_transform(b.toks, x -> length(x))) / len(b.toks)) AS BIGINT)
         BETWEEN {GOPHER_MIN_MWL_BP} AND {GOPHER_MAX_MWL_BP}
     AND CAST(FLOOR(10000 * (len(b.toks) - len(list_distinct(b.toks))) / len(b.toks)) AS BIGINT) <= {GOPHER_MAX_DUP_BP}
     AND CAST(FLOOR(10000 * mc.mc / len(b.toks)) AS BIGINT) <= {GOPHER_MAX_TOP_BP}
    ) AS is_target
  FROM base b JOIN mc USING (doc_id)
), bg AS (
  SELECT base.doc_id, tgt.is_target,
    unnest(list_transform(range(1, len(toks)),
                          i -> toks[i] || ' ' || toks[i + 1])) AS bigram
  FROM base JOIN tgt USING (doc_id) WHERE len(toks) >= 2
), occ AS (
  SELECT doc_id, is_target, {h} % {n_buckets} AS b FROM bg
), counts AS (
  SELECT b, COUNT(*) AS cq,
    SUM(CASE WHEN is_target THEN 1 ELSE 0 END) AS cp
  FROM occ GROUP BY 1
), tot AS (
  SELECT SUM(cq) AS cq_tot, SUM(cp) AS cp_tot FROM counts
), lam AS (
  SELECT b,
    CAST(FLOOR(1000000.0 * ln(
      CAST((cp + 1) * (cq_tot + {n_buckets}) AS DOUBLE)
      / CAST((cq + 1) * (cp_tot + {n_buckets}) AS DOUBLE))) AS BIGINT) AS lam_e6
  FROM counts, tot
)
, scored AS (
  SELECT occ.doc_id, COUNT(*) AS n_grams,
    CAST(SUM(lam.lam_e6) AS BIGINT) AS logw_e6
  FROM occ JOIN lam USING (b) GROUP BY 1
)
SELECT doc_id, n_grams, logw_e6,
  CAST(CASE WHEN ROW_NUMBER() OVER (ORDER BY logw_e6 DESC, doc_id ASC) * 5
            <= COUNT(*) OVER () THEN 1 ELSE 0 END AS INTEGER) AS keep
FROM scored"""
