"""Similarity search over the ``embeddings`` table (array<float>).

North-star operators (SURVEY §2.3):
- brute-force cosine top-k (the correctness baseline)
- LSH-bucketed ANN (random-hyperplane signs) — the scale path: buckets
  shrink the candidate set so the per-query work is |bucket|, not |N|.

Numerics are done in double and results are reported as integer
``score_e6 = floor(cosine * 1e6)`` so Spark and DuckDB hash
identically. Vector math takes two routes, picked by dots-per-row:

- one or two dots per row (brute-force scoring, LSH bucketing,
  pairwise verification): ``zip_with``/``aggregate`` higher-order
  folds — JVM-side, interpreted per element but cheap at this width,
  and bit-identical to the oracles' ``list_sum(list_transform(...))``.
- C dots per row (IVF assignment/scoring, k-means): an Arrow-batched
  ``mapInPandas`` numpy kernel (:func:`_seq_dot_np`) that keeps the
  same sequential fold order via ``np.cumsum`` — ``np.sum``'s pairwise
  summation would break bit-parity. Round-1 measured the HOF form at
  ~5.4s for IVF at sf0.1; the kernel is ~3x faster and scale-safe
  (zero shuffle, codebook in the task closure).

Scale design: top-k against a query set is a broadcast join (query
vectors are small) + per-partition partial top-k via groupBy agg of
max_by arrays; no global sort of N rows. The LSH variant buckets on
sign-bit prefixes: an equi-join on bucket id, never a cross join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from spark_eventhubs_spark.functions.hashing import md5_hash64


DIM = 64  # embeddings.parquet vector width (TESTDATA.md)


def _dot(a: Column, b: Column, dim: int = DIM) -> Column:
    """<a, b> as a zip_with/aggregate higher-order fold (sequential
    left-to-right double adds — the order every twin of this function
    must reproduce). ``dim`` is accepted for signature parity with the
    numpy kernels but the fold is data-length-driven.

    Tried and rejected: unrolling into dim explicit multiply-adds to
    stay inside WholeStageCodegen. The generated method overflows
    Janino's 64KB limit at C*dim terms (IVF), and even at 1-2x dim the
    compile time of the giant method dominates these sub-second
    queries — measured 0.36s -> 1.5s on brute-force top-k at sf0.1.
    The HOF interpreter overhead only matters when a query evaluates
    MANY dots per row (the IVF family), and those use the
    :func:`_seq_dot_np` mapInPandas kernels instead."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column, dim: int = DIM) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def _norm_py(vals: list) -> float:
    """Driver-side twin of :func:`_norm` — same sequential fold, and
    Python floats are IEEE doubles, so bit-identical."""
    import math

    acc = 0.0
    for x in vals:
        acc = acc + float(x) * float(x)
    return math.sqrt(acc)


def cosine_col(a: Column, b: Column, dim: int = DIM) -> Column:
    return _dot(a, b, dim) / (_norm(a, dim) * _norm(b, dim))


def oracle_cosine(a: str, b: str, dim: int = 64) -> str:
    """DuckDB SQL for cosine similarity that bit-matches the Spark-side
    :func:`cosine_col`: ``list_cosine_similarity`` accumulates in
    float32, while Spark's aggregate fold is sequential float64 — so
    the oracle spells out the same left-to-right double arithmetic."""
    def dot(x, y):
        return (f"list_sum(list_transform(range(1, {dim + 1}), "
                f"i -> CAST({x}[i] AS DOUBLE) * CAST({y}[i] AS DOUBLE)))")
    return f"({dot(a, b)} / (sqrt({dot(a, a)}) * sqrt({dot(b, b)})))"


def brute_force_topk(
    df: DataFrame,
    query_vec_id: int = 0,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k cosine neighbors of one stored vector (excluding itself).

    The query row is a 1-row broadcast; scoring is a scan; the limit is
    partition-incremental (Spark TakeOrderedAndProject), so no full
    sort materializes.
    """
    q = df.where(F.col(id_col) == query_vec_id).select(
        F.col(vec_col).alias("qvec")
    )
    scored = (
        df.where(F.col(id_col) != query_vec_id)
        .join(F.broadcast(q))
        .select(
            F.col(id_col),
            F.floor(cosine_col(F.col(vec_col), F.col("qvec")) * 1e6)
            .cast("long")
            .alias("score_e6"),
        )
    )
    return scored.orderBy(F.col("score_e6").desc(), F.col(id_col).asc()).limit(k)


def oracle_brute_force_topk(query_vec_id: int = 0, k: int = 10) -> str:
    cos = oracle_cosine("embedding", "qvec")
    return f"""WITH q AS (
  SELECT embedding AS qvec FROM embeddings WHERE vec_id = {query_vec_id}
)
SELECT vec_id,
  CAST(FLOOR({cos} * 1000000) AS BIGINT) AS score_e6
FROM embeddings, q
WHERE vec_id <> {query_vec_id}
ORDER BY score_e6 DESC, vec_id ASC
LIMIT {k}"""


def hyperplane_bucket(
    vec: Column, dim: int, n_planes: int = 8
) -> Column:
    """Deterministic random-hyperplane LSH bucket id in [0, 2^n_planes).

    Plane weights are pseudo-random in [-1000, 1000], derived from the
    shared md5 hash of (plane, dim-index) — reproducible in SQL, no
    stored model. Bit p of the bucket = sign of <vec, w_p>.

    The weights are computed on the DRIVER (hashlib md5 == engine md5)
    and shipped as array literals: the earlier column-expression form
    re-ran md5 per row (rows x planes x dim md5 calls) because Catalyst
    does not constant-fold through the higher-order-function boundary.
    """
    bucket = F.lit(0)
    for p in range(n_planes):
        weights = F.array(
            *[F.lit(float(_plane_weight(p, i))) for i in range(dim)]
        )
        proj = F.aggregate(
            F.zip_with(vec, weights, lambda x, w: x.cast("double") * w),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket.cast("long")


def _plane_weight(p: int, i: int) -> int:
    """Weight of hyperplane p at dimension i: ((md5_60("p:i") % 2001)
    - 1000), identical to the SQL oracle's derivation."""
    from spark_eventhubs_spark.functions.hashing import md5_hash64_py

    return (md5_hash64_py(f"{p}:{i}") % 2001) - 1000


def _bucket_frame(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    n_planes: int,
    with_norm: bool = False,
) -> DataFrame:
    """(id, vec, bucket[, nrm]) via one Arrow-batched kernel: all
    n_planes hyperplane projections as whole-array sequential folds
    (:func:`_seq_dot_np`), replacing n_planes interpreted HOF
    evaluations per row. Bit-identical signs to the
    :func:`hyperplane_bucket` expression form and the SQL oracle."""
    import numpy as np

    W = np.array(
        [[float(_plane_weight(p, i)) for i in range(dim)] for p in range(n_planes)],
        dtype=np.float64,
    )
    schema = f"{id_col} long, {vec_col} array<float>, bucket long" + (
        ", nrm double" if with_norm else ""
    )

    def _fn(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            bucket = np.zeros(len(X), dtype=np.int64)
            for p in range(n_planes):
                proj = _seq_dot_np(X, W[p])
                bucket += (proj > 0).astype(np.int64) << p
            out = pdf[[id_col, vec_col]].copy()
            out["bucket"] = bucket
            if with_norm:
                out["nrm"] = np.sqrt(np.cumsum(X * X, axis=1)[:, -1])
            yield out

    return df.select(F.col(id_col), F.col(vec_col)).mapInPandas(_fn, schema)


def lsh_ann_topk(
    df: DataFrame,
    query_vec_id: int = 0,
    k: int = 10,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: score only vectors in the query's hyperplane bucket.

    At 100 TB the bucket column is precomputed/partitioned-by at ingest
    so a query touches 1/2^n_planes of the data; here it is derived on
    the fly (Arrow bucket kernel — see :func:`_bucket_frame`); scoring
    the small in-bucket candidate set stays a JVM expression.
    Approximate by construction — recall measured in tests, not
    oracle-checked (the catalog entry derives an exact oracle from the
    deterministic plane weights).

    The query's vector is fetched with a pushed-down id filter and its
    bucket computed DRIVER-side with the same :func:`_seq_dot_np`
    fold — the previous form filtered the bucketed frame, which ran
    the corpus-wide bucket kernel a second time just to produce the
    one query row.
    """
    import numpy as np

    qrow = df.where(F.col(id_col) == query_vec_id).select(vec_col).first()
    if qrow is None:
        raise ValueError(
            f"lsh_ann_topk: query vector {id_col}={query_vec_id} not found"
        )
    x = np.asarray(qrow[0], dtype=np.float64)
    qbucket = 0
    for p in range(n_planes):
        w = np.array(
            [float(_plane_weight(p, i)) for i in range(dim)], dtype=np.float64
        )
        if _seq_dot_np(x[None, :], w)[0] > 0:
            qbucket |= 1 << p
    qdf = df.sparkSession.createDataFrame(
        [(list(qrow[0]),)], f"qvec array<float>"
    )
    with_bucket = _bucket_frame(df, id_col, vec_col, dim, n_planes)
    return (
        with_bucket.where(F.col("bucket") == qbucket)
        .where(F.col(id_col) != query_vec_id)
        .join(F.broadcast(qdf))
        .select(
            F.col(id_col),
            F.floor(cosine_col(F.col(vec_col), F.col("qvec"), dim) * 1e6).cast("long").alias("score_e6"),
        )
        .orderBy(F.col("score_e6").desc(), F.col(id_col).asc())
        .limit(k)
    )


def _oracle_bucket_expr(vec: str, n_planes: int = 8, dim: int = 64) -> str:
    """Hyperplane-signature bucket of ``vec`` as ONE deterministic
    scalar expression: each plane's projection is an ORDERED
    left-to-right float64 fold (the :func:`oracle_cosine` pattern —
    bit-parity with :func:`_seq_dot_np`), with the plane weights
    inlined as literals from :func:`_plane_weight` — the same values
    the oracle previously re-derived via MD5, but through a grouped
    float SUM whose accumulation order DuckDB does not define (a
    projection within rounding error of zero could flip sign, and
    therefore bucket, nondeterministically)."""
    planes = []
    for p in range(n_planes):
        w = "[" + ", ".join(str(_plane_weight(p, i)) for i in range(dim)) + "]"
        proj = (
            f"list_sum(list_transform(range(1, {dim + 1}), "
            f"i -> CAST({vec}[i] AS DOUBLE) * CAST(({w})[i] AS DOUBLE)))"
        )
        planes.append(f"(CASE WHEN {proj} > 0 THEN {1 << p} ELSE 0 END)")
    return "(" + " + ".join(planes) + ")"


def oracle_pairwise_above_threshold(
    threshold_e6: int = 950_000, n_planes: int | None = 8, dim: int = 64
) -> str:
    """DuckDB twin of :func:`pairwise_above_threshold`: the hyperplane
    bucket is computed by :func:`_oracle_bucket_expr` — literal
    :func:`_plane_weight` weights, ordered per-plane folds — so the
    bucket assignment, and therefore the exact candidate set, matches
    the Spark plan deterministically.

    ``n_planes=None`` mirrors the engine's :func:`auto_n_planes`
    IN LOCKSTEP at every corpus size: the SQL derives the width from
    the same ``COUNT(*)`` the engine counts, computes the full
    ``ORACLE_MAX_PLANES``-plane bucket once, and masks it to the low
    ``planes`` bits with ``%`` — valid because plane p always
    contributes exactly bit p (:func:`_plane_weight` depends only on
    (p, i)), so the K-plane bucket IS the low-K-bit prefix of the
    wide one. Without this, engine-auto vs oracle-pinned-8 diverge on
    any corpus past target * 2^8 = 2048 vectors."""
    if n_planes is None:
        bkt = f"""WITH np AS (
  SELECT GREATEST(8, CAST(CEIL(LOG2(GREATEST(
    (COUNT(*) + {PAIRWISE_TARGET_BUCKET - 1}) // {PAIRWISE_TARGET_BUCKET}, 1
  ))) AS BIGINT)) AS planes
  FROM embeddings
), bkt AS (
  SELECT vec_id,
    CAST({_oracle_bucket_expr("embedding", ORACLE_MAX_PLANES, dim)} AS BIGINT)
      % (CAST(1 AS BIGINT) << np.planes) AS bucket
  FROM embeddings, np
)"""
    else:
        bkt = f"""WITH bkt AS (
  SELECT vec_id, CAST({_oracle_bucket_expr("embedding", n_planes, dim)} AS BIGINT) AS bucket
  FROM embeddings
)"""
    return f"""{bkt}
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
  CAST(FLOOR({oracle_cosine("ea.embedding", "eb.embedding", dim)} * 1000000) AS BIGINT) AS score_e6
FROM bkt a
JOIN bkt b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
JOIN embeddings ea ON ea.vec_id = a.vec_id
JOIN embeddings eb ON eb.vec_id = b.vec_id
WHERE FLOOR({oracle_cosine("ea.embedding", "eb.embedding", dim)} * 1000000) >= {threshold_e6}"""


def _seq_dot_np(X, w):
    """Row-wise <X[i], w> with the SAME left-to-right fold order as the
    engine/oracle sums: ``np.cumsum`` is ``np.add.accumulate`` —
    strictly sequential — whereas ``np.sum``/``@`` use pairwise
    summation and would drift in the last ulp. Bit-identical doubles
    are what keep the IVF candidate set (argmax assignment) and the
    floor(cos*1e6) scores hash-equal to the DuckDB oracle."""
    import numpy as np

    return np.cumsum(X * w[None, :], axis=1)[:, -1]


def _ivf_scan_fn(cents, probe_cids, qvec, query_vec_id, id_col, vec_col):
    """mapInPandas kernel: assign each vector to its nearest centroid
    (argmax cosine, ties to the smallest cid — ``cents`` is cid-sorted
    and np.argmax takes the first max), drop rows outside the probe
    cells, and score survivors against the query vector. All arithmetic
    via :func:`_seq_dot_np` so results bit-match the SQL oracle."""
    import numpy as np

    C = [np.asarray(v, dtype=np.float64) for _, v in cents]
    cnorms = [_norm_py(v) for _, v in cents]
    cids = np.array([cid for cid, _ in cents], dtype=np.int64)
    qv = np.asarray(qvec, dtype=np.float64)
    qn = _norm_py(qvec)
    probe = np.array(sorted(probe_cids), dtype=np.int64)

    def fn(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            rn = np.sqrt(np.cumsum(X * X, axis=1)[:, -1])
            S = np.empty((X.shape[0], len(C)), dtype=np.float64)
            for j, c in enumerate(C):
                S[:, j] = _seq_dot_np(X, c) / (rn * cnorms[j])
            cell = cids[np.argmax(S, axis=1)]
            keep = np.isin(cell, probe) & (pdf[id_col].to_numpy() != query_vec_id)
            if not keep.any():
                continue
            sq = _seq_dot_np(X[keep], qv) / (rn[keep] * qn)
            yield pd.DataFrame({
                id_col: pdf[id_col].to_numpy()[keep],
                "score_e6": np.floor(sq * 1e6).astype(np.int64),
            })

    return fn


def _recall_scan_fn(
    cents, probe_cids, qvec, qbucket, W, query_vec_id, k, id_col, vec_col
):
    """mapInPandas kernel for :func:`recall_topk_per_method`: ONE pass
    over the corpus scoring every row against the query (brute leg)
    and deciding LSH-bucket / IVF-probe-cell membership, then emitting
    only each task's LOCAL top-k per method — the per-partition
    partial top-k shape, so the downstream global rank sees <=
    3k rows per task regardless of corpus size. All arithmetic via
    :func:`_seq_dot_np` (bit-parity with the SQL oracle, proven by the
    IVF/LSH legs it fuses)."""
    import numpy as np

    C = [np.asarray(v, dtype=np.float64) for _, v in cents]
    cnorms = [_norm_py(v) for _, v in cents]
    cids = np.array([cid for cid, _ in cents], dtype=np.int64)
    qv = np.asarray(qvec, dtype=np.float64)
    qn = _norm_py(qvec)
    probe = np.array(sorted(probe_cids), dtype=np.int64)

    def fn(batches):
        import pandas as pd

        acc: dict = {m: ([], []) for m in ("brute", "lsh", "ivf")}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy()
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            rn = np.sqrt(np.cumsum(X * X, axis=1)[:, -1])
            nq = ids != query_vec_id
            # brute score for every row (same float sequence as
            # _ivf_scan_fn: cosine double, * 1e6, floor)
            sq = _seq_dot_np(X, qv) / (rn * qn)
            score = np.floor(sq * 1e6).astype(np.int64)
            # LSH bucket (same fold as _bucket_frame)
            bucket = np.zeros(len(X), dtype=np.int64)
            for p in range(W.shape[0]):
                bucket += (_seq_dot_np(X, W[p]) > 0).astype(np.int64) << p
            # IVF cell (same argmax/tie semantics as _ivf_scan_fn)
            S = np.empty((X.shape[0], len(C)), dtype=np.float64)
            for j, c in enumerate(C):
                S[:, j] = _seq_dot_np(X, c) / (rn * cnorms[j])
            cell = cids[np.argmax(S, axis=1)]
            for m, mask in (
                ("brute", nq),
                ("lsh", nq & (bucket == qbucket)),
                ("ivf", nq & np.isin(cell, probe)),
            ):
                if mask.any():
                    acc[m][0].append(ids[mask])
                    acc[m][1].append(score[mask])
        out_m, out_i, out_s = [], [], []
        for m, (idl, scl) in acc.items():
            if not idl:
                continue
            aid = np.concatenate(idl)
            asc = np.concatenate(scl)
            order = np.lexsort((aid, -asc))[:k]  # (score desc, id asc)
            out_m += [m] * len(order)
            out_i.append(aid[order])
            out_s.append(asc[order])
        if out_m:
            yield pd.DataFrame({
                "method": out_m,
                id_col: np.concatenate(out_i),
                "score_e6": np.concatenate(out_s),
            })

    return fn


def recall_topk_per_method(
    df: DataFrame,
    query_vec_id: int = 0,
    k: int = 10,
    n_planes: int = 8,
    dim: int = DIM,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The three recall-evaluation top-k legs — brute-force ground
    truth, LSH-bucketed ANN, IVF-probed ANN — from ONE corpus pass:
    (method, id, score_e6) with exactly each method's global top-k,
    bit-identical to running :func:`brute_force_topk`,
    :func:`lsh_ann_topk` and :func:`ivf_ann_topk` separately (same
    candidate sets, same sequential-fold scores, same
    (score desc, id asc) tie order).

    Why it exists (r13 verdict item 2): the recall@k entry built the
    legs independently — three full corpus scans (two of them
    Arrow-kernel passes), two plan-time driver jobs, and the per-leg
    ``orderBy().limit()``s compiled under the final union/join into
    single-partition GlobalLimit exchanges instead of
    TakeOrderedAndProject, serializing a deep DAG of tiny stages (the
    driver record read 2x SLOWER than the pre-r13 two-join form and
    anti-scaled 0.49 at 8-vs-32 cores). Here: ONE driver collect
    (codebook + query vector), ONE Arrow pass emitting per-task local
    top-ks, ONE tiny 3-key exchange for the global rank.

    Scale: the kernel's per-task output is <= 3k rows regardless of
    corpus size; the rank shuffles <= 3k * n_tasks rows. At 100 TB the
    bucket/cell ids are ingest-materialized partition columns and each
    ANN leg prunes its scan instead (the entry measures the eval
    harness, which must score the full corpus for ground truth
    anyway)."""
    import numpy as np

    # ONE driver job: centroid codebook + query vector (the codebook
    # always fits — C rows; the LSH leg's separate .first() job and
    # the IVF leg's .collect() job are folded into this single pass)
    need = df.where(
        (F.col(id_col) < n_cells) | (F.col(id_col) == query_vec_id)
    ).select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec")).collect()
    cent_rows = sorted(
        (r for r in need if r["cid"] < n_cells), key=lambda r: r["cid"]
    )
    qvec = [float(x) for r in need if r["cid"] == query_vec_id for x in r["cvec"]]
    if not qvec:
        raise ValueError(
            f"recall_topk_per_method: query vector {id_col}={query_vec_id}"
            " not found"
        )
    cents = [(r["cid"], [float(x) for x in r["cvec"]]) for r in cent_rows]

    # LSH: query bucket, driver-side (same fold as lsh_ann_topk)
    W = np.array(
        [[float(_plane_weight(p, i)) for i in range(dim)] for p in range(n_planes)],
        dtype=np.float64,
    )
    x = np.asarray(qvec, dtype=np.float64)
    qbucket = 0
    for p in range(n_planes):
        if _seq_dot_np(x[None, :], W[p])[0] > 0:
            qbucket |= 1 << p

    # IVF: probe-cell ranking, driver-side (same _cos_py sequence as
    # ivf_ann_topk — Python floats are IEEE doubles)
    import math

    def _dot_py(a, b):
        acc = 0.0
        for i in range(len(a)):
            acc = acc + a[i] * b[i]
        return acc

    def _cos_py(a, b):
        return _dot_py(a, b) / (
            math.sqrt(_dot_py(a, a)) * math.sqrt(_dot_py(b, b))
        )

    ranked = sorted(
        ((_cos_py(v, qvec), cid) for cid, v in cents),
        key=lambda t: (-t[0], t[1]),
    )
    probe_cids = [cid for _, cid in ranked[:n_probe]]

    local = df.select(F.col(id_col), F.col(vec_col)).mapInPandas(
        _recall_scan_fn(
            cents, probe_cids, qvec, qbucket, W, query_vec_id, k,
            id_col, vec_col,
        ),
        schema=f"method string, {id_col} long, score_e6 long",
    )
    from pyspark.sql import Window

    w = Window.partitionBy("method").orderBy(
        F.col("score_e6").desc(), F.col(id_col).asc()
    )
    return (
        local.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= k)
        .drop("_rk")
    )


def _cell_partials_fn(cents, vec_col):
    """mapInPandas kernel for the Lloyd update step: per Arrow batch,
    assign rows to their nearest centroid (same argmax/tie semantics as
    :func:`_ivf_scan_fn`) and emit one ``(cid, n, vec_sum)`` partial per
    non-empty cell — the map-side combine of the mean aggregation done
    inside the kernel. Output is <= n_cells rows per batch regardless of
    batch size, so collecting the partials and finishing the average on
    the driver is O(cells * dim) — the treeAggregate shape of
    distributed k-means, with no wide shuffle and no 64-column codegen."""
    import numpy as np

    C = [np.asarray(v, dtype=np.float64) for _, v in cents]
    cnorms = [_norm_py(v) for _, v in cents]
    cids = np.array([cid for cid, _ in cents], dtype=np.int64)

    def fn(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            rn = np.sqrt(np.cumsum(X * X, axis=1)[:, -1])
            S = np.empty((X.shape[0], len(C)), dtype=np.float64)
            for j, c in enumerate(C):
                S[:, j] = _seq_dot_np(X, c) / (rn * cnorms[j])
            a = np.argmax(S, axis=1)
            out_cid, out_n, out_sum = [], [], []
            for j in np.unique(a):
                mask = a == j
                out_cid.append(int(cids[j]))
                out_n.append(int(mask.sum()))
                out_sum.append(X[mask].sum(axis=0))
            yield pd.DataFrame({"cid": out_cid, "n": out_n, "s": out_sum})

    return fn


def ivf_ann_topk(
    df: DataFrame,
    query_vec_id: int = 0,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style ANN: coarse-quantize every vector to its nearest of
    ``n_cells`` centroids, then search only the query's ``n_probe``
    closest cells.

    Centroid seeding is training-free and deterministic (the first
    ``n_cells`` vectors by id) so the whole pipeline — assignment,
    probing, scoring — is oracle-checkable; swap the seeding for a
    sampled k-means job at scale (assignment plan is unchanged).

    Scale: the centroid codebook + query vector are collected in ONE
    driver job (C+1 rows, tiny — the IVF codebook always fits);
    probe-cell ranking happens driver-side with the SAME sequential
    double arithmetic as the engines (Python floats are IEEE doubles).
    Cell assignment + probe filter + scoring run in ONE Arrow-batched
    ``mapInPandas`` pass — zero shuffle, no N*C row expansion, the
    codebook rides in the task closure (C*dim doubles). A C-wide
    unrolled JVM expression was tried and abandoned: 16x64 terms
    overflows Janino's 64KB method limit and de-optimizes the whole
    stage to interpreted (round-1: 5.35 s at sf0.1). At 100 TB the
    cell id is materialized at ingest and used as a partition column
    so a query reads n_probe/n_cells of the data.
    """
    import math

    need = df.where(
        (F.col(id_col) < n_cells) | (F.col(id_col) == query_vec_id)
    ).select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec")).collect()
    cent_rows = sorted(
        (r for r in need if r["cid"] < n_cells), key=lambda r: r["cid"]
    )
    qvec = [float(x) for r in need if r["cid"] == query_vec_id for x in r["cvec"]]
    if not qvec:
        # without this the empty query surfaces later as an opaque
        # numpy shape error inside the executor kernel
        raise ValueError(
            f"ivf_ann_topk: query vector {id_col}={query_vec_id} not found"
        )

    def _dot_py(a, b):
        # sequential left-to-right fold, same op order as the oracle's
        # list_sum(list_transform(...)) — bit-identical
        acc = 0.0
        for i in range(len(a)):
            acc = acc + a[i] * b[i]
        return acc

    def _cos_py(a, b):
        return _dot_py(a, b) / (math.sqrt(_dot_py(a, a)) * math.sqrt(_dot_py(b, b)))

    ranked = sorted(
        ((_cos_py([float(x) for x in r["cvec"]], qvec), r["cid"]) for r in cent_rows),
        key=lambda t: (-t[0], t[1]),
    )
    probe_cids = [cid for _, cid in ranked[:n_probe]]
    cents = [(r["cid"], [float(x) for x in r["cvec"]]) for r in cent_rows]

    scored = df.select(F.col(id_col), F.col(vec_col)).mapInPandas(
        _ivf_scan_fn(cents, probe_cids, qvec, query_vec_id, id_col, vec_col),
        schema=f"{id_col} long, score_e6 long",
    )
    return scored.orderBy(F.col("score_e6").desc(), F.col(id_col).asc()).limit(k)


def oracle_ivf_ann_topk(
    query_vec_id: int = 0, k: int = 10, n_cells: int = 16, n_probe: int = 4
) -> str:
    return f"""WITH cent AS (
  SELECT vec_id AS cid, embedding AS cvec FROM embeddings WHERE vec_id < {n_cells}
), assigned AS (
  SELECT e.vec_id, e.embedding, c.cid,
    ROW_NUMBER() OVER (PARTITION BY e.vec_id
      ORDER BY {oracle_cosine("e.embedding", "c.cvec")} DESC, c.cid ASC) AS rn
  FROM embeddings e, cent c
), cells AS (
  SELECT vec_id, embedding, cid FROM assigned WHERE rn = 1
), qcells AS (
  SELECT c.cid
  FROM cent c, (SELECT embedding FROM embeddings WHERE vec_id = {query_vec_id}) q
  ORDER BY {oracle_cosine("c.cvec", "q.embedding")} DESC, c.cid ASC
  LIMIT {n_probe}
), q AS (
  SELECT embedding AS qvec FROM embeddings WHERE vec_id = {query_vec_id}
)
SELECT x.vec_id,
  CAST(FLOOR({oracle_cosine("x.embedding", "qvec")} * 1000000) AS BIGINT) AS score_e6
FROM cells x JOIN qcells p ON x.cid = p.cid, q
WHERE x.vec_id <> {query_vec_id}
ORDER BY score_e6 DESC, x.vec_id ASC
LIMIT {k}"""


# target rows per LSH bucket for pairwise_above_threshold's auto
# plane count: the within-bucket screen is O(load^2) per bucket, so a
# FIXED signature width breaks linearity as the corpus grows (fixed 8
# planes = 256 buckets: measured 136x wall at 100x data, round 8 —
# same failure class as semdedup's fixed k). 8 keeps n_planes exactly
# 8 at every oracle-verified sf (500 vecs at sf0.01, 2000 at sf0.1).
PAIRWISE_TARGET_BUCKET = 8


# widest signature the DYNAMIC oracle precomputes (masked down to the
# auto width): 20 planes covers corpora to target * 2^20 ~ 8.4M
# vectors — far past any sf the DuckDB twin could materialize anyway
ORACLE_MAX_PLANES = 20


def auto_n_planes(n: int, target: int = PAIRWISE_TARGET_BUCKET) -> int:
    """Smallest signature width holding expected bucket load <= target
    (floor 8, the oracle-pinned width at the driver's check scales):
    2^planes buckets ~ n/target.

    Pure-integer form (``ceil(log2(ceil(n/target)))`` via bit_length —
    identical values to the float original for every n >= 1) so the
    engine side is float-free; the SQL twin's
    ``CEIL(LOG2((COUNT(*) + t-1) // t))`` computes log2 of the SAME
    integer, where ceil can only disagree within half an ulp of an
    integer boundary — impossible below n ~ 2^45 (verified by sweep in
    tests)."""
    m = (max(n, 1) + target - 1) // target
    return max(8, (m - 1).bit_length())


def pairwise_above_threshold(
    df: DataFrame,
    threshold_e6: int = 950_000,
    n_planes: int | None = None,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-dup pairs: bucket by hyperplane signature, score
    within buckets only (equi-join), keep cosine >= threshold.

    ``n_planes=None`` derives the signature width from one
    metadata-cheap count via :func:`auto_n_planes`, holding the
    expected bucket load — and therefore the O(load) candidate pairs
    PER ROW — constant as the corpus grows; pass an explicit width to
    pin it (the SQL oracle pins 8, which auto matches at every
    oracle-verified sf). This is the 100 TB contract: bucket count is
    what scales, bucket size is a constant.

    Each side's norm is computed ONCE per row before the join (narrow)
    instead of once per candidate pair — identical doubles, since
    cosine = dot/(sqrt(na)*sqrt(nb)) either way, but 2/3 less vector
    arithmetic in the post-join hot loop.

    The bucket+norm stage runs as an Arrow-batched ``mapInPandas``
    numpy kernel with the sequential-fold arithmetic of
    :func:`_seq_dot_np` — and is checkpoint-memoized, so a catalog/
    production session pays it once per corpus. The per-pair scoring
    HOT path is pure JVM since round 13: ``zip_with`` + ``aggregate``
    folds the element products left-to-right in double, which is the
    exact same operation order as the numpy ``cumsum`` kernel it
    replaced (cast-to-double, multiply, strictly sequential add), so
    scores stay bit-equal to the SQL oracle while the candidate
    stream never crosses an Arrow boundary — the r12 bench cell's
    multi-second jitter was Python-worker spawn + 100s-of-MB Arrow
    transfer on exactly this stage, and at 100 TB the candidate
    stream is the operator's dominant data volume."""
    if n_planes is None:
        from spark_eventhubs_spark.operators.dedup import _count_cached

        n_planes = auto_n_planes(_count_cached(df))
    from spark_eventhubs_spark.operators.dedup import _checkpoint_cached

    # materialize the bucket+norm frame once: it feeds BOTH sides of
    # the self-join, and when AQE broadcasts one side the broadcast
    # subplan shares no exchange with the probe side — without this
    # the corpus-wide projection kernel runs twice (the exact hazard
    # dedup.lsh_candidate_pairs documents and fixes the same way)
    with_bucket = _checkpoint_cached(
        _bucket_frame(df, id_col, vec_col, dim, n_planes, with_norm=True),
        df, "pairwise_buckets", (n_planes, dim, id_col, vec_col),
    )
    a = with_bucket.alias("a")
    b = with_bucket.alias("b")
    cand = (
        a.join(b, "bucket")
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("vec_a"),
            F.col(f"b.{id_col}").alias("vec_b"),
            F.col(f"a.{vec_col}").alias("va"),
            F.col(f"b.{vec_col}").alias("vb"),
            F.col("a.nrm").alias("na"),
            F.col("b.nrm").alias("nb"),
        )
    )

    dot = F.aggregate(
        F.zip_with(
            F.col("va"), F.col("vb"),
            lambda x, y: x.cast("double") * y.cast("double"),
        ),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )
    score = F.floor(dot / (F.col("na") * F.col("nb")) * F.lit(1e6))
    return (
        cand.select("vec_a", "vec_b", score.cast("long").alias("score_e6"))
        .where(F.col("score_e6") >= F.lit(threshold_e6))
    )


def knn_join(
    df: DataFrame,
    query_max_id: int = 8,
    k: int = 5,
    method: str = "window",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """k-NN join: top-k neighbors for every query vector (ids below
    ``query_max_id``), excluding the query set from the corpus side.

    Two physically different, result-identical strategies:

    - ``window``: rank with row_number over qid — one shuffle of all
      scored rows onto |queries| reducers. Simple, but with few hot
      qids every scored row funnels through few tasks.
    - ``partial``: per-input-partition top-k first (sort_array over a
      collect_list bounded by the partition's rows), then a final
      merge of |partitions| x k candidates per query. The shuffle
      carries only the k-sized partials — the scale path when the
      corpus side is large (same idea as Spark's TakeOrderedAndProject,
      generalized per group).

    Scoring runs in one Arrow-batched ``mapInPandas`` pass: the query
    set (tiny by definition) is collected and closed over, and each
    corpus batch scores against all queries with the exact-arithmetic
    :func:`_seq_dot_np` fold — replacing |queries| interpreted
    higher-order cosine evaluations per row while keeping
    floor(cos*1e6) bit-equal to the SQL oracle.
    """
    import numpy as np

    qs = [
        (int(r[0]), np.asarray(r[1], dtype=np.float64))
        for r in df.where(F.col(id_col) < query_max_id)
        .select(id_col, vec_col)
        .collect()
    ]
    qnorms = {qid: _norm_py(list(qv)) for qid, qv in qs}

    def _score_fn(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy()
            X = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            xnorm = np.sqrt(np.cumsum(X * X, axis=1)[:, -1])
            frames = []
            for qid, qv in qs:
                s = _seq_dot_np(X, qv) / (xnorm * qnorms[qid])
                frames.append(
                    pd.DataFrame(
                        {
                            "qid": np.full(len(ids), qid, dtype=np.int64),
                            id_col: ids,
                            "score_e6": np.floor(s * 1e6).astype(np.int64),
                        }
                    )
                )
            if frames:
                yield pd.concat(frames, ignore_index=True)

    scored = (
        df.where(F.col(id_col) >= query_max_id)
        .select(id_col, vec_col)
        .mapInPandas(_score_fn, f"qid long, {id_col} long, score_e6 long")
    )
    if method == "window":
        from pyspark.sql import Window

        w = Window.partitionBy("qid").orderBy(
            F.col("score_e6").desc(), F.col(id_col).asc()
        )
        return (
            scored.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= k)
            .select("qid", id_col, "score_e6")
        )
    if method != "partial":
        raise ValueError(f"unknown method {method!r}")
    # sort key (-score, vec_id) ascending == score desc, id asc
    cand = F.struct(
        (-F.col("score_e6")).alias("neg"), F.col(id_col).alias("vid")
    )
    def topk(col):
        return F.slice(F.sort_array(F.collect_list(col)), 1, k)
    partial = (
        scored.groupBy("qid", F.spark_partition_id().alias("p"))
        .agg(topk(cand).alias("cands"))
        .select("qid", F.explode("cands").alias("c"))
    )
    return (
        partial.groupBy("qid")
        .agg(topk(F.col("c")).alias("cands"))
        .select("qid", F.explode("cands").alias("c"))
        .select(
            "qid",
            F.col("c.vid").alias(id_col),
            (-F.col("c.neg")).alias("score_e6"),
        )
    )


def kmeans_refine_centroids(
    df: DataFrame,
    n_cells: int = 16,
    iters: int = 1,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed_cents: list | None = None,
) -> list:
    """Distributed Lloyd iterations refining the IVF codebook.

    Seeds from the first ``n_cells`` vectors (deterministic, as
    ivf_ann_topk), then per iteration runs ONE job: an Arrow-batched
    kernel that assigns each row to its nearest centroid and emits
    per-cell ``(n, vec_sum)`` partials (<= n_cells rows per Arrow
    batch), which the driver merges and divides — the treeAggregate
    shape of large-scale k-means. No shuffle of vectors, no wide
    aggregation; the only cross-machine traffic is cells x dim partial
    sums. Multi-iteration runs persist the narrow vector projection so
    each Lloyd step re-reads cached columns, not parquet. Returns
    [(cid, [centroid floats])] sorted by cid.

    The refined codebook is a session-scoped INGEST ARTIFACT (r13,
    same contract as ``clustering.kmeans_centroids``): a pure
    deterministic function of (corpus, seeds, n_cells, iters), so it
    is memoized via ``cache_dataframe`` under a non-"query" prefix
    (the bench's artifact-build counter records every build). Keyed
    on analyzed-plan + input-file fingerprints + every training
    parameter + a seed fingerprint — a different corpus, file set,
    knob, or seed set retrains."""
    return _cached_model(
        df,
        ("ivf_refined_cents", n_cells, iters, dim, id_col, vec_col,
         _seed_fp(seed_cents)),
        lambda: _refine_centroids_uncached(
            df, n_cells, iters, id_col, vec_col, seed_cents
        ),
    )


def _seed_fp(seeds) -> str:
    """Stable fingerprint of an explicit seed list (or 'default')."""
    import hashlib as _hl

    if seeds is None:
        return "default"
    return _hl.md5(repr(seeds).encode()).hexdigest()


def _cached_model(df: DataFrame, key_tail: tuple, build):
    """Session-scoped memo for trained model artifacts (IVF/PQ
    codebooks): key = analyzed-plan fingerprint + input-file
    fingerprint + the caller's parameter tail."""
    import hashlib as _hl

    from spark_eventhubs_spark.plans.hubview import cache_dataframe

    plan_fp = _hl.md5(
        df._jdf.queryExecution().analyzed().toString().encode()
    ).hexdigest()
    files_fp = _hl.md5("\x00".join(sorted(df.inputFiles())).encode()).hexdigest()
    return cache_dataframe(
        df.sparkSession, key_tail[:1] + (plan_fp, files_fp) + key_tail[1:], build
    )


def _refine_centroids_uncached(
    df: DataFrame,
    n_cells: int,
    iters: int,
    id_col: str,
    vec_col: str,
    seed_cents: list | None,
) -> list:
    import numpy as np

    if seed_cents is not None:
        cents = list(seed_cents)
    else:
        rows = sorted(
            df.where(F.col(id_col) < n_cells)
            .select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec"))
            .collect(),
            key=lambda r: r["cid"],
        )
        cents = [(r["cid"], [float(x) for x in r["cvec"]]) for r in rows]
    base = df.select(F.col(vec_col))
    if iters > 1:
        base = base.persist()
    try:
        for _ in range(iters):
            partials = base.mapInPandas(
                _cell_partials_fn(cents, vec_col),
                schema="cid long, n long, s array<double>",
            ).collect()
            acc: dict = {}
            for r in partials:
                n, s = acc.get(r["cid"], (0, None))
                v = np.asarray(r["s"], dtype=np.float64)
                acc[r["cid"]] = (n + r["n"], v if s is None else s + v)
            # empty cells keep their previous centroid
            cents = [
                (cid, [float(x) for x in acc[cid][1] / acc[cid][0]])
                if cid in acc else (cid, cvec)
                for cid, cvec in cents
            ]
    finally:
        if iters > 1:
            base.unpersist()
    return cents


def ivf_ann_topk_refined(
    df: DataFrame,
    query_vec_id: int = 0,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    iters: int = 1,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN over a k-means-refined codebook: same probe/scan shape
    as :func:`ivf_ann_topk`, but cells come from
    :func:`kmeans_refine_centroids` — tighter cells, better recall at
    the same n_probe. Refined means are data-dependent floats, so no
    SQL oracle (rows-only check); recall is asserted in tests.

    The seed codebook and the query vector are fetched in ONE bounded
    collect (both are pushed-down point/range filters on the id
    column), so the whole operator runs iters + 2 jobs total."""
    import math

    rows = (
        df.where((F.col(id_col) < n_cells) | (F.col(id_col) == query_vec_id))
        .select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec"))
        .collect()
    )
    seeds = sorted(
        ((r["cid"], [float(x) for x in r["cvec"]]) for r in rows if r["cid"] < n_cells),
        key=lambda t: t[0],
    )
    qvec = next(
        ([float(x) for x in r["cvec"]] for r in rows if r["cid"] == query_vec_id),
        None,
    )
    if qvec is None:
        raise ValueError(
            f"ivf_ann_topk_refined: query vector {id_col}={query_vec_id} not found"
        )
    cents = kmeans_refine_centroids(
        df, n_cells, iters, dim, id_col, vec_col, seed_cents=seeds
    )

    def _dot_py(a, b):
        acc = 0.0
        for i in range(len(a)):
            acc = acc + a[i] * b[i]
        return acc

    def _cos_py(a, b):
        na, nb = math.sqrt(_dot_py(a, a)), math.sqrt(_dot_py(b, b))
        return _dot_py(a, b) / (na * nb) if na and nb else -2.0

    ranked = sorted(
        ((_cos_py(cvec, qvec), cid) for cid, cvec in cents),
        key=lambda t: (-t[0], t[1]),
    )
    probe_cids = [cid for _, cid in ranked[:n_probe]]
    scored = df.select(F.col(id_col), F.col(vec_col)).mapInPandas(
        _ivf_scan_fn(cents, probe_cids, qvec, query_vec_id, id_col, vec_col),
        schema=f"{id_col} long, score_e6 long",
    )
    return scored.orderBy(F.col("score_e6").desc(), F.col(id_col).asc()).limit(k)


def oracle_lsh_ann_topk(
    query_vec_id: int = 0, k: int = 10, n_planes: int = 8, dim: int = 64
) -> str:
    """DuckDB twin of :func:`lsh_ann_topk`: the hyperplane bucket
    assignment is deterministic (:func:`_oracle_bucket_expr` — literal
    weights, ordered folds), so even the "approximate" ANN is exactly
    reproducible — the approximation is in WHICH vectors get scored,
    not in any randomness."""
    return f"""WITH bkt AS (
  SELECT vec_id, CAST({_oracle_bucket_expr("embedding", n_planes, dim)} AS BIGINT) AS bucket
  FROM embeddings
), q AS (
  SELECT e.embedding AS qvec, b.bucket AS qbucket
  FROM embeddings e JOIN bkt b ON b.vec_id = e.vec_id
  WHERE e.vec_id = {query_vec_id}
)
SELECT e.vec_id,
  CAST(FLOOR({oracle_cosine("e.embedding", "q.qvec", dim)} * 1000000) AS BIGINT) AS score_e6
FROM embeddings e JOIN bkt b ON b.vec_id = e.vec_id, q
WHERE b.bucket = q.qbucket AND e.vec_id <> {query_vec_id}
ORDER BY score_e6 DESC, e.vec_id ASC
LIMIT {k}"""


# ---------------------------------------------------------------------
# IVF index on disk: cell_id as a partition column
# ---------------------------------------------------------------------


def _cell_write_partitioned(assigned: DataFrame, id_col: str) -> DataFrame:
    """Partitioning for the index write: shuffle on (cell_id, salt)
    instead of cell_id alone. A bare repartition(cell_id) funnels the
    ENTIRE corpus through |cells| writer tasks — at 100 TB, 16 tasks
    writing 100 TB. The deterministic id-derived salt spreads each
    cell across ~parallelism/|cells|+ writers; partitionBy still lays
    rows out under their cell_id dir (several files per cell, which
    parquet readers handle natively)."""
    spark = assigned.sparkSession
    n = spark.sparkContext.defaultParallelism
    salt = F.pmod(F.col(id_col), F.lit(max(n, 1)))
    return assigned.repartition(n, F.col("cell_id"), salt)


def ivf_build_index(
    df: DataFrame,
    index_dir: str,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    refine_iters: int = 0,
) -> list:
    """Materialize the IVF layout the scan-time operators only
    simulate: assign every vector to its nearest centroid and write
    the corpus as parquet PARTITIONED BY cell id, with the codebook
    alongside. This is the 100 TB serving path promised in
    :func:`ivf_ann_topk`'s scale note — a query then physically reads
    ``n_probe/n_cells`` of the data via Spark partition pruning
    instead of scanning everything and discarding.

    Centroids use the same deterministic seeding as
    :func:`ivf_ann_topk` (first ``n_cells`` vectors by id);
    ``refine_iters > 0`` runs that many Lloyd updates through
    ``operators.clustering.kmeans_centroids`` first — the
    INTEGER-SUM variant, so a rebuild on the same corpus produces the
    bit-identical codebook and cell layout regardless of input
    partitioning (a float-mean refine drifts in the last ulp and can
    flip boundary assignments between rebuilds). Assignment runs in
    the shared exact-arithmetic Arrow kernel, so an indexed query
    returns bit-identical scores to the scan-time operator. Returns
    the codebook as [(cid, centroid)].

    Scale: the write shuffles on (cell_id, salt) — NOT cell_id alone —
    via :func:`_cell_write_partitioned`: a bare repartition(cell_id)
    would funnel the whole corpus through |cells| writer tasks (16
    writers for 100 TB); the deterministic salt spreads each cell
    across ~parallelism/|cells| writers while partitionBy still lays
    rows out under their cell_id dir (several files per cell). The
    codebook is C rows. Rebuild = rerun; incremental append = assign +
    append into the same partitioned layout.
    """
    if refine_iters > 0:
        # function-level import: clustering imports this module.
        # kmeans_centroids collects its own seeds, so the unrefined
        # seed collect below would be a wasted driver job here.
        from spark_eventhubs_spark.operators.clustering import kmeans_centroids

        cents = kmeans_centroids(
            df, k=n_cells, iters=refine_iters, id_col=id_col, vec_col=vec_col
        )
    else:
        cent_rows = sorted(
            df.where(F.col(id_col) < n_cells)
            .select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec"))
            .collect(),
            key=lambda r: r["cid"],
        )
        cents = [(int(r["cid"]), [float(x) for x in r["cvec"]]) for r in cent_rows]

    import numpy as np

    C = [np.asarray(v, dtype=np.float64) for _, v in cents]
    cnorms = [_norm_py(v) for _, v in cents]
    cids_arr = [cid for cid, _ in cents]

    def _assign(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            rn = np.sqrt(np.cumsum(X * X, axis=1)[:, -1])
            S = np.empty((X.shape[0], len(C)), dtype=np.float64)
            for j, c in enumerate(C):
                S[:, j] = _seq_dot_np(X, c) / (rn * cnorms[j])
            out = pdf[[id_col, vec_col]].copy()
            out["cell_id"] = np.asarray(cids_arr, dtype=np.int64)[
                np.argmax(S, axis=1)
            ]
            yield out

    assigned = df.select(id_col, vec_col).mapInPandas(
        _assign, f"{id_col} long, {vec_col} array<float>, cell_id long"
    )
    (
        _cell_write_partitioned(assigned, id_col)
        .write.mode("overwrite")
        .partitionBy("cell_id")
        .parquet(f"{index_dir}/vectors")
    )
    spark = df.sparkSession
    spark.createDataFrame(
        [(cid, vec) for cid, vec in cents], f"cid long, cvec array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(f"{index_dir}/codebook")
    return cents


def ivf_query_indexed(
    spark,
    index_dir: str,
    qvec: list,
    k: int = 10,
    n_probe: int = 4,
    exclude_id: int = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k cosine over an :func:`ivf_build_index` layout: rank probe
    cells driver-side against the C-row codebook, then scan ONLY those
    cells — ``cell_id`` is a hive partition column, so Catalyst prunes
    the rest at planning time (assert via PartitionFilters in the
    plan; at 100 TB this is the difference between reading 25% and
    100% of the corpus). Scoring reuses the exact sequential-fold
    kernel, so results are bit-identical to :func:`ivf_ann_topk` over
    the same data."""
    import math

    import numpy as np

    cents = [
        (int(r["cid"]), [float(x) for x in r["cvec"]])
        for r in spark.read.parquet(f"{index_dir}/codebook").collect()
    ]
    qv = [float(x) for x in qvec]

    def _dot_py(a, b):
        acc = 0.0
        for i in range(len(a)):
            acc = acc + a[i] * b[i]
        return acc

    def _cos_py(a, b):
        na, nb = math.sqrt(_dot_py(a, a)), math.sqrt(_dot_py(b, b))
        return _dot_py(a, b) / (na * nb) if na and nb else -2.0

    ranked = sorted(
        ((_cos_py(cvec, qv), cid) for cid, cvec in cents),
        key=lambda t: (-t[0], t[1]),
    )
    probe_cids = [cid for _, cid in ranked[:n_probe]]

    qarr = np.asarray(qv, dtype=np.float64)
    qn = _norm_py(qv)

    def _score(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy()
            X = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            rn = np.sqrt(np.cumsum(X * X, axis=1)[:, -1])
            s = _seq_dot_np(X, qarr) / (rn * qn)
            yield pd.DataFrame(
                {id_col: ids, "score_e6": np.floor(s * 1e6).astype(np.int64)}
            )

    scan = spark.read.parquet(f"{index_dir}/vectors").where(
        F.col("cell_id").isin(probe_cids)
    )
    if exclude_id is not None:
        scan = scan.where(F.col(id_col) != exclude_id)
    scored = scan.select(id_col, vec_col).mapInPandas(
        _score, f"{id_col} long, score_e6 long"
    )
    return scored.orderBy(F.col("score_e6").desc(), F.col(id_col).asc()).limit(k)


def ivf_append_index(
    df: DataFrame,
    index_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Incrementally add vectors to an existing :func:`ivf_build_index`
    layout: assign against the SAVED codebook (no reseeding — cell
    semantics stay stable, so old and new vectors are comparable) and
    append into the same cell_id partitions. The steady-state ingest
    path: each micro-batch/backfill appends its assignments; queries
    see the union immediately; rebuild with :func:`ivf_build_index`
    only when the codebook itself should move."""
    import numpy as np

    spark = df.sparkSession
    cents = [
        (int(r["cid"]), [float(x) for x in r["cvec"]])
        for r in spark.read.parquet(f"{index_dir}/codebook").collect()
    ]
    cents.sort(key=lambda t: t[0])
    C = [np.asarray(v, dtype=np.float64) for _, v in cents]
    cnorms = [_norm_py(v) for _, v in cents]
    cids_arr = [cid for cid, _ in cents]

    def _assign(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            rn = np.sqrt(np.cumsum(X * X, axis=1)[:, -1])
            S = np.empty((X.shape[0], len(C)), dtype=np.float64)
            for j, c in enumerate(C):
                S[:, j] = _seq_dot_np(X, c) / (rn * cnorms[j])
            out = pdf[[id_col, vec_col]].copy()
            out["cell_id"] = np.asarray(cids_arr, dtype=np.int64)[
                np.argmax(S, axis=1)
            ]
            yield out

    assigned = df.select(id_col, vec_col).mapInPandas(
        _assign, f"{id_col} long, {vec_col} array<float>, cell_id long"
    )
    (
        _cell_write_partitioned(assigned, id_col)
        .write.mode("append")
        .partitionBy("cell_id")
        .parquet(f"{index_dir}/vectors")
    )


# ---- product quantization (PQ) ----

PQ_M = 16          # subspaces (dim 64 -> 4 floats each)
PQ_NCENT = 16      # centroids per subspace (4-bit codes)
PQ_SHORTLIST = 100 # ADC shortlist size before exact re-rank


def _pq_partials_fn(codebooks, vec_col):
    """mapInPandas kernel for PQ training: per Arrow batch, assign every
    row's m subvectors to their nearest (L2) subspace centroid and emit
    per-(subspace, centroid) ``(n, sum_vec)`` partials — the same
    driver-merge treeAggregate shape as :func:`_cell_partials_fn`, so
    one job trains all m codebooks simultaneously. Output is bounded by
    m * n_centroids rows per batch."""
    import numpy as np

    CBS = [np.asarray(cb, dtype=np.float64) for cb in codebooks]
    m = len(CBS)

    def fn(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            d_sub = X.shape[1] // m
            out_s, out_c, out_n, out_sum = [], [], [], []
            for s in range(m):
                Xs = X[:, s * d_sub:(s + 1) * d_sub]
                d2 = ((Xs[:, None, :] - CBS[s][None, :, :]) ** 2).sum(axis=2)
                a = d2.argmin(axis=1)  # ties -> lowest centroid id
                for c in np.unique(a):
                    mask = a == c
                    out_s.append(s)
                    out_c.append(int(c))
                    out_n.append(int(mask.sum()))
                    out_sum.append(Xs[mask].sum(axis=0))
            yield pd.DataFrame({"s": out_s, "c": out_c, "n": out_n, "v": out_sum})

    return fn


def pq_train(
    df: DataFrame,
    m: int = PQ_M,
    n_centroids: int = PQ_NCENT,
    iters: int = 1,
    dim: int = DIM,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed_rows: list | None = None,
) -> list:
    """Train PQ codebooks: split each vector into ``m`` subvectors and
    run per-subspace k-means, all subspaces in ONE distributed pass per
    Lloyd iteration (the :func:`_pq_partials_fn` kernel + driver
    merge). Seeds are the first ``n_centroids`` vectors' subvectors
    (deterministic). Returns ``codebooks[m][n_centroids][dim//m]``.

    Scale: identical properties to :func:`kmeans_refine_centroids` —
    no vector shuffle, per-iteration traffic is m * n_centroids *
    (dim/m) partial sums = dim * n_centroids doubles total.

    The trained codebooks are a session-scoped INGEST ARTIFACT (r13,
    same contract as ``clustering.kmeans_centroids``), memoized via
    ``cache_dataframe`` keyed on analyzed-plan + input-file
    fingerprints + every training parameter + a seed fingerprint;
    the bench's artifact-build counter records every build."""
    seed_key = _seed_fp(
        None if seed_rows is None
        else [(r["cid"], tuple(float(x) for x in r["cvec"])) for r in seed_rows]
    )
    return _cached_model(
        df,
        ("pq_codebooks", m, n_centroids, iters, dim, id_col, vec_col, seed_key),
        lambda: _pq_train_uncached(
            df, m, n_centroids, iters, dim, id_col, vec_col, seed_rows
        ),
    )


def _pq_train_uncached(
    df: DataFrame,
    m: int,
    n_centroids: int,
    iters: int,
    dim: int,
    id_col: str,
    vec_col: str,
    seed_rows: list | None,
) -> list:
    import numpy as np

    if seed_rows is None:
        seed_rows = sorted(
            df.where(F.col(id_col) < n_centroids)
            .select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec"))
            .collect(),
            key=lambda r: r["cid"],
        )
    d_sub = dim // m
    seeds = np.stack([np.asarray(r["cvec"], dtype=np.float64) for r in seed_rows])
    codebooks = [seeds[:, s * d_sub:(s + 1) * d_sub].copy() for s in range(m)]
    base = df.select(F.col(vec_col))
    if iters > 1:
        base = base.persist()
    try:
        for _ in range(iters):
            partials = base.mapInPandas(
                _pq_partials_fn(codebooks, vec_col),
                schema="s long, c long, n long, v array<double>",
            ).collect()
            acc: dict = {}
            for r in partials:
                key = (r["s"], r["c"])
                n, v = acc.get(key, (0, None))
                vv = np.asarray(r["v"], dtype=np.float64)
                acc[key] = (n + r["n"], vv if v is None else v + vv)
            for (s, c), (n, v) in acc.items():
                codebooks[s][c] = v / n  # empty cells keep their seed
    finally:
        if iters > 1:
            base.unpersist()
    return [cb.tolist() for cb in codebooks]


def _pq_adc_fn(codebooks, qvec, query_vec_id, id_col, vec_col):
    """mapInPandas kernel: encode each row (nearest subspace centroids)
    and score it against the query via asymmetric distance computation
    — two lookup tables per subspace (centroid·q_sub dots and centroid
    norms²), so the cosine against the RECONSTRUCTION costs m table
    lookups per row, never a dim-wide dot. |recon|² = sum of subspace
    centroid norms² exactly (concatenation), which is what makes the
    LUT trick lossless vs scoring the reconstruction directly."""
    import numpy as np

    CBS = [np.asarray(cb, dtype=np.float64) for cb in codebooks]
    m = len(CBS)
    qv = np.asarray(qvec, dtype=np.float64)
    qn = _norm_py(qvec)

    def fn(batches):
        import pandas as pd

        d_sub = len(qv) // m
        lut_dot = [CBS[s] @ qv[s * d_sub:(s + 1) * d_sub] for s in range(m)]
        lut_n2 = [(CBS[s] ** 2).sum(axis=1) for s in range(m)]
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            dots = np.zeros(len(X))
            n2 = np.zeros(len(X))
            for s in range(m):
                Xs = X[:, s * d_sub:(s + 1) * d_sub]
                d2 = ((Xs[:, None, :] - CBS[s][None, :, :]) ** 2).sum(axis=2)
                code = d2.argmin(axis=1)
                dots += lut_dot[s][code]
                n2 += lut_n2[s][code]
            rn = np.sqrt(n2)
            score = np.where(rn > 0, dots / np.where(rn > 0, rn * qn, 1.0), -2.0)
            keep = pdf[id_col].to_numpy() != query_vec_id
            yield pd.DataFrame({
                id_col: pdf[id_col].to_numpy()[keep],
                "adc_e6": np.floor(score[keep] * 1e6).astype(np.int64),
            })

    return fn


def pq_topk_rerank(
    df: DataFrame,
    query_vec_id: int = 0,
    k: int = 10,
    shortlist: int = PQ_SHORTLIST,
    m: int = PQ_M,
    n_centroids: int = PQ_NCENT,
    iters: int = 1,
    dim: int = DIM,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ-compressed ANN with exact re-rank: train codebooks, score the
    whole corpus by ADC lookups (the compressed-domain pass — at scale
    this reads m-byte codes, not dim*4-byte vectors), take a
    ``shortlist`` of candidates, then re-rank ONLY the shortlist with
    exact cosine and return the top ``k``.

    This is the standard PQ serving architecture (shortlist quality is
    what matters, not raw PQ recall); exact scores come from the same
    sequential-fold arithmetic as :func:`brute_force_topk`, so the
    returned score_e6 values are directly comparable to brute force.
    Scale: codebook + query in task closures (no join), shortlist is a
    TakeOrdered of integer scores, re-rank touches ``shortlist`` rows."""
    rows = (
        df.where((F.col(id_col) < n_centroids) | (F.col(id_col) == query_vec_id))
        .select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec"))
        .collect()
    )
    seeds = sorted((r for r in rows if r["cid"] < n_centroids), key=lambda r: r["cid"])
    qvec = next(
        ([float(x) for x in r["cvec"]] for r in rows if r["cid"] == query_vec_id),
        None,
    )
    if qvec is None:
        raise ValueError(
            f"pq_topk_rerank: query vector {id_col}={query_vec_id} not found"
        )
    codebooks = pq_train(
        df, m, n_centroids, iters, dim, id_col, vec_col, seed_rows=seeds
    )
    adc = df.select(F.col(id_col), F.col(vec_col)).mapInPandas(
        _pq_adc_fn(codebooks, qvec, query_vec_id, id_col, vec_col),
        schema=f"{id_col} long, adc_e6 long",
    )
    short = (
        adc.orderBy(F.col("adc_e6").desc(), F.col(id_col).asc())
        .limit(shortlist)
        .select(id_col)
    )
    qcol = F.array(*[F.lit(float(x)) for x in qvec])
    rerank = (
        df.join(F.broadcast(short), id_col, "semi")
        .select(
            F.col(id_col),
            F.floor(cosine_col(F.col(vec_col), qcol, dim) * F.lit(1e6))
            .cast("long")
            .alias("score_e6"),
        )
    )
    return rerank.orderBy(F.col("score_e6").desc(), F.col(id_col).asc()).limit(k)


# ---------------------------------------------------------------------
# Matryoshka (prefix-dimension) two-stage retrieval
# ---------------------------------------------------------------------

MRL_PREFIX_DIM = 16
MRL_SHORTLIST = 50


def mrl_rerank_topk(
    df: DataFrame,
    query_vec_id: int = 0,
    k: int = 10,
    prefix_dim: int = MRL_PREFIX_DIM,
    shortlist: int = MRL_SHORTLIST,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Matryoshka-representation two-stage ANN: rank every vector by
    cosine over its first ``prefix_dim`` dimensions (4x less math and
    4x less I/O when the prefix is stored column-separate), take a
    ``shortlist``, then re-rank the shortlist by full-dimension cosine
    and return the top ``k``. Both stages are exact arithmetic over
    deterministic candidate sets, so the whole two-stage pipeline has
    a SQL oracle.

    Scale: stage 1 is a narrow scan + TakeOrdered (partition-
    incremental, no global sort); stage 2 touches ``shortlist`` rows.
    With MRL-trained embeddings the prefix is a faithful coarse score;
    here it demonstrates the plumbing on the synthetic vectors."""
    q = df.where(F.col(id_col) == query_vec_id).select(
        F.col(vec_col).alias("qvec")
    )
    pref = lambda c: F.slice(c, 1, prefix_dim)  # noqa: E731
    stage1 = (
        df.where(F.col(id_col) != query_vec_id)
        .join(F.broadcast(q))
        .select(
            F.col(id_col),
            F.col(vec_col),
            F.col("qvec"),
            F.floor(
                cosine_col(pref(F.col(vec_col)), pref(F.col("qvec"))) * 1e6
            ).cast("long").alias("prefix_e6"),
        )
        .orderBy(F.col("prefix_e6").desc(), F.col(id_col).asc())
        .limit(shortlist)
    )
    return (
        stage1.select(
            F.col(id_col),
            "prefix_e6",
            F.floor(cosine_col(F.col(vec_col), F.col("qvec")) * 1e6)
            .cast("long").alias("score_e6"),
        )
        .orderBy(F.col("score_e6").desc(), F.col(id_col).asc())
        .limit(k)
    )


def oracle_mrl_rerank_topk(
    query_vec_id: int = 0,
    k: int = 10,
    prefix_dim: int = MRL_PREFIX_DIM,
    shortlist: int = MRL_SHORTLIST,
) -> str:
    pcos = oracle_cosine("embedding", "qvec", dim=prefix_dim)
    fcos = oracle_cosine("embedding", "qvec")
    return f"""WITH q AS (
  SELECT embedding AS qvec FROM embeddings WHERE vec_id = {query_vec_id}
), s1 AS (
  SELECT vec_id, embedding, qvec,
    CAST(FLOOR({pcos} * 1000000) AS BIGINT) AS prefix_e6
  FROM embeddings, q
  WHERE vec_id <> {query_vec_id}
  ORDER BY prefix_e6 DESC, vec_id ASC
  LIMIT {shortlist}
)
SELECT vec_id, prefix_e6,
  CAST(FLOOR({fcos} * 1000000) AS BIGINT) AS score_e6
FROM s1
ORDER BY score_e6 DESC, vec_id ASC
LIMIT {k}"""
