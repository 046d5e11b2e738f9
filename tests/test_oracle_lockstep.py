"""Engine/oracle LOCKSTEP at corpus sizes where the auto-derived
parameters leave their oracle-pinned floors (round-9 ADVICE): past
2048 vectors ``auto_n_planes`` resolves to 9+ and semdedup's auto-k
grows past KMEANS_K, so a statically-pinned SQL twin would compute a
DIFFERENT bucket/cluster set and the correctness gate could never
pass there. The dynamic oracles derive the width/k from the same
COUNT(*) the engine counts; these tests pin the two sides byte-equal
on a corpus big enough that the divergence would bite."""

import numpy as np
import pandas as pd
import pytest

from spark_eventhubs_spark.operators import clustering as CL
from spark_eventhubs_spark.operators import similarity as S

N_BIG = 2600  # > PAIRWISE_TARGET_BUCKET * 2^8 = 2048 -> auto width 9
DIM = 64


def _big_vecs():
    rng = np.random.RandomState(20260815)
    X = rng.normal(size=(N_BIG, DIM)).astype(np.float32)
    # plant near-duplicates so the threshold filter keeps real pairs
    for i in range(0, 200, 2):
        X[i + 1] = X[i] + rng.normal(scale=0.01, size=DIM).astype(np.float32)
    return X


@pytest.fixture(scope="module")
def big_corpus(spark):
    X = _big_vecs()
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(N_BIG)],
        "vec_id long, embedding array<float>",
    ).localCheckpoint(eager=True)
    import duckdb

    con = duckdb.connect()
    con.register(
        "embeddings",
        pd.DataFrame({"vec_id": list(range(N_BIG)), "embedding": list(X)}),
    )
    return df, con


def test_auto_planes_sql_parity_sweep():
    """The SQL twin's CEIL(LOG2((n + t-1) // t)) must equal the
    engine's integer bit_length form for every n — swept across the
    power-of-two boundaries where a float log could misround."""
    import duckdb

    con = duckdb.connect()
    probes = [1, 7, 8, 9, 500, 2000]
    for k in range(8, 24):
        probes += [8 * (1 << k) - 1, 8 * (1 << k), 8 * (1 << k) + 1]
    rows = con.sql(
        "SELECT n, GREATEST(8, CAST(CEIL(LOG2(GREATEST((n + 7) // 8, 1)))"
        " AS BIGINT)) FROM (SELECT UNNEST(?) AS n)",
        params=[probes],
    ).fetchall()
    for n, sql_planes in rows:
        assert sql_planes == S.auto_n_planes(n), n


def test_pairwise_auto_width_lockstep_past_2048(big_corpus):
    """Engine auto path (width 9 here) vs the dynamic DuckDB oracle:
    identical pair sets. A pinned-8 oracle provably diverges on this
    corpus (different bucket partition => different candidate set),
    which the control assertion pins."""
    df, con = big_corpus
    assert S.auto_n_planes(N_BIG) == 9  # the divergence regime is live
    got = sorted(
        (r["vec_a"], r["vec_b"], r["score_e6"])
        for r in S.pairwise_above_threshold(
            df, threshold_e6=950_000
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in con.sql(
            S.oracle_pairwise_above_threshold(
                threshold_e6=950_000, n_planes=None
            )
        ).fetchall()
    )
    assert got == want and len(got) > 50
    # control: the statically-pinned-8 twin is NOT a valid oracle here
    pinned = sorted(
        tuple(r)
        for r in con.sql(
            S.oracle_pairwise_above_threshold(
                threshold_e6=950_000, n_planes=8
            )
        ).fetchall()
    )
    assert pinned != got


def test_semdedup_auto_k_lockstep_past_floor(big_corpus):
    """Engine auto-k (ceil(2600/250) = 11 > KMEANS_K) vs the dynamic
    DuckDB oracle: identical (vec_id, cluster_id, n_dups, keep)."""
    df, con = big_corpus
    got = sorted(
        (r["vec_id"], r["cluster_id"], r["n_dups"], r["keep"])
        for r in CL.semdedup(df, tau_e6=950_000).collect()
    )
    want = sorted(
        tuple(r)
        for r in con.sql(
            CL.oracle_semdedup(k=None, tau_e6=950_000)
        ).fetchall()
    )
    assert got == want and len(got) == N_BIG
    # the auto regime is live: more clusters than the static floor
    assert len({c for _, c, _, _ in got}) > CL.KMEANS_K
