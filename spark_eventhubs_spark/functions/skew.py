"""Skew mitigation: deterministic two-phase (salted) aggregation.

A hot grouping key turns a one-shuffle aggregation into a straggler:
one reducer gets the whole key. The standard fix is salting — shard
each key into n_salt sub-groups, partially aggregate, then merge the
shards. This module implements it for the algebraic aggregates
(sum / count / min / max), which re-aggregate losslessly, so results
are IDENTICAL to the direct groupBy (pinned by tests and by the
hub_salted_user_counts oracle entry).

The salt is derived from existing columns (pmod of a hash), NOT
rand(): plans stay deterministic and replayable — a streaming retry or
an AQE re-plan re-produces the same shards.

Note Spark's own AQE skew handling (skewJoin, rebalance) covers joins
and partition sizing; salted AGGREGATION is still a user-level pattern
when a single group exceeds one task's memory.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALT = 16

# merge function per algebraic aggregate: how shard results combine
_MERGEABLE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: Sequence[tuple],
    salt_col: Column,
    n_salt: int = DEFAULT_SALT,
) -> DataFrame:
    """Two-phase aggregation: ``aggs`` is a list of
    (kind, column_expr, alias) with kind in sum|count|min|max.

    Phase 1 groups by (keys + salt) and computes the partial
    aggregate; phase 2 merges shards per key. The phase-1 shuffle
    spreads each hot key over ``n_salt`` reducers.
    """
    salt = F.pmod(F.hash(salt_col), F.lit(n_salt)).alias("_salt")
    phase1_aggs = []
    for kind, col, alias in aggs:
        if kind not in _MERGEABLE:
            raise ValueError(f"non-algebraic aggregate {kind!r} cannot be salted")
        fn = F.count if kind == "count" else _MERGEABLE[kind]
        phase1_aggs.append(fn(col).alias(alias))
    phase1 = df.groupBy(*keys, salt).agg(*phase1_aggs)
    phase2_aggs = [
        _MERGEABLE[kind](F.col(alias)).alias(alias) for kind, _, alias in aggs
    ]
    return phase1.groupBy(*keys).agg(*phase2_aggs)
