"""Runtime bloom-filter join pruning, composed from JVM expressions.

The reference connector delegates join strategy entirely to Spark
(SURVEY §4.1); at 100 TB the decisive optimization for a selective
fact⋈fact join is a *runtime filter*: build a compact membership
sketch of the small (filtered) side's join keys and prune the probe
side BEFORE its shuffle. Spark's own injected bloom filter
(``spark.sql.optimizer.runtime.bloomFilter.enabled``) does this
JVM-internally but exposes no SQL/Python surface, so this module
re-expresses the same topology with public DataFrame ops only:

- ``bloom_positions``: the build side's keys are hashed ``k`` ways
  (``xxhash64`` with distinct seeds, JVM-side) onto a fixed universe
  of ``num_bits`` positions, and the *distinct occupied positions*
  become a one-column DataFrame. Its size is bounded by the constant
  ``min(k·|build|, num_bits)`` — at any scale factor it never exceeds
  ``num_bits`` rows (default 2^20 ≈ 8 MB of longs), which is why the
  broadcast hint on it is size-safe where a hint on the sf-linear
  build side itself would not be.
- ``bloom_prune``: the probe side keeps a row only if ALL ``k`` of
  its hash positions are occupied — ``k`` chained broadcast LEFT SEMI
  joins against the same positions frame (Spark reuses the broadcast
  exchange). False positives are possible (classic bloom semantics),
  false negatives are not, so following with the exact join yields
  exactly the unpruned result while the probe side's shuffle input
  shrinks by roughly the build side's selectivity.

Everything stays inside whole-stage codegen: hashing, pmod, and the
semi-joins are JVM expressions; no Python touches the hot path.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_NUM_BITS = 1 << 20
DEFAULT_SEEDS = (0x9E3779B9, 0x85EBCA6B)


def _position(key: Column, seed: int, num_bits: int) -> Column:
    """Bloom position of ``key`` under ``seed``: non-negative
    ``xxhash64(key, seed) mod num_bits`` (pmod keeps it in range for
    negative hashes)."""
    return F.pmod(F.xxhash64(key, F.lit(seed)), F.lit(num_bits))


def bloom_positions(
    build: DataFrame,
    key: str,
    num_bits: int = DEFAULT_NUM_BITS,
    seeds: Sequence[int] = DEFAULT_SEEDS,
) -> DataFrame:
    """Distinct occupied bloom positions of ``build[key]``.

    One scan of the build side: each key explodes into its ``k``
    positions, then a distinct bounded by ``num_bits`` rows. The
    output column is ``pos`` (long).
    """
    pos_cols = [_position(F.col(key), s, num_bits) for s in seeds]
    return (
        build.select(F.explode(F.array(*pos_cols)).alias("pos"))
        .distinct()
    )


def bloom_prune(
    probe: DataFrame,
    probe_key: str,
    positions: DataFrame,
    num_bits: int = DEFAULT_NUM_BITS,
    seeds: Sequence[int] = DEFAULT_SEEDS,
) -> DataFrame:
    """Rows of ``probe`` whose key hits ALL ``k`` bloom positions.

    Superset of the rows whose key is genuinely present on the build
    side (one-sided error), so `bloom_prune(...).join(build, ...)`
    equals the unpruned exact join. ``num_bits``/``seeds`` must match
    the ``bloom_positions`` call that produced ``positions``.

    The broadcast hint is size-safe: ``positions`` is bounded by the
    constant ``num_bits`` regardless of scale factor.
    """
    pruned = probe
    for s in seeds:
        pruned = pruned.join(
            F.broadcast(positions),
            _position(F.col(probe_key), s, num_bits) == positions["pos"],
            "left_semi",
        )
    return pruned
