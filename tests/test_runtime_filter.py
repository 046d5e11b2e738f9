"""Runtime bloom-filter pruning (operators/runtime_filter.py).

The contract that makes the pruned join exact: pruning keeps a
SUPERSET of the truly-matching probe rows (bloom one-sided error), so
the exact join after pruning returns exactly the unpruned result.
"""

from pyspark.sql import functions as F

from spark_eventhubs_spark.operators import runtime_filter as RF


def _build_probe(spark):
    # build keys: multiples of 10 in [0, 1000) -> 100 keys
    build = spark.range(0, 1000, 10).select(F.col("id").alias("k"))
    probe = spark.range(0, 1000).select(F.col("id").alias("k"))
    return build, probe


def test_positions_bounded_by_num_bits_and_build_size(spark):
    build, _ = _build_probe(spark)
    # tiny universe: positions can never exceed num_bits
    tiny = RF.bloom_positions(build, "k", num_bits=64)
    assert tiny.count() <= 64
    # large universe: positions bounded by k * |build|
    wide = RF.bloom_positions(build, "k", num_bits=1 << 20)
    n = wide.count()
    assert n <= len(RF.DEFAULT_SEEDS) * 100
    assert n > 0
    # distinct: no duplicate positions
    assert wide.distinct().count() == n


def test_prune_is_superset_of_matches_and_join_is_exact(spark):
    build, probe = _build_probe(spark)
    # small num_bits on purpose so false positives actually occur
    pos = RF.bloom_positions(build, "k", num_bits=512)
    pruned = RF.bloom_prune(probe, "k", pos, num_bits=512)
    kept = {r.k for r in pruned.collect()}
    true_keys = set(range(0, 1000, 10))
    assert true_keys <= kept            # no false negatives, ever
    assert len(kept) < 1000             # but it did prune something
    # exact join after pruning == exact join without pruning
    exact = sorted(r.k for r in probe.join(build, "k").collect())
    via_bloom = sorted(r.k for r in pruned.join(build, "k").collect())
    assert via_bloom == exact


def test_prune_effectiveness_at_default_width(spark):
    """With the default 2^20-bit universe and 100 build keys the FPR
    is ~(k*n/m)^k ~ 4e-8 per probe, so of 900 non-matching probe rows
    essentially none survive."""
    build, probe = _build_probe(spark)
    pos = RF.bloom_positions(build, "k")
    kept = RF.bloom_prune(probe, "k", pos).count()
    assert 100 <= kept <= 105


def test_mismatched_params_would_not_underprune(spark):
    """Sanity: pruning with the same seeds/width used at build time is
    what the helper defaults enforce; a caller passing a different
    num_bits gets a (possibly empty) arbitrary filter, so the entry
    point keeps both sides on the shared defaults."""
    build, probe = _build_probe(spark)
    pos = RF.bloom_positions(build, "k")  # default width
    pruned = RF.bloom_prune(probe, "k", pos)  # same defaults
    # all true matches survive under matched params
    assert pruned.join(build, "k").count() == 100
