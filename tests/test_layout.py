"""Z-order layout (spark_eventhubs_spark/layout.py): Morton-key
correctness, ingest idempotency, and the actual pruning win over a
single-dimension (time-sorted) layout."""

import os

import pytest

from tests.conftest import SF_DIR

from spark_eventhubs_spark import layout as L
from pyspark.sql import functions as F


def test_zvalue_matches_python_reference(spark):
    df = spark.createDataFrame(
        [(a, b) for a in [0, 1, 5, 127, 255, 40_000] for b in [0, 3, 17, 255]],
        "a long, b long",
    )
    got = df.select("a", "b", L.zvalue(F.col("a"), F.col("b")).alias("z")).collect()
    for r in got:
        assert r["z"] == L.zvalue_py(r["a"], r["b"])


def test_zvalue_rejects_bad_bits(spark):
    with pytest.raises(ValueError):
        L.zvalue(F.lit(1), F.lit(2), bits=40)


def test_ensure_zordered_idempotent_and_complete(spark):
    p1 = L.ensure_zordered(spark, SF_DIR)
    p2 = L.ensure_zordered(spark, SF_DIR)
    assert p1 == p2
    n = spark.read.parquet(p1).count()
    raw = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    assert n == raw


def test_zorder_prunes_both_dimensions(spark, tmp_path):
    """The point of the layout: a time-sorted write prunes nothing for
    a user-range predicate (every slab spans all users), while the
    z-order keeps a bounded per-file box in BOTH dimensions — it
    prunes files for a user-only slice AND for a day-only slice.
    (sf0.001 domain: 15 users, 30 days.)"""
    zpath = L.ensure_zordered(spark, SF_DIR)
    tpath = str(tmp_path / "time_sorted")
    df = L._events_with_day_idx(spark, SF_DIR)
    (
        df.repartitionByRange(L.DEFAULT_Z_FILES, "day_idx", "event_id")
        .sortWithinPartitions("day_idx", "event_id")
        .write.mode("overwrite").parquet(tpath)
    )
    nf = L.DEFAULT_Z_FILES
    # user-heavy slice: time-sort reads EVERYTHING, z-order skips files
    zn, zo_u = L.file_overlap_count(zpath, (4, 6), (0, 10_000))
    tn, to_u = L.file_overlap_count(tpath, (4, 6), (0, 10_000))
    assert zn == tn == nf
    assert to_u == nf          # slabs: no pruning on the second dimension
    assert zo_u < nf, zo_u     # z: real pruning on the same predicate
    # day-heavy slice: z-order still prunes (bounded box per file)
    _, zo_d = L.file_overlap_count(zpath, (0, 10_000), (10, 13))
    assert zo_d < nf, zo_d
    # and the slice result is layout-independent
    base = df.where(F.col("user_id").between(4, 6)).count()
    for path in (zpath, tpath):
        got = (
            spark.read.parquet(path)
            .where(F.col("user_id").between(4, 6))
            .count()
        )
        assert got == base


def test_zorder_scan_pushes_filters(spark):
    """Spark's parquet scan over the layout must receive both range
    predicates as PushedFilters (row-group stats pruning)."""
    import io
    from contextlib import redirect_stdout

    from spark_eventhubs_spark import queries as Q

    df = Q._QUERIES["layout_zorder_scan"](spark, SF_DIR)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(user_id,40)" in plan
    assert "LessThanOrEqual(day_idx,19)" in plan


def test_zvalue_roundtrips_by_property():
    """Property: de-interleaving the Morton key recovers both masked
    inputs exactly, for arbitrary values (inputs beyond the bit budget
    are masked, never folded)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    def deinterleave(z, bits):
        a = b = 0
        for i in range(bits):
            a |= ((z >> (2 * i)) & 1) << i
            b |= ((z >> (2 * i + 1)) & 1) << i
        return a, b

    @settings(max_examples=200, deadline=None)
    @given(
        st.integers(min_value=0, max_value=2**40),
        st.integers(min_value=0, max_value=2**40),
        st.integers(min_value=1, max_value=31),
    )
    def check(a, b, bits):
        mask = (1 << bits) - 1
        z = L.zvalue_py(a, b, bits)
        assert deinterleave(z, bits) == (a & mask, b & mask)
        assert 0 <= z < 1 << (2 * bits)

    check()


def test_compact_files_merges_without_shuffle(spark, tmp_path):
    """compact_files: many tiny files -> byte-targeted few, identical
    row multiset, and a shuffle-free (coalesce) plan."""
    from spark_eventhubs_spark import layout as L

    src, dst = str(tmp_path / "small"), str(tmp_path / "compacted")
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    ev.repartition(40).write.parquet(src)  # simulate a sink's tiny files
    assert L.parquet_file_count(src) == 40

    total = L.parquet_bytes(src)
    n_out = L.compact_files(spark, src, dst, target_bytes=total // 3)
    assert n_out <= 4  # ceil(total / (total//3)) with fs slack
    assert n_out < 40
    # multiset equality via count + per-type counts
    a = spark.read.parquet(src).groupBy("event_type").count().collect()
    b = spark.read.parquet(dst).groupBy("event_type").count().collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # the compaction plan itself is narrow — no Exchange
    plan = (
        spark.read.parquet(src).coalesce(3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_compact_hive_partitions_preserves_layout(spark, tmp_path):
    from spark_eventhubs_spark import layout as L

    src, dst = str(tmp_path / "hsmall"), str(tmp_path / "hcompacted")
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    ev.withColumn("et", F.col("event_type")).repartition(10).write.partitionBy(
        "et"
    ).parquet(src)
    before = L.parquet_file_count(src)
    assert before >= 30  # ~10 files per partition value
    L.compact_hive_partitions(spark, src, dst, target_bytes=1 << 30)
    # one file per partition dir at a huge target
    parts = [d for d in sorted(os.listdir(dst)) if d.startswith("et=")]
    assert len(parts) == 5
    for d in parts:
        assert L.parquet_file_count(os.path.join(dst, d)) == 1
    a = spark.read.parquet(src).count()
    b = spark.read.parquet(dst).count()
    assert a == b
