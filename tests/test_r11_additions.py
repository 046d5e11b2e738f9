"""Unit semantics for the second batch of round-11 additions:
source novelty, the Jaccard threshold curve, the point-in-time SCD2
join, and the partition drift audit. The catalog oracles pin
full-corpus parity; these pin hand-checkable semantics on tiny
inputs."""

from pyspark.sql import functions as F

from spark_eventhubs_spark.operators import corpus as C
from spark_eventhubs_spark.operators import dedup as D


def test_source_novelty_first_occurrence_ownership(spark):
    # token "x" first appears in doc 1 (src_a); "y" in doc 2 (src_b);
    # "z" only in doc 3 (src_a). src_b's vocab is {x, y} but it
    # introduces only "y".
    df = spark.createDataFrame(
        [
            (1, "x x", "src_a"),
            (2, "x y", "src_b"),
            (3, "z", "src_a"),
        ],
        "doc_id long, text string, source string",
    )
    rows = {r.source: r for r in C.source_novelty(df).collect()}
    assert rows["src_a"].n_vocab == 2  # {x, z}
    assert rows["src_a"].n_first_tokens == 2  # x, z
    assert rows["src_b"].n_vocab == 2  # {x, y}
    assert rows["src_b"].n_first_tokens == 1  # y only


def test_source_novelty_zero_novelty_source(spark):
    # src_b repeats doc 1's vocabulary exactly: footprint > 0, novelty 0
    df = spark.createDataFrame(
        [(1, "a b c", "src_a"), (2, "c b a", "src_b")],
        "doc_id long, text string, source string",
    )
    rows = {r.source: r for r in C.source_novelty(df).collect()}
    assert rows["src_b"].n_vocab == 3
    assert rows["src_b"].n_first_tokens == 0


def test_jaccard_threshold_curve_buckets_partition_pairs(spark):
    # identical docs -> jaccard 10000 (bucket 10000); near-identical
    # long docs share most shingles -> a high-but-not-10000 bucket.
    base = " ".join(f"w{i}" for i in range(40))
    near = " ".join(f"w{i}" for i in range(39)) + " zz"
    df = spark.createDataFrame(
        [(1, base), (2, base), (3, near)],
        "doc_id long, text string",
    )
    rows = D.jaccard_threshold_curve(df).collect()
    by_bucket = {r.bucket_lo_bp: r for r in rows}
    assert by_bucket[10000].n_pairs == 1  # the exact-dup pair (1,2)
    assert by_bucket[10000].min_bp == 10000
    # every pair lands in exactly one bucket; counts sum to pair total
    n_pairs_direct = D.near_dup_pairs(df, threshold_bp=0).count()
    assert sum(r.n_pairs for r in rows) == n_pairs_direct
    for r in rows:
        assert r.bucket_lo_bp <= r.min_bp <= r.max_bp < r.bucket_lo_bp + 1000 \
            or r.bucket_lo_bp == 10000


def test_pit_scd2_join_uses_version_valid_at_event_time(spark, tmp_path):
    # Hand-built hub: one user, engagement stream click..view..click,
    # purchases interleaved. State timeline (non-purchase events):
    #   t=10 click -> [10, 30)
    #   t=30 view  -> [30, 50)
    #   t=50 click -> [50, None)
    # Purchases: t=20 (state click), t=30 (boundary -> NEW version,
    # view), t=60 (click). A purchase before t=10 would drop (no dim).
    import __spark_entry__ as entry

    events = [
        (1, 10, "click", 0.0),
        (2, 20, "purchase", 5.0),
        (3, 30, "view", 0.0),
        (4, 30, "purchase", 7.0),
        (5, 50, "click", 0.0),
        (6, 60, "purchase", 11.0),
    ]
    df = spark.createDataFrame(
        [(eid, sec, 7, etype, val, "{}") for eid, sec, etype, val in events],
        "event_id long, sec long, user_id long, event_type string, "
        "value double, props string",
    ).select(
        "event_id",
        F.timestamp_seconds("sec").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
    out = str(tmp_path / "pit")
    df.coalesce(1).write.parquet(f"{out}/events.parquet")
    rows = {
        r.state: r
        for r in entry.queries()["hub_pit_scd2_join"](spark, out).collect()
    }
    assert rows["click"].n_purchases == 2  # t=20 and t=60
    assert rows["click"].sum_value_cents == 500 + 1100
    assert rows["view"].n_purchases == 1  # the boundary purchase t=30
    assert rows["view"].sum_value_cents == 700


def test_partition_drift_lag_and_rate(spark, tmp_path):
    # two users -> two partitions; partition of user 1 stops an hour
    # earlier than user 2's frontier.
    import __spark_entry__ as entry

    rows = []
    eid = 0
    for sec in (0, 3600):  # user 1: events at t=0 and t=3600
        rows.append((eid, sec, 1, "click", 1.0, "{}"))
        eid += 1
    for sec in (0, 3600, 7200):  # user 2: frontier t=7200
        rows.append((eid, sec, 2, "click", 1.0, "{}"))
        eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, sec long, user_id long, event_type string, "
        "value double, props string",
    ).select(
        "event_id",
        F.timestamp_seconds("sec").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
    out = str(tmp_path / "drift")
    df.coalesce(1).write.parquet(f"{out}/events.parquet")
    res = {
        r.partition: r
        for r in entry.queries()["hub_partition_drift"](spark, out).collect()
    }
    p1, p2 = res["1"], res["2"]  # partition = user_id % 4
    assert p2.drift_us == 0  # global frontier
    assert p1.drift_us == 3600 * 1_000_000  # one hour behind
    assert p1.n_events == 2 and p2.n_events == 3
    # rate: n * 3600e6 div (extent+1)
    assert p1.events_per_hour == 2 * 3600_000_000 // (3600_000_000 + 1)
