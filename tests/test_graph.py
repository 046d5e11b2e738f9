"""Co-purchase PageRank (operators/graph.py)."""

from tests.conftest import SF_DIR

from pyspark.sql import functions as F

from spark_eventhubs_spark.operators import graph as G


def _lineitem(spark):
    return spark.read.parquet(f"{SF_DIR}/lineitem.parquet")


def test_edges_are_symmetric_and_loop_free(spark):
    e = G.copurchase_edges(_lineitem(spark))
    assert e.where(F.col("src") == F.col("dst")).count() == 0
    fwd = {(r["src"], r["dst"]) for r in e.collect()}
    assert all((b, a) in fwd for a, b in fwd)  # bidirectional by construction


def test_pagerank_partition_invariant_and_positive(spark):
    """Integer contributions commute: ranks are identical under
    different input partitionings, strictly positive, and the top list
    is the requested size."""
    li = _lineitem(spark)
    a = [(r["partkey"], r["rank"]) for r in G.pagerank(li.repartition(7)).collect()]
    b = [(r["partkey"], r["rank"]) for r in G.pagerank(li.repartition(3)).collect()]
    assert a == b and len(a) == G.PR_TOP
    assert all(rank > 0 for _, rank in a)
    # descending with deterministic tie order
    assert a == sorted(a, key=lambda t: (-t[1], t[0]))


def test_pagerank_mass_is_bounded(spark):
    """Total integer rank mass can only shrink vs SCALE (every div
    floors; nothing is created): sum(rank) <= SCALE + N*base slack,
    and a hub part outranks the median part."""
    li = _lineitem(spark)
    full = G.pagerank(li, top=1_000_000)
    rows = full.collect()
    total = sum(r["rank"] for r in rows)
    assert total <= G.PR_SCALE
    ranks = sorted((r["rank"] for r in rows), reverse=True)
    assert ranks[0] > ranks[len(ranks) // 2]


def test_pagerank_plan_depth_constant_across_iterations(spark):
    """Per-round localCheckpoint truncates lineage: the final plan's
    size must not grow with ``iters`` (pre-fix, each iteration embedded
    every prior one — plan analysis cost grew per round and anyone
    raising ``iters`` hit it quadratically)."""
    li = spark.createDataFrame(
        [(100, 1), (100, 2), (200, 2), (200, 3)],
        "l_orderkey long, l_partkey long",
    )
    p2 = G.pagerank(li, iters=2)._jdf.queryExecution().analyzed().toString()
    p6 = G.pagerank(li, iters=6)._jdf.queryExecution().analyzed().toString()
    assert len(p6) <= len(p2) + 200  # constant-depth: only literals differ
    assert p6.count("Join") == p2.count("Join")


def test_pagerank_tiny_graph_hand_computed(spark):
    """Integer PageRank on a 3-node path graph (1-2, 2-3 co-purchase
    orders), checked against a literal python re-computation of the
    same integer recurrence."""
    li = spark.createDataFrame(
        [(100, 1), (100, 2), (200, 2), (200, 3)],
        "l_orderkey long, l_partkey long",
    )
    got = {r["partkey"]: r["rank"] for r in G.pagerank(li, top=10).collect()}

    scale = G.PR_SCALE
    edges = {1: [2], 2: [1, 3], 3: [2]}
    deg = {n: len(vs) for n, vs in edges.items()}
    n = 3
    base = (15 * scale) // (100 * n)
    r = {v: scale // n for v in edges}
    for _ in range(G.PR_ITERS):
        nxt = {}
        for v in edges:
            s = sum((85 * r[u]) // (100 * deg[u]) for u in edges if v in edges[u])
            nxt[v] = base + s
        r = nxt
    assert got == r
    assert got[2] > got[1] == got[3]  # the middle node is the hub


def test_pagerank_from_bucketed_artifact_matches_and_skips_edge_shuffle(spark):
    """The ingest/steady-state split (r7): pagerank over the bucketed
    (src, dst, deg) artifact must (a) equal the from-lineitem result
    bit-for-bit, and (b) plan each iteration's join with NO shuffle on
    the bucketed edge side — only the small ranks frame exchanges.
    With 8 buckets on src, the edge scan side of a SortMergeJoin reads
    bucketed output partitioning directly; an Exchange feeding the
    FileScan of the edge table would defeat the 100 TB layout."""
    from spark_eventhubs_spark.bucketing import ensure_copurchase_edges

    tbl = ensure_copurchase_edges(spark, SF_DIR)
    edges = spark.table(tbl)
    from_artifact = G.pagerank(edges=edges)
    from_lineitem = G.pagerank(_lineitem(spark))
    assert sorted(map(tuple, from_artifact.collect())) == sorted(
        map(tuple, from_lineitem.collect())
    )
    # One iteration's contrib join, planned in isolation (the full
    # pagerank loop checkpoints between rounds, so inspect one round).
    # Broadcast is disabled to force the AT-SCALE shape: on a cluster
    # the ranks frame (|parts| rows) stops fitting the broadcast
    # threshold and the join is sort-merge on src — exactly where the
    # bucketed layout must shed the edge-side Exchange.
    from pyspark.sql import functions as F

    ranks = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .localCheckpoint(eager=True)
        .select("node", F.lit(1).cast("long").alias("rank"))
    )
    joined = edges.join(
        ranks.withColumnRenamed("node", "src").withColumnRenamed(
            "rank", "r_src"
        ),
        "src",
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    # the bucketed edge scan is read AS buckets (its partitioning
    # satisfies the join), and the ONLY shuffle is the ranks side
    assert "Bucketed: true" in plan, plan
    assert "SortMergeJoin" in plan, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_copurchase_edges_ingest_is_two_shuffles_no_self_join(spark):
    """r8 ingest rewrite (r7 verdict item 7): pair expansion goes
    through ONE orderkey collect_set aggregation + local double
    explode, so the edge build carries exactly two wide stages (the
    orderkey agg and the (src,dst) distinct) and NO join — the
    previous distinct-then-self-join shape cost two extra
    lineitem-scale shuffles."""
    e = G.copurchase_edges(_lineitem(spark))
    plan = e._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 2, plan
    assert "Generate explode" in plan, plan
    assert "Join" not in plan, plan
