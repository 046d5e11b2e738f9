"""Graph analytics over the TPC-H-ish tables: co-purchase PageRank.

The missing family next to near-dup connected components
(`dedup.near_dup_components`): iterative message passing over an
edge list — the shape of PageRank, label propagation, and influence
scoring on Spark. The graph is parts co-purchased within an order
(distinct bidirectional pairs from the lineitem self-join on
orderkey — bounded expansion, every order holds <= 7 items).

Exactness across engines (the same design as integer-sum k-means):
every quantity in the iteration is an INTEGER —

- ranks are scaled to ``SCALE`` (1e12) integer units;
- each edge's contribution is ``(85 * r_src) div (100 * deg_src)``
  (integer division — the damping multiply and the degree divide in
  one exact step);
- the gather is an integer SUM, which commutes, so partition order
  can never change a rank;
- the teleport term is ``(15 * SCALE) div (100 * N)``.

Integer flooring biases each rank down by at most deg ulps per
iteration vs real-valued PageRank — irrelevant for ranking, decisive
for cross-engine hash equality.

Scale: the edge list shuffles once on orderkey to build and once on
the node key per iteration (co-partitioned joins — the same edges
frame reused); degrees are |nodes| rows; no stage ever exceeds
|edges| rows. At 100 TB the edges frame is the ingest artifact to
bucket by src so every iteration's join is co-located.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PR_SCALE = 1_000_000_000_000  # rank fixed-point units
PR_ITERS = 3
PR_TOP = 20


def copurchase_edges(lineitem: DataFrame) -> DataFrame:
    """Distinct bidirectional (src, dst) part pairs co-occurring in an
    order. The self-join is on orderkey (equi-join, <= 7 rows per
    order on the reduced schema) and never a cross join."""
    a = lineitem.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("src")
    ).distinct()
    b = a.select(F.col("ok"), F.col("src").alias("dst"))
    return (
        a.join(b, "ok")
        .where(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )


def pagerank(
    lineitem: DataFrame,
    iters: int = PR_ITERS,
    top: int = PR_TOP,
    scale: int = PR_SCALE,
) -> DataFrame:
    """Integer-exact PageRank over the co-purchase graph; returns the
    ``top`` parts by final rank (ties to the smaller partkey)."""
    from spark_eventhubs_spark.operators.dedup import _checkpoint_cached

    # The edge list is an ingest artifact (a pure function of the
    # corpus): without materialization the lazy plan re-runs the
    # orderkey self-join + distinct once for deg and once PER
    # ITERATION (~5x the work). Cached per session like the MinHash
    # signature store; a 100 TB deployment materializes and buckets
    # this frame at ingest.
    edges = _checkpoint_cached(
        copurchase_edges(lineitem), lineitem, "graph_edges", ()
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    nodes = deg.select(F.col("src").alias("node"), "deg")
    n_nodes = nodes.count()  # bounded driver scalar (|parts|)
    r0 = scale // n_nodes
    base = (15 * scale) // (100 * n_nodes)
    ranks = nodes.select("node", F.lit(r0).cast("long").alias("rank"))
    for _ in range(iters):
        contrib = (
            edges.join(
                ranks.withColumnRenamed("node", "src").withColumnRenamed(
                    "rank", "r_src"
                ),
                "src",
            )
            .join(deg, "src")
            .select(
                F.col("dst").alias("node"),
                F.expr("(85 * r_src) div (100 * deg)").alias("c"),
            )
        )
        gathered = contrib.groupBy("node").agg(F.sum("c").alias("s"))
        # Per-round lineage truncation (the near_dup_components
        # pattern): without it each iteration's plan embeds all prior
        # iterations, so analysis cost and lineage depth grow with
        # ``iters``. The ranks frame is |nodes| rows — cheap to
        # materialize — and checkpointed blocks free the prior round's.
        ranks = (
            nodes.select("node")
            .join(gathered, "node", "left")
            .select(
                "node",
                (F.lit(base) + F.coalesce(F.col("s"), F.lit(0)))
                .cast("long")
                .alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return (
        ranks.orderBy(F.col("rank").desc(), F.col("node").asc())
        .limit(top)
        .select(F.col("node").alias("partkey"), F.col("rank"))
    )


def oracle_pagerank(
    iters: int = PR_ITERS, top: int = PR_TOP, scale: int = PR_SCALE
) -> str:
    parts = [f"""e0 AS (
  SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem
), edges AS (
  SELECT DISTINCT a.p AS src, b.p AS dst
  FROM e0 a JOIN e0 b ON a.ok = b.ok AND a.p <> b.p
), deg AS (
  SELECT src, COUNT(*) AS deg FROM edges GROUP BY 1
), nn AS (SELECT COUNT(*) AS n FROM deg
), r0 AS (
  SELECT d.src AS node, CAST({scale} // nn.n AS BIGINT) AS rank
  FROM deg d, nn
)"""]
    prev = "r0"
    for it in range(1, iters + 1):
        parts.append(f"""g{it} AS (
  SELECT e.dst AS node, CAST(SUM((85 * r.rank) // (100 * d.deg)) AS BIGINT) AS s
  FROM edges e JOIN {prev} r ON r.node = e.src JOIN deg d ON d.src = e.src
  GROUP BY 1
), r{it} AS (
  SELECT n.node,
    CAST((15 * {scale}) // (100 * nn.n) + COALESCE(g.s, 0) AS BIGINT) AS rank
  FROM (SELECT src AS node FROM deg) n
  LEFT JOIN g{it} g ON g.node = n.node, nn
)""")
        prev = f"r{it}"
    return (
        "WITH " + ",\n".join(parts)
        + f"""
SELECT node AS partkey, rank FROM {prev}
ORDER BY rank DESC, node ASC LIMIT {top}"""
    )
