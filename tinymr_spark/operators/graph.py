"""Iterative graph computation on DataFrames — PageRank.

The operator class the registry lacked: a fixed-point algorithm driven
by a driver-side loop of DISTRIBUTED join+aggregate rounds (the classic
Spark PageRank shape).  The reference cannot express iteration at all —
its model is one map/reduce pass (/root/reference/tinymr.py:156-230);
this extends SURVEY §2's beyond-reference surface.

Graph: the part<->supplier bipartite graph from lineitem (distinct
(l_partkey, l_suppkey) pairs, symmetrized into directed edges both
ways; node ids disambiguate the two families as 2*part and 2*supp+1).
Every node of the symmetrized graph has outdegree >= 1, so no dangling
mass handling is needed.

Cross-engine determinism — FIXED-POINT INTEGER arithmetic throughout.
The first draft kept ranks as ROUND(double, 12) and diverged from the
oracle on ~half the rows by exactly 1e-12: a 12-digit rank divided by
outdeg=2 lands EXACTLY on a .5 digit boundary, where Spark
(shortest-repr HALF_UP) and DuckDB (binary-value rounding) go opposite
ways by design.  Measured, not theoretical.  The production fix is the
classic one: ranks live in integer units of 1e-12 (bigint), every
divide is integer `div` (truncation — identical everywhere), damping is
*85 div 100, and sums are exact bigint — bit-equality by construction,
at the cost of truncating ~1 unit of mass per division (identically in
both engines; irrelevant to ranking).

100 TB notes: edges are computed once and persisted (each iteration
re-reads the edge table, not the fact scan); contributions shuffle on
dst (one hash shuffle per iteration — inherent to the algorithm); and
the rank lineage is cut by localCheckpoint every PR_CHECKPOINT_EVERY
rounds so plan depth stays O(K) no matter the iteration count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tinymr_spark.sources import load_table

N_PAGERANK_ITERS = 5
PR_UNIT = 10**12  # fixed-point scale: 1.0 == 1e12 units
PR_DAMP_NUM, PR_DAMP_DEN = 85, 100  # damping 0.85 as an exact ratio

# Truncate the iteration lineage every K rounds: each round's plan embeds
# the previous round's whole subtree, so an L-round loop compiles an
# O(L)-deep (and, printed, O(L)-times-repeated-edge-scan) plan — the
# classic iterative-Spark failure at real iteration depth (optimizer time
# grows superlinearly; task binaries bloat).  localCheckpoint materializes
# the rank vector (ONE small row per node — exact bigints, so the cut
# cannot perturb the fixed-point arithmetic) and restarts the lineage
# from it.  Measured at sf0.001: K=None prints 68 exchanges / 29
# repeated edge-cache scans, K=2 prints 33 / 7 (one live round).  Local
# cost of the cut: ~+0.35s per run at sf0.1 (two eager materialization
# jobs' launch overhead; interleaved min-of-4: 1.8s uncut vs 2.2s cut)
# — the price of bounding plan growth, which at real iteration depth
# inverts hard in the cut's favor (optimizer time grows superlinearly
# uncut).  0/None disables for A/B-ing plans.  The checkpointed RDD is
# executor-local (non-reliable) — acceptable: losing an executor mid-loop
# recomputes from the persisted edge table, and the ContextCleaner
# reclaims it once the result DataFrame is dropped.
PR_CHECKPOINT_EVERY: int | None = 2


def _edge_cache(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """(edges, nodes) persisted once per lineitem version — the graph is
    read 5+1 times per PageRank run and twice per bench pass, so the
    distinct-pairs shuffle must not repeat.  Edges are pre-partitioned
    by src (the per-iteration join key), so each round shuffles only the
    small rank vector; same staleness lifecycle as every session cache
    (tests/test_cache_staleness.py)."""
    from tinymr_spark.sources import file_version, session_cache, table_path

    cache = session_cache(spark, "_tinymr_graph_cache")
    key = (sf_dir, file_version(table_path(sf_dir, "lineitem")))
    if key not in cache:
        li = load_table(spark, sf_dir, "lineitem")
        pairs = li.select(
            (F.col("l_partkey") * 2).alias("p"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        ).distinct()
        edges = (
            pairs.select(F.col("p").alias("src"), F.col("s").alias("dst"))
            .unionByName(
                pairs.select(F.col("s").alias("src"), F.col("p").alias("dst"))
            )
            .repartition("src")
            .persist()
        )
        nodes = (
            edges.groupBy("src")
            .agg(F.count("*").alias("outdeg"))
            .select(F.col("src").alias("node"), "outdeg")
            .persist()
        )
        for stale in [k for k in cache if k[0] == sf_dir and k != key]:
            for df in cache.pop(stale):
                df.unpersist()
        cache[key] = (edges, nodes)
    return cache[key]


def q146_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges, nodes = _edge_cache(spark, sf_dir)
    n_nodes = nodes.agg(F.count("*").alias("n"))

    ranks = nodes.crossJoin(F.broadcast(n_nodes)).select(
        "node", "outdeg", F.expr(f"{PR_UNIT} div n").alias("rank_u")
    )
    base_num = PR_UNIT * (PR_DAMP_DEN - PR_DAMP_NUM)  # (1-d) * UNIT * DEN
    for it in range(1, N_PAGERANK_ITERS + 1):
        contrib = (
            edges.join(ranks.withColumnRenamed("node", "src"), "src")
            .select(
                F.col("dst").alias("node"),
                F.expr("rank_u div outdeg").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").cast("bigint").alias("s"))
        )
        ranks = (
            nodes.join(contrib, "node")  # inner: every node has in-edges here
            .crossJoin(F.broadcast(n_nodes))
            .select(
                "node",
                "outdeg",
                F.expr(
                    f"{base_num} div ({PR_DAMP_DEN} * n) "
                    f"+ (s * {PR_DAMP_NUM}) div {PR_DAMP_DEN}"
                ).alias("rank_u"),
            )
        )
        if PR_CHECKPOINT_EVERY and it % PR_CHECKPOINT_EVERY == 0 and it < N_PAGERANK_ITERS:
            ranks = ranks.localCheckpoint(eager=True)
    is_part = F.pmod(F.col("node"), F.lit(2)) == 0
    return ranks.select(
        "node",
        F.when(is_part, F.lit("part")).otherwise(F.lit("supplier")).alias("kind"),
        (F.col("node") / 2).cast("bigint").alias("entity_id"),
        F.col("rank_u"),  # rank in 1e-12 units; exact by construction
    )


def _oracle_pagerank() -> str:
    base = f"""
WITH pairs AS (
    SELECT DISTINCT l_partkey * 2 AS p, l_suppkey * 2 + 1 AS s FROM lineitem
),
edges AS (
    SELECT p AS src, s AS dst FROM pairs
    UNION ALL
    SELECT s AS src, p AS dst FROM pairs
),
deg AS (SELECT src AS node, COUNT(*) AS outdeg FROM edges GROUP BY 1),
nn AS (SELECT COUNT(*) AS n FROM deg),
r0 AS (
    SELECT node, outdeg, {PR_UNIT} // n AS rank_u FROM deg, nn
)"""
    base_num = PR_UNIT * (PR_DAMP_DEN - PR_DAMP_NUM)
    steps = []
    for i in range(N_PAGERANK_ITERS):
        steps.append(f""",
c{i} AS (
    SELECT e.dst AS node, CAST(SUM(r.rank_u // r.outdeg) AS BIGINT) AS s
    FROM edges e JOIN r{i} r ON r.node = e.src
    GROUP BY 1
),
r{i + 1} AS (
    SELECT d.node, d.outdeg,
           {base_num} // ({PR_DAMP_DEN} * nn.n)
           + (c.s * {PR_DAMP_NUM}) // {PR_DAMP_DEN} AS rank_u
    FROM deg d JOIN c{i} c ON c.node = d.node, nn
)"""
        )
    final = f"""
SELECT node,
       CASE WHEN node % 2 = 0 THEN 'part' ELSE 'supplier' END AS kind,
       node // 2 AS entity_id,
       CAST(rank_u AS BIGINT) AS rank_u
FROM r{N_PAGERANK_ITERS}
"""
    return base + "".join(steps) + final


ORACLE_Q146 = _oracle_pagerank()

QUERIES = {
    "q146_pagerank": q146_pagerank,
}

ORACLE = {
    "q146_pagerank": ORACLE_Q146,
}
