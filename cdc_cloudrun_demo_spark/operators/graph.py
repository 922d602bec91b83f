"""Graph analytics: PageRank over the customer–supplier trade graph.

Iterative algorithms are the classic "can't oracle it" category — float
PageRank accumulates in partition order, so no two engines (or two runs)
agree to the last ulp. This implementation makes the WHOLE computation
exact integer arithmetic: rank mass is carried in fixed-point units
(10¹² total), per-edge contributions use floor division, and the damping
mix is integer (85·x)//100 — every iteration is a pure function of the
edge set, identical in Spark and DuckDB, so even a 10-iteration
fixed-point PageRank hash-matches its oracle (the oracle unrolls the
iterations as chained CTEs — no recursive-aggregate support needed).

Scale shape: each iteration is one shuffle keyed on the destination node
(contribution aggregation) plus a broadcast of the bounded rank-mass
remainder; the edge list never re-derives. `localCheckpoint` every few
iterations truncates the lineage the same way the connected-components
operator does (`functions/dedup.py`). Rank leakage from floor division
(< 1 unit per node per iteration) stays in the system as an explicit
residual — conservation is property-tested.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table

TOTAL_MASS = 1_000_000_000_000  # 10^12 fixed-point rank units
N_ITER = 10
DAMP_NUM, DAMP_DEN = 85, 100


def _trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct customer↔supplier edges from orders⋈lineitem, both
    directions (symmetric graph ⇒ no dangling nodes). Node ids: customer
    c → 2c, supplier s → 2s+1 (disjoint, reversible)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pairs = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("cust"),
            (F.col("l_suppkey") * 2 + 1).alias("supp"),
        )
        .distinct()
    )
    fwd = pairs.select(F.col("cust").alias("src"), F.col("supp").alias("dst"))
    rev = pairs.select(F.col("supp").alias("src"), F.col("cust").alias("dst"))
    return fwd.unionByName(rev)


def graph_pagerank(spark: SparkSession, sf_dir: str, n_iter: int = N_ITER) -> DataFrame:
    """Fixed-point PageRank (damping 0.85, ``n_iter`` iterations) over
    the trade graph; returns every node's rank in integer units plus its
    kind. See module docstring for why this is hash-match oracleable."""
    edges = _trade_edges(spark, sf_dir)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    nodes = deg.select(F.col("src").alias("node"), "outdeg")
    n_nodes = nodes.count()  # bounded: the node-count scalar, not data
    if n_nodes == 0:
        return spark.createDataFrame([], "node long, kind string, rank_units long")
    base = (DAMP_DEN - DAMP_NUM) * (TOTAL_MASS // n_nodes) // DAMP_DEN
    ranks = nodes.select("node", F.lit(TOTAL_MASS // n_nodes).alias("rank"))
    for i in range(n_iter):
        contrib = (
            ranks.join(deg, ranks.node == deg.src)
            .join(edges, "src")
            .select("dst", F.expr("rank div outdeg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("inc"))
        )
        ranks = (
            nodes.join(contrib, nodes.node == contrib.dst, "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr(f"{DAMP_NUM} * coalesce(inc, 0) div {DAMP_DEN}")
                ).alias("rank"),
            )
        )
        if (i + 1) % 3 == 0:
            ranks = ranks.localCheckpoint()  # truncate iterative lineage
    return ranks.select(
        "node",
        F.when(F.col("node") % 2 == 0, F.lit("customer"))
        .otherwise(F.lit("supplier"))
        .alias("kind"),
        F.col("rank").alias("rank_units"),
    )


def _pagerank_oracle(n_iter: int = N_ITER) -> str:
    """The identical computation as unrolled chained CTEs (DuckDB's
    recursive CTEs disallow aggregation in the recursive term, and
    unrolling is exact anyway). `//` is DuckDB floor division — both
    operands are non-negative, matching Spark's `div`."""
    head = f"""
        WITH pairs AS (
            SELECT DISTINCT o.o_custkey * 2 AS cust, l.l_suppkey * 2 + 1 AS supp
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        ), edges AS (
            SELECT cust AS src, supp AS dst FROM pairs
            UNION ALL
            SELECT supp AS src, cust AS dst FROM pairs
        ), deg AS (
            SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src
        ), nodes AS (
            SELECT src AS node, outdeg FROM deg
        ), consts AS (
            SELECT COUNT(*) AS n,
                   {TOTAL_MASS} // COUNT(*) AS init,
                   ({DAMP_DEN - DAMP_NUM} * ({TOTAL_MASS} // COUNT(*)))
                     // {DAMP_DEN} AS base
            FROM nodes
        ), pr0 AS (
            SELECT node, init AS rank FROM nodes, consts
        )"""
    steps = []
    for i in range(n_iter):
        steps.append(f"""
        , inc{i} AS (
            SELECT e.dst, SUM(p.rank // d.outdeg) AS inc
            FROM pr{i} p JOIN deg d ON p.node = d.src
                         JOIN edges e ON e.src = p.node
            GROUP BY e.dst
        ), pr{i + 1} AS (
            SELECT n.node,
                   c.base + ({DAMP_NUM} * COALESCE(i.inc, 0)) // {DAMP_DEN} AS rank
            FROM nodes n CROSS JOIN consts c LEFT JOIN inc{i} i ON n.node = i.dst
        )""")
    tail = f"""
        SELECT node,
               CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS kind,
               CAST(rank AS BIGINT) AS rank_units
        FROM pr{n_iter}
    """
    return head + "".join(steps) + tail


QUERIES = {
    "graph_pagerank": graph_pagerank,
}

ORACLES = {
    "graph_pagerank": _pagerank_oracle(),
}
