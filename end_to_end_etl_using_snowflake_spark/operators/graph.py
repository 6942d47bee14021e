"""Iterative graph analytics as declarative DataFrame loops.

Complements the iterative family (``dedup.connected_components`` for
cluster labeling, ``similarity.kmeans`` for centroid loops) with a
fixed-iteration PageRank. The driver only unrolls the loop — every
iteration is a distributed join + aggregate; no rank vector ever
leaves the executors.

Determinism convention (the sketches' exact-arithmetic rule): ranks are
scaled BIGINTs and every division is integer floor division, so the
per-node sums are order-independent and a SQL oracle can replay the
exact iteration with ``//``. The float form of PageRank would make
cross-engine sums order-dependent; the scaled-integer form loses a few
ulps of probability mass per step (not redistributed — documented) and
is bit-reproducible everywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 10**12


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping_pct: int = 85,
    scale: int = SCALE,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list.

    ``pr_{t+1}(v) = ((100-d) * (scale // N) + d * Σ_{u→v} (pr_t(u) //
    outdeg(u))) // 100`` — the standard damped update in scaled-BIGINT
    arithmetic. Dangling nodes (no out-edges) simply leak their mass;
    with teleport every node keeps a nonzero rank and the ORDERING —
    what PageRank is consumed for — is unaffected by the uniform leak.

    Plan shape at scale: the edge list shuffles once per iteration on
    dst for the contribution aggregate, joined to the (node-sized) rank
    relation; outdeg computes once and reuses. N stays in-plan as a
    broadcast 1-row aggregate — no driver-side scalars, no collect.
    The loop is unrolled into one lazy plan (for tens of iterations,
    ``localCheckpoint`` every ~5 like dedup.connected_components).
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    n_nodes = nodes.agg(F.count(F.lit(1)).alias("n"))
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    d = damping_pct
    pr = nodes.crossJoin(F.broadcast(n_nodes)).select(
        "node", F.expr(f"CAST({scale} AS BIGINT) div n").alias("pr")
    )
    for _ in range(iterations):
        contrib = (
            e.join(pr, e.src == pr.node)
            .join(outdeg, "src")
            .groupBy("dst")
            .agg(F.sum(F.expr("pr div deg")).alias("c"))
        )
        # integer div throughout — a double division here would round
        # at the representability boundary and break the bit-exact twin
        pr = (
            nodes.join(contrib, nodes.node == contrib.dst, "left")
            .crossJoin(F.broadcast(n_nodes))
            .select(
                "node",
                F.expr(
                    f"(({100 - d} * (CAST({scale} AS BIGINT) div n))"
                    f" + {d} * coalesce(c, CAST(0 AS BIGINT))) div 100"
                ).alias("pr"),
            )
        )
    return pr


def sql_pagerank_oracle(
    edges_cte: str,
    iterations: int = 3,
    damping_pct: int = 85,
    scale: int = SCALE,
) -> str:
    """DuckDB replay of the exact scaled-integer iteration: the loop
    unrolled into chained CTEs (the v9_kmeans_iter3 oracle pattern).
    ``edges_cte`` must select columns (src, dst), already distinct."""
    d = damping_pct
    parts = [
        f"edges AS ({edges_cte})",
        "nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges)",
        "nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes)",
        "outdeg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg"
        " FROM edges GROUP BY 1)",
        f"pr0 AS (SELECT node, (CAST({scale} AS BIGINT) // nn.n) AS pr"
        " FROM nodes CROSS JOIN nn)",
    ]
    for i in range(iterations):
        parts.append(
            f"c{i + 1} AS (SELECT e.dst, CAST(SUM(p.pr // o.deg) AS BIGINT) AS c"
            f" FROM edges e JOIN pr{i} p ON p.node = e.src"
            f" JOIN outdeg o ON o.src = e.src GROUP BY 1)"
        )
        parts.append(
            f"pr{i + 1} AS (SELECT nodes.node,"
            f" (({100 - d} * (CAST({scale} AS BIGINT) // nn.n))"
            f" + {d} * COALESCE(c{i + 1}.c, CAST(0 AS BIGINT))) // 100 AS pr"
            f" FROM nodes CROSS JOIN nn"
            f" LEFT JOIN c{i + 1} ON c{i + 1}.dst = nodes.node)"
        )
    return "WITH " + ",\n".join(parts) + f"\nSELECT node, pr FROM pr{iterations}"
