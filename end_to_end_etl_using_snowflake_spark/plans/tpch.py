"""TPC-H queries Q2/Q8/Q9/Q11/Q12/Q13/Q15/Q16/Q17/Q20/Q21 — the 11
shapes not already covered by ``plans.queries`` (q1/q3-q7/q10/q14/q18/
q19/q22 live there), completing the full 22-query analytic surface.

The driver schema has no ``partsupp`` table and no commit/receipt dates,
so the five partsupp-dependent queries (Q2/Q9/Q11/Q16/Q20) derive the
part-supplier relationship from ``lineitem`` (supplier *s* supplies part
*p* iff a lineitem links them — the same association partsupp
materializes), and the two lateness queries (Q12/Q21) define "late" as
``l_shipdate > o_orderdate + INTERVAL N DAY``. Every adaptation keeps
the *query shape* that makes the original interesting: Q2's correlated
scalar-min subquery, Q8's share-of-total case-sum, Q13's double
aggregation over an outer join, Q15's max-equality view join, Q17's
correlated per-group average, Q21's EXISTS/NOT-EXISTS self-joins.

Determinism (registry conventions): money stays DECIMAL until the final
DOUBLE cast; ratios divide two exactly-converted DOUBLEs (IEEE division
is bit-identical across engines); correlated averages are restated as
multiply-through inequalities (``2*qty*cnt < sum``) so no intermediate
division happens at all; every LIMIT carries a total-order tiebreak.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import _SQL_DISC, _SQL_PRICE, _SQL_QTY, _disc, _price, _qty
from .registry import register
from .tables import load

_ONE = "CAST(1 AS DECIMAL(1,0))"


def _one():
    return F.lit(1).cast("decimal(1,0)")


# ---------------------------------------------------------------------------
# Q2: minimum-cost supplier (correlated scalar-min subquery)
# ---------------------------------------------------------------------------

_Q2_SUPPLY = f"""
    SELECT l_partkey, l_suppkey, MIN({_SQL_PRICE}) AS supplycost
    FROM lineitem GROUP BY 1, 2
"""


@register(
    "q2_min_cost_supplier",
    oracle=f"""
    WITH supply AS ({_Q2_SUPPLY}),
    eur AS (
        SELECT sp.l_partkey, sp.l_suppkey, sp.supplycost,
               s.s_name, s.s_acctbal, n.n_name
        FROM supply sp
        JOIN supplier s ON s.s_suppkey = sp.l_suppkey
        JOIN nation n   ON n.n_nationkey = s.s_nationkey
        JOIN region r   ON r.r_regionkey = n.n_regionkey
        WHERE r.r_name = 'EUROPE'
    )
    SELECT e.s_acctbal, e.s_name, e.n_name, p.p_partkey, p.p_name,
           CAST(e.supplycost AS DOUBLE) AS supplycost
    FROM part p
    JOIN eur e ON e.l_partkey = p.p_partkey
    WHERE p.p_size <= 5 AND p.p_type = 'LARGE'
      AND e.supplycost = (SELECT MIN(e2.supplycost) FROM eur e2
                          WHERE e2.l_partkey = p.p_partkey)
    ORDER BY e.s_acctbal DESC, e.n_name, e.s_name, p.p_partkey
    LIMIT 100
    """,
    doc="""TPC-H Q2 shape (minimum-cost supplier): for each
    small-size/LARGE part, the EUROPE-region supplier(s) matching the
    per-part minimum supply cost — a correlated scalar-MIN subquery
    over the region-filtered supply relation. Without partsupp the
    supply relation is derived from lineitem (min line price per
    (part, supplier) = the supply cost analog). Plan: the supply agg
    shuffles once on (partkey, suppkey); the per-part min is a second
    partial agg on partkey joined back by equality — Catalyst's
    standard decorrelation, no per-row probe. nation/region broadcast;
    the part filter prunes before any join. Deterministic
    acctbal/nation/name/partkey tiebreak on the top-100.""",
    tags=("composite", "tpch", "subquery"),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    supplier = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")

    supply = lineitem.groupBy("l_partkey", "l_suppkey").agg(
        F.min(_price()).alias("supplycost")
    )
    eur = (
        supply.join(supplier, supply.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region.filter(F.col("r_name") == "EUROPE")),
              nation.n_regionkey == region.r_regionkey)
        .select("l_partkey", "supplycost", "s_name", "s_acctbal", "n_name")
    )
    min_cost = eur.groupBy(F.col("l_partkey").alias("mc_partkey")).agg(
        F.min("supplycost").alias("min_cost")
    )
    parts = part.filter((F.col("p_size") <= 5) & (F.col("p_type") == "LARGE"))
    return (
        parts.join(eur, parts.p_partkey == eur.l_partkey)
        .join(
            min_cost,
            (F.col("mc_partkey") == F.col("p_partkey"))
            & (F.col("supplycost") == F.col("min_cost")),
        )
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_name",
            F.col("supplycost").cast("double").alias("supplycost"),
        )
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q8: national market share (share-of-total case-sum)
# ---------------------------------------------------------------------------


@register(
    "q8_market_share",
    oracle=f"""
    SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
           CAST(SUM(CASE WHEN n2.n_name = 'NATION_3'
                         THEN {_SQL_PRICE} * (1 - {_SQL_DISC})
                         ELSE CAST(0 AS DECIMAL(1,0)) END) AS DOUBLE)
             / CAST(SUM({_SQL_PRICE} * (1 - {_SQL_DISC})) AS DOUBLE)
               AS mkt_share,
           CAST(SUM({_SQL_PRICE} * (1 - {_SQL_DISC})) AS DOUBLE) AS volume
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON n1.n_nationkey = c.c_nationkey
    JOIN region r   ON r.r_regionkey = n1.n_regionkey
    JOIN nation n2  ON n2.n_nationkey = s.s_nationkey
    WHERE r.r_name = 'AMERICA' AND p.p_type = 'PROMO'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY 1
    """,
    doc="""TPC-H Q8 shape (national market share): NATION_3's share of
    AMERICA-market PROMO-part revenue per year. The share is a
    case-gated SUM over the same grouped rows as the denominator — one
    aggregate, no second pass, no join back. Both sums stay DECIMAL
    (order-independent) and the ratio divides two exactly-converted
    DOUBLEs, so the quotient is IEEE-identical across engines. The
    nation table joins twice (customer market side n1 via region,
    supplier side n2) — both broadcast. The part filter (1/6
    selectivity) prunes before the 6-way join chain.""",
    tags=("composite", "tpch", "self-join"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    part = load(spark, sf_dir, "part")
    supplier = load(spark, sf_dir, "supplier")
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")

    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    vol = _price() * (_one() - _disc())
    zero = F.lit(0).cast("decimal(1,0)")
    grouped = (
        lineitem.join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
            ),
            lineitem.l_orderkey == orders.o_orderkey,
        )
        .join(F.broadcast(part.filter(F.col("p_type") == "PROMO")),
              lineitem.l_partkey == part.p_partkey)
        .join(supplier, lineitem.l_suppkey == supplier.s_suppkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(n1), customer.c_nationkey == F.col("n1_key"))
        .join(
            F.broadcast(region.filter(F.col("r_name") == "AMERICA")),
            F.col("n1_region") == region.r_regionkey,
        )
        .join(F.broadcast(n2), supplier.s_nationkey == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            F.sum(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(zero))
            .alias("nat_vol"),
            F.sum(vol).alias("tot_vol"),
        )
    )
    return grouped.select(
        "o_year",
        (F.col("nat_vol").cast("double") / F.col("tot_vol").cast("double")).alias(
            "mkt_share"
        ),
        F.col("tot_vol").cast("double").alias("volume"),
    )


# ---------------------------------------------------------------------------
# Q9: product-type profit (supply cost from part list price)
# ---------------------------------------------------------------------------


@register(
    "q9_product_profit",
    oracle=f"""
    SELECT n.n_name AS nation,
           CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
           CAST(SUM({_SQL_PRICE} * (1 - {_SQL_DISC})
                    - CAST(p.p_retailprice AS DECIMAL(18,2))
                      * {_SQL_QTY}) AS DOUBLE) AS sum_profit
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY 1, 2
    """,
    doc="""TPC-H Q9 shape (product-type profit): profit per supplier
    nation per year over parts whose name contains 'red'. Without
    partsupp, the supply-cost term is the part's list price
    (p_retailprice x quantity stands in for ps_supplycost x quantity —
    same join shape, same arithmetic). The whole measure is one DECIMAL
    expression (products stay inside precision 38), summed exactly,
    DOUBLE only at the end. part broadcasts after its LIKE filter;
    nation broadcasts; lineitem shuffles once for the final 2-key
    aggregate.""",
    tags=("composite", "tpch",),
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    supplier = load(spark, sf_dir, "supplier")
    orders = load(spark, sf_dir, "orders")
    nation = load(spark, sf_dir, "nation")

    amount = _price() * (_one() - _disc()) - F.col("p_retailprice").cast(
        "decimal(18,2)"
    ) * _qty()
    return (
        lineitem.join(
            F.broadcast(part.filter(F.col("p_name").like("%red%"))),
            lineitem.l_partkey == part.p_partkey,
        )
        .join(supplier, lineitem.l_suppkey == supplier.s_suppkey)
        .join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(F.sum(amount).cast("double").alias("sum_profit"))
    )


# ---------------------------------------------------------------------------
# Q11: important stock identification (HAVING vs. scalar share-of-total)
# ---------------------------------------------------------------------------


@register(
    "q11_important_stock",
    oracle=f"""
    WITH stock AS (
        SELECT l.l_partkey, SUM({_SQL_PRICE}) AS value
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n   ON n.n_nationkey = s.s_nationkey
        JOIN region r   ON r.r_regionkey = n.n_regionkey
        WHERE r.r_name = 'AFRICA'
        GROUP BY 1
    )
    SELECT l_partkey, CAST(value AS DOUBLE) AS value
    FROM stock
    WHERE CAST(value AS DOUBLE) >
          (SELECT CAST(SUM(value) AS DOUBLE) * 1.5 / COUNT(1) FROM stock)
    """,
    doc="""TPC-H Q11 shape (important stock): per-part inventory value
    held by AFRICA-region suppliers, keeping parts whose value
    exceeds 1.5x the mean per-part value — a grouped aggregate filtered against
    a scalar aggregate over the SAME grouped relation. The original's
    fixed fraction is scaled by 1/SF in the TPC-H spec itself (a fixed
    share goes vacuous as part count grows); the mean-relative
    threshold keeps the query non-trivial at every scale factor. Spark computes
    the total as a 1-row broadcast-joined aggregate of the grouped
    frame (the scalar-subquery decorrelation), so the stock agg is
    computed once and reused, not re-scanned. Threshold compare happens
    in DOUBLE on both engines: the DECIMAL sums convert exactly and
    0.001 scaling is the same IEEE multiply.""",
    tags=("composite", "tpch", "subquery"),
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load(spark, sf_dir, "lineitem")
    supplier = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")

    africa_nations = nation.join(
        F.broadcast(region.filter(F.col("r_name") == "AFRICA")),
        nation.n_regionkey == region.r_regionkey,
        "left_semi",
    )
    stock = (
        lineitem.join(supplier, lineitem.l_suppkey == supplier.s_suppkey)
        .join(
            F.broadcast(africa_nations),
            supplier.s_nationkey == africa_nations.n_nationkey,
        )
        .groupBy("l_partkey")
        .agg(F.sum(_price()).alias("value"))
    )
    total = stock.agg(
        (F.sum("value").cast("double") * F.lit(1.5) / F.count(F.lit(1))).alias(
            "threshold"
        )
    )
    return (
        stock.join(F.broadcast(total))
        .filter(F.col("value").cast("double") > F.col("threshold"))
        .select("l_partkey", F.col("value").cast("double").alias("value"))
    )


# ---------------------------------------------------------------------------
# Q12: shipping priority classes (late shipments by line status)
# ---------------------------------------------------------------------------


@register(
    "q12_priority_shipping",
    oracle="""
    SELECT l.l_linestatus,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      AND l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY 1
    """,
    doc="""TPC-H Q12 shape (shipping modes / order priority): lines
    shipped more than 90 days after their order date in 1997, counted
    by line status, split into urgent-priority and other-priority
    case-sums. The lateness predicate compares columns from BOTH join
    sides (shipdate vs orderdate + interval), so it must run as a join
    residual — but the 1997 shipdate range is single-sided and reaches
    the parquet scan as a PushedFilter before the join. l_linestatus
    stands in for the absent l_shipmode; same two-case-sum shape.""",
    tags=("composite", "tpch",),
)
def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")

    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(urgent, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(urgent, 0).otherwise(1)).alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# Q13: customer order-count distribution (double aggregation, outer join)
# ---------------------------------------------------------------------------


@register(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(1) AS custdist
    FROM (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                          AND o.o_orderpriority <> '4-NOT SPECIFIED'
        GROUP BY c.c_custkey
    ) t
    GROUP BY c_count
    """,
    doc="""TPC-H Q13 shape (customer distribution): the histogram of
    per-customer order counts — a LEFT OUTER join (customers with no
    qualifying orders count as 0) under a join-side filter (the
    o_comment NOT LIKE of the original becomes a priority exclusion),
    then TWO stacked aggregations: count per customer, then count of
    customers per count. The first agg shuffles on c_custkey, the
    second on the (tiny-cardinality) c_count — the classic
    big-shuffle-then-small-shuffle staircase. COUNT(o_orderkey) (not
    COUNT(1)) keeps the no-order customer at 0 through the outer
    join's NULLs.""",
    tags=("composite", "tpch", "outer-join"),
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")

    per_cust = (
        customer.join(
            orders.filter(F.col("o_orderpriority") != "4-NOT SPECIFIED"),
            customer.c_custkey == orders.o_custkey,
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# ---------------------------------------------------------------------------
# Q15: top supplier (aggregate view joined on its own maximum)
# ---------------------------------------------------------------------------

_Q15_REVENUE = f"""
    SELECT l_suppkey AS supplier_no,
           SUM({_SQL_PRICE} * (1 - {_SQL_DISC})) AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1997-04-01'
    GROUP BY 1
"""


@register(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS ({_Q15_REVENUE})
    SELECT s.s_suppkey, s.s_name,
           CAST(r.total_revenue AS DOUBLE) AS total_revenue
    FROM supplier s
    JOIN revenue r ON r.supplier_no = s.s_suppkey
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
    doc="""TPC-H Q15 shape (top supplier): quarterly revenue per
    supplier as a derived view, returning the supplier(s) whose revenue
    equals the view's maximum — the original's CREATE VIEW + scalar
    MAX subquery. The revenue agg is computed once; the max is a 1-row
    broadcast joined back by DECIMAL equality (exact — this is why the
    revenue stays DECIMAL until output: a DOUBLE max-equality would be
    a float == float trap). Ties all surface, which is the correct
    (and deterministic) answer; no LIMIT needed.""",
    tags=("composite", "tpch", "subquery"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load(spark, sf_dir, "lineitem")
    supplier = load(spark, sf_dir, "supplier")

    revenue = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_price() * (_one() - _disc())).alias("total_revenue"))
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        supplier.join(revenue, supplier.s_suppkey == revenue.supplier_no)
        .join(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .select(
            "s_suppkey", "s_name",
            F.col("total_revenue").cast("double").alias("total_revenue"),
        )
    )


# ---------------------------------------------------------------------------
# Q16: parts/supplier relationship (anti-join + COUNT DISTINCT)
# ---------------------------------------------------------------------------


@register(
    "q16_supplier_part_counts",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#3' AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 5, 9, 14, 20, 25, 30, 35)
      AND l.l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    """,
    doc="""TPC-H Q16 shape (parts/supplier relationship): how many
    distinct suppliers ship each qualifying (brand, type, size) part
    class, excluding a supplier blacklist (negative account balance
    stands in for the original's complaint-comment scan). The NOT IN
    runs as a broadcast LEFT ANTI join (s_suppkey is never NULL, so
    NOT IN == anti-join here); the part predicate trio prunes before
    the join; COUNT(DISTINCT) expands to the standard two-phase
    partial-distinct aggregate on (brand, type, size, suppkey).""",
    tags=("composite", "tpch", "anti-join"),
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    supplier = load(spark, sf_dir, "supplier")

    parts = part.filter(
        (F.col("p_brand") != "Brand#3")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 9, 14, 20, 25, 30, 35)
    )
    blacklist = supplier.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        lineitem.join(
            F.broadcast(blacklist),
            lineitem.l_suppkey == blacklist.s_suppkey,
            "left_anti",
        )
        .join(F.broadcast(parts), lineitem.l_partkey == parts.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# Q17: small-quantity-order revenue (correlated per-group average)
# ---------------------------------------------------------------------------


@register(
    "q17_small_qty_revenue",
    oracle=f"""
    WITH pq AS (
        SELECT l_partkey,
               SUM({_SQL_QTY}) AS sum_qty,
               COUNT(1) AS cnt
        FROM lineitem GROUP BY 1
    )
    SELECT CAST(SUM({_SQL_PRICE}) AS DOUBLE) / 7.0 AS avg_yearly,
           COUNT(1) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN pq    ON pq.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#3' AND p.p_type = 'SMALL'
      AND {_SQL_QTY} * 2 * pq.cnt < pq.sum_qty
    """,
    doc="""TPC-H Q17 shape (small-quantity-order revenue): revenue lost
    if orders below half the part's average quantity stopped — the
    correlated AVG subquery (l_quantity < 0.5 * avg per part). The
    average is restated as a multiply-through inequality
    (2*qty*cnt < sum) so the per-part aggregate is (SUM, COUNT) in
    exact DECIMAL/BIGINT — no division anywhere inside the predicate,
    hence no float-boundary risk on either engine. Catalyst computes
    the per-part agg once and hash-joins it back on l_partkey (the
    decorrelated form); division by 7.0 happens once, on the final
    exactly-converted DOUBLE.""",
    tags=("composite", "tpch", "subquery"),
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")

    pq = lineitem.groupBy(F.col("l_partkey").alias("pq_partkey")).agg(
        F.sum(_qty()).alias("sum_qty"), F.count(F.lit(1)).alias("cnt")
    )
    parts = part.filter((F.col("p_brand") == "Brand#3") & (F.col("p_type") == "SMALL"))
    return (
        lineitem.join(F.broadcast(parts), lineitem.l_partkey == parts.p_partkey)
        .join(pq, lineitem.l_partkey == F.col("pq_partkey"))
        .filter(_qty() * 2 * F.col("cnt") < F.col("sum_qty"))
        .agg(
            (F.sum(_price()).cast("double") / F.lit(7.0)).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# Q20: potential part promotion (nested IN over an aggregated HAVING)
# ---------------------------------------------------------------------------


@register(
    "q20_promotion_suppliers",
    oracle=f"""
    SELECT s.s_name, s.s_acctbal
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'ASIA'
      AND s.s_suppkey IN (
          SELECT l.l_suppkey
          FROM lineitem l
          JOIN part p ON p.p_partkey = l.l_partkey
          WHERE p.p_name LIKE 'red%'
          GROUP BY l.l_suppkey
          HAVING SUM(CASE WHEN l.l_shipdate >= TIMESTAMP '1997-01-01'
                           AND l.l_shipdate <  TIMESTAMP '1999-01-01'
                          THEN {_SQL_QTY} ELSE CAST(0 AS DECIMAL(1,0)) END) * 3
                 > SUM({_SQL_QTY})
      )
    """,
    doc="""TPC-H Q20 shape (potential part promotion): ASIA-region
    suppliers who moved more than a third of their all-time red-part
    volume in 1997-98 alone — the original's nested IN over an
    aggregated HAVING (availqty > 0.5 * shipped becomes a
    window-vs-total case-sum, keeping the fraction-of-an-aggregate
    comparison). The inequality is multiplied through (x*3 > total) so
    it stays in exact DECIMAL. The IN subquery decorrelates to a LEFT SEMI join on
    s_suppkey; the LIKE filter prunes part before the grouped scan.""",
    tags=("composite", "tpch", "subquery"),
)
def q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    supplier = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")

    in_window = (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp")) & (
        F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp")
    )
    zero = F.lit(0).cast("decimal(1,0)")
    qualifying = (
        lineitem.join(
            F.broadcast(part.filter(F.col("p_name").like("red%"))),
            lineitem.l_partkey == part.p_partkey,
        )
        .groupBy("l_suppkey")
        .agg(
            F.sum(F.when(in_window, _qty()).otherwise(zero)).alias("qty_win"),
            F.sum(_qty()).alias("qty_all"),
        )
        .filter(F.col("qty_win") * 3 > F.col("qty_all"))
        .select("l_suppkey")
    )
    region = load(spark, sf_dir, "region")
    asia_nations = nation.join(
        F.broadcast(region.filter(F.col("r_name") == "ASIA")),
        nation.n_regionkey == region.r_regionkey,
        "left_semi",
    )
    return (
        supplier.join(
            F.broadcast(asia_nations),
            supplier.s_nationkey == asia_nations.n_nationkey,
        )
        .join(qualifying, supplier.s_suppkey == qualifying.l_suppkey, "left_semi")
        .select("s_name", "s_acctbal")
    )


# ---------------------------------------------------------------------------
# Q21: suppliers who kept orders waiting (EXISTS / NOT EXISTS self-joins)
# ---------------------------------------------------------------------------


@register(
    "q21_waiting_suppliers",
    oracle="""
    SELECT s.s_name, COUNT(1) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
    JOIN orders o    ON o.o_orderkey = l1.l_orderkey
    JOIN nation n    ON n.n_nationkey = s.s_nationkey
    JOIN region r    ON r.r_regionkey = n.n_regionkey
    WHERE o.o_orderstatus = 'F' AND r.r_name = 'EUROPE'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 100
    """,
    doc="""TPC-H Q21 shape (suppliers who kept orders waiting): on
    finalized multi-supplier orders, count the late lines whose
    supplier was the ONLY late one — the original's EXISTS +
    NOT EXISTS pair of correlated self-joins on lineitem (lateness =
    shipped >60 days after order date, standing in for
    receipt > commit; the nation filter widens to the EUROPE region
    so the answer is non-empty at every test SF). The Spark plan rewrites both subqueries as ONE
    per-order aggregate: n_suppliers = COUNT(DISTINCT suppkey) and
    n_late_suppliers = COUNT(DISTINCT suppkey WHERE late); a late l1
    row qualifies iff n_suppliers >= 2 (EXISTS: someone else supplied)
    and n_late_suppliers = 1 (NOT EXISTS: nobody else was late — l1's
    own supplier is the one). One extra scan + one join replaces two
    correlated probes — the rewrite that keeps Q21 linear at 100 TB.
    Deterministic numwait/name tiebreak on the top-100.""",
    tags=("composite", "tpch", "subquery", "self-join"),
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    supplier = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")

    orders_f = orders.filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    # per-order supplier census over finalized orders (one scan, one agg)
    per_order = (
        lineitem.join(orders_f, lineitem.l_orderkey == orders_f.o_orderkey)
        .groupBy(F.col("l_orderkey").alias("po_orderkey"))
        .agg(
            F.countDistinct("l_suppkey").alias("n_suppliers"),
            F.countDistinct(F.when(late, F.col("l_suppkey"))).alias(
                "n_late_suppliers"
            ),
        )
    )
    region = load(spark, sf_dir, "region")
    eur_nations = nation.join(
        F.broadcast(region.filter(F.col("r_name") == "EUROPE")),
        nation.n_regionkey == region.r_regionkey,
        "left_semi",
    )
    l1 = (
        lineitem.join(orders_f, lineitem.l_orderkey == orders_f.o_orderkey)
        .filter(late)
        .join(supplier, lineitem.l_suppkey == supplier.s_suppkey)
        .join(
            F.broadcast(eur_nations),
            supplier.s_nationkey == eur_nations.n_nationkey,
        )
    )
    return (
        l1.join(per_order, l1.l_orderkey == per_order.po_orderkey)
        .filter((F.col("n_suppliers") >= 2) & (F.col("n_late_suppliers") == 1))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )
