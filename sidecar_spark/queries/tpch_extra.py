"""Extended TPC-H-style battery: the join/subquery/statistical operator
families not covered by queries/relational.py, adapted to the reduced
testdata schema (no partsupp; lineitem lacks commit/receipt dates).

The reference has no relational operators (SURVEY.md §2.7) — Spark SQL
supplies them; these entries pin the engine's behavior against DuckDB
oracles per the driver contract. Same parity conventions as
relational.py (aliases on both sides, money→round 2, ratios→round 6,
temporal outputs as strings, LIMIT carries a total tie-break order).
"""

from __future__ import annotations

import os

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from sidecar_spark.functions.dedup import hash60
from sidecar_spark.queries.registry import query, t

DATE_FMT = "yyyy-MM-dd"

# DuckDB twin of functions/dedup.py::hash60 over a SQL expression
_H60 = "('0x' || substr(md5({e}), 1, 15))::BIGINT"


def _dt(col):
    return F.date_format(col, DATE_FMT)


def money(col):
    return F.round(col, 2)


def REVENUE():
    """Extended-price revenue expression. A function, not a module
    constant: building a Column requires an active SparkContext, and
    the driver may import this module before creating its session."""
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


# ---------------------------------------------------------------------------
# multi-nation joins (Q7 / Q8 / Q9 shapes)
# ---------------------------------------------------------------------------

@query(
    "q7_volume_shipping",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           year(l_shipdate) AS l_year,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM supplier
    JOIN lineitem ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark, sf_dir):
    """TPC-H Q7 analog: bilateral trade volume. The nation dim joins are
    broadcasts; the disjunctive nation filter prunes before the
    fact-side shuffle."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    n1 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(money(F.sum(REVENUE())).alias("revenue"))
    )


@query(
    "q8_market_share",
    oracle="""
    SELECT o_year,
           round(sum(CASE WHEN nation = 'NATION_5' THEN volume ELSE 0 END)
                 / sum(volume), 6) AS mkt_share
    FROM (
      SELECT year(o_orderdate) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n2.n_name AS nation
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region   ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'AMERICA' AND p_type = 'PROMO')
    GROUP BY o_year
    """,
)
def q8_market_share(spark, sf_dir):
    """TPC-H Q8 analog: national market share = conditional-sum ratio.
    Seven-table join with every dimension broadcast; one fact shuffle."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    s = t(spark, sf_dir, "supplier")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n1 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region"))
    n2 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation"))
    r = t(spark, sf_dir, "region").where(F.col("r_name") == "AMERICA")
    vol = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .select(F.year("o_orderdate").alias("o_year"), REVENUE().alias("volume"),
                F.col("nation"))
    )
    return (
        vol.groupBy("o_year")
        .agg(F.round(
            F.sum(F.when(F.col("nation") == "NATION_5", F.col("volume")).otherwise(0.0))
            / F.sum("volume"), 6).alias("mkt_share"))
    )


@query(
    "q9_product_profit",
    oracle="""
    SELECT n_name AS nation, year(o_orderdate) AS o_year,
           CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                               AS DECIMAL(18, 6))), 2)
                AS DOUBLE) AS profit
    FROM part
    JOIN lineitem ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%widget%'
    GROUP BY n_name, year(o_orderdate)
    """,
)
def q9_product_profit(spark, sf_dir):
    """TPC-H Q9 analog (no partsupp table in the testdata schema, so
    profit omits supply cost): revenue on a part-name pattern by
    supplier nation and order year."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").where(F.col("p_name").like("%widget%"))
    s = t(spark, sf_dir, "supplier")
    o = t(spark, sf_dir, "orders")
    n = t(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        # decimal summation: group sums here are in the millions, where
        # double add-order noise exceeds the 2-decimal round — decimal
        # addition is order-independent in both engines
        .agg(money(F.sum(REVENUE().cast("decimal(18,6)")).cast("double")).alias("profit"))
    )


# ---------------------------------------------------------------------------
# outer join + two-level aggregation (Q13)
# ---------------------------------------------------------------------------

@query(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey)
    GROUP BY c_count
    """,
)
def q13_customer_distribution(spark, sf_dir):
    """TPC-H Q13: order-count histogram via left outer join (count of a
    nullable column skips the no-order null rows)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# ---------------------------------------------------------------------------
# conditional-ratio aggregate (Q14)
# ---------------------------------------------------------------------------

@query(
    "q14_promo_effect",
    oracle="""
    SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 6) AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-03-01'
      AND l_shipdate <  TIMESTAMP '1997-04-01'
    """,
)
def q14_promo_effect(spark, sf_dir):
    """TPC-H Q14: promotion revenue share in one month."""
    li = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp")))
    p = t(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(F.round(
            100.0 * F.sum(F.when(F.col("p_type") == "PROMO", REVENUE()).otherwise(0.0))
            / F.sum(REVENUE()), 6).alias("promo_revenue_pct"))
    )


# ---------------------------------------------------------------------------
# scalar subquery over an aggregate (Q15)
# ---------------------------------------------------------------------------

@query(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             sum(l_extendedprice * (1 - l_discount)) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, round(total_revenue, 2) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15: supplier(s) with the quarter's max revenue. The
    scalar max is a broadcast of a 1-row aggregate — no second scan of
    lineitem (the revenue view is reused; Spark dedups the subplan)."""
    li = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp")))
    s = t(spark, sf_dir, "supplier")
    revenue = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(REVENUE()).alias("total_revenue"))
    )
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    return (
        revenue.join(F.broadcast(mx), revenue.total_revenue == mx.mx)
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", money(F.col("total_revenue")).alias("total_revenue"))
    )


# ---------------------------------------------------------------------------
# correlated average subquery (Q17)
# ---------------------------------------------------------------------------

@query(
    "q17_small_qty_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem
    JOIN (SELECT l_partkey AS a_partkey, 0.5 * avg(l_quantity) AS qty_cut
          FROM lineitem GROUP BY l_partkey) ON l_partkey = a_partkey
    WHERE l_quantity < qty_cut
    """,
)
def q17_small_qty_revenue(spark, sf_dir):
    """TPC-H Q17 shape: rows below half their part's average quantity.
    The per-part average is a broadcast aggregate of the same scan —
    Catalyst reuses the exchange instead of re-reading the table."""
    li = t(spark, sf_dir, "lineitem")
    cut = (
        li.groupBy(F.col("l_partkey").alias("a_partkey"))
        .agg((0.5 * F.avg("l_quantity")).alias("qty_cut"))
    )
    return (
        li.join(F.broadcast(cut), li.l_partkey == cut.a_partkey)
        .where(F.col("l_quantity") < F.col("qty_cut"))
        .agg(money(F.sum("l_extendedprice") / 7.0).alias("avg_yearly"))
    )


# ---------------------------------------------------------------------------
# IN over a HAVING subquery (Q18)
# ---------------------------------------------------------------------------

@query(
    "q18_large_volume_customer",
    oracle="""
    SELECT c_name, c_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           round(o_totalprice, 2) AS totalprice,
           round(sum(l_quantity), 2) AS sum_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                         GROUP BY l_orderkey HAVING sum(l_quantity) > 300)
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def q18_large_volume_customer(spark, sf_dir):
    """TPC-H Q18: customers with any order above 300 total quantity.
    The IN-subquery is a left-semi join against a pre-aggregated key
    set (small → broadcast)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("s"))
        .where(F.col("s") > 300).select("l_orderkey")
    )
    return (
        o.join(F.broadcast(big), o.o_orderkey == big.l_orderkey, "left_semi")
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(money(F.sum("l_quantity")).alias("sum_qty"))
        .select("c_name", "c_custkey", "o_orderkey",
                _dt("o_orderdate").alias("orderdate"),
                money(F.col("o_totalprice")).alias("totalprice"), "sum_qty")
        .orderBy(F.desc("totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


# ---------------------------------------------------------------------------
# disjunctive multi-predicate join (Q19)
# ---------------------------------------------------------------------------

@query(
    "q19_disjunctive_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*) AS n_items
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
           AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
           AND l_quantity BETWEEN 20 AND 40)
    """,
)
def q19_disjunctive_revenue(spark, sf_dir):
    """TPC-H Q19: OR-of-ANDs across both join sides — the join itself
    stays an equi-join on partkey; the disjunction is a post-join
    filter (Catalyst also derives the brand/size prune on the part
    side)."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 20))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(10, 30)
           & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(20, 50)
           & F.col("l_quantity").between(20, 40))
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .where(cond)
        .agg(money(F.sum(REVENUE())).alias("revenue"),
             F.count(F.lit(1)).alias("n_items"))
    )


# ---------------------------------------------------------------------------
# global scalar average + anti join (Q22)
# ---------------------------------------------------------------------------

@query(
    "q22_sales_opportunity",
    oracle="""
    SELECT c_mktsegment, count(*) AS n_cust,
           round(sum(c_acctbal), 2) AS total_bal
    FROM customer c
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2001-01-01')
    GROUP BY c_mktsegment
    """,
)
def q22_sales_opportunity(spark, sf_dir):
    """TPC-H Q22 shape: above-average-balance customers with no recent
    orders. Scalar average broadcasts as a 1-row cross join; the NOT
    EXISTS is a left-anti join."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp"))
    avg_bal = (c.where(F.col("c_acctbal") > 0)
               .agg(F.avg("c_acctbal").alias("cut")))
    return (
        c.join(F.broadcast(avg_bal)).where(F.col("c_acctbal") > F.col("cut"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_cust"),
             money(F.sum("c_acctbal")).alias("total_bal"))
    )


# ---------------------------------------------------------------------------
# NOT IN (null-aware anti join) — Q16 shape
# ---------------------------------------------------------------------------

@query(
    "not_in_anti_join",
    oracle="""
    SELECT p_brand, p_type, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand NOT IN ('Brand#1', 'Brand#2')
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                            WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type
    """,
)
def not_in_anti_join(spark, sf_dir):
    """TPC-H Q16 shape: NOT IN over a subquery. SQL NOT IN is
    null-aware (one NULL in the list empties the result) — expressed
    here via spark.sql so Catalyst plans the NullAwareAntiJoin
    (l_suppkey/s_suppkey are non-null in this data, so it matches the
    plain anti join the oracle computes)."""
    t(spark, sf_dir, "part").createOrReplaceTempView("part_ni")
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_ni")
    t(spark, sf_dir, "supplier").createOrReplaceTempView("supplier_ni")
    return spark.sql("""
        SELECT p_brand, p_type, count(DISTINCT l_suppkey) AS supplier_cnt
        FROM part_ni JOIN lineitem_ni ON p_partkey = l_partkey
        WHERE p_brand NOT IN ('Brand#1', 'Brand#2')
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier_ni
                                WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type
    """)


# ---------------------------------------------------------------------------
# double correlation (Q21 shape, adapted: no receipt/commit dates)
# ---------------------------------------------------------------------------

@query(
    "q21_waiting_supplier",
    oracle="""
    SELECT s_name, count(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def q21_waiting_supplier(spark, sf_dir):
    """TPC-H Q21 shape (adapted to this schema: 'returned' stands in
    for 'late'): suppliers who were the ONLY one with a returned item
    on a multi-supplier finished order — EXISTS + NOT EXISTS double
    correlation on the same fact table, planned as semi + anti join."""
    t(spark, sf_dir, "supplier").createOrReplaceTempView("supplier_q21")
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_q21")
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders_q21")
    return spark.sql("""
        SELECT s_name, count(*) AS numwait
        FROM supplier_q21
        JOIN lineitem_q21 l1 ON s_suppkey = l1.l_suppkey
        JOIN orders_q21 ON o_orderkey = l1.l_orderkey
        WHERE o_orderstatus = 'F'
          AND l1.l_returnflag = 'R'
          AND EXISTS (SELECT 1 FROM lineitem_q21 l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem_q21 l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_returnflag = 'R')
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 20
    """)


# ---------------------------------------------------------------------------
# correlated min (Q2 shape, no partsupp)
# ---------------------------------------------------------------------------

@query(
    "min_price_part_per_brand",
    oracle="""
    SELECT p.p_brand, p.p_partkey, round(p.p_retailprice, 2) AS price
    FROM part p
    WHERE p.p_retailprice = (SELECT min(p2.p_retailprice) FROM part p2
                             WHERE p2.p_brand = p.p_brand)
    """,
)
def min_price_part_per_brand(spark, sf_dir):
    """TPC-H Q2 shape (correlated min subquery): the cheapest part(s)
    of each brand — rewritten as a broadcast join against the per-brand
    min, the standard decorrelation Spark also applies to the SQL
    form."""
    p = t(spark, sf_dir, "part")
    mins = p.groupBy(F.col("p_brand").alias("b")).agg(
        F.min("p_retailprice").alias("min_price"))
    return (
        p.join(F.broadcast(mins),
               (p.p_brand == mins.b) & (p.p_retailprice == mins.min_price))
        .select("p_brand", "p_partkey", money(F.col("p_retailprice")).alias("price"))
    )


# ---------------------------------------------------------------------------
# EXISTS-gated priority count (Q4)
# ---------------------------------------------------------------------------

@query(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1997-04-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark, sf_dir):
    """TPC-H Q4 (adapted: 'has a returned item' stands in for 'late
    lineitem' — the schema has no commit/receipt dates): priority
    histogram of one quarter's orders gated by an EXISTS correlation,
    planned as a left-semi join. The date filter prunes orders before
    the semi join, so the shuffle carries one quarter, not the table."""
    o = t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp")))
    li = t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# ---------------------------------------------------------------------------
# share-of-total HAVING (Q11 shape, revenue stands in for partsupp value)
# ---------------------------------------------------------------------------

@query(
    "q11_value_concentration",
    oracle="""
    WITH supp_rev AS (
      SELECT l_suppkey, sum(l_extendedprice * (1 - l_discount)) AS rev
      FROM lineitem GROUP BY l_suppkey)
    SELECT l_suppkey, round(rev, 2) AS total_rev
    FROM supp_rev
    WHERE rev > (SELECT 1.05 * avg(rev) FROM supp_rev)
    """,
)
def q11_value_concentration(spark, sf_dir):
    """TPC-H Q11 shape (no partsupp table — supplier lineitem revenue
    stands in for inventory value): groups whose value exceeds a
    fraction of the whole. The scalar cutoff is a 1-row broadcast over
    the SAME aggregate — Catalyst reuses the exchange, one lineitem
    scan total. Scale-free threshold (vs avg) keeps the query
    meaningful at any SF."""
    li = t(spark, sf_dir, "lineitem")
    supp_rev = li.groupBy("l_suppkey").agg(F.sum(REVENUE()).alias("rev"))
    cut = supp_rev.agg((1.05 * F.avg("rev")).alias("cut"))
    return (
        supp_rev.join(F.broadcast(cut)).where(F.col("rev") > F.col("cut"))
        .select("l_suppkey", money(F.col("rev")).alias("total_rev"))
    )


# ---------------------------------------------------------------------------
# dual conditional counts after a fact-fact join (Q12)
# ---------------------------------------------------------------------------

@query(
    "q12_priority_class",
    oracle="""
    SELECT l_linestatus,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY l_linestatus
    """,
)
def q12_priority_class(spark, sf_dir):
    """TPC-H Q12 (adapted: linestatus stands in for shipmode): one year
    of shipments classified by order priority with paired conditional
    counts — the canonical pivot-in-aggregate shape. Fact-fact join
    shuffles only the shipdate-pruned lineitem year."""
    li = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp")))
    o = t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
             F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"))
    )


# ---------------------------------------------------------------------------
# nested-IN semi-join chain (Q20 shape)
# ---------------------------------------------------------------------------

@query(
    "q20_widget_suppliers",
    oracle="""
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey FROM lineitem
      WHERE l_partkey IN (SELECT p_partkey FROM part
                          WHERE p_name LIKE '%widget%')
      GROUP BY l_suppkey
      HAVING sum(l_quantity) > (
        SELECT 1.0 * avg(q) FROM (
          SELECT sum(l_quantity) AS q FROM lineitem
          WHERE l_partkey IN (SELECT p_partkey FROM part
                              WHERE p_name LIKE '%widget%')
          GROUP BY l_suppkey)))
    """,
)
def q20_widget_suppliers(spark, sf_dir):
    """TPC-H Q20 shape (no partsupp — shipped quantity stands in for
    availqty): suppliers who moved above-average volume of widget
    parts, via the nested-IN chain part→lineitem→supplier. Quantities
    are integral-valued doubles, so the sums (and the avg cutoff) are
    exactly reproducible across engines. Part filter broadcasts; the
    per-supplier aggregate is computed once and reused for its own
    average."""
    p = t(spark, sf_dir, "part").where(F.col("p_name").like("%widget%"))
    li = t(spark, sf_dir, "lineitem")
    widget_qty = (
        li.join(F.broadcast(p.select("p_partkey")),
                li.l_partkey == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey").agg(F.sum("l_quantity").alias("q"))
    )
    cut = widget_qty.agg((1.0 * F.avg("q")).alias("cut"))
    keys = widget_qty.join(F.broadcast(cut)).where(
        F.col("q") > F.col("cut")).select("l_suppkey")
    s = t(spark, sf_dir, "supplier")
    return (
        s.join(F.broadcast(keys), s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
    )


# ---------------------------------------------------------------------------
# explicit GROUPING SETS with grouping_id
# ---------------------------------------------------------------------------

@query(
    "grouping_sets_agg",
    oracle="""
    SELECT o_orderpriority, o_orderstatus,
           count(*) AS n, round(sum(o_totalprice), 2) AS sum_price,
           CAST(grouping(o_orderpriority) AS BIGINT) * 2
             + CAST(grouping(o_orderstatus) AS BIGINT) AS gid
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
    """,
)
def grouping_sets_agg(spark, sf_dir):
    """Explicit GROUPING SETS (not expressible as rollup/cube) with
    grouping_id disambiguation."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders_gs")
    return spark.sql("""
        SELECT o_orderpriority, o_orderstatus,
               count(*) AS n, round(sum(o_totalprice), 2) AS sum_price,
               grouping_id(o_orderpriority, o_orderstatus) AS gid
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
    """)


# ---------------------------------------------------------------------------
# range (band) join
# ---------------------------------------------------------------------------

_BANDS = [(0.0, 50.0, "low"), (50.0, 150.0, "mid"),
          (150.0, 300.0, "high"), (300.0, 1e9, "whale")]


@query(
    "range_band_join",
    oracle="""
    WITH bands(lo, hi, band) AS (VALUES
        (0.0, 50.0, 'low'), (50.0, 150.0, 'mid'),
        (150.0, 300.0, 'high'), (300.0, 1e9, 'whale'))
    SELECT band, event_type, count(*) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM events JOIN bands ON value >= lo AND value < hi
    GROUP BY band, event_type
    """,
)
def range_band_join(spark, sf_dir):
    """Range join: banding a measure against an interval dimension.
    The band table is tiny → broadcast nested-loop with interval
    predicates; at scale the alternative is a bucketized equi-join on
    floor(value/step)."""
    e = t(spark, sf_dir, "events")
    bands = e.sparkSession.createDataFrame(_BANDS, "lo double, hi double, band string")
    return (
        e.join(F.broadcast(bands),
               (e.value >= F.col("lo")) & (e.value < F.col("hi")))
        .groupBy("band", "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"),
             money(F.sum("value")).alias("sum_value"))
    )


# ---------------------------------------------------------------------------
# statistical aggregates
# ---------------------------------------------------------------------------

@query(
    "stats_agg",
    oracle="""
    SELECT l_returnflag,
           round(stddev_samp(l_quantity), 6)                  AS sd_qty,
           round(var_samp(l_extendedprice), 2)                AS var_price,
           round(corr(l_quantity, l_extendedprice), 6)        AS corr_qty_price,
           round(covar_samp(l_quantity, l_extendedprice), 4)  AS covar_qty_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def stats_agg(spark, sf_dir):
    """Statistical aggregate family (stddev/variance/corr/covar).
    skewness/kurtosis exist in both engines but use different bias
    corrections (sample vs population) — excluded from the parity set."""
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
        F.round(F.var_samp("l_extendedprice"), 2).alias("var_price"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("covar_qty_price"),
    )


@query(
    "percentile_agg",
    oracle="""
    SELECT o_orderpriority,
           round(quantile_cont(o_totalprice, 0.5), 4)  AS p50,
           round(quantile_cont(o_totalprice, 0.9), 4)  AS p90,
           round(quantile_cont(o_totalprice, 0.99), 4) AS p99
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def percentile_agg(spark, sf_dir):
    """Exact interpolated percentiles (Spark `percentile` ==
    DuckDB `quantile_cont`). The approx_percentile variant is the
    100 TB path; exact is used here for oracle parity."""
    o = t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90"),
        F.round(F.expr("percentile(o_totalprice, 0.99)"), 4).alias("p99"),
    )


# ---------------------------------------------------------------------------
# skew-aware join (salting) — result identical to the plain join
# ---------------------------------------------------------------------------

_N_SALT = 8


@query(
    "skew_salted_join",
    oracle="""
    SELECT c_mktsegment, count(*) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY c_mktsegment
    """,
)
def skew_salted_join(spark, sf_dir):
    """Salted join for skewed keys: the probe side gets a deterministic
    salt (event_id % N — reproducible, unlike rand()), the build side is
    exploded N ways, and the join key becomes (key, salt) so one hot key
    spreads over N partitions. Result set is provably identical to the
    plain join the oracle runs. (On 3.2+ AQE's skewJoin handles this
    automatically; explicit salting is the portable fallback and the
    demonstration here.)"""
    e = t(spark, sf_dir, "events").withColumn(
        "salt", (F.col("event_id") % _N_SALT).cast("int"))
    c = t(spark, sf_dir, "customer").withColumn(
        "salt", F.explode(F.array(*[F.lit(i) for i in range(_N_SALT)])))
    return (
        e.join(c, (e.user_id == c.c_custkey) & (e.salt == c.salt))
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_events"),
             money(F.sum("value")).alias("sum_value"))
    )


# ---------------------------------------------------------------------------
# bucketed co-located join (no exchange on either side)
# ---------------------------------------------------------------------------

@query(
    "bucketed_colocated_join",
    oracle="""
    SELECT l_orderkey, o_orderpriority,
           count(*) AS n_items,
           CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                               AS DECIMAL(18, 6))), 2)
                AS DOUBLE) AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY l_orderkey, o_orderpriority
    """,
)
def bucketed_colocated_join(spark, sf_dir):
    """Bucketing demo — the third join-locality tool next to broadcast
    and salting: both fact tables are written bucketed+sorted by the
    join key, so the merge join AND the per-key aggregation run with
    ZERO exchanges (at 100 TB this is the difference between reading
    co-located buckets and reshuffling the whole fact table; the
    one-time bucketed write is amortized over every later join).
    The .hint("merge") pins SMJ so AQE's broadcast conversion doesn't
    hide the bucketing (results are identical either way — the oracle
    is the plain join)."""
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    root = f"/tmp/sidecar-bucketed/{tag}"
    specs = [
        (f"li_bkt_{tag}", t(spark, sf_dir, "lineitem"), "l_orderkey"),
        (f"o_bkt_{tag}", t(spark, sf_dir, "orders"), "o_orderkey"),
    ]
    for name, src, key in specs:
        if not spark.catalog.tableExists(name):
            path = os.path.join(root, name)
            if os.path.exists(os.path.join(path, "_SUCCESS")):
                # files survive from an earlier session whose in-memory
                # catalog died with it — re-register the external
                # bucketed table instead of rewriting the data
                cols = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                                 for f in src.schema.fields)
                spark.sql(f"""
                    CREATE TABLE {name} ({cols}) USING parquet
                    CLUSTERED BY ({key}) SORTED BY ({key}) INTO 8 BUCKETS
                    LOCATION '{path}'""")
            else:
                (src.write.bucketBy(8, key).sortBy(key)
                 .option("path", path)
                 .mode("overwrite").format("parquet").saveAsTable(name))
    li = spark.table(specs[0][0])
    o = spark.table(specs[1][0])
    return (
        li.hint("merge").join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderpriority")
        # decimal sum: the bucket-sorted input feeds the agg in a
        # different order than the oracle's scan — decimal addition is
        # order-independent
        .agg(F.count(F.lit(1)).alias("n_items"),
             money(F.sum(REVENUE().cast("decimal(18,6)")).cast("double"))
             .alias("revenue"))
    )


# ---------------------------------------------------------------------------
# partitioned write + partition pruning
# ---------------------------------------------------------------------------

@query(
    "partition_pruned_scan",
    oracle="""
    SELECT event_type, count(*) AS n, round(sum(value), 2) AS sum_value,
           count(DISTINCT user_id) AS n_users
    FROM events
    WHERE event_type IN ('purchase', 'signup')
    GROUP BY event_type
    """,
)
def partition_pruned_scan(spark, sf_dir):
    """Hive-style partitioned layout + partition pruning: events are
    written once partitioned by event_type; the IN-filter then prunes
    to 2 of 5 partition directories at PLANNING time (PartitionFilters
    in the scan — zero I/O for the other three). At 100 TB partition
    pruning on coarse keys (date, source) is the first 10-100×."""
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    root = f"/tmp/sidecar-partitioned/{tag}/events"
    marker = os.path.join(root, "_SUCCESS")
    if not os.path.exists(marker):
        (t(spark, sf_dir, "events")
         .write.mode("overwrite").partitionBy("event_type").parquet(root))
    e = spark.read.parquet(root)
    return (
        e.where(F.col("event_type").isin("purchase", "signup"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"),
             money(F.sum("value")).alias("sum_value"),
             F.countDistinct("user_id").alias("n_users"))
    )


# ---------------------------------------------------------------------------
# windowed ntile / percent_rank (ranking family beyond row_number)
# ---------------------------------------------------------------------------

@query(
    "window_ntile_rank",
    oracle="""
    SELECT s_suppkey,
           ntile(4) OVER (ORDER BY s_acctbal DESC, s_suppkey)       AS quartile,
           round(percent_rank() OVER (ORDER BY s_acctbal DESC, s_suppkey), 6)
               AS pct_rank,
           rank() OVER (ORDER BY s_nationkey)                        AS nation_rank,
           dense_rank() OVER (ORDER BY s_nationkey)                  AS nation_dense
    FROM supplier
    """,
)
def window_ntile_rank(spark, sf_dir):
    """Ranking-window family: ntile, percent_rank, rank, dense_rank.
    (Global windows — fine on a dim table; fact-side rankings always
    carry a PARTITION BY, as in topk_per_group.)"""
    s = t(spark, sf_dir, "supplier")
    w_bal = W.orderBy(F.desc("s_acctbal"), F.asc("s_suppkey"))
    w_nat = W.orderBy("s_nationkey")
    return s.select(
        "s_suppkey",
        F.ntile(4).over(w_bal).alias("quartile"),
        F.round(F.percent_rank().over(w_bal), 6).alias("pct_rank"),
        F.rank().over(w_nat).alias("nation_rank"),
        F.dense_rank().over(w_nat).alias("nation_dense"),
    )


@query(
    "boolean_agg_functions",
    oracle="""
    SELECT l_returnflag,
           bool_and(l_quantity > 0) AS all_qty_positive,
           bool_or(l_discount > 0.08) AS any_deep_discount,
           count(*) FILTER (WHERE l_tax > 0.04) AS n_high_tax,
           count(*) FILTER (WHERE l_discount = 0) AS n_no_discount
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def boolean_agg_functions(spark, sf_dir):
    """Boolean/conditional aggregate family: bool_and / bool_or /
    count_if — the data-quality assertion shape (\"every row satisfies
    X, any row violates Y\") that runs as cheap partial aggregates."""
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.bool_and(F.col("l_quantity") > 0).alias("all_qty_positive"),
        F.bool_or(F.col("l_discount") > 0.08).alias("any_deep_discount"),
        F.count_if(F.col("l_tax") > 0.04).alias("n_high_tax"),
        F.count_if(F.col("l_discount") == 0).alias("n_no_discount"),
    )


@query(
    "q16_supplier_part_count",
    oracle="""
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#11'
      AND p_type NOT LIKE 'PROMO%'
      AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                            WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
)
def q16_supplier_part_count(spark, sf_dir):
    """TPC-H Q16 adapted to the reduced schema (no partsupp — the
    part↔supplier relation comes from lineitem; the comment-based
    supplier blacklist becomes a negative-balance one). Plan shape:
    the part filter prunes before the fact join (broadcast — part is
    dim-sized), the blacklist is a broadcast LEFT ANTI join (NOT IN
    is safe to rewrite: s_suppkey is non-null), and count(DISTINCT)
    runs as a two-phase partial-distinct aggregate."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#11")
        & ~F.col("p_type").startswith("PROMO")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49))
    bad = t(spark, sf_dir, "supplier").where(
        F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(F.broadcast(bad),
                li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "approx_distinct_audit",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_orderkey) AS exact_orders,
           count(DISTINCT l_partkey) AS exact_parts,
           TRUE AS approx_orders_ok,
           TRUE AS approx_parts_ok
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def approx_distinct_audit(spark, sf_dir):
    """HyperLogLog++ cardinality vs exact: the 100 TB path for
    distinct counts is the sketch (fixed-size partial state, no
    distinct-expand shuffle); this audit runs both and asserts the
    sketch lands within its 5% error budget, so the oracle pins the
    exact value AND the sketch's fitness. (DuckDB's approx_count_
    distinct uses a different HLL — comparing raw sketch outputs
    across engines would be meaningless; the within-tolerance boolean
    is the portable contract.)"""
    li = t(spark, sf_dir, "lineitem")
    # two exact-distinct columns in ONE aggregate would plan as an
    # Expand (row-tripling) shuffle; instead each exact count runs as
    # its own two-phase distinct (map-side dedup before the shuffle)
    # and the sketches share a third, Expand-free pass — three narrow
    # 2-column scans beat one 3× Expand at any scale
    def exact(col, alias):
        return (li.select("l_returnflag", col).distinct()
                .groupBy("l_returnflag")
                .agg(F.count(F.lit(1)).alias(alias)))

    sketches = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", 0.02).alias("ao"),
        F.approx_count_distinct("l_partkey", 0.02).alias("ap"),
    )
    g = (exact("l_orderkey", "exact_orders")
         .join(exact("l_partkey", "exact_parts"), "l_returnflag")
         .join(sketches, "l_returnflag"))
    return g.select(
        "l_returnflag", "exact_orders", "exact_parts",
        (F.abs(F.col("ao") - F.col("exact_orders"))
         <= 0.05 * F.col("exact_orders")).alias("approx_orders_ok"),
        (F.abs(F.col("ap") - F.col("exact_parts"))
         <= 0.05 * F.col("exact_parts")).alias("approx_parts_ok"),
    )


@query(
    "dpp_join_pruning",
    oracle="""
    WITH type_dim AS (
      SELECT * FROM (VALUES ('purchase', 'conversion'),
                            ('signup',   'conversion'),
                            ('click',    'traffic'),
                            ('view',     'traffic'),
                            ('login',    'traffic'))
             AS v(event_type, category))
    SELECT category, count(*) AS n, round(sum(value), 2) AS sum_value
    FROM events JOIN type_dim USING (event_type)
    WHERE category = 'conversion'
    GROUP BY category
    """,
)
def dpp_join_pruning(spark, sf_dir):
    """Dynamic partition pruning: the fact side is the Hive-
    partitioned events layout (shared with partition_pruned_scan) and
    the pruning predicate arrives only through a dimension join —
    category='conversion' on a type dim — so Catalyst injects a
    runtime subquery (dynamicpruningexpression on the scan's
    PartitionFilters) that reads the dim first and skips the 3
    non-qualifying partition directories. This is the star-join
    analog of static pruning: at 100 TB, date-dim → fact-partition
    DPP is the difference between scanning a week and scanning years.
    The dim is registered as a (tiny) parquet table, not a literal
    IN-list, so the filter is genuinely non-foldable at plan time."""
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    root = f"/tmp/sidecar-partitioned/{tag}/events"
    marker = os.path.join(root, "_SUCCESS")
    if not os.path.exists(marker):
        (t(spark, sf_dir, "events")
         .write.mode("overwrite").partitionBy("event_type").parquet(root))
    dim_root = "/tmp/sidecar-partitioned/type_dim"
    if not os.path.exists(os.path.join(dim_root, "_SUCCESS")):
        spark.createDataFrame(
            [("purchase", "conversion"), ("signup", "conversion"),
             ("click", "traffic"), ("view", "traffic"),
             ("login", "traffic")],
            "event_type string, category string",
        ).coalesce(1).write.mode("overwrite").parquet(dim_root)
    e = spark.read.parquet(root)
    dim = spark.read.parquet(dim_root).where(F.col("category") == "conversion")
    return (
        e.join(dim, "event_type")
        .groupBy("category")
        .agg(F.count(F.lit(1)).alias("n"),
             money(F.sum("value")).alias("sum_value"))
    )


@query(
    "referential_integrity_audit",
    oracle="""
    SELECT 'orders->customer' AS relation,
           (SELECT count(*) FROM orders) AS n_child_rows,
           (SELECT count(*) FROM orders
            WHERE o_custkey NOT IN (SELECT c_custkey FROM customer))
               AS n_orphans
    UNION ALL
    SELECT 'lineitem->orders',
           (SELECT count(*) FROM lineitem),
           (SELECT count(*) FROM lineitem
            WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders))
    UNION ALL
    SELECT 'lineitem->part',
           (SELECT count(*) FROM lineitem),
           (SELECT count(*) FROM lineitem
            WHERE l_partkey NOT IN (SELECT p_partkey FROM part))
    UNION ALL
    SELECT 'lineitem->supplier',
           (SELECT count(*) FROM lineitem),
           (SELECT count(*) FROM lineitem
            WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier))
    """,
)
def referential_integrity_audit(spark, sf_dir):
    """Foreign-key orphan audit across the star schema — the
    data-quality gate a pipeline runs before publishing a snapshot.
    Each relation is one broadcast LEFT OUTER pass over the child:
    total = count(*), orphans = count of unmatched parent keys (keys
    are non-null, so NOT IN ≡ no-match); at 100 TB each check is one
    fact scan with a broadcast dim, all four fused into one lazy
    union plan."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")

    def audit(child, fk, parent, pk, label):
        j = child.select(F.col(fk)).join(
            F.broadcast(parent.select(pk)),
            F.col(fk) == F.col(pk), "left")
        return (j.agg(F.count(F.lit(1)).alias("n_child_rows"),
                      F.count_if(F.isnull(pk)).alias("n_orphans"))
                .select(F.lit(label).alias("relation"),
                        "n_child_rows", "n_orphans"))

    pieces = [
        audit(o, "o_custkey", t(spark, sf_dir, "customer"),
              "c_custkey", "orders->customer"),
        audit(li, "l_orderkey", o, "o_orderkey", "lineitem->orders"),
        audit(li, "l_partkey", t(spark, sf_dir, "part"),
              "p_partkey", "lineitem->part"),
        audit(li, "l_suppkey", t(spark, sf_dir, "supplier"),
              "s_suppkey", "lineitem->supplier"),
    ]
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionAll(p)
    return out


@query(
    "approx_quantile_audit",
    oracle="""
    SELECT o_orderpriority,
           round(quantile_cont(o_totalprice, 0.5), 2) AS exact_p50,
           round(quantile_cont(o_totalprice, 0.95), 2) AS exact_p95,
           TRUE AS approx_p50_ok,
           TRUE AS approx_p95_ok
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def approx_quantile_audit(spark, sf_dir):
    """Approximate-quantile (Greenwald-Khanna) vs exact percentile:
    at 100 TB the sketch is the only viable path (bounded state,
    mergeable partials, no full sort) — this audit pins the exact
    interpolated quantile AND asserts the sketch lands inside the
    ±1%-rank value band, the sketch's actual guarantee. The band
    endpoints are themselves exact quantiles, so the boolean is
    engine-portable (sketch internals are not)."""
    o = t(spark, sf_dir, "orders")
    g = o.groupBy("o_orderpriority").agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("e50"),
        F.expr("percentile(o_totalprice, 0.95)").alias("e95"),
        F.expr("percentile(o_totalprice, 0.49)").alias("lo50"),
        F.expr("percentile(o_totalprice, 0.51)").alias("hi50"),
        F.expr("percentile(o_totalprice, 0.94)").alias("lo95"),
        F.expr("percentile(o_totalprice, 0.96)").alias("hi95"),
        F.expr("approx_percentile(o_totalprice, 0.5, 10000)").alias("a50"),
        F.expr("approx_percentile(o_totalprice, 0.95, 10000)").alias("a95"),
    )
    return g.select(
        "o_orderpriority",
        F.round("e50", 2).alias("exact_p50"),
        F.round("e95", 2).alias("exact_p95"),
        ((F.col("a50") >= F.col("lo50")) & (F.col("a50") <= F.col("hi50")))
        .alias("approx_p50_ok"),
        ((F.col("a95") >= F.col("lo95")) & (F.col("a95") <= F.col("hi95")))
        .alias("approx_p95_ok"),
    )


@query(
    "math_functions",
    oracle="""
    SELECT p_partkey,
           round(sqrt(p_retailprice), 6) AS f_sqrt,
           round(ln(p_retailprice), 6) AS f_ln,
           round(log10(p_retailprice), 6) AS f_log10,
           round(exp(p_retailprice / 1000.0), 6) AS f_exp,
           round(pow(p_retailprice, 1.5), 4) AS f_pow,
           round(sin(p_retailprice), 6) AS f_sin,
           round(atan2(p_retailprice, CAST(p_size AS DOUBLE)), 6) AS f_atan2,
           round(radians(p_size), 6) AS f_radians,
           CAST(sign(p_retailprice - 1000) AS DOUBLE) AS f_sign,
           round(mod(p_retailprice, 7.0), 6) AS f_mod,
           CAST(ceil(p_retailprice) AS BIGINT) AS f_ceil,
           CAST(floor(p_retailprice) AS BIGINT) AS f_floor
    FROM part
    """,
)
def math_functions(spark, sf_dir):
    """Scalar math-function family (sqrt/ln/log10/exp/pow/trig/
    sign/mod/ceil/floor) — whole-stage-codegen column math, zero
    shuffles. Both engines evaluate IEEE-double libm; round-6 (pow:
    round-4, magnitudes ~1e4) absorbs last-ulp library differences."""
    p = t(spark, sf_dir, "part")
    price, size = F.col("p_retailprice"), F.col("p_size")
    return p.select(
        "p_partkey",
        F.round(F.sqrt(price), 6).alias("f_sqrt"),
        F.round(F.log(price), 6).alias("f_ln"),
        F.round(F.log10(price), 6).alias("f_log10"),
        F.round(F.exp(price / 1000.0), 6).alias("f_exp"),
        F.round(F.pow(price, 1.5), 4).alias("f_pow"),
        F.round(F.sin(price), 6).alias("f_sin"),
        F.round(F.atan2(price, size.cast("double")), 6).alias("f_atan2"),
        F.round(F.radians(size), 6).alias("f_radians"),
        F.signum(price - 1000).alias("f_sign"),
        F.round(price % 7.0, 6).alias("f_mod"),
        F.ceil(price).alias("f_ceil"),
        F.floor(price).alias("f_floor"),
    )


# ---------------------------------------------------------------------------
# full-outer reconciliation, bloom-style join pre-filter, count-min sketch
# ---------------------------------------------------------------------------

@query(
    "full_outer_reconcile",
    oracle="""
    WITH c AS (
      SELECT c_nationkey AS k, count(*) AS n_cust,
             round(sum(c_acctbal), 2) AS cust_bal
      FROM customer WHERE c_acctbal > 9900 GROUP BY 1),
    s AS (
      SELECT s_nationkey AS k, count(*) AS n_supp,
             round(sum(s_acctbal), 2) AS supp_bal
      FROM supplier WHERE s_acctbal > 8000 GROUP BY 1)
    SELECT coalesce(c.k, s.k) AS nationkey,
           n_name,
           CASE WHEN c.k IS NOT NULL AND s.k IS NOT NULL THEN 'both'
                WHEN c.k IS NOT NULL THEN 'customer_only'
                ELSE 'supplier_only' END AS presence,
           coalesce(n_cust, 0) AS n_cust,
           coalesce(n_supp, 0) AS n_supp,
           coalesce(cust_bal, 0.0) AS cust_bal,
           coalesce(supp_bal, 0.0) AS supp_bal
    FROM c FULL OUTER JOIN s ON c.k = s.k
    JOIN nation ON coalesce(c.k, s.k) = n_nationkey
    """,
)
def full_outer_reconcile(spark, sf_dir):
    """FULL OUTER reconciliation of two independently derived per-nation
    aggregates (high-balance customers vs high-balance suppliers),
    classifying every nation as both / customer_only / supplier_only —
    the missing outer-join shape in the battery (q13 is LEFT OUTER).

    Scale shape: both inputs are pre-aggregated to ≤|nation| rows BEFORE
    the full-outer join, so the join itself is trivially broadcastable;
    the heavy work is two map-side-combined aggregations with the
    balance filters pushed into the scans."""
    cust = (
        t(spark, sf_dir, "customer").where(F.col("c_acctbal") > 9900)
        .groupBy(F.col("c_nationkey").alias("ck"))
        .agg(F.count(F.lit(1)).alias("n_cust"),
             money(F.sum("c_acctbal")).alias("cust_bal"))
    )
    supp = (
        t(spark, sf_dir, "supplier").where(F.col("s_acctbal") > 8000)
        .groupBy(F.col("s_nationkey").alias("sk"))
        .agg(F.count(F.lit(1)).alias("n_supp"),
             money(F.sum("s_acctbal")).alias("supp_bal"))
    )
    nation = t(spark, sf_dir, "nation")
    f = cust.join(supp, cust.ck == supp.sk, "full_outer")
    k = F.coalesce("ck", "sk")
    presence = (
        F.when(F.col("ck").isNotNull() & F.col("sk").isNotNull(), "both")
        .when(F.col("ck").isNotNull(), "customer_only")
        .otherwise("supplier_only")
    )
    return (
        f.select(
            k.alias("nationkey"), presence.alias("presence"),
            F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
            F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
            F.coalesce("cust_bal", F.lit(0.0)).alias("cust_bal"),
            F.coalesce("supp_bal", F.lit(0.0)).alias("supp_bal"))
        .join(F.broadcast(nation),
              F.col("nationkey") == F.col("n_nationkey"))
        .select("nationkey", "n_name", "presence",
                "n_cust", "n_supp", "cust_bal", "supp_bal")
    )


_BF_M = 65536          # bloom bucket space (1-hash bloom == bucket set)
_BF_CUTOFF = 480000.0  # build-side selectivity: ~4% of orders


@query(
    "bloom_prefilter_join",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n_items,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_totalprice > 480000.0
    GROUP BY o_orderpriority
    """,
)
def bloom_prefilter_join(spark, sf_dir):
    """Bloom-style runtime pre-filter for a selective fact join, made
    explicit: the build side (top-price orders, ~4%) is compressed to
    its DISTINCT 16-bit hash buckets — a 1-hash bloom filter whose
    "bitmap" is a broadcastable bucket set — and the probe side
    (lineitem) is semi-joined against it BEFORE the exact join, so
    ~96% of probe rows are dropped map-side without shuffling the fact
    table. False positives (bucket collisions) are removed by the
    exact broadcast join that follows; the result is exactly the plain
    join, which is what the oracle checks.

    This is Spark's own InjectRuntimeFilter / bloom pattern (the SQL
    `bloom_filter_agg` runtime-filter rewrite, not registered for
    direct SQL use in 4.1) expressed with public operators. At 100 TB
    the bucket set stays ≤ {m} rows regardless of build cardinality,
    the semi-join and the exact join are both broadcasts, and lineitem
    is never shuffled."""
    orders = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    build = orders.where(F.col("o_totalprice") > _BF_CUTOFF).select(
        "o_orderkey", "o_orderpriority")
    bucket_of = lambda c: hash60(c.cast("string")) % F.lit(_BF_M)  # noqa: E731
    buckets = build.select(
        bucket_of(F.col("o_orderkey")).alias("bf_bucket")).distinct()
    prefiltered = li.join(
        F.broadcast(buckets),
        bucket_of(F.col("l_orderkey")) == F.col("bf_bucket"), "left_semi")
    return (
        prefiltered.join(F.broadcast(build),
                         F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_items"),
             money(F.sum(REVENUE())).alias("revenue"))
    )


_CMS_W = 8192  # sketch width (buckets per row)
_CMS_D = 4     # sketch depth (independent hash rows)
_CMS_TOPK = 20


def _cms_bucket(key_col, depth: int):
    """Depth-d counter bucket: independent hash streams from one md5
    family via a ':cms<d>' salt (same trick as the sampling salts)."""
    return hash60(F.concat(key_col, F.lit(f":cms{depth}"))) % F.lit(_CMS_W)


_CMS_BUCKET_SQL = (
    "('0x' || substr(md5(key || ':cms' || d), 1, 15))::BIGINT % 8192")


@query(
    "cms_heavy_hitters",
    oracle=f"""
    WITH keyed AS (
      SELECT CAST(l_partkey AS VARCHAR) AS key, l_partkey,
             count(*) AS cnt
      FROM lineitem GROUP BY 1, 2),
    depths AS (SELECT unnest(generate_series(0, {_CMS_D - 1})) AS d),
    counters AS (
      SELECT d, {_CMS_BUCKET_SQL} AS bucket, sum(cnt) AS w
      FROM keyed CROSS JOIN depths GROUP BY 1, 2),
    cand AS (
      SELECT key, l_partkey, cnt,
             row_number() OVER (ORDER BY cnt DESC, l_partkey) AS rn
      FROM keyed QUALIFY rn <= {_CMS_TOPK})
    SELECT c.l_partkey, c.cnt AS exact_cnt, CAST(min(ct.w) AS BIGINT) AS cms_est,
           CAST(min(ct.w) - c.cnt AS BIGINT) AS overcount
    FROM cand c CROSS JOIN depths
    JOIN counters ct ON ct.d = depths.d AND ct.bucket =
      ('0x' || substr(md5(c.key || ':cms' || depths.d), 1, 15))::BIGINT % 8192
    GROUP BY c.l_partkey, c.cnt
    """,
)
def cms_heavy_hitters(spark, sf_dir):
    """Distributed count-min sketch (w=8192, d=4) over lineitem part
    keys, audited against exact counts for the top-20 heavy hitters —
    completing the sketch family (HLL distinct, GK quantiles, CMS
    frequencies). No driver-side sketch object: the counter matrix IS
    a DataFrame (depth, bucket, weight), built by aggregating per key
    first (map-side combine over the fact table) and only then
    exploding the 4 depth rows per DISTINCT key — the explode factor
    applies to key cardinality, not raw rows, so at 100 TB the sketch
    build costs one fact-table aggregation plus a 4x|keys| shuffle
    into 4x8192 cells. Estimates (min over depths) are deterministic
    given the md5 hash family, so the oracle replicates the whole
    sketch in SQL and checks values exactly; overcount >= 0 by
    construction is the CMS guarantee made visible."""
    li = t(spark, sf_dir, "lineitem")
    keyed = (
        li.groupBy(F.col("l_partkey").cast("string").alias("key"),
                   "l_partkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=False)  # reuse across counters + cand
    )
    depth_structs = F.array(*[
        F.struct(F.lit(d).alias("d"),
                 _cms_bucket(F.col("key"), d).alias("bucket"))
        for d in range(_CMS_D)])
    counters = (
        keyed.select("cnt", F.explode(depth_structs).alias("db"))
        .groupBy(F.col("db.d").alias("d"), F.col("db.bucket").alias("bucket"))
        .agg(F.sum("cnt").alias("w"))
    )
    cand = (
        keyed.withColumn(
            "rn", F.row_number().over(
                W.orderBy(F.desc("cnt"), F.asc("l_partkey"))))
        .where(F.col("rn") <= _CMS_TOPK)
        .select("key", "l_partkey", "cnt")
    )
    probes = (
        cand.select("l_partkey", "cnt", F.explode(depth_structs).alias("db"))
        .select("l_partkey", "cnt", F.col("db.d").alias("pd"),
                F.col("db.bucket").alias("pb"))
    )
    return (
        probes.join(counters,
                    (probes.pd == counters.d) & (probes.pb == counters.bucket))
        .groupBy("l_partkey", "cnt")
        .agg(F.min("w").alias("cms_est"),
             (F.min("w") - F.col("cnt")).alias("overcount"))
        .select(F.col("l_partkey"), F.col("cnt").alias("exact_cnt"),
                "cms_est", "overcount")
    )


@query(
    "ordered_agg_family",
    oracle="""
    SELECT c_mktsegment,
           count(*) AS n,
           round(median(c_acctbal), 6) AS median_bal,
           string_agg(c_name, ',' ORDER BY c_name) AS names_csv,
           min(c_name) AS first_name,
           max(c_name) AS last_name
    FROM customer
    WHERE c_acctbal > 9900
    GROUP BY c_mktsegment
    """,
)
def ordered_agg_family(spark, sf_dir):
    """Order-sensitive aggregates (Spark 4.x surface): exact
    interpolated `median` and `listagg ... WITHIN GROUP (ORDER BY)`
    (ANSI string_agg), which is how collect-and-concatenate becomes
    deterministic — an unordered collect_list is not oracle-checkable,
    the WITHIN GROUP contract is. The high-balance filter keeps the
    concatenation bounded; at scale listagg over unbounded groups is
    the anti-pattern (a per-group reduce of strings), so the filter
    IS the scale story: reduce first, stringify last."""
    c = t(spark, sf_dir, "customer").where(F.col("c_acctbal") > 9900)
    return (
        c.groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.median("c_acctbal"), 6).alias("median_bal"),
             F.expr("listagg(c_name, ',') within group (order by c_name)")
             .alias("names_csv"),
             F.min("c_name").alias("first_name"),
             F.max("c_name").alias("last_name"))
    )


@query(
    "try_functions",
    oracle="""
    SELECT p_partkey,
           TRY_CAST(p_brand AS INTEGER) AS brand_as_int,
           TRY_CAST(regexp_extract(p_brand, '[0-9]+', 0) AS INTEGER) AS brand_num,
           CASE WHEN p_size - 5 = 0 THEN NULL
                ELSE round(p_retailprice / (p_size - 5), 6) END AS price_per,
           TRY_CAST(substr(p_type, 1, 3) AS DOUBLE) AS type_as_num,
           [p_size, p_size * 2][5] AS oob_element
    FROM part
    """,
)
def try_functions(spark, sf_dir):
    """ANSI-safety function family: `try_cast` / `try_divide` /
    `try_element_at` return NULL instead of raising — the contract
    that lets a 100 TB pipeline run under ANSI mode (Spark 4 default)
    without a single malformed row killing the job. Each expression
    here would throw under plain ANSI semantics (non-numeric cast,
    divide-by-zero, out-of-bounds index); the oracle mirrors the
    null-on-failure results with DuckDB's TRY_CAST / guarded CASE /
    out-of-range list index."""
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.col("p_brand").try_cast("int").alias("brand_as_int"),
        F.regexp_extract("p_brand", "[0-9]+", 0)
        .try_cast("int").alias("brand_num"),
        F.round(F.try_divide("p_retailprice", F.col("p_size") - 5), 6)
        .alias("price_per"),
        F.substring("p_type", 1, 3).try_cast("double")
        .alias("type_as_num"),
        F.try_element_at(F.array("p_size", F.col("p_size") * 2), F.lit(5))
        .alias("oob_element"),
    )


@query(
    "lateral_topn_join",
    oracle="""
    SELECT n_name, c_name, round(c_acctbal, 2) AS bal
    FROM nation n, LATERAL (
      SELECT c_name, c_acctbal
      FROM customer
      WHERE c_nationkey = n.n_nationkey
      ORDER BY c_acctbal DESC, c_name
      LIMIT 2) top2
    """,
)
def lateral_topn_join(spark, sf_dir):
    """Correlated LATERAL join (DataFrame.lateralJoin, Spark 4.0 API):
    per-nation top-2 customers by balance, written as "for each outer
    row, run this parameterized subquery" instead of a window rank.
    Catalyst decorrelates the lateral subquery into the same
    shuffle+rank shape as the window formulation — the point of the
    entry: the imperative-looking API stays declarative, nothing
    executes per-row. (DuckDB runs the identical LATERAL SQL.)"""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t(spark, sf_dir, "nation").createOrReplaceTempView("nation_lat_v")
    t(spark, sf_dir, "customer").createOrReplaceTempView("customer_lat_v")
    return spark.sql("""
        SELECT n_name, c_name, round(c_acctbal, 2) AS bal
        FROM nation_lat_v n, LATERAL (
          SELECT c_name, c_acctbal
          FROM customer_lat_v
          WHERE c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_name
          LIMIT 2) top2
    """)


@query(
    "bitmap_distinct_audit",
    oracle="""
    SELECT o_orderpriority,
           count(DISTINCT o_custkey) AS n_cust
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def bitmap_distinct_audit(spark, sf_dir):
    """EXACT distinct counting via bitmap aggregation (Spark 3.5+
    bitmap_bucket_number / bitmap_bit_position / bitmap_construct_agg):
    keys fold into fixed 4 KB bitmap segments per (group, bucket), and
    the distinct count is the sum of segment popcounts. Unlike
    count(DISTINCT), the shuffle carries one bitmap per 32k-key
    bucket instead of every distinct key — the dense-int-key analog
    of the HLL sketch but with zero error, which is why the oracle is
    plain count(DISTINCT): the bitmap path must match it exactly."""
    o = t(spark, sf_dir, "orders")
    seg = (
        o.groupBy("o_orderpriority",
                  F.expr("bitmap_bucket_number(o_custkey)").alias("bkt"))
        .agg(F.expr("bitmap_construct_agg(bitmap_bit_position(o_custkey))")
             .alias("bm"))
    )
    return (
        seg.groupBy("o_orderpriority")
        .agg(F.sum(F.expr("bitmap_count(bm)")).alias("n_cust"))
    )


@query(
    "hll_sketch_rollup_audit",
    oracle="""
    SELECT n_regionkey,
           count(DISTINCT c_custkey) AS exact_cust,
           TRUE AS est_within_5pct
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_regionkey
    """,
)
def hll_sketch_rollup_audit(spark, sf_dir):
    """Mergeable-sketch rollup (Spark 3.5+ Apache DataSketches HLL):
    per-NATION customer sketches are built once, then hll_union_agg
    combines them to REGION level without touching raw keys again —
    the property that makes sketches the 100 TB cube primitive
    (aggregate once at the finest grain, roll up by merging
    fixed-size state). The audit pins the merged estimate within 5%
    of exact; the boolean is the portable contract (raw sketch bytes
    are engine-specific, as in approx_distinct_audit)."""
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    nation_sketch = (
        c.join(F.broadcast(n),
               F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_regionkey", "n_nationkey")
        .agg(F.expr("hll_sketch_agg(c_custkey)").alias("sk"),
             F.count(F.lit(1)).alias("_n"))
    )
    merged = (
        nation_sketch.groupBy("n_regionkey")
        .agg(F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("est"))
    )
    exact = (
        c.join(F.broadcast(n),
               F.col("c_nationkey") == F.col("n_nationkey"))
        .select("n_regionkey", "c_custkey").distinct()
        .groupBy("n_regionkey")
        .agg(F.count(F.lit(1)).alias("exact_cust"))
    )
    return (
        exact.join(merged, "n_regionkey")
        .select("n_regionkey", "exact_cust",
                (F.abs(F.col("est") - F.col("exact_cust"))
                 / F.col("exact_cust") < 0.05).alias("est_within_5pct"))
    )


@query(
    "incremental_agg_maintenance",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def incremental_agg_maintenance(spark, sf_dir):
    """Incremental view maintenance: a pre-aggregated BASE snapshot
    (orders before 1999) is refreshed by merging a DELTA partial
    aggregate (orders since 1999) — count and sum are commutative
    monoids, so base ⊕ delta must equal the full recompute, which is
    exactly what the oracle checks. This is the pattern that replaces
    100 TB full recomputes with delta-sized work: keep partial
    aggregates, merge on arrival; the merge is a |groups|-sized full
    outer join, trivially broadcastable."""
    o = t(spark, sf_dir, "orders")
    cutoff = F.lit("1999-01-01 00:00:00").cast("timestamp")

    def partial(df, n_col, t_col):
        return (df.groupBy("o_orderpriority")
                .agg(F.count(F.lit(1)).alias(n_col),
                     F.sum("o_totalprice").alias(t_col)))

    base = partial(o.where(F.col("o_orderdate") < cutoff), "n_b", "t_b")
    delta = partial(o.where(F.col("o_orderdate") >= cutoff), "n_d", "t_d")
    return (
        base.join(delta, "o_orderpriority", "full_outer")
        .select(
            "o_orderpriority",
            (F.coalesce("n_b", F.lit(0)) + F.coalesce("n_d", F.lit(0)))
            .alias("n_orders"),
            F.round(F.coalesce("t_b", F.lit(0.0))
                    + F.coalesce("t_d", F.lit(0.0)), 2).alias("total"))
    )


@query(
    "table_fingerprint",
    oracle=f"""
    SELECT o_orderstatus,
           count(*) AS n_rows,
           bit_xor({_H60.format(
               e="CAST(o_orderkey AS VARCHAR) || '|' || "
                 "CAST(o_custkey AS VARCHAR) || '|' || "
                 "o_orderpriority || '|' || "
                 "strftime(o_orderdate, '%Y-%m-%d')")}) AS xor_fp
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def table_fingerprint(spark, sf_dir):
    """Cross-engine table fingerprinting for replica reconciliation:
    XOR-fold a portable per-row hash (keys + status columns + date,
    '|'-joined) per partition group. XOR is commutative, associative,
    and overflow-free, so the fold is order-independent and computes
    map-side in fixed state — two replicas (or two engines, as the
    oracle proves) can compare 100 TB tables by exchanging a few
    bytes per group. Any flipped row, dropped row, or duplicate
    changes the fingerprint; the grouped form localizes WHICH
    group diverged (the anti-entropy / Merkle-leaf primitive)."""
    o = t(spark, sf_dir, "orders")
    row_str = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.col("o_custkey").cast("string"),
        F.col("o_orderpriority"),
        F.date_format("o_orderdate", "yyyy-MM-dd"))
    return (
        o.groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_rows"),
             F.bit_xor(hash60(row_str)).alias("xor_fp"))
    )


@query(
    "minmax_by_agg",
    oracle="""
    SELECT p_brand,
           max_by(p_name, CAST(round(p_retailprice * 100) AS BIGINT)
                          * 10000000 + p_partkey) AS priciest_part,
           min_by(p_name, CAST(round(p_retailprice * 100) AS BIGINT)
                          * 10000000 + p_partkey) AS cheapest_part,
           CAST(count_if(p_size >= 25) AS BIGINT) AS n_large,
           round(max(p_retailprice) - min(p_retailprice), 2) AS price_span
    FROM part
    GROUP BY p_brand
    ORDER BY p_brand
    """,
)
def minmax_by_agg(spark, sf_dir):
    """max_by / min_by argmax aggregates + count_if: pick the row
    attribute AT the extremum in one pass — replacing the
    self-join-on-max anti-pattern (scan + shuffle + scan again) with
    a single map-side-combinable aggregate. Prices tie at brand
    extrema in this data, so the ordering key is the composite
    (price-cents, partkey) packed into one BIGINT — the standard
    deterministic-argmax recipe (price dominates, the unique key
    breaks ties identically in every engine)."""
    p = t(spark, sf_dir, "part")
    key = (F.round(F.col("p_retailprice") * 100).cast("bigint")
           * F.lit(10000000) + F.col("p_partkey"))
    return (
        p.groupBy("p_brand")
        .agg(
            F.max_by("p_name", key).alias("priciest_part"),
            F.min_by("p_name", key).alias("cheapest_part"),
            F.count_if(F.col("p_size") >= 25).alias("n_large"),
            F.round(F.max("p_retailprice") - F.min("p_retailprice"), 2)
            .alias("price_span"),
        )
        .orderBy("p_brand")
    )


@query(
    "window_nth_cume",
    oracle="""
    SELECT p_partkey, p_brand,
           nth_value(p_name, 3) OVER w AS third_cheapest,
           round(cume_dist() OVER w, 6) AS price_cume
    FROM part
    WINDOW w AS (PARTITION BY p_brand
                 ORDER BY p_retailprice, p_partkey
                 ROWS BETWEEN UNBOUNDED PRECEDING
                          AND UNBOUNDED FOLLOWING)
    QUALIFY p_partkey % 50 = 0
    ORDER BY p_partkey
    """,
)
def window_nth_cume(spark, sf_dir):
    """nth_value (full-frame) + cume_dist, completing the analytic
    window family (rank/dense_rank/ntile/percent_rank/lag/lead are
    covered elsewhere).  The (price, partkey) composite order makes
    peers — and therefore cume_dist — engine-independent.  The
    output filter applies AFTER the window (DuckDB spells it
    QUALIFY; Spark filters the windowed projection) so the window
    still sees every row of the partition."""
    from pyspark.sql import Window as W

    p = t(spark, sf_dir, "part")
    w = (W.partitionBy("p_brand").orderBy("p_retailprice", "p_partkey")
         .rowsBetween(W.unboundedPreceding, W.unboundedFollowing))
    return (
        p.select(
            "p_partkey", "p_brand",
            F.nth_value("p_name", 3).over(w).alias("third_cheapest"),
            F.round(F.cume_dist().over(
                W.partitionBy("p_brand")
                .orderBy("p_retailprice", "p_partkey")), 6)
            .alias("price_cume"))
        .where(F.col("p_partkey") % 50 == 0)
        .orderBy("p_partkey")
    )


@query(
    "filtered_aggregates",
    oracle="""
    SELECT l_returnflag,
           count(*) AS n_all,
           count(*) FILTER (WHERE l_quantity >= 30) AS n_big,
           round(sum(l_extendedprice) FILTER (WHERE l_discount > 0.05), 2)
               AS rev_discounted,
           round(avg(l_quantity) FILTER (WHERE l_tax = 0.0), 6)
               AS avg_qty_taxfree,
           count(DISTINCT l_suppkey) FILTER (WHERE l_returnflag = 'R')
               AS n_supp_returned
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def filtered_aggregates(spark, sf_dir):
    """ANSI ``FILTER (WHERE …)`` aggregate clause: per-aggregate
    predicates in ONE grouped pass — the declarative form of the
    sum(CASE…) idiom, and the plan is identical (conditional
    accumulation inside the same partial agg, no extra scan or
    shuffle). Mixes plain, filtered-sum/avg, and filtered-DISTINCT
    to cover the rewrite paths."""
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_fa_v")
    return spark.sql("""
        SELECT l_returnflag,
               count(*) AS n_all,
               count(*) FILTER (WHERE l_quantity >= 30) AS n_big,
               round(sum(l_extendedprice) FILTER (WHERE l_discount > 0.05),
                     2) AS rev_discounted,
               round(avg(l_quantity) FILTER (WHERE l_tax = 0.0), 6)
                   AS avg_qty_taxfree,
               count(DISTINCT l_suppkey) FILTER (WHERE l_returnflag = 'R')
                   AS n_supp_returned
        FROM lineitem_fa_v
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """)


@query(
    "set_ops_all_multiplicity",
    oracle="""
    WITH a AS (SELECT l_suppkey AS k FROM lineitem WHERE l_quantity >= 48),
         b AS (SELECT l_suppkey AS k FROM lineitem WHERE l_discount >= 0.09)
    SELECT 'intersect_all' AS op, count(*) AS n, sum(k) AS sum_k FROM
      (SELECT k FROM a INTERSECT ALL SELECT k FROM b)
    UNION ALL
    SELECT 'except_all', count(*), sum(k) FROM
      (SELECT k FROM a EXCEPT ALL SELECT k FROM b)
    UNION ALL
    SELECT 'intersect_distinct', count(*), sum(k) FROM
      (SELECT k FROM a INTERSECT SELECT k FROM b)
    ORDER BY op
    """,
)
def set_ops_all_multiplicity(spark, sf_dir):
    """INTERSECT ALL / EXCEPT ALL bag semantics: multiplicities are
    min(m,n) and m−n per value — a different operator from the
    DISTINCT forms (Spark plans them as count-tracking aggregates +
    generate, not a semi/anti join). The distinct variant rides along
    so the multiplicity difference is visible in the counts."""
    li = t(spark, sf_dir, "lineitem")
    a = li.where(F.col("l_quantity") >= 48).select(
        F.col("l_suppkey").alias("k"))
    b = li.where(F.col("l_discount") >= 0.09).select(
        F.col("l_suppkey").alias("k"))

    def summarize(df, tag):
        return df.agg(F.lit(tag).alias("op"),
                      F.count(F.lit(1)).alias("n"),
                      F.sum("k").alias("sum_k"))

    return (
        summarize(a.intersectAll(b), "intersect_all")
        .unionAll(summarize(a.exceptAll(b), "except_all"))
        .unionAll(summarize(a.intersect(b), "intersect_distinct"))
        .orderBy("op")
    )


@query(
    "limit_offset_pagination",
    oracle="""
    SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 15 OFFSET 30
    """,
)
def limit_offset_pagination(spark, sf_dir):
    """ORDER BY … LIMIT … OFFSET pagination (Spark 3.4+ OFFSET): the
    total tie-broken order makes page 3 deterministic. Plan note:
    Spark fetches offset+limit rows per partition then trims on the
    driver — fine for page-sized offsets; DEEP pagination at scale
    should keyset-paginate (WHERE key > last_seen ORDER BY key LIMIT
    n) instead, which stays a pushed filter."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders_page_v")
    return spark.sql("""
        SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price
        FROM orders_page_v
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 15 OFFSET 30
    """)


@query(
    "percentile_disc_family",
    oracle="""
    SELECT o_orderpriority,
           round(quantile_disc(o_totalprice, 0.25), 2) AS q1_disc,
           round(quantile_disc(o_totalprice, 0.75), 2) AS q3_disc,
           round(median(o_totalprice), 4) AS med
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def percentile_disc_family(spark, sf_dir):
    """percentile_disc WITHIN GROUP (inverse-distribution: returns an
    ACTUAL data value at or above the quantile, vs percentile_cont's
    interpolation) plus median().  Exact percentiles sort within each
    group — fine for bounded groups; unbounded-cardinality quantiles
    at scale should use the approx_percentile / GK-sketch entry
    (approx_quantile_audit) instead."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders_pd_v")
    return spark.sql("""
        SELECT o_orderpriority,
               round(percentile_disc(0.25) WITHIN GROUP
                     (ORDER BY o_totalprice), 2) AS q1_disc,
               round(percentile_disc(0.75) WITHIN GROUP
                     (ORDER BY o_totalprice), 2) AS q3_disc,
               round(median(o_totalprice), 4) AS med
        FROM orders_pd_v
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """)


@query(
    "shuffle_hash_hint_join",
    oracle="""
    SELECT c_mktsegment, count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS total
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def shuffle_hash_hint_join(spark, sf_dir):
    """Join-strategy hint surface: SHUFFLE_HASH forces a shuffled hash
    join where Spark would otherwise broadcast (small dim) or
    sort-merge (large-large).  SHJ beats SMJ when one side fits a
    task's memory after partitioning — it skips both sorts — but
    can't spill the build side gracefully, which is why it is opt-in.
    The result must be strategy-invariant (same oracle as the
    broadcast form); EXPLAIN_AUDIT shows the shj plan node."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    return (
        o.join(c.hint("SHUFFLE_HASH"),
               o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_orders"),
             F.round(F.sum("o_totalprice"), 2).alias("total"))
        .orderBy("c_mktsegment")
    )


@query(
    "sql_pivot_clause",
    oracle="""
    SELECT o_orderpriority,
           round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END),
                 2) AS F_total,
           round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END),
                 2) AS O_total,
           round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END),
                 2) AS P_total
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def sql_pivot_clause(spark, sf_dir):
    """The SQL PIVOT clause (vs the DataFrame .pivot API used by
    pivot_status): explicit IN-list values compile to the same
    conditional-aggregate plan as the oracle's CASE form — one
    shuffle, no second pass to discover pivot values (the implicit
    form pays a distinct-scan first; at scale always enumerate)."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders_pv_v")
    return spark.sql("""
        SELECT * FROM (
          SELECT o_orderpriority, o_orderstatus, o_totalprice
          FROM orders_pv_v
        )
        PIVOT (round(sum(o_totalprice), 2)
               FOR o_orderstatus IN ('F' AS F_total, 'O' AS O_total,
                                     'P' AS P_total))
        ORDER BY o_orderpriority
    """)


@query(
    "stat_crosstab",
    oracle="""
    SELECT o_orderstatus AS status,
           count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS urgent,
           count(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS high,
           count(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS medium,
           count(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED')
               AS unspecified,
           count(*) FILTER (WHERE o_orderpriority = '5-LOW') AS low
    FROM orders
    GROUP BY status
    ORDER BY status
    """,
)
def stat_crosstab(spark, sf_dir):
    """``DataFrame.stat.crosstab`` — the contingency-table member of
    the df.stat surface (cov/corr/approxQuantile live in stats_agg /
    approx_quantile_audit).  crosstab compiles to a pivot-style
    conditional aggregate: ONE shuffle on the row key; the column key's
    distinct values become columns driver-side, so it is only legal
    when the column-key cardinality is tiny (here 5 priorities) — at
    100 TB the row-key cardinality can be anything, the column key
    must stay enumerable.  Columns are selected explicitly because
    crosstab's column order is derived from an unordered distinct
    scan."""
    ct = (t(spark, sf_dir, "orders")
          .select("o_orderstatus", "o_orderpriority")
          .stat.crosstab("o_orderstatus", "o_orderpriority"))
    return (ct.select(
        F.col("o_orderstatus_o_orderpriority").alias("status"),
        F.col("`1-URGENT`").alias("urgent"),
        F.col("`2-HIGH`").alias("high"),
        F.col("`3-MEDIUM`").alias("medium"),
        F.col("`4-NOT SPECIFIED`").alias("unspecified"),
        F.col("`5-LOW`").alias("low"))
        .orderBy("status"))


@query(
    "freq_items_verified",
    oracle="""
    SELECT lang AS item, count(*) AS n_docs
    FROM documents
    GROUP BY lang
    HAVING count(*) >= 0.3 * (SELECT count(*) FROM documents)
    ORDER BY item
    """,
)
def freq_items_verified(spark, sf_dir):
    """``DataFrame.stat.freqItems`` hardened into an exact operator.
    freqItems is single-pass streaming (Karp et al. misra-gries): it
    GUARANTEES every item with frequency > support is returned but may
    add false positives — so raw output is not oracle-comparable.  The
    production pattern at 100 TB: freqItems as the cheap one-pass
    candidate generator (map-side, no shuffle), then one exact count
    over the (tiny) candidate set to drop the false positives.  The
    verify side aggregates the corpus once on a uniform key; the
    candidate join is a broadcast of a handful of rows."""
    docs = t(spark, sf_dir, "documents")
    cand = (docs.stat.freqItems(["lang"], support=0.3)
            .select(F.explode("lang_freqItems").alias("item")))
    counts = docs.groupBy(F.col("lang").alias("item")) \
        .agg(F.count(F.lit(1)).alias("n_docs"))
    total_w = W.partitionBy()
    verified = (counts
                .withColumn("__total", F.sum("n_docs").over(total_w))
                .join(F.broadcast(cand), "item")
                .where(F.col("n_docs") >= 0.3 * F.col("__total"))
                .select("item", "n_docs")
                .orderBy("item"))
    return verified


@query(
    "rfm_segmentation",
    oracle="""
    WITH rfm AS (
      SELECT o_custkey,
             max(o_orderdate) AS last_order,
             count(*) AS frequency,
             sum(o_totalprice) AS monetary
      FROM orders GROUP BY o_custkey
    ), scored AS (
      SELECT o_custkey, frequency, monetary,
             ntile(5) OVER (ORDER BY last_order, o_custkey) AS r_score,
             ntile(5) OVER (ORDER BY frequency, o_custkey) AS f_score,
             ntile(5) OVER (ORDER BY monetary, o_custkey) AS m_score
      FROM rfm)
    SELECT r_score, f_score, m_score,
           count(*) AS n_customers,
           round(avg(monetary), 2) AS avg_monetary,
           CAST(sum(frequency) AS BIGINT) AS total_orders
    FROM scored
    GROUP BY r_score, f_score, m_score
    """,
)
def rfm_segmentation(spark, sf_dir):
    """RFM (recency/frequency/monetary) customer segmentation — the
    classic retention-analytics rollup: quintile-score each customer
    on all three axes and profile the 5x5x5 segments.

    100 TB plan: one groupBy(custkey) collapses orders to one row
    per customer; the ntile windows then run on the CUSTOMER table
    (orders of magnitude smaller than the fact table), and the
    final segment rollup is a combine-collapsed aggregate.  Window
    order includes custkey so quintile boundaries are deterministic
    under ties."""
    o = t(spark, sf_dir, "orders")
    rfm = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum("o_totalprice").alias("monetary"))
    scored = rfm.select(
        "o_custkey", "frequency", "monetary",
        F.ntile(5).over(W.orderBy("last_order", "o_custkey"))
        .alias("r_score"),
        F.ntile(5).over(W.orderBy("frequency", "o_custkey"))
        .alias("f_score"),
        F.ntile(5).over(W.orderBy("monetary", "o_custkey"))
        .alias("m_score"))
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(F.avg("monetary"), 2).alias("avg_monetary"),
        F.sum("frequency").cast("bigint").alias("total_orders"))


@query(
    "hhi_concentration",
    oracle="""
    WITH rev AS (
      SELECT r_name AS region, n_name AS nation,
             sum(l_extendedprice * (1 - l_discount)) AS revenue
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name
    ), shares AS (
      SELECT region, nation,
             revenue / sum(revenue) OVER (PARTITION BY region) AS share
      FROM rev)
    SELECT region, count(*) AS n_nations,
           round(sum(share * share), 6) AS hhi,
           round(max(share), 6) AS top_share
    FROM shares GROUP BY region ORDER BY region
    """,
)
def hhi_concentration(spark, sf_dir):
    """Herfindahl-Hirschman market-concentration index per region:
    squared revenue shares of each supplier nation — the antitrust /
    portfolio-concentration rollup (1/n = perfectly even, 1.0 =
    monopoly).

    100 TB plan: the fact scan collapses to a (region, nation)
    aggregate first (dims broadcast); shares are a window over that
    25-row table; no second fact pass."""
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    rev = (li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
           .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
           .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
           .groupBy(F.col("r_name").alias("region"),
                    F.col("n_name").alias("nation"))
           .agg(F.sum(F.col("l_extendedprice")
                      * (1 - F.col("l_discount"))).alias("revenue")))
    share = (F.col("revenue")
             / F.sum("revenue").over(W.partitionBy("region")))
    return (rev.select("region", share.alias("share"))
            .groupBy("region")
            .agg(F.count(F.lit(1)).alias("n_nations"),
                 F.round(F.sum(F.col("share") * F.col("share")), 6)
                 .alias("hhi"),
                 F.round(F.max("share"), 6).alias("top_share"))
            .orderBy("region"))


@query(
    "skyline_pareto_frontier",
    oracle="""
    WITH cust AS (
      SELECT o_custkey, count(*) AS f, sum(o_totalprice) AS m
      FROM orders GROUP BY o_custkey
    ), per_f AS (
      SELECT f, max(m) AS max_m FROM cust GROUP BY f
    ), pref AS (
      SELECT f, max_m,
             max(max_m) OVER (ORDER BY f DESC
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING) AS better_m
      FROM per_f
    ), corners AS (
      SELECT f, max_m FROM pref
      WHERE better_m IS NULL OR max_m > better_m)
    SELECT c.o_custkey, c.f AS frequency, round(c.m, 2) AS monetary
    FROM cust c JOIN corners k ON c.f = k.f AND c.m = k.max_m
    """,
)
def skyline_pareto_frontier(spark, sf_dir):
    """Skyline (Pareto-frontier) query: customers not dominated on
    (order frequency, total spend) — the classic multi-criteria
    operator (Borzsony et al., ICDE'01).  A customer is dominated if
    another is >= on both axes and > on one.

    100 TB plan: the sort-based 2-D skyline, not the quadratic
    NOT-EXISTS: one groupBy collapses orders to customers, a second
    collapses customers to DISTINCT-frequency corners (max spend per
    frequency), and one ordered window (running max over higher
    frequencies) marks the frontier corners; frontier membership is
    then an equi-join back.  Nothing quadratic ever materializes,
    and both engines evaluate the identical formulation."""
    o = t(spark, sf_dir, "orders")
    cust = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("f"), F.sum("o_totalprice").alias("m"))
    per_f = cust.groupBy("f").agg(F.max("m").alias("max_m"))
    wp = (W.orderBy(F.desc("f"))
          .rowsBetween(W.unboundedPreceding, -1))
    corners = (per_f
               .withColumn("better_m", F.max("max_m").over(wp))
               .where(F.col("better_m").isNull()
                      | (F.col("max_m") > F.col("better_m")))
               .select("f", "max_m"))
    corners = corners.select(F.col("f").alias("kf"),
                             F.col("max_m").alias("km"))
    return (cust.join(F.broadcast(corners),
                      (F.col("f") == F.col("kf"))
                      & (F.col("m") == F.col("km")))
            .select("o_custkey", F.col("f").alias("frequency"),
                    F.round("m", 2).alias("monetary")))
