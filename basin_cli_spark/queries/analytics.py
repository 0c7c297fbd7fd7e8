"""Multi-join analytics queries (TPC-H Q3/Q5/Q10 shapes, adapted to the
trimmed fixture schemas).

These are the scale proving ground for join planning: the fact table
(lineitem) joins selective dimensions, so the right 100 TB plan filters
dimensions *before* the join, broadcasts the small sides (region/nation
always; customer-after-filter when AQE sees it shrink), and aggregates
with map-side partials.  All of that is Catalyst's job — the code only
states the joins declaratively and hints the constant-size dims.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from basin_cli_spark.queries import register
from basin_cli_spark.queries._helpers import (
    dec,
    dec_sum,
    one_minus,
    sql_dec,
    sql_dec_avg,
    sql_dec_sum,
)
from basin_cli_spark.sources import load_table

_REV = f"{sql_dec('l_extendedprice')} * (1 - {sql_dec('l_discount')})"


@register(
    "q3_shipping_priority",
    f"""
SELECT l_orderkey,
       {sql_dec_sum(_REV, 'revenue')},
       CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS o_orderdate,
       o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1996-06-01 00:00:00'
  AND l_shipdate > TIMESTAMP '1996-06-01 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
""",
)
def q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: selective dim filter -> two equi-joins -> agg ->
    top-k.  Filters sit on each table before its join so the scans prune;
    the final top-10 is TakeOrderedAndProject (no global sort)."""
    cutoff = F.lit("1996-06-01 00:00:00").cast("timestamp_ntz")
    cust = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") < cutoff)
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_shipdate") > cutoff)
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    rev = dec("l_extendedprice") * one_minus("l_discount")
    return (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"])
        .join(li, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dec_sum(rev, "revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.col("o_orderdate").cast("date").cast("string").alias("o_orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    f"""
SELECT n_name, {sql_dec_sum(_REV, 'revenue')}
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
ORDER BY revenue DESC, n_name
""",
)
def q5_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5 shape: five joins, one of them the customer-supplier
    same-nation condition.  region/nation are constant-size — broadcast —
    so only the fact-side equi-joins shuffle."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    region = load_table(spark, sf_dir, "region").where(
        F.col("r_name") == "ASIA"
    ).select("r_regionkey")
    rev = dec("l_extendedprice") * one_minus("l_discount")
    return (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"])
        .join(li, li["l_orderkey"] == orders["o_orderkey"])
        .join(
            supp,
            (li["l_suppkey"] == supp["s_suppkey"])
            & (cust["c_nationkey"] == supp["s_nationkey"]),
        )
        .join(F.broadcast(nation), supp["s_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
        .groupBy("n_name")
        .agg(dec_sum(rev, "revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


@register(
    "q10_returned_items",
    f"""
SELECT c_custkey, c_name, {sql_dec_sum(_REV, 'revenue')},
       c_acctbal, n_name
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-03-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-09-01 00:00:00'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)
def q10_returned_items(spark, sf_dir):
    """TPC-H Q10 shape: who returned the most revenue in a six-month
    window.  The returnflag filter prunes the fact scan; nation broadcasts."""
    lo = F.lit("1996-03-01 00:00:00").cast("timestamp_ntz")
    hi = F.lit("1996-09-01 00:00:00").cast("timestamp_ntz")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey"
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .where((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
        .select("o_orderkey", "o_custkey")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = dec("l_extendedprice") * one_minus("l_discount")
    return (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"])
        .join(li, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dec_sum(rev, "revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "q17_small_quantity_revenue",
    f"""
SELECT {sql_dec_sum(sql_dec('l_extendedprice'), 'total_price')},
       COUNT(*) AS n_lines
FROM lineitem l
JOIN (
  SELECT l_partkey AS pk,
         0.5 * SUM(CAST(l_quantity AS DECIMAL(18,2))) / COUNT(*) AS half_avg_qty
  FROM lineitem GROUP BY l_partkey
) a ON l.l_partkey = a.pk
WHERE CAST(l.l_quantity AS DECIMAL(18,2)) < a.half_avg_qty
""",
)
def q17_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17 shape (small-quantity orders): a correlated aggregate
    subquery decorrelated into a self-join against the per-part average.
    Both sides aggregate/join on l_partkey, so at scale this is one
    shuffle reused (exchange reuse), never a per-row subquery."""
    li = load_table(spark, sf_dir, "lineitem")
    avg_half = (
        li.groupBy(F.col("l_partkey").alias("pk"))
        .agg(
            (
                F.lit(0.5) * F.sum(dec("l_quantity")) / F.count(F.lit(1))
            ).alias("half_avg_qty")
        )
    )
    return (
        li.join(avg_half, li["l_partkey"] == avg_half["pk"])
        .where(dec("l_quantity") < F.col("half_avg_qty"))
        .agg(
            dec_sum(dec("l_extendedprice"), "total_price"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q6_forecast_revenue",
    f"""
SELECT {sql_dec_sum(f"{sql_dec('l_extendedprice')} * {sql_dec('l_discount')}", 'revenue')},
       COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND CAST(l_discount AS DECIMAL(18,2)) BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6 shape: pure filter + global agg — the pushdown benchmark.
    Every predicate reaches the parquet scan (min/max pruning on shipdate
    at scale); no shuffle at all until the single-row final agg."""
    li = load_table(spark, sf_dir, "lineitem")
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp_ntz")
    hi = F.lit("1997-01-01 00:00:00").cast("timestamp_ntz")
    return (
        li.where(
            (F.col("l_shipdate") >= lo)
            & (F.col("l_shipdate") < hi)
            & dec("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dec_sum(dec("l_extendedprice") * dec("l_discount"), "revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q14_promo_revenue_share",
    f"""
SELECT 100.0 * CAST(CAST(SUM(CASE WHEN p_type LIKE 'PROMO%' THEN {_REV} ELSE CAST(0 AS DECIMAL(18,2)) END) AS VARCHAR) AS DOUBLE)
            / CAST(CAST(SUM({_REV}) AS VARCHAR) AS DOUBLE) AS promo_share
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1996-06-01 00:00:00'
""",
)
def q14_promo_revenue_share(spark, sf_dir):
    """TPC-H Q14 shape: conditional aggregation over a fact-dim join.
    The date filter prunes the fact scan before the join; part joins on
    its key (broadcast while it fits, AQE decides)."""
    lo = F.lit("1996-03-01 00:00:00").cast("timestamp_ntz")
    hi = F.lit("1996-06-01 00:00:00").cast("timestamp_ntz")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi)
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = dec("l_extendedprice") * one_minus("l_discount")
    zero = F.lit(0).cast("decimal(18,2)")
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(zero)
    return (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .agg(
            (
                F.lit(100.0)
                * F.sum(promo).cast("double")
                / F.sum(rev).cast("double")
            ).alias("promo_share")
        )
    )


@register(
    "q19_discounted_revenue",
    f"""
SELECT {sql_dec_sum(_REV, 'revenue')}, COUNT(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 21)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 30 AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 45 AND l_quantity BETWEEN 20 AND 40)
""",
)
def q19_discounted_revenue(spark, sf_dir):
    """TPC-H Q19 shape: disjunctive mixed-side predicates over a fact-dim
    join.  The OR spans both tables so it evaluates post-join, but each
    disjunct's single-side conjuncts (brand/size, quantity) still prune
    scans via Catalyst's predicate inference."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size"
    )
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & q.between(1, 21))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 30) & q.between(10, 30))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 45) & q.between(20, 40))
    )
    rev = dec("l_extendedprice") * one_minus("l_discount")
    return (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .where(cond)
        .agg(
            dec_sum(rev, "revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q4_order_priority",
    """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
GROUP BY o_orderpriority
""",
)
def q4_order_priority(spark, sf_dir):
    """TPC-H Q4 shape (priority checking): correlated EXISTS with a
    non-equi clause (shipped >30 days after order date), planned as a
    left-semi hash join on the order key with the date predicate as the
    join residual -- one shuffle, no row multiplication from multi-line
    orders.  Ref surface: the reference delegates EXISTS to DuckDB/PG
    (internal/app/db.go:170-175); here Catalyst owns the decorrelation."""
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp_ntz")
    hi = F.lit("1996-04-01 00:00:00").cast("timestamp_ntz")
    orders = (
        load_table(spark, sf_dir, "orders")
        .where((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    late = li["l_shipdate"] > orders["o_orderdate"] + F.expr("INTERVAL 30 DAYS")
    return (
        orders.join(
            li, (li["l_orderkey"] == orders["o_orderkey"]) & late, "left_semi"
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "q12_priority_by_returnflag",
    """
SELECT l_returnflag,
       COUNT(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 END)
         AS high_line_count,
       COUNT(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 END)
         AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l_returnflag
""",
)
def q12_priority_by_returnflag(spark, sf_dir):
    """TPC-H Q12 shape (shipmode -> returnflag on the trimmed schema):
    fact-dim join followed by conditional counts.  The ship-date filter
    prunes the lineitem scan before the join; the CASE branches are pure
    integer counts, so the whole query stays in whole-stage codegen with
    map-side partial aggregation."""
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp_ntz")
    hi = F.lit("1997-01-01 00:00:00").cast("timestamp_ntz")
    li = (
        load_table(spark, sf_dir, "lineitem")
        .where((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .select("l_orderkey", "l_returnflag")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("l_returnflag")
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
    )


@register(
    "q18_large_volume_customers",
    f"""
SELECT c_name, c_custkey, o_orderkey,
       CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS o_orderdate, o_totalprice,
       {sql_dec_sum(sql_dec('l_quantity'), 'sum_qty')}
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 300
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
""",
)
def q18_large_volume_customers(spark, sf_dir):
    """TPC-H Q18 shape (large-volume customers).  The scale-smart plan
    aggregates lineitem to order grain and applies the HAVING *before*
    touching orders/customer, so the expensive joins see only the ~0.1%
    of orders that survive; the oracle states the naive join-then-agg
    form and the results agree.  Final top-100 is TakeOrderedAndProject."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("_qty"))
        .where(F.col("_qty") > 300)
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(orders, big["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").cast("string").alias("o_orderdate"),
            "o_totalprice",
            F.col("_qty").cast("double").alias("sum_qty"),
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


@register(
    "q22_dormant_customers",
    f"""
WITH avgbal AS (
  SELECT {sql_dec_avg(sql_dec('c_acctbal'), 'ab')}
  FROM customer WHERE c_acctbal > 0.0
)
SELECT c_nationkey, COUNT(*) AS numcust,
       {sql_dec_sum(sql_dec('c_acctbal'), 'totacctbal')}
FROM customer, avgbal
WHERE c_acctbal > ab
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
GROUP BY c_nationkey
""",
)
def q22_dormant_customers(spark, sf_dir):
    """TPC-H Q22 shape (global sales opportunity): above-average-balance
    customers with no recent order (the fixture's custkeys all have *some*
    order, so dormancy is "none since 1999").  The scalar AVG subquery
    becomes a broadcast single-row cross join (no driver collect); the
    NOT EXISTS is a left-anti hash join on the customer key with the date
    filter pushed into the orders scan."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    avgbal = (
        cust.where(F.col("c_acctbal") > 0.0)
        .agg(
            (F.sum(dec("c_acctbal")).cast("double") / F.count(F.lit(1)))
            .alias("ab")
        )
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .where(
            F.col("o_orderdate")
            >= F.lit("1999-01-01 00:00:00").cast("timestamp_ntz")
        )
        .select("o_custkey")
    )
    return (
        cust.crossJoin(F.broadcast(avgbal))
        .where(F.col("c_acctbal") > F.col("ab"))
        .join(orders, cust["c_custkey"] == orders["o_custkey"], "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dec_sum(dec("c_acctbal"), "totacctbal"),
        )
    )


@register(
    "q7_nation_trade_volume",
    f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       YEAR(l_shipdate) AS l_year,
       {sql_dec_sum(_REV, 'revenue')}, COUNT(*) AS n_lines
FROM supplier
JOIN lineitem ON s_suppkey = l_suppkey
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
   OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
GROUP BY supp_nation, cust_nation, l_year
""",
)
def q7_nation_trade_volume(spark, sf_dir):
    """TPC-H Q7 shape (volume shipping): bidirectional trade between two
    nations by ship year.  The nation filters are applied to each
    broadcast nation alias *before* the joins so supplier/customer shrink
    immediately; the cross-table OR (only the 3<->7 pairings survive)
    evaluates after both nation joins.  Only the constant-size nation
    aliases carry broadcast hints; supplier/customer scale with SF and
    are left to AQE."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    pair = ("NATION_3", "NATION_7")
    n1 = (
        load_table(spark, sf_dir, "nation")
        .where(F.col("n_name").isin(*pair))
        .select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    )
    n2 = (
        load_table(spark, sf_dir, "nation")
        .where(F.col("n_name").isin(*pair))
        .select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    )
    rev = dec("l_extendedprice") * one_minus("l_discount")
    return (
        li.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            dec_sum(rev, "revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )
