"""TPC-H Q2/Q8/Q9/Q11/Q13/Q15/Q16/Q20/Q21 shapes, adapted to the trimmed
fixture schemas (no partsupp table, no commit/receipt dates — the
part-supplier relation is derived from lineitem, and "supply cost" is the
minimum observed line price per (part, supplier) pair).

Together with relational.py/analytics.py this completes all 22 TPC-H
query shapes.  The adaptations preserve each query's *planning* shape —
correlated scalar subqueries decorrelated into aggregate joins, EXISTS /
NOT EXISTS as semi/anti joins, scalar thresholds as broadcast single-row
cross joins — which is what matters at 100 TB; only the column arithmetic
is adjusted to the available fixture columns.

Determinism: all money/quantity math stays in DECIMAL(18,2) until the
final cast to double (see queries/_helpers.py); fraction thresholds are
expressed as integer multiplications (value * 500 > total, qty * 2 >
part_total) so neither engine ever divides a decimal.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from basin_cli_spark.queries import register
from basin_cli_spark.queries._helpers import (
    dec,
    dec_sum,
    one_minus,
    sql_dec,
    sql_dec_sum,
)
from basin_cli_spark.sources import load_table

_REV = f"{sql_dec('l_extendedprice')} * (1 - {sql_dec('l_discount')})"


@register(
    "q2_min_cost_supplier",
    f"""
WITH offers AS (
  SELECT l_partkey, l_suppkey,
         MIN({sql_dec('l_extendedprice')}) AS offer_price
  FROM lineitem GROUP BY l_partkey, l_suppkey
),
eur AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
),
eo AS (
  SELECT o.l_partkey, o.offer_price, e.s_name, e.s_acctbal, e.n_name
  FROM offers o JOIN eur e ON o.l_suppkey = e.s_suppkey
),
mpp AS (
  SELECT l_partkey, MIN(offer_price) AS min_cost FROM eo GROUP BY l_partkey
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
       CAST(eo.offer_price AS DOUBLE) AS supply_cost
FROM part
JOIN eo ON p_partkey = eo.l_partkey
JOIN mpp ON eo.l_partkey = mpp.l_partkey AND eo.offer_price = mpp.min_cost
WHERE p_type = 'STANDARD' AND p_size <= 25
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
""",
)
def q2_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape (minimum-cost supplier): the correlated MIN
    subquery is decorrelated into a per-part minimum over the
    region-filtered offer table, joined back on (part, cost) — the
    aggregate and the join share the l_partkey shuffle (exchange reuse).
    "Supply cost" is the minimum line price each supplier ever charged
    for the part, the closest analogue in a schema without partsupp."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    offers = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(dec("l_extendedprice")).alias("offer_price")
    )
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(
        F.col("r_name") == "EUROPE"
    )
    eur = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    eo = offers.join(
        eur, offers["l_suppkey"] == eur["s_suppkey"]
    ).select("l_partkey", "offer_price", "s_name", "s_acctbal", "n_name")
    mpp = eo.groupBy(F.col("l_partkey").alias("_pk")).agg(
        F.min("offer_price").alias("min_cost")
    )
    part = (
        load_table(spark, sf_dir, "part")
        .where((F.col("p_type") == "STANDARD") & (F.col("p_size") <= 25))
        .select("p_partkey", "p_name")
    )
    return (
        eo.join(
            mpp,
            (eo["l_partkey"] == mpp["_pk"])
            & (eo["offer_price"] == mpp["min_cost"]),
        )
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            F.col("offer_price").cast("double").alias("supply_cost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "q8_market_share",
    f"""
WITH volumes AS (
  SELECT YEAR(o_orderdate) AS o_year,
         {_REV} AS volume,
         ns.n_name AS supp_nation
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation nc ON c_nationkey = nc.n_nationkey
  JOIN region ON nc.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ns ON s_nationkey = ns.n_nationkey
  WHERE r_name = 'ASIA'
    AND p_type = 'STANDARD'
    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
)
SELECT o_year,
       CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume
                     ELSE CAST(0 AS DECIMAL(18,2)) END) AS VARCHAR) AS DOUBLE)
         / CAST(CAST(SUM(volume) AS VARCHAR) AS DOUBLE) AS mkt_share
FROM volumes GROUP BY o_year
""",
)
def q8_market_share(spark, sf_dir):
    """TPC-H Q8 shape (national market share): one nation's share of
    part-type revenue sold into a region, by order year.  Every
    dimension filters before its join; nation aliases and region are
    constant-size and broadcast by hint, while part/customer/supplier
    scale with SF so their join strategy is left to AQE (broadcast while
    small, shuffle at scale).  The share is a conditional decimal sum over the same rows
    as the denominator — one aggregation, no second pass."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    part = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_type") == "STANDARD")
        .select("p_partkey")
    )
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp_ntz")
    hi = F.lit("1998-01-01 00:00:00").cast("timestamp_ntz")
    orders = (
        load_table(spark, sf_dir, "orders")
        .where((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
        .select("o_orderkey", "o_custkey", "o_orderdate")
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nc = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nc_key"), F.col("n_regionkey").alias("nc_region")
    )
    region = load_table(spark, sf_dir, "region").where(
        F.col("r_name") == "ASIA"
    ).select("r_regionkey")
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    ns = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation")
    )
    rev = dec("l_extendedprice") * one_minus("l_discount")
    zero = F.lit(0).cast("decimal(18,2)")
    national = F.when(F.col("supp_nation") == "NATION_3", rev).otherwise(zero)
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("nc_key"))
        .join(F.broadcast(region), F.col("nc_region") == F.col("r_regionkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns_key"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            (
                F.sum(national).cast("double") / F.sum(rev).cast("double")
            ).alias("mkt_share")
        )
    )


@register(
    "q9_product_type_profit",
    f"""
SELECT n_name AS nation, YEAR(o_orderdate) AS o_year,
       {sql_dec_sum(
           f"{_REV} - {sql_dec('p_retailprice')} * {sql_dec('l_quantity')}",
           'sum_profit')}
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON o_orderkey = l_orderkey
WHERE p_name LIKE '%bolt%'
GROUP BY n_name, YEAR(o_orderdate)
""",
)
def q9_product_type_profit(spark, sf_dir):
    """TPC-H Q9 shape (product-type profit): profit per supplier nation
    per year over a part-name pattern.  Cost is retail price x quantity
    (no partsupp in the fixture).  The LIKE filter prunes part before
    the join; nation (constant-size) broadcasts by hint, part/supplier
    are left to AQE because they scale with SF."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_quantity", "l_extendedprice", "l_discount",
    )
    part = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_name").like("%bolt%"))
        .select("p_partkey", "p_retailprice")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    profit = dec("l_extendedprice") * one_minus("l_discount") - dec(
        "p_retailprice"
    ) * dec("l_quantity")
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(dec_sum(profit, "sum_profit"))
    )


@register(
    "q11_important_parts",
    f"""
WITH vals AS (
  SELECT l_partkey AS p_partkey,
         SUM({sql_dec('l_extendedprice')}) AS val
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
  GROUP BY l_partkey
)
SELECT p_partkey, CAST(CAST(val AS VARCHAR) AS DOUBLE) AS part_value
FROM vals, (SELECT SUM(val) AS total, COUNT(*) AS n_parts FROM vals) t
WHERE val * n_parts * 2 > total * 3
""",
)
def q11_important_parts(spark, sf_dir):
    """TPC-H Q11 shape (important stock): per-part value from one
    region's suppliers, kept when above 1.5x the per-part average (a
    relative threshold, so the filter stays selective-but-non-empty at
    every scale factor, where TPC-H's fixed fraction would go vacuous as
    the part count grows).  The global (total, count) is a single-row
    broadcast cross join (never a driver collect), and the threshold is
    the integer form ``value * n_parts * 2 > total * 3`` so no engine
    divides a decimal.  The vals aggregate feeds both the scalar and the
    filter — exchange reuse, one shuffle over (partkey)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(
        F.col("r_name") == "EUROPE"
    )
    eur = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey")
    )
    vals = (
        li.join(eur, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.col("l_partkey").alias("p_partkey"))
        .agg(F.sum(dec("l_extendedprice")).alias("val"))
    )
    total = vals.agg(
        F.sum("val").alias("total"), F.count(F.lit(1)).alias("n_parts")
    )
    return (
        vals.crossJoin(F.broadcast(total))
        .where(F.col("val") * F.col("n_parts") * 2 > F.col("total") * 3)
        .select("p_partkey", F.col("val").cast("double").alias("part_value"))
    )


@register(
    "q13_customer_distribution",
    """
WITH c_orders AS (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey
       AND o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
  GROUP BY c_custkey
)
SELECT c_count, COUNT(*) AS custdist
FROM c_orders GROUP BY c_count
""",
)
def q13_customer_distribution(spark, sf_dir):
    """TPC-H Q13 shape (customer order distribution): a left outer join
    with the filter in the join condition (customers with zero matching
    orders must survive with count 0), then a two-level aggregation —
    count per customer, histogram over those counts.  The second
    aggregation's input is one row per customer, so the second shuffle
    is tiny at any scale."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = (
        load_table(spark, sf_dir, "orders")
        .where(~F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .select("o_orderkey", "o_custkey")
    )
    per_cust = (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


@register(
    "q15_top_supplier",
    f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         SUM({_REV}) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(CAST(total_revenue AS VARCHAR) AS DOUBLE) AS total_revenue
FROM supplier
JOIN revenue ON s_suppkey = supplier_no,
     (SELECT MAX(total_revenue) AS max_rev FROM revenue) m
WHERE total_revenue = max_rev
""",
)
def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape (top supplier): quarterly revenue per supplier,
    keep the max.  The view-with-max-subquery becomes an aggregate
    reused by both the scalar MAX (broadcast single row) and the filter;
    revenue stays decimal so the equality against the max is exact (a
    float-summed revenue could break ties differently per engine)."""
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp_ntz")
    hi = F.lit("1996-04-01 00:00:00").cast("timestamp_ntz")
    li = (
        load_table(spark, sf_dir, "lineitem")
        .where((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .select("l_suppkey", "l_extendedprice", "l_discount")
    )
    rev = dec("l_extendedprice") * one_minus("l_discount")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(rev).alias("total_revenue")
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_rev"))
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        supp.join(revenue, F.col("s_suppkey") == F.col("supplier_no"))
        .crossJoin(F.broadcast(max_rev))
        .where(F.col("total_revenue") == F.col("max_rev"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_revenue").cast("double").alias("total_revenue"),
        )
    )


@register(
    "q16_part_supplier_counts",
    """
WITH ps AS (
  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
)
SELECT p_brand, p_type, p_size,
       COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM ps
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1'
  AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
""",
)
def q16_part_supplier_counts(spark, sf_dir):
    """TPC-H Q16 shape (part-supplier relationships): how many distinct
    suppliers serve each surviving (brand, type, size) bucket.  The
    part-supplier relation is the distinct (partkey, suppkey) projection
    of lineitem (no partsupp in the fixture); the excluded-supplier
    NOT IN is a broadcast anti join (negative-balance suppliers stand in
    for the reference query's complaint filter)."""
    ps = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    bad = (
        load_table(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    part = (
        load_table(spark, sf_dir, "part")
        .where(
            (F.col("p_brand") != "Brand#1")
            & (F.col("p_type") != "PROMO")
            & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    return (
        ps.join(bad, ps["l_suppkey"] == bad["s_suppkey"], "left_anti")
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q20_excess_shippers",
    f"""
WITH red AS (SELECT p_partkey FROM part WHERE p_name LIKE 'red%'),
qty AS (
  SELECT l_partkey, l_suppkey, SUM({sql_dec('l_quantity')}) AS ps_qty
  FROM lineitem JOIN red ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  GROUP BY l_partkey, l_suppkey
),
tot AS (SELECT l_partkey AS pk, SUM(ps_qty) AS part_qty FROM qty GROUP BY l_partkey)
SELECT DISTINCT s_suppkey, s_name
FROM supplier
JOIN qty ON s_suppkey = l_suppkey
JOIN tot ON l_partkey = pk
WHERE ps_qty * 2 > part_qty
""",
)
def q20_excess_shippers(spark, sf_dir):
    """TPC-H Q20 shape (excess availability): suppliers who shipped more
    than half of some red part's 1996 volume.  The nested IN subqueries
    decorrelate into an aggregate join (per-pair quantity vs per-part
    total — both on the l_partkey shuffle) and a final semi-style
    distinct projection onto supplier.  The half threshold is the
    integer form ``qty * 2 > total``."""
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp_ntz")
    hi = F.lit("1997-01-01 00:00:00").cast("timestamp_ntz")
    red = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .where((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .select("l_partkey", "l_suppkey", "l_quantity")
    )
    qty = (
        li.join(red, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(dec("l_quantity")).alias("ps_qty"))
    )
    tot = qty.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum("ps_qty").alias("part_qty")
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        qty.join(tot, F.col("l_partkey") == F.col("pk"))
        .where(F.col("ps_qty") * 2 > F.col("part_qty"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name")
        .distinct()
    )


@register(
    "q21_waiting_suppliers",
    """
SELECT s_name, COUNT(*) AS numwait
FROM lineitem l1
JOIN orders ON o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
JOIN supplier ON s_suppkey = l1.l_suppkey
WHERE l1.l_returnflag = 'R'
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
def q21_waiting_suppliers(spark, sf_dir):
    """TPC-H Q21 shape (suppliers who kept orders waiting): the only
    supplier with a returned line in a multi-supplier finalized order.
    EXISTS plans as a left-semi join, NOT EXISTS as a left-anti join —
    both on the order key with the supplier-inequality as the join
    residual, so the fact table shuffles once per side and nothing is
    row-multiplied.  Return flag 'R' stands in for the reference's
    receipt-after-commit lateness (no receipt dates in the fixture)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    orders_f = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    base = li.where(F.col("l_returnflag") == "R").join(
        orders_f, F.col("l_orderkey") == F.col("o_orderkey")
    )
    other = li.select(
        F.col("l_orderkey").alias("_ok2"), F.col("l_suppkey").alias("_sk2")
    )
    other_r = li.where(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("_ok3"), F.col("l_suppkey").alias("_sk3")
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        base.join(
            other,
            (F.col("l_orderkey") == F.col("_ok2"))
            & (F.col("l_suppkey") != F.col("_sk2")),
            "left_semi",
        )
        .join(
            other_r,
            (F.col("l_orderkey") == F.col("_ok3"))
            & (F.col("l_suppkey") != F.col("_sk3")),
            "left_anti",
        )
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )
