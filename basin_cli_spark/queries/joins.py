"""Join operators (SURVEY.md §2.B "Joins").

The reference exercises inner equi-joins and LEFT JOINs in its
schema-discovery SQL (reference cmd/vaults/commands.go:862, 880-884); the
rest completes the declared surface: semi/anti, full, cross/theta, range,
and as-of.

Scale notes:
* Dimension joins (nation/region/buckets) are explicit ``F.broadcast`` —
  no shuffle of the fact side at any scale.
* The fact-fact joins (orders x customer) shuffle on the join key; AQE
  handles skew splitting.
* The as-of join avoids the classic candidate-explosion (join-then-filter)
  plan entirely: one union + one window over (key, time) — a single shuffle,
  linear state, works at 100 TB where a range-join would blow up.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from basin_cli_spark.queries import register
from basin_cli_spark.queries._helpers import dec, dec_sum
from basin_cli_spark.sources import load_table


@register(
    "q_join_inner_broadcast",
    """
SELECT n_name, r_name, COUNT(*) AS n_orders,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
GROUP BY n_name, r_name
""",
)
def q_join_inner_broadcast(spark, sf_dir):
    """Revenue rollup through the dimension chain — TPC-H Q5 shape."""
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp_ntz")
    )
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name", "r_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dec_sum(dec("o_totalprice"), "revenue"),
        )
    )


@register(
    "q_join_left",
    """
SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
       CAST(CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 0) AS VARCHAR) AS DOUBLE) AS total_spent
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey
""",
)
def q_join_left(spark, sf_dir):
    """LEFT OUTER preserving customers without orders (count 0, total 0)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.sum(dec("o_totalprice")), F.lit(0).cast("decimal(18,2)"))
            .cast("double")
            .alias("total_spent"),
        )
    )


@register(
    "q_join_full",
    """
SELECT a.a_key, b.b_key
FROM (SELECT DISTINCT c_nationkey AS a_key FROM customer) a
FULL JOIN (SELECT DISTINCT s_nationkey AS b_key FROM supplier) b
ON a.a_key = b.b_key
""",
)
def q_join_full(spark, sf_dir):
    a = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("a_key")
    ).distinct()
    b = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("b_key")
    ).distinct()
    return a.join(b, a.a_key == b.b_key, "full").select("a_key", "b_key")


@register(
    "q_join_semi",
    """
SELECT c_custkey, c_name FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
""",
)
def q_join_semi(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "q_join_anti",
    """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 350000.0)
""",
)
def q_join_anti(spark, sf_dir):
    """Customers who never placed a >350k order.  (Every custkey in the
    fixture has *some* order, so the unfiltered NOT EXISTS would be
    vacuously empty — the price filter keeps the anti-join observable.)"""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_totalprice") > 350000.0
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "q_join_theta",
    """
SELECT n1.n_name AS a_name, n2.n_name AS b_name
FROM nation n1 JOIN nation n2
ON n1.n_regionkey = n2.n_regionkey AND n1.n_nationkey < n2.n_nationkey
""",
)
def q_join_theta(spark, sf_dir):
    """Equi + non-equi conjunct: same-region nation pairs."""
    n1 = load_table(spark, sf_dir, "nation").alias("n1")
    n2 = load_table(spark, sf_dir, "nation").alias("n2")
    return n1.join(
        n2,
        (F.col("n1.n_regionkey") == F.col("n2.n_regionkey"))
        & (F.col("n1.n_nationkey") < F.col("n2.n_nationkey")),
    ).select(F.col("n1.n_name").alias("a_name"), F.col("n2.n_name").alias("b_name"))


@register(
    "q_join_cross",
    """
SELECT r1.r_name AS a_name, r2.r_name AS b_name
FROM region r1 CROSS JOIN region r2
""",
)
def q_join_cross(spark, sf_dir):
    r1 = load_table(spark, sf_dir, "region").select(F.col("r_name").alias("a_name"))
    r2 = load_table(spark, sf_dir, "region").select(F.col("r_name").alias("b_name"))
    return r1.crossJoin(r2)


@register(
    "q_join_range",
    """
SELECT b.bucket, COUNT(*) AS n,
       CAST(CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_value
FROM events e
JOIN (SELECT i AS bucket, CAST(i * 20 AS DOUBLE) AS lo,
             CAST((i + 1) * 20 AS DOUBLE) AS hi
      FROM range(10) t(i)) b
ON e.value >= b.lo AND e.value < b.hi
GROUP BY b.bucket
""",
)
def q_join_range(spark, sf_dir):
    """Range/interval join: events bucketed into value intervals.  The
    interval side is tiny and broadcast — Spark plans BroadcastNestedLoop,
    which is the right physical strategy for band joins at scale when one
    side is small."""
    ev = load_table(spark, sf_dir, "events")
    buckets = spark.range(10).select(
        F.col("id").alias("bucket"),
        (F.col("id") * 20).cast("double").alias("lo"),
        ((F.col("id") + 1) * 20).cast("double").alias("hi"),
    )
    return (
        ev.join(
            F.broadcast(buckets),
            (ev.value >= buckets.lo) & (ev.value < buckets.hi),
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"), dec_sum(dec("value"), "sum_value"))
    )


@register(
    "q_join_asof",
    """
WITH clicks AS (
  SELECT user_id, ts, MAX(value) AS click_value
  FROM events WHERE event_type = 'click' GROUP BY user_id, ts
),
purchases AS (
  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
)
SELECT p.event_id, p.user_id, p.ts, p.value, c.ts AS click_ts, c.click_value
FROM purchases p
ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND p.ts >= c.ts
""",
)
def q_join_asof(spark, sf_dir):
    """As-of join: for each purchase, the latest click of the same user at
    or before the purchase time (reference-adjacent to 'latest event <= ts',
    SURVEY §2.B).

    Spark has no ASOF JOIN; instead of join-then-filter (quadratic
    candidates) we union both sides and carry the last click forward with
    ``last(ignorenulls)`` over a (user, time) window — one shuffle, O(n)
    state, scales linearly.  Clicks sort before purchases on time ties, so
    ts-equal clicks match (same inclusive semantics as DuckDB ASOF >=).
    """
    ev = load_table(spark, sf_dir, "events")
    clicks = (
        ev.where(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("click_value"))
        .select(
            "user_id",
            "ts",
            F.lit(0).alias("kind"),
            F.lit(None).cast("bigint").alias("event_id"),
            F.lit(None).cast("double").alias("value"),
            F.col("ts").alias("click_ts_src"),
            "click_value",
        )
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(1).alias("kind"),
        "event_id",
        "value",
        F.lit(None).cast("timestamp_ntz").alias("click_ts_src"),
        F.lit(None).cast("double").alias("click_value"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "kind")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    merged = clicks.unionByName(purchases).select(
        "*",
        F.last("click_ts_src", ignorenulls=True).over(w).alias("asof_click_ts"),
        F.last("click_value", ignorenulls=True).over(w).alias("asof_click_value"),
    )
    return merged.where(F.col("kind") == 1).select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.col("asof_click_ts").alias("click_ts"),
        F.col("asof_click_value").alias("click_value"),
    )


@register(
    "q_join_right",
    """
SELECT o_orderkey, o_orderpriority, c_name
FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
WHERE c_custkey < 300
""",
)
def q_join_right(spark, sf_dir):
    """RIGHT OUTER preserving customers without orders (NULL order side).
    Catalyst plans it as the mirrored left join — same physical cost."""
    c = load_table(spark, sf_dir, "customer").where(F.col("c_custkey") < 300)
    o = load_table(spark, sf_dir, "orders")
    return o.join(c, o.o_custkey == c.c_custkey, "right").select(
        "o_orderkey", "o_orderpriority", "c_name"
    )
