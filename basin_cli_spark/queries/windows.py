"""Window-function and event-time-window operators
(SURVEY.md §2.B "Window functions", "Streaming-only operators" batch-mode
equivalents).

Every window sits on a total order (unique-key tie-break) so ranks and
frames are deterministic.  The batch event-time windows (tumbling / sliding
/ session) are the same F.window / F.session_window operators used by the
streaming layer (basin_cli_spark/streaming), checked here against explicit
epoch-arithmetic SQL.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from basin_cli_spark.queries import register
from basin_cli_spark.queries._helpers import dec
from basin_cli_spark.sources import load_table


@register(
    "q_window_rank",
    """
SELECT o_orderpriority, o_orderkey, o_totalprice,
       ROW_NUMBER()  OVER w AS rn,
       RANK()        OVER w AS rnk,
       DENSE_RANK()  OVER w AS drnk,
       NTILE(4)      OVER w AS quartile
FROM orders
WHERE o_custkey < 100
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey)
""",
)
def q_window_rank(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").where(F.col("o_custkey") < 100)
    w = W.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return o.select(
        "o_orderpriority",
        "o_orderkey",
        "o_totalprice",
        F.row_number().over(w).cast("long").alias("rn"),
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )


@register(
    "q_window_lag_lead",
    """
SELECT user_id, event_id, value,
       LAG(value)  OVER w AS prev_value,
       LEAD(value) OVER w AS next_value,
       FIRST_VALUE(event_id) OVER w AS first_event
FROM events
WHERE user_id < 40
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
""",
)
def q_window_lag_lead(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") < 40)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    wf = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    return ev.select(
        "user_id",
        "event_id",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.first("event_id").over(wf).alias("first_event"),
    )


@register(
    "q_window_running",
    """
SELECT user_id, event_id,
       CAST(CAST(SUM(CAST(value AS DECIMAL(18,2)))
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE) AS running_total,
       COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_n
FROM events
WHERE user_id < 40
""",
)
def q_window_running(spark, sf_dir):
    """Cumulative frame; decimal sum keeps the prefix-sums exact."""
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") < 40)
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.sum(dec("value")).over(w).cast("double").alias("running_total"),
        F.count(F.lit(1)).over(w).alias("running_n"),
    )


@register(
    "q_window_moving_avg",
    """
SELECT user_id, event_id,
       CAST(CAST(SUM(CAST(value AS DECIMAL(18,2)))
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE)
       / COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS moving_avg
FROM events
WHERE user_id < 40
""",
)
def q_window_moving_avg(spark, sf_dir):
    """Bounded sliding frame (3-row moving average, exact arithmetic)."""
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") < 40)
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, W.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        (F.sum(dec("value")).over(w).cast("double") / F.count(F.lit(1)).over(w)).alias(
            "moving_avg"
        ),
    )


@register(
    "q_topk_per_group",
    """
SELECT user_id, event_id, ts FROM (
  SELECT user_id, event_id, ts,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn <= 3
""",
)
def q_topk_per_group(spark, sf_dir):
    """Latest-3 events per user — generalizes the reference's ``--latest N``
    paging (reference cmd/vaults/commands.go:524-532) to per-key top-k.
    Catalyst rewrites rn<=3 into a per-partition top-k (WindowGroupLimit) —
    no full sort of each partition at scale."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        ev.select("user_id", "event_id", "ts", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") <= 3)
        .drop("rn")
    )


@register(
    "q_window_tumbling",
    """
SELECT DATE_TRUNC('hour', ts) AS window_start,
       DATE_TRUNC('hour', ts) + INTERVAL 1 HOUR AS window_end,
       COUNT(*) AS n,
       CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
""",
)
def q_window_tumbling(spark, sf_dir):
    """Event-time tumbling window (batch mode of the streaming operator —
    the reference's windowing is processing-time only, reference
    internal/app/db.go:83-101; event-time is the EXT generalization)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec("value")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n",
            "sum_value",
        )
    )


@register(
    "q_window_sliding",
    """
WITH slides AS (
  SELECT e.*, MAKE_TIMESTAMP((EPOCH_US(ts) // 1800000000 - s.k) * 1800000000) AS window_start
  FROM events e, (SELECT UNNEST([0, 1]) AS k) s
)
SELECT window_start, window_start + INTERVAL 1 HOUR AS window_end, COUNT(*) AS n
FROM slides
WHERE ts < window_start + INTERVAL 1 HOUR
GROUP BY window_start
""",
)
def q_window_sliding(spark, sf_dir):
    """Sliding window (1h / 30m): every event lands in 2 windows.  Oracle
    replays Spark's epoch-aligned window assignment with integer epoch
    arithmetic."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n",
        )
    )


@register(
    "q_session_window",
    """
WITH gaps AS (
  SELECT user_id, ts, event_id,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE OR
                   LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events WHERE user_id < 100
),
sessions AS (
  -- ORDER BY ts, event_id: ts alone is not a total order under duplicate
  -- timestamps, and a ROWS cumsum over a non-total order places the
  -- session-opening row nondeterministically among its ts-peers (caught
  -- by tests/test_degenerate_events.py as a flaky extra session)
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM gaps
)
SELECT user_id, MIN(ts) AS session_start, MAX(ts) + INTERVAL 30 MINUTE AS session_end,
       COUNT(*) AS n_events
FROM sessions
GROUP BY user_id, session_id
""",
)
def q_session_window(spark, sf_dir):
    """Session window (30 min gap).  Spark's native session_window merges
    events closer than the gap; the oracle reconstructs sessions with the
    classic lag/cumsum idiom."""
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") < 100)
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


@register(
    "q_window_range_frame",
    """
SELECT user_id, event_id,
       CAST(CAST(SUM(CAST(value AS DECIMAL(18,2)))
            OVER (PARTITION BY user_id ORDER BY CAST(EPOCH(ts) AS BIGINT)
                  RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE)
         AS hour_sum,
       COUNT(*) OVER (PARTITION BY user_id ORDER BY CAST(EPOCH(ts) AS BIGINT)
                      RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS hour_n
FROM events
WHERE user_id < 40
""",
)
def q_window_range_frame(spark, sf_dir):
    """Value-based RANGE frame: per-user trailing-hour sum/count, ordered
    by epoch seconds (both engines floor to the same integer key, so the
    frame boundaries — and tie peer groups — agree exactly).  Unlike the
    ROWS frames above, the frame width here is data-dependent; Spark
    evaluates it in a single window exec after the partition shuffle."""
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") < 40)
    epoch = F.unix_timestamp(F.col("ts").cast("timestamp")).alias("_epoch")
    w = (
        W.partitionBy("user_id")
        .orderBy(epoch)
        .rangeBetween(-3600, W.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.sum(dec("value")).over(w).cast("double").alias("hour_sum"),
        F.count(F.lit(1)).over(w).alias("hour_n"),
    )


@register(
    "q_window_percent_rank",
    """
SELECT o_orderpriority, o_orderkey,
       ROUND(PERCENT_RANK() OVER w, 9) AS pct_rank,
       ROUND(CUME_DIST()    OVER w, 9) AS cume
FROM orders
WHERE o_custkey < 100
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey)
""",
)
def q_window_percent_rank(spark, sf_dir):
    """Relative-position window functions (percent_rank / cume_dist) on a
    total order (price desc, key tie-break) — deterministic ratios of
    integer ranks, rounded identically in both engines."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_custkey") < 100)
    w = W.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return o.select(
        "o_orderpriority",
        "o_orderkey",
        F.round(F.percent_rank().over(w), 9).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 9).alias("cume"),
    )


_GAPFILL_ORACLE = """
WITH daily AS (
  SELECT user_id, CAST(DATE_TRUNC('day', ts) AS DATE) AS day,
         COUNT(*) AS n,
         CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_v
  FROM events WHERE user_id < 20
  GROUP BY 1, 2
),
bounds AS (SELECT MIN(day) AS mn, MAX(day) AS mx FROM daily),
users AS (SELECT DISTINCT user_id FROM daily),
days AS (
  SELECT CAST(UNNEST(generate_series(mn, mx, INTERVAL 1 DAY)) AS DATE) AS day
  FROM bounds
),
spine AS (SELECT u.user_id, d.day FROM users u, days d),
g AS (
  SELECT s.user_id, s.day, COALESCE(d.n, 0) AS n_events, d.sum_v
  FROM spine s LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day
)
SELECT user_id, CAST(day AS VARCHAR) AS day, n_events,
       LAST_VALUE(sum_v IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS ff_sum
FROM g
"""


@register("q_timeseries_gapfill", _GAPFILL_ORACLE)
def q_timeseries_gapfill(spark, sf_dir):
    """Time-series gap filling — the hypertable-style densify + locf:
    per-user daily rollup, a generated date spine (users x every day in
    the observed range), zero-filled counts on missing days, and the last
    observed daily sum carried forward with an IGNORE NULLS running-frame
    window.

    Scale shape: the spine is |users| x |days| rows built by exploding a
    sequence against the (1-row, broadcast) bounds — never a shuffle of
    the fact table; the left join keys on (user_id, day); the locf window
    is a running frame, so state per partition is one value."""
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") < 20)
    daily = ev.groupBy(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec("value")).cast("double").alias("sum_v"),
    )
    bounds = daily.agg(F.min("day").alias("mn"), F.max("day").alias("mx"))
    users = daily.select("user_id").distinct()
    spine = users.crossJoin(F.broadcast(bounds)).select(
        "user_id", F.explode(F.sequence("mn", "mx")).alias("day")
    )
    g = spine.join(daily, ["user_id", "day"], "left")
    w = (
        W.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return g.select(
        "user_id",
        F.col("day").cast("string").alias("day"),
        F.coalesce("n", F.lit(0)).alias("n_events"),
        F.last("sum_v", ignorenulls=True).over(w).alias("ff_sum"),
    )


_IGNORE_NULLS_ORACLE = """
WITH base AS (
  SELECT event_id, ts, user_id,
         CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
  FROM events WHERE user_id < 20
)
SELECT event_id,
       LAG(v IGNORE NULLS) OVER w AS prev_ok,
       LEAD(v IGNORE NULLS) OVER w AS next_ok,
       FIRST_VALUE(v IGNORE NULLS) OVER w AS first_ok
FROM base
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


@register("q_window_ignore_nulls", _IGNORE_NULLS_ORACLE)
def q_window_ignore_nulls(spark, sf_dir):
    """IGNORE NULLS navigation functions (lag/lead/first_value) — the
    'most recent valid reading' idiom over a measure with gaps (here
    'error' events null their value).  Each window sits on the total
    order (ts, event_id), so both engines pick identical neighbors."""
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") < 20)
    v = F.when(F.col("event_type") == "error", F.lit(None)).otherwise(
        F.col("value")
    )
    base = ev.select("event_id", "ts", "user_id", v.alias("v"))
    # lag/lead don't expose ignorenulls in the Python API; the SQL form
    # plans the same WindowExpression
    over = "OVER (PARTITION BY user_id ORDER BY ts, event_id)"
    return base.select(
        "event_id",
        F.expr(f"lag(v) IGNORE NULLS {over}").alias("prev_ok"),
        F.expr(f"lead(v) IGNORE NULLS {over}").alias("next_ok"),
        F.expr(f"first_value(v) IGNORE NULLS {over}").alias("first_ok"),
    )


_ROLLUP_HIER_ORACLE = """
WITH base AS (
  SELECT DATE_TRUNC('hour', ts) AS h, event_type,
         CAST(value AS DECIMAL(18,2)) AS v
  FROM events
)
SELECT 'hour' AS grain, CAST(h AS VARCHAR) AS bucket, event_type,
       COUNT(*) AS n, CAST(CAST(SUM(v) AS VARCHAR) AS DOUBLE) AS sum_value
FROM base GROUP BY h, event_type
UNION ALL
SELECT 'day', CAST(CAST(DATE_TRUNC('day', h) AS TIMESTAMP) AS VARCHAR), event_type,
       COUNT(*), CAST(CAST(SUM(v) AS VARCHAR) AS DOUBLE)
FROM base GROUP BY DATE_TRUNC('day', h), event_type
UNION ALL
SELECT 'month', CAST(CAST(DATE_TRUNC('month', h) AS TIMESTAMP) AS VARCHAR), event_type,
       COUNT(*), CAST(CAST(SUM(v) AS VARCHAR) AS DOUBLE)
FROM base GROUP BY DATE_TRUNC('month', h), event_type
"""


@register("q_hypertable_rollup", _ROLLUP_HIER_ORACLE)
def q_hypertable_rollup(spark, sf_dir):
    """Hypertable-style continuous-aggregate rollup: hourly buckets are
    aggregated from the raw events ONCE; daily buckets re-aggregate the
    ~24 hourly rows and monthly the ~30 daily rows — count/sum are
    associative, so each coarser grain reads the finer MATERIALIZED level
    instead of re-scanning the fact table (at 100 TB: the raw scan
    happens once per refresh, coarser grains are near-free).  The oracle
    states each grain directly over the base — identical by
    associativity, exact by decimal sums."""
    ev = load_table(spark, sf_dir, "events")
    hourly = (
        ev.groupBy(
            F.date_trunc("hour", "ts").alias("h"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec("value")).alias("sv"),  # stay decimal for re-agg
        )
    )
    from basin_cli_spark.session import persist_once

    hourly = persist_once(hourly)
    daily = hourly.groupBy(
        F.date_trunc("day", "h").alias("d"), "event_type"
    ).agg(F.sum("n").alias("n"), F.sum("sv").alias("sv"))
    monthly = daily.groupBy(
        F.date_trunc("month", "d").alias("m"), "event_type"
    ).agg(F.sum("n").alias("n"), F.sum("sv").alias("sv"))

    def level(df, grain, bucket_col):
        return df.select(
            F.lit(grain).alias("grain"),
            F.col(bucket_col).cast("string").alias("bucket"),
            "event_type",
            "n",
            F.col("sv").cast("double").alias("sum_value"),
        )

    return (
        level(hourly, "hour", "h")
        .unionAll(level(daily, "day", "d"))
        .unionAll(level(monthly, "month", "m"))
    )


@register(
    "q_window_nth_value",
    """
SELECT o_orderpriority, o_orderkey,
       NTH_VALUE(o_orderkey, 2) OVER w AS second_key,
       FIRST_VALUE(o_orderkey) OVER w AS top_key,
       LAST_VALUE(o_orderkey) OVER (
         PARTITION BY o_orderpriority
         ORDER BY o_totalprice DESC, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
       ) AS bottom_key
FROM orders
WHERE o_custkey < 100
WINDOW w AS (PARTITION BY o_orderpriority
             ORDER BY o_totalprice DESC, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
""",
)
def q_window_nth_value(spark, sf_dir):
    """Navigation value functions (nth_value / first_value / last_value)
    with explicit frames: the growing default frame for nth/first, and an
    unbounded frame for last_value (with the default frame last_value is
    just the current row — the classic gotcha both engines share).  The
    (price desc, key) order is total, so every navigated value is
    deterministic."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_custkey") < 100)
    grow = (
        W.partitionBy("o_orderpriority")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    full = (
        W.partitionBy("o_orderpriority")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return o.select(
        "o_orderpriority",
        "o_orderkey",
        F.nth_value("o_orderkey", 2).over(grow).alias("second_key"),
        F.first_value("o_orderkey").over(grow).alias("top_key"),
        F.last_value("o_orderkey").over(full).alias("bottom_key"),
    )
