"""Set operations (SURVEY.md §2.B "Set operations").

The reference's set semantics live in its ECMH multiset digests
(union/difference, reference pkg/ecmh/ecmh.go:41-48 — see
basin_cli_spark/functions/ecmh.py); the relational set operators here are
the delegated SQL surface.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from basin_cli_spark.queries import register
from basin_cli_spark.sources import load_table


def _high_value(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return ev.where(F.col("value") > 100).select("user_id", "event_type")


def _clicks(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return ev.where(F.col("event_type") == "click").select("user_id", "event_type")


_A = "SELECT user_id, event_type FROM events WHERE value > 100"
_B = "SELECT user_id, event_type FROM events WHERE event_type = 'click'"


@register(
    "q_union_all",
    f"SELECT user_id, event_type, COUNT(*) AS n FROM ({_A} UNION ALL {_B}) GROUP BY 1, 2",
)
def q_union_all(spark, sf_dir):
    """UNION ALL (bag semantics, verified by multiplicity counts)."""
    u = _high_value(spark, sf_dir).unionByName(_clicks(spark, sf_dir))
    return u.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))


@register("q_union_distinct", f"{_A} UNION {_B}")
def q_union_distinct(spark, sf_dir):
    return _high_value(spark, sf_dir).unionByName(_clicks(spark, sf_dir)).distinct()


@register("q_intersect", f"{_A} INTERSECT {_B}")
def q_intersect(spark, sf_dir):
    return _high_value(spark, sf_dir).intersect(_clicks(spark, sf_dir))


@register("q_except", f"{_A} EXCEPT {_B}")
def q_except(spark, sf_dir):
    return _high_value(spark, sf_dir).subtract(_clicks(spark, sf_dir))


@register(
    "q_intersect_all",
    f"""
SELECT user_id, event_type, COUNT(*) AS n
FROM ({_A} INTERSECT ALL {_B})
GROUP BY 1, 2
""",
)
def q_intersect_all(spark, sf_dir):
    """INTERSECT ALL (bag intersection — keeps min multiplicity)."""
    u = _high_value(spark, sf_dir).intersectAll(_clicks(spark, sf_dir))
    return u.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))


@register(
    "q_except_all",
    f"""
SELECT user_id, event_type, COUNT(*) AS n
FROM ({_A} EXCEPT ALL {_B})
GROUP BY 1, 2
""",
)
def q_except_all(spark, sf_dir):
    u = _high_value(spark, sf_dir).exceptAll(_clicks(spark, sf_dir))
    return u.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
