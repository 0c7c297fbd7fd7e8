"""The reference's event-listing query surface (A10/A11) over the events
fixture — before/after/at filters, latest-N, and paging, via
operators/events.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from basin_cli_spark.operators.events import list_events
from basin_cli_spark.queries import register
from basin_cli_spark.sources import load_table

_WINDOW_SQL = """
SELECT event_id, ts, user_id, event_type, value, props
FROM events
WHERE ts >= TIMESTAMP '2024-01-05 00:00:00'
  AND ts <= TIMESTAMP '2024-01-12 00:00:00'
ORDER BY ts DESC, event_id DESC
LIMIT 20 OFFSET 5
"""


@register("q_events_before_after", _WINDOW_SQL)
def q_events_before_after(spark, sf_dir):
    """`vaults events --before --after` + paging (reference
    pkg/vaultsprovider/provider.go:101-106: filters pushed, never
    fetch-then-filter)."""
    ev = load_table(spark, sf_dir, "events")
    return list_events(
        ev,
        after="2024-01-05 00:00:00",
        before="2024-01-12 00:00:00",
        limit=20,
        offset=5,
    )


@register(
    "q_events_latest_n",
    """
SELECT event_id, ts, user_id, event_type, value, props
FROM events
ORDER BY ts DESC, event_id DESC
LIMIT 15
""",
)
def q_events_latest_n(spark, sf_dir):
    """`vaults events --latest 15` => limit=15 offset=0 (reference
    cmd/vaults/commands.go:524-532)."""
    ev = load_table(spark, sf_dir, "events")
    return list_events(ev, latest=15)


@register(
    "q_events_at",
    """
SELECT e.event_id, e.ts, e.event_type
FROM events e
JOIN (SELECT ts FROM events WHERE event_id = 42) p
  ON e.ts >= p.ts AND e.ts <= p.ts
""",
)
def q_events_at(spark, sf_dir):
    """The reference's ``--at T`` point lookup (before = after = T,
    inclusive — reference cmd/vaults/commands.go:519, 787-803), with T
    taken from the fixture itself (event 42's timestamp) so the lookup is
    meaningful at every scale factor.  Expressed as a broadcast range
    join, not a collect-then-filter."""
    ev = load_table(spark, sf_dir, "events")
    point = ev.where(F.col("event_id") == 42).select(F.col("ts").alias("_at"))
    return (
        ev.join(
            F.broadcast(point),
            (F.col("ts") >= F.col("_at")) & (F.col("ts") <= F.col("_at")),
        )
        .select("event_id", "ts", "event_type")
    )
