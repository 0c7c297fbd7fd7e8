"""Degenerate-events differential tests.

The generated events fixture has dense, distinct timestamps and non-null
values, so the window/time-series oracle rows never exercise: DUPLICATE
timestamps (the tie-break every window claims to have), NULL measure
values inside frames and running aggregates, a single-event user, and a
props JSON that is NULL.  Real event streams are full of all four.

Hash-for-hash differential (same harness as tests/test_unicode.py): if a
window's ordering is secretly non-total under ts ties, or a NULL value
leaks differently through a frame aggregate than through DuckDB's, these
fixtures catch it where the dense fixture cannot.
"""

from __future__ import annotations

import datetime as dt

import duckdb
import pytest

from basin_cli_spark.oracle import compare
from basin_cli_spark.queries import load_all


def _ts(minute, second=0, micro=0):
    return dt.datetime(2024, 1, 1, 0, minute, second, micro)


_ROWS = [
    # user 1: THREE events on the identical timestamp (tie-break must be
    # event_id on both engines), plus NULL values from error events
    (0, _ts(5), 1, "click", 10.0, '{"k": 1}'),
    (1, _ts(5), 1, "error", None, '{"k": 2}'),
    (2, _ts(5), 1, "purchase", 30.0, None),
    (3, _ts(9), 1, "error", None, '{"k": 3}'),
    (4, _ts(20), 1, "click", 50.0, '{"k": 4}'),
    # user 2: a single event (1-row windows, LAG/LEAD NULL edges)
    (5, _ts(7), 2, "signup", 70.0, '{"k": 5}'),
    # user 3: all values NULL (SUM/AVG over an all-NULL frame)
    (6, _ts(1), 3, "error", None, '{"k": 6}'),
    (7, _ts(2), 3, "error", None, '{"k": 7}'),
    # user 4: same SECOND, different micros (sub-second ordering)
    (8, _ts(3, 30, 100), 4, "click", 1.5, '{"k": 8}'),
    (9, _ts(3, 30, 200), 4, "click", 2.5, '{"k": 9}'),
]


@pytest.fixture(scope="module")
def degen_ev_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("degenevents")
    spark.createDataFrame(
        _ROWS,
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string",
    ).write.mode("overwrite").parquet(str(d / "events.parquet"))
    return str(d)


@pytest.mark.parametrize(
    "name",
    [
        "q_window_running",
        "q_window_moving_avg",
        "q_window_lag_lead",
        "q_window_sliding",
        "q_window_ignore_nulls",   # IGNORE NULLS across an all-NULL user
        "q_window_range_frame",    # range frame with duplicate ts
        "q_session_window",
        "q_timeseries_gapfill",
        "q_window_tumbling",
        "q_hypertable_rollup",
        "q_events_before_after",
    ],
)
def test_degenerate_events_differential(spark, degen_ev_dir, name):
    spec = load_all()[name]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{degen_ev_dir}/events.parquet/*.parquet')"
    )
    ok, msg = compare(
        spec.fn(spark, degen_ev_dir), con.execute(spec.oracle).arrow()
    )
    assert ok, f"{name} diverges on degenerate events: {msg}"
