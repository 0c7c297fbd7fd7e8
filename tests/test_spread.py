"""spread_cpu — the layout-adaptive CPU spread for under-split scans
(r14 optimization; sources/tables.py).

Contract under test:
* under-split layout (row groups * SPREAD_FACTOR <= cores): the scan is
  hash-repartitioned on the table's unique key — deterministic, never
  round-robin (round-robin pays a map-side sort, SPARK-23207);
* well-split layout: the plan is untouched (no Exchange added);
* results are identical either way (the repartition is pure placement);
* query filters still reach the parquet scan below the spread exchange
  (pushdown is what keeps the spread free for selective queries).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from basin_cli_spark.sources import load_table, spread_cpu
from basin_cli_spark.sources import tables as TBL


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_spread_under_split_adds_hash_exchange(spark, sf_dir):
    # the fixture tables are single-row-group files, far below the
    # session parallelism -> spread must fire with a hash partitioning
    # on the declared unique key
    df = spread_cpu(
        load_table(spark, sf_dir, "lineitem"), sf_dir, "lineitem"
    )
    plan = plan_of(df)
    assert "REPARTITION_BY_NUM" in plan
    assert "xxhash64(l_orderkey" in plan
    assert "RoundRobinPartitioning" not in plan


def test_spread_noop_on_well_split_layout(spark, sf_dir):
    # simulate a well-split warehouse layout via the memoized row-group
    # count: at cores-many row groups the scan needs no help
    key = os.path.join(sf_dir, "lineitem.parquet")
    old = TBL._ROW_GROUPS_CACHE.get(key)
    TBL._ROW_GROUPS_CACHE[key] = 4096
    try:
        df = spread_cpu(
            load_table(spark, sf_dir, "lineitem"), sf_dir, "lineitem"
        )
        assert "Exchange" not in plan_of(df)
    finally:
        if old is None:
            TBL._ROW_GROUPS_CACHE.pop(key, None)
        else:
            TBL._ROW_GROUPS_CACHE[key] = old


def test_spread_noop_for_unknown_table(spark, sf_dir):
    df = load_table(spark, sf_dir, "nation")  # no SPREAD_KEYS entry
    assert "Exchange" not in plan_of(spread_cpu(df, sf_dir, "nation"))


def test_spread_env_kill_switch(spark, sf_dir, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_SPREAD", "0")
    df = spread_cpu(
        load_table(spark, sf_dir, "lineitem"), sf_dir, "lineitem"
    )
    assert "Exchange" not in plan_of(df)


def test_spread_preserves_rows_and_pushdown(spark, sf_dir):
    base = load_table(spark, sf_dir, "lineitem")
    spreaded = spread_cpu(base, sf_dir, "lineitem")
    pred = F.col("l_quantity") <= 5
    a = sorted(
        tuple(r)
        for r in base.where(pred).select("l_orderkey", "l_linenumber").collect()
    )
    b = sorted(
        tuple(r)
        for r in spreaded.where(pred)
        .select("l_orderkey", "l_linenumber")
        .collect()
    )
    assert a == b and len(a) > 0
    # the filter must reach the scan BELOW the spread exchange
    plan = plan_of(spreaded.where(pred).select("l_orderkey"))
    scan = plan.split("(1) Scan", 1)[1].split("(2)")[0]
    assert "LessThanOrEqual(l_quantity,5" in scan, scan


def test_spread_scan_row_groups_memoized(sf_dir):
    n1 = TBL.scan_row_groups(sf_dir, "orders")
    assert n1 >= 1
    key = os.path.join(sf_dir, "orders.parquet")
    assert key in TBL._ROW_GROUPS_CACHE
