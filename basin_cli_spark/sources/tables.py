"""Fixture-table loaders.

The reference's only scan operators are a Parquet scan
(``SELECT * FROM read_parquet(f)``, reference internal/app/test_util.go:38-39)
and a Postgres ``information_schema`` scan — the analytics surface here reads
the driver-generated TPC-H-ish parquet tables.

Scale note: ``spark.read.parquet`` is the DataSourceV2 vectorized reader —
predicate pushdown + column pruning reach the footer/min-max level, so the
same loader is correct at 100 TB provided queries filter/select before wide
ops (verified with .explain in tests/test_plans.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any scale factor (TPC-H
# region/nation are constant-size; supplier/part grow slowly).  Joins against
# these should never shuffle the fact side.
BROADCAST_TABLES = {"region", "nation", "supplier"}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table, normalizing physical quirks.

    The events fixture stores parquet TIMESTAMP(NANOS); with
    ``spark.sql.legacy.parquet.nanosAsLong=true`` it surfaces as a raw
    nanosecond LongType which we convert to timestamp_ntz via exact integer
    division (truncation to micros — the same truncation DuckDB applies, so
    the oracle sees identical values).
    """
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for field in df.schema.fields:
        if field.name == "ts" and isinstance(field.dataType, T.LongType):
            # `div` = integer division: double division would lose the low
            # microseconds at ~1.7e18 nanos (observed as ±1us oracle drift).
            df = df.withColumn(
                "ts",
                F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz"),
            )
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for the SQL surface."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


# -- adaptive CPU spread for under-split scans (r14 optimization) -------------
#
# Parquet scan tasks cannot split below a ROW GROUP: a table written as one
# row group per file yields at most one non-empty scan task per file no
# matter how small spark.sql.files.maxPartitionBytes goes, so every
# map-side operator above the scan (filters, projections, partial
# aggregation, text folds) runs at the file count's parallelism — one core
# for the single-file fixture tables here (optimization guide §2.5 "input
# skew: one huge unsplittable file", §6 input split size).  Measured at
# sf0.1/local[32]: q1's scan+partial-agg runs 0.89 s single-core vs 0.59 s
# with the map side spread over the cluster.
#
# spread_cpu() repartitions a freshly-scanned table by the hash of its
# unique key ONLY when the file layout actually under-splits the scan
# (row groups * SPREAD_FACTOR <= defaultParallelism).  On a well-laid-out
# warehouse table (100 TB in 128 MB row groups) the check reads one footer
# and leaves the plan untouched, so this is layout-adaptive, not a
# local[32] tuning.  Hash keys, not round-robin: repartition(n) pays a
# local sort of the input (sortBeforeRepartition, SPARK-23207) on the one
# core the scan runs on — measured 1.12 s vs 0.65 s for q1 at sf0.1 —
# while hashing a unique key is deterministic under retries (guide §2.5)
# and spreads evenly.  Catalyst pushes query filters and column pruning
# BELOW the repartition to the scan (verified: PushedFilters/ReadSchema
# unchanged), so selective queries shuffle only surviving rows.

_ROW_GROUPS_CACHE: dict[str, int] = {}

# unique key per spreadable table (the hash argument; guide §2.5 wants a
# deterministic high-cardinality key, never rand())
SPREAD_KEYS = {
    "lineitem": ("l_orderkey", "l_linenumber"),
    "orders": ("o_orderkey",),
    "customer": ("c_custkey",),
    "part": ("p_partkey",),
    "events": ("event_id",),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
}

# spread only when row groups fall this far short of the session cores
SPREAD_FACTOR = int(os.environ.get("SPARK_GRAFT_SPREAD_FACTOR", "2"))


def scan_row_groups(sf_dir: str, name: str) -> int:
    """Total parquet row groups of a fixture table — the hard ceiling on
    its scan parallelism.  One driver-side footer read, memoized per
    path; unknown layouts (directories of files, remote stores) are
    assumed well-split so spread_cpu never taxes them."""
    key = os.path.join(sf_dir, f"{name}.parquet")
    if key not in _ROW_GROUPS_CACHE:
        try:
            import pyarrow.parquet as pq

            _ROW_GROUPS_CACHE[key] = max(
                1, pq.ParquetFile(key).metadata.num_row_groups
            )
        except Exception:
            _ROW_GROUPS_CACHE[key] = 1 << 30
    return _ROW_GROUPS_CACHE[key]


def spread_cpu(df: DataFrame, sf_dir: str, name: str) -> DataFrame:
    """Spread an under-split scan's downstream map work across the
    cluster (no-op when the file layout already splits well — see the
    block comment above)."""
    if os.environ.get("SPARK_GRAFT_SPREAD", "1") == "0":
        return df
    par = df.sparkSession.sparkContext.defaultParallelism
    if scan_row_groups(sf_dir, name) * SPREAD_FACTOR > par:
        return df
    keys = SPREAD_KEYS.get(name)
    if not keys:
        return df
    return df.repartition(par, F.xxhash64(*keys))
