"""Source/sink round-trip queries (SURVEY.md §2.B sources/sinks).

Each query writes a fixture table through a non-Parquet format and reads
it back with an explicit schema; the oracle is a plain SELECT on the
original table, so a hash match proves writer+reader fidelity end to end
(the Spark shape of the reference's export-then-verify read,
reference internal/app/test_util.go:33-45).

Round-trip columns are chosen without raw doubles: CSV/JSON serialize
floats as shortest-decimal text, and exact float round-tripping is a
property of the Parquet path (covered by q1 and friends), not of text
formats.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from basin_cli_spark.queries import register
from basin_cli_spark.sources import load_table

_SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), ".scratch")


def _fresh(path: str) -> str:
    shutil.rmtree(path, ignore_errors=True)
    return path


@register("q_csv_roundtrip", "SELECT * FROM nation")
def q_csv_roundtrip(spark, sf_dir):
    """nation -> CSV (header) -> read back with explicit schema."""
    n = load_table(spark, sf_dir, "nation")
    path = _fresh(os.path.join(_SCRATCH, "nation_csv"))
    n.write.mode("overwrite").option("header", True).csv(path)
    return spark.read.schema(n.schema).option("header", True).csv(path)


@register(
    "q_json_roundtrip",
    """
SELECT o_orderkey, o_custkey, o_orderstatus, o_orderdate, o_orderpriority
FROM orders
""",
)
def q_json_roundtrip(spark, sf_dir):
    """orders (sans float columns) -> JSON lines -> read back with schema;
    exercises date round-tripping through text."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_orderdate",
        "o_orderpriority",
    )
    path = _fresh(os.path.join(_SCRATCH, "orders_json"))
    o.write.mode("overwrite").json(path)
    return spark.read.schema(o.schema).json(path)


@register(
    "q_in_memory_rows",
    """
SELECT id, name, CAST(d AS VARCHAR) AS d, CAST(flag AS VARCHAR) AS flag
FROM (VALUES
  (1, 'alpha', DATE '2024-01-15', TRUE),
  (2, 'beta',  DATE '2024-02-20', FALSE),
  (3, NULL,    NULL,              NULL)
) t(id, name, d, flag)
""",
)
def q_in_memory_rows(spark, sf_dir):
    """Typed in-memory rows (the Spark shape of the reference's literal
    INSERT codegen, reference internal/app/db.go:254-289): NULLs and
    dates survive createDataFrame with an explicit schema."""
    import datetime

    rows = [
        (1, "alpha", datetime.date(2024, 1, 15), True),
        (2, "beta", datetime.date(2024, 2, 20), False),
        (3, None, None, None),
    ]
    return spark.createDataFrame(
        rows, "id int, name string, d date, flag boolean"
    ).select(
        "id",
        "name",
        F.col("d").cast("string").alias("d"),
        F.col("flag").cast("string").alias("flag"),
    )


@register("q_orc_roundtrip", "SELECT * FROM customer")
def q_orc_roundtrip(spark, sf_dir):
    """customer -> ORC -> read back (native vectorized ORC reader).  ORC is
    binary-typed like Parquet, so doubles round-trip exactly and the whole
    table (floats included) is compared against the original."""
    c = load_table(spark, sf_dir, "customer")
    path = _fresh(os.path.join(_SCRATCH, "customer_orc"))
    c.write.mode("overwrite").orc(path)
    return spark.read.schema(c.schema).orc(path)
