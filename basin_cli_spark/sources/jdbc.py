"""Postgres snapshot scan over JDBC (reference A2).

The reference discovers table schemas from ``information_schema`` before
streaming starts (reference cmd/vaults/commands.go:851-921) and relies on
Postgres for the initial state.  Spark-first, the snapshot is
``spark.read.jdbc`` with *partitioned* reads — a single-connection JDBC
scan would bottleneck a 1000-executor cluster on one socket, so callers
must supply (or let us derive) a numeric partition column + bounds, which
Spark turns into one WHERE-range query per partition.

No Postgres runs in this container, but every client-side piece still
executes live in sandbox tests: the discovery SQL runs over the real
socket wire-protocol client against an in-process fake serving
information_schema result shapes (tests/test_sources.py::
test_schema_discovery_over_wire_protocol, the fake-server doctrine of
the loopback walsender tests), and the *JDBC snapshot machinery* — real
DriverManager connection, partitioned range queries, filter pushdown
into the remote scan — runs live against the embedded Derby database
that ships in Spark's jars.  A ``SPARK_GRAFT_PG_URL`` integration
environment additionally checks a real server's catalog agrees
(mirroring the reference's docker-gated integration tests, reference
pkg/pgrepl/replicator_test.go:37-94).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# The reference's discovery query shape (reference cmd/vaults/commands.go:
# 855-886): columns + PK membership + array element type resolution.  PK
# membership comes from a PRIMARY-KEY-only CTE joined on constraint schema
# + name — joining key_column_usage on (table_name, column_name) alone
# would duplicate rows for columns in both a PK and an FK/unique
# constraint, and could mark same-named tables in other schemas primary.
SCHEMA_DISCOVERY_SQL = """
WITH primary_key_info AS (
  SELECT kcu.constraint_schema, kcu.table_name, kcu.column_name
  FROM information_schema.table_constraints tc
  JOIN information_schema.key_column_usage kcu
    USING (constraint_schema, constraint_name, table_name)
  WHERE tc.constraint_type = 'PRIMARY KEY'
)
SELECT c.column_name,
       CASE WHEN c.data_type = 'ARRAY'
            THEN e.data_type || '[]'
            ELSE c.data_type END AS data_type,
       c.is_nullable = 'YES' AS is_nullable,
       pk.column_name IS NOT NULL AS is_primary
FROM information_schema.columns c
LEFT JOIN information_schema.element_types e
  ON c.table_catalog = e.object_catalog
 AND c.table_schema = e.object_schema
 AND c.table_name = e.object_name
 AND c.dtd_identifier = e.collection_type_identifier
LEFT JOIN primary_key_info pk
  ON c.table_schema = pk.constraint_schema
 AND c.table_name = pk.table_name
 AND c.column_name = pk.column_name
WHERE c.table_schema = '{schema}' AND c.table_name = '{table}'
ORDER BY c.ordinal_position
"""


def discovery_query(schema: str, table: str) -> str:
    """The information_schema query for one table's column spec."""
    if not schema.isidentifier() or not table.isidentifier():
        raise ValueError(f"invalid identifier: {schema}.{table}")
    return SCHEMA_DISCOVERY_SQL.format(schema=schema, table=table)


def discover_table_schema(transport, schema: str, table: str):
    """Run the discovery SQL over a live connection and assemble the
    discovered spec — the engine-side analogue of the reference's
    ``TableSchema`` build (reference cmd/vaults/commands.go:851-921).

    ``transport`` is anything with ``exec_query(sql) -> rows`` in
    Postgres text format — in particular the real socket client
    (sources/pgwire.PgWireReplicationClient): a ``replication=database``
    session accepts plain SQL alongside replication commands, which is
    exactly how the reference discovers schemas on the SAME connection
    family it streams from.  Returns (StructType, primary_key_columns).
    Text-format booleans arrive as 't'/'f'."""
    from basin_cli_spark.types.pg_types import schema_from_pg

    truthy = ("t", "true", "YES", True)
    cols, pks = [], []
    for name, data_type, is_nullable, is_primary in transport.exec_query(
        discovery_query(schema, table)
    ):
        cols.append((name, data_type, is_nullable in truthy))
        if is_primary in truthy:
            pks.append(name)
    if not cols:
        raise ValueError(f"table not found: {schema}.{table}")
    return schema_from_pg(cols), pks


def snapshot_options(
    url: str,
    table: str,
    *,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 32,
    fetch_size: int = 10_000,
    driver: str = "org.postgresql.Driver",
) -> dict[str, str]:
    """JDBC reader options for a parallel snapshot.  With a partition
    column Spark issues ``numPartitions`` range-bounded queries; without
    one the scan is single-connection (only acceptable for dim tables).
    ``driver`` defaults to Postgres (the reference's source database);
    any JDBC driver on the classpath works — tests use Spark's bundled
    embedded Derby to run this path live without a server."""
    opts = {
        "url": url,
        "dbtable": table,
        "driver": driver,
        "fetchsize": str(fetch_size),
    }
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partitioned read needs lower/upper bounds")
        opts.update(
            partitionColumn=partition_column,
            lowerBound=str(lower_bound),
            upperBound=str(upper_bound),
            numPartitions=str(num_partitions),
        )
    return opts


def postgres_snapshot(spark: SparkSession, **kwargs) -> DataFrame:
    """Run the snapshot scan (integration environments only)."""
    return spark.read.format("jdbc").options(**snapshot_options(**kwargs)).load()
