"""CDC source: wal2json v2 transaction lines -> typed DataFrames.

The reference decodes wal2json into Tx{CommitLSN, Records[]} on a
replication socket (reference pkg/pgrepl/replicator.go:136-210,
pkg/pgrepl/tx.go:10-39) and replays each record as a generated INSERT
(reference internal/app/db.go:254-289).  Spark-first, the same pipeline is:

    lines (file/socket/Kafka) -> from_json(TX_SCHEMA) -> posexplode(records)
      -> filter(action == 'I') -> per-table pivot to typed columns

Key semantics preserved:
* intra-transaction order: posexplode index + commit_lsn form the sort key
  (the reference's channel preserves WAL order, replicator.go:159-207);
* append-only: only "I" records materialize — the reference documents
  UPDATE/DELETE as ignored (reference README.md:146) even though wal2json
  emits U/D records (reference pkg/pgrepl/replicator_test.go:51-62);
* metadata columns (_action/_xid/_lsn/_commit_lsn/_tx_pos/_commit_ts)
  mirror Record fields so at-least-once replay stays auditable.

The same parse runs in batch (oracle-checkable) and under readStream
(basin_cli_spark/streaming) — one code path, two execution modes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from basin_cli_spark.types import pg_to_spark

# wal2json v2 record shape (reference pkg/pgrepl/tx.go:16-39).  `value` is
# heterogeneous JSON (number | string | bool | null); parsing it as string
# keeps the raw literal which the typed pivot casts per-column.
TX_SCHEMA = T.StructType(
    [
        T.StructField("commit_lsn", T.LongType(), True),
        T.StructField(
            "records",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("action", T.StringType(), True),
                        T.StructField("xid", T.LongType(), True),
                        T.StructField("lsn", T.StringType(), True),
                        T.StructField("nextlsn", T.StringType(), True),
                        T.StructField("timestamp", T.StringType(), True),
                        T.StructField("schema", T.StringType(), True),
                        T.StructField("table", T.StringType(), True),
                        T.StructField(
                            "columns",
                            T.ArrayType(
                                T.StructType(
                                    [
                                        T.StructField("name", T.StringType(), True),
                                        T.StructField("type", T.StringType(), True),
                                        T.StructField("value", T.StringType(), True),
                                    ]
                                )
                            ),
                            True,
                        ),
                        T.StructField(
                            "pk",
                            T.ArrayType(
                                T.StructType(
                                    [
                                        T.StructField("name", T.StringType(), True),
                                        T.StructField("type", T.StringType(), True),
                                    ]
                                )
                            ),
                            True,
                        ),
                    ]
                )
            ),
            True,
        ),
    ]
)

# wal2json commit timestamps look like '2023-08-22 14:44:02.043586-03'
# (reference internal/app/testdata/wal.input) — offset without colon.
_WAL_TS_FMT = "yyyy-MM-dd HH:mm:ss[.SSSSSS]X"


def parse_wal_records(lines: DataFrame, value_col: str = "value") -> DataFrame:
    """One wal2json tx JSON line per input row -> one output row per record,
    with tx metadata flattened and intra-tx order kept in `_tx_pos`."""
    tx = lines.select(F.from_json(F.col(value_col), TX_SCHEMA).alias("tx"))
    rec = tx.select(
        F.col("tx.commit_lsn").alias("_commit_lsn"),
        F.posexplode("tx.records").alias("_tx_pos", "r"),
    )
    return rec.select(
        "_commit_lsn",
        "_tx_pos",
        F.col("r.action").alias("_action"),
        F.col("r.xid").alias("_xid"),
        F.col("r.lsn").alias("_lsn"),
        F.to_timestamp(F.col("r.timestamp"), _WAL_TS_FMT).alias("_commit_ts"),
        F.col("r.schema").alias("_schema"),
        F.col("r.table").alias("_table"),
        F.col("r.columns").alias("_columns"),
    )


def materialize_table(
    records: DataFrame,
    table: str,
    columns: list[tuple[str, str]],
    keep_metadata: bool = False,
) -> DataFrame:
    """Pivot one table's insert records into typed columns.

    `columns` is [(name, pg_type)] — the discovered schema (the reference
    pulls it from information_schema before streaming starts, reference
    cmd/vaults/commands.go:851-921).  Only inserts materialize (append-only
    vaults, reference README.md:146).
    """
    kv = F.map_from_entries(
        F.transform("_columns", lambda c: F.struct(c["name"], c["value"]))
    )
    out = records.where(
        (F.col("_table") == table) & (F.col("_action") == "I")
    ).withColumn("_kv", kv)
    cols = []
    for name, pg_type in columns:
        spark_type = pg_to_spark(pg_type)
        cols.append(F.element_at("_kv", name).cast(spark_type).alias(name))
    meta = (
        [F.col(c) for c in ("_commit_lsn", "_tx_pos", "_xid", "_lsn", "_commit_ts")]
        if keep_metadata
        else []
    )
    return out.select(*cols, *meta)


def read_wal_batch(spark, path: str) -> DataFrame:
    """Batch read of a wal2json JSONL file/dir (crash-recovery sweep and
    the oracle-checkable replay path)."""
    return parse_wal_records(spark.read.text(path))


def read_wal_stream(spark, path: str, max_files_per_trigger: int | None = None) -> DataFrame:
    """Streaming read of a directory receiving wal2json JSONL files — the
    Structured Streaming face of the reference's replication channel."""
    reader = spark.readStream.format("text")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return parse_wal_records(reader.load(path))
