"""Custom stateful per-key streaming operator (SURVEY.md §2.B
"Stateful per-key processing").

The reference's replicator assembles WAL records per transaction in LSN
order and tracks the confirmed flush position across restarts (reference
pkg/pgrepl/replicator.go:159-207, pkg/pgrepl/conn.go:47-56).  The Spark
generalization is arbitrary per-key state kept by the engine's state
store: here, per-table CDC progress (insert count, high-water commit LSN)
maintained with ``applyInPandasWithState`` — state survives micro-batch
boundaries AND restarts via the checkpoint, which is exactly the
``confirmed_flush_lsn`` durability contract.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

PROGRESS_SCHEMA = T.StructType(
    [
        T.StructField("table", T.StringType(), False),
        T.StructField("n_inserts", T.LongType(), False),
        T.StructField("max_commit_lsn", T.LongType(), True),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_inserts", T.LongType(), True),
        T.StructField("max_commit_lsn", T.LongType(), True),
    ]
)


def _update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, max_lsn = state.get if state.exists else (0, None)
    for pdf in pdfs:
        ins = pdf[pdf["_action"] == "I"]
        n += len(ins)
        if len(pdf):
            batch_max = int(pdf["_commit_lsn"].max())
            max_lsn = batch_max if max_lsn is None else max(max_lsn, batch_max)
    state.update((n, max_lsn))
    yield pd.DataFrame(
        {"table": [key[0]], "n_inserts": [n], "max_commit_lsn": [max_lsn]}
    )


def cdc_progress(records: DataFrame) -> DataFrame:
    """Per-table running CDC progress over a stream of parsed WAL records
    (sources/cdc.parse_wal_records output).  Emits one updated row per
    table per micro-batch; state is the engine's HDFS/RocksDB state store,
    partitioned by key — no driver-side accumulation, scales with key
    cardinality not stream length."""
    return records.groupBy("_table").applyInPandasWithState(
        _update,
        outputStructType=PROGRESS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# NOTE: Spark 4's transformWithStateInPandas (typed state handles, timers)
# is the successor API, but its driver worker imports protobuf
# (pyspark/sql/streaming/proto/StateMessage_pb2), which this container
# does not ship and cannot install — applyInPandasWithState above is the
# supported stateful path here; the TWS port is mechanical when protobuf
# is available.


def cdc_apply_stream(records: DataFrame, table: str, pk: str) -> DataFrame:
    """Streaming last-writer-wins CDC merge — the stateful form of
    sources/cdc.apply_changes: per primary key, the engine's state store
    holds the winning (commit_lsn, tx_pos, action, columns-json) so far;
    each micro-batch folds its records in and emits the key's current
    materialized row (action D emits a tombstone marker).  State is one
    small tuple per LIVE key — the bounded-state property that lets this
    run forever on a 100 TB change stream while a window-function
    formulation would need the whole history.

    Returns (key, action, columns_json, commit_lsn): the caller casts
    columns_json per its schema (same pivot as materialize_table)."""
    import json as _json

    from pyspark.sql import functions as F

    out_schema = T.StructType(
        [
            T.StructField("key", T.StringType(), False),
            T.StructField("action", T.StringType(), True),
            T.StructField("columns_json", T.StringType(), True),
            T.StructField("commit_lsn", T.LongType(), True),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("commit_lsn", T.LongType(), True),
            T.StructField("tx_pos", T.IntegerType(), True),
            T.StructField("action", T.StringType(), True),
            T.StructField("columns_json", T.StringType(), True),
        ]
    )

    def _merge(key, pdfs, state):
        lsn, pos, action, cols = (
            state.get if state.exists else (-1, -1, None, None)
        )
        for pdf in pdfs:
            for _, row in pdf.sort_values(
                ["_commit_lsn", "_tx_pos"]
            ).iterrows():
                stamp = (int(row["_commit_lsn"]), int(row["_tx_pos"]))
                if stamp >= (lsn, pos):
                    lsn, pos = stamp
                    action = row["_action"]
                    c = row["_columns"]
                    # struct cells arrive as dicts under Arrow; keep
                    # (name, value) pairs only
                    cols = (
                        _json.dumps([[x["name"], x["value"]] for x in c])
                        if c is not None and len(c)
                        else None
                    )
        state.update((lsn, pos, action, cols))
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "action": [action],
                "columns_json": [cols],
                "commit_lsn": [lsn],
            }
        )

    kv = F.map_from_entries(
        F.transform(
            "_columns", lambda c: F.struct(c["name"], c["value"])
        )
    )
    ident_kv = F.map_from_entries(
        F.transform(
            "_identity", lambda c: F.struct(c["name"], c["value"])
        )
    )
    keyed = records.where(F.col("_table") == table).withColumn(
        "_key",
        F.coalesce(F.element_at(kv, pk), F.element_at(ident_kv, pk)),
    )
    return keyed.groupBy("_key").applyInPandasWithState(
        _merge,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
