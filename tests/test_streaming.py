"""Streaming window-sink tests — ports of the reference's streamer
scenarios (reference internal/app/streamer_test.go:32-130, 134-201):
txs arriving across window boundaries produce per-window parquet files in
WAL order, U/D records never materialize, and recovery/replay is
idempotent."""

import json
import os

import pytest

from basin_cli_spark.streaming.window_sink import WindowedVaultSink, run_stream

TX1 = {
    "commit_lsn": 957398296,
    "records": [
        {"action": "I", "xid": 1058, "lsn": "0/3910B898", "nextlsn": "",
         "timestamp": "2023-08-22 14:44:02.043586-03", "schema": "public",
         "table": "t",
         "columns": [{"name": "id", "type": "integer", "value": 200232},
                     {"name": "name", "type": "text", "value": "100"}],
         "pk": [{"name": "id", "type": "integer"}]},
        {"action": "I", "xid": 1058, "lsn": "0/3910B8D8", "nextlsn": "",
         "timestamp": "2023-08-22 14:44:02.043586-03", "schema": "public",
         "table": "t",
         "columns": [{"name": "id", "type": "integer", "value": 200242},
                     {"name": "name", "type": "text", "value": "400"}],
         "pk": [{"name": "id", "type": "integer"}]},
    ],
}
TX2 = {
    "commit_lsn": 957398300,
    "records": [
        {"action": "U", "xid": 1059, "lsn": "0/3910B918", "nextlsn": "",
         "timestamp": "2023-08-22 14:44:10.000000-03", "schema": "public",
         "table": "t",
         "columns": [{"name": "id", "type": "integer", "value": 200242},
                     {"name": "name", "type": "text", "value": "999"}],
         "pk": [{"name": "id", "type": "integer"}]},
        {"action": "I", "xid": 1059, "lsn": "0/3910B958", "nextlsn": "",
         "timestamp": "2023-08-22 14:44:10.000000-03", "schema": "public",
         "table": "t",
         "columns": [{"name": "id", "type": "integer", "value": 200233},
                     {"name": "name", "type": "text", "value": "200"}],
         "pk": [{"name": "id", "type": "integer"}]},
    ],
}
SCHEMAS = {"t": [("id", "integer"), ("name", "text")]}
PRIV = "59c6995e998f97a5a0044966f0945389dc9e86dae88c7a8412f4603b6b78690d"


def _write_tx(wal_dir, name, tx):
    os.makedirs(wal_dir, exist_ok=True)
    with open(os.path.join(wal_dir, name), "w") as f:
        f.write(json.dumps(tx) + "\n")


def _drain(spark, wal_dir, sink, ckpt):
    q = run_stream(spark, wal_dir, sink, ckpt)
    assert q.awaitTermination(120), "stream did not terminate within 120s"


def _manifest(sink):
    with open(sink.manifest_path) as f:
        return [json.loads(line) for line in f]


def _window_rows(spark, path):
    df = spark.read.parquet(path)
    return [(r.id, r.name) for r in df.orderBy("id").collect()]


@pytest.fixture
def dirs(tmp_path):
    return str(tmp_path / "wal"), str(tmp_path / "out"), str(tmp_path / "ckpt")


def test_tx_window_tx_close(spark, dirs):
    """T1, W, T2, C: each window exports its own parquet file."""
    wal_dir, out_dir, ckpt = dirs
    sink = WindowedVaultSink(out_dir, SCHEMAS, private_key_hex=PRIV)

    _write_tx(wal_dir, "tx1.jsonl", TX1)
    _drain(spark, wal_dir, sink, ckpt)
    _write_tx(wal_dir, "tx2.jsonl", TX2)
    _drain(spark, wal_dir, sink, ckpt)

    published = [m for m in _manifest(sink) if m["table"] == "t"]
    assert len(published) == 2
    w1, w2 = published
    assert sorted(_window_rows(spark, w1["path"])) == [(200232, "100"), (200242, "400")]
    # U record from tx2 is filtered — only the insert materializes
    assert _window_rows(spark, w2["path"]) == [(200233, "200")]
    for m in published:
        assert m["cid"].startswith("0x") and len(m["signature"]) >= 130


def test_txs_one_window(spark, dirs):
    """T1, T2, W, C: both txs land in a single window file."""
    wal_dir, out_dir, ckpt = dirs
    sink = WindowedVaultSink(out_dir, SCHEMAS, private_key_hex=PRIV)
    _write_tx(wal_dir, "tx1.jsonl", TX1)
    _write_tx(wal_dir, "tx2.jsonl", TX2)
    _drain(spark, wal_dir, sink, ckpt)

    published = [m for m in _manifest(sink) if m["table"] == "t"]
    assert len(published) == 1
    assert sorted(_window_rows(spark, published[0]["path"])) == [
        (200232, "100"), (200233, "200"), (200242, "400"),
    ]


def test_recovery_idempotent(spark, dirs):
    """Re-draining with the same checkpoint publishes nothing new
    (at-least-once upstream, exactly-once manifest)."""
    wal_dir, out_dir, ckpt = dirs
    sink = WindowedVaultSink(out_dir, SCHEMAS, private_key_hex=PRIV)
    _write_tx(wal_dir, "tx1.jsonl", TX1)
    _drain(spark, wal_dir, sink, ckpt)
    before = _manifest(sink)
    _drain(spark, wal_dir, sink, ckpt)  # no new data, same checkpoint
    assert _manifest(sink) == before
    # direct re-publish of an already-published batch id is a no-op
    from basin_cli_spark.sources.cdc import read_wal_batch

    sink.process_batch(read_wal_batch(spark, wal_dir), batch_id=0)
    assert _manifest(sink) == before


def test_events_metadata_surface(spark, dirs):
    wal_dir, out_dir, ckpt = dirs
    sink = WindowedVaultSink(out_dir, SCHEMAS, private_key_hex=PRIV)
    _write_tx(wal_dir, "tx1.jsonl", TX1)
    _drain(spark, wal_dir, sink, ckpt)
    ev = sink.events(spark)
    rows = ev.where(ev.table == "t").collect()
    assert len(rows) == 1 and rows[0].cid.startswith("0x")


def test_stateful_progress_across_restarts(spark, tmp_path):
    """applyInPandasWithState keeps per-key state across micro-batches AND
    restarts (the reference's confirmed_flush_lsn durability,
    reference pkg/pgrepl/conn.go:47-56): after tx1 the table's high-water
    LSN is tx1's; after a restart consuming tx2 it advances, and the
    insert count accumulates (3 = 2 from tx1 + 1 from tx2; the U record
    never counts)."""
    from basin_cli_spark.sources.cdc import read_wal_stream
    from basin_cli_spark.streaming.stateful import cdc_progress

    wal_dir = str(tmp_path / "wal")
    ckpt = str(tmp_path / "ckpt")

    def drain(name):
        # foreachBatch (not memory sink): the memory sink cannot resume
        # from a checkpoint, and resumption is exactly what's under test.
        got: dict[str, dict] = {}

        def collect(df, _bid):
            for r in df.collect():
                got[r["table"]] = r

        prog = cdc_progress(read_wal_stream(spark, wal_dir))
        q = (
            prog.writeStream.outputMode("update")
            .option("checkpointLocation", ckpt)
            .foreachBatch(collect)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120), "stream did not terminate within 120s"
        return got

    _write_tx(wal_dir, "b1.jsonl", TX1)
    out1 = drain("stateful_b1")
    assert out1["t"]["n_inserts"] == 2
    assert out1["t"]["max_commit_lsn"] == TX1["commit_lsn"]

    _write_tx(wal_dir, "b2.jsonl", TX2)
    out2 = drain("stateful_b2")
    assert out2["t"]["n_inserts"] == 3  # U record skipped
    assert out2["t"]["max_commit_lsn"] == TX2["commit_lsn"]


def test_watermark_drops_late_data(spark, tmp_path):
    """Event-time watermark semantics (SURVEY.md §2.B streaming): in append
    mode a 10-min watermark finalizes windows as event time advances; a
    record arriving after its window's watermark has passed is dropped,
    never re-opening the emitted window."""
    import json as _json

    from pyspark.sql import functions as F

    src = tmp_path / "late_src"
    src.mkdir()
    ckpt = str(tmp_path / "late_ckpt")
    emitted = []

    def drain():
        stream = (
            spark.readStream.schema("ts timestamp, k string")
            .json(str(src))
            .withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "10 minutes").alias("w"))
            .agg(F.count(F.lit(1)).alias("n"))
        )
        q = (
            stream.writeStream.outputMode("append")
            .option("checkpointLocation", ckpt)
            .foreachBatch(
                lambda df, _b: emitted.extend(
                    (str(r["w"]["start"]), r["n"]) for r in df.collect()
                )
            )
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120), "stream did not terminate within 120s"

    def write(name, *rows):
        with open(src / name, "w") as f:
            for ts, k in rows:
                f.write(_json.dumps({"ts": ts, "k": k}) + "\n")

    # batch 1: two rows in window [10:00, 10:10); one at 11:00 pushes the
    # watermark to 10:50, finalizing the first window.
    write("b1.jsonl",
          ("2024-01-01 10:00:00", "a"),
          ("2024-01-01 10:05:00", "b"),
          ("2024-01-01 11:00:00", "c"))
    drain()
    assert ("2024-01-01 10:00:00", 2) in emitted

    # batch 2: a late row for the finalized window (dropped) plus a row at
    # 12:00 advancing the watermark past 11:10, finalizing [11:00, 11:10).
    write("b2.jsonl",
          ("2024-01-01 10:02:00", "late"),
          ("2024-01-01 12:00:00", "d"))
    drain()
    assert ("2024-01-01 11:00:00", 1) in emitted  # late row NOT counted
    assert sum(n for s, n in emitted if s == "2024-01-01 10:00:00") == 2


def test_retrieve_by_cid_and_vault_listing(spark, dirs):
    """A13/A15: manifest cid resolves back to the exact window rows; vault
    listing aggregates the event log."""
    from basin_cli_spark.operators.events import list_vaults, retrieve

    wal_dir, out_dir, ckpt = dirs
    sink = WindowedVaultSink(out_dir, SCHEMAS, private_key_hex=PRIV)
    _write_tx(wal_dir, "tx1.jsonl", TX1)
    _drain(spark, wal_dir, sink, ckpt)

    ev = sink.events(spark).withColumnRenamed("table", "vault")
    published = [m for m in _manifest(sink) if m["table"] == "t"]
    got = retrieve(spark, ev, published[0]["cid"])
    assert sorted((r.id, r.name) for r in got.collect()) == [
        (200232, "100"), (200242, "400"),
    ]
    with pytest.raises(KeyError):
        retrieve(spark, ev, "0xdeadbeef")

    vaults = {r["vault"]: r["n_events"] for r in list_vaults(ev).collect()}
    assert vaults["t"] == 1



def test_quality_gate_state_is_o_gates_across_batches(spark, tmp_path):
    """The q_stream_quality_gate docstring claims state is O(gates), not
    O(documents).  Pin it functionally: shard the sf0.001 documents into
    4 files, drain the same plan shape with maxFilesPerTrigger=1 (4
    micro-batches, so state survives batch boundaries), and assert the
    final progress reports exactly one state row per gate.  The measured
    10x row is in SCALE.md (scripts/stream_scale_smoke.py)."""
    import pyspark.sql.functions as F

    from basin_cli_spark.operators.text import quality_score

    shard_dir = str(tmp_path / "docs")
    (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .repartition(4)
        .write.parquet(shard_dir)
    )
    docs = (
        spark.readStream.schema(spark.read.parquet(shard_dir).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(shard_dir)
    )
    agg = quality_score(docs, "text", "doc_id").groupBy("gate").agg(
        F.count(F.lit(1)).alias("n")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("qgate_state_pin")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream did not terminate within 120s"
    progresses = [p for p in q.recentProgress if p and p.get("stateOperators")]
    assert len(progresses) >= 2, "expected a multi-batch drain"
    last = progresses[-1]["stateOperators"]
    n_gates = spark.table("qgate_state_pin").count()
    assert sum(op["numRowsTotal"] for op in last) == n_gates
    assert n_gates <= 3


def test_near_dedup_watermark_expires_state(spark, tmp_path):
    """r13: the windowed near-dedup's state must be bounded by the ACTIVE
    event-time windows, not the corpus — i.e. the watermark actually
    evicts finalized windows as it advances.  Uses the smoke script's own
    plan and timed shards (event time spread across 8 files, replayed
    oldest-first) so the pinned shape is the measured shape; the measured
    10x rows live in SCALE.md (scripts/stream_scale_smoke.py)."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "stream_scale_smoke",
        os.path.join(os.path.dirname(__file__), "..", "scripts",
                     "stream_scale_smoke.py"),
    )
    sm = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(sm)

    timed_dir = str(tmp_path / "timed_docs")
    sm._shard_documents_timed(spark, "/root/testdata/sf0.001", timed_dir)
    m = sm._drain_measured(
        sm.near_dedup_windowed_plan(sm._docs_stream(spark, timed_dir)),
        "append", spark,
    )
    assert m["batches"] >= 2, "expected a multi-batch drain"
    assert m["rows_out"] > 0, "watermark never finalized a window"
    total_groups = m["rows_out"] + m["state_rows"]
    # no-expiry (complete-mode) state would be total_groups; the windowed
    # plan's peak must plateau well below it (measured ~0.28x at sf0.001,
    # pinned with slack)
    assert max(m["state_series"]) <= 0.6 * total_groups, m
    # the trailing flush batch applies the final watermark: state drops
    assert m["state_series"][-1] < max(m["state_series"]), m


def test_drain_restores_no_data_batch_conf(spark):
    """r15: streaming_queries._drain disables the watermark-finalize
    no-data micro-batch for the bounded drain (it cannot change the
    sink) and must restore the session conf afterwards — including when
    the caller had overridden it."""
    from pyspark.sql import functions as F

    from basin_cli_spark.queries.streaming_queries import _drain

    key = "spark.sql.streaming.noDataMicroBatches.enabled"
    for preset in ("true", "false"):
        spark.conf.set(key, preset)
        stream = (
            spark.readStream.format("rate")
            .option("rowsPerSecond", "1")
            .load()
            .select(F.col("value"))
        )
        out = _drain(stream, "append")
        assert spark.conf.get(key) == preset
        out.count()  # sink table is readable
    spark.conf.set(key, "true")
