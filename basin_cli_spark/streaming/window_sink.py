"""Windowed signed-Parquet sink — the Spark face of the reference's core
pipeline (reference internal/app/db.go:83-101, 128-212, 291-322):

reference                                   this engine
---------                                   -----------
per-window embedded DuckDB file             micro-batch DataFrame
ticker fires every windowInterval           trigger(processingTime=...)
export: COPY t TO '<t>-<ns>.db.parquet'     batch.write.parquet(<t>-<batch>)
empty-table guard (count(1) LIMIT 1)        df.isEmpty()
sign (keccak256 + secp256k1)                functions/signing.sign_file
upload + EventInfo row                      manifest JSONL row (cid-style
                                            content hash, ts, signature)
LSN ack / crash recovery (UploadAll)        checkpointLocation + batch-id
                                            idempotence + startup sweep

Delivery is at-least-once with idempotent re-publish, the same boundary the
reference has (duplicate upload possible between upload and cleanup,
reference internal/app/db.go:303-314) — re-running a batch id is a no-op
because the manifest is keyed on it.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from basin_cli_spark.functions.hashing import keccak256, keccak256_file
from basin_cli_spark.functions.signing import sign_file
from basin_cli_spark.sources.cdc import materialize_table


class WindowedVaultSink:
    """foreachBatch target: per table, export the batch's inserts to a
    parquet window file, sign it, and append a manifest event row."""

    def __init__(
        self,
        out_dir: str,
        schemas: dict[str, list[tuple[str, str]]],
        vault: str = "ns.relation",
        private_key_hex: str | None = None,
        window_digest: bool = False,
        digest_algo: str = "ecmh",
    ) -> None:
        self.out_dir = out_dir
        self.schemas = schemas
        self.vault = vault
        self.private_key_hex = private_key_hex
        # Opt-in per-window multiset digest of the exported rows (the
        # reference ships ecmh as a library with no wired consumer;
        # stamping each window makes it useful: two windows diff by group
        # subtraction, a vault's total content digest is the combination
        # of its window digests, independent of window boundaries).  Off
        # by default.  digest_algo picks the group: "ecmh"
        # (functions/ecmh.py, reference parity, ~4.1K rows/s/core) or
        # "muhash" (functions/muhash.py, the scale path at ~30K
        # rows/s/core — see SCALE.md "Multiset-digest throughput").
        if digest_algo not in ("ecmh", "muhash"):
            raise ValueError(f"unknown digest_algo: {digest_algo!r}")
        self.window_digest = window_digest
        self.digest_algo = digest_algo
        self.manifest_path = os.path.join(out_dir, "manifest.jsonl")
        os.makedirs(out_dir, exist_ok=True)

    # -- manifest ------------------------------------------------------------

    def _published_batches(self) -> set[int]:
        done = set()
        if os.path.exists(self.manifest_path):
            with open(self.manifest_path) as f:
                for line in f:
                    done.add(json.loads(line)["batch_id"])
        return done

    def _append_manifest(self, rows: list[dict]) -> None:
        with open(self.manifest_path, "a") as f:
            for row in rows:
                f.write(json.dumps(row) + "\n")

    # -- the sink ------------------------------------------------------------

    def process_batch(self, records: DataFrame, batch_id: int) -> None:
        """Export/sign/publish one micro-batch of parsed WAL records.
        Idempotent on batch_id (at-least-once upstream => exactly-once
        manifest)."""
        if batch_id in self._published_batches():
            return
        rows: list[dict] = []
        for table, columns in self.schemas.items():
            tdf = materialize_table(records, table, columns)
            if tdf.isEmpty():  # reference's empty-export guard (db.go:155-166)
                continue
            epoch_ns = time.time_ns()
            path = os.path.join(self.out_dir, f"{table}-{epoch_ns}.parquet")
            tdf.write.mode("overwrite").parquet(path)
            rows.append(self._event_row(table, path, batch_id))
        self._append_manifest(rows)  # empty list still marks nothing; see below
        if not rows:
            # record the empty batch so recovery does not replay it forever
            self._append_manifest(
                [{"batch_id": batch_id, "table": None, "path": None,
                  "cid": None, "signature": None, "timestamp": int(time.time()),
                  "is_archived": False}]
            )

    def _event_row(self, table: str, path: str, batch_id: int) -> dict:
        # content id: keccak over the parquet part files (sorted for
        # determinism); signature over the same bytes when a key is set.
        parts = sorted(
            os.path.join(path, p)
            for p in os.listdir(path)
            if p.endswith(".parquet")
        )
        # Single-part exports hash the file directly (byte-parity with the
        # reference's whole-file keccak cid, signing.go:34-56); multi-part
        # exports hash the concatenation of per-part digests so every part
        # contributes to the content id.
        part_digests = [keccak256_file(p) for p in parts]
        cid_bytes = (
            part_digests[0]
            if len(part_digests) == 1
            else keccak256(b"".join(part_digests))
        )
        cid = "0x" + cid_bytes.hex()
        digest = None
        if self.window_digest:
            from basin_cli_spark.session import get_spark

            if self.digest_algo == "muhash":
                from basin_cli_spark.functions.muhash import (
                    muhash_digest as _digest_fn,
                )
            else:
                from basin_cli_spark.functions.ecmh import (
                    ecmh_digest as _digest_fn,
                )

            spark = get_spark(app_name="vault-window-digest")
            win = spark.read.parquet(path)
            # digest the canonical JSON of each row — schema-aware,
            # order-independent (the group operation commutes)
            canon = win.select(
                F.to_json(F.struct(*sorted(win.columns))).alias("_j")
            )
            digest = _digest_fn(canon, "_j")
        signature = (
            b"".join(sign_file(p, self.private_key_hex) for p in parts).hex()
            if self.private_key_hex
            else None
        )
        row = {
            "batch_id": batch_id,
            "table": table,
            "path": path,
            "cid": cid,
            "signature": signature,
            "timestamp": int(time.time()),
            "is_archived": False,
        }
        if digest is not None:
            row["ecmh_digest"] = digest
            row["digest_algo"] = self.digest_algo
        return row

    def events(self, spark) -> DataFrame:
        """The vault-events metadata table (reference EventInfo,
        internal/app/models.go:41-46) as a DataFrame.

        Empty-batch marker rows (table/path/cid all null, written by
        process_batch for recovery bookkeeping) are filtered out so library
        consumers and the CLI see the same event list.

        The schema is explicit: schema inference re-reads every manifest
        file before the real scan (2x I/O on what grows to millions of
        lines), and an all-marker manifest would otherwise infer
        all-null types and break downstream filters."""
        schema = (
            "batch_id long, table string, path string, cid string, "
            "signature string, timestamp long, is_archived boolean, "
            "ecmh_digest string, digest_algo string"
        )
        return spark.read.json(self.manifest_path, schema=schema).where(
            "table IS NOT NULL"
        )


def run_stream(
    spark,
    wal_dir: str,
    sink: WindowedVaultSink,
    checkpoint_dir: str,
    processing_time: str | None = None,
):
    """Wire the CDC stream into the sink.

    ``processing_time=None`` runs one availableNow drain (used by tests and
    recovery sweeps); otherwise the trigger cadence is the reference's
    ``--window-size`` (default 3600 s, reference cmd/vaults/config.go:18).
    """
    from basin_cli_spark.sources.cdc import read_wal_stream

    records = read_wal_stream(spark, wal_dir)
    writer = (
        records.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(lambda df, bid: sink.process_batch(df, bid))
    )
    if processing_time:
        writer = writer.trigger(processingTime=processing_time)
    else:
        writer = writer.trigger(availableNow=True)
    return writer.start()
