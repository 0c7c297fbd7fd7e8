"""Streaming 10x throughput smoke: measure the two headline streaming
shapes (ingest quality gate, SimHash near-dedup) at sf0.1 (5k docs) and
at the 10x perturbed corpus (.scratch/sf1c, 50k docs), recording rows/s
and state-store size from the StreamingQueryProgress — turning the
O(gates) / one-row-per-bucket state claims in streaming_queries.py's
docstrings into measured rows (r11 verdict item #5).

The registry entries drain a single-file fixture in one AvailableNow
batch; a one-batch run never carries state ACROSS batches, so this smoke
first re-shards the document corpus into 8 files and drains with
maxFilesPerTrigger=2 (4 micro-batches): the state rows reported by the
final progress have survived batch boundaries, which is the property the
docstring claims actually need.

Plans are built from the same kernels the registry entries use
(operators.text.quality_score, operators.dedup.simhash_expr) with the
same aggregation shapes, so the measured plan is the attested plan.

Usage: python scripts/stream_scale_smoke.py [sf1c_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from basin_cli_spark.operators.dedup import simhash_expr  # noqa: E402
from basin_cli_spark.operators.text import quality_score  # noqa: E402
from basin_cli_spark.session import get_spark  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF01 = "/root/testdata/sf0.1"


def _shard_documents(spark, sf_dir: str, out_dir: str, n_files: int = 8) -> None:
    (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .repartition(n_files)
        .write.mode("overwrite")
        .parquet(out_dir)
    )


def _docs_stream(spark, shard_dir: str):
    schema = spark.read.parquet(shard_dir).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "2")
        .parquet(shard_dir)
    )


def _drain_measured(df, mode: str) -> dict:
    name = f"mem_{uuid.uuid4().hex[:12]}"
    t0 = time.perf_counter()
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = time.perf_counter() - t0
    progresses = [p for p in q.recentProgress if p is not None]
    rows_in = sum(p["numInputRows"] for p in progresses)
    batches = sum(1 for p in progresses if p["numInputRows"] > 0)
    state = {}
    for p in reversed(progresses):
        ops = p.get("stateOperators") or []
        if ops:
            state = {
                "state_rows": sum(op["numRowsTotal"] for op in ops),
                "state_mb": round(
                    sum(op["memoryUsedBytes"] for op in ops) / 1e6, 2
                ),
            }
            break
    return {
        "rows_in": rows_in,
        "batches": batches,
        "wall_s": round(wall, 2),
        "rows_per_s": int(rows_in / wall) if wall else 0,
        **state,
    }


def quality_gate_plan(docs):
    scored = quality_score(docs, "text", "doc_id")
    return scored.groupBy("gate").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("quality_p"), 9).alias("min_p"),
        F.round(F.max("quality_p"), 9).alias("max_p"),
    )


def near_dedup_plan(docs):
    ts = F.timestamp_seconds(F.lit(1_700_000_000) + F.col("doc_id"))
    sim = docs.select(
        "doc_id", simhash_expr("text").alias("simhash"), ts.alias("ts")
    )
    return (
        sim.withWatermark("ts", "1 hour")
        .groupBy("simhash")
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count(F.lit(1)).alias("n_bucket"),
        )
    )


def main(sf1c_dir: str = os.path.join(REPO, ".scratch", "sf1c")) -> int:
    spark = get_spark(app_name="stream_scale_smoke")
    spark.range(1000).count()
    results = {}
    for label, sf_dir in (("sf0.1", SF01), ("sf1c(10x)", sf1c_dir)):
        shard_dir = tempfile.mkdtemp(prefix=f"stream_smoke_{label.rstrip(')').replace('(', '_')}_")
        try:
            _shard_documents(spark, sf_dir, shard_dir)
            for shape, plan, mode in (
                ("quality_gate", quality_gate_plan, "complete"),
                ("near_dedup", near_dedup_plan, "complete"),
            ):
                # warm-up drain (classload/codegen), then the measured one
                _drain_measured(plan(_docs_stream(spark, shard_dir)), mode)
                m = _drain_measured(plan(_docs_stream(spark, shard_dir)), mode)
                results[(shape, label)] = m
                print(f"{shape:14s} {label:10s} {m}")
        finally:
            shutil.rmtree(shard_dir, ignore_errors=True)

    print("\n| shape | corpus | rows | batches | wall s | rows/s | state rows | state MB |")
    print("|---|---|---|---|---|---|---|---|")
    for (shape, label), m in results.items():
        print(
            f"| {shape} | {label} | {m['rows_in']:,} | {m['batches']} "
            f"| {m['wall_s']} | {m['rows_per_s']:,} "
            f"| {m.get('state_rows', '-')} | {m.get('state_mb', '-')} |"
        )

    # the docstring claims, asserted at both scales:
    for label in ("sf0.1", "sf1c(10x)"):
        gate = results[("quality_gate", label)]
        assert "state_rows" in gate, (
            "quality-gate drain reported no stateOperators progress", gate)
        assert gate["state_rows"] <= 3 * 32, (  # gates x max shuffle partitions
            "quality-gate state must stay O(gates), got", gate)
        nd = results[("near_dedup", label)]
        assert "state_rows" in nd, (
            "near-dedup drain reported no stateOperators progress", nd)
        assert nd["state_rows"] <= nd["rows_in"], ("bucket state exceeds corpus", nd)
    print("\nstate-bound assertions hold at both scales")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(*sys.argv[1:]))
