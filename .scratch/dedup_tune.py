"""Profile the 100x exact-dedup shape (SCALE.md watch item): 60M rows,
~46M distinct 16-byte binary keys, local[32].

Hypothesis from the r8 verdict: the 10x->100x throughput halving is the
final-agg hash map at 32 shuffle partitions (1.4M+ groups/partition)
spilling, plus a map-side partial agg that achieves no reduction on a
mostly-unique corpus but still pays a full hash-map build per map task.

Variants:
  A baseline        — current operator plan (partial+final, AQE defaults)
  B advisory16      — AQE advisoryPartitionSizeInBytes=16m (more, smaller
                      final-agg partitions after coalesce)
  C repart_complete — repartition(key) THEN groupBy(key): the Exchange
                      satisfies the agg's ClusteredDistribution so the
                      planner emits ONE complete HashAggregate, no
                      map-side partial hash build at all
  D partial_skip    — B + C combined
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from basin_cli_spark.session import get_spark
from basin_cli_spark.sources.tables import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
C100 = 100

spark = get_spark(app_name="dedup_tune")
spark.range(1000).count()

li = load_table(spark, SF_DIR, "lineitem")
li100 = li.withColumn(
    "_copy", F.explode(F.array(*[F.lit(i) for i in range(C100)]))
).withColumn(
    "l_orderkey", F.col("l_orderkey") * C100 + F.col("_copy")
).drop("_copy").repartition(
    spark.sparkContext.defaultParallelism
).persist()
n = li100.count()
print(f"rows: {n}")

key = F.unhex(F.md5(F.concat_ws("|", "l_orderkey", "l_linenumber")))


def agg_groupby():
    return (
        li100.groupBy(key.alias("_h"))
        .agg(F.count(F.lit(1)).alias("c"))
        .count()
    )


def agg_repart_complete():
    pre = li100.select(key.alias("_h")).repartition(F.col("_h"))
    return pre.groupBy("_h").agg(F.count(F.lit(1)).alias("c")).count()


def run(tag, fn, confs):
    prev = {}
    for k, v in confs.items():
        prev[k] = spark.conf.get(k, None)
        spark.conf.set(k, v)
    try:
        for i in range(2):
            t0 = time.perf_counter()
            out = fn()
            dt = time.perf_counter() - t0
            print(f"{tag} run{i}: {dt:6.2f}s  groups={out}  "
                  f"({n/dt/1e3:.0f} K rows/s)")
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


ADV = "spark.sql.adaptive.advisoryPartitionSizeInBytes"
run("A baseline       ", agg_groupby, {})
run("B advisory16     ", agg_groupby, {ADV: "16m"})
run("C repart_complete", agg_repart_complete, {})
run("D C+advisory16   ", agg_repart_complete, {ADV: "16m"})

INIT = "spark.sql.adaptive.coalescePartitions.initialPartitionNum"
run("E init128+adv16  ", agg_groupby, {ADV: "16m", INIT: "128"})
run("F init128+adv64  ", agg_groupby, {INIT: "128"})
run("G init128 adv16 C", agg_repart_complete, {ADV: "16m", INIT: "128"})
