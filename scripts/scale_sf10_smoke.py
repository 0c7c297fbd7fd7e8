"""Fifth-decade spot check (r12 verdict item #5): Spark-only wall clock
and plan-shape stability for the most scale-sensitive plans one decade
PAST the oracle-attested range — sf10-equivalent fixtures (~60M lineitem
rows via 100x whole-database replication; 500k near-dup documents / 200k
noised vectors via the same perturbed-replica generators leg 3 uses).

No oracle here by design: correctness is attested through the fourth
decade (CONTRACT_r1x_sf1_subset.txt); this smoke answers the one
remaining question — does anything go super-linear one decade further?
For each query it records wall at the fourth decade (sf1/sf1c) and the
fifth (sf10/sf10c) in ONE session and reports the ratio (10x rows ->
a scale-clean plan sits at or below ~10x), plus the static physical
plan's operator histogram at both scales so a silent strategy flip
(broadcast->SMJ, partial-agg loss, a CartesianProduct) is visible and
the two hard anti-patterns are asserted away.

Timing is sink-timed (noop-format write), not collect()-timed: the sf1
profiling round established that q_join_semi-style ratios were driver
Arrow-collect-proportional, and at 500k-row outputs a collect would
measure the driver, not the plan.  Row counts are taken once, untimed.

The semantic-IVF entry trains a fifth-decade codebook at k≈sqrt(n)
(447 cells for 200k vectors) and merges it ADDITIVELY into
fixtures/codebooks.json under the new corpus key — the documented
faiss-style per-corpus lifecycle (train once, freeze, serve).  The
driver-scale and sf1c entries are untouched; k=16 at 200k vectors would
put ~12.5k vectors in every cell, beyond the max_cell=4096 hot-cell
guard, i.e. the frozen bench codebook simply does not serve this corpus.

Usage: python scripts/scale_sf10_smoke.py [reps]
Fixtures are generated on first run (.scratch/sf10, .scratch/sf10c) and
reused after.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts")
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF1 = os.path.join(REPO, ".scratch", "sf1")
SF1C = os.path.join(REPO, ".scratch", "sf1c")
SF10 = os.path.join(REPO, ".scratch", "sf10")
SF10C = os.path.join(REPO, ".scratch", "sf10c")
OUT = os.path.join(REPO, "SCALE_sf10_spot.md")

# (query, relational-or-corpus) — the plans whose cost structure is the
# whole scale story: the exact-dedup hash-agg, the per-group window
# limit, both banded/bucketed pair generators, the one deliberate text
# shuffle, and the shard packer's single exchange.
SPOT = (
    ("q1_pricing_summary", "rel"),
    ("q_topk_per_group", "rel"),
    ("q_dedup_exact", "corpus"),
    ("q_dedup_minhash", "corpus"),
    ("q_dedup_embedding", "corpus"),
    ("q_dedup_semantic_ivf", "corpus"),
    ("q_corpus_boilerplate_scrub", "corpus"),
    ("q_corpus_shard_pack", "corpus"),
)

ANTI_PATTERNS = ("CartesianProduct", "BatchEvalPython")


def _ensure_fixtures(spark) -> None:
    if not os.path.exists(os.path.join(SF10, "lineitem.parquet")):
        print("generating .scratch/sf10 (100x relational replication)...")
        from gen_sf1 import generate as gen_rel

        gen_rel(SF10, "/root/testdata/sf0.1", 100)
    if not os.path.exists(os.path.join(SF10C, "documents.parquet")):
        print("generating .scratch/sf10c (100x perturbed corpus)...")
        from gen_sf1_corpus import generate as gen_corpus

        gen_corpus(SF10C, SF10, "/root/testdata/sf0.1", 100)


def _ensure_sf10_codebook(spark) -> None:
    import pyspark.sql.functions as F

    from basin_cli_spark.operators import kmeans as KM
    from basin_cli_spark.sources import load_table

    path = os.path.join(REPO, "fixtures", "codebooks.json")
    art = json.load(open(path))
    e = load_table(spark, SF10C, "embeddings")
    key = str(e.agg(
        F.sum(F.col("vec_id") * F.col("label")).cast("long")
    ).collect()[0][0])
    if key in art:
        return
    n = e.count()
    k = max(16, int(round(n ** 0.5)))
    print(f"training sf10c IVF codebook: n={n}, k={k} (~sqrt(n))...")
    ivf_params = {"k": k, "iters": 4, "metric": "cos"}
    pq_params = {"m": 8, "sub_dim": 8, "k": 16, "iters": 2}
    art[key] = {
        "ivf_params": ivf_params,
        "pq_params": pq_params,
        "ivf": KM.train_kmeans(e, **ivf_params).tolist(),
        "pq": KM.train_pq_codebooks(e, **pq_params).tolist(),
    }
    with open(path, "w") as f:
        json.dump(art, f)
    print(f"merged corpus key {key} into {path}")


def _plan_text(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _node_hist(plan: str) -> dict[str, int]:
    hist: dict[str, int] = {}
    for m in re.finditer(r"^\(\d+\) (\S+)", plan, re.MULTILINE):
        hist[m.group(1)] = hist.get(m.group(1), 0) + 1
    return hist


def _hist_diff(a: dict, b: dict) -> str:
    keys = sorted(set(a) | set(b))
    parts = [
        f"{k}:{a.get(k, 0)}->{b.get(k, 0)}"
        for k in keys
        if a.get(k, 0) != b.get(k, 0)
    ]
    return ", ".join(parts) or "identical"


def main(reps: int = 2) -> int:
    from basin_cli_spark.session import get_spark

    spark = get_spark(app_name="scale_sf10_smoke")
    spark.range(1000).count()
    _ensure_fixtures(spark)
    _ensure_sf10_codebook(spark)

    import __spark_entry__ as contract

    qs = contract.queries()

    def sink_timed(qfn, sf_dir: str) -> tuple[float, int]:
        n = qfn(spark, sf_dir).count()  # untimed, for the report
        times = []
        for _ in range(reps + 1):  # first rep is the warm-up
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            (
                qfn(spark, sf_dir)
                .write.format("noop").mode("overwrite").save()
            )
            times.append(time.perf_counter() - t0)
        return min(times[1:]), n

    rows = []
    for name, kind in SPOT:
        d4 = SF1 if kind == "rel" else SF1C
        d5 = SF10 if kind == "rel" else SF10C
        s4, n4 = sink_timed(qs[name], d4)
        s5, n5 = sink_timed(qs[name], d5)
        plan4 = _node_hist(_plan_text(qs[name](spark, d4)))
        plan5_text = _plan_text(qs[name](spark, d5))
        plan5 = _node_hist(plan5_text)
        for bad in ANTI_PATTERNS:
            assert plan5.get(bad, 0) == 0, (name, bad, plan5)
        diff = _hist_diff(plan4, plan5)
        rows.append((name, s4, n4, s5, n5, s5 / s4, diff))
        print(f"{name:28s} 4th {s4:6.2f}s ({n4:,})  5th {s5:7.2f}s ({n5:,})"
              f"  ratio {s5 / s4:5.2f}x  plan: {diff}")

    lines = [
        "# Fifth-decade spot check: sf1 (4th decade) vs sf10-equivalent (5th)",
        "",
        "Generated by scripts/scale_sf10_smoke.py.  Spark-only (correctness",
        "is oracle-attested through the 4th decade; this asks whether any",
        "plan goes super-linear one decade further).  10x rows per step:",
        "relational 6M -> 60M lineitem (100x sf0.1 replication); corpus",
        "50k -> 500k perturbed near-dup docs, 20k -> 200k noised vectors.",
        f"Sink-timed (noop write), min over {reps} reps after a warm-up,",
        "cache cleared per rep, one local[32] session.  `plan drift` lists",
        "static-plan operator-count changes between the decades (AQE may",
        "further adjust at runtime); CartesianProduct / BatchEvalPython are",
        "asserted absent at the 5th decade.",
        "",
        "| query | 4th s | rows | 5th s | rows | ratio | plan drift |",
        "|---|---|---|---|---|---|---|",
    ]
    for name, s4, n4, s5, n5, r, diff in rows:
        lines.append(
            f"| {name} | {s4:.2f} | {n4:,} | {s5:.2f} | {n5:,} "
            f"| {r:.2f}x | {diff} |"
        )
    tot4 = sum(r[1] for r in rows)
    tot5 = sum(r[3] for r in rows)
    lines += [
        "",
        f"Totals: 4th decade {tot4:.1f}s -> 5th decade {tot5:.1f}s "
        f"({tot5 / tot4:.2f}x wall for 10x rows across the spot set).",
        "",
        "The semantic-IVF entry serves a fifth-decade codebook trained at",
        "k~sqrt(n) (447 cells for 200k vectors) under the per-corpus key in",
        "fixtures/codebooks.json — the same frozen-artifact lifecycle the",
        "attested scales use; the bench-scale k=16 codebook cannot serve",
        "200k vectors (every cell would exceed the max_cell=4096 hot-cell",
        "guard).",
    ]
    with open(OUT, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {OUT}")
    return 0


if __name__ == "__main__":
    args = sys.argv[1:]
    sys.exit(main(int(args[0]) if args else 2))
