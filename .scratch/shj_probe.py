"""r14 probe: shuffled-hash vs sort-merge for the banded pair self-joins
(optimization guide §3.1 — "often faster than sort-merge when one side is
moderately small per partition"; the guide's baseline config even sets
preferSortMergeJoin=false).

Run each variant in a FRESH process (the conf is planner-static):
    python .scratch/shj_probe.py smj      # baseline (repo default)
    python .scratch/shj_probe.py shj      # preferSortMergeJoin=false
    python .scratch/shj_probe.py shj_aqe  # + AQE local-map SHJ rewrite

Times q_dedup_embedding_keep_one (the SMJ-carrying pair plan) plus the
join micro-family, noop sink, min of 3 after warm (guide §1.4).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from basin_cli_spark.queries import load_all  # noqa: E402
from basin_cli_spark.session import get_spark  # noqa: E402

VARIANTS = {
    "smj": {},
    "shj": {"spark.sql.join.preferSortMergeJoin": "false"},
    "shj_aqe": {
        "spark.sql.join.preferSortMergeJoin": "false",
        "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": "64m",
    },
}

QUERIES = [
    "q_dedup_embedding_keep_one",
    "q_dedup_embedding",
    "q_dedup_minhash",
    "q_dedup_repeated_spans",
    "q_join_left",
    "q_join_full",
]


def main() -> None:
    variant = sys.argv[1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        app_name=f"shj_probe_{variant}", extra_conf=VARIANTS[variant]
    )
    registry = load_all()
    for name in QUERIES:
        if name not in registry:
            print(f"{name}: MISSING")
            continue
        spec = registry[name]
        for warm in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
            spec.fn(spark, warm).collect()
        df = spec.fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        import re

        shape = {
            k: len(re.findall(k, plan))
            for k in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin")
        }
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            ts.append(time.perf_counter() - t0)
        print(
            f"{variant:8s} {name:32s} noop_min={min(ts):6.3f} "
            f"med={sorted(ts)[1]:6.3f} {shape}",
            flush=True,
        )


if __name__ == "__main__":
    main()
