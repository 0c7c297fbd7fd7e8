"""r14 probe: AQE runtime SMJ->SHJ rewrite (guide 3.1) on the 8 SMJ-carrying
entries.  Variant aqe64 sets ONLY spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold=64m
(>= the repo's 16m advisory): static plans stay identical; AQE rewrites at
runtime only when every post-shuffle partition's map fits 64m -- which stops
firing at decade scale, so SMJ remains the at-scale plan.  Fresh process per
capture; alternate captures A/B to cancel box drift.
Usage: python .scratch/aqe_shj_ab.py {base|aqe64}
"""
import os, sys, time, re
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from basin_cli_spark.queries import load_all
from basin_cli_spark.session import get_spark

VAR = {"base": {}, "aqe64": {"spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": "64m"}}
QUERIES = ["q2_min_cost_supplier", "q20_excess_shippers", "q_dedup_embedding_keep_one",
           "q_dedup_keep_one", "q_join_full", "q_llm_prep_pipeline_v2",
           "q_minhash_jaccard_estimate", "q_similarity_hard_negatives"]

variant = sys.argv[1]
spark = get_spark(app_name=f"aqe_shj_{variant}", extra_conf=VAR[variant])
reg = load_all()
sf = "/root/testdata/sf0.1"
for name in QUERIES:
    spec = reg[name]
    spec.fn(spark, "/root/testdata/sf0.01").write.format("noop").mode("overwrite").save()  # warm
    ts = []
    final = None
    for _ in range(3):
        df = spec.fn(spark, sf)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        ts.append(time.perf_counter() - t0)
        final = df._jdf.queryExecution().executedPlan().toString()
    shape = {k: len(re.findall(k, final)) for k in ("SortMergeJoin", "ShuffledHashJoin")}
    print(f"{variant:6s} {name:32s} min={min(ts):6.3f} med={sorted(ts)[1]:6.3f} runtime={shape}", flush=True)
spark.stop()
