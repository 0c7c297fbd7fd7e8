"""Stage-level profile of the sf1 decade's worst scaling ratios.

SCALE_sf1_scaling.md flags four queries whose sf0.1 -> sf1 wall ratio is
>= 4x (all still sub-linear for 10x rows, but the r11 verdict asks for a
profile pass confirming the growth is shuffle/scan-volume-proportional
rather than a rebuild-per-probe or spill onset).  This script runs each
flagged query at both scales in a UI-enabled session and pulls per-stage
metrics (executor run time, input bytes, shuffle read/write bytes, spill
bytes) from the Spark status REST API, then prints a per-query dominant-
stage comparison.  The findings are summarized in SCALE_sf1_scaling.md.

Usage: python scripts/profile_sf1_ratios.py [sf1_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.error
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as contract  # noqa: E402
from basin_cli_spark.session import get_spark  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF01 = "/root/testdata/sf0.1"
FLAGGED = (
    "q17_small_quantity_revenue",
    "q4_order_priority",
    "q_join_semi",
    "q_join_asof",
)


def _rest(ui: str, path: str):
    with urllib.request.urlopen(f"{ui}/api/v1/{path}") as r:
        return json.load(r)


def profile(spark, ui: str, app_id: str, qfn, name: str, sf_dir: str) -> dict:
    sc = spark.sparkContext
    # warm-up rep: classloading/codegen, so the measured rep reflects the
    # steady state the scaling table times (min over reps after warm-up)
    spark.catalog.clearCache()
    qfn(spark, sf_dir).collect()
    spark.catalog.clearCache()
    group = f"{name}@{sf_dir}@{time.time()}"
    sc.setJobGroup(group, name)
    t0 = time.perf_counter()
    n_rows = len(qfn(spark, sf_dir).collect())
    wall = time.perf_counter() - t0
    sc.setJobGroup(None, None)

    stage_ids = set()
    for job in _rest(ui, f"applications/{app_id}/jobs"):
        if job.get("jobGroup") == group:
            stage_ids.update(job["stageIds"])
    stages = []
    for sid in sorted(stage_ids):
        try:
            for att in _rest(ui, f"applications/{app_id}/stages/{sid}"):
                stages.append(
                    {
                        "stage": sid,
                        "name": att["name"].split("\n")[0],
                        "tasks": att["numCompleteTasks"],
                        "run_ms": att["executorRunTime"],
                        "input_mb": round(att["inputBytes"] / 1e6, 1),
                        "sh_read_mb": round(att["shuffleReadBytes"] / 1e6, 2),
                        "sh_write_mb": round(att["shuffleWriteBytes"] / 1e6, 2),
                        "spill_mb": round(
                            (att["memoryBytesSpilled"] + att["diskBytesSpilled"])
                            / 1e6,
                            1,
                        ),
                    }
                )
        except urllib.error.HTTPError:
            pass  # skipped stage (AQE reuse) has no attempt data
    stages.sort(key=lambda s: -s["run_ms"])
    return {"wall_s": round(wall, 2), "rows": n_rows, "stages": stages}


def main(sf1_dir: str = os.path.join(REPO, ".scratch", "sf1")) -> int:
    spark = get_spark(
        app_name="profile_sf1_ratios", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.range(1000).count()
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    qs = contract.queries()

    for name in FLAGGED:
        out = {}
        for label, sf_dir in (("sf0.1", SF01), ("sf1", sf1_dir)):
            out[label] = profile(spark, ui, app_id, qs[name], name, sf_dir)
        r = out["sf1"]["wall_s"] / max(out["sf0.1"]["wall_s"], 1e-9)
        print(f"\n=== {name}  sf0.1 {out['sf0.1']['wall_s']}s -> "
              f"sf1 {out['sf1']['wall_s']}s  ({r:.2f}x)")
        for label in ("sf0.1", "sf1"):
            tot_run = sum(s["run_ms"] for s in out[label]["stages"])
            tot_spill = sum(s["spill_mb"] for s in out[label]["stages"])
            print(f"  [{label}] executor-run total {tot_run} ms, "
                  f"spill {tot_spill} MB, top stages:")
            for s in out[label]["stages"][:4]:
                print(f"    run {s['run_ms']:7d} ms  tasks {s['tasks']:3d}  "
                      f"input {s['input_mb']:8.1f} MB  shW {s['sh_write_mb']:8.2f} "
                      f"shR {s['sh_read_mb']:8.2f}  spill {s['spill_mb']:6.1f}  "
                      f"{s['name'][:60]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(*sys.argv[1:]))
