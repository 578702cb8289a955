#!/usr/bin/env python
"""fuzzy_match_symspell core-scaling probe (round 15, the r14
verdict's item 6): the driver's 8-vs-32-core ratio read 1.08 at
sf0.1 -- is that a serial/driver-bound stage, or pure per-job fixed
overhead that a bigger input amortizes?

Method: synthesize a 10x `part` table as REPLICA-DISJOINT copies
(replica k offsets p_partkey by k*N and appends the letter
chr(97+k) to p_name for k>0 -- the noun blocking key regexp
'[a-z]+$' then yields noun||letter, so every (brand, noun) block is
replica-local and cross-replica key overlap is exactly zero; within a
replica, appending one common letter to every name preserves the
d<=1 structure the census counts).  Then run the REGISTERED face
end-to-end on {sf0.1, sf0.1x10} x {8, 32} cores, fresh JVM per cell,
untimed warm-up + median-of-3, and compare:

* if the 10x input scales ~10x on 32 cores AND the 8-vs-32 ratio at
  10x rises toward the core ratio, the sf0.1 ratio of ~1 is fixed
  per-job overhead (scan/exchange setup at 0.2 s stages) -- record
  in SCALING.md and close;
* if the 10x wall has a flat multi-second component insensitive to
  cores, there is a serial term -- name it from the stage timeline.

Usage: python scripts/symspell_scale_probe.py [out_json]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF01 = "/root/testdata/sf0.1"
BIG = "/tmp/spark-graft-part10"
REPS = 10


def ensure_big_part() -> None:
    marker = os.path.join(BIG, "_PART_COMPLETE")
    if os.path.exists(marker):
        return
    os.makedirs(BIG, exist_ok=True)
    from pyspark.sql import functions as F

    from operating_system_map_reduce_spark.session import get_spark

    spark = get_spark(app_name="symspell-part10-make",
                      extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    part = spark.read.parquet(os.path.join(SF01, "part.parquet"))
    n = part.count()
    rep = part.withColumn(
        "__k", F.explode(F.sequence(F.lit(0), F.lit(REPS - 1))))
    out = rep.select(
        (F.col("p_partkey") + F.col("__k") * n).alias("p_partkey"),
        F.when(F.col("__k") == 0, F.col("p_name")).otherwise(
            F.expr("concat(p_name, chr(97 + __k))")).alias("p_name"),
        *[c for c in part.columns if c not in ("p_partkey", "p_name")])
    out.write.mode("overwrite").parquet(os.path.join(BIG, "part.parquet"))
    with open(marker, "w") as fh:
        fh.write(f"replicas={REPS}\n")
    spark.stop()


_CELL_SNIPPET = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from bench import _clear_stat_caches
from operating_system_map_reduce_spark.plans import collect_registry
from operating_system_map_reduce_spark.session import get_spark

queries, _ = collect_registry()
fn = queries["fuzzy_match_symspell"]
spark = get_spark(app_name="symspell-cell",
                  extra_conf={{"spark.ui.enabled": "false"}})
spark.sparkContext.setLogLevel("ERROR")
sf_dir = {sf_dir!r}
fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
runs = []
for r in range(3):
    _clear_stat_caches()
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    runs.append(round(time.perf_counter() - t0, 3))
import statistics
print("CELL " + json.dumps({{"sf_dir": sf_dir, "cpus": {cpus},
                             "runs": runs,
                             "median": round(statistics.median(runs), 3)}}))
spark.stop()
"""


def run_cell(sf_dir: str, cpus: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
    code = _CELL_SNIPPET.format(repo=REPO, sf_dir=sf_dir, cpus=cpus)
    p = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True, timeout=900)
    for line in p.stdout.splitlines():
        if line.startswith("CELL "):
            return json.loads(line[5:])
    raise RuntimeError(f"cell failed: {p.stdout[-2000:]}\n{p.stderr[-2000:]}")


def main() -> int:
    ensure_big_part()
    cells = []
    for sf_dir in (SF01, BIG):
        for cpus in (32, 8):
            cells.append(run_cell(sf_dir, cpus))
            print("PARTIAL " + json.dumps(cells[-1]), flush=True)
    out = {"cells": cells}
    by = {(c["sf_dir"], c["cpus"]): c["median"] for c in cells}
    out["ratio_8v32_sf01"] = round(by[(SF01, 8)] / by[(SF01, 32)], 2)
    out["ratio_8v32_10x"] = round(by[(BIG, 8)] / by[(BIG, 32)], 2)
    out["ratio_data_32c"] = round(by[(BIG, 32)] / by[(SF01, 32)], 2)
    print("MEASURE " + json.dumps(out), flush=True)
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as fh:
            json.dump(out, fh, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
