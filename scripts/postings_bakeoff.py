"""Postings-tier bake-off: the through-Python SHUFFLE_HASH-pinned
shapes (the ``_shuffle`` witnesses -- registered through round 12) vs
the at-rest bucketed-postings variants (REGISTERED since the round-13
seat-exact swap; flavor name kept as "atrest").

Method = sf1_spotrun's: one fresh JVM per (variant, SF) via subprocess
mode, one untimed warm-up (which for the at-rest variant pays the
one-time bucketed write -- reported separately as "cold"), then
median-of-3 with cache/GC hygiene between runs.

Usage:
    python scripts/postings_bakeoff.py <variant> <sf_dir>   # subprocess
    python scripts/postings_bakeoff.py                      # full matrix
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SFS = [("sf0.1", "/root/testdata/sf0.1"),
       ("sf1", "/tmp/spark-graft-sf1"),
       ("sf10", "/tmp/spark-graft-sf10")]
# sf100 (/tmp/spark-graft-sf100) is deliberately NOT in the full
# matrix: the through-Python witnesses are known-hostile there (the
# containment SHJ shape OOMs; arrayverify pays its ~130 GB spill
# term).  Fourth-decade rows are taken per-variant explicitly:
#   python scripts/postings_bakeoff.py <variant> /tmp/spark-graft-sf100


def _measure(variant: str, sf_dir: str) -> dict:
    import gc

    from bench import _clear_stat_caches
    from operating_system_map_reduce_spark.plans import mining, pipeline
    import __spark_entry__ as entry
    from operating_system_map_reduce_spark.session import get_spark

    # Since the r13 swap the "atrest" flavor IS the registered face;
    # the "registered"/"shuffle" flavor is the through-Python witness
    # each face rode through round 12.  For the graph faces the witness
    # shape is reconstructed by patching bucketed_edges in THIS
    # subprocess to the pre-r13 localCheckpoint'ed shuffle pairs --
    # measurement plumbing, not a plan change.
    base, _, flavor = variant.rpartition("_")
    atrest = flavor == "atrest" or variant == "atrest"
    if base == "ppjoincount":
        # the count-join verify -- REGISTERED as the face since r14
        fn = entry.queries()["dedup_jaccard_ppjoin"]
    elif base == "ppjoin":
        # "atrest" = the r13 prefix/positional + array-verify shape
        # (unregistered witness since the r14 count-join swap)
        fn = (pipeline.dedup_jaccard_ppjoin_arrayverify if atrest
              else pipeline.dedup_jaccard_ppjoin_shuffle)
    elif base in ("pagerank", "triangles"):
        if not atrest:
            pipeline.bucketed_edges = lambda spark, sf_dir: (
                pipeline.dedup_ngram_jaccard_shuffle(spark, sf_dir)
                .select("id_a", "id_b").localCheckpoint(eager=False))
        fn = (mining.pagerank_neardup if base == "pagerank"
              else mining.dedup_graph_triangles)
    elif base == "containment":
        fn = (mining.dedup_containment if atrest
              else mining.dedup_containment_shuffle)
    else:
        fn = (entry.queries()["dedup_ngram_jaccard"] if atrest
              else pipeline.dedup_ngram_jaccard_shuffle)
    # SPARK_GRAFT_BENCH_MEM: the r13 spill probe -- rerunning a decade
    # row at 2-3x the heap splits "algorithmic superlinear term" from
    # "spill amplification at this heap size"
    mem = os.environ.get("SPARK_GRAFT_BENCH_MEM", "24g")
    spark = get_spark(app_name=f"postings-bakeoff-{variant}",
                      extra_conf={"spark.ui.enabled": "false",
                                  "spark.driver.memory": mem})
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    cold = round(time.perf_counter() - t0, 3)
    runs = []
    for _ in range(3):
        gc.collect()
        spark.catalog.clearCache()
        spark._jvm.System.gc()
        _clear_stat_caches()
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        runs.append(round(time.perf_counter() - t0, 3))
    return {"cold": cold, "median": sorted(runs)[1], "runs": runs}


def main() -> None:
    if len(sys.argv) == 3:
        print("MEASURE " + json.dumps(_measure(sys.argv[1], sys.argv[2])))
        return
    result: dict = {}
    for variant in ("registered", "atrest"):
        for label, sf_dir in SFS:
            if not os.path.isdir(sf_dir):
                continue
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), variant, sf_dir],
                capture_output=True, text=True, cwd=REPO, timeout=3000)
            lines = [ln for ln in out.stdout.splitlines()
                     if ln.startswith("MEASURE ")]
            assert lines, (variant, label, out.stdout[-400:],
                           out.stderr[-400:])
            result[f"{variant}/{label}"] = json.loads(lines[-1][8:])
            print(f"# {variant}/{label}: {result[f'{variant}/{label}']}",
                  file=sys.stderr)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
