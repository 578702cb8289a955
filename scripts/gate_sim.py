"""Local simulation of the driver's round-N correctness gate.

Computes the CURRENT round's 50-seat window exactly as
plans/window.build_window does, then runs each seated query's Spark
plan and DuckDB oracle side-by-side at sf0.01 through the same
normalize/compare discipline the driver applies
(tests/oracle_utils.compare).  Queries without an oracle entry get the
driver's weaker rows-only check (runs, returns >= 0 rows, stable
schema).

Usage:
    python scripts/gate_sim.py                  # the whole window
    python scripts/gate_sim.py name1 name2 ...  # just these queries
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

SF_DIR = os.environ.get("GATE_SF_DIR", "/root/testdata/sf0.01")


def main() -> int:
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry
    from operating_system_map_reduce_spark.plans import window
    from oracle_utils import compare, run_oracle

    qs = entry.queries()
    oracles = entry.oracle_sql()
    names = list(qs.keys())
    if len(sys.argv) > 1:
        seated = [n for n in sys.argv[1:] if n in qs]
        unknown = [n for n in sys.argv[1:] if n not in qs]
        if unknown:
            print(f"unknown queries skipped: {unknown}")
    else:
        seated = window.build_window(names, window.load_ledger())
    print(f"gate_sim: {len(seated)} queries at {SF_DIR}")

    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory", "24g")
             .appName("gate_sim").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    results = {}
    n_pass = n_fail = 0
    for name in seated:
        t0 = time.time()
        try:
            df = qs[name](spark, SF_DIR)
            if name in oracles:
                orc = run_oracle(oracles[name], SF_DIR)
                problems = compare(df, orc)
                ok = not problems
                detail = problems[:2]
            else:
                rows = df.count()
                _ = df.schema  # stable schema materializes or raises
                ok, detail = True, [f"rows-only: {rows} rows"]
        except Exception as exc:  # noqa: BLE001 -- the gate records errs
            ok, detail = False, [f"err: {exc}"]
            traceback.print_exc()
        dt = time.time() - t0
        results[name] = {"pass": ok, "sec": round(dt, 2), "detail": detail}
        n_pass += ok
        n_fail += not ok
        print(f"{'PASS' if ok else 'FAIL'} {name} ({dt:.1f}s)"
              + ("" if ok else f"  {detail}"))
    print(f"\n{n_pass} pass / {n_fail} fail of {len(seated)}")
    out = "/tmp/gate_sim_result.json"
    with open(out, "w") as fh:
        json.dump(results, fh, indent=1)
    print(f"wrote {out}")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
