"""Capture `.explain("formatted")` output for registered queries.

Writes one text file per query into an output directory -- the
round's plan-evidence artifacts (plans/r14/<query>_{before,after}.txt).
Run it from a checkout of the BEFORE commit (git worktree) with the
suffix `before`, and from HEAD with `after`.

Usage:
    python scripts/capture_plans.py OUTDIR SUFFIX [SF_DIR] name1 name2 ...
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    outdir, suffix = sys.argv[1], sys.argv[2]
    rest = sys.argv[3:]
    sf_dir = "/root/testdata/sf0.1"
    if rest and os.path.isdir(rest[0]):
        sf_dir, rest = rest[0], rest[1:]
    names = rest
    os.makedirs(outdir, exist_ok=True)

    import __spark_entry__ as entry
    from operating_system_map_reduce_spark.session import get_spark

    spark = get_spark(app_name="capture-plans",
                      extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted")
    for name in names:
        if name not in qs:
            print(f"SKIP {name}: not registered")
            continue
        df = qs[name](spark, sf_dir)
        text = df._jdf.queryExecution().explainString(mode)
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(f"-- {name} ({suffix}) sf_dir={sf_dir}\n")
            fh.write(text)
        n_ex = text.count("Exchange")
        joins = sorted({w for w in ("BroadcastHashJoin", "SortMergeJoin",
                                    "ShuffledHashJoin", "BroadcastNestedLoopJoin")
                        if w in text})
        py = sorted({w for w in ("BatchEvalPython", "ArrowEvalPython",
                                 "MapInArrow", "FlatMapGroupsInPandas")
                     if w in text})
        print(f"WROTE {path}: Exchange={n_ex} joins={joins} python={py}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
