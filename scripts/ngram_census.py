"""Co-occurrence census for dedup_ngram_jaccard's decade term -- the
round-14 PERF WATCH item (SCALING.md round-14 "Post-layout containment
+ ngram decade rows"; queue note item 5).

The finding under test: on matched one-file-per-bucket layouts the
ngram face reads 17.4-18.4x on 10x data (sf10 -> sf100) while its
t=0.2 pair OUTPUT is exactly 10.0x.  The named suspect is the
PRE-COMBINE co-occurrence relation -- the join output that feeds the
partial-aggregating groupBy in ``_ngram_pair_rows``: one row per
(shingle, doc_a, doc_b) with id_a < id_b inside the 5x length filter,
Sigma_s freq(s)^2-shaped.  Falsifiable prediction on record: these
rows grow >= 30x on 10x data between the decades.  If confirmed, the
fix class is frequency-capped shingle blocking or the prefix lever at
low threshold; if the census reads ~linear, the term is
shuffle/spill-shaped and the count-join lesson applies instead.

Census per decade (each in a fresh JVM, subprocess mode):
  * n_docs, postings rows, distinct shingles;
  * Sigma_s C(freq,2) -- the unfiltered pair bound, computable from a
    shingle-frequency groupBy alone (no join);
  * the EXACT pre-combine join-row count (id_a < id_b, 5x length
    filter) -- the quantity the aggregate actually consumes;
  * top shingle frequencies (is the growth a hot-tail effect?).

Decade corpora are the established word-suffix replica scheme
(scripts/sf1_spotrun.make_sf10_documents, generalized to any replica
count; the digit-free-vocabulary argument covers 1000 replicas: both
suffixes are the maximal digit suffix of the concatenated word, so
equal words force equal suffixes).  Only documents.parquet is needed.

Usage:
    python scripts/ngram_census.py                 # full curve
    python scripts/ngram_census.py <sf_dir>        # one decade, subprocess
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF01_DIR = "/root/testdata/sf0.1"
DECADES = [
    ("sf0.1", SF01_DIR, 1),
    ("sf1", "/tmp/spark-graft-sf1", 10),
    ("sf10", "/tmp/spark-graft-sf10", 100),
    ("sf100", "/tmp/spark-graft-sf100", 1000),
]


def ensure_documents(sf_dir: str, reps: int) -> None:
    """Word-suffix replica documents at ``sf_dir`` (build if absent)."""
    out_path = os.path.join(sf_dir, "documents.parquet")
    marker = os.path.join(sf_dir, "_DOCS_COMPLETE")
    if os.path.exists(marker):
        return
    from pyspark.sql import functions as F

    from operating_system_map_reduce_spark.session import get_spark

    spark = get_spark(app_name=f"ngram-census-make-{reps}",
                      extra_conf={"spark.ui.enabled": "false",
                                  "spark.driver.memory": "8g"})
    docs = spark.read.parquet(os.path.join(SF01_DIR, "documents.parquet"))
    n_docs, n_distinct, n_digit, max_id, min_id = docs.agg(
        F.count(F.lit(1)), F.countDistinct("doc_id"),
        F.sum(F.col("text").rlike("[0-9]").cast("int")),
        F.max("doc_id"), F.min("doc_id")).first()
    assert n_distinct == n_docs and max_id == n_docs - 1 and min_id >= 0, \
        "doc_id not dense 0..n-1"
    assert n_digit == 0, \
        "base vocabulary contains digits: word+k rename would collide"
    rep = docs.withColumn(
        "__k", F.explode(F.sequence(F.lit(0), F.lit(reps - 1))))
    out = (rep.select(
        (F.col("doc_id") + F.col("__k") * n_docs).alias("doc_id"),
        F.when(F.col("__k") == 0, F.col("text")).otherwise(
            F.array_join(F.transform(
                F.split("text", " "),
                lambda w: F.concat(w, F.col("__k").cast("string"))), " "))
        .alias("text"),
        "lang", "source")
        .withColumn("n_chars", F.length("text").cast("long")))
    out.write.mode("overwrite").parquet(out_path)
    with open(marker, "w") as fh:
        fh.write(f"replicas={reps}\n")
    spark.stop()


def census(sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    from operating_system_map_reduce_spark.operators import dedup as _dd
    from operating_system_map_reduce_spark.session import get_spark

    spark = get_spark(app_name="ngram-census",
                      extra_conf={"spark.ui.enabled": "false",
                                  "spark.driver.memory": "24g"})
    docs = (spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
            .select("doc_id", "text"))
    ex = _dd.shingle_postings(docs)

    n_docs = docs.count()
    freq = ex.groupBy("s").agg(F.count(F.lit(1)).alias("f"))
    postings, distinct_s, pair_bound = freq.agg(
        F.sum("f"), F.count(F.lit(1)),
        F.sum(F.col("f") * (F.col("f") - 1) / 2).cast("long")).first()
    top = [r.f for r in freq.orderBy(F.desc("f")).limit(20).collect()]

    # The exact pre-combine relation _ngram_pair_rows aggregates:
    # same join condition, count only.
    a = ex.select(F.col("doc_id").alias("id_a"),
                  F.col("n").alias("n_a"), "s")
    b = ex.select(F.col("doc_id").alias("id_b"),
                  F.col("n").alias("n_b"), F.col("s").alias("s_b"))
    cooc = a.join(
        b, (F.col("s") == F.col("s_b")) & (F.col("id_a") < F.col("id_b"))
        & (F.col("n_a") * F.lit(5) >= F.col("n_b"))
        & (F.col("n_b") * F.lit(5) >= F.col("n_a"))).count()
    spark.stop()
    return {"sf_dir": sf_dir, "n_docs": n_docs, "postings": int(postings),
            "distinct_shingles": int(distinct_s),
            "pair_bound_sum_cf2": int(pair_bound),
            "cooc_rows_filtered": int(cooc), "top_freqs": top}


def main() -> None:
    if len(sys.argv) == 2:  # subprocess mode: one decade
        print("CENSUS " + json.dumps(census(sys.argv[1])))
        return
    results = []
    for name, sf_dir, reps in DECADES:
        if reps > 1:
            ensure_documents(sf_dir, reps)
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), sf_dir],
            capture_output=True, text=True, cwd=REPO)
        line = [ln for ln in proc.stdout.splitlines()
                if ln.startswith("CENSUS ")]
        if not line:
            print(f"{name}: FAILED\n{proc.stdout[-2000:]}\n"
                  f"{proc.stderr[-2000:]}")
            continue
        row = json.loads(line[0][len("CENSUS "):])
        row["name"] = name
        results.append(row)
        print(json.dumps(row))
    for prev, cur in zip(results, results[1:]):
        for k in ("postings", "pair_bound_sum_cf2", "cooc_rows_filtered"):
            r = cur[k] / max(prev[k], 1)
            print(f"{prev['name']} -> {cur['name']}  {k}: {r:.2f}x")


if __name__ == "__main__":
    main()
