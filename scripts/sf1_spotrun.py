#!/usr/bin/env python
"""sf1 scaling spot-run (round-9 verdict directive #5).

SCALING.md's 100 TB claims rested on sf0.01 -> sf0.1 pairs (one
decade).  This adds the sf0.1 -> sf1 decade for the five most
expensive bench queries.  The driver ships no sf1 testdata, so sf1 is
SYNTHESIZED deterministically from sf0.1 as ten REPLICA-DISJOINT
copies -- the honest 10x scale-up for these workloads:

* documents (x10 -> 50,000 rows): replica k offsets doc_id by k*5000
  (a multiple of 10, preserving the %10 batch-membership and div-10
  wave semantics) and suffixes every WORD with k (k=0 unchanged).
  Word-suffixing is a bijective vocabulary rename per replica: every
  within-replica shingle/minhash/Jaccard relation of sf0.1 is
  preserved EXACTLY, and cross-replica shingle overlap is exactly
  zero.  The near-dup pair graph, LSH bucket census, and novelty
  admission cascade therefore scale exactly 10x in rows/edges with
  unchanged per-row density -- naive text tiling would instead square
  the dup cliques (10 copies of every near-pair => 190 edges where
  sf0.1 has 1), measuring a DIFFERENT workload, not a bigger one.
* events (x10 -> 1,000,000 rows): replica k offsets user_id by k*1500
  and event_id by k*100000; timestamps unchanged.  Same per-user event
  density over 10x users -- the natural scale-up for the keyed
  stateful streams (quota admission, MRU), whose state grows with
  keys, not with per-key history.
* lineitem / orders (x10 -> 6,000,000 / 1,500,000 rows): replica k
  offsets l_orderkey / o_orderkey by k*150000 (order->lineitem join
  consistency preserved); part/supplier/customer keys unchanged, so
  dimensions stay sf0.1-sized against a 10x fact -- dims grow slower
  than facts in every real warehouse.  Covers the scan+aggregate tier
  (q1, q6) alongside the dedup/graph/stream tiers above.
* embeddings (x10 -> 20,000 vectors): replica k offsets vec_id by
  k*2000 and applies a seeded ORTHOGONAL ROTATION to every vector
  (labels unchanged).  Rotation preserves norms and all within-replica
  pairwise cosines exactly, while cross-replica cosines become
  pseudo-random (~N(0, 1/sqrt(64)) -- far below match thresholds), so
  the ANN workload scales 10x at unchanged per-vector match density;
  naive tiling would instead plant a cosine-1.0 duplicate of every
  vector in every replica.

Timing mirrors bench.py's steady-state rule -- untimed warm-up at the
TARGET SF (AQE re-plans per data size), memoized stat caches cleared
between runs -- hardened two ways for cross-SF comparability: each
(query, SF) pair runs MEDIAN-OF-3 in its OWN fresh JVM (see _measure),
and the session gets a 24g heap.  Output: one JSON line with per-query
sf0.1 / sf1 medians and the ratio; record the table in SCALING.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF01_DIR = "/root/testdata/sf0.1"
SF1_DIR = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/spark-graft-sf1")
SF10_DIR = os.environ.get("SPARK_GRAFT_SF10_DIR", "/tmp/spark-graft-sf10")
REPLICAS = 10

SPOT_QUERIES = [
    "stream_novelty_filter",
    "stream_mru_types",
    "pagerank_neardup",
    "dedup_purge_canonical",
    "stream_quota_admission",
    # scan+aggregate / window tier (round-10 extension): the TPC-H
    # pricing summary (one fact scan, map-side partials), the pushdown
    # face, and the sessionization window over 10x event keys
    "q1_pricing_summary",
    "q6_forecast_revenue",
    "events_sessionize",
    # ANN tier (round-10 extension): bucketed IVF search and the
    # embedding near-dup join over 10x rotated-replica vectors
    "similarity_ivf_search",
    "dedup_embedding_cosine",
]


def make_sf1() -> None:
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(SF1_DIR, exist_ok=True)

    docs_t = pq.read_table(os.path.join(SF01_DIR, "documents.parquet"))
    docs = docs_t.to_pandas()
    n_docs = len(docs)
    # The replication scheme's load-bearing invariants, asserted so a
    # testdata regeneration can't silently break them: the k*n_docs
    # offset preserves %10 batch / div-10 wave semantics only if ids
    # are dense 0..n-1 and n is a multiple of 10, and the word+digit
    # rename is collision-free (cross-replica shingle overlap exactly
    # zero) only if the base vocabulary is digit-free -- a digit
    # suffix is the one rename the [^a-z0-9]+ tokenizer keeps attached
    # (any non-alphanumeric separator would be split off).
    assert n_docs % 10 == 0, f"n_docs={n_docs} not a multiple of 10"
    assert (docs["doc_id"].sort_values().to_numpy()
            == range(n_docs)).all(), "doc_id not dense 0..n-1"
    assert not docs["text"].str.contains("[0-9]", regex=True).any(), \
        "base vocabulary contains digits: word+k rename would collide"
    reps = []
    for k in range(REPLICAS):
        d = docs.copy()
        d["doc_id"] = d["doc_id"] + k * n_docs
        if k:
            suf = str(k)
            d["text"] = d["text"].map(
                lambda t, s=suf: " ".join(w + s for w in t.split(" ")))
        d["n_chars"] = d["text"].str.len().astype("int64")
        reps.append(d)
    out = pd.concat(reps, ignore_index=True)
    pq.write_table(pa.Table.from_pandas(out, schema=docs_t.schema,
                                        preserve_index=False),
                   os.path.join(SF1_DIR, "documents.parquet"))

    ev_t = pq.read_table(os.path.join(SF01_DIR, "events.parquet"))
    ev = ev_t.to_pandas()
    n_users = int(ev["user_id"].max()) + 1
    n_events = int(ev["event_id"].max()) + 1
    reps = []
    for k in range(REPLICAS):
        e = ev.copy()
        e["event_id"] = e["event_id"] + k * n_events
        e["user_id"] = e["user_id"] + k * n_users
        reps.append(e)
    out = pd.concat(reps, ignore_index=True)
    schema = pa.schema([f.remove_metadata() for f in ev_t.schema])
    pq.write_table(pa.Table.from_pandas(out, schema=schema,
                                        preserve_index=False),
                   os.path.join(SF1_DIR, "events.parquet"))

    import numpy as np
    emb_t = pq.read_table(os.path.join(SF01_DIR, "embeddings.parquet"))
    emb = emb_t.to_pandas()
    n_vecs = int(emb["vec_id"].max()) + 1
    E = np.stack(emb["embedding"].to_numpy()).astype("float64")
    dim = E.shape[1]
    reps = []
    for k in range(REPLICAS):
        r = emb.copy()
        r["vec_id"] = r["vec_id"] + k * n_vecs
        if k:
            rng = np.random.default_rng(1000 + k)
            q_rot, _ = np.linalg.qr(rng.standard_normal((dim, dim)))
            rotated = (E @ q_rot).astype("float32")
            r["embedding"] = list(rotated)
        reps.append(r)
    out = pd.concat(reps, ignore_index=True)
    schema = pa.schema([f.remove_metadata() for f in emb_t.schema])
    pq.write_table(pa.Table.from_pandas(out, schema=schema,
                                        preserve_index=False),
                   os.path.join(SF1_DIR, "embeddings.parquet"))

    # ONE shared orderkey offset for both fact tables, taken from
    # orders (the key's defining table): per-table max() offsets would
    # silently break order->lineitem join consistency the day the
    # testdata gains an order with no lineitems.
    orders_t = pq.read_table(os.path.join(SF01_DIR, "orders.parquet"))
    n_orderkeys = int(orders_t.to_pandas()["o_orderkey"].max()) + 1
    for table, keycol in (("lineitem", "l_orderkey"),
                          ("orders", "o_orderkey")):
        t = pq.read_table(os.path.join(SF01_DIR, f"{table}.parquet"))
        pdf = t.to_pandas()
        reps = []
        for k in range(REPLICAS):
            r = pdf.copy()
            r[keycol] = r[keycol] + k * n_orderkeys
            reps.append(r)
        out = pd.concat(reps, ignore_index=True)
        schema = pa.schema([f.remove_metadata() for f in t.schema])
        pq.write_table(pa.Table.from_pandas(out, schema=schema,
                                            preserve_index=False),
                       os.path.join(SF1_DIR, f"{table}.parquet"))

    # completion marker: the skip-sentinel in main() must witness a
    # FINISHED generation, not whichever table happened to land first
    # before an interruption
    with open(os.path.join(SF1_DIR, "_COMPLETE"), "w") as fh:
        fh.write(f"replicas={REPLICAS}\n")


def make_sf10() -> None:
    """Third decade for the scan/window tier, generated SPARK-SIDE (60M
    lineitem rows do not belong in a pandas concat): 100 key-offset
    replicas of sf0.1's lineitem/orders/events via one explode+project
    per table.  Same replica-disjointness argument as make_sf1; one
    shared orderkey stride keeps order->lineitem joins consistent."""
    from pyspark.sql import functions as F

    from operating_system_map_reduce_spark.session import get_spark

    spark = get_spark(app_name="osmr-make-sf10",
                      extra_conf={"spark.ui.enabled": "false",
                                  "spark.driver.memory": "24g"})
    orders = spark.read.parquet(os.path.join(SF01_DIR, "orders.parquet"))
    order_stride = orders.agg(F.max("o_orderkey")).first()[0] + 1
    events = spark.read.parquet(os.path.join(SF01_DIR, "events.parquet"))
    strides = {
        "lineitem": {"l_orderkey": order_stride},
        "orders": {"o_orderkey": order_stride},
        "events": {
            "event_id": events.agg(F.max("event_id")).first()[0] + 1,
            "user_id": events.agg(F.max("user_id")).first()[0] + 1,
        },
    }
    reps = 100
    for table, offs in strides.items():
        df = (spark.read.parquet(os.path.join(SF01_DIR, f"{table}.parquet"))
              .withColumn("__k", F.explode(F.sequence(F.lit(0),
                                                      F.lit(reps - 1)))))
        for col, stride in offs.items():
            df = df.withColumn(col, F.col(col) + F.col("__k") * stride)
        (df.drop("__k")
         .write.mode("overwrite")
         .parquet(os.path.join(SF10_DIR, f"{table}.parquet")))
    make_sf10_embeddings()
    with open(os.path.join(SF10_DIR, "_COMPLETE"), "w") as fh:
        fh.write("replicas=100\n")
    spark.stop()


def make_sf10_documents() -> None:
    """sf10 documents for the graph/LSH third decade (the round-10
    verdict named graph and LSH as the families whose scaling evidence
    stopped at sf1): 100 word-suffix replicas of sf0.1's 5,000 docs =
    500,000 docs, generated SPARK-SIDE (the suffix rename is a
    per-word transform -- no pandas concat of a 100x text corpus).
    Same replica-disjointness argument as make_sf1's documents: the
    word+str(k) rename is a bijective vocabulary rename per replica,
    and with a digit-free base vocabulary two replicas can never
    collide -- a maximal digit suffix identifies its replica uniquely
    even for two-digit k (base words carry no digits, so
    w1 || str(j) == w2 || str(k) forces str(j) == str(k)).  What is
    preserved EXACTLY per replica: token counts, shingle-SET
    relations, and therefore every Jaccard/containment value -- the
    near-dup edge graph scales exactly 100x.  What is NOT exact: the
    rename changes each shingle's md5, so each replica's MINHASH
    signatures and band collisions are an independent draw from the
    same distribution -- LSH candidate counts scale ~100x in
    expectation with per-replica variance, not identically (the same
    caveat applies to make_sf1's 'preserved EXACTLY' phrasing above,
    which is exact for Jaccard, in-expectation for minhash/LSH)."""
    from pyspark.sql import functions as F

    from operating_system_map_reduce_spark.session import get_spark

    spark = get_spark(app_name="osmr-make-sf10-docs",
                      extra_conf={"spark.ui.enabled": "false",
                                  "spark.driver.memory": "8g"})
    docs = spark.read.parquet(os.path.join(SF01_DIR, "documents.parquet"))
    n_docs, n_distinct, n_digit, max_id, min_id = docs.agg(
        F.count(F.lit(1)), F.countDistinct("doc_id"),
        F.sum(F.col("text").rlike("[0-9]").cast("int")),
        F.max("doc_id"), F.min("doc_id")).first()
    assert n_docs % 10 == 0, f"n_docs={n_docs} not a multiple of 10"
    # distinct == total AND max == n-1 AND min >= 0 IS density: the
    # first two alone admit e.g. {-1, 1, ..., n-1} (round-11 advice),
    # which would break the %10 batch semantics and the k*n_docs
    # offset disjointness
    assert n_distinct == n_docs and max_id == n_docs - 1 and min_id >= 0, \
        "doc_id not dense 0..n-1"
    assert n_digit == 0, \
        "base vocabulary contains digits: word+k rename would collide"
    rep = docs.withColumn("__k", F.explode(F.sequence(F.lit(0), F.lit(99))))
    out = (rep.select(
        (F.col("doc_id") + F.col("__k") * n_docs).alias("doc_id"),
        F.when(F.col("__k") == 0, F.col("text")).otherwise(
            F.array_join(F.transform(
                F.split("text", " "),
                lambda w: F.concat(w, F.col("__k").cast("string"))), " "))
        .alias("text"),
        "lang", "source")
        .withColumn("n_chars", F.length("text").cast("long")))
    (out.write.mode("overwrite")
     .parquet(os.path.join(SF10_DIR, "documents.parquet")))
    spark.stop()


def make_sf10_embeddings() -> None:
    """sf10 embeddings for the ANN third decade (round-10 verdict
    directive #2): 100 rotated replicas of sf0.1's 2,000 vectors =
    200,000 vectors.  Same method and argument as make_sf1's
    embeddings: a seeded orthogonal rotation per replica preserves
    norms and all within-replica pairwise cosines exactly while
    cross-replica cosines stay pseudo-random (~N(0, 1/sqrt(64))), so
    per-vector match density is unchanged at 100x the corpus.  Small
    enough for pandas (200k x 64 float32 = 51 MB)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    emb_t = pq.read_table(os.path.join(SF01_DIR, "embeddings.parquet"))
    emb = emb_t.to_pandas()
    n_vecs = int(emb["vec_id"].max()) + 1
    E = np.stack(emb["embedding"].to_numpy()).astype("float64")
    dim = E.shape[1]
    reps = []
    for k in range(100):
        r = emb.copy()
        r["vec_id"] = r["vec_id"] + k * n_vecs
        if k:
            rng = np.random.default_rng(20_000 + k)
            q_rot, _ = np.linalg.qr(rng.standard_normal((dim, dim)))
            r["embedding"] = list((E @ q_rot).astype("float32"))
        reps.append(r)
    out = pd.concat(reps, ignore_index=True)
    schema = pa.schema([f.remove_metadata() for f in emb_t.schema])
    os.makedirs(SF10_DIR, exist_ok=True)
    pq.write_table(pa.Table.from_pandas(out, schema=schema,
                                        preserve_index=False),
                   os.path.join(SF10_DIR, "embeddings.parquet"))


def _measure(name: str, sf_dir: str) -> dict:
    """Median-of-3 for ONE (query, SF) in THIS process's fresh session.

    One JVM per (query, SF): a shared session carries the previous
    pair's persisted blocks and heap state across measurements -- the
    first mixed-SF attempt read dedup_purge_canonical FASTER at sf1
    than at sf0.1 on exactly that pollution.  bench.py's single-session
    design is fine there because every query runs at ONE SF."""
    import __spark_entry__ as entry
    from bench import _clear_stat_caches
    from operating_system_map_reduce_spark.session import get_spark

    qs = entry.queries()
    # 24g heap: local[32] holds all task slots in the driver JVM and
    # sf1's widest stage OOMed Spark's 1g default (the session factory
    # now defaults to 8g; sf1 gets explicit extra room).
    spark = get_spark(app_name=f"osmr-sf1-{name}",
                      extra_conf={"spark.ui.enabled": "false",
                                  "spark.driver.memory": "24g"})
    qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    runs = []
    for _ in range(3):
        # Steady-state stabilizer (round-11 pagerank variance
        # diagnosis): queries that localCheckpoint leave their block
        # RDDs pinned until the JVM GCs the py4j handles, and the
        # ContextCleaner's cadence then injects 10-60% run-to-run
        # noise (observed: 6.2-11.4 s drifting with 2-4 accumulated
        # checkpoint RDDs; forcing GC pinned storage at 1 RDD and the
        # spread at +-7%).  We measure query cost, not cleaner timing.
        import gc as _gc
        _gc.collect()
        spark.catalog.clearCache()
        spark._jvm.System.gc()
        _clear_stat_caches()
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        runs.append(round(time.perf_counter() - t0, 3))
    return {"median": sorted(runs)[1], "runs": runs}


def _third_decade() -> None:
    """sf1 -> sf10 (lineitem 6M -> 60M rows, events 1M -> 10M,
    embeddings 20k -> 200k vectors): same fresh-JVM median-of-3
    method, one more decade where extrapolation was doing the work.
    Round 11 extends the tier list beyond scan/window to the families
    whose cost grows with key count -- one keyed stateful stream
    (quota admission, 15k -> 150k user keys) and one ANN face (IVF
    cell-probed search) -- exactly where sf10 evidence is most
    informative (round-10 verdict directive #2)."""
    import subprocess
    if not os.path.exists(os.path.join(SF10_DIR, "_COMPLETE")):
        make_sf10()
    if not os.path.exists(os.path.join(SF10_DIR, "embeddings.parquet")):
        make_sf10_embeddings()   # _COMPLETE predates the ANN extension
    if not os.path.exists(os.path.join(SF10_DIR, "documents.parquet")):
        make_sf10_documents()    # _COMPLETE predates the graph/LSH tier
    result: dict[str, dict] = {}
    only = os.environ.get("SPARK_GRAFT_DECADE_ONLY")
    names = ("q1_pricing_summary", "q6_forecast_revenue",
             "events_sessionize", "stream_quota_admission",
             "similarity_ivf_search",
             # round-11 closing extension: the last two families whose
             # evidence stopped at sf1 -- the near-dup graph (pagerank,
             # edge-proportional shuffle) and banded LSH pair detection
             # -- plus the inverted-index detector itself, whose sf10
             # row caught the lying-estimate broadcast (SCALING.md)
             "pagerank_neardup", "dedup_minhash_lsh",
             "dedup_ngram_jaccard")
    for name in ([n for n in names if n in only.split(",")]
                 if only else names):
        row: dict = {}
        for label, sf_dir in (("sf1", SF1_DIR), ("sf10", SF10_DIR)):
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), name, sf_dir],
                capture_output=True, text=True, cwd=REPO, timeout=1800)
            line = [ln for ln in out.stdout.splitlines()
                    if ln.startswith("MEASURE ")]
            assert line, (name, label, out.stdout[-500:], out.stderr[-500:])
            row[label] = json.loads(line[-1][8:])
        row["ratio"] = round(row["sf10"]["median"] / row["sf1"]["median"], 2)
        result[name] = row
        print(f"# {name}: {row}", file=sys.stderr)
    print(json.dumps({"metric": "sf10_probe", "replicas": 100,
                      "queries": result}))


def main() -> None:
    if len(sys.argv) == 3:          # subprocess mode: one (query, SF)
        print("MEASURE " + json.dumps(_measure(sys.argv[1], sys.argv[2])))
        return

    if not os.path.exists(os.path.join(SF1_DIR, "_COMPLETE")):
        make_sf1()        # marker written after every table lands

    if "--third-decade" in sys.argv:
        _third_decade()
        return

    import subprocess
    only = os.environ.get("SPARK_GRAFT_SPOT_ONLY")
    targets = ([n for n in SPOT_QUERIES if n in only.split(",")]
               if only else SPOT_QUERIES)
    result: dict[str, dict] = {}
    for name in targets:
        row: dict = {}
        for label, sf_dir in (("sf0.1", SF01_DIR), ("sf1", SF1_DIR)):
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), name, sf_dir],
                capture_output=True, text=True, cwd=REPO, timeout=1200)
            line = [ln for ln in out.stdout.splitlines()
                    if ln.startswith("MEASURE ")]
            assert line, (name, label, out.stdout[-500:], out.stderr[-500:])
            row[label] = json.loads(line[-1][8:])
        row["ratio"] = round(row["sf1"]["median"] / row["sf0.1"]["median"], 2)
        result[name] = row
        print(f"# {name}: {row}", file=sys.stderr)
    print(json.dumps({"metric": "sf1_spot", "replicas": REPLICAS,
                      "queries": result}))


if __name__ == "__main__":
    main()
