#!/usr/bin/env python
"""Phase-timing probe for the streaming novelty cascade (round 15, §1
"measure first").

Re-runs run_novelty_stream's exact body with a perf_counter around each
phase so the 6-7 s face decomposes into: seed copy, wave staging,
stream machinery (per-wave: wave-id collect, probe+log write, index
append), and -- for the compact face -- the compaction phases.  The
probe duplicates the production body deliberately (timers inline); any
behavior drift is caught by comparing its admission log row count with
the registered face's.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

T = {}


def tick(name, t0):
    T[name] = T.get(name, 0.0) + (time.perf_counter() - t0)
    return time.perf_counter()


def timed_run(spark):
    from operating_system_map_reduce_spark.operators import dedup as _dd
    from operating_system_map_reduce_spark.plans.pipeline import (
        bucketed_signature)
    from operating_system_map_reduce_spark.sources.tables import load_table
    from operating_system_map_reduce_spark.streaming.novelty_stream import (
        _DOC_SCHEMA, _as_index_rows, _seed_index, _staged_waves, _wave_col)
    from operating_system_map_reduce_spark.streaming.windows import (
        _stream_shuffle)

    t0 = time.perf_counter()
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    is_batch = F.col("doc_id") % 10 == 7
    corpus = docs.filter(~is_batch)

    work = tempfile.mkdtemp(prefix="novelty-probe-")
    index_dir = os.path.join(work, "index")
    log_dir = os.path.join(work, "log")
    ckpt_dir = os.path.join(work, "checkpoint")
    t0 = tick("setup", t0)
    try:
        shutil.copytree(_seed_index(spark, SF_DIR, corpus), index_dir)
        t0 = tick("seed_copy", t0)

        src_dir, wave_order = _staged_waves(spark, SF_DIR, docs, is_batch)
        t0 = tick("staging", t0)

        batch_sig = bucketed_signature(spark, SF_DIR).join(
            docs.filter(is_batch).select("doc_id"), "doc_id", "left_semi")
        all_bands = (_dd.lsh_bands(batch_sig).withColumn("wave", _wave_col())
                     .select("doc_id", "wave", "band_idx", "band_hash")
                     .persist())
        t0 = tick("bands_plan", t0)

        def probe_wave(batch, batch_id):
            s = batch.sparkSession
            t = time.perf_counter()
            wave_val = wave_order[batch_id]
            bands = (all_bands.filter(F.col("wave") == wave_val)
                     .select("doc_id", "band_idx", "band_hash"))
            hashes = batch.select(
                "doc_id", "wave", F.md5("text").alias("h")).persist()
            idx = s.read.parquet(index_dir)
            idx_b = (idx.filter(F.col("kind") == "band")
                     .select("band_idx", "band_hash"))
            idx_h = idx.filter(F.col("kind") == "hash").select("h")
            band_hits = (bands.join(idx_b, ["band_idx", "band_hash"])
                         .groupBy("doc_id")
                         .agg(F.count(F.lit(1)).cast("long")
                              .alias("n_band_hits")))
            exact_hits = (hashes.join(idx_h, "h")
                          .select("doc_id",
                                  F.lit(1).cast("long").alias("exact_dup")))
            log = (
                hashes.select("doc_id", "wave")
                .join(band_hits, "doc_id", "left")
                .join(exact_hits, "doc_id", "left")
                .select(
                    "doc_id", "wave",
                    F.coalesce("n_band_hits", F.lit(0)).cast("long")
                    .alias("n_band_hits"),
                    F.coalesce("exact_dup", F.lit(0)).cast("long")
                    .alias("exact_dup"))
                .withColumn(
                    "admitted",
                    ((F.col("n_band_hits") == 0) & (F.col("exact_dup") == 0))
                    .cast("long")))
            t = tick("plan_build", t)
            log.write.mode("append").partitionBy("wave").parquet(log_dir)
            t = tick("log_write", t)
            adm_ids = (s.read.parquet(log_dir)
                       .filter((F.col("wave") == wave_val)
                               & (F.col("admitted") == 1))
                       .select("doc_id"))
            adm_bands = (bands.join(adm_ids, "doc_id")
                         .select("band_idx", "band_hash").distinct())
            adm_hashes = hashes.join(adm_ids, "doc_id").select("h").distinct()
            (_as_index_rows(adm_bands, adm_hashes)
             .write.mode("append").partitionBy("kind").parquet(index_dir))
            t = tick("index_append", t)
            hashes.unpersist()

        stream = (spark.readStream.schema(_DOC_SCHEMA)
                  .option("maxFilesPerTrigger", 1).parquet(src_dir))
        with _stream_shuffle(spark):
            q = (stream.writeStream.foreachBatch(probe_wave)
                 .option("checkpointLocation", ckpt_dir)
                 .trigger(availableNow=True).start())
            q.awaitTermination()
        t0 = tick("stream_total", t0)

        n = (spark.read.parquet(log_dir)
             .select("doc_id", F.col("wave").cast("long").alias("wave"),
                     "n_band_hits", "exact_dup", "admitted")
             .orderBy("doc_id"))
        n.write.format("noop").mode("overwrite").save()
        t0 = tick("result_read", t0)

        # compaction phases (the compact face's extra work)
        snap = spark.read.parquet(index_dir)
        salt = (F.abs(F.hash(F.coalesce(F.col("band_hash"), F.col("h"))))
                % 2)
        compacted = (snap.select("band_idx", "band_hash", "h", "kind")
                     .distinct()
                     .withColumn("__bucket", salt)
                     .repartition(4, "kind", "__bucket")
                     .drop("__bucket"))
        tmp = os.path.join(work, f"index.tmp-{uuid.uuid4().hex[:8]}")
        compacted.write.partitionBy("kind").parquet(tmp)
        t0 = tick("compact_write", t0)
        spark.read.parquet(tmp).count()
        t0 = tick("compact_count", t0)
        (spark.read.parquet(tmp)
         .select(F.col("kind").cast("string").alias("kind"),
                 F.coalesce(F.col("band_idx"), F.lit(-1))
                 .cast("int").alias("band_idx"),
                 F.coalesce(F.col("band_hash"), F.lit("")).alias("band_hash"),
                 F.coalesce(F.col("h"), F.lit("")).alias("h"))
         .orderBy("kind", "band_idx", "band_hash", "h")
         .write.format("noop").mode("overwrite").save())
        t0 = tick("compact_result_read", t0)
        all_bands.unpersist()
    finally:
        shutil.rmtree(work, ignore_errors=True)


def main():
    from operating_system_map_reduce_spark.session import get_spark

    spark = get_spark(app_name="novelty-probe",
                      extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry
    qs = entry.queries()

    # warm-up: registered face end to end (builds seed cache + b_sig)
    t0 = time.perf_counter()
    qs["stream_novelty_filter"](spark, SF_DIR).write.format(
        "noop").mode("overwrite").save()
    warm = time.perf_counter() - t0
    # timed registered faces, for the headline comparison
    t0 = time.perf_counter()
    qs["stream_novelty_filter"](spark, SF_DIR).write.format(
        "noop").mode("overwrite").save()
    face_filter = time.perf_counter() - t0
    t0 = time.perf_counter()
    qs["stream_novelty_index_compact"](spark, SF_DIR).write.format(
        "noop").mode("overwrite").save()
    face_compact = time.perf_counter() - t0

    # phase-decomposed run
    T.clear()
    t0 = time.perf_counter()
    timed_run(spark)
    total = time.perf_counter() - t0

    print(f"warmup={warm:.2f}s face_filter={face_filter:.2f}s "
          f"face_compact={face_compact:.2f}s probe_total={total:.2f}s")
    nested = ("wave_collect", "plan_build", "log_write", "index_append")
    gap = T.get("stream_total", 0.0) - sum(T.get(k, 0.0) for k in nested)
    for k, v in sorted(T.items(), key=lambda kv: -kv[1]):
        mark = " (in stream_total)" if k in nested else ""
        print(f"  {k:22s} {v:7.3f}s{mark}")
    print(f"  {'(stream machinery gap)':22s} {gap:7.3f}s"
          "  # streaming offsets/commits + scheduling inside stream_total")
    spark.stop()


if __name__ == "__main__":
    main()
