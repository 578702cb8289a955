"""Bucketed tables: co-located, shuffle-free joins.

The reference co-locates work by hashing keys into a fixed bucket
array once at insert time (p2/server/concurrenthashmap.h: the bucket
index IS the placement); Spark's equivalent for *data at rest* is
``bucketBy``: each table is hash-partitioned into N buckets when
written, and a join of two tables bucketed the same way on the join
key needs NO Exchange -- the single biggest shuffle eliminated at
100 TB, where a fact-fact join's shuffle is typically the dominant
stage.  ``sortBy`` additionally pre-sorts within buckets so the
SortMergeJoin skips its sort.

tests/test_bucketing.py asserts the physical plan: joining two
co-bucketed tables contains no ShuffleExchange, while the same join on
plain parquet does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str, n_buckets: int = 16,
                   sort: bool = True,
                   one_file_per_bucket: bool = False) -> None:
    """Persist ``df`` as a managed parquet table bucketed (and
    optionally sorted) on ``key``.  At 100 TB, n_buckets is sized so a
    bucket's largest co-grouped key set fits an executor (~shuffle
    partition sizing, but decided once at write time).

    ``one_file_per_bucket`` repartitions on the bucket key first
    (murmur3 HashPartitioning — the same hash the bucket id uses, so
    each task holds exactly one bucket) and was measured a strict win
    for the at-rest builds (round 14, sf10 b_post): build 13.8 →
    7.4 s (32 writers each committing ONE sorted file instead of 32
    tasks × 32 buckets = 1024 tiny files) and downstream reads ~9%
    faster (no per-bucket multi-file merge).  Trade-offs: the
    repartition is one extra exchange of the build input (paid once,
    at write time), a hot bucket is written by a single task (but a
    skewed bucket equally straggles every downstream co-bucketed
    join — n_buckets sizing is the real lever), and against an input
    that is ALREADY a matching bucketed scan the planner elides the
    repartition (harmless: the write falls back to per-task files —
    compact_bucketed exists for that case and uses a forced bucketed
    scan instead)."""
    if one_file_per_bucket:
        from pyspark.sql import functions as F

        df = df.repartition(n_buckets, F.col(key))
    w = df.write.format("parquet").mode("overwrite").bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def append_bucketed(df: DataFrame, table: str, key: str, n_buckets: int = 16,
                    sort: bool = True,
                    one_file_per_bucket: bool = True) -> None:
    """Append delta rows into an existing bucketed table (same spec --
    Spark enforces the bucket count/key match).

    The scale contract this preserves: every append lands its rows in
    the CORRECT bucket files (one new file per non-empty bucket), so
    co-bucketed joins stay exchange-free across any number of appends
    -- the corpus-sized rows still never move.  What an append does
    cost: a bucket holding more than one file loses the at-rest SORT
    guarantee (Spark only trusts sortBy when a bucket is a single
    file), so downstream SortMergeJoins regain their per-bucket sort
    until ``compact_bucketed`` rewrites one file per bucket -- the
    same append-then-compact lifecycle as the reference's changelog +
    SAV (p2/server/map.h SAV contract), applied to the analytic
    at-rest tier.  At 100 TB this is the difference between paying
    the delta (minutes) and paying the corpus (hours) on every
    ingest tick.

    ``one_file_per_bucket`` (default True — the delta is small, the
    shuffle is cheap) bounds fragmentation at ONE new file per bucket
    per tick instead of one per (task, bucket), stretching the
    compaction interval correspondingly."""
    if one_file_per_bucket:
        from pyspark.sql import functions as F

        df = df.repartition(n_buckets, F.col(key))
    w = df.write.format("parquet").mode("append").bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def compact_bucketed(spark: SparkSession, table: str, key: str,
                     n_buckets: int = 16, sort: bool = True) -> None:
    """Rewrite an append-fragmented bucketed table to one file per
    bucket, restoring the at-rest sort guarantee appends suspend (see
    append_bucketed).  The rewrite is a full pass over the table --
    exactly the reference's SAV compaction economics: pay it
    periodically, not per ingest tick.  Implemented as write-aside +
    catalog rename so a failure mid-rewrite leaves the original table
    intact (readers of the OLD table in this session keep their
    files; same atomic-swap discipline as sources/changelog.compact)."""
    tmp = f"{table}_compacting"
    spark.sql(f"DROP TABLE IF EXISTS {tmp}")
    # A bucketed write emits one file per bucket PER TASK, so reaching
    # one file per bucket needs each task to hold exactly one bucket.
    # FORCING the bucketed scan does that with NO shuffle: one task
    # per input bucket reads that bucket's fragment files and writes
    # the merged (re-sorted) single file for the same bucket -- the
    # compaction is a per-bucket local rewrite, which is also the
    # 100 TB plan (an explicit repartition would be both a corpus
    # shuffle AND is silently elided by the planner against a
    # bucketed source -- probed round 14, leaving one file per
    # arbitrary task).  autoBucketedScan would otherwise drop the
    # bucket layout here because the write expresses no distribution
    # requirement.  (saveAsTable reads the old files and writes new
    # ones; the source table is untouched until the swap.)
    auto = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    prev = spark.conf.get(auto, None)
    spark.conf.set(auto, "false")
    try:
        write_bucketed(spark.table(table), tmp, key, n_buckets, sort)
    finally:
        if prev is None:
            spark.conf.unset(auto)
        else:
            spark.conf.set(auto, prev)
    spark.sql(f"DROP TABLE {table}")
    spark.sql(f"ALTER TABLE {tmp} RENAME TO {table}")


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  key: str) -> DataFrame:
    """Join two co-bucketed tables on their bucket key.  With matching
    bucket counts Catalyst plans a shuffle-free SortMergeJoin; AQE
    cannot improve on it because there is no exchange to re-plan."""
    lt = spark.table(left_table)
    rt = spark.table(right_table)
    return lt.join(rt, key)


def has_shuffle(df: DataFrame) -> bool:
    """True if the physical plan contains a shuffle exchange."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange hashpartitioning" in plan
