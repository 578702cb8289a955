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
                   sort: bool = True) -> None:
    """Persist ``df`` as a managed parquet table bucketed (and
    optionally sorted) on ``key``.  At 100 TB, n_buckets is sized so a
    bucket's largest co-grouped key set fits an executor (~shuffle
    partition sizing, but decided once at write time)."""
    w = df.write.format("parquet").mode("overwrite").bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


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
