"""Testdata table loaders.

``events.parquet`` carries TIMESTAMP(NANOS) which Spark's parquet reader
rejects; we read nanos as long (legacy conf) and expose ``ts_us``
(BIGINT microseconds since epoch).  Oracle SQL uses DuckDB's
``epoch_us(ts)`` which floors identically, so both engines compute on
the same integers -- no cross-engine timestamp-precision drift.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return load_events(spark, sf_dir)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with ts replaced by ts_us: BIGINT microseconds since epoch."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    # ts column arrives as BIGINT nanos under the legacy conf.  Integral
    # `div`, not `/`: ns values (~1.7e18) exceed double's 53-bit mantissa,
    # so float division would be off by ±1 us.
    return df.withColumn("ts_us", F.expr("ts div 1000")).drop("ts")
