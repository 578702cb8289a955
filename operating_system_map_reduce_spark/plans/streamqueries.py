"""Structured Streaming queries surfaced through the driver contract.

Each callable replays the events table through a real readStream
(Trigger.AvailableNow) and returns the landed sink, so the driver's
collect sees a plain DataFrame.  ``stream_windowed_counts`` is
SQL-expressible (tumbling windows are epoch-aligned hourly buckets) and
carries a DuckDB oracle.  ``stream_quota_admission`` is the reference's
sequential admit/record quota state machine
(p4/server/my_quota_tracker.cc:44-77) -- order-dependent and
non-associative, hence deliberately NO oracle entry: the driver records
the weaker rows-only check, and tests/test_streaming.py pins the exact
semantics against the pure-Python tracker.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from operating_system_map_reduce_spark.streaming.quota_stream import run_quota_admission
from operating_system_map_reduce_spark.streaming.windows import run_windowed_counts


def stream_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_windowed_counts(spark, sf_dir)


STREAM_WINDOW_SQL = """
SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS window_start_us,
       event_type, COUNT(*) AS n, SUM(value) AS sum_value
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
"""


def stream_quota_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_quota_admission(spark, sf_dir)


QUERIES = {
    "stream_windowed_counts": stream_windowed_counts,
    "stream_quota_admission": stream_quota_admission,
}

ORACLES = {
    "stream_windowed_counts": STREAM_WINDOW_SQL,
}
