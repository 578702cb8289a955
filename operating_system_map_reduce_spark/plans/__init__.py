"""Query library exposed through __spark_entry__.

Each sub-module exports:
    QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]]
    ORACLES: dict[str, str]        -- ANSI SQL for DuckDB parity checks

Column names are aliased identically on both sides: the driver's
correctness compare sorts columns by name before hashing values.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def collect_registry() -> tuple[dict[str, Callable[[SparkSession, str], DataFrame]], dict[str, str]]:
    from operating_system_map_reduce_spark.plans import (
        analytics, curation, kvqueries, pipeline, streamqueries,
    )

    queries: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    oracles: dict[str, str] = {}
    for mod in (analytics, kvqueries, pipeline, curation, streamqueries):
        queries.update(mod.QUERIES)
        oracles.update(mod.ORACLES)
    return queries, oracles
