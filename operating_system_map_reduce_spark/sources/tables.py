"""Testdata table loaders.

``events.parquet`` has shipped with two different ``ts`` encodings across
testdata generations: TIMESTAMP(NANOS) (which Spark's parquet reader only
accepts as BIGINT nanos under the legacy conf) and TIMESTAMP(US) (which
Spark reads as TIMESTAMP_NTZ).  We branch on the loaded dtype and expose a
single canonical ``ts_us`` column (BIGINT microseconds since epoch) either
way.  Oracle SQL uses DuckDB's ``epoch_us(ts)`` which floors identically,
so both engines compute on the same integers -- no cross-engine
timestamp-precision drift.
"""

from __future__ import annotations

import os
import weakref

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Expected logical schemas (name -> {column: type-prefix}).  The driver
# regenerates /root/testdata between rounds; when a column drifts we want
# one clear diagnostic naming the file and column, not a cascade of
# identical DATATYPE_MISMATCH stack traces from every downstream plan.
# Type prefixes (not exact types) so bigint/int and timestamp/timestamp_ntz
# variations that the loaders normalise don't false-alarm.
_EXPECTED: dict[str, dict[str, tuple[str, ...]]] = {
    "region": {"r_regionkey": ("bigint", "int")},
    "nation": {"n_nationkey": ("bigint", "int"), "n_regionkey": ("bigint", "int")},
    "customer": {"c_custkey": ("bigint", "int"), "c_acctbal": ("double", "decimal")},
    "supplier": {"s_suppkey": ("bigint", "int")},
    "part": {"p_partkey": ("bigint", "int")},
    "orders": {
        "o_orderkey": ("bigint", "int"),
        "o_custkey": ("bigint", "int"),
        "o_totalprice": ("double", "decimal"),
        "o_orderdate": ("date", "timestamp", "string"),
    },
    "lineitem": {
        "l_orderkey": ("bigint", "int"),
        "l_quantity": ("double", "decimal", "bigint", "int"),
        "l_extendedprice": ("double", "decimal"),
        "l_discount": ("double", "decimal"),
        "l_shipdate": ("date", "timestamp", "string"),
    },
    "events": {
        "event_id": ("bigint", "int"),
        "user_id": ("bigint", "int"),
        "event_type": ("string",),
        "ts": ("bigint", "timestamp"),  # nanos-as-long OR timestamp[(n)tz]
        "value": ("double", "decimal"),  # SUM'd by stream_enrich_revenue
        "props": ("string",),            # events_json_extract JSON blob
    },
    "documents": {
        "doc_id": ("bigint", "int"),
        "text": ("string",),
        "lang": ("string",),             # stratified sampling / curation keys
        "source": ("string",),           # domain_mix_sample admission key
        "n_chars": ("bigint", "int"),    # sample_weighted weight column
    },
    "embeddings": {
        "vec_id": ("bigint", "int"),
        "embedding": ("array",),
        "label": ("int", "bigint"),      # embedding_label_centroids group key
    },
}

# Per-session source-frame cache.  A loader call costs ~60 ms (parquet
# footer read + schema inference) and every query plan re-loads its
# tables, so repeated construction -- the driver gate runs ~50 queries,
# the bench ~33 -- pays seconds of pure footer re-reads.  DataFrames
# are immutable lazy plans, safe to share; keying on a weakref keeps a
# stopped session collectable.
_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict[tuple[str, str], DataFrame]]" = (
    weakref.WeakKeyDictionary()
)


class TableSchemaError(RuntimeError):
    """A testdata parquet file no longer matches the schema the engine expects."""


def _check_schema(name: str, path: str, df: DataFrame) -> None:
    expected = _EXPECTED.get(name)
    if not expected:
        return
    actual = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    problems = []
    for col, prefixes in expected.items():
        got = actual.get(col)
        if got is None:
            problems.append(f"missing column {col!r} (want type {'/'.join(prefixes)})")
        elif not got.startswith(prefixes):
            problems.append(f"column {col!r} has type {got!r}, want prefix {'/'.join(prefixes)}")
    if problems:
        raise TableSchemaError(
            f"testdata drift in {path}: " + "; ".join(problems)
            + f". Loaded schema: {actual}"
        )


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    per_session = _CACHE.setdefault(spark, {})
    key = (os.path.abspath(sf_dir), name)
    df = per_session.get(key)
    if df is None:
        if name == "events":
            df = _load_events_uncached(spark, sf_dir)
        else:
            path = os.path.join(sf_dir, f"{name}.parquet")
            df = spark.read.parquet(path)
            _check_schema(name, path, df)
        per_session[key] = df
    return df


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with ts replaced by ts_us: BIGINT microseconds since epoch."""
    return load_table(spark, sf_dir, "events")


def ts_us_expr(ts_type: T.DataType, source: str = "events.ts"):
    """Column expression converting a loaded ``ts`` to BIGINT microseconds.

    Branches on the dtype Spark actually loaded, because testdata
    generations have shipped both encodings.
    """
    if isinstance(ts_type, T.LongType):
        # BIGINT nanos under the legacy conf.  Integral `div`, not `/`:
        # ns values (~1.7e18) exceed double's 53-bit mantissa, so float
        # division would be off by +/-1 us.
        return F.expr("ts div 1000")
    if isinstance(ts_type, T.TimestampNTZType):
        # TIMESTAMP(US) parquet -> TIMESTAMP_NTZ.  timestampdiff on NTZ
        # operands recovers the stored microsecond count WITHOUT going
        # through LTZ, so the result is independent of the session
        # timezone -- a vanilla session in a non-UTC environment gets
        # the same integers as DuckDB's (equally TZ-free) epoch_us(ts).
        # (The previous NTZ -> LTZ cast interpreted the wall time in
        # the session zone and was only correct because session.py pins
        # UTC -- a latent divergence for any un-pinned session.)
        return F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
    if isinstance(ts_type, T.TimestampType):
        # Already LTZ (isAdjustedToUTC storage): unix_micros is exact
        # and timezone-free.
        return F.unix_micros(F.col("ts"))
    raise TableSchemaError(
        f"testdata drift: {source} has unsupported type "
        f"{ts_type.simpleString()!r}; expected bigint (nanos) or timestamp"
    )


def _load_events_uncached(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = os.path.join(sf_dir, "events.parquet")
    # Keep the legacy conf set so a NANOS-encoded file loads at all; it is
    # a no-op for US/MS-encoded files.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    _check_schema("events", path, df)
    ts_us = ts_us_expr(df.schema["ts"].dataType, source=path + ":ts")
    return df.withColumn("ts_us", ts_us).drop("ts")
