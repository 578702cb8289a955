"""Named SQL scalar functions with KVF-style registration semantics.

Each builtin is (signature, body); registration issues
``CREATE TEMPORARY FUNCTION name signature RETURN body`` and validates
with a probe call, mirroring the reference's registration-time symbol
check (my_functable.cc:58-66): a body that fails analysis returns
ERR_SO and leaves no registration behind; a taken name returns
ERR_FUNC (no silent replace -- p5/README.md:100-103 documents that the
reference cannot re-register either).
"""

from __future__ import annotations

import threading

from pyspark.sql import SparkSession

from operating_system_map_reduce_spark import codes

# signature -> (args_sql, return_sql, body_sql, probe_args)
BUILTIN_FUNCTIONS: dict[str, tuple[str, str, str]] = {
    # vector math (embedding column tier)
    "osmr_dot": (
        "(a ARRAY<FLOAT>, b ARRAY<FLOAT>) RETURNS DOUBLE",
        "aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        "CAST(0 AS DOUBLE), (acc, v) -> acc + v)",
        "osmr_dot(array(CAST(1 AS FLOAT)), array(CAST(1 AS FLOAT)))",
    ),
    "osmr_norm": (
        "(a ARRAY<FLOAT>) RETURNS DOUBLE",
        "sqrt(aggregate(zip_with(a, a, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        "CAST(0 AS DOUBLE), (acc, v) -> acc + v))",
        "osmr_norm(array(CAST(1 AS FLOAT)))",
    ),
    "osmr_cosine": (
        "(a ARRAY<FLOAT>, b ARRAY<FLOAT>) RETURNS DOUBLE",
        # NULL on zero-norm input: cosine is undefined there, and the
        # unguarded division is a DIVIDE_BY_ZERO under ANSI mode the
        # moment a real corpus ships an all-zero embedding
        "CASE WHEN osmr_norm(a) > 0 AND osmr_norm(b) > 0 "
        "THEN osmr_dot(a, b) / (osmr_norm(a) * osmr_norm(b)) END",
        "osmr_cosine(array(CAST(1 AS FLOAT)), array(CAST(1 AS FLOAT)))",
    ),
    # text pipeline scalars
    "osmr_ws_tokens": (
        "(s STRING) RETURNS INT",
        "size(filter(split(s, '\\\\s+'), t -> t != ''))",
        "osmr_ws_tokens('a b')",
    ),
    "osmr_bpe_tokens": (
        "(s STRING) RETURNS BIGINT",
        "aggregate(filter(split(lower(s), '[^a-z0-9]+'), t -> t != ''), "
        "CAST(0 AS BIGINT), (acc, w) -> acc + CAST(ceil(length(w) / 4.0) AS BIGINT))",
        "osmr_bpe_tokens('hello world')",
    ),
    "osmr_fingerprint": (
        "(s STRING) RETURNS STRING",
        "md5(trim(regexp_replace(lower(s), '[^a-z0-9]+', ' ')))",
        "osmr_fingerprint('A  b!')",
    ),
    "osmr_jaccard": (
        "(a ARRAY<STRING>, b ARRAY<STRING>) RETURNS DOUBLE",
        "CAST(size(array_intersect(a, b)) AS DOUBLE) / "
        "CAST(size(array_union(a, b)) AS DOUBLE)",
        "osmr_jaccard(array('a'), array('a'))",
    ),
}


class SqlFunctionRegistry:
    """Session-scoped registry of named SQL scalar functions."""

    def __init__(self, spark: SparkSession) -> None:
        self._spark = spark
        self._lock = threading.Lock()
        self._names: set[str] = set()

    def register(self, name: str, signature: str, body: str,
                 probe: str | None = None) -> str:
        if not name or len(name) > codes.LEN_FNAME:
            return codes.RES_ERR_REQ_FMT
        with self._lock:
            if name in self._names:
                return codes.RES_ERR_FUNC
            try:
                self._spark.sql(
                    f"CREATE TEMPORARY FUNCTION {name} {signature} RETURN {body}"
                )
                if probe is not None:
                    self._spark.sql(f"SELECT {probe}").collect()
            except Exception:
                # failed analysis/probe must leave no registration behind
                try:
                    self._spark.sql(f"DROP TEMPORARY FUNCTION IF EXISTS {name}")
                except Exception:
                    pass
                return codes.RES_ERR_SO
            self._names.add(name)
        return codes.RES_OK

    def register_builtins(self) -> dict[str, str]:
        return {
            name: self.register(name, sig, body, probe)
            for name, (sig, body, probe) in BUILTIN_FUNCTIONS.items()
        }

    def names(self) -> set[str]:
        with self._lock:
            return set(self._names)


def ensure_builtins(spark: SparkSession) -> None:
    """Idempotent builtin (re-)registration for query plumbing.

    Queries that merely *use* the builtins go through this (CREATE OR
    REPLACE); the no-replace KVF semantics live in
    SqlFunctionRegistry.register for user registrations."""
    for name, (sig, body, _probe) in BUILTIN_FUNCTIONS.items():
        spark.sql(f"CREATE OR REPLACE TEMPORARY FUNCTION {name} {sig} RETURN {body}")
