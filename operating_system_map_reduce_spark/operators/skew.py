"""Skew mitigation: salting utilities for hot keys.

AQE's skew-join splitting (enabled in session.py) is the first line of
defense, but it only covers sort-merge joins after a shuffle exists.
These utilities cover the cases AQE cannot re-plan:

 - ``salted_agg_distinct``: COUNT(DISTINCT x) per key shuffles every
   distinct (key, x) pair to one reducer per key; a hot key serializes.
   Salting shards the dedup stage into ``n_salts`` reducers per key,
   then merges exact partial counts (disjoint shards => sum is exact).
 - ``salted_join``: an equi-join whose build side cannot broadcast and
   whose probe side has hot keys.  The probe side gets a deterministic
   per-row salt; the build side is replicated ``n_salts`` times; the
   join key becomes (key, salt), splitting each hot key's row group
   across n_salts reducers.  Row-multiplicity is preserved exactly
   (each probe row joins the single replica carrying its salt).

Salts derive from hash() of stable columns -- no rand(), so retried
tasks and the DuckDB-oracle comparison stay deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg_distinct(df: DataFrame, key: str, distinct_col: str,
                        n_salts: int = 16) -> DataFrame:
    """Exact count(distinct distinct_col) per key, skew-resistant.

    Stage 1 dedups (key, salt-shard of distinct_col) -- the hot key's
    distinct values spread over n_salts reducers; stage 2 sums disjoint
    shard counts.  Returns (key, n_distinct)."""
    salt = F.pmod(F.hash(F.col(distinct_col)), F.lit(n_salts)).alias("_salt")
    shard = (
        df.select(F.col(key), F.col(distinct_col), salt)
        .groupBy(key, "_salt")
        .agg(F.countDistinct(distinct_col).alias("_part"))
    )
    return (
        shard.groupBy(key)
        .agg(F.sum("_part").cast("long").alias("n_distinct"))
    )


def salted_join(probe: DataFrame, build: DataFrame, key: str,
                n_salts: int = 16, probe_salt_col: str | None = None) -> DataFrame:
    """Skew-resistant inner equi-join on ``key``.

    ``probe_salt_col``: a probe column whose hash spreads rows evenly
    (defaults to the whole-row hash of the probe's columns).  The build
    side is exploded n_salts ways, so use only when build is much
    smaller than probe but too big / too skew-prone to broadcast."""
    if probe_salt_col is not None:
        basis: Column = F.col(probe_salt_col)
    else:
        basis = F.struct(*[F.col(c) for c in probe.columns])
    p = probe.withColumn("_salt", F.pmod(F.hash(basis), F.lit(n_salts)))
    b = build.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return p.join(b, [key, "_salt"]).drop("_salt")
