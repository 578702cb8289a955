"""Temporal joins the built-in operator set lacks: as-of and range.

Reference parity note: the reference engine (a KV store with
map/reduce, see SURVEY.md) has no joins at all; these belong to the
beyond-reference pipeline tier.  Both are composed purely from
DataFrame ops so Catalyst keeps pushdown/codegen.

Scale design:
 - ``asof_join`` uses the union-marker pattern: tag both sides, union,
   one hash shuffle on the key, one sort per partition, and a running
   ``last(ignorenulls)`` window carries the most recent right row onto
   each left row.  No range condition ever reaches the join planner, so
   it cannot degrade to a broadcast-nested-loop; cost is a single
   sort-merge-shaped pass regardless of how many right rows precede a
   left row.
 - ``range_join_binned`` turns a (key, point IN interval) predicate
   into an equi-join: intervals explode to the fixed-width time buckets
   they cover, points map to exactly one bucket, the join key becomes
   (key, bucket), and the exact range predicate filters afterwards.
   Each matched pair appears exactly once (the point owns one bucket).
   Bucket width trades explode fan-out vs join selectivity; pick it
   near the typical interval width so fan-out stays <= 2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(left: DataFrame, right: DataFrame, key: str,
              left_ts: str, right_ts: str,
              right_cols: list[str], tie_col: str,
              tolerance: int | None = None) -> DataFrame:
    """Backward as-of join: for each left row, the right row with the
    greatest ``right_ts <= left_ts`` for the same ``key``.

    Ties on ``right_ts`` break by greatest ``tie_col`` (must be one of
    ``right_cols``).  With ``tolerance`` (same unit as the ts columns),
    matches older than ``left_ts - tolerance`` are nulled out -- the
    left row is kept (outer as-of).
    """
    rpay = F.struct(F.col(right_ts).alias("_rts"),
                    *[F.col(c) for c in right_cols]).alias("_rpay")
    r = right.select(F.col(key).alias("_k"), F.col(right_ts).alias("_ts"),
                     F.lit(0).alias("_side"), F.col(tie_col).cast("long").alias("_tie"),
                     rpay, *[F.lit(None).alias(f"_l_{c}") for c in left.columns])
    l = left.select(F.col(key).alias("_k"), F.col(left_ts).alias("_ts"),
                    F.lit(1).alias("_side"), F.lit(None).cast("long").alias("_tie"),
                    F.lit(None).cast(r.schema["_rpay"].dataType).alias("_rpay"),
                    *[F.col(c).alias(f"_l_{c}") for c in left.columns])
    # right rows sort before left rows at equal ts (side 0 < 1) => the
    # inclusive <= semantics; among right rows the last is (ts, tie) max.
    w = (Window.partitionBy("_k")
         .orderBy(F.col("_ts").asc(), F.col("_side").asc(), F.col("_tie").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    merged = (r.unionByName(l)
              .withColumn("_match", F.last("_rpay", ignorenulls=True).over(w))
              .filter(F.col("_side") == 1))
    if tolerance is not None:
        merged = merged.withColumn(
            "_match",
            F.when(F.col("_match._rts") >= F.col("_ts") - F.lit(tolerance),
                   F.col("_match")),
        )
    return merged.select(
        *[F.col(f"_l_{c}").alias(c) for c in left.columns],
        *[F.col(f"_match.{c}").alias(c) for c in right_cols],
    )


def range_join_binned(points: DataFrame, intervals: DataFrame, key: str,
                      point_ts: str, start_col: str, end_col: str,
                      bucket_width: int) -> DataFrame:
    """Inner range join: point rows matched to every interval row of the
    same ``key`` with ``start <= point_ts <= end`` (inclusive both
    ends), via (key, bucket) equi-join.  Returns all columns of both
    inputs (names must not collide)."""
    pts = points.withColumn("_bucket", F.expr(f"{point_ts} div {bucket_width}"))
    ivs = intervals.withColumn(
        "_bucket",
        F.explode(F.sequence(F.expr(f"{start_col} div {bucket_width}"),
                             F.expr(f"{end_col} div {bucket_width}"))),
    )
    return (
        pts.join(ivs, ["_bucket", key] if key else ["_bucket"])
        .filter((F.col(point_ts) >= F.col(start_col))
                & (F.col(point_ts) <= F.col(end_col)))
        .drop("_bucket")
    )


def interval_overlap_join(left: DataFrame, right: DataFrame, key: str,
                          l_start: str, l_end: str,
                          r_start: str, r_end: str,
                          bucket_width: int) -> DataFrame:
    """Interval-interval overlap join ([l_start,l_end] intersects
    [r_start,r_end], inclusive) through the same bucketing trick; pairs
    spanning several shared buckets are deduplicated by crediting the
    match to the first shared bucket."""
    l = left.withColumn(
        "_b",
        F.explode(F.sequence(F.expr(f"{l_start} div {bucket_width}"),
                             F.expr(f"{l_end} div {bucket_width}"))),
    )
    r = right.withColumn(
        "_b",
        F.explode(F.sequence(F.expr(f"{r_start} div {bucket_width}"),
                             F.expr(f"{r_end} div {bucket_width}"))),
    )
    return (
        l.join(r, ["_b", key])
        .filter((F.col(l_start) <= F.col(r_end)) & (F.col(r_start) <= F.col(l_end)))
        # credit each overlapping pair to exactly one shared bucket: the
        # bucket of the later start (always shared when intervals overlap)
        .filter(F.col("_b") == F.expr(f"greatest({l_start}, {r_start}) div {bucket_width}"))
        .drop("_b")
    )
