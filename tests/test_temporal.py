"""Edge-semantics tests for the as-of and range join operators.

Tiny hand-built frames so every boundary case (equal timestamps,
tolerance cut-off, interval straddling bucket edges, multi-bucket
overlap dedup) is asserted explicitly; the oracle-parity suite covers
them at data scale.
"""

from __future__ import annotations

from operating_system_map_reduce_spark.operators.temporal import (
    asof_join,
    interval_overlap_join,
    range_join_binned,
)


def _asof(spark, left_rows, right_rows, tolerance=None):
    left = spark.createDataFrame(left_rows, ["lid", "k", "lts"])
    right = spark.createDataFrame(right_rows, ["rid", "k", "rts"])
    out = asof_join(left, right, key="k", left_ts="lts", right_ts="rts",
                    right_cols=["rid", "rts"], tie_col="rid",
                    tolerance=tolerance)
    return {r["lid"]: (r["rid"], r["rts"]) for r in out.collect()}


class TestAsofJoin:
    def test_picks_latest_at_or_before(self, spark):
        got = _asof(
            spark,
            [(1, "u", 100), (2, "u", 250)],
            [(10, "u", 50), (11, "u", 100), (12, "u", 200), (13, "u", 300)],
        )
        assert got[1] == (11, 100)   # equal ts is included (<=)
        assert got[2] == (12, 200)

    def test_tie_on_ts_breaks_by_greatest_tiebreak(self, spark):
        got = _asof(spark, [(1, "u", 100)], [(10, "u", 100), (12, "u", 100), (11, "u", 100)])
        assert got[1] == (12, 100)

    def test_no_prior_row_yields_null_outer(self, spark):
        got = _asof(spark, [(1, "u", 100)], [(10, "u", 101)])
        assert got[1] == (None, None)

    def test_keys_do_not_leak(self, spark):
        got = _asof(spark, [(1, "a", 100)], [(10, "b", 50)])
        assert got[1] == (None, None)

    def test_tolerance_nulls_stale_match(self, spark):
        got = _asof(spark, [(1, "u", 100), (2, "u", 100)],
                    [(10, "u", 10)], tolerance=50)
        assert got[1] == (None, None)
        got = _asof(spark, [(1, "u", 100)], [(10, "u", 50)], tolerance=50)
        assert got[1] == (10, 50)    # exactly at the tolerance edge: kept


class TestRangeJoinBinned:
    def test_inclusive_bounds_and_cross_bucket(self, spark):
        pts = spark.createDataFrame(
            [(1, "u", 100), (2, "u", 150), (3, "u", 249), (4, "u", 250), (5, "u", 99)],
            ["pid", "k", "ts"])
        ivs = spark.createDataFrame([(7, "u", 100, 249)], ["iid", "k", "s", "e"])
        out = range_join_binned(pts, ivs, key="k", point_ts="ts",
                                start_col="s", end_col="e", bucket_width=100)
        assert sorted(r["pid"] for r in out.collect()) == [1, 2, 3]

    def test_each_pair_emitted_once(self, spark):
        # interval spans 5 buckets; the matching point still appears once
        pts = spark.createDataFrame([(1, "u", 250)], ["pid", "k", "ts"])
        ivs = spark.createDataFrame([(7, "u", 0, 499)], ["iid", "k", "s", "e"])
        out = range_join_binned(pts, ivs, key="k", point_ts="ts",
                                start_col="s", end_col="e", bucket_width=100)
        assert out.count() == 1


class TestIntervalOverlapJoin:
    def test_overlap_dedup_across_buckets(self, spark):
        left = spark.createDataFrame([(1, "u", 50, 450)], ["lid", "k", "ls", "le"])
        right = spark.createDataFrame(
            [(7, "u", 100, 400),    # contained, spans buckets 1-4
             (8, "u", 440, 500),    # tail overlap
             (9, "u", 451, 600)],   # disjoint (starts after le)
            ["rid", "k", "rs", "re"])
        out = interval_overlap_join(left, right, key="k",
                                    l_start="ls", l_end="le",
                                    r_start="rs", r_end="re", bucket_width=100)
        rows = [(r["lid"], r["rid"]) for r in out.collect()]
        assert sorted(rows) == [(1, 7), (1, 8)]
