"""Salting utilities must be exactly equivalent to their unsalted forms."""

from __future__ import annotations

from pyspark.sql import functions as F

from operating_system_map_reduce_spark.operators.skew import (
    salted_agg_distinct,
    salted_join,
)

SF = "/root/testdata/sf0.001"


class TestSaltedAggDistinct:
    def test_matches_plain_count_distinct(self, spark):
        li = spark.read.parquet(f"{SF}/lineitem.parquet")
        got = {r["l_orderkey"]: r["n_distinct"]
               for r in salted_agg_distinct(li, "l_orderkey", "l_suppkey").collect()}
        want = {r["l_orderkey"]: r["n"]
                for r in li.groupBy("l_orderkey")
                .agg(F.countDistinct("l_suppkey").alias("n")).collect()}
        assert got == want

    def test_hot_key(self, spark):
        # one key carries 10k rows over 100 distinct values, another 1 row
        rows = [("hot", i % 100) for i in range(10_000)] + [("cold", 7)]
        df = spark.createDataFrame(rows, ["k", "v"])
        got = {r["k"]: r["n_distinct"]
               for r in salted_agg_distinct(df, "k", "v", n_salts=8).collect()}
        assert got == {"hot": 100, "cold": 1}


class TestSaltedJoin:
    def test_matches_plain_join_with_duplicates(self, spark):
        # duplicate keys on BOTH sides: multiplicity must be preserved
        probe = spark.createDataFrame(
            [(1, "a"), (1, "b"), (2, "c"), (2, "c"), (3, "d")], ["k", "pv"])
        build = spark.createDataFrame(
            [(1, "x"), (1, "y"), (2, "z")], ["k", "bv"])
        got = sorted((r["k"], r["pv"], r["bv"])
                     for r in salted_join(probe, build, "k", n_salts=4).collect())
        want = sorted((r["k"], r["pv"], r["bv"])
                      for r in probe.join(build, "k").collect())
        assert got == want
        assert len(got) == 6  # 2*2 + 2*1

    def test_on_testdata(self, spark):
        orders = spark.read.parquet(f"{SF}/orders.parquet").select(
            "o_orderkey", "o_custkey")
        cust = spark.read.parquet(f"{SF}/customer.parquet").select(
            F.col("c_custkey").alias("o_custkey"), "c_mktsegment")
        got = salted_join(orders, cust, "o_custkey", n_salts=8,
                          probe_salt_col="o_orderkey").count()
        want = orders.join(cust, "o_custkey").count()
        assert got == want
