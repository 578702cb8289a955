"""Round-trip and blob-source tests for the multi-format layer."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from operating_system_map_reduce_spark.sources.formats import (
    infer_format,
    read_any,
    read_binary_blobs,
    write_any,
)

SF = "/root/testdata/sf0.001"


def _nation(spark):
    return read_any(spark, f"{SF}/nation.parquet")


class TestRoundTrips:
    @pytest.mark.parametrize("fmt", ["parquet", "csv", "json"])
    def test_roundtrip(self, spark, tmp_path, fmt):
        src = _nation(spark)
        path = str(tmp_path / f"nation_rt.{fmt}")
        write_any(src, path)
        back = read_any(spark, path, schema=src.schema)
        assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))

    def test_partitioned_overwrite_is_dynamic(self, spark, tmp_path):
        src = _nation(spark)
        path = str(tmp_path / "nation_part.parquet")
        write_any(src, path, partition_by=["n_regionkey"])
        # overwrite ONE region's partition with a single row
        one = src.filter(F.col("n_regionkey") == 0).limit(1)
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        write_any(one, path, partition_by=["n_regionkey"])
        back = read_any(spark, path)
        n_r0 = back.filter(F.col("n_regionkey") == 0).count()
        n_rest = back.filter(F.col("n_regionkey") != 0).count()
        assert n_r0 == 1
        assert n_rest == src.filter(F.col("n_regionkey") != 0).count()

    def test_infer_format_errors_on_unknown(self):
        with pytest.raises(ValueError):
            infer_format("/data/blob.bin")


class TestBinaryBlobs:
    def test_reads_whole_files(self, spark):
        blobs = read_binary_blobs(spark, f"{SF}/*.parquet")
        rows = blobs.select("path", "length", F.length("content").alias("n")).collect()
        assert len(rows) >= 8  # every testdata table file
        for r in rows:
            assert r["length"] == r["n"] > 0

    def test_content_matches_disk(self, spark):
        row = (read_binary_blobs(spark, f"{SF}/nation.parquet")
               .select("content").collect()[0])
        with open(f"{SF}/nation.parquet", "rb") as fh:
            assert bytes(row["content"]) == fh.read()
