"""Multi-format sources and sinks.

The reference's only persistence is a proprietary binary changelog plus
whole-file blobs (p3/server/format.h, p1/common/file.h) -- re-expressed
in sources/changelog.py.  A usable engine also speaks the standard
lake formats; this module is the thin, uniform layer over Spark's
readers/writers so every entry point keeps Catalyst pushdown:

 - parquet/csv/json read with explicit schema support (schema-on-read
   for csv/json; never infer in production paths -- inference scans the
   data twice and can drift between runs);
 - partitioned, overwrite-safe sinks (dynamic partition overwrite so a
   re-run replaces only touched partitions -- the 100 TB-friendly way);
 - ``binaryFile`` for opaque blobs (the profile/.so-blob analogue:
   whole files as (path, modificationTime, length, content) rows).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

_EXT_FORMAT = {
    ".parquet": "parquet",
    ".csv": "csv",
    ".json": "json",
    ".jsonl": "json",
}

CSV_DEFAULTS = {"header": "true", "escape": '"'}


def infer_format(path: str) -> str:
    ext = os.path.splitext(path.rstrip("/"))[1].lower()
    try:
        return _EXT_FORMAT[ext]
    except KeyError:
        raise ValueError(f"cannot infer format from {path!r}; pass fmt=") from None


def read_any(spark: SparkSession, path: str, fmt: str | None = None,
             schema: StructType | None = None, **options: str) -> DataFrame:
    fmt = fmt or infer_format(path)
    reader = spark.read.format(fmt)
    if fmt == "csv":
        reader = reader.options(**{**CSV_DEFAULTS, **options})
    elif options:
        reader = reader.options(**options)
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt in ("csv", "json"):
        # explicit opt-in to the double-scan; fine for tests/small files
        reader = reader.option("inferSchema", "true")
    return reader.load(path)


def write_any(df: DataFrame, path: str, fmt: str | None = None,
              mode: str = "overwrite", partition_by: list[str] | None = None,
              **options: str) -> None:
    fmt = fmt or infer_format(path)
    writer = df.write.format(fmt).mode(mode)
    if fmt == "csv":
        writer = writer.options(**{**CSV_DEFAULTS, **options})
    elif options:
        writer = writer.options(**options)
    if partition_by:
        # replace only the partitions present in df on overwrite
        writer = (writer.option("partitionOverwriteMode", "dynamic")
                  .partitionBy(*partition_by))
    writer.save(path)


def read_binary_blobs(spark: SparkSession, path_glob: str,
                      recursive: bool = False) -> DataFrame:
    """Whole files as rows -- the profile-content / .so-blob analogue
    (reference caps: LEN_PROFILE_FILE 1 MB, LEN_SO 16 MB; at scale,
    spark.sql.files.maxPartitionBytes still governs task sizing because
    binaryFile packs small files per task)."""
    return (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", str(recursive).lower())
        .load(path_glob)
    )
