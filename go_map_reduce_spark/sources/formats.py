"""Columnar / delimited format round-trips (SURVEY.md §2c scans row).

The engine's native storage is parquet (what the driver tables use);
csv and json cover interchange. Explicit schemas everywhere — schema
inference is a full extra pass over the data and is nondeterministic
under dirty input, so it has no place in a 100 TB pipeline.

Lakehouse formats (Delta/Iceberg/Hudi) need jars absent from this
environment; `write_table`'s format hook is where they slot in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

SUPPORTED = ("parquet", "json", "csv", "orc")


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: StructType | str | None = None,
    **options: str,
) -> DataFrame:
    if fmt not in SUPPORTED:
        raise ValueError(f"unsupported format {fmt!r}; one of {SUPPORTED}")
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt in ("json", "csv"):
        raise ValueError(f"{fmt} requires an explicit schema (no inference pass)")
    if fmt == "csv":
        options.setdefault("header", "true")
    return reader.options(**options).load(path)


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    **options: str,
) -> None:
    if fmt not in SUPPORTED:
        raise ValueError(f"unsupported format {fmt!r}; one of {SUPPORTED}")
    writer = df.write.format(fmt).mode(mode)
    if fmt == "csv":
        options.setdefault("header", "true")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.options(**options).save(path)
