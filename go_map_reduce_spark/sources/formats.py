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

SUPPORTED = ("parquet", "json", "csv", "orc", "xml")


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
    elif fmt in ("json", "csv", "xml"):
        raise ValueError(f"{fmt} requires an explicit schema (no inference pass)")
    if fmt == "csv":
        options.setdefault("header", "true")
    if fmt == "xml":
        options.setdefault("rowTag", "row")
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
    if fmt == "xml":
        options.setdefault("rowTag", "row")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.options(**options).save(path)


def read_evolved_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Schema-evolution read: a table whose files were written under
    successive schema versions (columns added over time) reads as the
    UNION schema with nulls for columns absent in older files.
    `mergeSchema` costs one footer read per file at planning — at 100 TB
    pin the merged schema in a catalog instead and pass it explicitly;
    the per-file reconciliation (by name, not position) is the same."""
    return spark.read.option("mergeSchema", "true").parquet(path)


def read_json_with_corrupt_records(
    spark: SparkSession,
    path: str,
    schema: str,
    mode: str = "PERMISSIVE",
) -> DataFrame:
    """Dirty-ingest JSON read. PERMISSIVE (the 100 TB default) keeps bad
    rows, nulling fields and capturing the raw line in _corrupt_record
    for a quarantine sink; DROPMALFORMED silently drops them;
    FAILFAST aborts the job on the first bad record. The schema is
    explicit always (no inference pass over dirty data)."""
    full_schema = schema + ", _corrupt_record string"
    return (
        spark.read.schema(full_schema if mode == "PERMISSIVE" else schema)
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
