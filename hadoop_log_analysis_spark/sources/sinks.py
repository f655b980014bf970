"""Sinks (SURVEY.md §2.1 S6): partitioned parquet writes.

``write_partitioned`` lays data out hive-style (`col=value/` dirs) so
downstream reads get static + dynamic partition pruning for free —
at 100 TB, date/event_type partitioning turns full scans into
directory lookups. Writers coalesce nothing: one file per task keeps
the write parallel; compaction is a separate concern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def read_back(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """Read a parquet sink back. Pass the writer's ``schema`` when the
    sink can be legitimately EMPTY (an off-day partition, a filtered
    batch): parquet schema inference needs at least one footer, so a
    schemaless read of an empty sink throws UNABLE_TO_INFER_SCHEMA —
    an explicit schema makes empty a normal result, which is the
    at-scale contract (daily jobs must not crash on quiet days)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(path)
