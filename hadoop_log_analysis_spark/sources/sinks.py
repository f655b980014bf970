"""Sinks (SURVEY.md §2.1 S6): partitioned parquet writes.

``write_partitioned`` lays data out hive-style (`col=value/` dirs) so
downstream reads get static + dynamic partition pruning for free —
at 100 TB, date/event_type partitioning turns full scans into
directory lookups. Writers coalesce nothing: one file per task keeps
the write parallel; compaction is a separate concern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def read_back(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
