"""Partition-shape helpers shared by CPU-heavy map operators.

A small input (one parquet file at fixture scale -> one split) would
run an expensive per-row map (MinHash, SimHash, hyperplane
fingerprints) single-threaded. ``widen`` repartitions up to the
cluster's default parallelism ONLY when the input has fewer
partitions — a no-op at real scale, where a 100 TB scan already
yields far more splits than cores, so no shuffle is added to the
production plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def widen(df: DataFrame) -> DataFrame:
    """Repartition up to defaultParallelism iff currently narrower."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
