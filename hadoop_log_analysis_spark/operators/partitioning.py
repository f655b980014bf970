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


# Parquet decompresses to roughly 2-5x its on-disk size in memory;
# 4x is the conservative planning factor for the broadcast decision.
_DECOMPRESS_FACTOR = 4


def maybe_broadcast(df: DataFrame, est_bytes: int) -> DataFrame:
    """Size-aware broadcast hint: hint iff the side PROVABLY fits.

    A blanket ``F.broadcast(dim)`` on an SF-scaling side (supplier,
    part, customer) is fast at fixture scale and an OOM at 100 TB —
    the hint overrides the planner's size check. Dropping the hint
    entirely is scale-safe but costs AQE a runtime re-plan locally
    (the static product heuristic overestimates joined-dim outputs,
    so the first plan is an SMJ; measured +0.4 s on the 6-table join
    at sf0.1). This helper is the middle path the engine uses for
    every SF-scaling dimension: the caller passes the side's true
    on-disk size (sources.catalog.table_bytes) and the hint is
    applied only when est_bytes x 4 (decompression factor) fits the
    session's autoBroadcastJoinThreshold — so the fixture plan gets
    the immediate broadcast and a 100 TB plan degrades to a shuffled
    join by construction, not by luck.
    """
    from pyspark.sql import functions as F

    threshold = _parse_bytes(
        df.sparkSession.conf.get("spark.sql.autoBroadcastJoinThreshold")
    )
    # est_bytes < 0 means "size unknown" (object-store path, missing
    # file — see catalog.table_bytes): never hint on unknown size.
    if 0 <= est_bytes and threshold > 0 and est_bytes * _DECOMPRESS_FACTOR < threshold:
        return F.broadcast(df)
    return df


_SIZE_SUFFIXES = {
    "b": 1,
    "k": 1 << 10, "kb": 1 << 10,
    "m": 1 << 20, "mb": 1 << 20,
    "g": 1 << 30, "gb": 1 << 30,
    "t": 1 << 40, "tb": 1 << 40,
}


def _parse_bytes(conf_value: str) -> int:
    """Parse a Spark size conf ('10485760b', '10MB', '-1') to bytes."""
    s = conf_value.strip().lower()
    for suffix in sorted(_SIZE_SUFFIXES, key=len, reverse=True):
        if s.endswith(suffix):
            return int(s[: -len(suffix)]) * _SIZE_SUFFIXES[suffix]
    return int(s)
