"""Window-composed operators (SURVEY.md §2.5 W2/W6).

``topk_per_group`` — per-group top-k with a mandatory deterministic
tie-break. Spark has no per-group top-k pushdown (§4); the
row_number + filter formulation is the standard plan: one shuffle on
the group keys, window streams each group, filter drops rank > k
before anything else materializes.

``sessionize`` — 30-min-gap-style sessionization: lag -> gap flag ->
running sum as session id. One shuffle on the entity key; everything
after is a streaming pass per key. Integer nanosecond timestamps keep
it exactly reproducible (no float/µs-truncation ambiguity).

Scale note: both shuffle once on the group/entity key and never
materialize a group in memory (window operators spill); skewed
entities are the only hazard — mitigate upstream with salting if one
key dominates.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def topk_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Top-k rows per group; ``order_cols`` MUST include a unique
    tie-break column for deterministic output."""
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def sessionize(
    events: DataFrame,
    gap: int,
    entity_col: str = "user_id",
    ts_col: str = "ts_ns",
) -> DataFrame:
    """Assign gap-based session ids: a new session starts when the gap
    to the previous event of the same entity exceeds ``gap`` (in the
    integer unit of ``ts_col``).

    Returns the input plus a ``sid`` column (1-based per entity).
    """
    w = Window.partitionBy(entity_col).orderBy(ts_col)
    run = Window.partitionBy(entity_col).orderBy(ts_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    prev = F.lag(ts_col).over(w)
    brk = F.when(prev.isNull() | ((F.col(ts_col) - prev) > gap), 1).otherwise(0)
    return events.withColumn("__brk", brk).withColumn(
        "sid", F.sum("__brk").over(run)
    ).drop("__brk")
