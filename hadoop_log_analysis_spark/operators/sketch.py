"""Mergeable sketch operators (SURVEY.md §2.8 extensions).

``heavy_hitters`` — two-pass Misra-Gries frequent-items: the pattern
that finds high-frequency values at 100 TB WITHOUT shuffling the full
distinct-value set. Pass 1 keeps a bounded k-counter summary per
partition (classic Misra-Gries decrement rule, Arrow-batched); the
union of partition summaries is a guaranteed SUPERSET of every item
with global frequency > n/(k+1) (pigeonhole over the per-partition
guarantee: an item below the summary bar in EVERY partition is below
the global bar). Pass 2 broadcast-semi-joins the tiny candidate set
back onto the stream and recounts exactly.

Shuffle accounting: pass 1 emits <= k rows per partition (vs the full
per-partition distinct-value set a plain groupBy shuffles); pass 2's
exact recount aggregates only candidate rows. The final answer is
EXACT — the sketch only prunes, so the operator is fully
DuckDB-oracle-able (plain GROUP BY ... HAVING).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

if TYPE_CHECKING:
    import pandas as pd

_CAND_SCHEMA = T.StructType(
    [
        T.StructField("item", T.StringType()),
        T.StructField("lower_bound", T.LongType()),
    ]
)


def _mg_candidates(items: DataFrame, item_col: str, k: int) -> DataFrame:
    """Pass 1: per-partition Misra-Gries summaries of size <= k.
    Emits (item, lower_bound) candidate rows — at most k per
    partition, regardless of partition cardinality.

    Vectorized via the MERGEABLE-summaries formulation (Agarwal,
    Cormode, Huang, Phillips, Wei, Yi, PODS'12): each Arrow batch's
    exact ``value_counts`` is itself a (trivial) MG summary, and two
    MG summaries merge by adding counts then subtracting the
    (k+1)-largest count from everything and dropping non-positives —
    the merged error stays <= n_p/(k+1), so the superset guarantee is
    the classic one while the per-row work happens in C
    (value_counts), not a Python loop — the difference between a
    sketch that helps at 100 TB and one that IS the bottleneck."""

    def summarize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        counters: dict[str, int] = {}
        for pdf in batches:
            for item, c in pdf[item_col].value_counts().items():
                counters[item] = counters.get(item, 0) + int(c)
            if len(counters) > k:
                sub = sorted(counters.values(), reverse=True)[k]
                counters = {
                    i: v - sub for i, v in counters.items() if v > sub
                }
        yield pd.DataFrame(
            {"item": list(counters), "lower_bound": list(counters.values())}
        )

    return items.select(F.col(item_col).cast("string").alias(item_col)).mapInPandas(
        summarize, _CAND_SCHEMA
    )


def heavy_hitters(
    items: DataFrame, item_col: str, k: int = 256
) -> DataFrame:
    """Exact frequent items with frequency > n/(k+1), found via the
    two-pass Misra-Gries candidate-prune-recount plan (module
    docstring). Returns (item, n) — exact counts, descending."""
    candidates = _mg_candidates(items, item_col, k).select("item").distinct()
    total = items.count()  # single scalar action for the threshold
    threshold = total // (k + 1)
    recount = (
        items.select(F.col(item_col).cast("string").alias("item"))
        .join(F.broadcast(candidates), "item", "left_semi")
        .groupBy("item")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > threshold)
    )
    return recount.orderBy(F.desc("n"), "item")
