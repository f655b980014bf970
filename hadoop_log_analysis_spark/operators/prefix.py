"""Exact prefix selection without a full-corpus window (r3).

Several report/curation queries select "rows in (class desc, id) rank
order until a weight budget is consumed" — Pareto heavy-hitters (50%
of events), token-budget corpus fill (25% of tokens). The passing set
is a PREFIX of the rank order and is closed under the class value: if
any row of class c passes, every row of a larger class passes. So the
running-sum window never needs the full input — a tiny per-class
histogram decides which classes can possibly reach the budget, and the
window runs over just those rows (prefix + one boundary class).

``prefix_weight_classes`` returns that kept-class set (|distinct
class| histogram rows in, <= that out); callers broadcast-join it back
and run their exact running-sum window on the survivors. Results are
hash-identical to the naive full-window plan (integer weights carry no
rounding). The histogram cumsum window is a single partition of
|distinct class| rows — bounded by the class domain (max events/user,
max doc length), not the corpus.

q_user_segments uses a sibling decomposition (histogram offsets as
rank bases, no filtering) that shares the shape but not the contract —
it stays inline there.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def prefix_weight_classes(
    rows: DataFrame, class_col: str, weight_col: str, frac: float
) -> DataFrame:
    """Class values whose rank-order weight prefix starts below
    ``frac`` x total weight (classes ranked descending).

    A class is kept iff the total weight of all STRICTLY LARGER
    classes is < frac * total — i.e. at least one of its rows can
    still be inside the budgeted prefix.
    """
    hist = rows.groupBy(class_col).agg(F.sum(weight_col).alias("__w"))
    histw = Window.orderBy(F.desc(class_col)).rowsBetween(
        Window.unboundedPreceding, -1
    )
    tot = rows.agg(F.sum(weight_col).alias("__tot"))
    return (
        hist.withColumn(
            "__before", F.coalesce(F.sum("__w").over(histw), F.lit(0))
        )
        .crossJoin(F.broadcast(tot))
        .filter(F.col("__before") < frac * F.col("__tot"))
        .select(class_col)
    )
