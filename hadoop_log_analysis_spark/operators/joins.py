"""Join operators Spark lacks natively (SURVEY.md §2.3 J7).

``asof_join`` — for each left row, attach the payload of the latest
right row with ``right.ts <= left.ts`` (optionally per equality key).
Spark has no ASOF JOIN operator; a naive implementation range-joins
all candidates then ranks (O(candidates) shuffle). This one uses the
union + ordered-window + last(ignorenulls) formulation instead:

  union(left, right) -> window over (by, ts, is_left) -> carry last
  non-null right payload forward -> keep left rows

which is a single shuffle of |L|+|R| rows and streams through the
window operator — the same merge-scan shape dedicated engines use.

Scale note (100 TB): with ``by`` keys the window partitions by key and
parallelizes fully (skewed keys: AQE handles the shuffle; the window
itself is per-key sequential, as asof semantics require). Without
``by`` the window is a single ordered partition — correct but serial;
for a keyless asof at scale, range-partition on ts and carry the last
right row across partition boundaries (documented future operator).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_MARK = "__asof_right_ts"
_SRC = "__asof_is_left"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str,
    by: Sequence[str] = (),
    payload: Sequence[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """As-of join: latest right row with ``right[ts_col] <= left[ts_col]``.

    Both sides must share ``ts_col`` (and ``by``) names; ``payload``
    columns (default: all non-key right columns) must not collide with
    left columns. ``how`` is 'inner' (drop unmatched left rows) or
    'left' (keep them with null payload).
    """
    by = list(by)
    if payload is None:
        payload = [c for c in right.columns if c not in {*by, ts_col}]
    payload = list(payload)
    left_cols = list(left.columns)

    l_side = left.withColumn(_SRC, F.lit(1)).withColumn(
        _MARK, F.lit(None).cast("long")
    )
    for p in payload:
        l_side = l_side.withColumn(p, F.lit(None).cast(right.schema[p].dataType))

    r_side = right.select(*by, ts_col, *payload).withColumn(_SRC, F.lit(0)).withColumn(
        _MARK, F.col(ts_col).cast("long")
    )
    for c in left_cols:
        if c not in {*by, ts_col}:
            r_side = r_side.withColumn(c, F.lit(None).cast(left.schema[c].dataType))

    ordered_cols = l_side.columns
    unioned = l_side.unionByName(r_side.select(*ordered_cols))

    # Right rows sort BEFORE left rows at equal ts (asof is <=).
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(ts_col).asc(), F.col(_SRC).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned
    for p in payload:
        carried = carried.withColumn(p, F.last(p, ignorenulls=True).over(w))
    carried = carried.withColumn(_MARK, F.last(_MARK, ignorenulls=True).over(w))

    out = carried.filter(F.col(_SRC) == 1)
    if how == "inner":
        out = out.filter(F.col(_MARK).isNotNull())
    elif how != "left":
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    return out.select(*left_cols, *payload)
