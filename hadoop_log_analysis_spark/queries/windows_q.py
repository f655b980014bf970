"""Window-function operators W1-W6 (SURVEY.md §2.5).

All window orderings carry a unique tie-break column (event_id) so
output is deterministic and hash-comparable (FIXTURES.md rule 2).
Time arithmetic uses integer MICROsecond epochs on both sides
(functions.ts_us vs DuckDB epoch_us) — DuckDB truncates the fixtures'
ns timestamps to µs on read, so µs is the exact common unit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_log_analysis_spark.functions import money, money_sum, ts_us
from hadoop_log_analysis_spark.operators.windows import (
    sessionize,
    sessionize_auto,
    sessionize_split,
    topk_per_group,
)
from hadoop_log_analysis_spark.queries import query
from hadoop_log_analysis_spark.sources.catalog import scan

_MIN30_US = 30 * 60 * 1_000_000
_HOUR_US = 3_600_000_000


@query(
    "q_window_rank",
    oracle="""
        SELECT user_id, event_id, value, rn FROM (
            SELECT user_id, event_id, value,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY value DESC, event_id) AS rn
            FROM events)
        WHERE rn <= 3
        ORDER BY user_id, rn
    """,
    tags=("W1", "W2"),
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: top-3 events by value per user via operators.windows.topk_per_group."""
    ev = scan(spark, sf_dir, "events").select("user_id", "event_id", "value")
    return topk_per_group(
        ev, ["user_id"], [F.col("value").desc(), F.col("event_id")], k=3
    ).orderBy("user_id", "rn")


@query(
    "q_rank_variants",
    oracle="""
        SELECT user_id, event_id,
               rank() OVER w AS rnk,
               dense_rank() OVER w AS drnk,
               ntile(4) OVER w AS quartile
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY value DESC, event_id)
        ORDER BY user_id, event_id
    """,
    tags=("W1",),
)
def q_rank_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: rank / dense_rank / ntile over a per-user value ordering."""
    ev = scan(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("value").desc(), F.col("event_id"))
    return (
        ev.select(
            "user_id",
            "event_id",
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.ntile(4).over(w).alias("quartile"),
        )
        .orderBy("user_id", "event_id")
    )


@query(
    "q_lag_lead",
    oracle="""
        SELECT user_id, event_id,
               coalesce(epoch_us(ts) - lag(epoch_us(ts)) OVER w, -1) AS gap_us,
               coalesce(lead(event_type) OVER w, 'NONE') AS next_type
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        ORDER BY user_id, event_id
    """,
    tags=("W3",),
)
def q_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3: lag/lead — inter-event gaps and next event type per user
    (nulls coalesced to sentinels so both engines emit non-null ints)."""
    ev = scan(spark, sf_dir, "events").withColumn("tus", ts_us())
    w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    return (
        ev.select(
            "user_id",
            "event_id",
            F.coalesce(F.col("tus") - F.lag("tus").over(w), F.lit(-1)).alias("gap_us"),
            F.coalesce(F.lead("event_type").over(w), F.lit("NONE")).alias("next_type"),
        )
        .orderBy("user_id", "event_id")
    )


@query(
    "q_running_aggs",
    oracle="""
        SELECT user_id, event_id,
               CAST(sum(CAST(value AS DECIMAL(18,2)))
                    OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                          ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cum_value,
               CAST(sum(CAST(value AS DECIMAL(18,2)))
                    OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                          ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS DOUBLE)
                 / count(value)
                    OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                          ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS ma5,
               CAST(sum(CAST(value AS DECIMAL(18,2)))
                    OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                          RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
                    AS DOUBLE) AS sum_1h
        FROM events
        ORDER BY user_id, event_id
    """,
    tags=("W4",),
)
def q_running_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4: running cumulative sum, 5-row moving average, and a 1-hour
    RANGE frame over integer-microsecond time."""
    ev = scan(spark, sf_dir, "events").withColumn("tus", ts_us())
    w_rows = Window.partitionBy("user_id").orderBy("tus", "event_id")
    w_cum = w_rows.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_ma5 = w_rows.rowsBetween(-4, Window.currentRow)
    w_1h = (
        Window.partitionBy("user_id")
        .orderBy("tus")
        .rangeBetween(-_HOUR_US, Window.currentRow)
    )
    return (
        ev.select(
            "user_id",
            "event_id",
            # exact DECIMAL window sums: DuckDB's segment-tree window
            # aggregation associates float additions differently from
            # Spark's running accumulation, so a rounded double window
            # sum can flip a boundary; decimal sums are order-free.
            F.sum(money("value")).over(w_cum).cast("double").alias("cum_value"),
            (
                F.sum(money("value")).over(w_ma5).cast("double")
                / F.count("value").over(w_ma5)
            ).alias("ma5"),
            F.sum(money("value")).over(w_1h).cast("double").alias("sum_1h"),
        )
        .orderBy("user_id", "event_id")
    )


@query(
    "q_first_last",
    oracle="""
        SELECT user_id,
               max(CASE WHEN rn = 1 THEN event_id END) AS first_event,
               max(CASE WHEN rnd = 1 THEN event_id END) AS last_event,
               max(CASE WHEN rnd = 1 THEN event_type END) AS last_type
        FROM (SELECT user_id, event_id, event_type,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY epoch_us(ts), event_id) AS rn,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY epoch_us(ts) DESC, event_id DESC) AS rnd
              FROM events)
        GROUP BY user_id
        ORDER BY user_id
    """,
    tags=("W5",),
)
def q_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5: first/last event per user (deterministic via ranked windows)."""
    ev = scan(spark, sf_dir, "events").withColumn("tus", ts_us())
    w_asc = Window.partitionBy("user_id").orderBy("tus", "event_id")
    w_desc = Window.partitionBy("user_id").orderBy(
        F.col("tus").desc(), F.col("event_id").desc()
    )
    ranked = ev.select(
        "user_id",
        "event_id",
        "event_type",
        F.row_number().over(w_asc).alias("rn"),
        F.row_number().over(w_desc).alias("rnd"),
    )
    return (
        ranked.groupBy("user_id")
        .agg(
            F.max(F.when(F.col("rn") == 1, F.col("event_id"))).alias("first_event"),
            F.max(F.when(F.col("rnd") == 1, F.col("event_id"))).alias("last_event"),
            F.max(F.when(F.col("rnd") == 1, F.col("event_type"))).alias("last_type"),
        )
        .orderBy("user_id")
    )


@query(
    "q_sessionize",
    oracle="""
        WITH g AS (
            SELECT user_id, epoch_us(ts) AS tus,
                   CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                          OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                        THEN 1 ELSE 0 END AS brk
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts))
        ), s AS (
            SELECT user_id, tus,
                   CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY tus
                                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
            FROM g
        )
        SELECT user_id, sid, count(*) AS n, max(tus) - min(tus) AS dur_us
        FROM s
        GROUP BY user_id, sid
        ORDER BY user_id, sid
    """,
    tags=("W6", "W3", "W4"),
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W6: batch sessionization — 30-minute-gap sessions per user via
    operators.windows.sessionize; session row counts and durations."""
    ev = scan(spark, sf_dir, "events").select("user_id", ts_us().alias("tus"))
    sessions = sessionize(ev, gap=_MIN30_US, ts_col="tus")
    return (
        sessions.groupBy("user_id", "sid")
        .agg(
            F.count("*").alias("n"),
            (F.max("tus") - F.min("tus")).alias("dur_us"),
        )
        .orderBy("user_id", "sid")
    )


_DAY_US = 86_400_000_000


@query(
    "q_sessionize_split",
    oracle="""
        WITH g AS (
            SELECT user_id, epoch_us(ts) AS tus,
                   CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                          OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                        THEN 1 ELSE 0 END AS brk
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts))
        ), s AS (
            SELECT user_id, tus,
                   CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY tus
                                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
            FROM g
        )
        SELECT user_id, sid, count(*) AS n, max(tus) - min(tus) AS dur_us
        FROM s
        GROUP BY user_id, sid
        ORDER BY user_id, sid
    """,
    tags=("W6", "W4", "skew"),
)
def q_sessionize_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W6, skew-resilient plan: the SAME sessionization answer as
    q_sessionize (the oracle SQL is byte-identical — the defense must
    be output-invisible) computed via operators.windows.sessionize_split
    with one-day time slices, so a hot user's events are range-split
    across window tasks instead of flooding one (the r11 skew probe's
    residual class: 7.2x shuffle-byte straggler that AQE cannot split;
    SCALE.md "skew probe" records this plan cutting it to ~1x).
    """
    ev = scan(spark, sf_dir, "events").select("user_id", ts_us().alias("tus"))
    sessions = sessionize_split(ev, gap=_MIN30_US, span=_DAY_US, ts_col="tus")
    return (
        sessions.groupBy("user_id", "sid")
        .agg(
            F.count("*").alias("n"),
            (F.max("tus") - F.min("tus")).alias("dur_us"),
        )
        .orderBy("user_id", "sid")
    )


@query(
    "q_sessionize_auto",
    oracle="""
        WITH g AS (
            SELECT user_id, epoch_us(ts) AS tus,
                   CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                          OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                        THEN 1 ELSE 0 END AS brk
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts))
        ), s AS (
            SELECT user_id, tus,
                   CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY tus
                                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
            FROM g
        )
        SELECT user_id, sid, count(*) AS n, max(tus) - min(tus) AS dur_us
        FROM s
        GROUP BY user_id, sid
        ORDER BY user_id, sid
    """,
    tags=("W6", "W4", "skew"),
)
def q_sessionize_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W6, measure-then-choose plan (r12): the SAME sessionization
    answer as q_sessionize/q_sessionize_split (byte-identical oracle
    SQL — whichever plan the key-share probe selects must be
    output-invisible), via operators.windows.sessionize_auto: one
    skew-immune algebraic pass measures the hottest user's row share
    and range-splits exactly when it rivals a shuffle partition
    (plain on the uniform fixtures; split on the skew probes —
    property-tested both ways). NOTE (ADVICE r12): the self-probing
    default makes this function EAGER — building the DataFrame runs
    the probe's scan+aggregate job before any action on the result;
    pipelines holding an upstream key-share statistic pass
    ``top_share=`` to stay lazy and skip the probe shuffle entirely
    (tests/test_properties.py pins that no job runs)."""
    ev = scan(spark, sf_dir, "events").select("user_id", ts_us().alias("tus"))
    sessions, _plan = sessionize_auto(
        ev, gap=_MIN30_US, span=_DAY_US, ts_col="tus"
    )
    return (
        sessions.groupBy("user_id", "sid")
        .agg(
            F.count("*").alias("n"),
            (F.max("tus") - F.min("tus")).alias("dur_us"),
        )
        .orderBy("user_id", "sid")
    )


@query(
    "q_session_window_native",
    oracle="""
        WITH g AS (
            SELECT user_id, epoch_us(ts) AS tus, value,
                   CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                          OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 1800000000
                        THEN 1 ELSE 0 END AS brk
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts))
        ), s AS (
            SELECT user_id, tus, value,
                   sum(brk) OVER (PARTITION BY user_id ORDER BY tus
                                  ROWS UNBOUNDED PRECEDING) AS sid
            FROM g
        )
        SELECT user_id, min(tus) AS start_us, count(*) AS n,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM s
        GROUP BY user_id, sid
        ORDER BY user_id, start_us
    """,
    tags=("W6", "T3"),
)
def q_session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W6 via the NATIVE ``session_window`` group expression — the
    declarative twin of the composed lag/flag/running-sum sessionizer
    (q_sessionize) and the exact batch analog of streaming T3.

    One hash aggregate with session-merge semantics handled by the
    engine (gap-merging in the agg, not a window sort pass). Sessions
    are half-open [start, last+30 min): an event exactly at the close
    boundary starts a NEW session, hence the >= gap break in the
    oracle. At scale this is one shuffle on user_id with partial
    session merge map-side.
    """
    ev = scan(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "user_id", F.session_window("ts", "30 minutes").alias("w")
        )
        .agg(F.count("*").alias("n"), money_sum("value").alias("total"))
        .select(
            "user_id",
            F.unix_micros(F.col("w.start").cast("timestamp")).alias("start_us"),
            "n",
            "total",
        )
        .orderBy("user_id", "start_us")
    )


@query(
    "q_locf_fill",
    oracle="""
        WITH o AS (
          SELECT event_type,
                 last_value(CASE WHEN event_type = 'purchase'
                                 THEN value END IGNORE NULLS)
                   OVER (PARTITION BY user_id
                         ORDER BY epoch_us(ts), event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS carried
          FROM events)
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n,
               CAST(count(carried) AS BIGINT) AS n_carried,
               CAST(sum(CAST(carried AS DECIMAL(18,2))) AS DOUBLE)
                 AS s_carried
        FROM o
        GROUP BY event_type
        ORDER BY event_type
    """,
    tags=("W5", "W4", "timeseries"),
)
def q_locf_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5 IGNORE NULLS navigation — LOCF (last observation carried
    forward): every event carries the user's most recent purchase
    value via ``last_value(sparse) IGNORE NULLS`` over an ordered
    per-user frame, the canonical ragged-series fill idiom (sensor
    gaps, sparse prices, intermittent metrics). Report aggregates per
    event type: rows, rows with a carried value, carried mass.

    This is the WINDOW-NAVIGATION expression of the same semantics
    the as-of join (q_asof_by_user) computes by join — the two
    surfaces must and do agree. Plan: one window partitioned by user
    (parallel across users, state = one scalar per frame) + a hash
    agg; the (ts, event_id) ordering makes the carry deterministic
    under same-microsecond ties, per the repo's tie-break contract.
    """
    ev = scan(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(ts_us(), F.col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sparse = F.when(F.col("event_type") == "purchase", F.col("value"))
    return (
        ev.select(
            "event_type",
            F.last(sparse, ignorenulls=True).over(w).alias("carried"),
        )
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.count("carried").alias("n_carried"),
            money_sum("carried").alias("s_carried"),
        )
        .orderBy("event_type")
    )


@query(
    "q_window_count_distinct",
    oracle="""
        SELECT event_id,
               count(DISTINCT event_type) OVER (
                   PARTITION BY user_id ORDER BY epoch_us(ts)
                   RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
               ) AS n_types_1h
        FROM events
        ORDER BY event_id
    """,
    tags=("W4", "A3"),
)
def q_window_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4xA3: per-event count of DISTINCT event types the same user
    produced in the trailing hour (event inclusive) — the behavioral
    breadth feature a fraud / engagement model reads at each event.

    Spark has no DISTINCT window aggregate (DuckDB does — the oracle
    uses it directly); the engine expresses it as
    size(collect_set(...)) over a µs RANGE frame, which partial-
    aggregates the set per frame JVM-side. RANGE mode pins tie
    semantics on both engines: all peers at the current µs are in
    frame, so same-instant events see each other symmetrically and the
    per-event_id output is deterministic without a tie-break column.

    Scale shape: partitioned by user_id (high cardinality — this is
    the scale-SAFE orientation; partitioning by the handful of event
    types would recreate the single-partition window class
    sessionize_split exists for). Set state per frame is bounded by
    |event types|, a small constant, so the running collect_set never
    grows past it.
    """
    ev = scan(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(ts_us())
        .rangeBetween(-_HOUR_US, 0)
    )
    return (
        ev.select(
            "event_id",
            F.size(F.collect_set("event_type").over(w))
            .cast("long")
            .alias("n_types_1h"),
        ).orderBy("event_id")
    )
