"""Aggregation operators A1-A8 (SURVEY.md §2.4).

Spark's HashAggregate automatically does partial (map-side) + final
aggregation — the hand-written MapReduce combiner idiom, for free.
At 100 TB the partial agg collapses each scan partition to ~|groups|
rows before the shuffle, so these queries shuffle kilobytes, not
terabytes. Money sums are EXACT DECIMAL end-to-end (functions.money
— double sums flip display boundaries with accumulation order, the
fragility the sf0.1 sweep falsified); float-term sums use the
per-row-grid exact_sum recipe; single divisions of exact operands
need no rounding at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_log_analysis_spark.functions import (
    dec_sum_double,
    exact_avg_wide,
    exact_comoment,
    money,
    money_sum,
    pin,
    rate,
    sql_pin,
)
from hadoop_log_analysis_spark.queries import query
from hadoop_log_analysis_spark.operators.partitioning import maybe_broadcast
from hadoop_log_analysis_spark.sources.catalog import scan, table_bytes


@query(
    "q_pricing_summary",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                 AS sum_qty,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS sum_base,
               CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                             * (1 - CAST(l_discount AS DECIMAL(5,2)))
                             * 10000 AS HUGEINT)) AS DOUBLE) / 10000.0
                 AS sum_disc,
               CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                             * (1 - CAST(l_discount AS DECIMAL(5,2)))
                             * (1 + CAST(l_tax AS DECIMAL(5,2)))
                             * 1000000 AS HUGEINT)) AS DOUBLE) / 1000000.0
                 AS sum_charge,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                 / count(*) AS avg_qty,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                 / count(*) AS avg_price,
               CAST(sum(CAST(l_discount AS DECIMAL(5,2))) AS DOUBLE)
                 / count(*) AS avg_disc,
               count(*) AS cnt
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    tags=("A1", "P2", "F2", "O1"),
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: TPC-H Q1-shaped grouped aggregate (the canonical batch rollup).

    Money arithmetic is exact DECIMAL end-to-end (functions.money —
    the q_hhi precedent): double sums can land within an ulp of a
    display boundary and flip with accumulation order. The avgs are
    ONE double division of the exact decimal sum by the count —
    identical operands on both engines, so no display rounding is
    needed anywhere.

    sum_disc/sum_charge (4-/6-dp decimal sums) emit through
    functions.dec_sum_double: their integer significands cross 2^53
    first (sum_charge did at the sf1 probe — 2.79e16 — where Spark's
    correctly-rounded decimal->double cast and DuckDB's
    significand-then-divide cast disagree by 1 ulp). The 2-dp
    money_sum emissions keep the direct cast: their significands reach
    2^53 only around sf~300 (SCALE.md "sf1 scale probe").
    """
    li = scan(spark, sf_dir, "lineitem")
    one = F.lit(1).cast("decimal(5,2)")
    disc_price = money("l_extendedprice") * (one - rate("l_discount"))
    charge = disc_price * (one + rate("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            money_sum("l_quantity").alias("sum_qty"),
            money_sum("l_extendedprice").alias("sum_base"),
            dec_sum_double(disc_price, 4).alias("sum_disc"),
            dec_sum_double(charge, 6).alias("sum_charge"),
            (money_sum("l_quantity") / F.count("*")).alias("avg_qty"),
            (money_sum("l_extendedprice") / F.count("*")).alias("avg_price"),
            (F.sum(rate("l_discount")).cast("double") / F.count("*")).alias(
                "avg_disc"
            ),
            F.count("*").alias("cnt"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "q_global_agg",
    oracle="""
        SELECT count(*) AS n,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS total,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 / count(*) AS avg_price,
               min(o_totalprice) AS min_price,
               max(o_totalprice) AS max_price
        FROM orders
    """,
    tags=("A2",),
)
def q_global_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: global (keyless) aggregate."""
    orders = scan(spark, sf_dir, "orders")
    return orders.agg(
        F.count("*").alias("n"),
        money_sum("o_totalprice").alias("total"),
        # ONE double division of the exact decimal sum — identical
        # operands on both engines; min/max are order-free over
        # identical per-row doubles, so neither needs rounding
        (money_sum("o_totalprice") / F.count("*")).alias("avg_price"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
    )


@query(
    "q_distinct_users_daily",
    oracle="""
        SELECT date_trunc('day', ts) AS d, count(DISTINCT user_id) AS u
        FROM events
        GROUP BY d
        ORDER BY d
    """,
    tags=("A3", "F2"),
)
def q_distinct_users_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: exact count-distinct per day (daily unique users)."""
    ev = scan(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("day", F.col("ts")).alias("d"))
        .agg(F.countDistinct("user_id").alias("u"))
        .orderBy("d")
    )


@query(
    "q_approx_distinct_users",
    oracle=None,  # approximate (HLL++) has no exact oracle; rows-only check.
    tags=("A4",),
)
def q_approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: approx count-distinct (HyperLogLog++) — the 100 TB-scale twin
    of A3; rsd 1%. Approximate, so rows-only by design (no SQL oracle);
    exactness is instead unit-tested against A3 bounds."""
    ev = scan(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", rsd=0.01).alias("approx_u"))
        .orderBy("event_type")
    )


@query(
    "q_stats_agg",
    oracle="""
        WITH c AS (
          SELECT event_type,
                 CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS v,
                 user_id AS u, value
          FROM events)
        SELECT event_type,
               floor(sqrt(CAST(count(*) * sum(v * v) - sum(v) * sum(v)
                               AS DOUBLE)
                          / (count(*) * (count(*) - 1.0)) / 10000.0)
                     * 10000.0 + 0.5) / 10000.0 AS sd,
               floor((CAST(count(*) * sum(v * v) - sum(v) * sum(v)
                           AS DOUBLE)
                      / (count(*) * (count(*) - 1.0)) / 10000.0)
                     * 10000.0 + 0.5) / 10000.0 AS var,
               floor(((count(*) * sum(v * u) - sum(v) * sum(u))
                      / sqrt(CAST(count(*) * sum(v * v) - sum(v) * sum(v)
                                  AS DOUBLE)
                             * CAST(count(*) * sum(u * u) - sum(u) * sum(u)
                                    AS DOUBLE)))
                     * 1000000.0 + 0.5) / 1000000.0 AS c,
               round(quantile_cont(value, 0.5), 4) AS p50,
               round(quantile_cont(value, 0.9), 4) AS p90
        FROM c
        GROUP BY event_type
        ORDER BY event_type
    """,
    tags=("A5",),
)
def q_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: statistical aggregates (stddev/variance/corr/exact percentile)."""
    # exact integer-cent sufficient statistics (engine stddev/var/corr
    # stream float partials in accumulation order): sd/var/c are
    # identical double chains from order-free int64 sums, floor-pinned;
    # the cent scale cancels in the correlation and divides out of the
    # variance once. Percentiles interpolate an identical multiset.
    ev = scan(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5))
        .cast("long")
        .alias("v"),
        F.col("user_id").alias("u"),
        "value",
    )
    v, u = F.col("v"), F.col("u")
    mcnt = F.count("*")
    # second moments in the shared DECIMAL tier (functions.exact_comoment):
    # the int64 n*S2 - S1^2 shape overflows quadratically in group size
    var_raw = exact_comoment(v).cast("double") / (
        mcnt * (mcnt - F.lit(1.0))
    ) / F.lit(10000.0)
    corr_raw = exact_comoment(v, u).cast("double") / F.sqrt(
        exact_comoment(v).cast("double") * exact_comoment(u).cast("double")
    )
    return (
        ev.groupBy("event_type")
        .agg(
            pin(F.sqrt(var_raw), 4).alias("sd"),
            pin(var_raw, 4).alias("var"),
            pin(corr_raw, 6).alias("c"),
            F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(value, 0.9)"), 4).alias("p90"),
        )
        .orderBy("event_type")
    )


@query(
    "q_rollup_day_type",
    oracle="""
        SELECT date_trunc('day', ts) AS d, event_type,
               count(*) AS n,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total,
               grouping(date_trunc('day', ts)) AS g_d,
               grouping(event_type) AS g_t
        FROM events
        GROUP BY ROLLUP (d, event_type)
        ORDER BY g_d, g_t, d, event_type
    """,
    tags=("A6",),
)
def q_rollup_day_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: ROLLUP multi-granularity aggregate (day x event_type -> day -> all),
    with GROUPING() flags to disambiguate rollup NULLs from data NULLs."""
    ev = scan(spark, sf_dir, "events").withColumn(
        "d", F.date_trunc("day", F.col("ts"))
    )
    return (
        ev.rollup("d", "event_type")
        .agg(
            F.count("*").alias("n"),
            money_sum("value").alias("total"),
            F.grouping("d").cast("long").alias("g_d"),
            F.grouping("event_type").cast("long").alias("g_t"),
        )
        .orderBy("g_d", "g_t", "d", "event_type")
    )


@query(
    "q_cube_status_priority",
    oracle="""
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n,
               grouping(o_orderstatus) AS g_s,
               grouping(o_orderpriority) AS g_p
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
        ORDER BY g_s, g_p, o_orderstatus, o_orderpriority
    """,
    tags=("A6",),
)
def q_cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: CUBE over two low-cardinality dimensions."""
    orders = scan(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.grouping("o_orderstatus").cast("long").alias("g_s"),
            F.grouping("o_orderpriority").cast("long").alias("g_p"),
        )
        .orderBy("g_s", "g_p", "o_orderstatus", "o_orderpriority")
    )


@query(
    "q_collect_set",
    oracle="""
        SELECT user_id,
               array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types
        FROM events
        GROUP BY user_id
        ORDER BY user_id
    """,
    tags=("A7",),
)
def q_collect_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: collect_set — per-user set of event types (canonicalized to a
    sorted comma-joined string so both engines hash identically)."""
    ev = scan(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(
            F.array_join(F.sort_array(F.collect_set("event_type")), ",").alias("types")
        )
        .orderBy("user_id")
    )


@query(
    "q_having",
    oracle="""
        SELECT user_id, count(*) AS n,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM events
        GROUP BY user_id
        HAVING count(*) >= 70
        ORDER BY user_id
    """,
    tags=("A8", "A1"),
)
def q_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8: HAVING — post-aggregation filter (heavy users)."""
    ev = scan(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(F.count("*").alias("n"), money_sum("value").alias("total"))
        .filter(F.col("n") >= 70)
        .orderBy("user_id")
    )


@query(
    "q_string_agg",
    oracle="""
        SELECT o_orderstatus,
               string_agg(DISTINCT o_orderpriority, ','
                          ORDER BY o_orderpriority) AS priorities,
               count(*) AS n
        FROM orders
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
    """,
    tags=("A7", "F1"),
)
def q_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7+: ordered string aggregation — the distinct priorities seen
    per order status, canonicalized (sorted, comma-joined) so the
    concatenated string is deterministic across engines and partition
    orders (raw listagg/string_agg without ORDER BY is not).
    """
    orders = scan(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderstatus")
        .agg(
            F.array_join(
                F.sort_array(F.collect_set("o_orderpriority")), ","
            ).alias("priorities"),
            F.count("*").alias("n"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "q_try_divide",
    oracle="""
        SELECT l_linestatus,
               count(*) FILTER (WHERE l_discount = 0) AS n_zero_div,
               CAST(sum(CAST(floor((CASE WHEN l_discount <> 0
                                         THEN l_extendedprice / l_discount
                                    END) * 10000.0 + 0.5) AS BIGINT))
                    AS DOUBLE)
                 / (CAST(count(CASE WHEN l_discount <> 0
                                    THEN 1 END) AS DOUBLE) * 10000.0)
                 AS avg_ratio
        FROM lineitem
        GROUP BY l_linestatus
        ORDER BY l_linestatus
    """,
    tags=("F3", "F4", "robustness"),
)
def q_try_divide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe arithmetic: ``try_divide`` yields NULL instead of an
    error/Inf on the ~5% of rows with zero discount, so the aggregate
    over the valid rows proceeds and the poisoned rows are COUNTED —
    the fail-soft posture batch pipelines need (one bad row must not
    kill a 100 TB job).
    """
    li = scan(spark, sf_dir, "lineitem")
    ratio = F.try_divide(F.col("l_extendedprice"), F.col("l_discount"))
    return (
        li.groupBy("l_linestatus")
        .agg(
            F.count(F.when(F.col("l_discount") == 0, 1)).alias("n_zero_div"),
            # exact_avg has AVG NULL semantics since r9 (divides by the
            # NON-NULL count), so the hand-rolled NULL-aware variant
            # this site carried is just the helper now — in the WIDE
            # (DECIMAL-accumulating) form: converting this site ran it
            # through the headroom gate, which flagged the product
            # max|ratio| * 1e4 * rows = 3.2e16 at sf0.1 as within 300x
            # of 2^63 (price/discount ratios reach 1.05e7). DuckDB's
            # HUGEINT promotion was already exact; exact_avg_wide
            # matches that bound on the Spark side.
            exact_avg_wide(ratio, 4).alias("avg_ratio"),
        )
        .orderBy("l_linestatus")
    )


@query(
    "q_forecast_revenue_change",
    oracle="""
        SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                        * CAST(l_discount AS DECIMAL(5,2))) AS DOUBLE)
                 AS revenue_delta,
               count(*) AS n
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
    tags=("A2", "P3", "F2"),
)
def q_forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: revenue delta from hypothetically eliminating
    a discount band in a ship-year — a pure scan-filter-aggregate
    with THREE stacked range predicates, the canonical predicate-
    pushdown stress query (all three filters must reach the parquet
    row groups; no join, no shuffle beyond the 1-row agg).
    """
    li = scan(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.sum(money("l_extendedprice") * rate("l_discount"))
        .cast("double")
        .alias("revenue_delta"),
        F.count("*").alias("n"),
    )


@query(
    "q_promo_revenue",
    oracle=f"""
        SELECT {sql_pin(
            "100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'"
            " THEN CAST(l_extendedprice AS DECIMAL(18,2))"
            " * (1 - CAST(l_discount AS DECIMAL(5,2)))"
            " ELSE 0 END) AS DOUBLE)"
            " / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))"
            " * (1 - CAST(l_discount AS DECIMAL(5,2)))) AS DOUBLE)", 4)}
                 AS promo_pct,
               count(*) AS n
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-09-01'
          AND l_shipdate < TIMESTAMP '1997-10-01'
    """,
    tags=("A2", "J1", "F4"),
)
def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo parts' share of one month's revenue —
    a conditional-aggregate ratio over a dim join. The part side goes
    through size-aware ``maybe_broadcast`` (part scales with SF, so at
    100 TB the partkey equi-join becomes a co-partitioned shuffle join
    instead of a forced-broadcast OOM);
    the month filter prunes the fact scan; both revenue masses are
    exact DECIMAL sums, so the pct is ONE double division of
    identical operands, floor-pinned at 4 dp.
    """
    li = scan(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    part = scan(spark, sf_dir, "part").select("p_partkey", "p_type")
    one = F.lit(1).cast("decimal(5,2)")
    rev = money("l_extendedprice") * (one - rate("l_discount"))
    return li.join(
        maybe_broadcast(part, table_bytes(sf_dir, "part")),
        li["l_partkey"] == part["p_partkey"],
    ).agg(
        pin(
            F.lit(100.0)
            * F.sum(
                F.when(F.col("p_type") == "PROMO", rev).otherwise(
                    F.lit(0).cast("decimal(24,4)")
                )
            ).cast("double")
            / F.sum(rev).cast("double"),
            4,
        ).alias("promo_pct"),
        F.count("*").alias("n"),
    )


@query("q_hll_rollup", oracle=None, tags=("A4", "rollup"))
def q_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4+: REAGGREGATABLE distinct-count sketches — the warehouse
    pattern approx_count_distinct cannot express. Per-(day, hour)
    Datasketches HLL sketches of user_id are built once; the daily
    distinct-user estimate is then answered by MERGING the 24 hourly
    sketches (hll_union_agg), never rescanning raw events. At 100 TB
    the hourly sketch table is the only thing a dashboard ever reads:
    day/week/month rollups are unions of a few KB of sketch bytes.

    Rows-only (sketch estimates are engine-specific, no DuckDB oracle);
    tests/test_llm_ops.py pins (a) merged estimate == direct one-pass
    estimate (mergeability is exact for HLL, not approximate) and
    (b) relative error vs the exact distinct count < 5%, and the exact
    column is additionally SQL-checked there.
    """
    ev = scan(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), F.hour("ts").alias("hr"), "user_id"
    )
    hourly = ev.groupBy("day", "hr").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    daily = hourly.groupBy("day").agg(
        F.count("*").alias("n_hours"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_users"),
    )
    direct = ev.groupBy("day").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est_direct"),
        F.countDistinct("user_id").alias("exact_users"),
    )
    return (
        daily.join(direct, "day")
        .select("day", "n_hours", "exact_users", "est_users", "est_direct")
        .orderBy("day")
    )


@query(
    "q_bitmap_distinct_daily",
    oracle="""
        SELECT date_trunc('day', ts) AS day,
               count(DISTINCT user_id) AS users
        FROM events
        GROUP BY day
        ORDER BY day
    """,
    tags=("A3", "bitmap"),
)
def q_bitmap_distinct_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 at scale: EXACT daily distinct users via Spark 4 bitmap
    aggregates instead of count(DISTINCT ...).

    Why it matters at 100 TB: count(DISTINCT) must shuffle every
    distinct (day, user) pair to one reducer per day; the bitmap plan
    shuffles at most one 4 KB bitmap per (day, 32768-id bucket) —
    partial bitmaps OR-merge map-side like any agg, so the network
    cost is bounded by (days x id-range/32768), independent of row
    count, and the result is exact (each user is one bit, not a hash
    estimate). The same bitmaps are incrementally mergeable across
    refreshes (q_bitmap_rollup_monthly proves it).
    """
    ev = scan(spark, sf_dir, "events")
    per_bucket = ev.groupBy(
        F.date_trunc("day", "ts").alias("day"),
        F.expr("bitmap_bucket_number(user_id)").alias("bk"),
    ).agg(F.expr("bitmap_construct_agg(bitmap_bit_position(user_id))").alias("b"))
    return (
        per_bucket.groupBy("day")
        .agg(F.expr("CAST(sum(bitmap_count(b)) AS BIGINT)").alias("users"))
        .orderBy("day")
    )


@query(
    "q_bitmap_rollup_monthly",
    oracle="""
        SELECT date_trunc('month', ts) AS month,
               count(DISTINCT user_id) AS users
        FROM events
        GROUP BY month
        ORDER BY month
    """,
    tags=("A3", "A4", "bitmap", "rollup"),
)
def q_bitmap_rollup_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3/A4 rollup mergeability, EXACT variant: monthly distinct
    users computed by OR-merging the stored DAILY bucket bitmaps —
    never re-touching the fact rows — and hash-matching the direct
    count(DISTINCT) per month.

    This is the lossless twin of q_hll_rollup's sketch merge: a
    materialized (day, bucket, bitmap) layer supports any coarser
    distinct rollup (week/month/quarter) at cost O(#days x #buckets),
    which is how incremental pipelines serve exact distinct counts
    over 100 TB without a nightly full recompute. bitmap_or_agg is
    associative and duplicate-safe, so late-arriving day re-builds
    just overwrite that day's bitmaps and the rollup stays exact.
    """
    ev = scan(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").alias("day"),
        F.expr("bitmap_bucket_number(user_id)").alias("bk"),
    ).agg(F.expr("bitmap_construct_agg(bitmap_bit_position(user_id))").alias("b"))
    monthly = daily.groupBy(
        F.date_trunc("month", "day").alias("month"), F.col("bk")
    ).agg(F.expr("bitmap_or_agg(b)").alias("b"))
    return (
        monthly.groupBy("month")
        .agg(F.expr("CAST(sum(bitmap_count(b)) AS BIGINT)").alias("users"))
        .orderBy("month")
    )


@query(
    "q_top_supplier_revenue",
    oracle="""
        WITH rev AS (
          SELECT l_suppkey AS suppkey,
                 sum(CAST(l_extendedprice AS DECIMAL(18,2))
                     * (1 - CAST(l_discount AS DECIMAL(5,2)))) AS rev_d
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1997-01-01'
            AND l_shipdate < TIMESTAMP '1997-04-01'
          GROUP BY l_suppkey)
        SELECT s.s_suppkey, s.s_name,
               CAST(r.rev_d AS DOUBLE) AS total_rev
        FROM rev r JOIN supplier s ON s.s_suppkey = r.suppkey
        WHERE r.rev_d = (SELECT max(rev_d) FROM rev)
        ORDER BY s.s_suppkey
    """,
    tags=("A1", "A2", "J1", "tpch"),
)
def q_top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the quarter's top supplier(s) by shipped
    revenue — a scalar MAX over an aggregate, joined back against the
    same aggregate (the "revenue view" reused twice).

    Scale shape: the revenue aggregate is computed ONCE per branch off
    a date-pruned scan (partial agg collapses each scan partition to
    ~|suppliers| rows before the shuffle); the max side reduces to ONE
    row that is broadcast into the equality filter, so the "subquery"
    costs one extra reduction, never a re-scan of lineitem rows per
    supplier. Revenue is exact DECIMAL (functions.money), so the
    max/EQUALITY compares exact values — an equality on rounded
    double sums was the falsified fragility class (q_hhi precedent).
    """
    one = F.lit(1).cast("decimal(5,2)")
    rev = (
        scan(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("suppkey"))
        .agg(
            F.sum(
                money("l_extendedprice") * (one - rate("l_discount"))
            ).alias("rev_d")
        )
    )
    top = rev.agg(F.max("rev_d").alias("mx"))
    sup = scan(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(top))
        .filter(F.col("rev_d") == F.col("mx"))
        .join(
            maybe_broadcast(sup, table_bytes(sf_dir, "supplier")),
            F.col("suppkey") == F.col("s_suppkey"),
        )
        .select(
            "s_suppkey",
            "s_name",
            F.col("rev_d").cast("double").alias("total_rev"),
        )
        .orderBy("s_suppkey")
    )


@query(
    "q_important_parts_share",
    oracle=f"""
        WITH pv AS (
          SELECT l_partkey AS partkey,
                 sum(CAST(l_extendedprice AS DECIMAL(18,2))
                     * (1 - CAST(l_discount AS DECIMAL(5,2)))) AS val
          FROM lineitem GROUP BY l_partkey),
        tot AS (SELECT sum(val) AS t, count(*) AS np FROM pv)
        SELECT p.p_partkey, p.p_name,
               CAST(pv.val AS DOUBLE) AS part_value,
               {sql_pin(
                   "100.0 * CAST(pv.val AS DOUBLE)"
                   " / CAST(tot.t AS DOUBLE)", 4)} AS pct_of_total
        FROM pv JOIN part p ON p.p_partkey = pv.partkey
        CROSS JOIN tot
        WHERE CAST(pv.val AS DOUBLE)
              > 1.5 * CAST(tot.t AS DOUBLE) / tot.np
        ORDER BY part_value DESC, p.p_partkey
    """,
    tags=("A1", "A2", "A8", "J1", "tpch"),
)
def q_important_parts_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts carrying an outsized share of total
    revenue — a grouped aggregate HAVING-filtered against a fraction
    of the global total (the "important stock" report). The threshold
    is SCALE-FREE: a part qualifies when its revenue exceeds 1.5x the
    MEAN per-part revenue (a fixed fraction, Q11's literal form,
    silently selects everything at small SF and nothing at large SF —
    per-part share scales as 1/|parts|).

    Scale shape: one grouped aggregate off the fact scan feeds both
    the per-part values and (via a second reduction over the ~|parts|
    aggregate, not the fact rows) the global total + part count; that
    is ONE broadcast row, so the threshold is a codegen'd filter, not
    a correlated subquery. Revenue is exact DECIMAL end-to-end
    (functions.money), so the 1.5x-mean threshold, the share ratio,
    and the ORDER key all derive from identical exact values on both
    engines via single double conversions.
    """
    one = F.lit(1).cast("decimal(5,2)")
    pv = (
        scan(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(
            F.sum(
                money("l_extendedprice") * (one - rate("l_discount"))
            ).alias("val")
        )
    )
    tot = pv.agg(F.sum("val").alias("t"), F.count("*").alias("np"))
    part = scan(spark, sf_dir, "part").select("p_partkey", "p_name")
    return (
        pv.crossJoin(F.broadcast(tot))
        .filter(
            F.col("val").cast("double")
            > F.lit(1.5) * F.col("t").cast("double") / F.col("np")
        )
        .join(
            maybe_broadcast(part, table_bytes(sf_dir, "part")),
            F.col("partkey") == F.col("p_partkey"),
        )
        .select(
            "p_partkey",
            "p_name",
            F.col("val").cast("double").alias("part_value"),
            pin(
                F.lit(100.0)
                * F.col("val").cast("double")
                / F.col("t").cast("double"),
                4,
            ).alias("pct_of_total"),
        )
        .orderBy(F.desc("part_value"), "p_partkey")
    )


@query(
    "q_market_share",
    oracle=f"""
        WITH rev AS (
          SELECT extract(year FROM o.o_orderdate) AS yr,
                 sn.n_name AS supp_nation,
                 CAST(l.l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l.l_discount AS DECIMAL(5,2))) AS volume
          FROM lineitem l
          JOIN orders o ON o.o_orderkey = l.l_orderkey
          JOIN customer c ON c.c_custkey = o.o_custkey
          JOIN nation cn ON cn.n_nationkey = c.c_nationkey
          JOIN region r ON r.r_regionkey = cn.n_regionkey
          JOIN supplier s ON s.s_suppkey = l.l_suppkey
          JOIN nation sn ON sn.n_nationkey = s.s_nationkey
          WHERE r.r_name = 'AMERICA'),
        agged AS (
          SELECT yr,
                 CAST(sum(CASE WHEN supp_nation = 'NATION_1'
                               THEN volume ELSE 0 END) AS DOUBLE)
                   AS nation_rev,
                 CAST(sum(volume) AS DOUBLE) AS market_rev
          FROM rev GROUP BY yr)
        SELECT yr, nation_rev, market_rev,
               {sql_pin("nation_rev / market_rev", 6)} AS share
        FROM agged
        ORDER BY yr
    """,
    tags=("A1", "J1", "J2", "tpch"),
)
def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_1 suppliers' share of the AMERICA-region
    market per order year — a six-way snowflake join feeding a
    conditional-sum ratio.

    Scale shape: the only fact-sized relation is lineitem; orders is
    fact-sized too, so lineitem JOIN orders is the single big shuffle
    (both hash-partitioned on the order key). Every dimension
    (customer, supplier, nation x2, region) is broadcast, and the
    region filter reaches the customer-nation side BEFORE the fact
    join via the broadcast hash lookup, so non-AMERICA customers'
    rows never enter the big shuffle. Volume is exact DECIMAL
    end-to-end (functions.money); the share is ONE double division
    of the exact sums, floor-pinned at 6 dp.
    """
    one = F.lit(1).cast("decimal(5,2)")
    li = scan(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey",
        (money("l_extendedprice") * (one - rate("l_discount"))).alias(
            "volume"
        ),
    )
    orders = scan(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.year("o_orderdate").alias("yr")
    )
    nation = scan(spark, sf_dir, "nation")
    region = scan(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    cust_in_region = (
        scan(spark, sf_dir, "customer")
        .select("c_custkey", "c_nationkey")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    supp_nation = (
        scan(spark, sf_dir, "supplier")
        .select("s_suppkey", "s_nationkey")
        .join(
            F.broadcast(nation.select(
                F.col("n_nationkey").alias("sn_key"),
                F.col("n_name").alias("supp_nation"),
            )),
            F.col("s_nationkey") == F.col("sn_key"),
        )
        .select("s_suppkey", "supp_nation")
    )
    nation_vol = F.when(
        F.col("supp_nation") == "NATION_1", F.col("volume")
    ).otherwise(F.lit(0).cast("decimal(24,4)"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            maybe_broadcast(cust_in_region, table_bytes(sf_dir, "customer")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            maybe_broadcast(supp_nation, table_bytes(sf_dir, "supplier")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("yr")
        .agg(
            F.sum(nation_vol).cast("double").alias("nation_rev"),
            F.sum("volume").cast("double").alias("market_rev"),
        )
        .select(
            "yr",
            "nation_rev",
            "market_rev",
            pin(F.col("nation_rev") / F.col("market_rev"), 6).alias("share"),
        )
        .orderBy("yr")
    )


@query(
    "q_small_qty_revenue",
    oracle="""
        WITH pa AS (
          SELECT l_partkey, 0.5 * avg(l_quantity) AS half_avg
          FROM lineitem GROUP BY l_partkey)
        SELECT CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)))
                    AS DOUBLE) / 7.0 AS avg_yearly,
               count(*) AS n_small_lines
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        JOIN pa ON pa.l_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#4'
          AND l.l_quantity < pa.half_avg
    """,
    tags=("A1", "A2", "J1", "tpch"),
)
def q_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue that would vanish if small-quantity
    orders (below half the part's average order quantity) for one
    brand were dropped — the canonical correlated-AVG-subquery
    decorrelation.

    Scale shape: the correlated subquery becomes ONE per-part
    aggregate (|parts| rows after map-side partial agg) joined back to
    the brand-filtered fact rows — never a re-scan of lineitem per
    part. The per-part avg frame is dimension-sized, so it broadcasts
    alongside the part dim, leaving the plan a single lineitem scan
    with two broadcast hash joins and a global agg. The half-average
    threshold compares identically on both engines: avg() of the
    same doubles in any order differs by <1 ulp while quantities are
    integers >= 1 apart, so the < predicate cannot flip.
    """
    li = scan(spark, sf_dir, "lineitem")
    per_part = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (0.5 * F.avg("l_quantity")).alias("half_avg")
    )
    brand = (
        scan(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#4")
        .select("p_partkey")
    )
    return (
        li.join(
            maybe_broadcast(brand, table_bytes(sf_dir, "part")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(
            maybe_broadcast(per_part, table_bytes(sf_dir, "part")),
            F.col("l_partkey") == F.col("pk"),
        )
        .filter(F.col("l_quantity") < F.col("half_avg"))
        .agg(
            # exact DECIMAL sum, then ONE identical double division
            (money_sum("l_extendedprice") / F.lit(7.0)).alias("avg_yearly"),
            F.count("*").alias("n_small_lines"),
        )
    )


@query(
    "q_hhi_concentration",
    oracle="""
        WITH sup_rev AS (
          SELECT c.c_mktsegment AS segment, l.l_suppkey,
                 CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l.l_discount AS DECIMAL(5,2))))
                      AS DECIMAL(22,4)) AS rev
          FROM lineitem l
          JOIN orders o ON o.o_orderkey = l.l_orderkey
          JOIN customer c ON c.c_custkey = o.o_custkey
          GROUP BY segment, l.l_suppkey),
        sh AS (
          SELECT segment, rev,
                 CAST(rev AS DOUBLE)
                 / CAST(sum(rev) OVER (PARTITION BY segment) AS DOUBLE)
                   AS share
          FROM sup_rev)
        SELECT segment,
               count(*) AS n_suppliers,
               CAST(sum(rev) AS DOUBLE) AS segment_rev,
               CAST(sum(CAST(floor((share * share) * 100000000.0 + 0.5)
                             AS BIGINT)) AS DOUBLE) / 100000000.0 AS hhi
        FROM sh
        GROUP BY segment
        ORDER BY segment
    """,
    tags=("A1", "A5", "W4", "governance"),
)
def q_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman concentration index of supplier revenue
    within each customer market segment — the antitrust-style
    concentration metric complementing q_gini_spend / q_lorenz_curve
    (inequality) with market-power semantics (sum of squared shares;
    1/HHI = effective number of suppliers).

    Scale shape: one fact-fact shuffle (lineitem JOIN orders on the
    order key) with the customer dim broadcast; the (segment,
    supplier) aggregate is |segments| x |suppliers| rows, so the
    share/HHI arithmetic runs on a dimension-bounded frame.
    Money arithmetic is EXACT DECIMAL end-to-end (price 2 dp x
    discount 2 dp = exact 4-dp volumes, exact sums): a double sum of
    per-line revenues can land within an ulp of a rounding boundary
    and flip the 2-dp per-supplier figure with accumulation order —
    observed at sf0.1 — so no double enters until the share division,
    which divides identical exact decimals on both engines.
    """
    li = scan(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey",
        (
            F.col("l_extendedprice").cast("decimal(18,2)")
            * (F.lit(1).cast("decimal(5,2)")
               - F.col("l_discount").cast("decimal(5,2)"))
        ).alias("vol"),
    )
    orders = scan(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = scan(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    sup_rev = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            maybe_broadcast(cust, table_bytes(sf_dir, "customer")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy(F.col("c_mktsegment").alias("segment"), "l_suppkey")
        .agg(F.sum("vol").cast("decimal(22,4)").alias("rev"))
    )

    seg_total = F.sum("rev").over(Window.partitionBy("segment"))
    return (
        sup_rev.withColumn(
            "share",
            F.col("rev").cast("double") / seg_total.cast("double"),
        )
        .groupBy("segment")
        .agg(
            F.count("*").alias("n_suppliers"),
            F.sum("rev").cast("double").alias("segment_rev"),
            # per-supplier share^2 terms are identical doubles (one
            # division of exact decimals); their float sum is
            # partition-order-dependent -> 1e-8 grid + exact int64 sum
            (
                F.sum(
                    F.floor(
                        F.pow(F.col("share"), 2) * F.lit(100000000.0)
                        + F.lit(0.5)
                    ).cast("long")
                ).cast("double")
                / F.lit(100000000.0)
            ).alias("hhi"),
        )
        .orderBy("segment")
    )


@query(
    "q_weighted_median",
    oracle="""
        WITH h AS (
          SELECT l_returnflag AS flag, l_extendedprice AS v,
                 sum(l_quantity) AS w
          FROM lineitem GROUP BY flag, v),
        c AS (
          SELECT flag, v, w,
                 sum(w) OVER (PARTITION BY flag ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cw,
                 sum(w) OVER (PARTITION BY flag) AS tw
          FROM h)
        SELECT flag,
               round(min(CASE WHEN cw >= tw / 2 THEN v END), 2)
                 AS weighted_median,
               round(max(tw), 1) AS total_weight
        FROM c
        GROUP BY flag
        ORDER BY flag
    """,
    tags=("A5", "W4", "robust"),
)
def q_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median price per return flag — the
    volume-weighted central price (each line votes by units moved,
    not once), the robust complement of the VWAP-mean. percentile()
    has no weighted form in either engine, so the estimator is
    computed from the VALUE HISTOGRAM: per (flag, price) summed
    weight, partitioned cumulative weight, and the smallest price
    whose cumulative weight reaches half the total.

    Scale shape: ONE corpus-scale hash agg to the (flag, price)
    histogram; the cumulative window is PARTITIONED by flag and runs
    over the bounded distinct-price frame (value-grain: 2-dp currency,
    not row-grain). Weights are integer-valued quantities, so the
    cumulative sums and the tw/2 threshold are exact — the >= cut
    cannot flip between engines.
    """
    h = (
        scan(spark, sf_dir, "lineitem")
        .groupBy(
            F.col("l_returnflag").alias("flag"),
            F.col("l_extendedprice").alias("v"),
        )
        .agg(F.sum("l_quantity").alias("w"))
    )
    w_cum = (
        Window.partitionBy("flag")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("flag")
    c = h.withColumn("cw", F.sum("w").over(w_cum)).withColumn(
        "tw", F.sum("w").over(w_all)
    )
    return (
        c.groupBy("flag")
        .agg(
            F.round(
                F.min(
                    F.when(F.col("cw") >= F.col("tw") / 2, F.col("v"))
                ),
                2,
            ).alias("weighted_median"),
            F.round(F.max("tw"), 1).alias("total_weight"),
        )
        .orderBy("flag")
    )


@query(
    "q_price_volume_mix",
    oracle=f"""
        WITH mm AS (
          SELECT min(extract(year FROM l_shipdate) * 12
                     + extract(month FROM l_shipdate)) AS m0
          FROM lineitem),
        per AS (
          SELECT l.l_returnflag AS flag,
                 CASE WHEN extract(year FROM l.l_shipdate) * 12
                           + extract(month FROM l.l_shipdate) = b.m0
                      THEN 0 ELSE 1 END AS p,
                 sum(l.l_quantity) AS qty,
                 CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)))
                      AS DOUBLE) AS rev
          FROM lineitem l CROSS JOIN mm b
          WHERE extract(year FROM l.l_shipdate) * 12
                + extract(month FROM l.l_shipdate) IN (b.m0, b.m0 + 1)
          GROUP BY flag, p),
        w AS (
          SELECT flag,
                 max(CASE WHEN p = 0 THEN qty END) AS q0,
                 max(CASE WHEN p = 1 THEN qty END) AS q1,
                 max(CASE WHEN p = 0 THEN rev END) AS r0,
                 max(CASE WHEN p = 1 THEN rev END) AS r1
          FROM per GROUP BY flag)
        SELECT flag,
               r0 AS rev_m0,
               r1 AS rev_m1,
               r1 - r0 AS delta,
               {sql_pin("(q1 - q0) * (r0 / q0)", 2)} AS volume_effect,
               {sql_pin("q1 * (r1 / q1 - r0 / q0)", 2)} AS price_effect,
               {sql_pin(
                   "(r1 - r0) - ((q1 - q0) * (r0 / q0)"
                   " + q1 * (r1 / q1 - r0 / q0))", 2)} AS residual
        FROM w
        ORDER BY flag
    """,
    tags=("A1", "A5", "tpch", "diagnostic"),
)
def q_price_volume_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price/volume decomposition of month-over-month revenue (the
    FP&A waterfall): per return flag, the first two shipping months'
    revenue delta split into a VOLUME effect ((q1-q0) x old unit
    price) and a PRICE effect (q1 x unit-price change) — which sum to
    the delta EXACTLY under this two-factor attribution (the residual
    column proves it: identically 0.00, the property that makes the
    waterfall reconcile in front of a CFO).

    Scale shape: the month filter prunes the scan to two months; ONE
    (flag, period) hash agg, then |flags|-row pivot algebra. The
    decomposition divides sums before differencing (unit prices),
    rounded at 2 dp only at the output — both engines compute the
    same double expressions from identical per-period sums (sums of
    2-dp prices / integer quantities; the wide aggregate is
    order-insensitive at the output rounding).
    """
    mm = scan(spark, sf_dir, "lineitem").agg(
        F.min(
            F.year("l_shipdate") * 12 + F.month("l_shipdate")
        ).alias("m0")
    )
    li = scan(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        "l_quantity",
        "l_extendedprice",
        (F.year("l_shipdate") * 12 + F.month("l_shipdate")).alias("m"),
    )
    per = (
        li.crossJoin(F.broadcast(mm))
        .filter(
            (F.col("m") == F.col("m0")) | (F.col("m") == F.col("m0") + 1)
        )
        .groupBy(
            F.col("l_returnflag").alias("flag"),
            F.when(F.col("m") == F.col("m0"), 0).otherwise(1).alias("p"),
        )
        .agg(
            F.sum("l_quantity").alias("qty"),
            # exact DECIMAL revenue -> ONE double conversion; the qty
            # sums are integer-valued doubles (exact already)
            money_sum("l_extendedprice").alias("rev"),
        )
    )
    w = per.groupBy("flag").agg(
        F.max(F.when(F.col("p") == 0, F.col("qty"))).alias("q0"),
        F.max(F.when(F.col("p") == 1, F.col("qty"))).alias("q1"),
        F.max(F.when(F.col("p") == 0, F.col("rev"))).alias("r0"),
        F.max(F.when(F.col("p") == 1, F.col("rev"))).alias("r1"),
    )
    vol = (F.col("q1") - F.col("q0")) * (F.col("r0") / F.col("q0"))
    prc = F.col("q1") * (
        F.col("r1") / F.col("q1") - F.col("r0") / F.col("q0")
    )
    return w.select(
        "flag",
        F.col("r0").alias("rev_m0"),
        F.col("r1").alias("rev_m1"),
        (F.col("r1") - F.col("r0")).alias("delta"),
        pin(vol, 2).alias("volume_effect"),
        pin(prc, 2).alias("price_effect"),
        pin((F.col("r1") - F.col("r0")) - (vol + prc), 2).alias("residual"),
    ).orderBy("flag")
