"""Log-analytics depth beyond the SURVEY.md §2 core: cohort
retention, time-series anomaly detection, Pareto heavy-hitter
accounting, and the TPC-H Q18 large-volume shape.

These are the report-style analyses a production log pipeline runs on
top of the relational core — each one composes operators the engine
already verifies (windows, grouped aggs, having-joins) into a
recognizable end-user workload, and each is fully DuckDB-oracled.

Shared scale posture: every query's shuffle volume is bounded by an
aggregate's OUTPUT cardinality (users, hours, qualifying orders),
never by raw event rows; the one global window (Pareto) runs over a
post-aggregate that is already heavy-hitter-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_log_analysis_spark.queries import query
from hadoop_log_analysis_spark.sources.catalog import scan

# Warm-up for the anomaly baseline: a trailing mean/std over fewer
# than this many hours is too noisy to flag against.
ANOMALY_MIN_HOURS = 12
ANOMALY_Z = 2.0

# TPC-H Q18 threshold, scaled to the fixture's ~4 lineitems/order
# (classic spec value 300 keeps the result set selective but nonempty
# at sf0.01: ~2.9k of 15k orders qualify at >150; >300 keeps ~15).
LARGE_ORDER_QTY = 300


@query(
    "q_cohort_retention",
    oracle="""
        WITH a AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS d
                   FROM events),
             f AS (SELECT user_id, min(d) AS cohort_d FROM a GROUP BY user_id)
        SELECT cohort_d,
               date_diff('day', cohort_d, d) AS offset_d,
               count(*) AS n_users
        FROM a JOIN f USING (user_id)
        GROUP BY cohort_d, offset_d
        ORDER BY cohort_d, offset_d
    """,
    tags=("A1", "W5", "F2", "retention"),
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users are cohorted by their first
    active day; each cell counts how many of a cohort's users were
    active again `offset_d` days later — the standard activation /
    retention report over an event log.

    Scale shape: map-side partial dedup collapses events to distinct
    (user, day) pairs BEFORE the first exchange, so every shuffle in
    the plan moves at most |users|x|days| two-column rows — never raw
    events; the final rollup is O(days²) cells.
    """
    active = (
        scan(spark, sf_dir, "events")
        .select("user_id", F.date_trunc("day", "ts").alias("d"))
        .distinct()
    )
    with_cohort = active.withColumn(
        "cohort_d", F.min("d").over(Window.partitionBy("user_id"))
    )
    return (
        with_cohort.groupBy(
            "cohort_d", F.datediff("d", "cohort_d").alias("offset_d")
        )
        .agg(F.count("*").alias("n_users"))
        .orderBy("cohort_d", "offset_d")
    )


@query(
    "q_hourly_anomaly",
    oracle=f"""
        WITH h AS (SELECT date_trunc('hour', ts) AS hr, count(*) AS n
                   FROM events WHERE event_type = 'error' GROUP BY hr),
             w AS (SELECT hr, n,
                          avg(n) OVER win AS mu,
                          stddev_samp(n) OVER win AS sd,
                          count(*) OVER win AS n_hist
                   FROM h
                   WINDOW win AS (ORDER BY hr
                                  ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
        SELECT hr, n,
               CASE WHEN n_hist >= {ANOMALY_MIN_HOURS} AND sd > 1e-9
                    THEN round((n - mu) / sd, 3) END AS z,
               CASE WHEN n_hist >= {ANOMALY_MIN_HOURS} AND sd > 1e-9
                         AND (n - mu) / sd > {ANOMALY_Z}
                    THEN 1 ELSE 0 END AS is_burst
        FROM w
        ORDER BY hr
    """,
    tags=("W4", "A5", "F2", "anomaly", "timeseries"),
)
def q_hourly_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-burst detection: each hour's error count is z-scored
    against the trailing 24 hours (excluding itself); |z| > 2 with at
    least 12 hours of history flags a burst — the alerting query a log
    pipeline runs continuously.

    Scale shape: the window runs over the HOURLY aggregate (720 rows
    at sf0.1), so the single-series ORDER BY is trivially cheap no
    matter the event volume; a fleet-scale variant partitions the same
    window by (service, host) and parallelizes per key.
    """
    hourly = (
        scan(spark, sf_dir, "events")
        .filter(F.col("event_type") == "error")
        .groupBy(F.date_trunc("hour", "ts").alias("hr"))
        .agg(F.count("*").alias("n"))
    )
    win = Window.orderBy("hr").rowsBetween(-24, -1)
    w = hourly.select(
        "hr",
        "n",
        F.avg("n").over(win).alias("mu"),
        F.stddev_samp("n").over(win).alias("sd"),
        F.count("*").over(win).alias("n_hist"),
    )
    ok = (F.col("n_hist") >= ANOMALY_MIN_HOURS) & (F.col("sd") > 1e-9)
    zexpr = (F.col("n") - F.col("mu")) / F.col("sd")
    return w.select(
        "hr",
        "n",
        F.when(ok, F.round(zexpr, 3)).alias("z"),
        F.when(ok & (zexpr > ANOMALY_Z), F.lit(1)).otherwise(F.lit(0)).alias(
            "is_burst"
        ),
    ).orderBy("hr")


@query(
    "q_pareto_users",
    oracle="""
        WITH c AS (SELECT user_id, count(*) AS n FROM events GROUP BY user_id),
             t AS (SELECT sum(n) AS tot FROM c),
             w AS (SELECT user_id, n,
                          sum(n) OVER (ORDER BY n DESC, user_id) AS cum
                   FROM c)
        SELECT user_id, n, CAST(cum * 10000 // tot AS BIGINT) AS cum_share_bp
        FROM w, t
        WHERE cum - n < 0.5 * tot
        ORDER BY n DESC, user_id
    """,
    tags=("W4", "A1", "O2", "heavy-hitters"),
)
def q_pareto_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto heavy-hitter set: the smallest prefix of users (by event
    count, deterministic tie-break) that accounts for 50% of all
    events — the "who is actually generating this log volume" report.
    Cumulative share is reported in integer basis points (floor) so
    the output is exactly reproducible across engines — round(x, 4)
    on a double sits on rounding boundaries (0.00465 rounds UP in
    Spark, half-even in DuckDB; observed at sf0.1).

    Scale shape: the global running sum looks like a scale hazard but
    runs over the per-user AGGREGATE (cardinality = active users, not
    events), and only the qualifying prefix survives; integer counts
    make the shares exact.
    """
    counts = (
        scan(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
    )
    tot = counts.agg(F.sum("n").alias("tot"))
    win = Window.orderBy(F.desc("n"), "user_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        counts.withColumn("cum", F.sum("n").over(win))
        .crossJoin(F.broadcast(tot))
        .filter(F.col("cum") - F.col("n") < 0.5 * F.col("tot"))
        .select(
            "user_id",
            "n",
            F.floor(F.col("cum") * 10000 / F.col("tot")).alias("cum_share_bp"),
        )
        .orderBy(F.desc("n"), "user_id")
    )


@query(
    "q_large_orders",
    oracle=f"""
        WITH big AS (SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
                     FROM lineitem GROUP BY l_orderkey
                     HAVING sum(l_quantity) > {LARGE_ORDER_QTY})
        SELECT c_name, o_orderkey,
               date_trunc('day', o_orderdate) AS odate,
               round(o_totalprice, 2) AS price, total_qty
        FROM big
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        ORDER BY price DESC, o_orderkey
        LIMIT 100
    """,
    tags=("A8", "J2", "J1", "O2"),
)
def q_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: customers behind the largest-volume orders —
    a HAVING-filtered aggregate joined back to its dimensions, top-100
    by order value.

    Scale shape: the HAVING cut makes the aggregated key set selective
    (~0.1% of orders at the spec threshold), so Spark/AQE broadcasts
    it onto orders rather than shuffling the fact twice; customer
    attaches the same way; the top-100 is TakeOrderedAndProject.
    """
    big = (
        scan(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty_raw"))
        .filter(F.col("qty_raw") > LARGE_ORDER_QTY)
        .select("l_orderkey", F.round("qty_raw", 2).alias("total_qty"))
    )
    orders = scan(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = scan(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        orders.join(F.broadcast(big), orders["o_orderkey"] == big["l_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .select(
            "c_name",
            "o_orderkey",
            F.date_trunc("day", "o_orderdate").alias("odate"),
            F.round("o_totalprice", 2).alias("price"),
            "total_qty",
        )
        .orderBy(F.desc("price"), "o_orderkey")
        .limit(100)
    )
