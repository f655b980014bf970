"""Sort / limit / set ops / dedup O1-O5 (SURVEY.md §2.6).

Global sort = Spark range-partitioned sort (samples key distribution,
assigns contiguous ranges per partition — scales linearly);
orderBy+limit collapses to TakeOrderedAndProject (no full sort
materialized). Keyed dedup is implemented deterministically via
ranked windows — Spark's dropDuplicates keeps an ARBITRARY row, which
can never hash-match an oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_log_analysis_spark.functions import money_sum
from hadoop_log_analysis_spark.operators.windows import topk_per_group
from hadoop_log_analysis_spark.queries import query
from hadoop_log_analysis_spark.sources.catalog import scan


@query(
    "q_global_sort",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_extendedprice
        FROM lineitem
        ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    """,
    tags=("O1",),
)
def q_global_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1: global (range-partitioned) sort of the fact table."""
    li = scan(spark, sf_dir, "lineitem")
    return li.select("l_orderkey", "l_linenumber", "l_extendedprice").orderBy(
        F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber"
    )


@query(
    "q_topk_users",
    oracle="""
        SELECT user_id, count(*) AS n, CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM events
        WHERE event_type = 'purchase'
        GROUP BY user_id
        ORDER BY total DESC, user_id
        LIMIT 10
    """,
    tags=("O2", "A1"),
)
def q_topk_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2: global top-k (orderBy+limit -> TakeOrderedAndProject)."""
    ev = scan(spark, sf_dir, "events")
    return (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), money_sum("value").alias("total"))
        .orderBy(F.col("total").desc(), "user_id")
        .limit(10)
    )


@query(
    "q_union_all",
    oracle="""
        SELECT event_type, count(*) AS n FROM (
            SELECT event_type FROM events WHERE value < 100
            UNION ALL
            SELECT event_type FROM events WHERE value >= 100
        )
        GROUP BY event_type
        ORDER BY event_type
    """,
    tags=("O3",),
)
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3: UNION ALL of two partitions of the stream, re-aggregated
    (month-over-month log union idiom)."""
    ev = scan(spark, sf_dir, "events")
    lo = ev.filter(F.col("value") < 100).select("event_type")
    hi = ev.filter(F.col("value") >= 100).select("event_type")
    return (
        lo.union(hi)
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .orderBy("event_type")
    )


@query(
    "q_union_by_name",
    oracle="""
        SELECT k, tag FROM (
            SELECT o_orderkey AS k, o_orderpriority AS tag
            FROM orders WHERE o_totalprice > 450000
            UNION ALL
            SELECT o_orderkey AS k, NULL AS tag
            FROM orders WHERE o_totalprice < 2000
        )
        ORDER BY k
    """,
    tags=("O3",),
)
def q_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3: unionByName(allowMissingColumns) — schema-evolved log union."""
    orders = scan(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_totalprice") > 450000).select(
        F.col("o_orderkey").alias("k"), F.col("o_orderpriority").alias("tag")
    )
    b = orders.filter(F.col("o_totalprice") < 2000).select(
        F.col("o_orderkey").alias("k")
    )
    return a.unionByName(b, allowMissingColumns=True).orderBy("k")


@query(
    "q_intersect",
    oracle="""
        SELECT user_id FROM events WHERE event_type = 'purchase'
        INTERSECT
        SELECT user_id FROM events WHERE event_type = 'error'
        ORDER BY user_id
    """,
    tags=("O4",),
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4: INTERSECT (distinct) — users who both purchased and errored."""
    ev = scan(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select("user_id")
    e = ev.filter(F.col("event_type") == "error").select("user_id")
    return p.intersect(e).orderBy("user_id")


@query(
    "q_except",
    oracle="""
        SELECT user_id FROM events WHERE event_type = 'purchase'
        EXCEPT
        SELECT user_id FROM events WHERE event_type = 'error'
        ORDER BY user_id
    """,
    tags=("O4",),
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4: EXCEPT (distinct) — purchasers who never errored."""
    ev = scan(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select("user_id")
    e = ev.filter(F.col("event_type") == "error").select("user_id")
    return p.subtract(e).orderBy("user_id")  # subtract == EXCEPT DISTINCT


@query(
    "q_distinct_pairs",
    oracle="""
        SELECT DISTINCT user_id, event_type FROM events
        ORDER BY user_id, event_type
    """,
    tags=("O5",),
)
def q_distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O5: DISTINCT over a projection."""
    ev = scan(spark, sf_dir, "events")
    return ev.select("user_id", "event_type").distinct().orderBy("user_id", "event_type")


@query(
    "q_dedup_keep_latest",
    oracle="""
        SELECT user_id, event_type, event_id FROM (
            SELECT user_id, event_type, event_id,
                   row_number() OVER (PARTITION BY user_id, event_type
                                      ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
            FROM events)
        WHERE rn = 1
        ORDER BY user_id, event_type
    """,
    tags=("O5", "W2"),
)
def q_dedup_keep_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O5: keyed dedup keeping a DETERMINISTIC row (latest by ts, then
    id) — the correct distributed replacement for dropDuplicates."""
    ev = scan(spark, sf_dir, "events").select("user_id", "event_type", "event_id", "ts_ns")
    return (
        topk_per_group(
            ev,
            ["user_id", "event_type"],
            [F.col("ts_ns").desc(), F.col("event_id").desc()],
            k=1,
        )
        .select("user_id", "event_type", "event_id")
        .orderBy("user_id", "event_type")
    )


@query(
    "q_except_all",
    oracle="""
        SELECT user_id, CAST(count(*) AS BIGINT) AS n
        FROM (
          SELECT user_id FROM events WHERE event_type = 'purchase'
          EXCEPT ALL
          SELECT user_id FROM events WHERE event_type = 'error')
        GROUP BY user_id
        ORDER BY user_id
    """,
    tags=("O4",),
)
def q_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4: EXCEPT ALL — the multiplicity-preserving subtraction
    (each user keeps max(purchases - errors, 0) rows, not a boolean
    membership test like EXCEPT DISTINCT). The bag semantics matter
    whenever the row count IS the payload — e.g. "how many purchases
    exceed this user's error count". Output is re-aggregated to
    (user_id, surviving multiplicity) so the hash comparison is
    order-insensitive over a deterministic shape.

    Plan: Spark compiles exceptAll to a generate/aggregate
    (sum-of-signed-counts) — one hash agg keyed by the row value, no
    sort, same scale shape as any grouped count.
    """
    ev = scan(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select("user_id")
    e = ev.filter(F.col("event_type") == "error").select("user_id")
    return (
        p.exceptAll(e)
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .orderBy("user_id")
    )


@query(
    "q_intersect_all",
    oracle="""
        SELECT user_id, CAST(count(*) AS BIGINT) AS n
        FROM (
          SELECT user_id FROM events WHERE event_type = 'purchase'
          INTERSECT ALL
          SELECT user_id FROM events WHERE event_type = 'error')
        GROUP BY user_id
        ORDER BY user_id
    """,
    tags=("O4",),
)
def q_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4: INTERSECT ALL — multiplicity-preserving intersection (each
    user survives min(purchases, errors) times). Completes the O4
    family's bag-semantics half alongside q_except_all; re-aggregated
    to (user_id, multiplicity) for deterministic comparison.
    """
    ev = scan(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select("user_id")
    e = ev.filter(F.col("event_type") == "error").select("user_id")
    return (
        p.intersectAll(e)
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .orderBy("user_id")
    )
