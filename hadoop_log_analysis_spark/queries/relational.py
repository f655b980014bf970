"""Projection & filter operators P1-P4 + the flagship query
(SURVEY.md §2.2, §3.2.1).

The flagship (hourly error counts) is the canonical Hadoop
log-analytics job: scan -> parse/repair -> filter -> time-bucket ->
count -> sort. At 100 TB this plan is scan-dominated; the filter and
the two projected columns push into the parquet reader (verified in
tests/test_plans.py), so the job reads only ts+event_type pages of
row groups surviving min/max pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_log_analysis_spark.queries import query
from hadoop_log_analysis_spark.sources.catalog import scan


@query(
    "q_hourly_errors",
    oracle="""
        SELECT date_trunc('hour', ts) AS hr, count(*) AS errors
        FROM events
        WHERE event_type = 'error'
        GROUP BY hr
        ORDER BY hr
    """,
    tags=("flagship", "P2", "F2", "A1", "O1"),
)
def q_hourly_errors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: errors per hour over the event log."""
    ev = scan(spark, sf_dir, "events")
    return (
        ev.filter(F.col("event_type") == "error")
        .groupBy(F.date_trunc("hour", F.col("ts")).alias("hr"))
        .agg(F.count("*").alias("errors"))
        .orderBy("hr")
    )


@query(
    "q_project_compute",
    oracle="""
        SELECT p_partkey,
               upper(p_brand) AS brand_u,
               round(p_retailprice * 1.1, 2) AS bumped_price,
               p_size + 1 AS size_next
        FROM part
        ORDER BY p_partkey
    """,
    tags=("P1",),
)
def q_project_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1: project / rename / computed columns."""
    part = scan(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_u"),
        F.round(F.col("p_retailprice") * 1.1, 2).alias("bumped_price"),
        (F.col("p_size") + 1).alias("size_next"),
    ).orderBy("p_partkey")


@query(
    "q_filter_compare",
    oracle="""
        SELECT l_orderkey, l_linenumber
        FROM lineitem
        WHERE (l_quantity >= 45.0 AND l_discount < 0.02)
           OR (l_tax > 0.07 AND NOT l_returnflag = 'R')
        ORDER BY l_orderkey, l_linenumber
    """,
    tags=("P2",),
)
def q_filter_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2: comparison predicates + AND/OR/NOT combinators."""
    li = scan(spark, sf_dir, "lineitem")
    cond = ((F.col("l_quantity") >= 45.0) & (F.col("l_discount") < 0.02)) | (
        (F.col("l_tax") > 0.07) & ~(F.col("l_returnflag") == "R")
    )
    return li.filter(cond).select("l_orderkey", "l_linenumber").orderBy(
        "l_orderkey", "l_linenumber"
    )


@query(
    "q_filter_in_between",
    oracle="""
        SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM orders
        WHERE o_orderstatus IN ('P', 'F')
          AND o_totalprice BETWEEN 10000 AND 20000
          AND o_orderpriority IS NOT NULL
        ORDER BY o_orderkey
    """,
    tags=("P3",),
)
def q_filter_in_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3: IN-list, BETWEEN, and null-test predicates."""
    orders = scan(spark, sf_dir, "orders")
    return (
        orders.filter(
            F.col("o_orderstatus").isin("P", "F")
            & F.col("o_totalprice").between(10000, 20000)
            & F.col("o_orderpriority").isNotNull()
        )
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .orderBy("o_orderkey")
    )


@query(
    "q_filter_like_regex",
    oracle="""
        SELECT doc_id, n_chars
        FROM documents
        WHERE lang = 'en'
          AND text LIKE '%join%'
          AND regexp_matches(text, 'filter (scan|merge)')
        ORDER BY doc_id
    """,
    tags=("P4",),
)
def q_filter_like_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4: LIKE / regex filters — the original Hadoop distributed-grep."""
    docs = scan(spark, sf_dir, "documents")
    return (
        docs.filter(
            (F.col("lang") == "en")
            & F.col("text").like("%join%")
            & F.col("text").rlike("filter (scan|merge)")
        )
        .select("doc_id", "n_chars")
        .orderBy("doc_id")
    )
