"""Scalar function families F1-F8 (SURVEY.md §2.7).

One query per family, each exercising the representative set from the
inventory. All expressions are JVM built-ins — whole-stage codegen,
no Python in the row path. Patterns are kept within the common
regex/semantics subset of Java regex (Spark) and RE2 (DuckDB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hadoop_log_analysis_spark.queries import query
from hadoop_log_analysis_spark.sources.catalog import scan


@query(
    "q_string_fns",
    oracle="""
        SELECT p_partkey,
               lower(p_name) AS lname,
               upper(p_brand) AS ubrand,
               trim(p_type) AS ttype,
               substring(p_name, 1, 5) AS pfx,
               length(p_name) AS nlen,
               concat(p_brand, ':', p_type) AS brand_type,
               lpad(CAST(p_size AS VARCHAR), 4, '0') AS size4,
               regexp_replace(p_name, '[aeiou]', '', 'g') AS novowel,
               regexp_extract(p_name, '([a-z]+)', 1) AS firstword
        FROM part
        ORDER BY p_partkey
    """,
    tags=("F1",),
)
def q_string_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1: string functions (lower/upper/trim/substring/length/concat/
    lpad/regexp_replace/regexp_extract)."""
    part = scan(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.lower("p_name").alias("lname"),
        F.upper("p_brand").alias("ubrand"),
        F.trim("p_type").alias("ttype"),
        F.substring("p_name", 1, 5).alias("pfx"),
        F.length("p_name").alias("nlen"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size4"),
        F.regexp_replace("p_name", "[aeiou]", "").alias("novowel"),
        F.regexp_extract("p_name", "([a-z]+)", 1).alias("firstword"),
    ).orderBy("p_partkey")


@query(
    "q_datetime_fns",
    oracle="""
        SELECT o_orderkey,
               year(o_orderdate) AS y,
               month(o_orderdate) AS m,
               day(o_orderdate) AS d,
               date_trunc('month', o_orderdate) AS mstart,
               date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS days_to_y2k,
               epoch_ms(o_orderdate) AS ems,
               CAST(make_date(year(o_orderdate), month(o_orderdate), 1) AS VARCHAR) AS month_date,
               o_orderdate + INTERVAL 90 DAY AS due
        FROM orders
        ORDER BY o_orderkey
    """,
    tags=("F2",),
)
def q_datetime_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2: date/time functions (extract/trunc/diff/epoch/make_date/
    interval arithmetic) on ms-precision order timestamps."""
    orders = scan(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        F.date_trunc("month", F.col("o_orderdate")).alias("mstart"),
        F.datediff(
            F.lit("2000-01-01").cast("date"), F.col("o_orderdate").cast("date")
        ).alias("days_to_y2k"),
        F.unix_millis(F.col("o_orderdate").cast("timestamp")).alias("ems"),
        F.make_date(F.year("o_orderdate"), F.month("o_orderdate"), F.lit(1)).cast("string").alias("month_date"),
        (F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")).alias("due"),
    ).orderBy("o_orderkey")


@query(
    "q_math_fns",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               round(l_extendedprice, 1) AS r1,
               CAST(floor(l_quantity) AS BIGINT) AS fq,
               CAST(ceil(l_quantity) AS BIGINT) AS cq,
               round(abs(l_discount - 0.05), 6) AS ad,
               round(ln(l_extendedprice), 6) AS lnp,
               round(log10(l_extendedprice), 6) AS lgp,
               round(sqrt(l_quantity), 6) AS sq,
               round(pow(l_quantity, 2), 4) AS q2,
               l_orderkey % 7 AS m7,
               CAST(sign(l_discount - 0.05) AS BIGINT) AS sgn
        FROM lineitem
        WHERE l_orderkey < 1000
        ORDER BY l_orderkey, l_linenumber
    """,
    tags=("F3",),
)
def q_math_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3: math functions (round/floor/ceil/abs/ln/log10/sqrt/pow/mod/sign)."""
    li = scan(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 1000)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("r1"),
        F.floor("l_quantity").alias("fq"),
        F.ceil("l_quantity").alias("cq"),
        F.round(F.abs(F.col("l_discount") - 0.05), 6).alias("ad"),
        F.round(F.log(F.col("l_extendedprice")), 6).alias("lnp"),
        F.round(F.log10(F.col("l_extendedprice")), 6).alias("lgp"),
        F.round(F.sqrt("l_quantity"), 6).alias("sq"),
        F.round(F.pow("l_quantity", F.lit(2)), 4).alias("q2"),
        (F.col("l_orderkey") % 7).alias("m7"),
        F.signum(F.col("l_discount") - 0.05).cast("long").alias("sgn"),
    ).orderBy("l_orderkey", "l_linenumber")


@query(
    "q_conditional_fns",
    oracle="""
        SELECT o_orderkey,
               CASE WHEN o_totalprice > 300000 THEN 'high'
                    WHEN o_totalprice > 100000 THEN 'mid'
                    ELSE 'low' END AS band,
               coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status2,
               greatest(o_totalprice, 250000.0) AS g,
               least(o_totalprice, 250000.0) AS l
        FROM orders
        ORDER BY o_orderkey
    """,
    tags=("F4",),
)
def q_conditional_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4: CASE WHEN / coalesce / nullif / greatest / least."""
    orders = scan(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 300000, "high")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("low")
        .alias("band"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN")).alias(
            "status2"
        ),
        F.greatest("o_totalprice", F.lit(250000.0)).alias("g"),
        F.least("o_totalprice", F.lit(250000.0)).alias("l"),
    ).orderBy("o_orderkey")


@query(
    "q_array_fns",
    oracle="""
        SELECT doc_id,
               len(string_split(text, ' ')) AS n_tokens,
               list_contains(string_split(text, ' '), 'join') AS has_join,
               array_to_string(list_sort(string_split(text, ' '))[1:3], ',') AS first3_sorted,
               CAST(list_sum(list_transform(string_split(text, ' '),
                                            x -> length(x))) AS BIGINT) AS tok_chars,
               len(list_filter(string_split(text, ' '),
                               x -> length(x) > 5)) AS n_long_tokens
        FROM documents
        ORDER BY doc_id
    """,
    tags=("F5",),
)
def q_array_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5: array + higher-order functions (size/contains/sort/slice/
    transform/filter/aggregate) over tokenized documents."""
    docs = scan(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.array_contains(toks, "join").alias("has_join"),
        F.array_join(F.slice(F.sort_array(toks), 1, 3), ",").alias("first3_sorted"),
        F.aggregate(
            F.transform(toks, lambda x: F.length(x)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("tok_chars"),
        F.size(F.filter(toks, lambda x: F.length(x) > 5)).alias("n_long_tokens"),
    ).orderBy("doc_id")


@query(
    "q_map_fns",
    oracle="""
        SELECT event_id,
               CAST(json_extract(props, '$.k') AS BIGINT) AS k_val,
               array_to_string(json_keys(props), ',') AS keys
        FROM events
        ORDER BY event_id
    """,
    tags=("F6", "F7"),
)
def q_map_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6: map functions over JSON-derived MapType (from_json ->
    map_keys/element_at)."""
    ev = scan(spark, sf_dir, "events")
    m = F.from_json(F.col("props"), T.MapType(T.StringType(), T.LongType()))
    return ev.select(
        "event_id",
        F.element_at(m, "k").alias("k_val"),
        F.array_join(F.map_keys(m), ",").alias("keys"),
    ).orderBy("event_id")


@query(
    "q_json_extract",
    oracle="""
        SELECT CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS bucket,
               count(*) AS n
        FROM events
        GROUP BY bucket
        ORDER BY bucket
    """,
    tags=("F7", "A1"),
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7: get_json_object path extraction feeding an aggregate."""
    ev = scan(spark, sf_dir, "events")
    bucket = (F.get_json_object(F.col("props"), "$.k").cast("long") % 10).alias("bucket")
    return ev.groupBy(bucket).agg(F.count("*").alias("n")).orderBy("bucket")


@query(
    "q_hash_fns",
    oracle="""
        SELECT doc_id, sha256(text) AS h
        FROM documents
        ORDER BY doc_id
    """,
    tags=("F8",),
)
def q_hash_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8: cryptographic content hash (sha2-256 hex) — the fingerprint
    primitive exact dedup (L1) builds on."""
    docs = scan(spark, sf_dir, "documents")
    return docs.select("doc_id", F.sha2(F.col("text"), 256).alias("h")).orderBy("doc_id")


@query(
    "q_hash_engine_specific",
    oracle=None,  # xxhash64/murmur are engine-specific; rows-only check.
    tags=("F8",),
)
def q_hash_engine_specific(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8: engine-native hashes (xxhash64, murmur3) + unique row ids —
    partitioning/salting primitives; no cross-engine oracle exists."""
    docs = scan(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.xxhash64("text").alias("xx"),
        F.hash("text").alias("mm3"),
        F.monotonically_increasing_id().alias("row_id"),
    )


@query(
    "q_variant_extract",
    oracle="""
        SELECT CAST(json_extract(props, '$.k') AS BIGINT) // 10 AS bucket,
               count(*) AS n,
               CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
                 AS total_k
        FROM events
        GROUP BY bucket
        ORDER BY bucket
    """,
    tags=("F7", "variant"),
)
def q_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7 on the Spark 4 VARIANT type: ``parse_json`` converts the
    props JSON string into the binary-encoded Variant ONCE, then
    ``variant_get`` path extraction feeds a bucketed rollup. Variant
    is the at-scale semi-structured posture — parse once, extract
    many, ~8x faster than repeated string re-parsing with
    get_json_object (q_json_extract shows the legacy form).
    """
    ev = scan(spark, sf_dir, "events").select(
        F.parse_json("props").alias("v")
    )
    k = F.variant_get("v", "$.k", "long")
    # Integer `div`, not floor(k/10): DuckDB's `//` truncates toward
    # zero on BIGINT, floor rounds toward -inf — they diverge for
    # negative k (ADVICE.md scalar_fns.py:297; same reasoning as
    # q_week_over_week's truncating cast).
    return (
        ev.select(k.cast("long").alias("__k"))
        .select(F.expr("__k div 10").alias("bucket"), F.col("__k").alias("k"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n"), F.sum("k").alias("total_k"))
        .orderBy("bucket")
    )
