"""Spark 4 modern-SQL surface: pipe syntax (|>), SQL-language UDFs
(CREATE FUNCTION ... RETURN, both scalar and table-valued), and
string collations (UTF8_LCASE).

These are engine *dialect* features, not new physical operators: each
query here compiles to the same Catalyst plan its classic-SQL twin
would, so the scale posture is inherited from the underlying
aggregate/filter/join — the point of registering them is that a user
of a modern warehouse dialect can run their syntax unchanged on this
engine, hash-verified against a classic-ANSI DuckDB oracle (which is
itself the proof that the dialect features are sugar, not semantics).

Scale notes where a feature DOES change the physical plan are on the
individual docstrings (collation vs. parquet predicate pushdown is
the one real trap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_log_analysis_spark.queries import query
from hadoop_log_analysis_spark.sources.catalog import register_views


@query(
    "q_sql_pipe_syntax",
    oracle="""
        SELECT o_orderpriority,
               count(*) AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS revenue,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 / count(*) AS avg_price
        FROM orders
        WHERE o_orderstatus <> 'F'
        GROUP BY o_orderpriority
        HAVING count(*) > 10
        ORDER BY o_orderpriority
    """,
    tags=("A1", "A8", "dialect", "pipe"),
)
def q_sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL pipe syntax (|>): the open-orders revenue report
    written as a linear FROM -> WHERE -> AGGREGATE -> WHERE(HAVING) ->
    ORDER BY pipeline instead of nested classic SQL.

    The |> operators are pure parser sugar — `.explain` shows the
    identical single hash-aggregate plan as the classic GROUP
    BY/HAVING twin the oracle runs (filter pushed below the aggregate,
    map-side partial agg, one shuffle on o_orderpriority), so the 100
    TB posture is exactly A1/A8's. A post-AGGREGATE `|> WHERE` is the
    pipe dialect's HAVING; Catalyst folds it onto the aggregate node.
    """
    register_views(spark, sf_dir)
    return spark.sql(
        """
        FROM orders
        |> WHERE o_orderstatus <> 'F'
        |> AGGREGATE count(*) AS n_orders,
                     CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                          AS DOUBLE) AS revenue,
                     CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                          AS DOUBLE) / count(*) AS avg_price
           GROUP BY o_orderpriority
        |> WHERE n_orders > 10
        |> ORDER BY o_orderpriority
        """
    )


@query(
    "q_sql_udf_quality",
    oracle="""
        WITH t AS (
          SELECT doc_id, lang, n_chars,
                 len(string_split(text, ' ')) AS n_toks
          FROM documents),
        s AS (
          SELECT doc_id, lang,
                 CASE WHEN n_toks = 0 THEN 0.0
                      ELSE round(least(n_chars * 1.0 / n_toks, 12.0)
                                 / 12.0, 6) END AS quality
          FROM t)
        SELECT lang,
               count(*) AS n_docs,
               round(avg(quality), 6) AS avg_quality,
               count(*) FILTER (WHERE quality >= 0.4) AS n_good
        FROM s
        GROUP BY lang
        ORDER BY lang
    """,
    tags=("F4", "dialect", "udf", "L7"),
)
def q_sql_udf_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL-language scalar UDF (CREATE TEMPORARY FUNCTION ...
    RETURN <expr>): a reusable `doc_quality(n_chars, n_toks)` score
    (clipped mean-token-length, normalized to [0,1]) declared once in
    pure SQL and applied per document, then aggregated per language.

    Unlike a Python UDF, a SQL UDF is *inlined by the analyzer* into
    the calling plan — the aggregate below runs entirely inside
    whole-stage codegen with zero serialization boundary, which is
    exactly why SQL UDFs are the right way to share scalar logic at
    100 TB (the oracle inlines the same expression by hand; the hash
    match proves the inlining is semantics-preserving).
    """
    register_views(spark, sf_dir)
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION doc_quality(
            n_chars BIGINT, n_toks BIGINT)
        RETURNS DOUBLE
        RETURN CASE WHEN n_toks = 0 THEN 0.0
                    ELSE round(least(n_chars * CAST(1.0 AS DOUBLE)
                                     / n_toks, 12.0) / 12.0, 6) END
        """
    )
    return spark.sql(
        """
        WITH t AS (
          SELECT doc_id, lang,
                 doc_quality(n_chars, size(split(text, ' '))) AS quality
          FROM documents)
        SELECT lang,
               count(*) AS n_docs,
               round(avg(quality), 6) AS avg_quality,
               count(CASE WHEN quality >= 0.4 THEN 1 END) AS n_good
        FROM t
        GROUP BY lang
        ORDER BY lang
        """
    )


@query(
    "q_sql_table_function",
    oracle="""
        SELECT doc_id, lang, n_chars
        FROM documents
        WHERE n_chars >= 400
        ORDER BY n_chars DESC, doc_id
        LIMIT 25
    """,
    tags=("dialect", "udf", "U5"),
)
def q_sql_table_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL table-valued UDF (CREATE TEMPORARY FUNCTION ...
    RETURNS TABLE): `long_docs(min_chars)` — a parameterized view over
    the corpus, invoked in the FROM clause like a table.

    The analyzer splices the function body into the plan with the
    argument substituted, so `min_chars` lands as a *pushable* parquet
    filter (PushedFilters: GreaterThanOrEqual(n_chars,400)) — the
    parameterized-view pattern keeps curation thresholds in one
    definition without costing pushdown. Top-25 is
    TakeOrderedAndProject, no global sort.
    """
    register_views(spark, sf_dir)
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION long_docs(min_chars BIGINT)
        RETURNS TABLE(doc_id BIGINT, lang STRING, n_chars BIGINT)
        RETURN SELECT doc_id, lang, n_chars
               FROM documents WHERE n_chars >= min_chars
        """
    )
    return spark.sql(
        """
        SELECT doc_id, lang, n_chars
        FROM long_docs(400)
        ORDER BY n_chars DESC, doc_id
        LIMIT 25
        """
    )


@query(
    "q_collated_filter",
    oracle="""
        SELECT p_brand,
               count(*) AS n_parts,
               CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS total_price
        FROM part
        WHERE lower(p_type) = 'economy'
        GROUP BY p_brand
        ORDER BY p_brand
    """,
    tags=("F1", "dialect", "collation"),
)
def q_collated_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 string collations: a case-insensitive predicate via
    UTF8_LCASE instead of wrapping both sides in lower().

    Non-vacuous by construction: p_type is stored upper-case
    ('ECONOMY') and the literal is lower-case, so the binary
    comparison matches zero rows and only collation-aware equality
    produces the report (the oracle proves the same rows via
    lower()).

    Scale trap, stated honestly: a *collated* comparison is opaque to
    parquet predicate pushdown (min/max stats are binary-ordered), so
    at 100 TB this scan reads every row group where `lower(p_type) =
    'economy'` with a plain function predicate would too — collation
    buys correctness/ergonomics, not pruning. Keep collated columns
    OUT of partition/sort keys; pre-normalize at ingest when the
    filter must prune.
    """
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT p_brand,
               count(*) AS n_parts,
               CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS total_price
        FROM part
        WHERE p_type = 'economy' COLLATE UTF8_LCASE
        GROUP BY p_brand
        ORDER BY p_brand
        """
    )


@query(
    "q_parameterized_sql",
    oracle="""
        SELECT lang, source,
               count(*) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS total_chars
        FROM documents
        WHERE n_chars >= 100
        GROUP BY lang, source
        ORDER BY lang, source
    """,
    tags=("dialect", "A1", "api"),
)
def q_parameterized_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 parameterized SQL: named-parameter binding
    (spark.sql(..., args={...})) for the value, IDENTIFIER(:tbl) for
    the *table name*, and GROUP BY ALL / ORDER BY ALL dialect sugar.

    This is the injection-safe templating surface a multi-tenant
    pipeline needs — the table name and threshold arrive as bound
    parameters, never string-spliced, and IDENTIFIER() keeps the name
    in identifier position so a value can't smuggle syntax. The
    analyzer substitutes both before optimization, so the plan is the
    SAME pushed-down scan as the literal query (threshold lands in
    PushedFilters); GROUP BY ALL resolves to the non-aggregate
    select-list columns at analysis time — sugar, not semantics.
    """
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT lang, source,
               count(*) AS n_docs,
               sum(n_chars) AS total_chars
        FROM IDENTIFIER(:tbl)
        WHERE n_chars >= :min_chars
        GROUP BY ALL
        ORDER BY ALL
        """,
        args={"tbl": "documents", "min_chars": 100},
    )


@query(
    "q_approx_top_k",
    oracle="""
        SELECT tok, count(*) AS est_count
        FROM (SELECT unnest(string_split(text, ' ')) AS tok
              FROM documents)
        GROUP BY tok
        ORDER BY est_count DESC, tok
    """,
    tags=("A4", "sketch", "L5"),
)
def q_approx_top_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 approx_top_k: heavy-hitter estimation as ONE sketch
    aggregate (mergeable across partitions, map-side combinable)
    instead of the full groupBy + sort.

    Honest exactness bound, which is why this can carry a full hash
    oracle: the sketch tracks up to maxItemsTracked items and its
    counts are EXACT whenever the number of distinct items stays under
    that capacity — here k and the capacity (10000) both exceed the
    corpus vocabulary, so the estimates provably equal the true counts
    the oracle computes. On a 100 TB corpus with an open vocabulary
    the same call returns approximations with one-sided error
    (overestimates only) — this is the regime where the two-pass exact
    Misra-Gries (q_heavy_hitters, operators/sketch.py) is the right
    tool and approx_top_k is the cheap first pass. Output re-sorted
    (count desc, token) so ranking is deterministic, not
    sketch-internal order.
    """
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT t.item AS tok, t.count AS est_count
        FROM (
          SELECT explode(approx_top_k(tok, 1000)) AS t
          FROM (SELECT explode(split(text, ' ')) AS tok FROM documents)
        )
        ORDER BY est_count DESC, tok
        """
    )


@query(
    "q_sql_group_by_all",
    oracle="""
        SELECT extract(year FROM o_orderdate) AS yr,
               o_orderpriority AS priority,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS revenue
        FROM orders
        GROUP BY ALL
        ORDER BY ALL
    """,
    tags=("A1", "O1", "dialect"),
)
def q_sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL / ORDER BY ALL (Spark 4 and DuckDB share the
    dialect — the oracle here is literally the same statement): the
    engine infers the grouping key as every non-aggregate select
    item and the ordering as the full select list. Pure analysis-
    time sugar — the resolved plan is the ordinary two-key hash
    aggregate + sort, so pushdown/partial-agg posture is exactly
    A1/O1's; what this query pins is that the INFERENCE (which
    columns are grouping columns, which direction ORDER BY ALL
    sorts) matches across engines, so a user porting ad-hoc DuckDB
    analysis SQL onto the cluster gets identical results.
    """
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT year(o_orderdate) AS yr,
               o_orderpriority AS priority,
               count(*) AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS revenue
        FROM orders
        GROUP BY ALL
        ORDER BY ALL
        """
    )
