"""Advanced relational surface beyond the SURVEY.md §2 core: pivot /
unpivot, grouping sets, scalar + correlated subqueries, time-spine
gap-fill, exact percentiles, array argmax, the pure-SQL (CTE) entry
path, deterministic sampling, histograms, and time-range windows.

Scale notes (100 TB posture) per query are on the docstrings; the
shared principles:

* pivot/unpivot/grouping-sets are single-shuffle hash aggregates —
  Catalyst compiles pivot to one `HashAggregate` over
  `count(CASE WHEN ...)` columns (no per-value scans);
* scalar subqueries become broadcast joins (the 1-row aggregate side
  is trivially broadcastable, AQE does it without a hint);
* the time spine is generated from a 1-row aggregate (`sequence` +
  `explode`), so the spine costs O(#buckets), never O(#events);
* deterministic modulo sampling pushes the predicate into the parquet
  scan — at 100 TB a 5 % hash-sample reads row groups, not the world.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_log_analysis_spark.functions import (
    exact_avg,
    exact_avg_wide,
    money,
    money_sum,
)
from hadoop_log_analysis_spark.queries import query
from hadoop_log_analysis_spark.sources.catalog import register_views, scan

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@query(
    "q_pivot_event_day",
    oracle="""
        SELECT date_trunc('day', ts) AS d,
               count(*) FILTER (WHERE event_type = 'click')    AS click,
               count(*) FILTER (WHERE event_type = 'error')    AS error,
               count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
               count(*) FILTER (WHERE event_type = 'signup')   AS signup,
               count(*) FILTER (WHERE event_type = 'view')     AS view
        FROM events
        GROUP BY 1
        ORDER BY 1
    """,
    tags=("A1", "pivot"),
)
def q_pivot_event_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: daily event counts, one column per event_type.

    The explicit value list matters at scale: with it, Spark compiles
    the pivot into ONE aggregate pass (`count(CASE WHEN ...)` per
    value); without it, a separate distinct-values job runs first.
    """
    ev = scan(spark, sf_dir, "events")
    piv = (
        ev.groupBy(F.date_trunc("day", "ts").alias("d"))
        .pivot("event_type", list(EVENT_TYPES))
        .count()
    )
    # pivot emits NULL for absent (day, type) combos; the oracle's
    # FILTER counts emit 0 — normalize.
    return piv.select(
        "d", *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in EVENT_TYPES]
    ).orderBy("d")


@query(
    "q_unpivot_status_metrics",
    oracle="""
        SELECT o_orderstatus, 'n' AS metric, CAST(count(*) AS DOUBLE) AS val
        FROM orders GROUP BY o_orderstatus
        UNION ALL
        SELECT o_orderstatus, 'total' AS metric,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS val
        FROM orders GROUP BY o_orderstatus
        ORDER BY o_orderstatus, metric
    """,
    tags=("O3", "unpivot"),
)
def q_unpivot_status_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): wide per-status metrics to long (metric, val) rows.

    ``DataFrame.unpivot`` is a zero-shuffle narrow transform (an
    `Expand` node): n metric columns -> n rows per input row, no
    exchange — unlike the UNION-of-aggregates formulation, which
    re-scans the input per metric (fine for the oracle, wrong at scale).
    """
    orders = scan(spark, sf_dir, "orders")
    wide = orders.groupBy("o_orderstatus").agg(
        F.count("*").cast("double").alias("n"),
        money_sum("o_totalprice").alias("total"),
    )
    return wide.unpivot(
        ["o_orderstatus"], ["n", "total"], "metric", "val"
    ).orderBy("o_orderstatus", "metric")


@query(
    "q_grouping_sets",
    oracle="""
        SELECT coalesce(o_orderstatus, 'ALL')   AS status,
               coalesce(o_orderpriority, 'ALL') AS priority,
               count(*) AS n,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY status, priority
    """,
    tags=("A6", "sql-path"),
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6+: explicit GROUPING SETS via the SQL entry path (SURVEY.md §3.2.3).

    Rollup/cube are fixed lattices; GROUPING SETS picks exactly the
    granularities wanted — here two independent 1-D rollups + grand
    total in ONE pass (single Expand + HashAggregate, one shuffle)
    instead of three scans. Identical SQL text runs on both engines.
    """
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT coalesce(o_orderstatus, 'ALL')   AS status,
               coalesce(o_orderpriority, 'ALL') AS priority,
               count(*) AS n,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY status, priority
        """
    )


@query(
    "q_scalar_subquery",
    oracle="""
        SELECT c_custkey, round(c_acctbal, 2) AS bal
        FROM customer
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
        ORDER BY c_custkey
    """,
    tags=("J1", "subquery"),
)
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery: customers above the global average balance.

    DataFrame form: the 1-row aggregate is crossJoin-broadcast to every
    partition — the exact plan Catalyst builds for an uncorrelated
    scalar subquery. At 100 TB the broadcast side is 1 row; the fact
    side never shuffles.
    """
    cust = scan(spark, sf_dir, "customer")
    avg_bal = cust.agg(F.avg("c_acctbal").alias("_avg_bal"))
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_avg_bal"))
        .select("c_custkey", F.round("c_acctbal", 2).alias("bal"))
        .orderBy("c_custkey")
    )


@query(
    "q_above_customer_avg",
    oracle="""
        SELECT o_orderkey, round(o_totalprice, 2) AS price
        FROM orders o
        WHERE o_totalprice > (SELECT avg(o2.o_totalprice)
                              FROM orders o2
                              WHERE o2.o_custkey = o.o_custkey)
        ORDER BY o_orderkey
    """,
    tags=("W4", "subquery"),
)
def q_above_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated subquery: orders above their customer's average.

    Spark-first decorrelation: a window average over the grouping key
    replaces the per-row subquery — one shuffle on o_custkey instead
    of a self-join, and identical semantics (every row compares
    against its full-group mean).
    """
    orders = scan(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    return (
        orders.withColumn("_cust_avg", F.avg("o_totalprice").over(w))
        .filter(F.col("o_totalprice") > F.col("_cust_avg"))
        .select("o_orderkey", F.round("o_totalprice", 2).alias("price"))
        .orderBy("o_orderkey")
    )


@query(
    "q_gapfill_hours",
    oracle="""
        WITH b AS (SELECT min(date_trunc('hour', ts)) AS lo,
                          max(date_trunc('hour', ts)) AS hi
                   FROM events),
             spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hr
                       FROM b),
             e AS (SELECT date_trunc('hour', ts) AS hr, count(*) AS n
                   FROM events WHERE event_type = 'error' GROUP BY 1)
        SELECT spine.hr, coalesce(e.n, 0) AS n_errors
        FROM spine LEFT JOIN e USING (hr)
        ORDER BY spine.hr
    """,
    tags=("F2", "F5", "J3", "timeseries"),
)
def q_gapfill_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap-fill: dense hourly spine, zero-filled error counts.

    The spine comes from a 1-row (min, max) aggregate -> `sequence` ->
    `explode`: O(#hours) rows generated driver-free, then a broadcast
    left join against the (already tiny) hourly aggregate. No step is
    proportional to raw event count except the initial agg scans.
    """
    ev = scan(spark, sf_dir, "events")
    hr = F.date_trunc("hour", "ts")
    bounds = ev.agg(F.min(hr).alias("lo"), F.max(hr).alias("hi"))
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 hour"))).alias("hr")
    )
    errs = (
        ev.filter(F.col("event_type") == "error")
        .groupBy(hr.alias("hr"))
        .agg(F.count("*").alias("n"))
    )
    return (
        spine.join(errs, "hr", "left")
        .select("hr", F.coalesce("n", F.lit(0)).alias("n_errors"))
        .orderBy("hr")
    )


@query(
    "q_percentile_by_type",
    oracle="""
        SELECT event_type,
               round(quantile_cont(value, 0.5), 4) AS p50,
               round(quantile_cont(value, 0.9), 4) AS p90,
               round(quantile_cont(value, 0.99), 4) AS p99
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    tags=("A5",),
)
def q_percentile_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5+: exact interpolated percentiles per group.

    Spark `percentile` and DuckDB `quantile_cont` share linear
    interpolation semantics. Exact percentiles buffer each group's
    values — fine for bounded group counts; at 100 TB with huge groups
    switch to `approx_percentile` (t-digest, mergeable partial aggs),
    declared separately as rows-only (q_stats_agg covers approx).
    """
    ev = scan(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(value, 0.9)"), 4).alias("p90"),
            F.round(F.expr("percentile(value, 0.99)"), 4).alias("p99"),
        )
        .orderBy("event_type")
    )


@query(
    "q_array_argmax",
    oracle="""
        SELECT vec_id,
               round(CAST(list_max(embedding) AS DOUBLE), 6) AS max_val,
               CAST(list_position(embedding, list_max(embedding)) AS BIGINT) AS pos
        FROM embeddings
        ORDER BY vec_id
        LIMIT 100
    """,
    tags=("F5",),
)
def q_array_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5+: argmax over an array column (max component + its 1-based index).

    Pure built-ins (`array_max` / `array_position`) — stays inside
    whole-stage codegen, no UDF. The float32 component is widened to
    double BEFORE rounding on both sides so the representations match.
    """
    emb = scan(spark, sf_dir, "embeddings")
    return (
        emb.select(
            "vec_id",
            F.round(F.array_max("embedding").cast("double"), 6).alias("max_val"),
            F.array_position(
                F.col("embedding"), F.array_max("embedding")
            ).alias("pos"),
        )
        .orderBy("vec_id")
        .limit(100)
    )


@query(
    "q_monthly_above_avg_cte",
    oracle="""
        WITH m AS (SELECT date_trunc('month', o_orderdate) AS mon,
                          CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                               AS DOUBLE) AS rev
                   FROM orders GROUP BY 1)
        SELECT mon, rev FROM m
        WHERE rev > (SELECT CAST(sum(CAST(rev AS DECIMAL(18,2))) AS DOUBLE)
                            / count(*) FROM m)
        ORDER BY mon
    """,
    tags=("sql-path", "A1", "subquery"),
)
def q_monthly_above_avg_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure-SQL entry path (SURVEY.md §3.2.3): CTE + scalar subquery.

    The IDENTICAL SQL text runs on Spark (over registered views) and
    DuckDB — demonstrating the engine's second client surface. Spark
    plans the CTE once and reuses it for both the filter and the
    subquery side (ReusedExchange/InMemoryRelation at scale).
    """
    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH m AS (SELECT date_trunc('month', o_orderdate) AS mon,
                          CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                               AS DOUBLE) AS rev
                   FROM orders GROUP BY 1)
        SELECT mon, rev FROM m
        WHERE rev > (SELECT CAST(sum(CAST(rev AS DECIMAL(18,2))) AS DOUBLE)
                            / count(*) FROM m)
        ORDER BY mon
        """
    )


@query(
    "q_deterministic_sample",
    oracle="""
        SELECT count(*) AS n,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS total,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 / count(*) AS avg_price
        FROM orders
        WHERE o_orderkey % 20 = 0
    """,
    tags=("P2", "sampling"),
)
def q_deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 5% key-modulo sample with summary stats.

    `TABLESAMPLE`/`df.sample` are seed-dependent and engine-specific
    (never oracle-matchable); modulo-on-key sampling is reproducible
    across engines and re-runs — the right idiom for sampled dev runs
    over 100 TB. The predicate is a plain comparison, so it reaches the
    scan and benefits from row-group statistics where available.
    """
    orders = scan(spark, sf_dir, "orders")
    return orders.filter(F.col("o_orderkey") % 20 == 0).agg(
        F.count("*").alias("n"),
        money_sum("o_totalprice").alias("total"),
        (money_sum("o_totalprice") / F.count("*")).alias("avg_price"),
    )


@query(
    "q_doc_length_histogram",
    oracle="""
        SELECT CAST(floor(n_chars / 50) * 50 AS BIGINT) AS bucket,
               count(*) AS n
        FROM documents
        GROUP BY 1
        ORDER BY 1
    """,
    tags=("A1", "F3", "L5"),
)
def q_doc_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of document lengths (50-char buckets).

    The classic profiling query for a training corpus. One hash
    aggregate; cardinality = #buckets, so the shuffle is tiny at any
    scale.
    """
    docs = scan(spark, sf_dir, "documents")
    bucket = (F.floor(F.col("n_chars") / 50) * 50).cast("long").alias("bucket")
    return docs.groupBy(bucket).agg(F.count("*").alias("n")).orderBy("bucket")


@query(
    "q_time_range_window",
    oracle="""
        SELECT event_id,
               CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
                 / count(value) OVER w AS avg_1h
        FROM events
        WINDOW w AS (PARTITION BY user_id
                     ORDER BY epoch_ns(ts) // 1000000000
                     RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
        ORDER BY event_id
    """,
    tags=("W4", "F2", "timeseries"),
)
def q_time_range_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4+: per-user trailing 1-hour moving average (RANGE frame on time).

    A true time-range frame (not row-count): peers are all events of
    the same user within the past 3600 s. Ordering on integer epoch
    seconds keeps Spark and DuckDB frame semantics identical (both
    include equal-key peers). One shuffle on user_id; the sort within
    partitions is the same sort the sessionizer needs — on a real
    pipeline these share an exchange.
    """
    ev = scan(spark, sf_dir, "events")
    # integer `div` is mandatory: float division of ~1.7e18 ns loses
    # precision above 2^53 (same rule as the catalog's ts repair).
    epoch_s = F.expr("ts_ns div 1000000000")
    w = (
        Window.partitionBy("user_id")
        .orderBy(epoch_s)
        .rangeBetween(-3600, Window.currentRow)
    )
    return (
        # exact DECIMAL window sum / window count: a windowed float avg
        # differs across engines (DuckDB segment-tree association)
        ev.select(
            "event_id",
            (
                F.sum(money("value")).over(w).cast("double")
                / F.count("value").over(w)
            ).alias("avg_1h"),
        ).orderBy("event_id")
    )


@query(
    "q_recursive_hierarchy_rollup",
    oracle="""
        WITH RECURSIVE totals AS (
          SELECT user_id, sum(CAST(value AS DECIMAL(18,2))) AS tot FROM events GROUP BY user_id),
        anc(u, a) AS (
          SELECT user_id, user_id FROM totals
          UNION ALL
          SELECT u, a // 2 FROM anc WHERE a > 0)
        SELECT a AS node, count(DISTINCT u) AS n_users,
               CAST(sum(t.tot) AS DOUBLE) AS subtree_value
        FROM anc JOIN totals t ON anc.u = t.user_id
        WHERE a < 8
        GROUP BY a
        ORDER BY a
    """,
    tags=("iterative", "sql", "A1"),
)
def q_recursive_hierarchy_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup via Spark 4's NATIVE recursive CTE: users
    form a derived binary-tree taxonomy (parent = id/2) and each
    node accumulates the event value of its whole subtree by walking
    every user's ancestor chain. The ancestor id strictly decreases,
    so the UNION ALL recursion (Spark's supported recursive form —
    UNION-dedup recursion is not yet in 4.1) terminates in
    O(log2 max_id) ~ 11 steps, far under the 100-level default cap.
    DuckDB runs the equivalent recursion (`//` = `div`, both truncate
    non-negative ids identically) as the oracle — a full hash-matched
    check of Catalyst's recursive execution.

    Scale: the per-user totals aggregate first (shuffle bounded by
    |users|), the recursion then walks ~|users| * log(depth) id PAIRS,
    never raw events.
    """
    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH RECURSIVE totals AS (
          SELECT user_id, sum(CAST(value AS DECIMAL(18,2))) AS tot FROM events GROUP BY user_id),
        anc(u, a) AS (
          SELECT user_id, user_id FROM totals
          UNION ALL
          SELECT u, a div 2 FROM anc WHERE a > 0)
        SELECT a AS node, count(DISTINCT u) AS n_users,
               CAST(sum(t.tot) AS DOUBLE) AS subtree_value
        FROM anc JOIN totals t ON anc.u = t.user_id
        WHERE a < 8
        GROUP BY a
        ORDER BY a
        """
    )


@query(
    "q_lateral_top_lineitems",
    oracle="""
        WITH top_o AS (SELECT o_orderkey, o_totalprice FROM orders
                       ORDER BY o_totalprice DESC, o_orderkey LIMIT 10)
        SELECT o.o_orderkey, l.l_linenumber,
               round(l.l_extendedprice, 2) AS price
        FROM top_o o, LATERAL (
          SELECT l_linenumber, l_extendedprice FROM lineitem
          WHERE l_orderkey = o.o_orderkey
          ORDER BY l_extendedprice DESC, l_linenumber LIMIT 2) l
        ORDER BY o.o_orderkey, price DESC, l.l_linenumber
    """,
    tags=("J5", "sql", "subquery"),
)
def q_lateral_top_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with per-row ORDER BY + LIMIT — the
    top-2 priciest lineitems for each of the 10 highest-value orders.
    LATERAL is the SQL spelling of "top-k per group against a driving
    row set"; identical SQL runs on DuckDB as the oracle.

    Scale: Catalyst decorrelates the lateral into a join + per-key
    limit over the 10-row driving side — the lineitem scan is filtered
    by the (broadcastable) key set, never fully sorted.
    """
    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH top_o AS (SELECT o_orderkey, o_totalprice FROM orders
                       ORDER BY o_totalprice DESC, o_orderkey LIMIT 10)
        SELECT o.o_orderkey, l.l_linenumber,
               round(l.l_extendedprice, 2) AS price
        FROM top_o o, LATERAL (
          SELECT l_linenumber, l_extendedprice FROM lineitem
          WHERE l_orderkey = o.o_orderkey
          ORDER BY l_extendedprice DESC, l_linenumber LIMIT 2) l
        ORDER BY o.o_orderkey, price DESC, l.l_linenumber
        """
    )


@query(
    "q_winsorized_stats",
    oracle="""
        WITH b AS (SELECT event_type,
                          quantile_disc(value, 0.05) AS lo,
                          quantile_disc(value, 0.95) AS hi
                   FROM events GROUP BY event_type)
        SELECT e.event_type,
               count(*) AS n,
               CAST(sum(CASE WHEN value < lo OR value > hi THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_clipped,
               CAST(sum(CAST(floor(least(greatest(value, lo), hi)
                                   * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
                 / (CAST(count(least(greatest(value, lo), hi)) AS DOUBLE)
                    * 1000000.0) AS wins_avg,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                 / count(*) AS raw_avg
        FROM events e JOIN b USING (event_type)
        GROUP BY e.event_type
        ORDER BY e.event_type
    """,
    tags=("A5", "quality", "curation"),
)
def q_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized statistics: per-group values clipped to their exact
    [p05, p95] band before averaging — the outlier-robust mean a
    metrics/curation pipeline reports next to the raw mean, plus the
    clipped-row count (how heavy the tails were).

    The band uses DISCRETE (nearest-rank ANSI percentile_disc)
    percentiles, not interpolated ones (r10, sf1-probe finding): an
    interpolated percentile is an engine-COMPUTED double, and the two
    engines' interpolations differ by an ulp at some group sizes — at
    sf1, where replicated values sit exactly ON the boundary, 50 rows
    classified differently (the "grid-pin boundary flip" residual the
    r9 README documents, finally observed). A discrete percentile is
    an actual data value selected from the same sorted multiset, so
    the clamp bounds are bit-identical on both engines BY CONSTRUCTION
    (verified equal at sf0.01/0.1/sf1) and the residual class is
    eliminated for this query, not just shrunk.

    Scale shape: the percentile bounds are one bounded-cardinality
    aggregate (|groups| rows) broadcast back onto the stream; the clip
    itself is least/greatest map arithmetic and the final stats get
    map-side partial aggregation. Exact percentiles buffer per-group
    values (fine at |groups| ~ 5); at huge groups swap
    approx_percentile, same plan shape.
    """
    ev = scan(spark, sf_dir, "events").select("event_type", "value")
    bounds = ev.groupBy("event_type").agg(
        F.expr("percentile_disc(0.05) WITHIN GROUP (ORDER BY value)").alias("lo"),
        F.expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY value)").alias("hi"),
    )
    clipped = F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi"))
    return (
        ev.join(F.broadcast(bounds), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(
                F.when(
                    (F.col("value") < F.col("lo"))
                    | (F.col("value") > F.col("hi")),
                    1,
                ).otherwise(0)
            ).alias("n_clipped"),
            # the clamp bounds are discrete percentiles (actual data
            # values, bit-identical cross-engine), so the clipped term
            # is identical per row; the grid pin remains for the
            # order-free exact average, and the raw avg is ONE
            # division of the exact DECIMAL sum. The accumulator is
            # the DECIMAL(38,0) _wide tier (r11 pre-escalation: this
            # was the registry's tightest int64 margin, tripping at
            # ~sf80; DuckDB's sum(BIGINT) is HUGEINT already, so the
            # oracle needs no change and the site is now sf1e20-class)
            exact_avg_wide(clipped, 6).alias("wins_avg"),
            (money_sum("value") / F.count("*")).alias("raw_avg"),
        )
        .orderBy("event_type")
    )


_HIERARCHY_SQL = """
    WITH RECURSIVE chain AS (
        SELECT user_id, user_id AS ancestor, 0 AS depth
        FROM (SELECT DISTINCT user_id FROM events) u
        UNION ALL
        SELECT user_id, CAST(floor(ancestor / 2) AS BIGINT) AS ancestor,
               depth + 1
        FROM chain WHERE ancestor > 1
    )
    SELECT depth, count(*) AS n_users
    FROM (SELECT user_id, max(depth) AS depth FROM chain GROUP BY user_id) d
    GROUP BY depth
    ORDER BY depth
"""


@query("q_recursive_hierarchy", oracle=_HIERARCHY_SQL, tags=("A6", "sql", "graph"))
def q_recursive_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE hierarchy traversal (Spark 4's WITH RECURSIVE):
    each user climbs a synthetic management chain (parent = id / 2,
    root = 1) and the report histograms users by depth-to-root — the
    org-chart / BOM-explosion query class engines without recursion
    cannot express declaratively. The IDENTICAL SQL text runs on both
    engines (the oracle IS the query), the strongest possible parity.

    Scale note: each recursion step is one self-join of the frontier
    against nothing but itself (the frontier shrinks as chains hit the
    root), so total work is sum over depths of |active users| —
    bounded by |users| * max_depth, with max_depth = log2(max_id) for
    this chain. CAST(floor(a / 2)) rather than integer `//`/`DIV`
    because it parses identically in both dialects.
    """
    from hadoop_log_analysis_spark.sources.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_HIERARCHY_SQL)


# Target: smallest integer threshold T such that documents with
# n_chars >= T hold at most 1/4 of total corpus characters — the
# "keep only the longest docs up to a char budget" cutoff, stated as
# integer math (f(T) * 4 <= total) so both engines compare exactly.
_SCRIPT_SQL = """
BEGIN
  DECLARE lo BIGINT DEFAULT 0;
  DECLARE hi BIGINT;
  DECLARE mid BIGINT;
  DECLARE f BIGINT;
  DECLARE total BIGINT;
  SET total = (SELECT sum(n_chars) FROM documents);
  SET hi = (SELECT max(n_chars) + 1 FROM documents);
  WHILE lo < hi DO
    SET mid = (lo + hi) DIV 2;
    SET f = (SELECT coalesce(sum(n_chars), 0) FROM documents
             WHERE n_chars >= mid);
    IF f * 4 <= total THEN
      SET hi = mid;
    ELSE
      SET lo = mid + 1;
    END IF;
  END WHILE;
  SELECT CAST(lo AS INT) AS threshold,
         (SELECT count(*) FROM documents WHERE n_chars >= lo) AS kept_docs,
         (SELECT coalesce(sum(n_chars), 0) FROM documents
          WHERE n_chars >= lo) AS kept_chars;
END
"""


@query(
    "q_sql_script_threshold",
    oracle="""
        WITH t AS (SELECT CAST(sum(n_chars) AS BIGINT) AS total
                   FROM documents),
         v AS (SELECT DISTINCT n_chars AS v FROM documents),
         s AS (SELECT v, (SELECT CAST(coalesce(sum(n_chars), 0) AS BIGINT)
                          FROM documents d WHERE d.n_chars >= v.v) AS f
               FROM v),
         k AS (SELECT CAST(coalesce(max(CASE WHEN f * 4 > total THEN v END),
                                    -1) + 1 AS INT) AS threshold
               FROM s, t)
        SELECT threshold,
               (SELECT count(*) FROM documents WHERE n_chars >= threshold)
                   AS kept_docs,
               (SELECT CAST(coalesce(sum(n_chars), 0) AS BIGINT)
                FROM documents WHERE n_chars >= threshold) AS kept_chars
        FROM k
    """,
    tags=("scripting", "A2", "curation"),
)
def q_sql_script_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL SCRIPTING (BEGIN/DECLARE/WHILE/IF): a binary search
    over the integer cutoff T finds the smallest threshold at which
    "documents with n_chars >= T" hold <= 1/4 of total corpus
    characters — the iterative parameter-search pattern (each loop
    step is one aggregate over the data) that procedural pipelines
    run around their engines; scripting runs it INSIDE the engine.
    The oracle finds the same threshold by a completely different,
    closed-form method (suffix sums over the distinct-value domain:
    threshold = 1 + the largest value still over budget) — so the
    hash match validates the loop's fixed point, not a transcription.

    Scale shape: ~log2(max_n_chars) iterations, each one a pushed-down
    filter + sum aggregate (map-side combinable); driver holds only
    the scalar loop state.
    """
    from hadoop_log_analysis_spark.sources.catalog import register_views

    register_views(spark, sf_dir)
    old = spark.conf.get("spark.sql.scripting.enabled", "false")
    spark.conf.set("spark.sql.scripting.enabled", "true")
    try:
        return spark.sql(_SCRIPT_SQL)
    finally:
        spark.conf.set("spark.sql.scripting.enabled", old)
