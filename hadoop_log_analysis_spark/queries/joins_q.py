"""Join operators J1-J8 (SURVEY.md §2.3).

Join-strategy posture for 100 TB: dimension tables (region, nation,
supplier, customer at realistic scale-out ratios) broadcast — the
MapReduce "map-side join" idiom, explicit via broadcast() where we
know cardinality, otherwise AQE converts at runtime. Fact-to-fact
joins (lineitem x orders, events x events) shuffle on the join key —
sort-merge by default, AQE splits skewed partitions. Non-equi joins
(J5/J6) carry an equality component wherever semantics allow so Spark
plans a hash/merge join with a range residual instead of a pure BNLJ.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_log_analysis_spark.functions import money, money_sum, rate, ts_us
from hadoop_log_analysis_spark.operators.joins import asof_join
from hadoop_log_analysis_spark.queries import query
from hadoop_log_analysis_spark.operators.partitioning import maybe_broadcast
from hadoop_log_analysis_spark.sources.catalog import scan, table_bytes

# epoch seconds of 2024-01-01T00:00:00Z — base for synthetic order
# timestamps in the as-of queries (BASELINE.md q_asof_join draft).
_EPOCH_2024 = 1_704_067_200
_NS = 1_000_000_000


@query(
    "q_broadcast_join",
    oracle="""
        SELECT n_name, count(*) AS n_suppliers,
               CAST(sum(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name IN ('ASIA', 'EUROPE')
        GROUP BY n_name
        ORDER BY n_name
    """,
    tags=("J1", "A1"),
)
def q_broadcast_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: explicit broadcast of small dims onto the fact — map-side join."""
    supplier = scan(spark, sf_dir, "supplier")
    nation = scan(spark, sf_dir, "nation")
    region = scan(spark, sf_dir, "region").filter(F.col("r_name").isin("ASIA", "EUROPE"))
    return (
        supplier.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_suppliers"),
            # exact DECIMAL sum (functions.money_sum): a double sum
            # can flip a 2-dp boundary with accumulation order
            money_sum("s_acctbal").alias("total_bal"),
        )
        .orderBy("n_name")
    )


@query(
    "q_join5",
    oracle="""
        SELECT n_name,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(5,2)))) AS DOUBLE)
                 AS revenue
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name
    """,
    tags=("J1", "J2", "A1", "O1"),
)
def q_join5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1+J2: TPC-H Q5 shape — 6-table star join, facts shuffled, dims
    broadcast; revenue per nation.

    Join order is selectivity-first (Catalyst does not reorder joins
    without CBO stats): the region filter propagates through
    nation -> supplier as one dim chain, so lineitem is cut to
    ~1/|regions| BEFORE the lineitem-orders shuffle — at 100 TB that
    is the difference between shuffling 20 TB and 4 TB. Measured at
    sf0.1: 1.9 s -> 1.0 s fresh-plan vs the dims-last order.

    Broadcast policy: only the fixed-cardinality dims (nation=25,
    region=5 rows, forever) carry unconditional hints. The
    supplier-derived dim chain SCALES with SF (10k rows x SF — ~170 GB
    at 100 TB), so it goes through ``maybe_broadcast`` (operators/
    partitioning.py): hinted only when the measured on-disk size x
    decompression factor fits the session threshold, a shuffled join
    by construction otherwise — never a forced-broadcast OOM.
    """
    customer = scan(spark, sf_dir, "customer")
    orders = scan(spark, sf_dir, "orders")
    lineitem = scan(spark, sf_dir, "lineitem")
    supplier = scan(spark, sf_dir, "supplier")
    nation = scan(spark, sf_dir, "nation")
    region = scan(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    dims = (
        supplier.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "n_name")
    )
    return (
        lineitem.join(
            maybe_broadcast(dims, table_bytes(sf_dir, "supplier")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("n_name")
        # exact DECIMAL revenue (the q_hhi idiom): revenue is also the
        # ORDER key, so the decimal sum makes the ordering exact too
        .agg(
            F.sum(
                money("l_extendedprice")
                * (F.lit(1).cast("decimal(5,2)") - rate("l_discount"))
            )
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), "n_name")
    )


@query(
    "q_join_fact_fact",
    oracle="""
        SELECT o_orderpriority, count(*) AS n_lines,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    tags=("J2", "A1"),
)
def q_join_fact_fact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: shuffled fact-to-fact equi-join (reduce-side join idiom);
    no broadcast hint — Catalyst/AQE pick the strategy."""
    lineitem = scan(spark, sf_dir, "lineitem")
    orders = scan(spark, sf_dir, "orders")
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_lines"),
            money_sum("l_extendedprice").alias("total"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "q_left_join_counts",
    oracle="""
        SELECT c_custkey, count(o_orderkey) AS n_orders
        FROM customer
        LEFT JOIN orders ON o_custkey = c_custkey
        GROUP BY c_custkey
        ORDER BY c_custkey
    """,
    tags=("J3",),
)
def q_left_join_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: left outer join — order counts per customer including zeros."""
    customer = scan(spark, sf_dir, "customer")
    orders = scan(spark, sf_dir, "orders")
    return (
        customer.join(orders, F.col("o_custkey") == F.col("c_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
        .orderBy("c_custkey")
    )


@query(
    "q_full_outer_counts",
    oracle="""
        SELECT coalesce(o.k, e.k) AS k,
               coalesce(o.n_orders, 0) AS n_orders,
               coalesce(e.n_events, 0) AS n_events
        FROM (SELECT o_custkey AS k, count(*) AS n_orders FROM orders GROUP BY o_custkey) o
        FULL JOIN (SELECT user_id AS k, count(*) AS n_events FROM events GROUP BY user_id) e
          ON o.k = e.k
        ORDER BY k
    """,
    tags=("J3",),
)
def q_full_outer_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: full outer join of two aggregates (activity reconciliation)."""
    orders = scan(spark, sf_dir, "orders")
    events = scan(spark, sf_dir, "events")
    o = orders.groupBy(F.col("o_custkey").alias("k")).agg(F.count("*").alias("n_orders"))
    e = events.groupBy(F.col("user_id").alias("k")).agg(F.count("*").alias("n_events"))
    return (
        o.join(e, "k", "full")
        .select(
            "k",
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
        )
        .orderBy("k")
    )


@query(
    "q_semi_join",
    oracle="""
        SELECT c_custkey FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        ORDER BY c_custkey
    """,
    tags=("J4",),
)
def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: left-semi join — customers with at least one big order."""
    customer = scan(spark, sf_dir, "customer")
    big = scan(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return (
        customer.join(big, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .select("c_custkey")
        .orderBy("c_custkey")
    )


@query(
    "q_anti_join",
    oracle="""
        SELECT c_custkey FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM events WHERE user_id = c_custkey)
        ORDER BY c_custkey
    """,
    tags=("J4",),
)
def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: left-anti join — customers that never produced an event."""
    customer = scan(spark, sf_dir, "customer")
    events = scan(spark, sf_dir, "events")
    return (
        customer.join(events, F.col("c_custkey") == F.col("user_id"), "left_anti")
        .select("c_custkey")
        .orderBy("c_custkey")
    )


@query(
    "q_cross_join",
    oracle="""
        SELECT r_name, n_name FROM region CROSS JOIN nation
        ORDER BY r_name, n_name
    """,
    tags=("J5",),
)
def q_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5: explicit cartesian product (tiny dims only, by construction)."""
    region = scan(spark, sf_dir, "region")
    nation = scan(spark, sf_dir, "nation")
    return region.crossJoin(nation).select("r_name", "n_name").orderBy("r_name", "n_name")


@query(
    "q_theta_band_join",
    oracle="""
        SELECT p_partkey, count(*) AS n_matches
        FROM part JOIN lineitem
          ON l_extendedprice BETWEEN p_retailprice * 0.9 AND p_retailprice * 1.1
        WHERE p_partkey < 50
        GROUP BY p_partkey
        ORDER BY p_partkey
    """,
    tags=("J5",),
)
def q_theta_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5: theta (non-equi) band join — price-band matching. The small
    side is broadcast so the BNLJ is a broadcast-nested-loop, the only
    viable physical strategy for a pure inequality predicate."""
    part = scan(spark, sf_dir, "part").filter(F.col("p_partkey") < 50)
    lineitem = scan(spark, sf_dir, "lineitem")
    cond = F.col("l_extendedprice").between(
        F.col("p_retailprice") * 0.9, F.col("p_retailprice") * 1.1
    )
    return (
        F.broadcast(part)
        .join(lineitem, cond)
        .groupBy("p_partkey")
        .agg(F.count("*").alias("n_matches"))
        .orderBy("p_partkey")
    )


@query(
    "q_range_join",
    oracle="""
        SELECT p.event_id AS purchase_id, count(*) AS n_following
        FROM (SELECT user_id, event_id, epoch_us(ts) AS tns FROM events
              WHERE event_type = 'purchase') p
        JOIN (SELECT user_id, epoch_us(ts) AS tns FROM events) e
          ON e.user_id = p.user_id
         AND e.tns > p.tns
         AND e.tns <= p.tns + 3600000000
        GROUP BY p.event_id
        ORDER BY p.event_id
    """,
    tags=("J6",),
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6: interval join with an equality component — activity within
    1h after each purchase. The user_id equality makes it a hash/merge
    join with a range residual, not a BNLJ."""
    ev = scan(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), "event_id", ts_us().alias("p_tns")
    )
    e = ev.select(F.col("user_id").alias("e_user"), ts_us().alias("e_tns"))
    hour_us = 3_600_000_000
    return (
        p.join(
            e,
            (F.col("e_user") == F.col("p_user"))
            & (F.col("e_tns") > F.col("p_tns"))
            & (F.col("e_tns") <= F.col("p_tns") + hour_us),
        )
        .groupBy(F.col("event_id").alias("purchase_id"))
        .agg(F.count("*").alias("n_following"))
        .orderBy("purchase_id")
    )


def _orders_with_synth_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic order timestamps (µs) in the events time range
    (BASELINE.md), deduplicated per timestamp.

    The ``o_orderkey % 2_592_000`` fold is collision-free at the
    driver SFs (max orderkey < 2 592 000) but collides at larger key
    ranges (first observed on the sf1 scale probe: 1.5M keys spanning
    10 replicas → ~29 % slot fill → thousands of tied timestamps, and
    an as-of tie is oracle-UNDEFINED — DuckDB's ASOF picks an
    arbitrary row; q_asof_join's sum diverged by 1e5). Same fix as
    q_asof_tolerance's r4 discipline: the as-of right side is made
    key-unique BY CONSTRUCTION with a deterministic arg-max —
    simultaneous orders resolve to the highest orderkey (coalesce
    before the arg-max so a NULL price cannot split the engines).
    Mirror in oracles with
    ``SELECT ots, arg_max(coalesce(o_totalprice, 0.0), o_orderkey)
    ... GROUP BY ots``.

    r15 OPTIMIZATION (guide §7.2): the arg-max was
    ``max(struct(o_orderkey, v))`` — a struct-typed buffer is not
    hash-aggregable, so BOTH union branches of the downstream as-of
    plan ran Sort + SortAggregate over the orders scan (4 extra sorts,
    plans/r15/q_asof_join_before.txt operators 6-10/23-27).
    ``max_by(v, o_orderkey)`` keeps a fixed-width (double, long)
    buffer -> HashAggregate. EQUIVALENT BY UNIQUENESS: o_orderkey is
    globally unique, so the struct's lexicographic tie-break on v can
    never engage — both forms pick exactly the highest-orderkey row
    (max_by's engine-defined tie behavior is unreachable).
    """
    orders = scan(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            (
                (F.lit(_EPOCH_2024) + F.col("o_orderkey") % 2_592_000)
                * 1_000_000
            ).alias("tus")
        )
        .agg(
            F.max_by(
                F.coalesce(F.col("o_totalprice"), F.lit(0.0)),
                F.col("o_orderkey"),
            ).alias("o_totalprice")
        )
    )


@query(
    "q_asof_join",
    oracle="""
        WITH e AS (SELECT event_id, epoch_us(ts) AS tus FROM events),
             o AS (SELECT (1704067200 + o_orderkey % 2592000) * 1000000 AS ots_us,
                          arg_max(coalesce(o_totalprice, 0.0), o_orderkey)
                            AS o_totalprice
                   FROM orders
                   GROUP BY (1704067200 + o_orderkey % 2592000) * 1000000)
        SELECT count(*) AS n,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS s
        FROM (SELECT e.event_id, o.o_totalprice
              FROM e ASOF JOIN o ON e.tus >= o.ots_us)
    """,
    tags=("J7",),
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7: keyless as-of join — each event matched to the latest
    (synthetic-timestamped) order at or before it; DuckDB ASOF JOIN is
    the oracle. Implemented via operators.joins.asof_join (union +
    ordered window carry)."""
    ev = scan(spark, sf_dir, "events").select("event_id", ts_us().alias("tus"))
    ord_ts = _orders_with_synth_ts(spark, sf_dir)
    joined = asof_join(ev, ord_ts, ts_col="tus", payload=["o_totalprice"])
    return joined.agg(
        F.count("*").alias("n"), money_sum("o_totalprice").alias("s")
    )


@query(
    "q_asof_by_user",
    oracle="""
        WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS tns FROM events),
             p AS (SELECT user_id, epoch_us(ts) AS tns,
                          arg_max(coalesce(value, 0.0), event_id) AS value
                   FROM events
                   WHERE event_type = 'purchase'
                   GROUP BY user_id, epoch_us(ts))
        SELECT count(*) AS n,
               CAST(sum(CAST(prior_purchase AS DECIMAL(18,2))) AS DOUBLE) AS s
        FROM (SELECT e.event_id, p.value AS prior_purchase
              FROM e ASOF JOIN p ON e.user_id = p.user_id AND e.tns >= p.tns)
    """,
    tags=("J7",),
)
def q_asof_by_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7: keyed as-of join — each event annotated with the user's most
    recent purchase value at that time (inner: events before the first
    purchase drop).

    The right side is deduplicated per (user_id, µs) with the
    deterministic arg-max-by-event_id (q_asof_tolerance's r4
    discipline): a user with two purchases in one truncated µs would
    otherwise be an oracle-undefined as-of tie — unobserved at the
    driver SFs, but the class the sf1 probe falsified for
    q_asof_join."""
    ev = scan(spark, sf_dir, "events")
    left = ev.select("event_id", "user_id", ts_us().alias("tus"))
    # r15: max_by instead of max(struct) — hash-aggregable (see
    # _orders_with_synth_ts), equivalent because event_id is unique so
    # the struct tie-break on the value never engaged.
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", ts_us().alias("tus"))
        .agg(
            F.max_by(
                F.coalesce(F.col("value"), F.lit(0.0)), F.col("event_id")
            ).alias("prior_purchase")
        )
    )
    joined = asof_join(
        left, purchases, ts_col="tus", by=["user_id"], payload=["prior_purchase"]
    )
    return joined.agg(
        F.count("*").alias("n"), money_sum("prior_purchase").alias("s")
    )


@query(
    "q_self_join_funnel",
    oracle="""
        SELECT s.user_id, count(*) AS n_pairs
        FROM (SELECT user_id, epoch_us(ts) AS tns FROM events WHERE event_type = 'signup') s
        JOIN (SELECT user_id, epoch_us(ts) AS tns FROM events WHERE event_type = 'purchase') p
          ON s.user_id = p.user_id AND p.tns > s.tns
        GROUP BY s.user_id
        ORDER BY s.user_id
    """,
    tags=("J8",),
)
def q_self_join_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8: self-join funnel — signup followed by purchase, per user."""
    ev = scan(spark, sf_dir, "events")
    s = ev.filter(F.col("event_type") == "signup").select(
        "user_id", ts_us().alias("s_tns")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), ts_us().alias("p_tns")
    )
    return (
        s.join(p, (F.col("user_id") == F.col("p_user")) & (F.col("p_tns") > F.col("s_tns")))
        .groupBy("user_id")
        .agg(F.count("*").alias("n_pairs"))
        .orderBy("user_id")
    )


@query(
    "q_waiting_orders",
    oracle="""
        WITH late AS (
          SELECT DISTINCT l.l_orderkey AS okey, l.l_suppkey AS skey
          FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
          WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        SELECT s.s_name, count(*) AS numwait
        FROM late l1 JOIN supplier s ON l1.skey = s.s_suppkey
        WHERE EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.okey
                        AND l2.l_suppkey <> l1.skey)
          AND NOT EXISTS (SELECT 1 FROM late l3
                          WHERE l3.okey = l1.okey
                            AND l3.skey <> l1.skey)
        GROUP BY s.s_name
        ORDER BY numwait DESC, s.s_name
        LIMIT 10
    """,
    tags=("J4", "J1", "tpch"),
)
def q_waiting_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the SOLE late shipper on a
    multi-supplier order ("late" = shipped >60 days after the order
    date). The double-correlated EXISTS / NOT EXISTS resolves to a
    left-semi plus a left-anti join on (orderkey, suppkey<>suppkey) —
    the relational shape Q21 exists to test.

    Scale: all three join legs are keyed on l_orderkey, so one
    hash-partitioning is reusable across them; the supplier dim goes
    through size-aware ``maybe_broadcast`` (supplier scales with SF —
    a blanket hint would OOM at 100 TB); no correlated per-row
    subquery execution anywhere.
    """
    li = scan(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = scan(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    sup = scan(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    late = (
        scan(spark, sf_dir, "lineitem")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    l1 = late.alias("l1")
    other_sup = li.alias("l2")
    with_other = l1.join(
        other_sup,
        (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
        "left_semi",
    )
    other_late = late.alias("l3")
    sole_late = with_other.join(
        other_late,
        (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("l3.l_suppkey")),
        "left_anti",
    )
    return (
        sole_late.join(
            maybe_broadcast(sup, table_bytes(sf_dir, "supplier")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(10)
    )


@query(
    "q_idle_rich_customers",
    oracle="""
        WITH a AS (SELECT avg(c_acctbal) AS ab FROM customer WHERE c_acctbal > 0)
        SELECT c.c_nationkey, count(*) AS numcust,
               CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                 AS totacctbal
        FROM customer c, a
        WHERE c.c_acctbal > a.ab
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderdate >= TIMESTAMP '2000-01-01')
        GROUP BY c.c_nationkey
        ORDER BY c.c_nationkey
    """,
    tags=("J4", "A2", "tpch"),
)
def q_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers with above-average balance and no
    orders since 2000 (every fixture customer has SOME order, so the
    dormancy cutoff is what makes the anti-join selective), aggregated
    per nation — scalar aggregate subquery (broadcast as a 1-row cross
    join, evaluated once) plus NOT EXISTS (left-anti against the
    filtered orders fact).

    Scale: the anti join shuffles on custkey only; the scalar avg is a
    full-scan global aggregate but over the small dim table.
    """
    cust = scan(spark, sf_dir, "customer")
    orders = (
        scan(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("__ab")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("__ab"))
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            money_sum("c_acctbal").alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


@query(
    "q_null_safe_join",
    oracle="""
        WITH a AS (SELECT CASE WHEN user_id % 7 = 0 THEN NULL
                               ELSE user_id % 7 END AS k,
                          count(*) AS n_events
                   FROM events GROUP BY k),
             b AS (SELECT CASE WHEN c_custkey % 7 = 0 THEN NULL
                               ELSE c_custkey % 7 END AS k,
                          count(*) AS n_custs
                   FROM customer GROUP BY k)
        SELECT a.k, n_events, n_custs
        FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
        ORDER BY a.k NULLS FIRST
    """,
    tags=("J2", "P3", "nulls"),
)
def q_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join: NULL keys match each other (`<=>` /
    IS NOT DISTINCT FROM) instead of silently dropping — the join
    semantics a plain `=` gets wrong when the key domain contains
    NULL-as-a-category (here: bucket 0 nulled on both sides, so the
    null row must appear in the result exactly once).

    Scale note: Spark plans `<=>` as a regular hash join (null keys
    hash like any value under null-safe equality) — same shuffle
    shape as `=`, no nested-loop degradation; all NULLs land in one
    hash group, which is the usual single-hot-key story (salt if the
    null class dominates).
    """
    ev = scan(spark, sf_dir, "events").groupBy(
        F.nullif(F.pmod("user_id", F.lit(7)), F.lit(0)).alias("k")
    ).agg(F.count("*").alias("n_events"))
    cust = scan(spark, sf_dir, "customer").groupBy(
        F.nullif(F.pmod("c_custkey", F.lit(7)), F.lit(0)).alias("k")
    ).agg(F.count("*").alias("n_custs"))
    return (
        ev.alias("a")
        .join(cust.alias("b"), F.col("a.k").eqNullSafe(F.col("b.k")))
        .select(F.col("a.k").alias("k"), "n_events", "n_custs")
        .orderBy(F.asc_nulls_first("k"))
    )


@query(
    "q_asof_forward",
    oracle="""
        WITH e AS (SELECT event_id, epoch_us(ts) AS tus FROM events),
             o AS (SELECT (1704067200 + o_orderkey % 2592000) * 1000000
                            AS tus,
                          arg_max(coalesce(o_totalprice, 0.0), o_orderkey)
                            AS o_totalprice
                   FROM orders
                   GROUP BY (1704067200 + o_orderkey % 2592000) * 1000000)
        SELECT count(*) AS n,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS s
        FROM (SELECT e.event_id, o.o_totalprice
              FROM e ASOF JOIN o ON e.tus <= o.tus)
    """,
    tags=("J7",),
)
def q_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7 (forward direction): each event matched to the EARLIEST
    order at or after it — the "next quote/fill after the order"
    direction. Implemented by running the backward as-of operator on
    NEGATED timestamps (latest(-o <= -e) == earliest(o >= e)), so the
    parallel range-bucket machinery, tie-breaks, and bounds memo are
    reused unchanged; DuckDB's native forward ASOF (e.tus <= o.tus)
    is the oracle.
    """
    ev = (
        scan(spark, sf_dir, "events")
        .select("event_id", ts_us().alias("tus"))
        .withColumn("tus", -F.col("tus"))
    )
    ord_ts = _orders_with_synth_ts(spark, sf_dir).withColumn(
        "tus", -F.col("tus")
    )
    joined = asof_join(ev, ord_ts, ts_col="tus", payload=["o_totalprice"])
    return joined.agg(
        F.count("*").alias("n"), money_sum("o_totalprice").alias("s")
    )


@query(
    "q_asof_tolerance",
    oracle="""
        WITH e AS (SELECT event_id, user_id, event_type,
                          epoch_us(ts) AS tus
                   FROM events),
        p AS (SELECT user_id, epoch_us(ts) AS ptus,
                     arg_max(coalesce(value, 0.0), event_id) AS value
              FROM events
              WHERE event_type = 'purchase'
              GROUP BY user_id, epoch_us(ts)),
        m AS (SELECT e.event_type, e.tus, p.ptus, p.value
              FROM e ASOF JOIN p
                ON e.user_id = p.user_id AND e.tus >= p.ptus)
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_prior,
               CAST(sum(CASE WHEN tus - ptus <= 3600000000
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_within_1h,
               CAST(sum(CASE WHEN tus - ptus <= 3600000000
                             THEN CAST(value AS DECIMAL(18,2))
                             ELSE 0 END) AS DOUBLE) AS s_within_1h
        FROM m
        GROUP BY event_type
        ORDER BY event_type
    """,
    tags=("J7",),
)
def q_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7: as-of join with a TOLERANCE — the pandas
    ``merge_asof(tolerance=...)`` semantics: the latest prior purchase
    counts only if it happened within the last hour; staler matches
    are treated as no-match. Per event type: rows with any prior
    purchase, rows whose match is within tolerance, and the matched
    value mass.

    Tolerance composes on TOP of the as-of operator rather than
    changing it: the keyed as-of carries the matched right timestamp
    as payload, and the tolerance is a plain post-filter predicate —
    so the bucketed-carry machinery (operators/joins.py) is reused
    unchanged and the filter stays codegen'd. The oracle composes
    DuckDB's native ASOF JOIN with the same predicate.

    Determinism under same-µs ties (ADVICE r4): truncating ns
    timestamps to µs can collapse two purchases of one user onto one
    as-of key, and the two engines would then pick different rows
    (xxhash64 tie-break here vs DuckDB's arbitrary ASOF pick). Both
    engines therefore deduplicate purchases per (user_id, µs) with an
    arg_max-by-event_id BEFORE the as-of join — the right side is
    key-unique by construction, so no tie-break can ever fire. This is
    also the production posture: an as-of dimension should be
    key-unique per timestamp (cf. q_scd2_build's tiled validity).
    """
    ev = scan(spark, sf_dir, "events")
    left = ev.select("event_id", "user_id", "event_type", ts_us().alias("tus"))
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", ts_us().alias("tus"))
        .agg(
            # coalesce BEFORE the argmax struct (ADVICE r5): Spark's
            # max-of-struct returns the max-event_id row's value even
            # when that value is NULL, while DuckDB's arg_max skips
            # NULL args and would fall back to a lower event_id row —
            # a NULL-valued fixture would diverge. Coalescing to 0.0
            # (the same neutral the downstream ELSE 0 uses) makes both
            # engines pick the same row AND the same value.
            F.max(
                F.struct(
                    F.col("event_id").alias("i"),
                    F.coalesce(F.col("value"), F.lit(0.0)).alias("v"),
                )
            ).alias("m")
        )
        .select(
            "user_id",
            "tus",
            F.col("tus").alias("ptus"),  # the matched ts, carried as payload
            F.col("m.v").alias("pvalue"),
        )
    )
    joined = asof_join(
        left,
        purchases,
        ts_col="tus",
        by=["user_id"],
        payload=["ptus", "pvalue"],
    )
    within = F.col("tus") - F.col("ptus") <= 3_600_000_000
    return (
        joined.groupBy("event_type")
        .agg(
            F.count("*").alias("n_prior"),
            F.sum(F.when(within, 1).otherwise(0)).alias("n_within_1h"),
            F.sum(
                F.when(within, money("pvalue")).otherwise(
                    F.lit(0).cast("decimal(18,2)")
                )
            )
            .cast("double")
            .alias("s_within_1h"),
        )
        .orderBy("event_type")
    )


@query(
    "q_rich_inactive_segments",
    oracle="""
        WITH avg_bal AS (
          SELECT avg(c_acctbal) AS a FROM customer WHERE c_acctbal > 0),
        cand AS (
          SELECT c.c_custkey, c.c_mktsegment, c.c_acctbal
          FROM customer c CROSS JOIN avg_bal
          WHERE c.c_acctbal > avg_bal.a
            AND NOT EXISTS (SELECT 1 FROM orders o
                            WHERE o.o_custkey = c.c_custkey
                              AND o.o_orderdate >= DATE '2000-01-01'))
        SELECT c_mktsegment,
               CAST(count(*) AS BIGINT) AS n_custs,
               CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                 AS total_bal
        FROM cand
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
    """,
    tags=("J4", "A2", "A1", "tpch"),
)
def q_rich_inactive_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers with above-average positive account
    balance and NO orders since 2000-01-01, rolled up per market
    segment — the "dormant high-value accounts" report. (Q22's
    literal "never ordered" predicate is vacuous on these fixtures —
    every customer has orders at every SF — so the NOT EXISTS is
    instead anchored at a date cutoff, keeping the exact relational
    shape non-vacuously: 5 / 55 / 646 candidates at sf0.001/0.01/0.1.)
    Combines a global scalar subquery (the positive-balance average)
    with a correlated NOT EXISTS, which Spark resolves to a broadcast
    scalar filter plus a left-anti join — no per-row subquery
    execution anywhere.

    Scale shape: the average reduces the customer scan to ONE
    broadcast row; the anti join is keyed on custkey so it shuffles
    only the (already average-filtered) candidate customers against
    the orders key column; the final rollup is ~|segments| rows. The
    average-balance threshold compares RAW doubles on both engines —
    a strict > against a corpus-scale mean, where no fixture value
    sits within accumulation noise of the boundary (the balances are
    2-dp currency values, the mean carries ~1e-10 noise).
    """
    cust = scan(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0)
        .agg(F.avg("c_acctbal").alias("a"))
    )
    recent = (
        scan(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").cast("long").alias("n_custs"),
            money_sum("c_acctbal").alias("total_bal"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "q_null_skew_join_split",
    oracle="""
        WITH e AS (SELECT event_id, event_type, value,
                          CASE WHEN event_type = 'purchase'
                               THEN user_id END AS buyer_key
                   FROM events)
        SELECT e.event_type,
               CAST(count(*) AS BIGINT) AS n,
               CAST(count(c.c_custkey) AS BIGINT) AS n_matched,
               CAST(sum(CASE WHEN c.c_custkey IS NOT NULL
                             THEN CAST(e.value AS DECIMAL(18,2))
                             ELSE 0 END) AS DOUBLE)
                 AS matched_value
        FROM e LEFT JOIN customer c ON e.buyer_key = c.c_custkey
        GROUP BY e.event_type
        ORDER BY e.event_type
    """,
    tags=("J3", "skew", "scale"),
)
def q_null_skew_join_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-skew split for an outer join on a sparsely-populated key:
    only purchase events carry a buyer key, every other row's key is
    NULL — and in a shuffled left join ALL null-key rows hash to ONE
    partition (null never matches, but it still shuffles), the
    classic silent straggler at 100 TB where 90%+ of a fact table is
    unattributed. The operator splits on key nullability: null-key
    rows BYPASS the join entirely (a map-only branch that never
    shuffles, dim columns attached as NULL literals), only the
    purchase slice joins the customer dim, and the union is
    hash-identical to the plain LEFT JOIN the oracle runs.

    This composes with q_salted_join (which spreads skew that must
    join); the null split is strictly better when the skewed class
    cannot match by construction — those rows pay zero shuffle
    instead of a salted one. Output: per event type, row count,
    matched count (non-purchase rows: 0 by construction) and matched
    value mass.
    """
    e = scan(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        "value",
        F.when(F.col("event_type") == "purchase", F.col("user_id")).alias(
            "buyer_key"
        ),
    )
    dim = scan(spark, sf_dir, "customer").select("c_custkey")
    nn = e.filter(F.col("buyer_key").isNotNull()).join(
        maybe_broadcast(dim, table_bytes(sf_dir, "customer")),
        F.col("buyer_key") == F.col("c_custkey"),
        "left",
    )
    nu = e.filter(F.col("buyer_key").isNull()).withColumn(
        "c_custkey", F.lit(None).cast("long")
    )
    return (
        nn.unionByName(nu)
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.count("c_custkey").cast("long").alias("n_matched"),
            F.sum(
                F.when(
                    F.col("c_custkey").isNotNull(), money("value")
                ).otherwise(F.lit(0).cast("decimal(18,2)"))
            )
            .cast("double")
            .alias("matched_value"),
        )
        .orderBy("event_type")
    )


@query(
    "q_sole_late_supplier",
    oracle="""
        WITH late AS (
          SELECT l.l_orderkey, l.l_suppkey
          FROM lineitem l
          JOIN orders o ON o.o_orderkey = l.l_orderkey
          WHERE o.o_orderstatus = 'F'
            AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        SELECT s.s_name,
               CAST(count(DISTINCT la.l_orderkey) AS BIGINT) AS numwait
        FROM late la
        JOIN supplier s ON s.s_suppkey = la.l_suppkey
        WHERE EXISTS (
            SELECT 1 FROM lineitem l2
            WHERE l2.l_orderkey = la.l_orderkey
              AND l2.l_suppkey <> la.l_suppkey)
          AND NOT EXISTS (
            SELECT 1 FROM late l3
            WHERE l3.l_orderkey = la.l_orderkey
              AND l3.l_suppkey <> la.l_suppkey)
        GROUP BY s.s_name
        ORDER BY numwait DESC, s_name
        LIMIT 10
    """,
    tags=("J4", "A3", "tpch"),
)
def q_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the SOLE late shipper on a
    finished multi-supplier order ("late" = shipped >60 days after the
    order date — the fixture carries no commit/receipt dates, so
    shipdate lateness stands in). The reference shape is a correlated
    EXISTS + NOT EXISTS pair (the oracle keeps that form as the
    equivalence proof); the engine DECORRELATES both into one per-
    order aggregate — at 100 TB the correlated form re-probes
    lineitem twice per candidate row, while the aggregate form is a
    single extra pass.

    Scale shape: per-order supplier/late-supplier distinct-counts and
    the late pairs all hash-partition on the order key — one shuffle
    family, co-located; the qualifying filter (n_supp >= 2 AND
    n_late_supp = 1) runs on the order-grain aggregate, the supplier
    dim broadcasts, and the top-10 is a TakeOrdered with a name
    tie-break. Counts are exact integers — no FP anywhere.
    """
    orders_f = (
        scan(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = scan(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    lines_f = li.join(
        orders_f, F.col("l_orderkey") == F.col("o_orderkey")
    ).select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 60)).alias(
            "is_late"
        ),
    )
    per_order = lines_f.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("is_late"), F.col("l_suppkey"))
        ).alias("n_late_supp"),
    )
    sole_late = (
        lines_f.filter(F.col("is_late"))
        .select("l_orderkey", "l_suppkey")
        .distinct()
        .join(
            per_order.filter(
                (F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1)
            ).select("l_orderkey"),
            "l_orderkey",
        )
    )
    sup = scan(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        sole_late.join(
            maybe_broadcast(sup, table_bytes(sf_dir, "supplier")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.countDistinct("l_orderkey").cast("long").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(10)
    )


@query(
    "q_nation_trade_volume",
    oracle="""
        SELECT sn.n_name AS supp_nation,
               cn.n_name AS cust_nation,
               extract(year FROM o.o_orderdate) AS yr,
               CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l.l_discount AS DECIMAL(5,2))))
                    AS DOUBLE) AS volume
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation cn ON cn.n_nationkey = c.c_nationkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation sn ON sn.n_nationkey = s.s_nationkey
        WHERE (sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
           OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1')
        GROUP BY supp_nation, cust_nation, yr
        ORDER BY supp_nation, cust_nation, yr
    """,
    tags=("J1", "J2", "A1", "tpch"),
)
def q_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: shipping volume BETWEEN two nations by year,
    both directions kept as separate rows (the bilateral trade view
    q_market_share's one-vs-region cut doesn't give).

    Scale shape: both nation filters resolve to broadcast key lists
    BEFORE the fact join — the supplier side prunes lineitem rows and
    the customer side prunes order rows, so only cross-border rows
    enter the one fact-fact shuffle (lineitem x orders on the order
    key). The disjunctive nation pair predicate is applied as a
    post-join filter on two broadcast-joined name columns (Catalyst
    cannot split an OR across two dimension arms, but both arms are
    already dimension-pruned to the two named nations). Revenue is
    exact DECIMAL end-to-end (functions.money — no double sum can
    flip a boundary with accumulation order).
    """
    nations = scan(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2")
    )
    sup = (
        scan(spark, sf_dir, "supplier")
        .select("s_suppkey", "s_nationkey")
        .join(
            F.broadcast(
                nations.select(
                    F.col("n_nationkey").alias("snk"),
                    F.col("n_name").alias("supp_nation"),
                )
            ),
            F.col("s_nationkey") == F.col("snk"),
        )
        .select("s_suppkey", "supp_nation")
    )
    cust = (
        scan(spark, sf_dir, "customer")
        .select("c_custkey", "c_nationkey")
        .join(
            F.broadcast(
                nations.select(
                    F.col("n_nationkey").alias("cnk"),
                    F.col("n_name").alias("cust_nation"),
                )
            ),
            F.col("c_nationkey") == F.col("cnk"),
        )
        .select("c_custkey", "cust_nation")
    )
    li = scan(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_suppkey",
        (
            money("l_extendedprice")
            * (F.lit(1).cast("decimal(5,2)") - rate("l_discount"))
        ).alias("vol"),
    )
    orders = scan(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.year("o_orderdate").alias("yr")
    )
    return (
        li.join(
            maybe_broadcast(sup, table_bytes(sf_dir, "supplier")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            maybe_broadcast(cust, table_bytes(sf_dir, "customer")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy("supp_nation", "cust_nation", "yr")
        .agg(F.sum("vol").cast("double").alias("volume"))
        .orderBy("supp_nation", "cust_nation", "yr")
    )


@query(
    "q_returned_revenue",
    oracle="""
        SELECT c.c_custkey, c.c_name, n.n_name AS nation,
               CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l.l_discount AS DECIMAL(5,2))))
                    AS DOUBLE) AS revenue,
               CAST(count(DISTINCT o.o_orderkey) AS BIGINT) AS n_orders
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        WHERE l.l_returnflag = 'R'
        GROUP BY c.c_custkey, c.c_name, nation
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
    tags=("J1", "J2", "A1", "W2", "tpch"),
)
def q_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: the top-20 customers by revenue LOST to
    returned items — the churn-risk / fraud-review list.

    Scale shape: the returnflag filter is pushed to the lineitem scan
    (PushedFilters — roughly a 1/3 selectivity cut before any join);
    the one fact-fact shuffle joins the filtered lineitem to orders on
    the order key; customer and nation broadcast; the per-customer
    aggregate is customer-bounded and the top-20 is a TakeOrdered
    with a custkey tie-break, never a global sort. Revenue is exact
    DECIMAL end-to-end (functions.money), so the top-20 cut compares
    identical exact values on both engines.
    """
    li = (
        scan(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select(
            "l_orderkey",
            (
                money("l_extendedprice")
                * (F.lit(1).cast("decimal(5,2)") - rate("l_discount"))
            ).alias("vol"),
        )
    )
    orders = scan(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = (
        scan(spark, sf_dir, "customer")
        .select("c_custkey", "c_name", "c_nationkey")
        .join(
            F.broadcast(
                scan(spark, sf_dir, "nation").select(
                    "n_nationkey", F.col("n_name").alias("nation")
                )
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey", "c_name", "nation")
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            maybe_broadcast(cust, table_bytes(sf_dir, "customer")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("c_custkey", "c_name", "nation")
        .agg(
            # exact DECIMAL revenue is also the top-20 ORDER key
            F.sum("vol").cast("double").alias("revenue"),
            F.countDistinct("l_orderkey").cast("long").alias("n_orders"),
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )
