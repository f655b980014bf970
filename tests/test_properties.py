"""Algebraic property checks (SURVEY.md §5.5): invariants that hold
for ANY data, checked on the fixtures."""

from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_log_analysis_spark.sources.catalog import scan
from tests.conftest import SF001


def test_union_count_additivity(spark):
    ev = scan(spark, SF001, "events")
    a = ev.filter(F.col("event_type") == "error")
    b = ev.filter(F.col("event_type") != "error")
    assert a.count() + b.count() == ev.count()
    assert a.unionByName(b).count() == ev.count()


def test_filter_subset_of_scan(spark):
    li = scan(spark, SF001, "lineitem")
    assert li.filter(F.col("l_quantity") > 30).count() <= li.count()


def test_topk_prefix_monotone(spark):
    ev = scan(spark, SF001, "events")
    ranked = ev.orderBy(F.col("value").desc(), "event_id")
    top5 = [r.event_id for r in ranked.limit(5).collect()]
    top10 = [r.event_id for r in ranked.limit(10).collect()]
    assert top10[:5] == top5


def test_distinct_idempotent(spark):
    docs = scan(spark, SF001, "documents").select("lang")
    assert docs.distinct().count() == docs.distinct().distinct().count()


def test_events_ts_repair_roundtrip(spark):
    # ts (µs, repaired) and ts_ns (raw) must agree: ts == ts_ns div 1000 µs.
    ev = scan(spark, SF001, "events")
    bad = ev.filter(
        F.unix_micros(F.col("ts").cast("timestamp")) != F.expr("ts_ns div 1000")
    ).count()
    assert bad == 0
