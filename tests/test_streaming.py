"""Stream-batch parity (SURVEY.md §5.4) for the rows-only streaming
ops; the SQL-oracled ones (T1/T2/T3/T5/T6/T7) are parity-checked
against DuckDB by test_oracle_parity / the driver already."""

from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_log_analysis_spark.queries import load_registry
from hadoop_log_analysis_spark.sources.catalog import scan
from tests.conftest import SF001

REGISTRY = load_registry()


def test_watermark_append_emits_closed_windows_matching_batch(spark):
    """T4: every window append-mode emits must carry the exact batch
    count for that hour (late rows behind the watermark were dropped,
    but the drop replays in ts order so closed windows are complete);
    only trailing in-flight windows may be withheld."""
    emitted = {
        r.hr_us: r.n
        for r in REGISTRY["q_stream_watermark_late"].fn(spark, SF001).collect()
    }
    batch = {
        r.hr_us: r.n
        for r in (
            scan(spark, SF001, "events")
            .groupBy(
                F.unix_micros(
                    F.date_trunc("hour", F.col("ts")).cast("timestamp")
                ).alias("hr_us")
            )
            .agg(F.count("*").alias("n"))
        ).collect()
    }
    assert emitted, "append mode should emit closed windows"
    mismatched = {h for h, n in emitted.items() if batch.get(h) != n}
    assert not mismatched, f"closed windows disagree with batch: {sorted(mismatched)[:5]}"
    withheld = set(batch) - set(emitted)
    # Only windows near the end of the stream may still be open.
    assert len(withheld) <= 2, f"too many withheld windows: {len(withheld)}"
