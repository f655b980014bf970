"""File-source event streams derived from the events fixture (S7).

The batch/stream unification story (SURVEY.md §1.2): the same events
schema flows through both engines. A "drop directory" of JSON-lines
files is derived deterministically from ``events.parquet`` —
time-ordered files, so the stream replays the month roughly in event
order — and every T1-T7 operator consumes it through
``spark.readStream``.

Timestamps cross the JSON boundary as **epoch-microsecond bigints**
(``ts_us``), never as strings: deterministic, precision-exact, and
µs on both engine sides (DuckDB oracle uses ``epoch_us`` which also
truncates the fixture's ns — see memory/duckdb-ns-truncation).

Scale posture: the file source at 100 TB becomes a real queue
(Kafka) with identical downstream code; watermarks + state-store
(RocksDB provider) bound state. ``maxFilesPerTrigger`` here forces
multi-microbatch execution so tests exercise real incremental state,
not one giant batch.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
TMP = os.path.join(_REPO, ".tmp")

# JSON-lines drop schema: ts as epoch-µs bigint (see module docstring).
DROP_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts_us", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _tag(sf_dir: str) -> str:
    return os.path.basename(os.path.normpath(sf_dir))


def stamp_replay_order(path: str) -> tuple[int, float]:
    """mtime-stamp a drop dir's part files strictly increasing in part
    order. The file source replays files in modification-time order; a
    single batch write stamps them identically, which would randomize
    replay order and break every time-ordered-replay contract (T4/T5
    watermarks, first-seen dedup, the bucketed joins' sentinels). Part
    numbering follows repartitionByRange order, so part-00000 is the
    earliest time slice. Returns (n_parts, base_mtime) so callers that
    append marker files (the sentinel writer) can stamp past the end."""
    parts = sorted(
        f for f in os.listdir(path) if f.startswith("part-") and f.endswith(".json")
    )
    base = (
        os.path.getmtime(os.path.join(path, parts[0]))
        if parts
        else os.path.getmtime(path)
    )
    for i, f in enumerate(parts):
        full = os.path.join(path, f)
        os.utime(full, (base + 10 * i, base + 10 * i))
    return len(parts), base


def derive_drop_dir(
    spark: SparkSession,
    sf_dir: str,
    n_files: int = 8,
    with_dups: bool = False,
    with_sentinel: bool = False,
) -> str:
    """Write the events fixture as ``n_files`` time-ordered JSON files.

    Files are range-partitioned on ts (file 0 = earliest slice), so a
    ``maxFilesPerTrigger=1`` stream replays the month in order —
    watermarks advance monotonically like they would against a live
    feed. Built once per (sf, variant); deterministic content.

    ``with_dups``: additionally duplicate one in every 20 events
    (deterministic ``event_id % 20 == 0`` rule) for T5 dedup.

    ``with_sentinel``: append THREE final one-event marker files
    (event_id=-j, event_type='__sentinel', user_id=-1, ts = max +
    j*30 days). Outer stream-stream joins hold unmatched rows in state
    until the watermark passes their eviction time; at the end of a
    bounded replay the watermark sits at max_ts - delay, so those rows
    would never emit. The sentinels push the watermark past every
    eviction time, flushing the full outer result. Consumer contract
    (see q_stream_stream_left_join, the reference user): consume with
    maxFilesPerTrigger=1; your side filters must ADMIT '__sentinel'
    rows into the join inputs (Catalyst pushes both event_type filters
    and left-side join predicates below the EventTimeWatermark node,
    so any streaming-plan filter that drops sentinels also hides them
    from the watermark tracker); user_id=-1 guarantees sentinels never
    match real rows; strip sentinel output rows from the DRAINED batch
    result, never inside the streaming plan.
    """
    from hadoop_log_analysis_spark.sources.catalog import scan

    variant = ("dups" if with_dups else "plain") + (
        "_sentinel" if with_sentinel else ""
    )
    # n_files is part of the cache key: the bench replays the
    # stream-stream join over fewer/larger files to amortize the fixed
    # per-microbatch cost (VERDICT r4 item 7) while the parity tests
    # keep the default 8-file replay where batch boundaries are the
    # point. Same data, same drained result either way.
    path = os.path.join(TMP, f"stream_drop_{variant}_{n_files}f_{_tag(sf_dir)}")
    marker = os.path.join(path, "_READY")
    if os.path.exists(marker):
        return path
    shutil.rmtree(path, ignore_errors=True)

    events = scan(spark, sf_dir, "events").select(
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "user_id",
        "event_type",
        "value",
    )
    if with_dups:
        dups = events.filter(F.col("event_id") % 20 == 0)
        events = events.unionByName(dups)
    (
        events.repartitionByRange(n_files, "ts_us")
        .sortWithinPartitions("ts_us", "event_id")
        .write.mode("overwrite")
        .json(path)
    )
    n_parts, base = stamp_replay_order(path)
    if with_sentinel:
        import json as _json

        # coalesce to epoch 0 on an empty feed: the sentinels still
        # advance the watermark and flush (empty) outer-join state.
        max_us = events.agg(
            F.coalesce(F.max("ts_us"), F.lit(0))
        ).collect()[0][0]
        # THREE sentinel files, each its own microbatch (consume with
        # maxFilesPerTrigger=1): the watermark computed from batch N's
        # data only takes effect in batch N+1, so a single final
        # sentinel would advance the watermark without any later batch
        # to evict/emit the flushed outer state — and with TWO sources
        # over the same directory the sources can sit one file apart,
        # costing one more batch (observed: 2 sentinels left the join's
        # min-watermark at max_real_ts - delay). Three guarantee the
        # last executed batch runs with watermark >= sentinel-1 - delay
        # even under a one-file source offset.
        for j in (1, 2, 3):
            sentinel = {
                "event_id": -j,
                "ts_us": max_us + j * 30 * 86400 * 1_000_000,
                "user_id": -1,
                "event_type": "__sentinel",
                "value": 0.0,
            }
            sfile = os.path.join(path, f"part-zz-sentinel-{j}.json")
            with open(sfile, "w") as fh:
                fh.write(_json.dumps(sentinel) + "\n")
            t = base + 10 * (n_parts + j)
            os.utime(sfile, (t, t))
    open(marker, "w").close()
    return path


def read_events_stream(
    spark: SparkSession, drop_dir: str, max_files_per_trigger: int = 2
) -> DataFrame:
    """S7: streaming file source over a drop directory -> typed events.

    Emits the batch-identical column set (event_id, ts, user_id,
    event_type, value) with ``ts`` as TimestampType (UTC session, so
    instants match the batch ntz values exactly).
    """
    raw = (
        spark.readStream.schema(DROP_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(drop_dir)
    )
    return raw.select(
        "event_id",
        F.timestamp_micros(F.col("ts_us")).alias("ts"),
        "user_id",
        "event_type",
        "value",
    )


def ckpt_path(name: str, app_id: str) -> str:
    """The checkpoint directory ``run_to_table`` /
    ``run_foreach_batch_to_parquet`` use for a given sink table name
    and Spark application id. Shared so measurement tooling
    (scripts/stream_state_skew.py) derives the SAME path instead of
    hard-coding the convention — a rename there must break loudly,
    not silently profile an empty directory (ADVICE r12)."""
    return os.path.join(TMP, f"stream_ckpt_{name}_{app_id}")


def _drain_timeout(default_sec: int) -> int:
    """HLA_STREAM_DRAIN_TIMEOUT_SEC raises the drain deadline on slow
    or noisy hosts (r12: the heaviest skew-probe drain sits near 300 s
    and crossed it under host-neighbor jitter — a timeout is a HARNESS
    bound, not part of any query's semantics). Validated like
    HLA_BFS_CHECKPOINT_EVERY_K: a nonsensical value must fail loudly,
    not silently hang or zero out."""
    env_to = os.environ.get("HLA_STREAM_DRAIN_TIMEOUT_SEC")
    if env_to is None:
        return default_sec
    val = int(env_to)
    if val < 1:
        raise ValueError(
            f"HLA_STREAM_DRAIN_TIMEOUT_SEC must be >= 1, got {env_to}"
        )
    return val


def run_to_table(
    sdf: DataFrame,
    name: str,
    output_mode: str,
    timeout_sec: int = 300,
    state_partitions: int | None = None,
) -> DataFrame:
    """Drain a streaming DataFrame to completion; return the result.

    ``trigger(availableNow=True)`` processes everything currently in
    the drop dir as real incremental microbatches (bounded by the
    source's maxFilesPerTrigger) then stops — the deterministic way to
    verify a streaming pipeline. Memory sink; checkpoint under .tmp,
    cleared per run (stale checkpoints no-op re-runs).

    ``state_partitions`` sizes the state-store TASK COUNT to the
    (tiny) state volume for the duration of the drain — exactly the
    sizing a production job makes (BASELINE.md r5 addendum: the
    per-microbatch cost of these bounded replays is state tasks, not
    data; 32 -> 8 partitions took the stream-stream join 22.8 -> 7.5 s
    and a bare 200-partition driver session pays 25x that). The
    partition count is pinned at the checkpoint's batch 0 — the
    checkpoint is fresh per run, so the conf applies — and is
    restored right after the drain; results are partition-count
    invariant (hash-parity is the oracle on every streaming query).
    """
    # HLA_STREAM_STATE_PARTITIONS lets the bench size state tasks to
    # its replay without touching query code; parity tests keep the
    # default (results are partition-count invariant — hash-parity is
    # the oracle on every streaming query).
    if state_partitions is None:
        state_partitions = int(
            os.environ.get("HLA_STREAM_STATE_PARTITIONS", "8")
        )
    timeout_sec = _drain_timeout(timeout_sec)
    spark = sdf.sparkSession
    # Session-unique checkpoint (r6: a concurrent pytest + sweep pair
    # raced rmtree against an in-flight batch-0 state write and died
    # with STATE_STORE_CHECKPOINT_LOCATION_NOT_EMPTY — same fix class
    # as q_schema_evolution_read's derived dir).
    app = spark.sparkContext.applicationId
    ckpt = ckpt_path(name, app)
    shutil.rmtree(ckpt, ignore_errors=True)
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q = (
            sdf.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(timeout_sec):
            q.stop()
            raise RuntimeError(
                f"stream {name!r} did not drain within {timeout_sec}s"
            )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
    return spark.table(name)


def run_foreach_batch_to_parquet(
    sdf: DataFrame, name: str, out_dir: str, timeout_sec: int = 300
) -> None:
    """T7: drain via foreachBatch -> partitioned parquet sink.

    foreachBatch is the production fan-out sink: each microbatch is a
    batch DataFrame the callback writes with the full batch writer
    (partitioning, dynamic overwrite, multiple sinks). Delivery is
    AT-LEAST-once — a mid-batch failure replays the batch — so the
    sink keys each batch's files on batch_id and overwrites, making
    replays idempotent (effectively-once end to end).
    """
    timeout_sec = _drain_timeout(timeout_sec)
    spark = sdf.sparkSession
    app = spark.sparkContext.applicationId
    ckpt = ckpt_path(name, app)
    shutil.rmtree(ckpt, ignore_errors=True)
    shutil.rmtree(out_dir, ignore_errors=True)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").partitionBy("event_type").parquet(
            os.path.join(out_dir, f"batch_id={batch_id}")
        )

    # same state-partition sizing rationale as run_to_table
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (
            sdf.writeStream.foreachBatch(write_batch)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(timeout_sec):
            q.stop()
            raise RuntimeError(
                f"stream {name!r} did not drain within {timeout_sec}s"
            )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
