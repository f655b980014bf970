"""Streaming vector search against a static embedding corpus (T8 x L3).

The batch retrieval path (operators.similarity.cosine_topk) answers a
one-off query; a serving pipeline answers a QUERY STREAM — each
arriving query vector gets its exact top-k neighbors from the indexed
corpus. The Spark-first shape for that is stream-static enrichment in
``foreachBatch``: every microbatch of queries is a small batch
DataFrame, and the per-batch join against the static corpus is an
ordinary Catalyst plan (broadcast-nested-loop against the broadcast
corpus, TakeOrdered-style row_number top-k per query), written to a
batch_id-keyed sink exactly like T7's parquet fan-out.

Why NOT a streaming stateful aggregation: retrieval is STATELESS —
each query's answer depends only on the (static) corpus, never on
other stream rows, so the right plan carries zero streaming state. A
groupBy().collect_list() formulation would buffer |corpus| candidate
structs per query in the state store for no benefit; here state stays
empty and the microbatch boundary IS the unit of work. That also
makes the result trivially batch-boundary invariant (pinned by test
at two maxFilesPerTrigger widths).

Scale posture (100 TB corpus): the fixture-scale corpus broadcasts
whole (exact ranker, operators.similarity.exact_topk_multi); past
broadcast size the ``ranker`` parameter swaps in the SHIPPED IVF
route (operators.similarity.ivf_topk_multi, q_stream_knn_ivf) —
only the |buckets| centroid table and the query x n_probe routing
table broadcast, and the bucket equi-join prunes every unprobed
partition of a label-bucketed corpus layout. The foreachBatch
skeleton is identical; only the ranker inside it changes. Exactness
story: the exact ranker matches the batch L3 tier bit for bit
(double dot products over float-widened values, 6-dp rounding at
output only), so its full DuckDB oracle applies — the drained stream
must hash-match the batch SQL answer; the IVF twin is approximate by
design and carries stream==batch-ranker multiset parity plus the
coverage-floor recall test instead.
"""

from __future__ import annotations

import os
import shutil
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hadoop_log_analysis_spark.streaming.events_stream import (
    TMP,
    _drain_timeout,
    _tag,
    ckpt_path,
    stamp_replay_order,
)

# Same synthetic arrival clock convention as docs_dedup.
QUERY_BASE_US = 1_704_067_200 * 1_000_000

QUERY_DROP_SCHEMA = T.StructType(
    [
        T.StructField("q_id", T.LongType()),
        T.StructField("ts_us", T.LongType()),
        T.StructField("qvec", T.ArrayType(T.DoubleType())),
    ]
)


def derive_query_drop_dir(
    spark: SparkSession, sf_dir: str, every: int = 25, n_files: int = 4
) -> str:
    """Write every ``every``-th embedding row as an arrival-ordered
    JSON query feed (q_id, ts_us, qvec).

    Vectors cross the JSON boundary exactly: float32 -> double is
    value-preserving, Jackson emits the shortest round-trip decimal,
    and the stream schema reads array<double> — so the streamed qvec
    equals the batch ``CAST(embedding AS DOUBLE)`` element for
    element, which is what lets the DuckDB oracle stay exact.
    """
    path = os.path.join(TMP, f"emb_query_drop_{every}_{n_files}f_{_tag(sf_dir)}")
    marker = os.path.join(path, "_READY")
    if os.path.exists(marker):
        return path
    shutil.rmtree(path, ignore_errors=True)

    from hadoop_log_analysis_spark.sources.catalog import scan

    queries = (
        scan(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") % every == 0)
        .select(
            F.col("vec_id").alias("q_id"),
            (F.lit(QUERY_BASE_US) + F.col("vec_id") * 1_000_000).alias("ts_us"),
            F.col("embedding").cast("array<double>").alias("qvec"),
        )
    )
    (
        queries.repartitionByRange(n_files, "ts_us")
        .sortWithinPartitions("ts_us")
        .write.mode("overwrite")
        .json(path)
    )
    stamp_replay_order(path)
    open(marker, "w").close()
    return path


def read_query_stream(
    spark: SparkSession, drop_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """Streaming file source over a query-vector drop directory."""
    return (
        spark.readStream.schema(QUERY_DROP_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(drop_dir)
    )


def run_stream_knn(
    queries_stream: DataFrame,
    corpus: DataFrame,
    k: int,
    name: str,
    out_dir: str,
    timeout_sec: int = 300,
    ranker: Callable[[DataFrame], DataFrame] | None = None,
) -> DataFrame:
    """Drain a query stream through per-batch top-k retrieval.

    foreachBatch skeleton per events_stream.run_foreach_batch_to_parquet
    (same checkpoint / availableNow / idempotent batch_id-overwrite
    discipline); each microbatch of queries goes through ``ranker`` —
    any batch function (q_id, qvec) -> (q_id, vec_id, sim, rn) — and
    only the k rows per query are written. The default ranker is the
    exact broadcast-corpus scan (operators.similarity.exact_topk_multi);
    pass an ``ivf_topk_multi`` closure for the corpus-past-broadcast
    route. Returns the read-back result for the whole drained feed.
    """
    from hadoop_log_analysis_spark.operators.similarity import (
        exact_topk_multi,
    )

    if ranker is None:
        ranker = lambda batch_df: exact_topk_multi(batch_df, corpus, k=k)  # noqa: E731
    timeout_sec = _drain_timeout(timeout_sec)
    spark = queries_stream.sparkSession
    app = spark.sparkContext.applicationId
    ckpt = ckpt_path(name, app)
    shutil.rmtree(ckpt, ignore_errors=True)
    shutil.rmtree(out_dir, ignore_errors=True)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        (
            ranker(batch_df)
            .write.mode("overwrite")
            .parquet(os.path.join(out_dir, f"batch_id={batch_id}"))
        )

    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (
            queries_stream.writeStream.foreachBatch(write_batch)
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

    sink_schema = T.StructType(
        [
            T.StructField("q_id", T.LongType()),
            T.StructField("vec_id", T.LongType()),
            T.StructField("sim", T.DoubleType()),
            T.StructField("rn", T.IntegerType()),
            T.StructField("batch_id", T.LongType()),
        ]
    )
    return spark.read.schema(sink_schema).parquet(out_dir).drop("batch_id")
