"""Embedding similarity search (SURVEY.md §2.8 L3/L4).

Exact path: brute-force cosine top-k with the dot product as a
higher-order array expression (zip_with + aggregate) in double
precision — JVM-side, codegen'd, no Python. For one query vector
this is a map + TakeOrdered: fully parallel, no shuffle of the
embedding table.

Approximate path (the 100 TB plan): IVF-style coarse quantization —
build centroids (here: per-label mean, i.e. the label is the coarse
code; a k-means trainer would slot in identically), route the query
to its ``n_probe`` nearest centroids, exact-rerank only those
partitions. Search cost drops by ~|buckets|/n_probe; recall is
unit-tested against the exact path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<float|double> columns, in double."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    embeddings: DataFrame,
    query_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k against the embedding row ``query_id``.

    The 1-row query side is broadcast; the scan side never shuffles.
    Returns (id, sim) with deterministic tie-break on id.
    """
    q = embeddings.filter(F.col(id_col) == query_id).select(
        F.col(vec_col).alias("__qvec")
    )
    return (
        embeddings.filter(F.col(id_col) != query_id)
        .crossJoin(F.broadcast(q))
        .select(
            id_col,
            cosine(F.col(vec_col), F.col("__qvec")).alias("__sim"),
        )
        .orderBy(F.col("__sim").desc(), F.col(id_col))
        .limit(k)
        .select(id_col, F.round("__sim", 6).alias("sim"))
    )


def ivf_centroids(
    embeddings: DataFrame,
    bucket_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-bucket mean vector (the IVF coarse quantizer): one shuffle
    keyed by (bucket, dimension), output |buckets| rows."""
    dims = embeddings.select(
        bucket_col, F.posexplode(F.col(vec_col)).alias("pos", "x")
    )
    per_dim = dims.groupBy(bucket_col, "pos").agg(F.avg("x").alias("m"))
    return per_dim.groupBy(bucket_col).agg(
        F.array_sort(
            F.collect_list(F.struct("pos", "m"))
        ).alias("__pm")
    ).select(
        bucket_col,
        F.expr("transform(__pm, s -> s.m)").alias("centroid"),
    )


def ann_ivf_topk(
    embeddings: DataFrame,
    query_id: int,
    k: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_col: str = "label",
) -> DataFrame:
    """Approximate top-k: probe the n_probe buckets whose centroids are
    closest (cosine) to the query, exact-rerank inside them."""
    cents = ivf_centroids(embeddings, bucket_col, vec_col)
    q = embeddings.filter(F.col(id_col) == query_id).select(
        F.col(vec_col).alias("__qvec")
    )
    probe = (
        cents.crossJoin(F.broadcast(q))
        .select(bucket_col, cosine(F.col("centroid"), F.col("__qvec")).alias("__cs"))
        .orderBy(F.col("__cs").desc(), bucket_col)
        .limit(n_probe)
        .select(bucket_col)
    )
    return (
        embeddings.join(F.broadcast(probe), bucket_col)
        .filter(F.col(id_col) != query_id)
        .crossJoin(F.broadcast(q))
        .select(id_col, cosine(F.col(vec_col), F.col("__qvec")).alias("__sim"))
        .orderBy(F.col("__sim").desc(), F.col(id_col))
        .limit(k)
        .select(id_col, F.round("__sim", 6).alias("sim"))
    )


def cosine_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str = "label",
) -> DataFrame:
    """Embedding-cosine near-dup pairs, blocked by ``block_col`` so the
    pair join is per-block instead of a full cross product."""
    side = embeddings.select(
        F.col(block_col).alias("__blk"), F.col(id_col), F.col(vec_col)
    )
    a = side.select(
        "__blk", F.col(id_col).alias("a_id"), F.col(vec_col).alias("__va")
    )
    b = side.select(
        "__blk", F.col(id_col).alias("b_id"), F.col(vec_col).alias("__vb")
    )
    return (
        a.join(b, "__blk")
        .filter(F.col("a_id") < F.col("b_id"))
        .withColumn("__sim", cosine(F.col("__va"), F.col("__vb")))
        .filter(F.col("__sim") >= threshold)
        .select("a_id", "b_id", F.round("__sim", 6).alias("sim"))
    )
