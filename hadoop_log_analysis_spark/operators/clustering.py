"""Iterative DataFrame algorithms: connected components (dedup
clustering) and k-means refinement (IVF quantizer training).

Both are driver-side loops over fully distributed DataFrame steps —
the driver never holds data, only iteration control (convergence
checks on 1-row aggregates). This is the idiomatic Spark shape for
iterative algorithms: each pass is a plan over the cluster; lineage is
cut per iteration (``localCheckpoint``) so plans don't grow unboundedly.

Scale posture (100 TB): per-iteration cost is one or two key shuffles;
iteration count is O(diameter) for components (near-dup clusters are
tiny — diameter 2-4) and a fixed small count for Lloyd steps. State
between iterations lives in executor/disk blocks, not the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    a_col: str = "a_id",
    b_col: str = "b_id",
    max_iter: int = 20,
) -> DataFrame:
    """Connected components over an undirected edge list via iterative
    min-label propagation. Returns (id, component) where component is
    the minimum node id reachable from ``id``.

    Each iteration joins every node's current label against its
    neighbors' labels and keeps the minimum — converged when no label
    changes (a 1-row aggregate the driver checks). Near-dup graphs have
    tiny diameters, so 2-4 iterations typically suffice; ``max_iter``
    bounds adversarial chains.
    """
    # Undirected: materialize both directions once.
    fwd = edges.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
    rev = edges.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"))
    adj = fwd.unionByName(rev)
    labels = (
        adj.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        # Each node's candidate label: min over its own and neighbors'.
        neighbor_labels = (
            adj.join(labels, adj["dst"] == labels["id"])
            .select(F.col("src").alias("id"), F.col("component"))
        )
        new_labels = (
            labels.unionByName(neighbor_labels)
            .groupBy("id")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def kmeans_refine(
    embeddings: DataFrame,
    init_centroids: DataFrame,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_col: str = "label",
) -> DataFrame:
    """Lloyd-iteration refinement of IVF coarse centroids.

    ``init_centroids``: (bucket, centroid array<double>) — e.g. the
    per-label means from ``similarity.ivf_centroids``. Each iteration:
    assign every vector to its nearest (cosine) centroid via a
    broadcast of the |buckets| centroid table, then recompute centroids
    as per-assignment element-wise means (posexplode + two bounded
    hash aggregates). Returns (bucket, centroid, n_members).

    This is exactly how an IVF index trains at 100 TB: the only
    all-data operations are a broadcast-probe map and a shuffle whose
    size is |buckets| x dims.
    """
    from hadoop_log_analysis_spark.operators.similarity import cosine

    cents = init_centroids.select(
        F.col(bucket_col).alias("__b"), F.col("centroid")
    )
    for _ in range(n_iter):
        scored = (
            embeddings.select(id_col, vec_col)
            .crossJoin(F.broadcast(cents))
            .withColumn("__sim", cosine(F.col(vec_col), F.col("centroid")))
        )
        best = (
            scored.withColumn(
                "__rn",
                F.row_number().over(
                    Window.partitionBy(id_col).orderBy(
                        F.col("__sim").desc(), F.col("__b")
                    )
                ),
            )
            .filter(F.col("__rn") == 1)
            .select(id_col, F.col("__b"), vec_col)
        )
        per_dim = (
            best.select("__b", F.posexplode(F.col(vec_col)).alias("pos", "x"))
            .groupBy("__b", "pos")
            .agg(F.avg(F.col("x").cast("double")).alias("m"))
        )
        cents = (
            per_dim.groupBy("__b")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("__pm"))
            .select("__b", F.expr("transform(__pm, s -> s.m)").alias("centroid"))
            .localCheckpoint(eager=True)
        )
    members = (
        embeddings.select(id_col, vec_col)
        .crossJoin(F.broadcast(cents))
        .withColumn("__sim", cosine(F.col(vec_col), F.col("centroid")))
        .withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy(id_col).orderBy(
                    F.col("__sim").desc(), F.col("__b")
                )
            ),
        )
        .filter(F.col("__rn") == 1)
        .groupBy("__b")
        .agg(F.count("*").alias("n_members"))
    )
    return (
        cents.join(members, "__b", "left")
        .select(
            F.col("__b").alias(bucket_col),
            "centroid",
            F.coalesce("n_members", F.lit(0)).alias("n_members"),
        )
    )
