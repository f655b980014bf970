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

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

logger = logging.getLogger(__name__)


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

    Budget semantics (ADVICE r9): the lazy seed means the FIRST pass is
    an unconditional confirming pass (``prev_sum=None`` forces
    ``changed=1``), so a graph whose true fixed point needs k label-
    moving passes converges CERTIFIED after k+1 iterations — the
    effective certification budget is ``max_iter - 1``. ``max_iter``
    must be >= 2: with 1, even an already-converged label table exits
    through the spurious hit-max_iter warning.
    """
    # Undirected: materialize both directions once. The checkpoint is
    # load-bearing twice over — (a) the edge list is the output of the
    # expensive candidate-generation pipeline (LSH fingerprint + bucket
    # self-join + exact verify) and is re-joined EVERY iteration, so
    # without it each pass recomputes the whole upstream plan (measured
    # at sf0.1: 7.2 s -> 2.6 s for semantic-dedup components); (b) it
    # cuts lineage so per-iteration plans stay flat. Edges ≪ corpus
    # (only near-dup pairs), so executor-local blocks hold them easily
    # at 100 TB.
    from pyspark.sql import Observation

    if max_iter < 2:
        raise ValueError(
            "connected_components needs max_iter >= 2: the lazy seed "
            "spends iteration 1 as an unconditional confirming pass, so "
            f"max_iter={max_iter} could never certify convergence"
        )
    fwd = edges.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
    rev = edges.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"))
    adj = fwd.unionByName(rev).localCheckpoint(eager=True)
    # ADVICE r3: non-numeric ids (e.g. string doc hashes) break the
    # sum certificate — NULL sums under legacy casting (loop exits
    # after ONE iteration, unconverged, silent) or an opaque ANSI cast
    # error mid-job. Reject up-front with an actionable message.
    from pyspark.sql import types as T

    id_type = adj.schema["src"].dataType
    if not isinstance(id_type, T.NumericType):
        raise TypeError(
            "connected_components requires numeric node ids for its "
            f"sum-based convergence certificate (got {id_type}); map "
            "string ids to bigints (e.g. xxhash64 or a dense rank) "
            "before calling"
        )
    # Convergence certificate: labels are mins over a set containing
    # the previous label, so they are componentwise non-increasing and
    # sum(component) strictly decreases until the fixed point (decimal:
    # sums of 10^9 ids of 10^9 overflow bigint). The sum rides the
    # checkpoint job itself as an OBSERVED metric (CollectMetrics
    # accumulator), so each iteration runs ONE job, not a checkpoint
    # job plus a separate 1-row aggregate action — at 100 TB that is
    # one full pass over the label table saved per iteration.
    #
    # The seed label table stays LAZY (no eager checkpoint, no initial
    # sum): iteration 1 recomputes the cheap distinct-over-checkpointed-
    # edges plan once and prev_sum=None skips the first convergence
    # compare — the loop then needs one confirming pass like any other
    # fixed-point check, but saves a whole eager-checkpoint job per
    # call (r9: ~0.3-0.5 s of the semantic-dedup drain was this seed
    # job; at 100 TB it is one full label-table pass saved).
    sum_metric = F.sum(F.col("component").cast("decimal(38,0)")).alias("s")
    labels = (
        adj.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
    )
    prev_sum = None
    changed = 0
    for _ in range(max_iter):
        # Each node's candidate label: min over its own and neighbors'.
        neighbor_labels = (
            adj.join(labels, adj["dst"] == labels["id"])
            .select(F.col("src").alias("id"), F.col("component"))
        )
        obs = Observation()
        new_labels = (
            labels.unionByName(neighbor_labels)
            .groupBy("id")
            .agg(F.min("component").alias("component"))
            .observe(obs, sum_metric)
            .localCheckpoint(eager=True)
        )
        new_sum = obs.get["s"]
        changed = 1 if prev_sum is None else int(new_sum != prev_sum)
        prev_sum = new_sum
        labels = new_labels
        if changed == 0:
            break
    if changed != 0:
        # Labels were still moving when the iteration budget ran out:
        # the result is NOT a fixed point (ADVICE.md clustering.py:57).
        logger.warning(
            "connected_components hit max_iter=%d before convergence; "
            "returned labels may merge further on longer-diameter graphs",
            max_iter,
        )
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
        # Argmax by (sim desc, bucket asc) as a hash aggregate: max_by
        # over struct(sim, -bucket) gets map-side partial aggregation,
        # vs the round-1 row_number window which shuffled and sorted the
        # whole n x k scored cross product (ADVICE.md clustering.py:108).
        best = (
            scored.groupBy(id_col)
            .agg(
                F.max_by(
                    F.struct(F.col("__b"), F.col(vec_col).alias("__v")),
                    F.struct(F.col("__sim"), (-F.col("__b")).alias("__nb")),
                ).alias("__best")
            )
            .select(id_col, F.col("__best.__b").alias("__b"), F.col("__best.__v").alias(vec_col))
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
        .groupBy(id_col)
        .agg(
            F.max_by(
                F.col("__b"), F.struct(F.col("__sim"), (-F.col("__b")).alias("__nb"))
            ).alias("__b")
        )
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
