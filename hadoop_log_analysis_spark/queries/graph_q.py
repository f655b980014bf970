"""Iterative graph analytics over corpus-derived graphs (SURVEY.md §2
extension family: the connected-components machinery in
operators/clustering.py already covers transitive closure; this module
adds NUMERIC iterative algorithms — fixed-iteration PageRank — the
other canonical shape a log/corpus pipeline runs on Spark).

Graph source: the token co-occurrence digraph of the documents table —
a distinct edge (src, dst) per adjacent token pair. The vocabulary is
engine-bounded (FIXTURES.md: ~31 tokens), so node/edge frames are tiny
relative to the corpus; at 100 TB the same holds for any bounded-vocab
graph (entities, hosts, services), which is exactly when driver-looped
joint iteration is the right Spark shape.

Scale posture: each PageRank iteration is one bounded join
(edges ⋈ ranks, both vocabulary-sized) plus a groupBy on dst —
shuffle volume O(|edges|) per iteration, never corpus-sized; the
corpus is read ONCE to build the edge list. The loop runs a FIXED
iteration count (deterministic, SQL-unrollable for the oracle) rather
than to convergence — the convergence-driven variant would reuse the
observed-metrics certificate from operators/clustering.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_log_analysis_spark.queries import query
from hadoop_log_analysis_spark.sources.catalog import scan

PR_DAMPING = 0.85
PR_ITERS = 3

# One iteration of the unrolled oracle: rank(v) <- 0.15 + 0.85 *
# sum over in-edges (u, v) of prev(u) / out_degree(u); nodes with no
# in-edges keep the teleport mass 0.15 (LEFT JOIN + coalesce). Dangling
# nodes (no out-edges) simply do not contribute — the same convention
# on both engines, documented rather than redistributed.
_PR_STEP = """
{out} AS (SELECT n.tok, 0.15 + 0.85 * coalesce(sum(r.r / deg.d), 0.0) AS r
          FROM nodes n
          LEFT JOIN edges e ON e.dst = n.tok
          LEFT JOIN deg ON deg.src = e.src
          LEFT JOIN {prev} r ON r.tok = e.src
          GROUP BY n.tok)"""


@query(
    "q_pagerank_tokens",
    oracle=f"""
        WITH toks AS (SELECT string_split(text, ' ') AS t FROM documents),
        edges AS (
          SELECT DISTINCT t[i] AS src, t[i + 1] AS dst
          FROM (SELECT t, unnest(range(1, len(t))) AS i FROM toks)
        ),
        deg AS (SELECT src, count(*) AS d FROM edges GROUP BY src),
        nodes AS (SELECT src AS tok FROM edges UNION SELECT dst FROM edges),
        r0 AS (SELECT tok, 1.0 AS r FROM nodes),
        {_PR_STEP.format(out="r1", prev="r0")},
        {_PR_STEP.format(out="r2", prev="r1")},
        {_PR_STEP.format(out="r3", prev="r2")}
        SELECT tok, round(r, 6) AS rank FROM r3
        ORDER BY rank DESC, tok
    """,
    tags=("graph", "iterative", "J2", "A1", "L5"),
)
def q_pagerank_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-iteration PageRank (3 steps, damping 0.85, uniform 1.0
    seed) over the token co-occurrence digraph. The driver loop issues
    one bounded join + aggregate per iteration; the DuckDB oracle is
    the same recurrence unrolled into three CTEs, so the comparison
    pins every arithmetic choice (teleport constant, no-in-edge
    coalesce, dangling-node convention).

    Determinism: per-node contribution sums have <= |vocab| terms, so
    engine summation-order differences are ~1e-15 and the round(6)
    output is stable; ORDER BY is on the rounded rank with a token
    tie-break.

    Scale shape: the corpus is scanned once for the distinct edge
    list; every iteration shuffles O(|edges|) rows. Edges + degrees
    are cached across iterations so the scan is not re-executed per
    step (the checkpoint discipline SCALE.md requires of iterative
    plans).

    Plan-shape choices MEASURED at sf0.1 (3 fresh runs each):
    chained lineage 2.02-2.10 s; per-iteration localCheckpoint
    2.05-2.29 s (no win — 3 iterations is too shallow for lineage
    cost to matter); explicit broadcast() of the rank table into
    every iteration join 3.06-3.99 s (per-iteration broadcast
    construction round-trips dominate at vocabulary scale). So the
    joins stay hint-free: AQE converts them to broadcasts at runtime
    when the rank side is actually small, without the driver-side
    rebuild cost the explicit hint forces.
    """
    toks = scan(spark, sf_dir, "documents").select(
        F.split("text", " ").alias("t")
    )
    pairs = F.expr(
        "transform(sequence(1, size(t) - 1), "
        "i -> struct(element_at(t, i) AS src, element_at(t, i + 1) AS dst))"
    )
    edges = (
        toks.select(F.explode(pairs).alias("e"))
        .select("e.src", "e.dst")
        .distinct()
        .cache()
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("d"))
    nodes = (
        edges.select(F.col("src").alias("tok"))
        .union(edges.select(F.col("dst").alias("tok")))
        .distinct()
    )
    # (src, dst, d) is iteration-invariant: cache it once.
    adj = edges.join(deg, "src").cache()

    ranks = nodes.select("tok", F.lit(1.0).alias("r"))
    for _ in range(PR_ITERS):
        contribs = (
            adj.join(ranks.withColumnRenamed("tok", "src"), "src")
            .groupBy("dst")
            .agg(F.sum(F.col("r") / F.col("d")).alias("c"))
        )
        ranks = nodes.join(
            contribs, nodes["tok"] == contribs["dst"], "left"
        ).select(
            "tok",
            (
                F.lit(1 - PR_DAMPING)
                + F.lit(PR_DAMPING) * F.coalesce(F.col("c"), F.lit(0.0))
            ).alias("r"),
        )
    return ranks.select("tok", F.round("r", 6).alias("rank")).orderBy(
        F.col("rank").desc(), "tok"
    )
