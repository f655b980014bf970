"""Training-data governance queries (round 4, waves 6-9).

The operations a 100 TB pretraining-corpus owner runs BETWEEN
pipeline stages: distribution-drift detection (Jensen-Shannon
divergence over token distributions, two-sample Kolmogorov-Smirnov,
population stability index — with a streaming twin in streaming_q),
privacy auditing (k-anonymity equivalence classes with a
generalization ladder), contrastive training-pair mining
(hard-negative mining over the embedding table), statistical
uncertainty (Poisson-bootstrap confidence intervals), corpus
forensics (weighted log-odds distinctive terms), source-diversity
indices, and the quality-gate gains table.

Every query here is fully SQL-oracled: the DuckDB twin runs the same
closed-form arithmetic, so the driver hash pins not just row sets but
the exact divergence/statistic values to 6 decimals. Operators whose
output depends on comparing computed floats derive the compared
quantity from shared integer hashes (functions.HASH_MULT/HASH_MOD)
and/or round to fixed precision BEFORE comparing — cross-engine
determinism by contract, not FP luck.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_log_analysis_spark.functions import (
    HASH_MOD,
    HASH_MULT,
    dec_var,
    dsum,
    equal_width_bin,
    dsum2,
    exact_comoment,
    money_sum,
    pin,
)
from hadoop_log_analysis_spark.operators import text as TXT
from hadoop_log_analysis_spark.operators.similarity import cosine
from hadoop_log_analysis_spark.queries import query
from hadoop_log_analysis_spark.sources.catalog import scan


@query(
    "q_js_divergence",
    oracle="""
        WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS tok
                     FROM documents),
        sc AS (SELECT source, tok, count(*) AS c FROM tok GROUP BY 1, 2),
        st AS (SELECT source, CAST(sum(c) AS BIGINT) AS tot FROM sc GROUP BY 1),
        gc AS (SELECT tok, sum(c) AS g FROM sc GROUP BY 1),
        gt AS (SELECT sum(c) AS gtot FROM sc),
        j AS (SELECT sc.source,
                     sc.c * 1.0 / st.tot AS p,
                     gc.g * 1.0 / gt.gtot AS q
              FROM sc JOIN st USING (source) JOIN gc USING (tok) CROSS JOIN gt),
        a AS (SELECT source,
                     CAST(count(*) AS BIGINT) AS vocab,
                     sum(0.5 * p * ln(2 * p / (p + q))
                         + 0.5 * q * ln(2 * q / (p + q))) AS t,
                     sum(q) AS qsum
              FROM j GROUP BY source)
        SELECT a.source, st.tot AS n_tokens, a.vocab,
               round((t + 0.5 * ln(2) * (1 - qsum)) / ln(2), 6) AS jsd_bits
        FROM a JOIN st USING (source)
        ORDER BY source
    """,
    tags=("L7", "drift", "diagnostic"),
)
def q_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-distribution drift: Jensen-Shannon divergence
    (in bits) between each source's unigram distribution P_s and the
    corpus distribution M. The standard "is this crawl snapshot /
    source shard distributionally off?" gate before mixing.

    Zero-frequency handling without a source x vocab cross join: for
    tokens the source HAS, both halves of the symmetric KL are summed
    directly; the tail of corpus tokens the source LACKS contributes
    exactly 0.5*ln(2)*(1 - sum_{t in source} M(t)) (each missing
    token's term is 0.5*q*ln(2q/(0+q))), folded in as a closed form.
    So the plan is: explode -> (source, tok) hash agg -> two bounded
    re-aggs (per-source totals, per-token corpus counts) -> one join
    keyed by token -> per-source sum. Shuffles are bounded by
    |sources x vocab-per-source|, never corpus size; the corpus-total
    scalar is a broadcast 1-row aggregate.
    """
    docs = scan(spark, sf_dir, "documents")
    sc = (
        docs.select("source", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count("*").alias("c"))
    )
    st = sc.groupBy("source").agg(F.sum("c").alias("tot"))
    gc = sc.groupBy("tok").agg(F.sum("c").alias("g"))
    gt = sc.agg(F.sum("c").alias("gtot"))
    p = F.col("c") / F.col("tot")
    q = F.col("g") / F.col("gtot")
    half = F.lit(0.5)
    j = (
        sc.join(st, "source")
        .join(gc, "tok")
        .crossJoin(F.broadcast(gt))
        .select(
            "source",
            "tot",
            (
                half * p * F.log(F.lit(2) * p / (p + q))
                + half * q * F.log(F.lit(2) * q / (p + q))
            ).alias("term"),
            q.alias("q"),
        )
    )
    ln2 = F.log(F.lit(2.0))
    return (
        j.groupBy("source")
        .agg(
            F.max("tot").alias("n_tokens"),
            F.count("*").alias("vocab"),
            F.sum("term").alias("t"),
            F.sum("q").alias("qsum"),
        )
        .select(
            "source",
            "n_tokens",
            "vocab",
            F.round(
                (F.col("t") + half * ln2 * (F.lit(1.0) - F.col("qsum"))) / ln2, 6
            ).alias("jsd_bits"),
        )
        .orderBy("source")
    )


@query(
    "q_ks_drift",
    oracle="""
        WITH e AS (SELECT event_type, value FROM events
                   WHERE value IS NOT NULL),
        vt AS (SELECT value, event_type, count(*) AS c_t
                    FROM e GROUP BY 1, 2),
        va AS (SELECT value, count(*) AS c_all FROM e GROUP BY 1),
        ty AS (SELECT event_type, count(*) AS n_t,
                      CAST(sum(count(*)) OVER () AS BIGINT) AS n_all
               FROM e GROUP BY 1),
        grid AS (SELECT va.value, ty.event_type, ty.n_t, ty.n_all, va.c_all,
                        coalesce(vt.c_t, 0) AS c_t
                 FROM va CROSS JOIN ty
                 LEFT JOIN vt ON vt.value = va.value
                             AND vt.event_type = ty.event_type),
        cum AS (SELECT event_type, n_t, n_all,
                       sum(c_t) OVER w AS cum_t,
                       sum(c_all) OVER w AS cum_all
                FROM grid
                WINDOW w AS (PARTITION BY event_type ORDER BY value
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        SELECT event_type, CAST(n_t AS BIGINT) AS n,
               round(max(abs(cum_t * 1.0 / n_t
                             - (cum_all - cum_t) * 1.0
                               / nullif(n_all - n_t, 0))), 6)
                 AS ks_stat
        FROM cum
        GROUP BY event_type, n_t
        ORDER BY event_type
    """,
    tags=("A5", "drift", "diagnostic", "timeseries"),
)
def q_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift per event type: the KS
    statistic between each type's `value` distribution and the
    distribution of all OTHER events, i.e. max over x of
    |F_type(x) - F_rest(x)| evaluated at every observed value (the
    ECDF only changes there, so this is the exact sup).

    Plan: one hash agg to (value, type) counts, one to per-value
    totals, a |values| x |types| grid (types is a tiny broadcast), and
    a cumulative-sum window PARTITIONED BY type — |types| parallel
    sorted scans over distinct values, never over raw events. At
    100 TB the distinct-value set is what matters; for unbounded
    continuous domains, quantize `value` into fixed-width bins first
    (the PSI query shows that banding) — KS on the binned ECDF bounds
    the true statistic within one bin's mass.

    NULL values are excluded up-front in BOTH engines (ADVICE r4): the
    ECDF window orders by value, and Spark's NULLS FIRST vs DuckDB's
    NULLS LAST default would park a NULL grid row at opposite ends of
    the cumulative scan, shifting every prefix on one engine only. The
    f_rest denominator is nullif-guarded so a single-type corpus
    yields NULL on both engines instead of Spark-NULL-vs-DuckDB-inf.
    """
    ev = scan(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    vt = ev.groupBy("value", "event_type").agg(F.count("*").alias("c_t"))
    va = ev.groupBy("value").agg(F.count("*").alias("c_all"))
    ty = (
        ev.groupBy("event_type")
        .agg(F.count("*").alias("n_t"))
        .withColumn("n_all", F.sum("n_t").over(Window.partitionBy()))
    )
    grid = (
        va.crossJoin(F.broadcast(ty))
        .join(vt, ["value", "event_type"], "left")
        .withColumn("c_t", F.coalesce("c_t", F.lit(0)))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = grid.select(
        "event_type",
        "n_t",
        "n_all",
        F.sum("c_t").over(w).alias("cum_t"),
        F.sum("c_all").over(w).alias("cum_all"),
    )
    f_t = F.col("cum_t") * F.lit(1.0) / F.col("n_t")
    f_rest = (F.col("cum_all") - F.col("cum_t")) * F.lit(1.0) / F.nullif(
        F.col("n_all") - F.col("n_t"), F.lit(0)
    )
    return (
        cum.groupBy("event_type", "n_t")
        .agg(F.round(F.max(F.abs(f_t - f_rest)), 6).alias("ks_stat"))
        .select("event_type", F.col("n_t").alias("n"), "ks_stat")
        .orderBy("event_type")
    )


# Shared by q_psi_drift (batch) and q_stream_psi_monitor (streaming
# twin): identical SQL — the stream must land on the batch answer.
_PSI_ORACLE = """
        WITH ref AS (SELECT event_type, value FROM events
                     WHERE ts < TIMESTAMP '2024-01-16'),
        cur AS (SELECT event_type, value FROM events
                WHERE ts >= TIMESTAMP '2024-01-16'),
        b AS (SELECT event_type,
                     CAST(min(value) AS DOUBLE) AS lo,
                     CAST(max(value) AS DOUBLE) AS hi,
                     count(*) AS n_ref
              FROM ref GROUP BY 1),
        nc AS (SELECT event_type, count(*) AS n_cur FROM cur GROUP BY 1),
        rb AS (SELECT r.event_type,
                      CASE WHEN b.hi > b.lo
                           THEN CAST(least(9, greatest(0, floor(
                                (CAST(r.value AS DOUBLE) - b.lo) * 10.0
                                / (b.hi - b.lo)))) AS INT)
                           ELSE 0 END AS bin,
                      count(*) AS c
               FROM ref r JOIN b USING (event_type) GROUP BY 1, 2),
        cb AS (SELECT c.event_type,
                      CASE WHEN b.hi > b.lo
                           THEN CAST(least(9, greatest(0, floor(
                                (CAST(c.value AS DOUBLE) - b.lo) * 10.0
                                / (b.hi - b.lo)))) AS INT)
                           ELSE 0 END AS bin,
                      count(*) AS c
               FROM cur c JOIN b USING (event_type) GROUP BY 1, 2),
        grid AS (SELECT b.event_type, b.n_ref, nc.n_cur, g.bin,
                        coalesce(rb.c, 0) AS cr, coalesce(cb.c, 0) AS cc
                 FROM b JOIN nc USING (event_type)
                 CROSS JOIN (SELECT unnest(generate_series(0, 9)) AS bin) g
                 LEFT JOIN rb ON rb.event_type = b.event_type AND rb.bin = g.bin
                 LEFT JOIN cb ON cb.event_type = b.event_type AND cb.bin = g.bin),
        terms AS (SELECT event_type, n_ref, n_cur,
                         (cc + 0.5) / (n_cur + 5.0) AS pc,
                         (cr + 0.5) / (n_ref + 5.0) AS pr
                  FROM grid)
        SELECT event_type,
               CAST(n_ref AS BIGINT) AS n_ref,
               CAST(n_cur AS BIGINT) AS n_cur,
               CAST(sum(CAST(floor((pc - pr) * ln(pc / pr)
                                   * 100000000.0 + 0.5) AS BIGINT))
                    AS DOUBLE) / 100000000.0 AS psi
        FROM terms
        GROUP BY event_type, n_ref, n_cur
        ORDER BY event_type
"""

_PSI_CUT = "2024-01-16"


def _psi_reference(ev: DataFrame) -> DataFrame:
    """Per-type reference bounds + count from the period before the
    cut — the broadcast-sized snapshot both PSI variants band against."""
    cut = F.lit(_PSI_CUT).cast("timestamp")
    return (
        ev.filter(F.col("ts") < cut)
        .groupBy("event_type")
        .agg(
            F.min(F.col("value").cast("double")).alias("lo"),
            F.max(F.col("value").cast("double")).alias("hi"),
            F.count("*").alias("n_ref"),
        )
    )


def _psi_binned(side: DataFrame, b: DataFrame) -> DataFrame:
    """Band a (event_type, value) stream into the reference's 10
    equal-width bins -> (event_type, bin, c) counts. Works unchanged
    on a STREAMING side (broadcast stream-static join + bounded-state
    aggregation)."""
    bin_expr = equal_width_bin(
        F.col("value").cast("double"), F.col("lo"), F.col("hi"), 10
    )
    return (
        side.join(F.broadcast(b.select("event_type", "lo", "hi")), "event_type")
        .select("event_type", bin_expr.alias("bin"))
        .groupBy("event_type", "bin")
        .agg(F.count("*").alias("c"))
    )


def _psi_assemble(b: DataFrame, rb: DataFrame, cb: DataFrame) -> DataFrame:
    """Fold reference bounds + reference/current bin counts into the
    PSI report. n_cur is derived from the current bin counts (every
    current row lands in exactly one bin), so the assembly needs only
    the three bounded tables — which is what lets the streaming twin
    hand over its drained state table unchanged."""
    spark = b.sparkSession
    nc = cb.groupBy("event_type").agg(F.sum("c").alias("n_cur"))
    bins = F.broadcast(
        spark.range(1).select(
            F.explode(F.sequence(F.lit(0), F.lit(9))).alias("bin")
        )
    )
    grid = (
        b.select("event_type", "n_ref")
        .join(nc, "event_type")
        .crossJoin(bins)
        .join(rb.withColumnRenamed("c", "cr"), ["event_type", "bin"], "left")
        .join(cb.withColumnRenamed("c", "cc"), ["event_type", "bin"], "left")
        .select(
            "event_type",
            "n_ref",
            "n_cur",
            F.coalesce("cr", F.lit(0)).alias("cr"),
            F.coalesce("cc", F.lit(0)).alias("cc"),
        )
    )
    pc = (F.col("cc") + 0.5) / (F.col("n_cur") + 5.0)
    pr = (F.col("cr") + 0.5) / (F.col("n_ref") + 5.0)
    return (
        grid.groupBy("event_type", "n_ref", "n_cur")
        # per-bin terms are identical doubles (exact counts + one ln,
        # whose libm ulp the 1e-8 grid shrinks to a ~1e-8 per-bin
        # boundary-flip probability — residual, not eliminated); the
        # 10-term float sum is order-dependent -> per-row grid pin +
        # exact int64 sum
        .agg(
            (
                F.sum(
                    F.floor(
                        (pc - pr) * F.log(pc / pr) * F.lit(100000000.0)
                        + F.lit(0.5)
                    ).cast("long")
                ).cast("double")
                / F.lit(100000000.0)
            ).alias("psi")
        )
        .orderBy("event_type")
    )


@query(
    "q_psi_drift",
    oracle=_PSI_ORACLE,
    tags=("A5", "drift", "diagnostic", "timeseries"),
)
def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index per event type between a reference
    period (first half of January) and the current period (the rest):
    band the reference min-max range into 10 equal-width bins, clamp
    current values into them, Laplace-smooth ((c+0.5)/(n+5)) so empty
    bins stay finite, PSI = sum (p_cur - p_ref) * ln(p_cur / p_ref).
    The standard "has this feature shifted since the snapshot we
    trained on?" monitor.

    Equal-width banding (not quantiles) keeps the two engines exactly
    comparable — the bin of a value is a closed-form floor(), no
    interpolation semantics to align. Plan: two filtered scans (the
    date predicate pushes into the parquet scan), per-type bounds as a
    tiny broadcast, bin hash-aggs bounded by |types| x 10, and the
    10-bin grid materialized from `sequence` so zero-count bins still
    contribute their smoothed mass.
    """
    ev = scan(spark, sf_dir, "events")
    cut = F.lit(_PSI_CUT).cast("timestamp")
    ref = ev.filter(F.col("ts") < cut).select("event_type", "value")
    cur = ev.filter(F.col("ts") >= cut).select("event_type", "value")
    b = _psi_reference(ev)
    return _psi_assemble(b, _psi_binned(ref, b), _psi_binned(cur, b))


@query(
    "q_k_anonymity",
    oracle="""
        WITH cls AS (SELECT lang, source,
                            CAST(floor(n_chars / 100) AS INT) AS len_band,
                            count(*) AS class_size
                     FROM documents GROUP BY 1, 2, 3)
        SELECT lang, source, len_band,
               CAST(class_size AS BIGINT) AS class_size,
               class_size < 5 AS at_risk,
               CAST(sum(class_size) OVER (PARTITION BY lang, len_band)
                    AS BIGINT) AS relaxed_size,
               sum(class_size) OVER (PARTITION BY lang, len_band) >= 5
                 AS relaxed_ok
        FROM cls
        ORDER BY lang, source, len_band
    """,
    tags=("L7", "compliance", "diagnostic"),
)
def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the quasi-identifier (lang, source,
    length band): the size of every equivalence class, whether it
    breaks k=5, and the first rung of the generalization ladder —
    the class size after suppressing `source` — so a release decision
    can see which at-risk classes generalization would rescue.

    Plan: one hash agg to class sizes (map-side combinable — the only
    corpus-scale shuffle, keyed by the quasi-identifier), then a
    window over the CLASS table (|classes| rows, not |docs|) for the
    relaxed sizes. The per-class output is itself release-candidate
    metadata, report-sized.
    """
    docs = scan(spark, sf_dir, "documents")
    cls = docs.groupBy(
        "lang",
        "source",
        F.floor(F.col("n_chars") / 100).cast("int").alias("len_band"),
    ).agg(F.count("*").alias("class_size"))
    w = Window.partitionBy("lang", "len_band")
    return cls.select(
        "lang",
        "source",
        "len_band",
        "class_size",
        (F.col("class_size") < 5).alias("at_risk"),
        F.sum("class_size").over(w).alias("relaxed_size"),
        (F.sum("class_size").over(w) >= 5).alias("relaxed_ok"),
    ).orderBy("lang", "source", "len_band")


@query(
    "q_hard_negatives",
    oracle="""
        WITH q AS (SELECT vec_id AS qid, embedding AS qv, label AS qlab
                   FROM embeddings WHERE vec_id % 50 = 0),
        p AS (SELECT q.qid, q.qlab, e.vec_id, e.label,
                     round(
                     list_sum(list_transform(range(1, len(e.embedding) + 1),
                         i -> CAST(e.embedding[i] AS DOUBLE)
                              * CAST(q.qv[i] AS DOUBLE)))
                     / (sqrt(list_sum(list_transform(range(1, len(e.embedding) + 1),
                           i -> CAST(e.embedding[i] AS DOUBLE)
                                * CAST(e.embedding[i] AS DOUBLE))))
                        * sqrt(list_sum(list_transform(range(1, len(q.qv) + 1),
                           i -> CAST(q.qv[i] AS DOUBLE)
                                * CAST(q.qv[i] AS DOUBLE))))), 6)
                       AS sim
              FROM embeddings e JOIN q ON e.vec_id <> q.qid),
        neg AS (SELECT qid, vec_id, sim,
                       row_number() OVER (PARTITION BY qid
                                          ORDER BY sim DESC, vec_id) AS rn
                FROM p WHERE label <> qlab),
        pos AS (SELECT qid, max(sim) AS pos_sim
                FROM p WHERE label = qlab GROUP BY qid)
        SELECT qid, vec_id AS hard_neg_id,
               round(sim, 6) AS hard_neg_sim,
               round(pos_sim, 6) AS best_pos_sim,
               round(pos_sim - sim, 6) AS margin
        FROM neg JOIN pos USING (qid)
        WHERE rn = 1
        ORDER BY qid
    """,
    tags=("L3", "mining", "classify"),
)
def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: for each query
    vector (every 50th embedding), the single highest-cosine vector
    with a DIFFERENT label (the hard negative) alongside the best
    same-label cosine, and the margin between them. Queries with a
    negative margin are the ones whose hardest negative outranks every
    positive — exactly the pairs a contrastive fine-tune wants.

    Plan: the query set is a broadcast (it is a sampled sliver of the
    table); the corpus side streams once through a codegen'd
    zip_with/aggregate cosine — |corpus| x |queries| map work with NO
    shuffle of the corpus. The per-query argmax is an AGGREGATION on
    max(struct(sim, -id)) — map-side partial, no sort — not a window,
    so no per-query sort of the candidate stream. At real scale the
    query fan-out is batched and the corpus side is pre-pruned by the
    IVF index (operators/similarity.ivf_probe) before the exact
    rerank; tie-break is (sim desc, id asc) on both engines.

    Cosines are rounded to 6 dp BEFORE the per-query argmax and the
    pos-max in BOTH engines (ADVICE r4, matching the q_mmr_rerank
    discipline): the two engines compute the cosine through different
    codepaths (fold-based dot/norm vs DuckDB list arithmetic), so
    near-equal candidates could otherwise select different hard
    negatives despite the id tie-break.
    """
    emb = scan(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qv"),
        F.col("label").alias("qlab"),
    )
    pairs = (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "qlab",
            "vec_id",
            "label",
            F.round(cosine(F.col("embedding"), F.col("qv")), 6).alias("sim"),
        )
    )
    # r14 OPTIMIZATION (guide §2.3 "aggregate before you shuffle" /
    # §2.4): the neg and pos branches each re-ran the full
    # |corpus| x |queries| cosine pass (two separate subtrees over the
    # broadcast cross join — map-side, so no Exchange for runtime
    # reuse to share) and met again in a join. One conditional
    # aggregation computes both maxima in a single pass over the
    # scored stream with no join — at scale that halves the dominant
    # cost (the corpus-side cosine scan). max(when(...)) is NULL
    # exactly when a branch has no rows, so the non-NULL filter
    # reproduces the inner join's qid set; the aggregated values are
    # the same maxima over the same 6-dp-rounded sims.
    both = (
        pairs.groupBy("qid")
        .agg(
            F.max(
                F.when(
                    F.col("label") != F.col("qlab"),
                    F.struct(
                        F.col("sim").alias("s"),
                        (-F.col("vec_id")).alias("nid"),
                    ),
                )
            ).alias("m"),
            F.max(
                F.when(F.col("label") == F.col("qlab"), F.col("sim"))
            ).alias("pos_sim"),
        )
        .filter(F.col("m").isNotNull() & F.col("pos_sim").isNotNull())
    )
    return (
        both.select(
            "qid",
            (-F.col("m.nid")).alias("hard_neg_id"),
            F.round(F.col("m.s"), 6).alias("hard_neg_sim"),
            F.round("pos_sim", 6).alias("best_pos_sim"),
            F.round(F.col("pos_sim") - F.col("m.s"), 6).alias("margin"),
        )
        .orderBy("qid")
    )


@query(
    "q_source_diversity",
    oracle="""
        WITH c AS (SELECT lang, source, count(*) AS n
                   FROM documents GROUP BY 1, 2),
        t AS (SELECT lang, CAST(sum(n) AS BIGINT) AS tot,
                     CAST(count(*) AS BIGINT) AS n_sources,
                     CAST(max(n) AS BIGINT) AS top_n
              FROM c GROUP BY lang),
        e AS (SELECT c.lang,
                     -sum((n * 1.0 / tot) * ln(n * 1.0 / tot)) AS ent
              FROM c JOIN t USING (lang) GROUP BY c.lang)
        SELECT lang, tot AS n_docs, n_sources,
               round(ent, 6) AS entropy_nats,
               round(exp(ent), 6) AS effective_sources,
               round(top_n * 1.0 / tot, 6) AS top_source_share
        FROM e JOIN t USING (lang)
        ORDER BY lang
    """,
    tags=("L7", "mixture", "diagnostic"),
)
def q_source_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-composition diversity per language: Shannon entropy of
    the source mix, its exponential (the "effective number of
    sources" — the diversity index mixture designers target), and the
    top source's share (the concentration risk a single bad crawl
    poses). Complements q_source_mixture (which reports the mix) with
    the scalar indices a mixing policy thresholds on.

    Plan: one corpus-scale hash agg to (lang, source) counts, then
    everything else is arithmetic over the |langs| x |sources| count
    table — two bounded re-aggs and a join keyed by lang.
    """
    docs = scan(spark, sf_dir, "documents")
    c = docs.groupBy("lang", "source").agg(F.count("*").alias("n"))
    t = c.groupBy("lang").agg(
        F.sum("n").alias("n_docs"),
        F.count("*").alias("n_sources"),
        F.max("n").alias("top_n"),
    )
    p = F.col("n") / F.col("n_docs")
    e = (
        c.join(t, "lang")
        .groupBy("lang")
        .agg((-F.sum(p * F.log(p))).alias("ent"))
    )
    return (
        e.join(t, "lang")
        .select(
            "lang",
            "n_docs",
            "n_sources",
            F.round("ent", 6).alias("entropy_nats"),
            F.round(F.exp("ent"), 6).alias("effective_sources"),
            F.round(F.col("top_n") / F.col("n_docs"), 6).alias("top_source_share"),
        )
        .orderBy("lang")
    )


# Poisson(1) CDF literals for the bootstrap weights: identical doubles
# on both engines, so the inverse-CDF draw w = #{thresholds < u} is
# bit-deterministic. 9 thresholds cap w at 9 (P(w > 9) < 2e-6).
_POIS1_CDF = (
    "0.36787944117144233",
    "0.7357588823428847",
    "0.9196986029286058",
    "0.9810118431238463",
    "0.9963401531726563",
    "0.9994058151824183",
    "0.999916758850712",
    "0.9999897508033253",
    "0.999998874797402",
)
_BOOT_B = 24  # bootstrap replicates
_BOOT_MULT = HASH_MULT  # shared cross-engine constant (functions/)
_BOOT_STEP = 97003  # replicate offset prime
_BOOT_MOD = HASH_MOD

_BOOT_ORACLE = f"""
        WITH reps AS (SELECT unnest(generate_series(1, {_BOOT_B})) AS r),
        u AS (SELECT e.event_type, e.value, reps.r,
                     (CAST((e.event_id % {_BOOT_MOD} * {_BOOT_MULT}
                            + reps.r * {_BOOT_STEP})
                           % {_BOOT_MOD} AS DOUBLE) + 1.0)
                       / {_BOOT_MOD + 1}.0 AS unit
              FROM events e CROSS JOIN reps),
        w AS (SELECT event_type, value, r,
                     {" + ".join(f"(CASE WHEN unit > {t} THEN 1 ELSE 0 END)" for t in _POIS1_CDF)}
                       AS wt
              FROM u),
        means AS (SELECT event_type, r,
                         CAST(sum(wt * CAST(floor(value * 100.0 + 0.5)
                                            AS BIGINT)) AS DOUBLE)
                           / (sum(wt) * 100.0) AS m
                  FROM w GROUP BY event_type, r
                  HAVING sum(wt) > 0),
        g AS (SELECT event_type, m,
                     CAST(floor(m * 1000000.0 + 0.5) AS BIGINT) AS m6
              FROM means),
        pt AS (SELECT event_type,
                      CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                        / count(*) AS point_mean
               FROM events GROUP BY event_type)
        SELECT pt.event_type,
               floor(pt.point_mean * 10000.0 + 0.5) / 10000.0
                 AS point_mean,
               floor(quantile_cont(m, 0.025) * 10000.0 + 0.5) / 10000.0
                 AS ci_lo,
               floor(quantile_cont(m, 0.975) * 10000.0 + 0.5) / 10000.0
                 AS ci_hi,
               floor(sqrt(CAST(count(*) * sum(m6 * m6) - sum(m6) * sum(m6)
                               AS DOUBLE)
                          / (count(*) * (count(*) - 1.0))
                          / 1000000000000.0)
                     * 10000.0 + 0.5) / 10000.0 AS boot_se,
               CAST(count(*) AS BIGINT) AS b
        FROM g JOIN pt USING (event_type)
        GROUP BY pt.event_type, pt.point_mean
        ORDER BY pt.event_type
"""


@query(
    "q_bootstrap_ci",
    oracle=_BOOT_ORACLE,
    tags=("A5", "diagnostic", "sampling"),
)
def q_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap confidence intervals for the per-type mean
    event value: each row's multiplicity in replicate r is a
    Poisson(1) draw, so a resample needs NO global coordination —
    the reason the Poisson bootstrap (not n-out-of-n resampling) is
    the distributed-systems standard for uncertainty at scale. 24
    replicates, percentile CI (2.5/97.5) plus the bootstrap SE.

    Determinism discipline: the unit random is the shared Knuth
    multiplicative hash of (event_id, replicate) — integer math,
    identical in both engines — and the Poisson inverse CDF compares
    against shared double literals, so every weight matrix entry is
    bit-equal cross-engine. Plan shape: the corpus is scanned once;
    the replicate fan-out is a map-side explode (B x rows, map-only),
    the per-(type, replicate) means are one hash agg (map-side
    combinable), and everything after operates on |types| x B rows.
    At 100 TB you trade B x map volume for zero shuffles beyond the
    one bounded aggregation — or push the weight sum into the same
    pass as the base aggregate.
    """
    ev = scan(spark, sf_dir, "events")
    reps = F.explode(F.sequence(F.lit(1), F.lit(_BOOT_B))).alias("r")
    u = ev.select("event_id", "event_type", "value", reps).select(
        "event_type",
        "value",
        "r",
        (
            (
                (F.col("event_id") % _BOOT_MOD * _BOOT_MULT
                 + F.col("r") * _BOOT_STEP)
                % _BOOT_MOD
            ).cast("double")
            + F.lit(1.0)
        ).alias("scaled"),
    ).select(
        "event_type",
        "value",
        "r",
        (F.col("scaled") / F.lit(float(_BOOT_MOD + 1))).alias("unit"),
    )
    wt = sum(
        F.when(F.col("unit") > float(t), 1).otherwise(0) for t in _POIS1_CDF
    )
    # replicate means from exact integer cents (a float sum of
    # wt*value is partition-order-dependent): one identical double
    # division per (type, replicate); the SE then derives from exact
    # 1e-6-grid moments of the replicate means.
    cents = F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5)).cast(
        "long"
    )
    means = (
        u.select("event_type", "r", wt.alias("wt"), cents.alias("vc"))
        .groupBy("event_type", "r")
        .agg(
            F.sum(F.col("wt") * F.col("vc")).alias("sw"),
            F.sum("wt").alias("w"),
        )
        .filter(F.col("w") > 0)
        .select(
            "event_type",
            "r",
            (
                F.col("sw").cast("double") / (F.col("w") * F.lit(100.0))
            ).alias("m"),
        )
        .withColumn(
            "m6",
            F.floor(F.col("m") * F.lit(1000000.0) + F.lit(0.5)).cast(
                "long"
            ),
        )
    )
    pt = ev.groupBy("event_type").agg(
        (money_sum("value") / F.count("*")).alias("point_mean")
    )
    bb = F.count("*")
    # DECIMAL second moments: per-row m6^2 alone nears the long limit
    # for large grid-pinned means (shared r9 tier, functions.dsum2)
    se = F.sqrt(
        exact_comoment(F.col("m6")).cast("double")
        / (bb * (bb - F.lit(1.0)))
        / F.lit(1000000000000.0)
    )
    return (
        means.groupBy("event_type")
        .agg(
            pin(F.percentile("m", F.lit(0.025)), 4).alias("ci_lo"),
            pin(F.percentile("m", F.lit(0.975)), 4).alias("ci_hi"),
            pin(se, 4).alias("boot_se"),
            F.count("*").alias("b"),
        )
        .join(pt, "event_type")
        .select(
            "event_type",
            pin(F.col("point_mean"), 4).alias("point_mean"),
            "ci_lo",
            "ci_hi",
            "boot_se",
            "b",
        )
        .orderBy("event_type")
    )


@query(
    "q_distinctive_terms",
    oracle="""
        WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS tok
                     FROM documents),
        sc AS (SELECT source, tok, count(*) AS c FROM tok GROUP BY 1, 2),
        st AS (SELECT source, sum(c) AS ns FROM sc GROUP BY 1),
        gc AS (SELECT tok, sum(c) AS g FROM sc GROUP BY 1),
        tot AS (SELECT CAST(sum(g) AS DOUBLE) AS n,
                       CAST(count(*) AS DOUBLE) AS v
                FROM gc),
        m AS (SELECT sc.source, sc.tok, sc.c,
                     ln((sc.c + 0.01) / (st.ns + 0.01 * tot.v - sc.c - 0.01))
                     - ln((gc.g - sc.c + 0.01)
                          / (tot.n - st.ns + 0.01 * tot.v - (gc.g - sc.c) - 0.01))
                       AS delta,
                     1.0 / (sc.c + 0.01) + 1.0 / (gc.g - sc.c + 0.01) AS var
              FROM sc JOIN st USING (source) JOIN gc USING (tok)
              CROSS JOIN tot),
        z AS (SELECT source, tok, c, delta,
                     round(delta / sqrt(var), 6) AS zscore
              FROM m),
        r AS (SELECT source, tok, c, delta, zscore,
                     row_number() OVER (PARTITION BY source
                                        ORDER BY zscore DESC, tok) AS rn
              FROM z)
        SELECT source, tok, CAST(c AS BIGINT) AS n_in_source,
               round(delta, 6) AS log_odds, zscore
        FROM r WHERE rn <= 3
        ORDER BY source, zscore DESC, tok
    """,
    tags=("L5", "L7", "diagnostic"),
)
def q_distinctive_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What vocabulary makes each source DIFFERENT: weighted log-odds
    with an informative Dirichlet prior (Monroe/Colaresi/Quinn
    "Fightin' Words") of each source's token usage vs the rest of the
    corpus, z-scored by the delta's variance, top-3 terms per source.
    The standard corpus-forensics tool for spotting a source whose
    content drifted (spam injection, template leakage, language mix).

    Plan: the same (source, token) / per-source / per-token count
    tables as q_js_divergence (shuffles bounded by per-source vocab),
    the prior scalars as one broadcast 1-row aggregate, and the
    per-source top-3 via the windowless bounded top-k operator
    (operators/topk.py) — no per-source sort funnel; the z-score is
    rounded to 6 dp before ranking so the cross-engine order is
    exact.
    """
    from hadoop_log_analysis_spark.operators.topk import grouped_bottom_k

    docs = scan(spark, sf_dir, "documents")
    sc = (
        docs.select("source", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count("*").alias("c"))
    )
    st = sc.groupBy("source").agg(F.sum("c").alias("ns"))
    gc = sc.groupBy("tok").agg(F.sum("c").alias("g"))
    tot = gc.agg(
        F.sum("g").cast("double").alias("n"),
        F.count("*").cast("double").alias("v"),
    )
    j = sc.join(st, "source").join(gc, "tok").crossJoin(F.broadcast(tot))
    delta = F.log(
        (F.col("c") + 0.01) / (F.col("ns") + 0.01 * F.col("v") - F.col("c") - 0.01)
    ) - F.log(
        (F.col("g") - F.col("c") + 0.01)
        / (
            F.col("n")
            - F.col("ns")
            + 0.01 * F.col("v")
            - (F.col("g") - F.col("c"))
            - 0.01
        )
    )
    var = 1.0 / (F.col("c") + 0.01) + 1.0 / (F.col("g") - F.col("c") + 0.01)
    z = j.select(
        "source",
        "tok",
        "c",
        delta.alias("delta"),
        F.round(delta / F.sqrt(var), 6).alias("zscore"),
    )
    top = grouped_bottom_k(
        z,
        ["source"],
        F.struct(
            (-F.col("zscore")).alias("nz"),
            F.col("tok").alias("tok"),
            F.col("c").alias("c"),
            F.col("delta").alias("delta"),
        ),
        k=3,
    )
    return top.select(
        "source",
        F.col("item.tok").alias("tok"),
        F.col("item.c").alias("n_in_source"),
        F.round("item.delta", 6).alias("log_odds"),
        (-F.col("item.nz")).alias("zscore"),
    ).orderBy("source", F.desc("zscore"), "tok")


@query(
    "q_quality_gate_gains",
    oracle="""
        WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
                   FROM documents),
        tf AS (SELECT doc_id, tok, count(*) AS c
               FROM (SELECT doc_id, unnest(toks) AS tok FROM t)
               GROUP BY 1, 2),
        dl AS (SELECT doc_id, CAST(sum(c) AS DOUBLE) AS n FROM tf GROUP BY 1),
        ent AS (SELECT tf.doc_id,
                       round(-sum((c / n) * ln(c / n)), 6) AS e
                FROM tf JOIN dl USING (doc_id) GROUP BY tf.doc_id),
        lbl AS (SELECT t.doc_id,
                       (1.0 - len(list_distinct(toks)) * 1.0 / len(toks))
                         <= 0.4 AS pass
                FROM t),
        m AS (SELECT ent.doc_id, ent.e, lbl.pass
              FROM ent JOIN lbl USING (doc_id)),
        b AS (SELECT min(e) AS lo, max(e) AS hi FROM m),
        binned AS (SELECT CASE WHEN b.hi > b.lo
                               THEN 9 - CAST(least(9, greatest(0, floor(
                                    (m.e - b.lo) * 10.0 / (b.hi - b.lo))))
                                    AS INT)
                               ELSE 0 END AS bin,
                          m.e, m.pass
                   FROM m CROSS JOIN b),
        agg AS (SELECT bin, count(*) AS n_docs,
                       CAST(sum(CAST(floor(e * 1000000.0 + 0.5) AS BIGINT))
                            AS DOUBLE)
                         / (CAST(count(*) AS DOUBLE) * 1000000.0) AS avg_e,
                       sum(CASE WHEN pass THEN 1 ELSE 0 END) AS n_pass
                FROM binned GROUP BY bin),
        spine AS (SELECT unnest(generate_series(0, 9)) AS bin),
        g AS (SELECT spine.bin,
                     coalesce(agg.n_docs, 0) AS n_docs,
                     agg.avg_e,
                     coalesce(agg.n_pass, 0) AS n_pass
              FROM spine LEFT JOIN agg USING (bin))
        SELECT bin,
               CAST(n_docs AS BIGINT) AS n_docs,
               floor(avg_e * 10000.0 + 0.5) / 10000.0 AS avg_entropy,
               CASE WHEN n_docs > 0
                    THEN floor((n_pass * 1.0 / n_docs) * 10000.0 + 0.5)
                         / 10000.0 END AS pass_rate,
               CAST(sum(n_docs) OVER w AS BIGINT) AS cum_docs,
               floor((sum(n_pass) OVER w * 1.0
                      / greatest(sum(n_docs) OVER w, 1)) * 10000.0 + 0.5)
                 / 10000.0 AS cum_pass_rate
        FROM g
        WINDOW w AS (ORDER BY bin
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ORDER BY bin
    """,
    tags=("L7", "curation", "diagnostic"),
)
def q_quality_gate_gains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold-sensitivity gains table for a quality gate: rank
    documents by token-entropy (the information-density signal,
    rounded to 6 dp before banding so both engines band identically),
    band into 10 equal-width tiers with tier 0 = HIGHEST entropy, and
    report per tier and cumulatively how the repetition gate
    (dup-token fraction <= 0.4) agrees — the curve a curator reads to
    pick "keep the top N tiers" cutoffs and see what pass-rate each
    cutoff buys.

    Plan: the per-doc signal is the same vocabulary-bounded explode +
    hash agg as q_token_entropy; banding is a closed-form floor off a
    broadcast 1-row min/max; everything after the per-doc table is
    10-row arithmetic (the cumulative window runs over the bin spine,
    not documents).
    """
    docs = scan(spark, sf_dir, "documents")
    tf = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("c"))
    )
    dl = tf.groupBy("doc_id").agg(F.sum("c").cast("double").alias("n"))
    p = F.col("c") / F.col("n")
    ent = (
        tf.join(dl, "doc_id")
        .groupBy("doc_id")
        .agg(F.round(-F.sum(p * F.log(p)), 6).alias("e"))
    )
    # the same Gopher repetition gate q_gopher_rules thresholds —
    # ONE definition (operators/text.dup_token_frac), not an inline
    # copy (r4 review: divergent-copies hazard)
    lbl = docs.select("doc_id", (TXT.dup_token_frac() <= 0.4).alias("pass"))
    m = ent.join(lbl, "doc_id")
    b = m.agg(F.min("e").alias("lo"), F.max("e").alias("hi"))
    # tier 0 = HIGHEST entropy: reverse the shared equal-width bin id.
    # NOTE the 9 - x sits OUTSIDE the degenerate-range guard in the
    # original; equal_width_bin returns 0 on hi <= lo, and 9 - 0 = 9
    # would flip the degenerate tier, so guard the reversal too.
    ew = equal_width_bin(F.col("e"), F.col("lo"), F.col("hi"), 10)
    bin_expr = (
        F.when(F.col("hi") > F.col("lo"), F.lit(9) - ew)
        .otherwise(0)
        .cast("int")
    )
    agg = (
        m.crossJoin(F.broadcast(b))
        .select(bin_expr.alias("bin"), "e", "pass")
        .groupBy("bin")
        .agg(
            F.count("*").alias("n_docs"),
            # per-doc entropies are identical grid doubles; the bin avg
            # accumulates on a 1e-6 integer grid (order-free)
            (
                F.sum(
                    F.floor(
                        F.col("e") * F.lit(1000000.0) + F.lit(0.5)
                    ).cast("long")
                ).cast("double")
                / (F.count("*").cast("double") * F.lit(1000000.0))
            ).alias("avg_e"),
            F.sum(F.when(F.col("pass"), 1).otherwise(0)).alias("n_pass"),
        )
    )
    spine = spark.range(1).select(
        F.explode(F.sequence(F.lit(0), F.lit(9))).alias("bin")
    )
    g = (
        spine.join(agg, "bin", "left")
        .select(
            "bin",
            F.coalesce("n_docs", F.lit(0)).alias("n_docs"),
            "avg_e",
            F.coalesce("n_pass", F.lit(0)).alias("n_pass"),
        )
    )
    w = (
        Window.orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        g.select(
            "bin",
            "n_docs",
            pin(F.col("avg_e"), 4).alias("avg_entropy"),
            F.when(
                F.col("n_docs") > 0,
                pin(F.col("n_pass") * F.lit(1.0) / F.col("n_docs"), 4),
            ).alias("pass_rate"),
            F.sum("n_docs").over(w).alias("cum_docs"),
            pin(
                F.sum("n_pass").over(w)
                * F.lit(1.0)
                / F.greatest(F.sum("n_docs").over(w), F.lit(1)),
                4,
            ).alias("cum_pass_rate"),
        )
        .orderBy("bin")
    )


@query(
    "q_ab_test_report",
    oracle=f"""
        WITH u AS (SELECT user_id,
                          (user_id % {HASH_MOD} * {HASH_MULT}) % {HASH_MOD} % 2 AS arm,
                          max(CASE WHEN event_type = 'purchase'
                                        AND value > 300
                                   THEN 1 ELSE 0 END) AS converted
                   FROM events
                   GROUP BY user_id),
        a AS (SELECT arm, count(*) AS n,
                     CAST(sum(converted) AS BIGINT) AS conv
              FROM u GROUP BY arm),
        w AS (SELECT max(CASE WHEN arm = 0 THEN n END) AS n_a,
                     max(CASE WHEN arm = 0 THEN conv END) AS conv_a,
                     max(CASE WHEN arm = 1 THEN n END) AS n_b,
                     max(CASE WHEN arm = 1 THEN conv END) AS conv_b
              FROM a),
        s AS (SELECT n_a, conv_a, n_b, conv_b,
                     conv_a * 1.0 / n_a AS p_a,
                     conv_b * 1.0 / n_b AS p_b,
                     (conv_a + conv_b) * 1.0 / (n_a + n_b) AS p
              FROM w)
        SELECT CAST(n_a AS BIGINT) AS n_a,
               conv_a,
               CAST(n_b AS BIGINT) AS n_b,
               conv_b,
               round(p_a, 6) AS rate_a,
               round(p_b, 6) AS rate_b,
               round((p_b - p_a) / nullif(p_a, 0), 6) AS rel_lift,
               round((p_b - p_a)
                     / nullif(sqrt(p * (1 - p)
                                   * (1.0 / n_a + 1.0 / n_b)), 0), 4) AS z,
               abs((p_b - p_a)
                   / nullif(sqrt(p * (1 - p)
                                 * (1.0 / n_a + 1.0 / n_b)), 0)) > 1.96
                 AS significant
        FROM s
    """,
    tags=("A5", "diagnostic", "sampling"),
)
def q_ab_test_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: users are assigned to two arms by the
    shared deterministic hash (the same assignment every engine, every
    run — the property a real experiment framework needs for
    reproducible analysis), conversion is "ever made a purchase over
    300" (a selective metric: plain "ever purchased" saturates to
    p = 1 on this fixture, where the pooled-variance term is zero and
    the z-statistic is undefined — the nullif guards keep that
    degenerate case NULL instead of an ANSI divide error), and the
    report is the standard two-proportion pooled z-test with relative
    lift and the |z| > 1.96 significance verdict.

    Plan: one corpus-scale per-user aggregation (map-side combinable
    max), one |arms|-row aggregation, then closed-form scalar
    arithmetic — the entire statistical readout costs one shuffle
    keyed by user. The hash assignment doubles as the same machinery
    as q_train_val_test_split's bands.
    """
    ev = scan(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") > 300), 1
            ).otherwise(0)
        ).alias("converted")
    ).select(
        ((F.col("user_id") % HASH_MOD * HASH_MULT) % HASH_MOD % 2).alias("arm"),
        "converted",
    )
    a = u.groupBy("arm").agg(
        F.count("*").alias("n"), F.sum("converted").alias("conv")
    )
    w = a.agg(
        F.max(F.when(F.col("arm") == 0, F.col("n"))).alias("n_a"),
        F.max(F.when(F.col("arm") == 0, F.col("conv"))).alias("conv_a"),
        F.max(F.when(F.col("arm") == 1, F.col("n"))).alias("n_b"),
        F.max(F.when(F.col("arm") == 1, F.col("conv"))).alias("conv_b"),
    )
    p_a = F.col("conv_a") * F.lit(1.0) / F.col("n_a")
    p_b = F.col("conv_b") * F.lit(1.0) / F.col("n_b")
    p = (F.col("conv_a") + F.col("conv_b")) * F.lit(1.0) / (
        F.col("n_a") + F.col("n_b")
    )
    se = F.nullif(
        F.sqrt(
            p
            * (1 - p)
            * (F.lit(1.0) / F.col("n_a") + F.lit(1.0) / F.col("n_b"))
        ),
        F.lit(0.0),
    )
    z = (p_b - p_a) / se
    return w.select(
        "n_a",
        "conv_a",
        "n_b",
        "conv_b",
        F.round(p_a, 6).alias("rate_a"),
        F.round(p_b, 6).alias("rate_b"),
        F.round((p_b - p_a) / F.nullif(p_a, F.lit(0.0)), 6).alias("rel_lift"),
        F.round(z, 4).alias("z"),
        (F.abs(z) > 1.96).alias("significant"),
    )


@query(
    "q_source_vocab_jaccard",
    oracle="""
        WITH sv AS (SELECT DISTINCT source, tok
                    FROM (SELECT source, unnest(string_split(text, ' ')) AS tok
                          FROM documents)),
        vs AS (SELECT source, count(*) AS v FROM sv GROUP BY source),
        common AS (SELECT a.source AS s_a, b.source AS s_b,
                          count(*) AS n_common
                   FROM sv a JOIN sv b
                     ON a.tok = b.tok AND a.source < b.source
                   GROUP BY 1, 2)
        SELECT s_a, s_b,
               CAST(n_common AS BIGINT) AS n_common,
               round(n_common * 1.0 / (va.v + vb.v - n_common), 6) AS jaccard
        FROM common
        JOIN vs va ON va.source = s_a
        JOIN vs vb ON vb.source = s_b
        ORDER BY jaccard DESC, s_a, s_b
        LIMIT 20
    """,
    tags=("L7", "drift", "diagnostic"),
)
def q_source_vocab_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise vocabulary overlap between sources: Jaccard similarity
    of the distinct-token sets for every source pair, top-20 most
    similar — the "are these two crawls actually the same feed?"
    signal that catches re-labeled duplicates of a source before
    mixing weights are assigned (complements q_cross_source_overlap's
    document-level prefix collisions with a distribution-level view).

    Plan: the pair build joins the (source, token) DISTINCT table to
    itself ON TOKEN — shuffle keyed by token, work proportional to
    sum over tokens of (sources containing it)^2, bounded by
    |sources|^2 x vocab, never corpus size. Per-source vocab sizes
    are a broadcast-scale table; a TakeOrdered caps the output.
    """
    docs = scan(spark, sf_dir, "documents")
    sv = (
        docs.select("source", F.explode(F.split("text", " ")).alias("tok"))
        .distinct()
    )
    vs = sv.groupBy("source").agg(F.count("*").alias("v"))
    a, b = sv.alias("a"), sv.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("s_a"), F.col("b.source").alias("s_b")
        )
        .agg(F.count("*").alias("n_common"))
    )
    va = F.broadcast(vs.select(F.col("source").alias("s_a"), F.col("v").alias("v_a")))
    vb = F.broadcast(vs.select(F.col("source").alias("s_b"), F.col("v").alias("v_b")))
    return (
        common.join(va, "s_a")
        .join(vb, "s_b")
        .select(
            "s_a",
            "s_b",
            "n_common",
            F.round(
                F.col("n_common")
                * F.lit(1.0)
                / (F.col("v_a") + F.col("v_b") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
        .orderBy(F.desc("jaccard"), "s_a", "s_b")
        .limit(20)
    )


@query(
    "q_corpus_datasheet",
    oracle="""
        WITH t AS (SELECT doc_id, lang, source, n_chars,
                          string_split(text, ' ') AS toks
                   FROM documents),
        tok AS (SELECT unnest(toks) AS tok FROM t),
        base AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                        CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
                        CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
                        sum(len(toks)) * 1.0 / count(*)
                          AS mean_doc_tokens,
                        round(quantile_cont(n_chars, 0.5), 4) AS median_chars,
                        floor((sum(CASE WHEN 1.0 - len(list_distinct(toks))
                                             * 1.0 / len(toks) <= 0.4
                                        THEN 1 ELSE 0 END) * 1.0 / count(*))
                              * 10000.0 + 0.5) / 10000.0
                          AS repetition_pass_rate
                 FROM t),
        tk AS (SELECT CAST(count(*) AS BIGINT) AS n_tokens,
                      CAST(count(DISTINCT tok) AS BIGINT) AS vocab
               FROM tok),
        dup AS (SELECT round(1.0 - count(DISTINCT text) * 1.0
                              / nullif(count(*), 0), 6)
                  AS exact_dup_rate
                FROM documents)
        SELECT base.*, tk.*, dup.*
        FROM base CROSS JOIN tk CROSS JOIN dup
    """,
    tags=("L7", "diagnostic", "dq"),
)
def q_corpus_datasheet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row corpus datasheet — the "datasheet for datasets" summary
    a release ships with: document/token/vocabulary counts, language
    and source cardinalities, central tendency of document size
    (mean tokens, exact median chars), the repetition-gate pass rate,
    and the exact-duplicate rate. Every number is independently
    verifiable from the governance queries it summarizes.

    Plan: one scan feeds three aggregate branches (per-doc shape stats
    with within-row array expressions, the exploded token counts, the
    duplicate rate) joined as broadcast 1-row frames — three bounded
    aggregations, no windows.
    """
    docs = scan(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    rep_pass = TXT.dup_token_frac() <= 0.4  # shared Gopher gate
    base = docs.agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("source").alias("n_sources"),
        # exact integer token sum -> ONE identical double division
        (F.sum(F.size(toks)) * F.lit(1.0) / F.count("*")).alias(
            "mean_doc_tokens"
        ),
        F.round(F.percentile("n_chars", F.lit(0.5)), 4).alias("median_chars"),
        pin(
            F.sum(F.when(rep_pass, 1).otherwise(0)) * F.lit(1.0)
            / F.count("*"),
            4,
        ).alias("repetition_pass_rate"),
    )
    tk = docs.select(F.explode(toks).alias("tok")).agg(
        F.count("*").alias("n_tokens"),
        F.countDistinct("tok").alias("vocab"),
    )
    dup = docs.agg(
        F.round(
            F.lit(1.0)
            - F.countDistinct("text")
            * F.lit(1.0)
            / F.nullif(F.count("*"), F.lit(0)),  # empty corpus -> NULL rate
            6,
        ).alias("exact_dup_rate")
    )
    return base.crossJoin(F.broadcast(tk)).crossJoin(F.broadcast(dup))


@query(
    "q_l_diversity",
    oracle="""
        WITH cls AS (SELECT lang,
                            CAST(floor(n_chars / 100) AS INT) AS len_band,
                            source, count(*) AS n
                     FROM documents GROUP BY 1, 2, 3),
        agg AS (SELECT lang, len_band,
                       CAST(sum(n) AS BIGINT) AS class_size,
                       CAST(count(*) AS BIGINT) AS l_distinct,
                       CAST(max(n) AS BIGINT) AS modal_n
                FROM cls GROUP BY 1, 2)
        SELECT lang, len_band, class_size, l_distinct,
               round(modal_n * 1.0 / class_size, 4) AS modal_share,
               l_distinct >= 3 AS l3_ok
        FROM agg
        ORDER BY lang, len_band
    """,
    tags=("L7", "compliance", "diagnostic"),
)
def q_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit — the disclosure check k-anonymity misses: a
    quasi-identifier class can be large (k-anonymous) yet still leak
    the sensitive attribute when every member SHARES it. Per
    (lang, length-band) class, with `source` as the sensitive
    attribute: class size, the number of distinct sensitive values
    (distinct l-diversity), the modal sensitive value's share (the
    homogeneity-attack success rate), and the l>=3 verdict.

    Plan: ONE hash agg to (class, sensitive) counts — the only
    corpus-scale shuffle, map-side combinable — then a second agg
    over the |classes x sources| count table computes distinct-l,
    size and modal share together (count/sum/max of the same rows, no
    second pass over documents, no count-distinct shuffle of raw
    rows). Report-sized output, same contract as q_k_anonymity which
    this composes with on the release-decision ladder.
    """
    docs = scan(spark, sf_dir, "documents")
    cls = docs.groupBy(
        "lang",
        F.floor(F.col("n_chars") / 100).cast("int").alias("len_band"),
        "source",
    ).agg(F.count("*").alias("n"))
    return (
        cls.groupBy("lang", "len_band")
        .agg(
            F.sum("n").cast("long").alias("class_size"),
            F.count("*").cast("long").alias("l_distinct"),
            F.max("n").cast("long").alias("modal_n"),
        )
        .select(
            "lang",
            "len_band",
            "class_size",
            "l_distinct",
            F.round(F.col("modal_n") / F.col("class_size"), 4).alias(
                "modal_share"
            ),
            (F.col("l_distinct") >= 3).alias("l3_ok"),
        )
        .orderBy("lang", "len_band")
    )


@query(
    "q_chi2_independence",
    oracle="""
        WITH o AS (SELECT lang, source, count(*) AS obs
                   FROM documents GROUP BY 1, 2),
        rl AS (SELECT lang, sum(obs) AS rn FROM o GROUP BY 1),
        cs AS (SELECT source, sum(obs) AS cn FROM o GROUP BY 1),
        n AS (SELECT sum(obs) AS t FROM o),
        cells AS (
          SELECT rl.lang, cs.source,
                 coalesce(o.obs, 0) AS obs,
                 rl.rn * cs.cn * 1.0 / n.t AS exp
          FROM rl CROSS JOIN cs CROSS JOIN n
          LEFT JOIN o ON o.lang = rl.lang AND o.source = cs.source)
        SELECT CAST(sum(CAST(floor(((obs - exp) * (obs - exp) / exp)
                                   * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
                 / 1000000.0 AS chi2,
               CAST((count(DISTINCT lang) - 1)
                    * (count(DISTINCT source) - 1) AS BIGINT) AS dof,
               CAST(count(*) AS BIGINT) AS n_cells,
               CAST(sum(CASE WHEN exp < 5 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_sparse_cells
        FROM cells
    """,
    tags=("A5", "compliance", "diagnostic"),
)
def q_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence between lang and source — the
    frequentist complement of q_mutual_info_lang_source: is the
    language mix the SAME across providers, or does some feed skew
    toward a language (a stratification signal for mixture
    rebalancing)? Emits the chi-square statistic, degrees of freedom,
    and the count of sparse cells (expected < 5) where the asymptotic
    test is unreliable — the caveat a real report must carry.

    Scale shape: ONE corpus-scale hash agg to the contingency table
    (map-side combinable), then pure |langs| x |sources| table algebra
    — marginals, a broadcast total, and a full-grid LEFT join so
    structurally-absent cells contribute their expected count (the
    mistake of summing only OBSERVED cells understates chi2). The
    statistic is rounded at 4 dp, far above the ~1e-10 accumulation
    noise of a few-hundred-term sum.
    """
    o = (
        scan(spark, sf_dir, "documents")
        .groupBy("lang", "source")
        .agg(F.count("*").alias("obs"))
    )
    rl = o.groupBy("lang").agg(F.sum("obs").alias("rn"))
    cs = o.groupBy("source").agg(F.sum("obs").alias("cn"))
    n = o.agg(F.sum("obs").alias("t"))
    cells = (
        rl.crossJoin(F.broadcast(cs))
        .crossJoin(F.broadcast(n))
        .join(F.broadcast(o), ["lang", "source"], "left")
        .select(
            "lang",
            "source",
            F.coalesce("obs", F.lit(0)).alias("obs"),
            (F.col("rn") * F.col("cn") / F.col("t")).alias("exp"),
        )
    )
    d = (F.col("obs") - F.col("exp"))
    return cells.agg(
        # per-cell terms are identical doubles (integer margins, one
        # division); the cell sum is order-dependent -> 1e-6 grid pin
        # + exact int64 accumulation, ONE division at display
        (
            F.sum(
                F.floor(
                    (d * d / F.col("exp")) * F.lit(1000000.0) + F.lit(0.5)
                ).cast("long")
            ).cast("double")
            / F.lit(1000000.0)
        ).alias("chi2"),
        (
            (F.countDistinct("lang") - 1) * (F.countDistinct("source") - 1)
        ).cast("long").alias("dof"),
        F.count("*").cast("long").alias("n_cells"),
        F.sum(F.when(F.col("exp") < 5, 1).otherwise(0))
        .cast("long")
        .alias("n_sparse_cells"),
    )


@query(
    "q_benford_check",
    oracle="""
        WITH v AS (SELECT CAST(substr(CAST(CAST(floor(value) AS BIGINT)
                                           AS VARCHAR), 1, 1) AS INT) AS d
                   FROM events WHERE value >= 1),
        o AS (SELECT d, count(*) AS n FROM v GROUP BY d),
        t AS (SELECT sum(n) AS tot FROM o),
        g AS (SELECT unnest(range(1, 10)) AS d)
        SELECT g.d,
               CAST(coalesce(o.n, 0) AS BIGINT) AS n,
               round(coalesce(o.n, 0) * 1.0 / t.tot, 4) AS p_obs,
               round(log10(1.0 + 1.0 / g.d), 4) AS p_benford,
               round(coalesce(o.n, 0) * 1.0 / t.tot
                     - log10(1.0 + 1.0 / g.d), 4) AS dev
        FROM g LEFT JOIN o ON o.d = g.d CROSS JOIN t
        ORDER BY g.d
    """,
    tags=("A1", "F3", "quality", "diagnostic"),
)
def q_benford_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit of the value column — the classic
    fabricated-or-truncated-data screen (organic multiplicative
    quantities follow P(d)=log10(1+1/d); capped, defaulted, or
    synthesized values don't). Per leading digit: observed count and
    frequency, the Benford expectation, and the deviation — the row
    a data-quality monitor alerts on. (These fixtures are uniform-ish
    by construction, so the deviations are LARGE — the check is
    reported, not asserted.)

    Scale shape: the leading digit is a row-wise string expression
    (no log-floor float dance — log10-based digit extraction
    misassigns values sitting on power-of-ten boundaries by one ulp);
    one 9-group hash agg, then 9-row grid algebra with a broadcast
    total, LEFT-joined so absent digits report 0 rather than
    vanishing.
    """
    v = (
        scan(spark, sf_dir, "events")
        .filter(F.col("value") >= 1)
        .select(
            F.substring(
                F.floor("value").cast("long").cast("string"), 1, 1
            )
            .cast("int")
            .alias("d")
        )
    )
    o = v.groupBy("d").agg(F.count("*").alias("n"))
    t = o.agg(F.sum("n").alias("tot"))
    g = spark.range(1, 10).select(F.col("id").cast("int").alias("d"))
    p_obs = F.coalesce("n", F.lit(0)) / F.col("tot")
    p_ben = F.log10(1.0 + 1.0 / F.col("d"))
    return (
        g.join(F.broadcast(o), "d", "left")
        .crossJoin(F.broadcast(t))
        .select(
            "d",
            F.coalesce("n", F.lit(0)).cast("long").alias("n"),
            F.round(p_obs, 4).alias("p_obs"),
            F.round(p_ben, 4).alias("p_benford"),
            F.round(p_obs - p_ben, 4).alias("dev"),
        )
        .orderBy("d")
    )


@query(
    "q_t_closeness",
    oracle="""
        WITH cell AS (
          SELECT lang, CAST(floor(n_chars / 100) AS INT) AS len_band,
                 source, count(*) AS c
          FROM documents GROUP BY 1, 2, 3),
        grp AS (
          SELECT lang, len_band, sum(c) AS ng
          FROM cell GROUP BY 1, 2),
        gsrc AS (
          SELECT source, sum(c) AS cs FROM cell GROUP BY 1),
        n AS (SELECT sum(c) AS n FROM cell),
        grid AS (
          SELECT g.lang, g.len_band, g.ng, s.source, s.cs,
                 coalesce(cl.c, 0) AS c
          FROM grp g
          CROSS JOIN gsrc s
          LEFT JOIN cell cl ON cl.lang = g.lang
                           AND cl.len_band = g.len_band
                           AND cl.source = s.source)
        SELECT lang, len_band,
               CAST(max(ng) AS BIGINT) AS group_size,
               round(0.5 * sum(abs(c * 1.0 / ng - cs * 1.0 / (SELECT n FROM n))),
                     6) AS tvd,
               round(0.5 * sum(abs(c * 1.0 / ng - cs * 1.0 / (SELECT n FROM n))),
                     6) <= 0.25 AS t_close
        FROM grid
        GROUP BY lang, len_band
        ORDER BY lang, len_band
    """,
    tags=("L7", "compliance", "diagnostic"),
)
def q_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit completing the anonymization triad
    (q_k_anonymity: class sizes; q_l_diversity: sensitive-value
    variety; here: sensitive-value DISTRIBUTION): for each
    quasi-identifier class (lang, length band), the total-variation
    distance between the class's `source` distribution and the
    corpus-wide one, and whether it meets t = 0.25. A class can be
    large (k-anonymous) and diverse (l-diverse) yet still leak —
    e.g. 95% one source where the corpus has 5% — which only the
    distributional test catches.

    Plan: ONE corpus-scale hash agg to (lang, band, source) counts;
    everything after runs on aggregate-sized frames — the class x
    source grid is |classes| x |sources| rows built by a bounded
    cross join (absent cells must contribute |0 - p(s)|, so the grid
    is semantically required, not a cartesian accident). All
    probabilities are ratios of exact integer counts; the TVD sum has
    <= |sources| terms, so round(6) is far above accumulation noise.
    """
    docs = scan(spark, sf_dir, "documents")
    cell = docs.groupBy(
        "lang",
        F.floor(F.col("n_chars") / 100).cast("int").alias("len_band"),
        "source",
    ).agg(F.count("*").alias("c"))
    grp = cell.groupBy("lang", "len_band").agg(F.sum("c").alias("ng"))
    glob = cell.groupBy(F.col("source").alias("g_source")).agg(
        F.sum("c").alias("cs")
    )
    n_total = cell.agg(F.sum("c").alias("n"))
    grid = (
        grp.crossJoin(F.broadcast(glob))
        .crossJoin(F.broadcast(n_total))
        .join(
            cell.withColumnRenamed("lang", "c_lang")
            .withColumnRenamed("len_band", "c_band")
            .withColumnRenamed("source", "c_source"),
            (F.col("lang") == F.col("c_lang"))
            & (F.col("len_band") == F.col("c_band"))
            & (F.col("g_source") == F.col("c_source")),
            "left",
        )
        .select(
            "lang",
            "len_band",
            "ng",
            "cs",
            "n",
            F.coalesce(F.col("c"), F.lit(0)).alias("c"),
        )
    )
    tvd = F.round(
        0.5 * F.sum(F.abs(F.col("c") / F.col("ng") - F.col("cs") / F.col("n"))),
        6,
    )
    return (
        grid.groupBy("lang", "len_band")
        .agg(
            F.max("ng").cast("long").alias("group_size"),
            tvd.alias("tvd"),
            (tvd <= 0.25).alias("t_close"),
        )
        .orderBy("lang", "len_band")
    )


# --- Multiple-testing control (Benjamini-Hochberg) ------------------------
BH_ALPHA = 0.05


@query(
    "q_bh_fdr",
    oracle=f"""
        WITH e AS (
          SELECT event_type,
                 epoch_ns(ts) // 86400000000000 AS day
          FROM events),
        bounds AS (
          SELECT (min(day) + max(day)) // 2 AS mid FROM e),
        daily AS (
          SELECT event_type, day, count(*) AS c
          FROM e GROUP BY event_type, day),
        halves AS (
          SELECT d.event_type,
                 CASE WHEN d.day <= b.mid THEN 1 ELSE 2 END AS h,
                 d.c
          FROM daily d CROSS JOIN bounds b),
        sm AS (
          SELECT event_type,
                 count(CASE WHEN h = 1 THEN 1 END) AS n1,
                 count(CASE WHEN h = 2 THEN 1 END) AS n2,
                 sum(CASE WHEN h = 1 THEN c END) AS a1,
                 sum(CASE WHEN h = 2 THEN c END) AS a2,
                 sum(CASE WHEN h = 1 THEN c * c END) AS q1,
                 sum(CASE WHEN h = 2 THEN c * c END) AS q2
          FROM halves GROUP BY event_type),
        st AS (
          SELECT event_type, n1, n2,
                 a1 * 1.0 / n1 AS m1, a2 * 1.0 / n2 AS m2,
                 CAST(n1 * q1 - a1 * a1 AS DOUBLE)
                   / (n1 * (n1 - 1.0)) AS v1,
                 CAST(n2 * q2 - a2 * a2 AS DOUBLE)
                   / (n2 * (n2 - 1.0)) AS v2
          FROM sm),
        zt AS (
          SELECT event_type, n1, n2,
                 floor((abs(m2 - m1) / sqrt(v1 / n1 + v2 / n2))
                       * 1000000.0 + 0.5) / 1000000.0 AS za
          FROM st),
        pt AS (
          SELECT event_type, n1, n2, za,
                 floor((2 * (exp(-za * za / 2) / 2.506628274631)
                       * ((1.0 / (1 + 0.2316419 * za))
                          * (0.319381530
                             + (1.0 / (1 + 0.2316419 * za))
                               * (-0.356563782
                                  + (1.0 / (1 + 0.2316419 * za))
                                    * (1.781477937
                                       + (1.0 / (1 + 0.2316419 * za))
                                         * (-1.821255978
                                            + (1.0 / (1 + 0.2316419 * za))
                                              * 1.330274429))))))
                       * 1000000.0 + 0.5) / 1000000.0 AS p_value
          FROM zt),
        ranked AS (
          SELECT *,
                 CAST(row_number() OVER (ORDER BY p_value, event_type)
                      AS BIGINT) AS rank,
                 count(*) OVER () AS m
          FROM pt),
        kstar AS (
          SELECT max(CASE WHEN p_value <= rank * {BH_ALPHA} / m
                          THEN rank ELSE 0 END) AS k
          FROM ranked)
        SELECT event_type,
               CAST(n1 AS BIGINT) AS n_days_1,
               CAST(n2 AS BIGINT) AS n_days_2,
               za AS abs_z,
               p_value,
               rank,
               rank <= (SELECT k FROM kstar) AS reject
        FROM ranked
        ORDER BY rank
    """,
    tags=("A5", "governance", "diagnostic"),
)
def q_bh_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg FDR control over a family of per-event-type
    volume-shift tests: Welch z on daily counts (first vs second half
    of the observation window), normal tail via the Abramowitz-Stegun
    26.2.17 polynomial (written out as plain arithmetic so BOTH
    engines evaluate the identical formula — neither has a portable
    erf), then the BH step-up: reject every hypothesis ranked at or
    below k* = max{{k : p_(k) <= k/m * alpha}}. The multiple-testing
    discipline any drift-monitor dashboard (q_ks_drift, q_psi_drift,
    q_chi2_independence) needs once it watches many metrics at once —
    per-test alpha inflates the family-wise false-alarm rate.

    Scale shape: the corpus-scale work is ONE (type, day) hash agg;
    the test statistics, polynomial, ranking window, and step-up all
    run on the |types|-row frame (bounded, aggregate-sized — the safe
    unpartitioned-window case). Days are integer floor-divided ns
    epochs; z is rounded to 6 dp BEFORE the polynomial and p to 6 dp
    before ranking, so both engines rank identical values; ranks
    tie-break on event_type; the BH threshold k*alpha/m is a ratio of
    small exact integers on both sides.
    """
    ev = scan(spark, sf_dir, "events").select(
        "event_type",
        F.expr("ts_ns div 86400000000000").alias("day"),
    )
    bounds = ev.agg(
        F.expr("(min(day) + max(day)) div 2").alias("mid")
    )
    daily = ev.groupBy("event_type", "day").agg(F.count("*").alias("c"))
    halves = daily.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        F.when(F.col("day") <= F.col("mid"), 1).otherwise(2).alias("h"),
        "c",
    )
    # exact integer sufficient statistics per half (engine avg/var_samp
    # stream float partials; za is 6-dp-pinned and p_value is the BH
    # RANK key, so a 1-ulp wobble could reorder the FDR cut)
    c1 = F.when(F.col("h") == 1, F.col("c"))
    c2 = F.when(F.col("h") == 2, F.col("c"))
    # S1/S2 accumulate in the shared DECIMAL tier (daily counts scale
    # with data volume; int64 n*S2 - S1^2 overflows quadratically)
    sm = halves.groupBy("event_type").agg(
        F.count(c1).alias("n1"),
        F.count(c2).alias("n2"),
        dsum(c1).alias("a1"),
        dsum(c2).alias("a2"),
        dsum2(c1).alias("q1"),
        dsum2(c2).alias("q2"),
    )
    st = sm.select(
        "event_type",
        "n1",
        "n2",
        (F.col("a1").cast("double") / F.col("n1")).alias("m1"),
        (F.col("a2").cast("double") / F.col("n2")).alias("m2"),
        dec_var(F.col("n1"), F.col("q1"), F.col("a1")).alias("v1"),
        dec_var(F.col("n2"), F.col("q2"), F.col("a2")).alias("v2"),
    )
    za = pin(
        F.abs(F.col("m2") - F.col("m1"))
        / F.sqrt(F.col("v1") / F.col("n1") + F.col("v2") / F.col("n2")),
        6,
    )
    t = 1.0 / (1 + 0.2316419 * F.col("za"))
    poly = t * (
        0.319381530
        + t * (-0.356563782 + t * (1.781477937 + t * (-1.821255978 + t * 1.330274429)))
    )
    p = pin(
        2 * (F.exp(-F.col("za") * F.col("za") / 2) / 2.506628274631) * poly,
        6,
    )
    pt = st.withColumn("za", za).withColumn("p_value", p)
    w = Window.orderBy("p_value", "event_type")
    ranked = pt.withColumn(
        "rank", F.row_number().over(w).cast("long")
    ).crossJoin(
        F.broadcast(pt.agg(F.count("*").alias("m")))
    )
    kstar = ranked.agg(
        F.max(
            F.when(
                F.col("p_value") <= F.col("rank") * BH_ALPHA / F.col("m"),
                F.col("rank"),
            ).otherwise(F.lit(0))
        ).alias("k")
    )
    return (
        ranked.crossJoin(F.broadcast(kstar))
        .select(
            "event_type",
            F.col("n1").cast("long").alias("n_days_1"),
            F.col("n2").cast("long").alias("n_days_2"),
            F.col("za").alias("abs_z"),
            "p_value",
            "rank",
            (F.col("rank") <= F.col("k")).alias("reject"),
        )
        .orderBy("rank")
    )


@query(
    "q_mann_whitney",
    oracle="""
        WITH h AS (
          SELECT n_chars AS v,
                 sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS a,
                 sum(CASE WHEN lang = 'de' THEN 1 ELSE 0 END) AS b
          FROM documents WHERE lang IN ('en', 'de')
          GROUP BY n_chars),
        cum AS (
          SELECT v, a, b,
                 coalesce(sum(b) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS b_below
          FROM h),
        tot AS (
          SELECT sum(a) AS na, sum(b) AS nb,
                 sum(a + b) AS n,
                 sum((a + b) * (a + b) * (a + b) - (a + b)) AS ties
          FROM h),
        u AS (
          SELECT sum(a * (b_below + b / 2.0)) AS u_a FROM cum),
        zt AS (
          SELECT t.na, t.nb, u.u_a,
                 round((u.u_a - t.na * t.nb / 2.0)
                       / sqrt(t.na * t.nb / 12.0
                              * ((t.n + 1)
                                 - t.ties * 1.0 / (t.n * (t.n - 1)))),
                       6) AS z
          FROM u CROSS JOIN tot t),
        pt AS (
          SELECT na, nb, u_a, z,
                 1.0 / (1 + 0.2316419 * abs(z)) AS tt
          FROM zt)
        SELECT CAST(na AS BIGINT) AS n_a,
               CAST(nb AS BIGINT) AS n_b,
               round(u_a, 1) AS u_stat,
               z,
               round(2 * (exp(-z * z / 2) / 2.506628274631)
                     * (tt * (0.319381530
                        + tt * (-0.356563782
                           + tt * (1.781477937
                              + tt * (-1.821255978
                                 + tt * 1.330274429))))),
                     6) AS p_value
        FROM pt
    """,
    tags=("A5", "governance", "robust"),
)
def q_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank-sum test (do English and German documents
    have the same length DISTRIBUTION?) — the nonparametric two-sample
    test that needs no normality assumption, with the normal
    approximation z including the tie correction. Complements
    q_ks_drift (max-gap view) with the stochastic-dominance view.

    Scale shape: the entire test is computed from the VALUE HISTOGRAM
    — per distinct n_chars, the two group counts — so the rank-sum
    never ranks doc-grain rows: U_A = sum over values of
    a_v * (B-below + b_v/2), with B-below from an ordered window over
    the bounded distinct-value frame. Tie correction sums t³-t per
    value group. U is a sum of integers and exact halves (exact in
    doubles far past 2^53 corpus sizes... at 1e9+ rows per group
    switch U to decimal); z is rounded to 6 dp BEFORE the
    Abramowitz-Stegun tail so both engines evaluate the polynomial on
    the identical input.
    """
    docs = (
        scan(spark, sf_dir, "documents")
        .filter(F.col("lang").isin("en", "de"))
        .select("lang", "n_chars")
    )
    h = docs.groupBy(F.col("n_chars").alias("v")).agg(
        F.sum((F.col("lang") == "en").cast("long")).alias("a"),
        F.sum((F.col("lang") == "de").cast("long")).alias("b"),
    )
    w_below = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    cum = h.withColumn(
        "b_below", F.coalesce(F.sum("b").over(w_below), F.lit(0))
    )
    tot = h.agg(
        F.sum("a").alias("na"),
        F.sum("b").alias("nb"),
        F.sum(F.col("a") + F.col("b")).alias("n"),
        F.sum(
            F.pow(F.col("a") + F.col("b"), 3) - (F.col("a") + F.col("b"))
        ).alias("ties"),
    )
    u = cum.agg(
        F.sum(F.col("a") * (F.col("b_below") + F.col("b") / 2.0)).alias("u_a")
    )
    j = u.crossJoin(F.broadcast(tot))
    sigma = F.sqrt(
        F.col("na") * F.col("nb") / 12.0
        * ((F.col("n") + 1) - F.col("ties") * 1.0 / (F.col("n") * (F.col("n") - 1)))
    )
    z = F.round((F.col("u_a") - F.col("na") * F.col("nb") / 2.0) / sigma, 6)
    j = j.withColumn("z", z)
    za = F.abs(F.col("z"))
    t_ = 1.0 / (1 + 0.2316419 * za)
    poly = t_ * (
        0.319381530
        + t_ * (-0.356563782 + t_ * (1.781477937 + t_ * (-1.821255978 + t_ * 1.330274429)))
    )
    p = F.round(2 * (F.exp(-za * za / 2) / 2.506628274631) * poly, 6)
    return j.select(
        F.col("na").cast("long").alias("n_a"),
        F.col("nb").cast("long").alias("n_b"),
        F.round(F.col("u_a"), 1).alias("u_stat"),
        "z",
        p.alias("p_value"),
    )


# --- SLO burn rate ---------------------------------------------------------
SLO_TARGET = 0.75  # allowed error ratio (fixture errors ~20% of events)


@query(
    "q_slo_burn_rate",
    oracle=f"""
        WITH h AS (
          SELECT epoch_ns(ts) // 3600000000000 AS hr,
                 count(*) AS n,
                 sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                   AS errs
          FROM events GROUP BY hr),
        w AS (
          SELECT hr, n, errs,
                 sum(errs) OVER (ORDER BY hr
                   ROWS BETWEEN 5 PRECEDING AND CURRENT ROW) AS errs6,
                 sum(n) OVER (ORDER BY hr
                   ROWS BETWEEN 5 PRECEDING AND CURRENT ROW) AS n6
          FROM h),
        r AS (
          SELECT hr,
                 round(errs * 1.0 / n / (1 - {SLO_TARGET}), 4) AS burn_1h,
                 round(errs6 * 1.0 / n6 / (1 - {SLO_TARGET}), 4) AS burn_6h
          FROM w)
        SELECT CAST(hr AS BIGINT) AS hr,
               burn_1h, burn_6h,
               burn_1h > 1.0 AND burn_6h > 1.0 AS page
        FROM r
        WHERE burn_1h > 1.0 OR burn_6h > 1.0
        ORDER BY hr
    """,
    tags=("A1", "W4", "governance", "diagnostic"),
)
def q_slo_burn_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-window SLO burn-rate alerting (the SRE-workbook pattern):
    the error-budget burn rate (error ratio / allowed ratio) on a 1-h
    and a trailing 6-h window; a PAGE fires only when BOTH windows
    burn > 1x — the fast window for responsiveness, the slow one to
    suppress blips. Built on q_hourly_errors' bucket grain with SLO
    semantics on top.

    Scale shape: ONE corpus-scale (hour) hash agg; the trailing
    window runs over the calendar-bounded hourly frame (the safe
    bounded-frame ordered window; partition by day/service when the
    frame grows). Ratios are exact integer quotients scaled by a
    closed-form constant, rounded at 4 dp BEFORE the > 1.0 alert
    comparisons on both engines.
    """
    h = (
        scan(spark, sf_dir, "events")
        .groupBy(F.expr("ts_ns div 3600000000000").alias("hr"))
        .agg(
            F.count("*").alias("n"),
            F.sum((F.col("event_type") == "error").cast("long")).alias(
                "errs"
            ),
        )
    )
    w6 = Window.orderBy("hr").rowsBetween(-5, 0)
    w = h.withColumn("errs6", F.sum("errs").over(w6)).withColumn(
        "n6", F.sum("n").over(w6)
    )
    denom = 1 - SLO_TARGET
    r = w.select(
        F.col("hr").cast("long").alias("hr"),
        F.round(F.col("errs") / F.col("n") / denom, 4).alias("burn_1h"),
        F.round(F.col("errs6") / F.col("n6") / denom, 4).alias("burn_6h"),
    )
    return (
        r.withColumn(
            "page", (F.col("burn_1h") > 1.0) & (F.col("burn_6h") > 1.0)
        )
        .filter((F.col("burn_1h") > 1.0) | (F.col("burn_6h") > 1.0))
        .orderBy("hr")
    )


@query(
    "q_anova_doclen",
    oracle="""
        WITH g AS (
          SELECT source, count(*) AS n,
                 sum(n_chars) AS s1, sum(n_chars * n_chars) AS s2
          FROM documents GROUP BY source),
        tot AS (
          SELECT sum(n) AS nn, count(*) AS k,
                 CAST(sum(s1) AS DOUBLE) / sum(n) AS gm
          FROM g),
        ss AS (
          SELECT CAST(sum(CAST(floor((g.n * (((s1 * 1.0 / g.n) - t.gm)
                                             * ((s1 * 1.0 / g.n) - t.gm)))
                                     * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE)
                   / 10000.0 AS ssb,
                 CAST(sum(s2) AS DOUBLE)
                 - CAST(sum(CAST(floor((CAST(s1 AS DOUBLE) * s1 / g.n)
                                       * 10000.0 + 0.5) AS BIGINT))
                        AS DOUBLE) / 10000.0 AS ssw,
                 max(t.k) AS k, max(t.nn) AS nn
          FROM g CROSS JOIN tot t)
        SELECT CAST(k AS BIGINT) AS n_groups,
               CAST(nn AS BIGINT) AS n_docs,
               floor((ssb / (k - 1)) * 100.0 + 0.5) / 100.0 AS ms_between,
               floor((ssw / (nn - k)) * 100.0 + 0.5) / 100.0 AS ms_within,
               floor(((ssb / (k - 1)) / (ssw / (nn - k)))
                     * 10000.0 + 0.5) / 10000.0 AS f_stat,
               floor((ssb / (ssb + ssw)) * 1000000.0 + 0.5) / 1000000.0
                 AS eta_sq
        FROM ss
    """,
    tags=("A5", "governance", "diagnostic"),
)
def q_anova_doclen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA of document length across sources: the F
    statistic (between-group vs within-group mean square) and eta²
    (variance explained by source) — does SOURCE matter for length at
    all, before pairwise tests (q_mann_whitney) ask which pair
    differs. The variance decomposition SSB + SSW = SST is computed
    from per-group sufficient statistics, never from row deviations.

    Scale shape: ONE corpus-scale hash agg to per-source (n, mean,
    variance); the grand mean, SSB, SSW, F, and eta² are
    |sources|-row algebra (window aggregates on the bounded group
    frame — single scan, no recomputed totals subtree). n_chars
    is integer so group means/variances carry ~1e-12 relative noise;
    outputs round at 2/4/6 dp, far above it.
    """
    # exact integer sufficient statistics per source (engine avg /
    # var_samp stream float partials): every group mean is one
    # identical division, the |sources|-row SSB/within-term sums
    # accumulate on a 1e-4 integer grid (order-free), SSW's Sx^2 part
    # is an exact integer sum, and the F/eta algebra runs once on
    # identical doubles, floor-pinned.
    g = (
        scan(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.count("*").alias("n"),
            dsum(F.col("n_chars")).alias("s1"),
            dsum2(F.col("n_chars")).alias("s2"),
        )
    )
    w_all = Window.partitionBy()
    g = g.select(
        "n",
        "s1",
        "s2",
        F.sum("n").over(w_all).alias("nn"),
        F.count("*").over(w_all).alias("k"),
        (
            F.sum("s1").over(w_all).cast("double")
            / F.sum("n").over(w_all)
        ).alias("gm"),
    )
    mg = F.col("s1") * F.lit(1.0) / F.col("n")
    ssb_t = F.col("n") * ((mg - F.col("gm")) * (mg - F.col("gm")))
    with_t = F.col("s1").cast("double") * F.col("s1") / F.col("n")
    ss = g.agg(
        (
            F.sum(
                F.floor(ssb_t * F.lit(10000.0) + F.lit(0.5)).cast("long")
            ).cast("double")
            / F.lit(10000.0)
        ).alias("ssb"),
        (
            F.sum("s2").cast("double")
            - F.sum(
                F.floor(with_t * F.lit(10000.0) + F.lit(0.5)).cast("long")
            ).cast("double")
            / F.lit(10000.0)
        ).alias("ssw"),
        F.max("k").alias("k"),
        F.max("nn").alias("nn"),
    )
    return ss.select(
        F.col("k").cast("long").alias("n_groups"),
        F.col("nn").cast("long").alias("n_docs"),
        pin(F.col("ssb") / (F.col("k") - 1), 2).alias("ms_between"),
        pin(F.col("ssw") / (F.col("nn") - F.col("k")), 2).alias("ms_within"),
        pin(
            (F.col("ssb") / (F.col("k") - 1))
            / (F.col("ssw") / (F.col("nn") - F.col("k"))),
            4,
        ).alias("f_stat"),
        pin(F.col("ssb") / (F.col("ssb") + F.col("ssw")), 6).alias("eta_sq"),
    )


@query(
    "q_referential_integrity",
    oracle="""
        SELECT 'lineitem.l_orderkey -> orders' AS fk,
               CAST((SELECT count(*) FROM lineitem l
                     WHERE NOT EXISTS (SELECT 1 FROM orders o
                                       WHERE o.o_orderkey = l.l_orderkey))
                    AS BIGINT) AS n_orphans,
               CAST((SELECT count(*) FROM lineitem) AS BIGINT) AS n_rows
        UNION ALL
        SELECT 'orders.o_custkey -> customer',
               CAST((SELECT count(*) FROM orders o
                     WHERE NOT EXISTS (SELECT 1 FROM customer c
                                       WHERE c.c_custkey = o.o_custkey))
                    AS BIGINT),
               CAST((SELECT count(*) FROM orders) AS BIGINT)
        UNION ALL
        SELECT 'lineitem.l_suppkey -> supplier',
               CAST((SELECT count(*) FROM lineitem l
                     WHERE NOT EXISTS (SELECT 1 FROM supplier s
                                       WHERE s.s_suppkey = l.l_suppkey))
                    AS BIGINT),
               CAST((SELECT count(*) FROM lineitem) AS BIGINT)
        UNION ALL
        SELECT 'customer.c_nationkey -> nation',
               CAST((SELECT count(*) FROM customer c
                     WHERE NOT EXISTS (SELECT 1 FROM nation n
                                       WHERE n.n_nationkey = c.c_nationkey))
                    AS BIGINT),
               CAST((SELECT count(*) FROM customer) AS BIGINT)
        ORDER BY fk
    """,
    tags=("J4", "A2", "governance", "diagnostic"),
)
def q_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit: orphan counts for the four FK
    edges of the star schema (fact->orders->customer->nation,
    fact->supplier) — the load-validation step that runs after every
    ingest, completing q_data_quality_report's single-table checks
    with CROSS-table ones.

    Scale shape: each edge is a LEFT-ANTI join counting unmatched
    fact rows — dimension sides broadcast (orders-side shuffles on
    the order key); four bounded 1-row aggregates union into the
    report. The oracle states the same audits as NOT EXISTS (the
    semantic spec); anti-join is the scale plan.
    """
    li = scan(spark, sf_dir, "lineitem")
    orders = scan(spark, sf_dir, "orders")
    cust = scan(spark, sf_dir, "customer")
    sup = scan(spark, sf_dir, "supplier")
    nation = scan(spark, sf_dir, "nation")

    def audit(fact, fk_col, dim, dim_key, label, dim_small=True):
        dimk = dim.select(dim_key).distinct()
        if dim_small:
            dimk = F.broadcast(dimk)
        orphans = fact.join(
            dimk, F.col(fk_col) == F.col(dim_key), "left_anti"
        ).agg(F.count("*").cast("long").alias("n_orphans"))
        total = fact.agg(F.count("*").cast("long").alias("n_rows"))
        return orphans.crossJoin(F.broadcast(total)).select(
            F.lit(label).alias("fk"), "n_orphans", "n_rows"
        )

    return (
        audit(li, "l_orderkey", orders, "o_orderkey",
              "lineitem.l_orderkey -> orders", dim_small=False)
        .unionByName(
            audit(orders, "o_custkey", cust, "c_custkey",
                  "orders.o_custkey -> customer")
        )
        .unionByName(
            audit(li, "l_suppkey", sup, "s_suppkey",
                  "lineitem.l_suppkey -> supplier")
        )
        .unionByName(
            audit(cust, "c_nationkey", nation, "n_nationkey",
                  "customer.c_nationkey -> nation")
        )
        .orderBy("fk")
    )


@query(
    "q_empirical_bayes_rate",
    oracle="""
        WITH u AS (
          SELECT user_id, count(*) AS n,
                 sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                   AS x
          FROM events GROUP BY user_id),
        r AS (SELECT user_id, n, x, x * 1.0 / n AS raw,
                     CAST(floor((x * 1.0 / n) * 1000000.0 + 0.5) AS BIGINT)
                       AS r6
              FROM u),
        ms AS (SELECT count(*) AS c, sum(r6) AS s1,
                      sum(r6 * r6) AS s2i
               FROM r),
        mom AS (
          SELECT CAST(s1 AS DOUBLE) / (c * 1000000.0) AS mu,
                 CAST(c * s2i - s1 * s1 AS DOUBLE)
                   / (c * (c - 1.0)) / 1000000000000.0 AS s2
          FROM ms),
        ab AS (
          SELECT mu, s2,
                 mu * (mu * (1 - mu) / s2 - 1) AS alpha,
                 (1 - mu) * (mu * (1 - mu) / s2 - 1) AS beta
          FROM mom)
        SELECT r.user_id,
               CAST(r.n AS BIGINT) AS n_events,
               CAST(r.x AS BIGINT) AS n_errors,
               floor(r.raw * 1000000.0 + 0.5) / 1000000.0 AS raw_rate,
               floor(((r.x + ab.alpha) / (r.n + ab.alpha + ab.beta))
                     * 1000000.0 + 0.5) / 1000000.0 AS shrunk_rate
        FROM r CROSS JOIN ab
        ORDER BY shrunk_rate DESC, r.user_id
        LIMIT 20
    """,
    tags=("A5", "governance", "robust"),
)
def q_empirical_bayes_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical-Bayes shrunken error rates: per-user rates shrunk
    toward the population via a method-of-moments Beta prior
    (alpha, beta from the mean/variance of raw rates) — the ranking
    fix for small-sample entities, where a 2-of-3 user must not
    outrank a 40-of-100 one. The same machinery ranks sources by
    defect rate or templates by dup rate without sample-size artifacts.

    Scale shape: ONE per-user hash agg; the prior is two broadcast
    scalars from the |users|-bounded rate frame; shrinkage is a
    within-row expression and the top-20 a TakeOrdered with a user
    tie-break. Raw rates are exact integer ratios; the prior moments
    carry ~1e-15 accumulation noise against outputs rounded at 6 dp.
    """
    u = (
        scan(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum((F.col("event_type") == "error").cast("long")).alias("x"),
        )
    )
    # prior moments from exact grid-integer sufficient statistics
    # (engine avg/var_samp stream float partials; shrunk_rate is the
    # ORDER key): per-user rates pin onto a 1e-6 integer grid and the
    # moments accumulate in the shared DECIMAL tier (the int64 shape
    # bound at ~1e6 users; DECIMAL holds to ~1e38 — r9 conversion),
    # and mu/s2 are identically parenthesized double algebra.
    r = u.withColumn("raw", F.col("x") * 1.0 / F.col("n")).withColumn(
        "r6",
        F.floor(F.col("raw") * F.lit(1000000.0) + F.lit(0.5)).cast("long"),
    )
    ms = r.agg(
        F.count("*").alias("c"),
        dsum(F.col("r6")).alias("s1"),
        dsum2(F.col("r6")).alias("s2i"),
    )
    cc = F.col("c")
    mom = ms.select(
        (F.col("s1").cast("double") / (cc * F.lit(1000000.0))).alias("mu"),
        (
            dec_var(cc, F.col("s2i"), F.col("s1"))
            / F.lit(1000000000000.0)
        ).alias("s2"),
    )
    ab = mom.select(
        (F.col("mu") * (F.col("mu") * (1 - F.col("mu")) / F.col("s2") - 1)
         ).alias("alpha"),
        ((1 - F.col("mu"))
         * (F.col("mu") * (1 - F.col("mu")) / F.col("s2") - 1)
         ).alias("beta"),
    )
    return (
        r.crossJoin(F.broadcast(ab))
        .select(
            "user_id",
            F.col("n").cast("long").alias("n_events"),
            F.col("x").cast("long").alias("n_errors"),
            pin(F.col("raw"), 6).alias("raw_rate"),
            pin(
                (F.col("x") + F.col("alpha"))
                / (F.col("n") + F.col("alpha") + F.col("beta")),
                6,
            ).alias("shrunk_rate"),
        )
        .orderBy(F.desc("shrunk_rate"), "user_id")
        .limit(20)
    )


@query(
    "q_simpson_check",
    oracle="""
        WITH c AS (
          SELECT l_returnflag,
                 CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT) AS d,
                 CAST(l_quantity AS BIGINT) AS q
          FROM lineitem),
        pooled AS (
          SELECT 'ALL' AS stratum,
                 floor(((count(*) * sum(d * q) - sum(d) * sum(q))
                        / sqrt(CAST(count(*) * sum(d * d)
                                    - sum(d) * sum(d) AS DOUBLE)
                               * CAST(count(*) * sum(q * q)
                                      - sum(q) * sum(q) AS DOUBLE)))
                       * 1000000.0 + 0.5) / 1000000.0 AS corr_dq,
                 CAST(count(*) AS BIGINT) AS n
          FROM c),
        strata AS (
          SELECT l_returnflag AS stratum,
                 floor(((count(*) * sum(d * q) - sum(d) * sum(q))
                        / sqrt(CAST(count(*) * sum(d * d)
                                    - sum(d) * sum(d) AS DOUBLE)
                               * CAST(count(*) * sum(q * q)
                                      - sum(q) * sum(q) AS DOUBLE)))
                       * 1000000.0 + 0.5) / 1000000.0 AS corr_dq,
                 CAST(count(*) AS BIGINT) AS n
          FROM c GROUP BY l_returnflag)
        SELECT s.stratum, s.corr_dq, s.n,
               p.corr_dq AS pooled_corr,
               CASE WHEN s.corr_dq = 0 OR p.corr_dq = 0 THEN false
                    ELSE sign(s.corr_dq) <> sign(p.corr_dq) END
                 AS sign_flips
        FROM strata s CROSS JOIN pooled p
        UNION ALL
        SELECT stratum, corr_dq, n, corr_dq, false FROM pooled
        ORDER BY stratum
    """,
    tags=("A5", "governance", "diagnostic"),
)
def q_simpson_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson's-paradox screen: the pooled discount-quantity
    correlation vs the same correlation WITHIN each return-flag
    stratum, flagging sign flips — the aggregation trap where a
    relationship reverses once a confounder is stratified out. Any
    metrics dashboard aggregating over a mix (segments, cohorts,
    sources) needs this screen before reporting a pooled trend.

    Scale shape: corr() is a one-pass streaming aggregate (sufficient
    statistics, map-side combinable) — pooled + per-stratum in two
    hash aggs over one scan lineage each; the flip check is
    |strata|-row algebra against a broadcast scalar. Correlations are
    rounded at 6 dp BEFORE sign comparison on both engines.
    """
    # exact correlation from integer-cent sufficient statistics
    # (engine corr() streams float co-moments in accumulation order,
    # and the correlations feed the SIGN comparison): the cent/unit
    # scale factors cancel in r, the sums are order-free int64, and
    # each r is ONE identical double chain, floor-pinned at 6 dp.
    li = scan(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.floor(F.col("l_discount") * F.lit(100.0) + F.lit(0.5))
        .cast("long")
        .alias("d"),
        F.col("l_quantity").cast("long").alias("q"),
    )
    d, q = F.col("d"), F.col("q")
    # shared DECIMAL second-moment tier: the int64 n*S2 - S1^2 shape
    # overflows quadratically in stratum size (r9 ADVICE fix)
    rr = pin(
        exact_comoment(d, q).cast("double")
        / F.sqrt(
            exact_comoment(d).cast("double")
            * exact_comoment(q).cast("double")
        ),
        6,
    )
    pooled = li.agg(
        rr.alias("pooled_corr"),
        F.count("*").cast("long").alias("pn"),
    )
    strata = li.groupBy(F.col("l_returnflag").alias("stratum")).agg(
        rr.alias("corr_dq"),
        F.count("*").cast("long").alias("n"),
    )
    flips = F.when(
        (F.col("corr_dq") == 0) | (F.col("pooled_corr") == 0), F.lit(False)
    ).otherwise(F.signum("corr_dq") != F.signum("pooled_corr"))
    s_rows = strata.crossJoin(F.broadcast(pooled)).select(
        "stratum", "corr_dq", "n", "pooled_corr", flips.alias("sign_flips")
    )
    p_row = pooled.select(
        F.lit("ALL").alias("stratum"),
        F.col("pooled_corr").alias("corr_dq"),
        F.col("pn").alias("n"),
        F.col("pooled_corr"),
        F.lit(False).alias("sign_flips"),
    )
    return s_rows.unionByName(p_row).orderBy("stratum")


@query(
    "q_ab_power_calc",
    oracle="""
        WITH ms AS (
          SELECT count(*) AS n,
                 sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS sc,
                 sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)
                     * CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS sc2
          FROM events WHERE event_type = 'purchase'),
        m AS (
          SELECT n,
                 CAST(sc AS DOUBLE) / (n * 100.0) AS mu,
                 CAST(n * sc2 - sc * sc AS DOUBLE)
                   / (n * (n - 1.0)) / 10000.0 AS s2
          FROM ms),
        mde AS (SELECT unnest([0.05, 0.10, 0.20]) AS rel_mde)
        SELECT round(mde.rel_mde, 2) AS rel_mde,
               floor((mde.rel_mde * m.mu) * 10000.0 + 0.5) / 10000.0
                 AS abs_mde,
               CAST(ceil(2 * m.s2 * (1.959964 + 0.841621)
                         * (1.959964 + 0.841621)
                         / (mde.rel_mde * m.mu * mde.rel_mde * m.mu))
                    AS BIGINT) AS n_per_arm,
               floor((2.0 * ceil(2 * m.s2 * (1.959964 + 0.841621)
                                 * (1.959964 + 0.841621)
                                 / (mde.rel_mde * m.mu
                                    * mde.rel_mde * m.mu))
                      / m.n) * 10000.0 + 0.5) / 10000.0 AS runs_of_data
        FROM mde CROSS JOIN m
        ORDER BY rel_mde
    """,
    tags=("A5", "governance", "diagnostic"),
)
def q_ab_power_calc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B test power calculator from OBSERVED variance: per relative
    MDE (5/10/20% of the purchase-value mean), the required n per arm
    at alpha=0.05 two-sided / 80% power — n = 2*sigma^2*(z_{a/2}+z_b)^2
    / delta^2 — and how many multiples of the current dataset that is.
    The pre-experiment sizing step q_ab_test_report's post-hoc readout
    assumes was done; z constants are literals (1.959964, 0.841621)
    so both engines evaluate identical arithmetic.

    Scale shape: one moments aggregate over the metric stream, then a
    3-row MDE grid of within-row arithmetic against the broadcast
    scalars. ceil() of a ratio of pinned quantities is deterministic;
    outputs floor-pinned at 4 dp (runs_of_data is a ratio of exact
    integers — the decimal-midpoint shape where engine round()
    tie-breaks diverge).
    """
    # exact integer-cent sufficient statistics (engine var_samp/avg
    # stream float partials; n_per_arm is an INTEGER ceil that a
    # 1-ulp wobble could flip): mu and s2 derive from order-free
    # int64 cent sums through identically parenthesized doubles.
    cents = F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5)).cast(
        "long"
    )
    ms = (
        scan(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .agg(
            F.count("*").alias("n"),
            dsum(cents).alias("sc"),
            dsum2(cents).alias("sc2"),
        )
    )
    nn = F.col("n")
    # n*sc2 - sc*sc runs in DECIMAL (sc/sc2 accumulate exact to ~1e38;
    # the int64 shape overflows quadratically in n — r9 ADVICE fix)
    m = ms.select(
        "n",
        (F.col("sc").cast("double") / (nn * F.lit(100.0))).alias("mu"),
        (
            dec_var(nn, F.col("sc2"), F.col("sc")) / F.lit(10000.0)
        ).alias("s2"),
    )
    mde = spark.createDataFrame(
        [(0.05,), (0.10,), (0.20,)], "rel_mde double"
    )
    z2 = (1.959964 + 0.841621) ** 2
    delta = F.col("rel_mde") * F.col("mu")
    n_arm = F.ceil(2 * F.col("s2") * F.lit(z2) / (delta * delta))
    return (
        mde.crossJoin(F.broadcast(m))
        .select(
            F.round("rel_mde", 2).alias("rel_mde"),
            pin(delta, 4).alias("abs_mde"),
            n_arm.cast("long").alias("n_per_arm"),
            pin(2.0 * n_arm / F.col("n"), 4).alias("runs_of_data"),
        )
        .orderBy("rel_mde")
    )


FRESHNESS_SLA_H = 24  # staleness threshold (hours behind the newest arrival)


@query(
    "q_data_freshness",
    oracle=f"""
        WITH g AS (SELECT max(epoch_ns(ts)) AS now_ns FROM events),
        s AS (
          SELECT event_type,
                 max(epoch_ns(ts)) AS last_ns,
                 count(*) AS n
          FROM events GROUP BY event_type)
        SELECT s.event_type,
               CAST(s.n AS BIGINT) AS n_events,
               CAST((g.now_ns - s.last_ns) // 3600000000000 AS BIGINT)
                 AS lag_hours,
               (g.now_ns - s.last_ns) // 3600000000000
                 >= {FRESHNESS_SLA_H} AS stale
        FROM s CROSS JOIN g
        ORDER BY event_type
    """,
    tags=("A1", "governance", "diagnostic"),
)
def q_data_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-freshness SLA board: per event type, hours since its last
    arrival relative to the newest arrival anywhere, with a 24 h
    staleness flag — the first check a pipeline on-call runs (a type
    whose feed silently died shows here before any metric drifts).

    Scale shape: two max-aggregates over one scan lineage (per-type
    and global — both map-side combinable), a broadcast scalar join,
    integer floor-divided lag. Nothing else.
    """
    ev = scan(spark, sf_dir, "events").select("event_type", "ts_ns")
    g = ev.agg(F.max("ts_ns").alias("now_ns"))
    s = ev.groupBy("event_type").agg(
        F.max("ts_ns").alias("last_ns"), F.count("*").alias("n")
    )
    lag_h = F.expr("(now_ns - last_ns) div 3600000000000")
    return (
        s.crossJoin(F.broadcast(g))
        .select(
            "event_type",
            F.col("n").cast("long").alias("n_events"),
            lag_h.cast("long").alias("lag_hours"),
            (lag_h >= FRESHNESS_SLA_H).alias("stale"),
        )
        .orderBy("event_type")
    )


@query(
    "q_cell_residuals",
    oracle="""
        WITH cell AS (
          SELECT lang, source, count(*) AS o
          FROM documents GROUP BY lang, source),
        marg AS (
          SELECT c.lang, c.source, c.o,
                 sum(c.o) OVER (PARTITION BY c.lang) AS rl,
                 sum(c.o) OVER (PARTITION BY c.source) AS rs,
                 sum(c.o) OVER () AS n
          FROM cell c),
        r AS (
          SELECT lang, source, o,
                 rl * rs * 1.0 / n AS e,
                 round((o - rl * rs * 1.0 / n)
                       / sqrt((rl * rs * 1.0 / n)
                              * (1 - rl * 1.0 / n)
                              * (1 - rs * 1.0 / n)),
                       4) AS std_residual
          FROM marg)
        SELECT lang, source, CAST(o AS BIGINT) AS observed,
               floor(e * 10000.0 + 0.5) / 10000.0 AS expected,
               std_residual,
               abs(std_residual) > 2.0 AS anomalous
        FROM r
        WHERE abs(std_residual) > 2.0
        ORDER BY lang, source
    """,
    tags=("A5", "W4", "governance", "diagnostic"),
)
def q_cell_residuals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standardized Pearson residuals per (lang, source) cell: which
    SPECIFIC combinations are over/under-represented relative to
    independence (|residual| > 2 ~ the 95% band) —
    q_chi2_independence answers WHETHER lang and source are
    associated; this says WHERE, which is what a mixture engineer
    acts on (a lang x source hole means that slice needs sourcing;
    a spike means one source dominates a language).

    Scale shape: ONE corpus-scale hash agg to the contingency cells;
    marginals are window aggregates on the |langs| x |sources|
    bounded cell frame (the single-scan pattern q_anova_doclen
    pins); residuals are within-row arithmetic on exact integer
    counts, pinned at 4 dp before the 2.0 threshold.
    """
    cell = (
        scan(spark, sf_dir, "documents")
        .groupBy("lang", "source")
        .agg(F.count("*").alias("o"))
    )
    w_l = Window.partitionBy("lang")
    w_s = Window.partitionBy("source")
    w_a = Window.partitionBy()
    marg = cell.select(
        "lang",
        "source",
        "o",
        F.sum("o").over(w_l).alias("rl"),
        F.sum("o").over(w_s).alias("rs"),
        F.sum("o").over(w_a).alias("n"),
    )
    e = F.col("rl") * F.col("rs") * 1.0 / F.col("n")
    std_res = F.round(
        (F.col("o") - e)
        / F.sqrt(
            e * (1 - F.col("rl") * 1.0 / F.col("n"))
            * (1 - F.col("rs") * 1.0 / F.col("n"))
        ),
        4,
    )
    return (
        marg.select(
            "lang",
            "source",
            F.col("o").cast("long").alias("observed"),
            # floor-pin: expected = rl*rs/n is a ratio of exact ints —
            # the decimal-midpoint shape where round() tie-breaks
            # diverge; std_residual keeps round() (sqrt-valued, never
            # an exact decimal midpoint).
            pin(e, 4).alias("expected"),
            std_res.alias("std_residual"),
            (F.abs(std_res) > 2.0).alias("anomalous"),
        )
        .filter(F.abs(F.col("std_residual")) > 2.0)
        .orderBy("lang", "source")
    )


@query(
    "q_ratio_delta_method",
    oracle="""
        WITH u AS (
          SELECT user_id,
                 sum(CASE WHEN event_type = 'purchase'
                          THEN CAST(floor(value * 100.0 + 0.5) AS BIGINT)
                          ELSE 0 END) AS xc,
                 count(*) AS y
          FROM events GROUP BY user_id),
        ms AS (
          SELECT count(*) AS n, sum(xc) AS sx, sum(y) AS sy,
                 sum(xc * xc) AS sxx, sum(y * y) AS syy,
                 sum(xc * y) AS sxy
          FROM u),
        m AS (
          SELECT n,
                 CAST(sx AS DOUBLE) / (n * 100.0) AS mx,
                 sy * 1.0 / n AS my,
                 CAST(n * sxx - sx * sx AS DOUBLE)
                   / (n * (n - 1.0)) / 10000.0 AS vx,
                 CAST(n * syy - sy * sy AS DOUBLE)
                   / (n * (n - 1.0)) AS vy,
                 CAST(n * sxy - sx * sy AS DOUBLE)
                   / (n * (n - 1.0)) / 100.0 AS cxy
          FROM ms)
        SELECT CAST(n AS BIGINT) AS n_users,
               floor((mx / my) * 1000000.0 + 0.5) / 1000000.0 AS ratio,
               floor(((vx - 2 * (mx / my) * cxy
                       + (mx / my) * (mx / my) * vy)
                      / (my * my) / n) * 10000000000.0 + 0.5)
                 / 10000000000.0 AS var_ratio,
               floor(sqrt((vx - 2 * (mx / my) * cxy
                           + (mx / my) * (mx / my) * vy)
                          / (my * my) / n) * 1000000.0 + 0.5)
                 / 1000000.0 AS se_ratio,
               floor((mx / my - 1.959964
                      * sqrt((vx - 2 * (mx / my) * cxy
                              + (mx / my) * (mx / my) * vy)
                             / (my * my) / n)) * 1000000.0 + 0.5)
                 / 1000000.0 AS ci_lo,
               floor((mx / my + 1.959964
                      * sqrt((vx - 2 * (mx / my) * cxy
                              + (mx / my) * (mx / my) * vy)
                             / (my * my) / n)) * 1000000.0 + 0.5)
                 / 1000000.0 AS ci_hi
        FROM m
    """,
    tags=("A5", "governance", "robust"),
)
def q_ratio_delta_method(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-method standard error for a RATIO metric (purchase
    revenue per event): Var(x̄/ȳ) ≈ (vx - 2r·cxy + r²·vy)/(ȳ²·n)
    with the user as the randomization unit — the A/B-analysis
    subtlety naive per-event variance gets wrong (events cluster
    within users, so treating them as independent understates the
    SE; q_bootstrap_ci solves this by resampling, the delta method
    solves it in closed form — one pass, no replicates).

    Scale shape: ONE per-user aggregate, then a single moments
    aggregate (var/covar sufficient statistics, map-side combinable)
    and closed-form scalar algebra. The z constant matches
    q_ab_power_calc's literal. Outputs round at 6/10 dp.
    """
    # exact integer-cent sufficient statistics (the covariance
    # recipe): engine avg/var_samp/covar_samp stream float partials
    # in accumulation order; here every moment derives from order-free
    # int64 sums through identically parenthesized double algebra.
    # int64 headroom: sx^2 ~ (users * max-cents)^2 stays < 2^63 at
    # fixture scales; carry the sums as DECIMAL beyond ~1e9 users.
    cents = F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5)).cast(
        "long"
    )
    u = (
        scan(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(F.col("event_type") == "purchase", cents).otherwise(
                    F.lit(0).cast("long")
                )
            ).alias("xc"),
            F.count("*").alias("y"),
        )
    )
    # moments in the shared DECIMAL tier: per-user cent sums square to
    # ~1e12 per row, so the int64 n*S2 - S1^2 shape overflows
    # quadratically in the user count (r9 ADVICE fix)
    ms = u.agg(
        F.count("*").alias("n"),
        dsum(F.col("xc")).alias("sx"),
        dsum(F.col("y")).alias("sy"),
        dsum2(F.col("xc")).alias("sxx"),
        dsum2(F.col("y")).alias("syy"),
        dsum2(F.col("xc"), F.col("y")).alias("sxy"),
    )
    nn = F.col("n")
    m = ms.select(
        "n",
        (F.col("sx").cast("double") / (nn * F.lit(100.0))).alias("mx"),
        (F.col("sy").cast("double") / nn).alias("my"),
        (
            dec_var(nn, F.col("sxx"), F.col("sx")) / F.lit(10000.0)
        ).alias("vx"),
        dec_var(nn, F.col("syy"), F.col("sy")).alias("vy"),
        (
            dec_var(nn, F.col("sxy"), F.col("sx"), F.col("sy"))
            / F.lit(100.0)
        ).alias("cxy"),
    )
    r = F.col("mx") / F.col("my")
    var_r = (
        (F.col("vx") - 2 * r * F.col("cxy") + r * r * F.col("vy"))
        / (F.col("my") * F.col("my"))
        / F.col("n")
    )
    se = F.sqrt(var_r)
    return m.select(
        F.col("n").cast("long").alias("n_users"),
        pin(r, 6).alias("ratio"),
        pin(var_r, 10).alias("var_ratio"),
        pin(se, 6).alias("se_ratio"),
        pin(r - 1.959964 * se, 6).alias("ci_lo"),
        pin(r + 1.959964 * se, 6).alias("ci_hi"),
    )


@query(
    "q_spearman_corr",
    oracle="""
        WITH per AS (
          SELECT o.o_orderkey, o.o_totalprice AS x,
                 count(l.l_orderkey) AS y
          FROM orders o LEFT JOIN lineitem l
            ON l.l_orderkey = o.o_orderkey
          GROUP BY 1, 2),
        hx AS (SELECT x, count(*) AS c FROM per GROUP BY x),
        ox AS (SELECT x, 2 * coalesce(sum(c) OVER (
                 ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING
                 AND 1 PRECEDING), 0) + c + 1 AS r2 FROM hx),
        hy AS (SELECT y, count(*) AS c FROM per GROUP BY y),
        oy AS (SELECT y, 2 * coalesce(sum(c) OVER (
                 ORDER BY y ROWS BETWEEN UNBOUNDED PRECEDING
                 AND 1 PRECEDING), 0) + c + 1 AS r2 FROM hy),
        nn AS (SELECT count(*) AS n FROM per),
        rk AS (
          SELECT ox.r2 - (n + 1) AS dx, oy.r2 - (n + 1) AS dy
          FROM per JOIN ox USING (x) JOIN oy USING (y), nn),
        s AS (
          SELECT count(*) AS n,
                 sum(dx * dy) AS sxy,
                 sum(dx * dx) AS sxx, sum(dy * dy) AS syy
          FROM rk)
        SELECT CAST(n AS BIGINT) AS n_orders,
               round(CAST(sxy AS DOUBLE)
                     / sqrt(CAST(sxx AS DOUBLE) * CAST(syy AS DOUBLE)),
                     6) AS spearman_rho
        FROM s
    """,
    tags=("A5", "W4", "governance", "robust"),
)
def q_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between an order's total price and
    its line-item count — the monotone-association check an analyst
    runs before trusting a Pearson r (price outliers can't move a
    rank statistic). Ties get the textbook AVERAGE rank, carried as
    2*rank so every intermediate stays an exact integer: avg-rank of
    a tie class = offset + (c+1)/2, hence 2*r = 2*offset + c + 1.

    Scale shape: ranks come from the per-value HISTOGRAM (distinct
    2-dp prices / item counts — value-grain-bounded, not corpus-
    bounded) with a cumulative offset over that bounded table, then a
    broadcast join back onto rows — the exact_rank pattern minus the
    per-row window, since Spearman only needs each row's tie-CLASS
    rank, never a within-class position. The doubled ranks are
    CENTERED by their exact integer mean (sum of average ranks is
    always n(n+1)/2, so mean 2*rank = n+1) before the moment sums:
    rho = sum dx*dy / sqrt(sum dx^2 * sum dy^2) on centered values
    keeps every bigint below n^3 — the uncentered n*sum(rx*ry)
    form overflowed int64 at sf0.1 (~2e21). The sums are map-side-
    combinable bigint aggregates of exact integers, so the final rho
    is one double division of identical operands on both engines: no
    FP-order sensitivity anywhere. (Beyond ~2e9 rows even centered
    n^3 outgrows int64: switch the three moment sums to
    DECIMAL(38,0), which both engines aggregate exactly.)
    """
    per = (
        scan(spark, sf_dir, "orders")
        .join(
            scan(spark, sf_dir, "lineitem").select("l_orderkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
            "left",
        )
        .groupBy("o_orderkey", "o_totalprice")
        .agg(F.count("l_orderkey").alias("y"))
        .select(F.col("o_totalprice").alias("x"), "y")
    )

    def double_ranks(df: DataFrame, col: str) -> DataFrame:
        hist = df.groupBy(col).agg(F.count("*").alias("c"))
        w = Window.orderBy(col).rowsBetween(Window.unboundedPreceding, -1)
        return hist.select(
            col,
            (
                2 * F.coalesce(F.sum("c").over(w), F.lit(0))
                + F.col("c")
                + 1
            ).alias(f"r2_{col}"),
        )

    nn = per.agg(F.count("*").alias("n"))
    rk = (
        per.join(F.broadcast(double_ranks(per, "x")), "x")
        .join(F.broadcast(double_ranks(per, "y")), "y")
        .crossJoin(F.broadcast(nn))
        .select(
            (F.col("r2_x") - (F.col("n") + 1)).alias("dx"),
            (F.col("r2_y") - (F.col("n") + 1)).alias("dy"),
        )
    )
    # DECIMAL second moments: double-ranks scale with the row count, so
    # per-row dx*dy products alone outgrow int64 (r9 shared tier)
    s = rk.agg(
        F.count("*").alias("n"),
        dsum2(F.col("dx"), F.col("dy")).alias("sxy"),
        dsum2(F.col("dx")).alias("sxx"),
        dsum2(F.col("dy")).alias("syy"),
    )
    return s.select(
        F.col("n").cast("long").alias("n_orders"),
        F.round(
            F.col("sxy").cast("double")
            / F.sqrt(
                F.col("sxx").cast("double") * F.col("syy").cast("double")
            ),
            6,
        ).alias("spearman_rho"),
    )


@query(
    "q_two_proportion_ztest",
    oracle="""
        WITH g AS (
          SELECT o_orderpriority AS grp,
                 count(*) AS n,
                 sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS x
          FROM orders
          WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
          GROUP BY 1),
        w AS (
          SELECT max(CASE WHEN grp = '1-URGENT' THEN n END) AS na,
                 max(CASE WHEN grp = '1-URGENT' THEN x END) AS xa,
                 max(CASE WHEN grp = '5-LOW' THEN n END) AS nb,
                 max(CASE WHEN grp = '5-LOW' THEN x END) AS xb
          FROM g)
        SELECT CAST(na AS BIGINT) AS n_a, CAST(xa AS BIGINT) AS x_a,
               floor((CAST(xa AS DOUBLE) / na) * 1000000.0 + 0.5)
                 / 1000000.0 AS rate_a,
               CAST(nb AS BIGINT) AS n_b, CAST(xb AS BIGINT) AS x_b,
               floor((CAST(xb AS DOUBLE) / nb) * 1000000.0 + 0.5)
                 / 1000000.0 AS rate_b,
               round((CAST(xa AS DOUBLE) / na - CAST(xb AS DOUBLE) / nb)
                     / sqrt((CAST(xa + xb AS DOUBLE) / (na + nb))
                            * (1.0 - CAST(xa + xb AS DOUBLE) / (na + nb))
                            * (1.0 / na + 1.0 / nb)), 6) AS z
        FROM w
    """,
    tags=("A1", "governance", "abtest"),
)
def q_two_proportion_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pooled two-proportion z-test: does the URGENT order queue
    finish ('F') at a different rate than the LOW queue? The
    completion counts are the sufficient statistics; z uses the
    pooled rate p̂ = (xa+xb)/(na+nb) under H0 — the companion
    test statistic to q_ab_power_calc's sample-size planner (same
    pooled-SE convention).

    Scale shape: one filtered two-group count/sum aggregate
    (map-side combinable, two output rows), a 2-row conditional
    pivot, then closed-form scalar algebra on exact integers — the
    only doubles are the final divisions, bit-identical on both
    engines. Rounds at 6 dp.
    """
    g = (
        scan(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority").isin("1-URGENT", "5-LOW"))
        .groupBy(F.col("o_orderpriority").alias("grp"))
        .agg(
            F.count("*").alias("n"),
            F.sum(
                F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)
            ).alias("x"),
        )
    )
    w = g.agg(
        F.max(F.when(F.col("grp") == "1-URGENT", F.col("n"))).alias("na"),
        F.max(F.when(F.col("grp") == "1-URGENT", F.col("x"))).alias("xa"),
        F.max(F.when(F.col("grp") == "5-LOW", F.col("n"))).alias("nb"),
        F.max(F.when(F.col("grp") == "5-LOW", F.col("x"))).alias("xb"),
    )
    ra = F.col("xa").cast("double") / F.col("na")
    rb = F.col("xb").cast("double") / F.col("nb")
    pool = (F.col("xa") + F.col("xb")).cast("double") / (
        F.col("na") + F.col("nb")
    )
    se = F.sqrt(
        pool * (1.0 - pool) * (1.0 / F.col("na") + 1.0 / F.col("nb"))
    )
    return w.select(
        F.col("na").cast("long").alias("n_a"),
        F.col("xa").cast("long").alias("x_a"),
        # floor-pin the rates (exact integer ratios — the decimal-
        # midpoint shape); z keeps round() (sqrt-valued, never an
        # exact decimal midpoint, identical doubles on both engines).
        pin(ra, 6).alias("rate_a"),
        F.col("nb").cast("long").alias("n_b"),
        F.col("xb").cast("long").alias("x_b"),
        pin(rb, 6).alias("rate_b"),
        F.round((ra - rb) / se, 6).alias("z"),
    )


# Wasserstein binning grain: 64 equal-width bins over the observed
# global [min, max] — coarse enough that the per-source histograms
# stay tiny, fine enough that the binned EMD tracks the exact one.
WASSERSTEIN_BINS = 64


@query(
    "q_wasserstein_drift",
    oracle=f"""
        WITH b AS (SELECT min(n_chars) AS lo, max(n_chars) AS hi
                   FROM documents),
        h AS (
          SELECT source,
                 least(((n_chars - lo) * {WASSERSTEIN_BINS})
                       // (hi - lo + 1),
                       {WASSERSTEIN_BINS - 1}) AS bin,
                 count(*) AS c
          FROM documents, b GROUP BY 1, 2),
        n AS (SELECT source, sum(c) AS n FROM h GROUP BY 1),
        spine AS (
          SELECT source, unnest(range({WASSERSTEIN_BINS})) AS bin FROM n),
        cum AS (
          SELECT s.source, s.bin,
                 sum(coalesce(h.c, 0)) OVER (
                   PARTITION BY s.source ORDER BY s.bin
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cu
          FROM spine s LEFT JOIN h ON h.source = s.source AND h.bin = s.bin),
        pair AS (
          SELECT a.source AS source_a, z.source AS source_b,
                 sum(abs(a.cu * nb.n - z.cu * na.n)) AS cross_abs,
                 max(na.n) AS na, max(nb.n) AS nb
          FROM cum a
          JOIN cum z ON z.bin = a.bin AND a.source < z.source
          JOIN n na ON na.source = a.source
          JOIN n nb ON nb.source = z.source
          GROUP BY 1, 2)
        SELECT source_a, source_b,
               CAST((2 * (SELECT hi - lo + 1 FROM b) * cross_abs * 1000000
                     + {WASSERSTEIN_BINS} * na * nb)
                    // (2 * {WASSERSTEIN_BINS} * na * nb) AS DOUBLE)
               / 1000000.0 AS emd_chars
        FROM pair
        ORDER BY source_a, source_b
    """,
    tags=("A5", "W4", "governance", "drift"),
)
def q_wasserstein_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise 1-D Wasserstein distance (earth-mover, in character
    units) between every two sources' document-length distributions —
    the drift measure that, unlike KS (q_ks_drift) or PSI
    (q_psi_drift), weighs HOW FAR mass moved, not just whether the
    CDFs separate: a source whose docs all grew 10% scores near the
    growth, not near 1.0.

    Binned EMD on a 64-bucket equal-width grid: EMD = binwidth *
    sum over bins |CDF_a - CDF_b|. Carried cross-multiplied —
    |cumA*nB - cumB*nA| — so every comparison is EXACT bigint
    arithmetic, and even the 6-dp rounding happens as integer
    half-up division in micro-units ((2*numer + den) div (2*den)):
    the first 4-dp draft landed on exact .00005 boundaries where
    Spark (BigDecimal HALF_UP on the shortest-string double) and
    DuckDB (round on the binary value) disagree — integer carry
    makes the question moot; the only double op is one final /1e6 of
    identical bigints. The zero-count bins matter (a gap in one
    source's histogram still advances the other's CDF), so
    cumulation runs over a dense per-source bin spine, not the
    sparse histogram.

    Scale shape: corpus-scale work is ONE pass into per-(source, bin)
    counts (sources x 64 rows); the spine, cumulation window
    (partitioned per source, 64 rows each) and the pairwise bin join
    (|sources|^2/2 x 64 rows) are all source-cardinality-bounded.
    The [min, max] bounds are a broadcast 1-row aggregate.
    """
    docs = scan(spark, sf_dir, "documents")
    b = docs.agg(
        F.min("n_chars").alias("lo"), F.max("n_chars").alias("hi")
    )
    nb_ = WASSERSTEIN_BINS
    h = (
        docs.crossJoin(F.broadcast(b))
        .select(
            "source",
            F.least(
                F.expr(
                    f"((n_chars - lo) * {nb_}) div (hi - lo + 1)"
                ),
                F.lit(nb_ - 1).cast("long"),
            ).alias("bin"),
        )
        .groupBy("source", "bin")
        .agg(F.count("*").alias("c"))
    )
    n = h.groupBy("source").agg(F.sum("c").alias("n"))
    spine = n.select(
        "source", F.explode(F.sequence(F.lit(0), F.lit(nb_ - 1))).alias("bin")
    )
    cumw = (
        Window.partitionBy("source")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = (
        spine.join(h, ["source", "bin"], "left")
        .select(
            "source",
            "bin",
            F.sum(F.coalesce(F.col("c"), F.lit(0))).over(cumw).alias("cu"),
        )
    )
    a = cum.select(
        F.col("source").alias("source_a"), "bin", F.col("cu").alias("cua")
    )
    z = cum.select(
        F.col("source").alias("source_b"), "bin", F.col("cu").alias("cub")
    )
    na = n.select(F.col("source").alias("source_a"), F.col("n").alias("na"))
    nbt = n.select(F.col("source").alias("source_b"), F.col("n").alias("nb"))
    pair = (
        a.join(z, "bin")
        .where(F.col("source_a") < F.col("source_b"))
        .join(F.broadcast(na), "source_a")
        .join(F.broadcast(nbt), "source_b")
        .groupBy("source_a", "source_b")
        .agg(
            F.sum(
                F.abs(F.col("cua") * F.col("nb") - F.col("cub") * F.col("na"))
            ).alias("cross_abs"),
            F.max("na").alias("na_"),
            F.max("nb").alias("nb_"),
        )
    )
    return (
        pair.crossJoin(F.broadcast(b))
        .select(
            "source_a",
            "source_b",
            (
                F.expr(
                    f"(2 * (hi - lo + 1) * cross_abs * 1000000"
                    f" + {nb_} * na_ * nb_)"
                    f" div (2 * {nb_} * na_ * nb_)"
                ).cast("double")
                / 1000000.0
            ).alias("emd_chars"),
        )
        .orderBy("source_a", "source_b")
    )


# Deterministic length-based pseudo-classifier for the calibration /
# Brier pair: P(lang = 'en' | n_chars) modeled as a fixed logistic in
# the document length. Fixed coefficients, NOT a fit — these queries
# verify the EVALUATION machinery (reliability bins, ECE, Brier
# decomposition), which at 100 TB consumes model scores produced
# upstream; a deterministic score function makes the evaluation
# hash-comparable across engines.
CALIB_MID = 300.0
CALIB_SCALE = 100.0


@query(
    "q_calibration_bins",
    oracle=f"""
        WITH s AS (
          SELECT 1.0 / (1.0 + exp(-(n_chars - {CALIB_MID})
                                  / {CALIB_SCALE})) AS score,
                 CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
          FROM documents),
        b AS (
          SELECT least(CAST(floor(score * 10) AS BIGINT), 9) AS bin,
                 score, y
          FROM s)
        , m AS (
          SELECT bin, count(*) AS n, sum(y) AS sy,
                 sum(CAST(floor(score * 100000000.0 + 0.5) AS BIGINT)) AS sg
          FROM b GROUP BY bin)
        SELECT bin,
               CAST(n AS BIGINT) AS n,
               floor((CAST(sg AS DOUBLE) / (CAST(n AS DOUBLE) * 100000000.0))
                     * 10000.0 + 0.5) / 10000.0 AS mean_score,
               floor((sy * 1.0 / n) * 10000.0 + 0.5) / 10000.0 AS frac_pos,
               floor(abs(CAST(sg AS DOUBLE)
                         / (CAST(n AS DOUBLE) * 100000000.0)
                         - sy * 1.0 / n) * 10000.0 + 0.5) / 10000.0 AS gap
        FROM m
        ORDER BY bin
    """,
    tags=("A1", "governance", "mleval"),
)
def q_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram for a probabilistic classifier: decile
    bins of the predicted probability vs the observed positive rate,
    with the per-bin |confidence - accuracy| gap whose n-weighted sum
    is the Expected Calibration Error. The scored event is "document
    is English", the score a fixed logistic in document length (see
    CALIB_MID note) — evaluation machinery, not a model fit.

    Determinism: the score is one exp() of identical operands (both
    engines' libm agree far beyond the 1e-4 minimum distance any
    fixture score has to a 0.1 bin edge — the n_chars=300 midpoint
    lands on exp(0)=0.5, exact in both), bins clamp to 9 so
    score=1.0 can't overflow the decile grid, and the averaged
    doubles round at 4 dp, nine orders above accumulation noise.

    Scale shape: per-row scoring is codegen arithmetic; the only
    exchange is a hash-agg into <=10 bins (map-side combinable).
    """
    s = scan(spark, sf_dir, "documents").select(
        (
            1.0
            / (
                1.0
                + F.exp(-(F.col("n_chars") - CALIB_MID) / CALIB_SCALE)
            )
        ).alias("score"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
    )
    return (
        s.select(
            F.least(
                F.floor(F.col("score") * 10).cast("long"), F.lit(9).cast("long")
            ).alias("bin"),
            "score",
            "y",
        )
        .groupBy("bin")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("y").alias("sy"),
            # per-row scores are identical doubles up to exp() libm
            # ulp (the 1e-8 grid leaves a ~1e-8 per-row boundary-flip
            # residual — shrunk, not eliminated); the sums are
            # order-free exact int64 (the exact_avg recipe)
            F.sum(
                F.floor(
                    F.col("score") * F.lit(100000000.0) + F.lit(0.5)
                ).cast("long")
            ).alias("sg"),
        )
        .select(
            "bin",
            "n",
            pin(
                F.col("sg").cast("double")
                / (F.col("n").cast("double") * F.lit(100000000.0)),
                4,
            ).alias("mean_score"),
            pin(F.col("sy") * F.lit(1.0) / F.col("n"), 4).alias("frac_pos"),
            pin(
                F.abs(
                    F.col("sg").cast("double")
                    / (F.col("n").cast("double") * F.lit(100000000.0))
                    - F.col("sy") * F.lit(1.0) / F.col("n")
                ),
                4,
            ).alias("gap"),
        )
        .orderBy("bin")
    )


@query(
    "q_brier_score",
    oracle=f"""
        WITH s AS (
          SELECT 1.0 / (1.0 + exp(-(n_chars - {CALIB_MID})
                                  / {CALIB_SCALE})) AS score,
                 CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y
          FROM documents)
        , m AS (
          SELECT count(*) AS n, sum(y) AS sy,
                 sum(CAST(floor((score - y) * (score - y)
                                * 100000000.0 + 0.5) AS BIGINT)) AS sq
          FROM s)
        SELECT CAST(n AS BIGINT) AS n_docs,
               floor((sy / n) * 1000000.0 + 0.5) / 1000000.0 AS base_rate,
               floor((CAST(sq AS DOUBLE) / (CAST(n AS DOUBLE) * 100000000.0))
                     * 1000000.0 + 0.5) / 1000000.0 AS brier,
               floor(((sy / n) * (1.0 - sy / n)) * 1000000.0 + 0.5)
                 / 1000000.0 AS brier_ref,
               floor((1.0 - CAST(sq AS DOUBLE)
                            / (CAST(n AS DOUBLE) * 100000000.0)
                            / ((sy / n) * (1.0 - sy / n)))
                     * 1000000.0 + 0.5) / 1000000.0 AS skill
        FROM m
    """,
    tags=("A2", "governance", "mleval"),
)
def q_brier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brier score + skill for the same length-logistic classifier as
    q_calibration_bins: mean squared error of the probability
    forecast, referenced against the no-skill climatology forecast
    (always predict the base rate, whose Brier is p(1-p)) — skill =
    1 - brier/brier_ref, the standard "is this model better than
    guessing the prior" scalar.

    Scale shape: one global aggregate of codegen arithmetic —
    map-side partials, a 1-row result. Rounds at 6 dp (accumulation
    noise on ~n 0-1 doubles is ~1e-15 relative).
    """
    s = scan(spark, sf_dir, "documents").select(
        (
            1.0
            / (
                1.0
                + F.exp(-(F.col("n_chars") - CALIB_MID) / CALIB_SCALE)
            )
        ).alias("score"),
        F.when(F.col("lang") == "en", 1.0).otherwise(0.0).alias("y"),
    )
    # y sums are exact (0/1 doubles); per-row squared errors are
    # identical doubles up to the exp() libm ulp (the 1e-8 grid
    # leaves a ~1e-8 per-row boundary-flip residual) before an
    # order-free int64 sum; every output is then
    # identically parenthesized double arithmetic, 6-dp floor-pinned.
    sq = (F.col("score") - F.col("y")) * (F.col("score") - F.col("y"))
    m = s.agg(
        F.count("*").alias("n"),
        F.sum("y").alias("sy"),
        F.sum(
            F.floor(sq * F.lit(100000000.0) + F.lit(0.5)).cast("long")
        ).alias("sq"),
    )
    br = F.col("sy") / F.col("n")
    brier_raw = F.col("sq").cast("double") / (
        F.col("n").cast("double") * F.lit(100000000.0)
    )
    return m.select(
        F.col("n").cast("long").alias("n_docs"),
        pin(br, 6).alias("base_rate"),
        pin(brier_raw, 6).alias("brier"),
        pin(br * (F.lit(1.0) - br), 6).alias("brier_ref"),
        pin(
            F.lit(1.0) - brier_raw / (br * (F.lit(1.0) - br)), 6
        ).alias("skill"),
    )


@query(
    "q_auc_roc",
    oracle="""
        WITH d AS (
          SELECT n_chars,
                 CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
          FROM documents),
        h AS (
          SELECT n_chars, count(*) AS c, sum(y) AS pos
          FROM d GROUP BY n_chars),
        r AS (
          SELECT n_chars, c, pos,
                 2 * coalesce(sum(c) OVER (
                   ORDER BY n_chars ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING), 0) + c + 1 AS r2
          FROM h),
        s AS (
          SELECT sum(pos) AS np, sum(c) - sum(pos) AS nn,
                 sum(pos * r2) AS r2pos
          FROM r)
        SELECT CAST(np AS BIGINT) AS n_pos, CAST(nn AS BIGINT) AS n_neg,
               CAST((2 * ((r2pos - np * (np + 1)) * 1000000)
                     + 2 * np * nn)
                    // (2 * (2 * np * nn)) AS DOUBLE)
               / 1000000.0 AS auc
        FROM s
    """,
    tags=("A5", "W4", "governance", "mleval"),
)
def q_auc_roc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC AUC of the length-logistic English classifier
    (q_calibration_bins' scorer) via the rank-sum identity: AUC =
    (R_pos - np(np+1)/2) / (np*nn) with AVERAGE ranks on ties —
    exactly the probability a random positive outranks a random
    negative, ties counting half. Because the logistic is monotone
    in n_chars, ranking by score IS ranking by n_chars, so no
    transcendental ever enters: the whole statistic is integer
    arithmetic on the n_chars histogram.

    Determinism: doubled average ranks (2r = 2*offset + c + 1, the
    q_spearman_corr carry) keep R_pos an exact bigint; the 6-dp AUC
    is rounded by integer half-up carry in micro-units — np*nn
    denominators can be 2^a*5^b (the terminating-decimal halfway
    class where engine round()s disagree).

    Scale shape: one hash agg onto the n_chars grain (value-bounded,
    ~500 distinct), a cumulative window over that bounded histogram,
    and a 1-row moment aggregate.
    """
    d = scan(spark, sf_dir, "documents").select(
        "n_chars",
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
    )
    h = d.groupBy("n_chars").agg(
        F.count("*").alias("c"), F.sum("y").alias("pos")
    )
    w = Window.orderBy("n_chars").rowsBetween(Window.unboundedPreceding, -1)
    r = h.select(
        "c",
        "pos",
        (
            2 * F.coalesce(F.sum("c").over(w), F.lit(0)) + F.col("c") + 1
        ).alias("r2"),
    )
    s = r.agg(
        F.sum("pos").alias("np"),
        (F.sum("c") - F.sum("pos")).alias("nn"),
        F.sum(F.col("pos") * F.col("r2")).alias("r2pos"),
    )
    return s.select(
        F.col("np").cast("long").alias("n_pos"),
        F.col("nn").cast("long").alias("n_neg"),
        (
            F.expr(
                "(2 * ((r2pos - np * (np + 1)) * 1000000) + 2 * np * nn)"
                " div (2 * (2 * np * nn))"
            ).cast("double")
            / 1000000.0
        ).alias("auc"),
    )


@query(
    "q_precision_recall_curve",
    oracle="""
        WITH s AS (
          SELECT least(CAST(floor((1.0 / (1.0 + exp(-(n_chars - 300.0)
                                                    / 100.0))) * 10)
                            AS BIGINT), 9) AS bin,
                 CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
          FROM documents),
        h AS (SELECT bin, count(*) AS c, sum(y) AS pos
              FROM s GROUP BY bin),
        tot AS (SELECT sum(pos) AS np FROM h),
        c AS (
          SELECT bin,
                 sum(c) OVER (ORDER BY bin DESC
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS pred_pos,
                 sum(pos) OVER (ORDER BY bin DESC
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS tp
          FROM h)
        SELECT bin AS threshold_bin,
               CAST(tp AS BIGINT) AS tp,
               CAST(pred_pos AS BIGINT) AS pred_pos,
               CAST((2 * tp * 1000000 + pred_pos)
                    // (2 * pred_pos) AS DOUBLE) / 1000000.0
                 AS precision_,
               CAST((2 * tp * 1000000 + (SELECT np FROM tot))
                    // (2 * (SELECT np FROM tot)) AS DOUBLE) / 1000000.0
                 AS recall_
        FROM c
        ORDER BY threshold_bin
    """,
    tags=("A1", "W4", "governance", "mleval"),
)
def q_precision_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision/recall at every score-decile threshold for the
    length-logistic classifier: predict positive when the score
    lands in bin >= t, sweep t over the ten calibration bins —
    q_calibration_bins answers "are the probabilities honest", this
    answers "where should the gate sit" (the quality-filter tuning
    curve a corpus pipeline reads before setting its keep
    threshold).

    Determinism: cumulate the per-bin (count, positives) histogram
    FROM THE TOP bin down (10-row window), so TP and predicted-
    positive counts are exact integers; precision/recall round by
    integer half-up carry (denominators here are plain doc counts —
    250, 500 — squarely the 2^a*5^b halfway class).

    Scale shape: identical to q_calibration_bins — per-row codegen
    scoring, one hash-agg into <=10 bins, then 10-row windows; the
    np total broadcasts.
    """
    s = scan(spark, sf_dir, "documents").select(
        F.least(
            F.floor(
                (
                    1.0
                    / (
                        1.0
                        + F.exp(
                            -(F.col("n_chars") - CALIB_MID) / CALIB_SCALE
                        )
                    )
                )
                * 10
            ).cast("long"),
            F.lit(9).cast("long"),
        ).alias("bin"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
    )
    h = s.groupBy("bin").agg(
        F.count("*").alias("c"), F.sum("y").alias("pos")
    )
    tot = h.agg(F.sum("pos").alias("np"))
    w = Window.orderBy(F.col("bin").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    c = h.select(
        "bin",
        F.sum("c").over(w).alias("pred_pos"),
        F.sum("pos").over(w).alias("tp"),
    )
    return (
        c.crossJoin(F.broadcast(tot))
        .select(
            F.col("bin").alias("threshold_bin"),
            F.col("tp").cast("long").alias("tp"),
            F.col("pred_pos").cast("long").alias("pred_pos"),
            (
                F.expr(
                    "(2 * tp * 1000000 + pred_pos) div (2 * pred_pos)"
                ).cast("double")
                / 1000000.0
            ).alias("precision_"),
            (
                F.expr("(2 * tp * 1000000 + np) div (2 * np)").cast(
                    "double"
                )
                / 1000000.0
            ).alias("recall_"),
        )
        .orderBy("threshold_bin")
    )


@query(
    "q_kendall_tau",
    oracle="""
        WITH per AS (
          SELECT o.o_totalprice AS x, count(l.l_orderkey) AS y
          FROM orders o LEFT JOIN lineitem l
            ON l.l_orderkey = o.o_orderkey
          GROUP BY o.o_orderkey, o.o_totalprice),
        cells AS (SELECT x, y, count(*) AS c FROM per GROUP BY x, y),
        spine AS (
          SELECT xs.x, ys.y
          FROM (SELECT DISTINCT x FROM per) xs
          CROSS JOIN (SELECT DISTINCT y FROM per) ys),
        cum AS (
          SELECT s.x, s.y,
                 coalesce(sum(c.c) OVER (
                   PARTITION BY s.y ORDER BY s.x
                   ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING), 0) AS below,
                 coalesce(c.c, 0) AS at_x,
                 sum(coalesce(c.c, 0)) OVER (PARTITION BY s.y) AS tot
          FROM spine s LEFT JOIN cells c
            ON c.x = s.x AND c.y = s.y),
        cd AS (
          SELECT sum(ce.c * cu.below) AS conc,
                 sum(ce.c * (cu.tot - cu.below - cu.at_x)) AS disc
          FROM cells ce
          JOIN cum cu ON cu.x = ce.x AND cu.y < ce.y),
        tx AS (SELECT sum(cx * (cx - 1) // 2) AS t1
               FROM (SELECT count(*) AS cx FROM per GROUP BY x)),
        ty AS (SELECT sum(cy * (cy - 1) // 2) AS t2
               FROM (SELECT count(*) AS cy FROM per GROUP BY y)),
        nn AS (SELECT count(*) AS n FROM per)
        SELECT CAST(n AS BIGINT) AS n_orders,
               CAST(conc AS BIGINT) AS concordant,
               CAST(disc AS BIGINT) AS discordant,
               round(CAST(conc - disc AS DOUBLE)
                     / sqrt(CAST(n * (n - 1) // 2 - t1 AS DOUBLE)
                            * CAST(n * (n - 1) // 2 - t2 AS DOUBLE)),
                     6) AS tau_b
        FROM cd, tx, ty, nn
    """,
    tags=("A5", "W4", "J2", "governance", "robust"),
)
def q_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b between order price and line-item count —
    Spearman's companion rank statistic, but defined on CONCORDANT
    vs DISCORDANT pairs, with the tau-b tie correction in both
    margins. The naive definition is an all-pairs O(n^2) join; this
    plan exploits the small y-domain (items per order) to count
    pairs exactly in O(|x grain| * |y classes|): for each (x, y)
    cell, every pair against a lower class is concordant when the
    other order's price sits strictly below (the per-class exclusive
    prefix "below"), discordant when strictly above (tot - below -
    at_x) — so C and D are sums of cell-count x prefix-count
    products, all exact bigints. The prefix table lives on a dense
    x-spine per class (a gap in one class's histogram must still
    expose its running count to the other classes' cells).

    Determinism: everything is integer until the final
    (C-D)/sqrt((T0-T1)(T0-T2)) — the factors are cast to double
    BEFORE multiplying (their bigint product would overflow at
    ~1e10 pairs) and the sqrt is irrational off the measure-zero
    perfect-square case, so the 6-dp round never sits on an engine
    disagreement.

    Scale shape: the corpus-scale work is the per-order aggregate
    (shared with q_spearman_corr); cells ~= n at the 2-dp price
    grain, the spine is |distinct x| * |y classes| rows with
    PARTITIONED windows per class, and the cell-to-class join fans
    out by at most |y classes|.
    """
    per = (
        scan(spark, sf_dir, "orders")
        .join(
            scan(spark, sf_dir, "lineitem").select("l_orderkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
            "left",
        )
        .groupBy("o_orderkey", "o_totalprice")
        .agg(F.count("l_orderkey").alias("y"))
        .select(F.col("o_totalprice").alias("x"), "y")
    )
    cells = per.groupBy("x", "y").agg(F.count("*").alias("c"))
    spine = per.select("x").distinct().crossJoin(
        F.broadcast(per.select("y").distinct())
    )
    belw = (
        Window.partitionBy("y")
        .orderBy("x")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    totw = Window.partitionBy("y")
    cum = (
        spine.join(cells, ["x", "y"], "left")
        .select(
            "x",
            "y",
            F.coalesce(F.sum("c").over(belw), F.lit(0)).alias("below"),
            F.coalesce(F.col("c"), F.lit(0)).alias("at_x"),
            F.sum(F.coalesce(F.col("c"), F.lit(0))).over(totw).alias("tot"),
        )
    )
    cu = cum.select(
        F.col("x"),
        F.col("y").alias("yi"),
        "below",
        "at_x",
        "tot",
    )
    cd = (
        cells.join(cu, (cells["x"] == cu["x"]) & (cu["yi"] < cells["y"]))
        .agg(
            F.sum(F.col("c") * F.col("below")).alias("conc"),
            F.sum(
                F.col("c") * (F.col("tot") - F.col("below") - F.col("at_x"))
            ).alias("disc"),
        )
    )
    t1 = (
        per.groupBy("x")
        .agg(F.count("*").alias("cx"))
        .agg(F.sum(F.expr("cx * (cx - 1) div 2")).alias("t1"))
    )
    t2 = (
        per.groupBy("y")
        .agg(F.count("*").alias("cy"))
        .agg(F.sum(F.expr("cy * (cy - 1) div 2")).alias("t2"))
    )
    nn = per.agg(F.count("*").alias("n"))
    t0 = F.expr("n * (n - 1) div 2")
    return (
        cd.crossJoin(F.broadcast(t1))
        .crossJoin(F.broadcast(t2))
        .crossJoin(F.broadcast(nn))
        .select(
            F.col("n").cast("long").alias("n_orders"),
            F.col("conc").cast("long").alias("concordant"),
            F.col("disc").cast("long").alias("discordant"),
            F.round(
                (F.col("conc") - F.col("disc")).cast("double")
                / F.sqrt(
                    (t0 - F.col("t1")).cast("double")
                    * (t0 - F.col("t2")).cast("double")
                ),
                6,
            ).alias("tau_b"),
        )
    )


@query(
    "q_log_loss",
    oracle=f"""
        WITH s AS (
          SELECT 1.0 / (1.0 + exp(-(n_chars - {CALIB_MID})
                                  / {CALIB_SCALE})) AS score,
                 CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y
          FROM documents)
        , m AS (
          SELECT count(*) AS n, sum(y) AS sy,
                 sum(CAST(floor(-(y * ln(score)
                                  + (1.0 - y) * ln(1.0 - score))
                                * 100000000.0 + 0.5) AS BIGINT)) AS sll
          FROM s),
        r AS (
          SELECT n,
                 CAST(sll AS DOUBLE) / (CAST(n AS DOUBLE) * 100000000.0)
                   AS loss,
                 -((sy / n) * ln(sy / n)
                   + (1.0 - sy / n) * ln(1.0 - sy / n)) AS ref
          FROM m)
        SELECT CAST(n AS BIGINT) AS n_docs,
               floor(loss * 1000000.0 + 0.5) / 1000000.0 AS log_loss,
               floor(ref * 1000000.0 + 0.5) / 1000000.0 AS entropy_ref,
               floor((1.0 - loss / ref) * 1000000.0 + 0.5) / 1000000.0
                 AS skill
        FROM r
    """,
    tags=("A2", "governance", "mleval"),
)
def q_log_loss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-entropy (log loss) of the length-logistic classifier,
    referenced against the label entropy (the log loss of always
    predicting the base rate): skill = 1 - loss/H(p). Completes the
    proper-scoring-rule pair with q_brier_score — Brier punishes
    squared miscalibration, log loss punishes CONFIDENT mistakes
    unboundedly, which is why corpus quality gates trained on it are
    shy near 0/1.

    Determinism: score and its ln() are per-row transcendentals of
    identical operands (cross-engine libm agreement holds to far
    below the 6-dp round — the q_calibration_bins argument); the
    logistic never reaches 0/1 on bounded n_chars so ln() stays
    finite. One global map-side-combinable aggregate.
    """
    s = scan(spark, sf_dir, "documents").select(
        (
            1.0
            / (
                1.0
                + F.exp(-(F.col("n_chars") - CALIB_MID) / CALIB_SCALE)
            )
        ).alias("score"),
        F.when(F.col("lang") == "en", 1.0).otherwise(0.0).alias("y"),
    )
    # per-row loss terms are identical doubles up to ln() libm ulp
    # (the 1e-8 grid leaves a ~1e-8 per-row boundary-flip residual);
    # the sum is order-free int64 and the
    # label sum is exact, so loss/ref/skill are identically
    # parenthesized doubles, floor-pinned at 6 dp.
    term = -(
        F.col("y") * F.log(F.col("score"))
        + (1.0 - F.col("y")) * F.log(1.0 - F.col("score"))
    )
    m = s.agg(
        F.count("*").alias("n"),
        F.sum("y").alias("sy"),
        F.sum(
            F.floor(term * F.lit(100000000.0) + F.lit(0.5)).cast("long")
        ).alias("sll"),
    )
    br = F.col("sy") / F.col("n")
    loss = F.col("sll").cast("double") / (
        F.col("n").cast("double") * F.lit(100000000.0)
    )
    ref = -(br * F.log(br) + (F.lit(1.0) - br) * F.log(F.lit(1.0) - br))
    return m.select(
        F.col("n").cast("long").alias("n_docs"),
        pin(loss, 6).alias("log_loss"),
        pin(ref, 6).alias("entropy_ref"),
        pin(F.lit(1.0) - loss / ref, 6).alias("skill"),
    )
