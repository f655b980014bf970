"""Training-data pipeline depth: chunking, retrieval scoring, corpus
mixing, indexing, quantization, and CDC merge (beyond SURVEY.md §2's
base inventory — the ops a 100 TB pretraining-data pipeline runs daily).

Every query here is deliberately expressed with JVM-side built-ins
(split / explode / sequence / slice / higher-order lambdas) so the hot
path stays inside whole-stage codegen: no Python UDFs. Scale notes per
query docstring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_log_analysis_spark.queries import query
from hadoop_log_analysis_spark.functions import (
    HASH_MOD,
    HASH_MULT,
    exact_avg,
    exact_sum,
    money,
    rate,
    subus_key,
)
from hadoop_log_analysis_spark.operators import similarity as SIM
from hadoop_log_analysis_spark.operators.partitioning import maybe_broadcast
from hadoop_log_analysis_spark.sources.catalog import scan, table_bytes

# Context-window chunking parameters: 32-token windows, stride 24
# (8-token overlap) — the standard pretraining tokenize-and-pack shape.
CHUNK_LEN = 32
CHUNK_STRIDE = 24

# BM25 constants (Robertson/Sparck Jones defaults).
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TERMS = ("join", "window", "merge")


@query(
    "q_doc_chunks",
    oracle=f"""
        WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
             s AS (SELECT doc_id, toks,
                          unnest(generate_series(0, len(toks) - 1, {CHUNK_STRIDE})) AS st
                   FROM t)
        SELECT doc_id,
               st // {CHUNK_STRIDE} AS chunk_idx,
               array_to_string(list_slice(toks, st + 1, st + {CHUNK_LEN}), ' ') AS chunk_text,
               len(list_slice(toks, st + 1, st + {CHUNK_LEN})) AS n_chunk_toks
        FROM s
        ORDER BY doc_id, chunk_idx
    """,
    tags=("L5", "F5", "chunking"),
)
def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking: each document split into 32-token
    windows with stride 24 (8-token overlap) — the tokenize-and-pack
    step of a pretraining pipeline, fully SQL-oracled.

    Spark shape: map-only (split -> sequence -> explode -> slice), no
    shuffle until the verification ORDER BY; at 100 TB this pipelines
    straight from scan to sink with zero exchanges.
    """
    t = scan(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    s = t.select(
        "doc_id",
        "toks",
        F.explode(
            F.sequence(F.lit(0), F.size("toks") - 1, F.lit(CHUNK_STRIDE))
        ).alias("st"),
    )
    return s.select(
        "doc_id",
        (F.col("st") / CHUNK_STRIDE).cast("long").alias("chunk_idx"),
        F.array_join(F.expr(f"slice(toks, st + 1, {CHUNK_LEN})"), " ").alias(
            "chunk_text"
        ),
        F.size(F.expr(f"slice(toks, st + 1, {CHUNK_LEN})")).alias("n_chunk_toks"),
    ).orderBy("doc_id", "chunk_idx")


@query(
    "q_bm25",
    oracle=f"""
        WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
             d AS (SELECT doc_id, len(toks) AS dl, unnest(toks) AS tok FROM t),
             tf AS (SELECT doc_id, dl, tok, count(*) AS tf FROM d
                    WHERE tok IN ('join', 'window', 'merge')
                    GROUP BY doc_id, dl, tok),
             dfreq AS (SELECT tok, count(DISTINCT doc_id) AS df FROM tf GROUP BY tok),
             s AS (SELECT count(*) AS n_docs, avg(len(toks)) AS avgdl FROM t)
        SELECT doc_id,
               CAST(sum(CAST(floor((ln((n_docs - df + 0.5) / (df + 0.5) + 1)
                         * (tf * ({BM25_K1} + 1))
                         / (tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl / avgdl)))
                         * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0
                 AS bm25,
               count(*) AS n_terms
        FROM tf JOIN dfreq USING (tok), s
        GROUP BY doc_id
        ORDER BY bm25 DESC, doc_id
        LIMIT 20
    """,
    tags=("L5", "ranking"),
)
def q_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 relevance scoring (k1=1.2, b=0.75) of the corpus against a
    3-term query — the retrieval-quality scorer used when mining
    training data by relevance.

    Scale shape: term-filtered explode collapses to a tiny tf table
    before any shuffle; df and corpus stats are 1-row/|terms|-row
    aggregates broadcast onto it — no full-corpus shuffle.
    """
    t = scan(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    stats = t.agg(
        F.count("*").alias("n_docs"), F.avg(F.size("toks")).alias("avgdl")
    )
    tf = (
        t.select(
            "doc_id",
            F.size("toks").alias("dl"),
            F.explode("toks").alias("tok"),
        )
        .filter(F.col("tok").isin(*BM25_TERMS))
        .groupBy("doc_id", "dl", "tok")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("tok").agg(F.countDistinct("doc_id").alias("df"))
    idf = F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1)
    term_score = idf * (F.col("tf") * (BM25_K1 + 1)) / (
        F.col("tf")
        + BM25_K1 * (1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
    )
    return (
        tf.join(F.broadcast(dfreq), "tok")
        .crossJoin(F.broadcast(stats))
        .withColumn("term_score", term_score)
        .groupBy("doc_id")
        .agg(
            # per-term scores are identical doubles (exact integer tf/df
            # + the one shared avgdl division); the 1-3-term float sum is
            # still order-sensitive AND bm25 is the ORDER key -> per-row
            # 1e-6 grid pin + exact int sum (functions.exact_sum)
            exact_sum("term_score", 6).alias("bm25"),
            F.count("*").alias("n_terms"),
        )
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(20)
    )


@query(
    "q_stratified_sample",
    oracle="""
        WITH counts AS (SELECT lang, count(*) AS n_before FROM documents GROUP BY lang),
             tot AS (SELECT count(*) AS n_total FROM documents),
             rates AS (SELECT lang, n_before,
                              least(1000, CAST(round((n_total / 5.0) / n_before * 1000) AS BIGINT))
                                AS thresh
                       FROM counts, tot)
        SELECT r.lang, r.n_before, r.thresh, count(*) AS n_after
        FROM documents d JOIN rates r ON d.lang = r.lang
        WHERE d.doc_id % 1000 < r.thresh
        GROUP BY r.lang, r.n_before, r.thresh
        ORDER BY r.lang
    """,
    tags=("L7", "sampling", "mixture"),
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified rebalancing: each language stratum is
    down-sampled toward an equal 1/5 share of the corpus via a
    key-modulo filter (doc_id % 1000 < per-stratum threshold) —
    reproducible data mixing with no RNG state.

    Scale shape: per-stratum rates come from a tiny broadcast
    aggregate; the sample itself is a map-side filter, so re-mixing
    100 TB is one scan with no shuffle of the wide rows.
    """
    docs = scan(spark, sf_dir, "documents").select("doc_id", "lang")
    counts = docs.groupBy("lang").agg(F.count("*").alias("n_before"))
    tot = docs.agg(F.count("*").alias("n_total"))
    rates = counts.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_before",
        F.least(
            F.lit(1000),
            F.round((F.col("n_total") / 5.0) / F.col("n_before") * 1000).cast(
                "long"
            ),
        ).alias("thresh"),
    )
    return (
        docs.join(F.broadcast(rates), "lang")
        .filter(F.pmod("doc_id", F.lit(1000)) < F.col("thresh"))
        .groupBy("lang", "n_before", "thresh")
        .agg(F.count("*").alias("n_after"))
        .orderBy("lang")
    )


@query(
    "q_source_mixture",
    oracle="""
        WITH per AS (SELECT source, count(*) AS n_docs,
                            CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
                     FROM documents GROUP BY source)
        SELECT source, n_docs, n_tokens,
               round(CAST(n_tokens AS DOUBLE)
                     / (SELECT sum(len(string_split(text, ' '))) FROM documents), 4)
                 AS token_share
        FROM per
        ORDER BY source
    """,
    tags=("L7", "mixture"),
)
def q_source_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus mixture report: per-source document and token counts and
    each source's share of total tokens — the dashboard a data-mixing
    run is tuned against.

    Token counts are integers (whitespace tokens), so the shares are
    exact single divisions — no float-summation-order hazard.
    """
    docs = scan(spark, sf_dir, "documents").select(
        "source", F.size(F.split("text", " ")).alias("ntok")
    )
    per = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"), F.sum("ntok").alias("n_tokens")
    )
    total = docs.agg(F.sum("ntok").alias("tot"))
    return (
        per.crossJoin(F.broadcast(total))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.round(F.col("n_tokens").cast("double") / F.col("tot"), 4).alias(
                "token_share"
            ),
        )
        .orderBy("source")
    )


@query(
    "q_inverted_index",
    oracle="""
        SELECT tok, count(*) AS df,
               array_to_string(list_sort(list(doc_id)), ' ') AS postings
        FROM (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
              FROM documents)
        GROUP BY tok
        ORDER BY tok
    """,
    tags=("L5", "index"),
)
def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted index construction: token -> document frequency +
    sorted posting list — the retrieval-index build step, as one
    explode + one hash aggregate.

    The posting list is emitted as a space-joined string (not an
    array column): the driver's canonicalizer hashes scalar cells and
    cannot sort/hash numpy arrays (the r3 red row, VERDICT r3 item 1).
    The string is a faithful serialization of the sorted list, so the
    hash check still pins element order and content.

    At 100 TB the posting lists of frequent terms become the skew
    hazard; the chunked build (q_inverted_index_chunked,
    operators/text.py inverted_index_chunked) pre-aggregates on
    (tok, doc_id // B) so no single reduce task materializes a whole
    head-term posting list.
    """
    docs = scan(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id",
            F.explode(F.array_distinct(F.split("text", " "))).alias("tok"),
        )
        .groupBy("tok")
        .agg(
            F.count("*").alias("df"),
            F.array_join(
                F.sort_array(F.collect_list("doc_id")), " "
            ).alias("postings"),
        )
        .orderBy("tok")
    )


@query(
    "q_inverted_index_chunked",
    oracle="""
        SELECT tok, count(*) AS df,
               array_to_string(list_sort(list(doc_id)), ' ') AS postings
        FROM (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
              FROM documents)
        GROUP BY tok
        ORDER BY tok
    """,
    tags=("L5", "index", "skew"),
)
def q_inverted_index_chunked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof inverted-index build (VERDICT r3 "Next round" #3):
    postings pre-aggregated per (tok, doc_id // B) so a head term's
    posting list is built by ~df/B bounded tasks instead of one
    collect_list funnel, then chunk strings concatenated in chunk
    order (chunk id is monotone in doc_id — no re-sort). Same final
    (tok, df, postings) contract and the same oracle as
    q_inverted_index; the chunked (tok, chunk) rows are the actual
    at-scale storage contract (operators/text.py
    inverted_index_chunked docstring).

    B=64 here so the sf0.01 fixture (~1.5k docs) genuinely exercises
    multi-chunk merges; at 100 TB B~=1024-8192 balances task count
    vs per-task memory.
    """
    from hadoop_log_analysis_spark.operators.text import (
        inverted_index_chunked,
        merge_chunked_index,
    )

    docs = scan(spark, sf_dir, "documents")
    chunked = inverted_index_chunked(docs, chunk_size=64)
    return merge_chunked_index(chunked).orderBy("tok")


@query(
    "q_embedding_quantize",
    oracle="""
        WITH pe AS (SELECT vec_id,
                           CAST(unnest(embedding) AS DOUBLE) AS x,
                           unnest(generate_series(1, len(embedding))) AS pos
                    FROM embeddings),
             mm AS (SELECT pos, min(x) AS mn, max(x) AS mx FROM pe GROUP BY pos),
             j AS (SELECT vec_id, x, mn, mx,
                          CAST(least(floor((x - mn) * 255.0 / (mx - mn)), 254.0) AS BIGINT)
                            AS code
                   FROM pe JOIN mm USING (pos))
        SELECT vec_id,
               CAST(sum(CAST(floor(abs(x - (mn + (code + 0.5)
                                            * (mx - mn) / 255.0))
                                   * 100000000.0 + 0.5) AS BIGINT))
                    AS DOUBLE)
                 / (CAST(count(abs(x - (mn + (code + 0.5)
                                        * (mx - mn) / 255.0))) AS DOUBLE)
                    * 100000000.0) AS q_err
        FROM j
        GROUP BY vec_id
        ORDER BY vec_id
    """,
    tags=("L4", "quantization", "F5"),
)
def q_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar quantization of the embedding store: per-dimension
    min/max codebook -> 8-bit codes -> mean absolute reconstruction
    error per vector. This is the compression step that makes a
    100 TB vector store servable (4x smaller + SIMD-friendly).

    Scale shape: the codebook is a 64-row aggregate broadcast back
    onto the posexploded vectors; everything else is map-side.
    """
    pe = (
        scan(spark, sf_dir, "embeddings")
        .select("vec_id", F.posexplode("embedding").alias("pos", "xf"))
        .select("vec_id", "pos", F.col("xf").cast("double").alias("x"))
    )
    mm = pe.groupBy("pos").agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
    code = F.least(
        F.floor((F.col("x") - F.col("mn")) * 255.0 / (F.col("mx") - F.col("mn"))),
        F.lit(254.0),
    ).cast("long")
    dequant = F.col("mn") + (F.col("code") + 0.5) * (
        F.col("mx") - F.col("mn")
    ) / 255.0
    return (
        pe.join(F.broadcast(mm), "pos")
        .withColumn("code", code)
        .groupBy("vec_id")
        # per-component errors are identical doubles; the per-vector
        # float avg is order-dependent -> 1e-8 grid + exact int64 sum
        .agg(exact_avg(F.abs(F.col("x") - dequant), 8).alias("q_err"))
        .orderBy("vec_id")
    )


@query(
    "q_pack_sequences",
    oracle=f"""
        WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents),
             s AS (SELECT doc_id, source, toks,
                          unnest(generate_series(0, len(toks) - 1, {CHUNK_STRIDE})) AS st
                   FROM t),
             c AS (SELECT source, doc_id, st // {CHUNK_STRIDE} AS chunk_idx,
                          len(list_slice(toks, st + 1, st + {CHUNK_LEN})) AS n
                   FROM s),
             w AS (SELECT source, n,
                          CAST((sum(n) OVER (PARTITION BY source ORDER BY doc_id, chunk_idx
                                             ROWS UNBOUNDED PRECEDING) - n) // 128 AS BIGINT)
                            AS seq_id
                   FROM c)
        SELECT source, seq_id, count(*) AS n_chunks, CAST(sum(n) AS BIGINT) AS n_tokens
        FROM w
        GROUP BY source, seq_id
        ORDER BY source, seq_id
    """,
    tags=("L5", "W4", "chunking"),
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: the chunk stream (q_doc_chunks shape) is
    packed into ~128-token training sequences per source by running
    token count — chunk i goes to sequence floor(prefix_tokens / 128).
    Deterministic ordering (doc_id, chunk_idx) makes the packing
    reproducible.

    Scale shape: the running sum partitions by source, so parallelism
    is bounded by source count — at 100 TB the same window runs per
    (source, date-bucket) to keep partitions bounded; semantics
    unchanged, noted here because the fixture has no date column on
    documents.
    """
    from pyspark.sql import Window

    t = scan(spark, sf_dir, "documents").select(
        "doc_id", "source", F.split("text", " ").alias("toks")
    )
    c = t.select(
        "source",
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.size("toks") - 1, F.lit(CHUNK_STRIDE))
        ).alias("st"),
        "toks",
    ).select(
        "source",
        "doc_id",
        (F.col("st") / CHUNK_STRIDE).cast("long").alias("chunk_idx"),
        F.size(F.expr(f"slice(toks, st + 1, {CHUNK_LEN})")).alias("n"),
    )
    w = Window.partitionBy("source").orderBy("doc_id", "chunk_idx").rowsBetween(
        Window.unboundedPreceding, 0
    )
    packed = c.withColumn("cum", F.sum("n").over(w)).withColumn(
        "seq_id", ((F.col("cum") - F.col("n")) / 128).cast("long")
    )
    return (
        packed.groupBy("source", "seq_id")
        .agg(F.count("*").alias("n_chunks"), F.sum("n").alias("n_tokens"))
        .orderBy("source", "seq_id")
    )


@query(
    "q_decontaminate",
    oracle="""
        WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
             sh AS (SELECT doc_id,
                           unnest(list_transform(generate_series(1, len(toks) - 7),
                                  i -> array_to_string(list_slice(toks, i, i + 7), ' ')))
                             AS g
                    FROM t),
             ev AS (SELECT DISTINCT g FROM sh WHERE doc_id < 20),
             tr AS (SELECT doc_id, g FROM sh WHERE doc_id >= 20)
        SELECT tr.doc_id, count(DISTINCT tr.g) AS n_shared_grams
        FROM tr JOIN ev ON tr.g = ev.g
        GROUP BY tr.doc_id
        ORDER BY doc_id
    """,
    tags=("L5", "L1", "contamination"),
)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: training docs sharing any token-level
    8-gram with the eval set (here: doc_id < 20 plays the benchmark)
    are flagged with their shared-gram count — the standard n-gram
    overlap decontamination pass before pretraining.

    Scale shape: eval-side shingles are tiny and broadcast; the
    training side never shuffles its full text, only exploded 8-grams
    that survive the broadcast semi-join.
    """
    t = scan(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    # Guard: Spark's sequence(1, n) DESCENDS for n < 1 — emit no
    # shingles for sub-8-token docs (DuckDB generate_series is empty).
    shingles = F.when(
        F.size("toks") >= 8,
        F.expr(
            "transform(sequence(1, size(toks) - 7),"
            " i -> array_join(slice(toks, i, 8), ' '))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    sh = t.select("doc_id", F.explode(shingles).alias("g"))
    ev = sh.filter(F.col("doc_id") < 20).select("g").distinct()
    tr = sh.filter(F.col("doc_id") >= 20)
    return (
        tr.join(F.broadcast(ev), "g")
        .groupBy("doc_id")
        .agg(F.countDistinct("g").alias("n_shared_grams"))
        .orderBy("doc_id")
    )


@query(
    "q_merge_upsert",
    oracle="""
        WITH upd AS (SELECT o_orderkey, 'X' AS o_orderstatus,
                            CAST(o_totalprice AS DECIMAL(18,2)) * 1.05
                              AS o_totalprice
                     FROM orders WHERE o_orderkey % 7 = 0),
             merged AS (SELECT o_orderkey, o_orderstatus,
                               CAST(CAST(o_totalprice AS DECIMAL(18,2))
                                    AS DECIMAL(22,4)) AS o_totalprice
                        FROM orders WHERE o_orderkey % 7 <> 0
                        UNION ALL SELECT * FROM upd)
        SELECT o_orderstatus, count(*) AS n,
               CAST(sum(o_totalprice) AS DOUBLE) AS total
        FROM merged
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
    """,
    tags=("O3", "J4", "cdc"),
)
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC merge (upsert) as a DataFrame idiom: a deterministic change
    batch (every 7th order repriced, restamped status 'X') is applied
    to the base table via anti-join + unionByName — the
    MERGE-without-a-lakehouse pattern, verified by post-merge rollup.

    Scale note: the anti-join shuffles on the merge key exactly once;
    with a bucketed base table (see q_bucketed_join) it is shuffle-free
    on the base side.
    """
    # exact DECIMAL money: the 1.05 repricing is a DECIMAL(18,2) x
    # DECIMAL(3,2) product (exact 4-dp), both union branches carry
    # DECIMAL(22,4), and the rollup sum is exact (functions.money)
    base = scan(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        money("o_totalprice").cast("decimal(22,4)").alias("o_totalprice"),
    )
    upd = (
        base.filter(F.col("o_orderkey") % 7 == 0)
        .select(
            "o_orderkey",
            F.lit("X").alias("o_orderstatus"),
            (F.col("o_totalprice") * F.lit("1.05").cast("decimal(3,2)"))
            .cast("decimal(22,4)")
            .alias("o_totalprice"),
        )
    )
    merged = base.join(upd, "o_orderkey", "left_anti").unionByName(upd)
    return (
        merged.groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n"),
            F.sum("o_totalprice").cast("double").alias("total"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "q_subword_tokens",
    oracle="""
        WITH p AS (SELECT unnest(regexp_extract_all(text, '[a-z]{1,4}')) AS piece
                   FROM documents)
        SELECT piece, count(*) AS n
        FROM p
        GROUP BY piece
        ORDER BY n DESC, piece
        LIMIT 20
    """,
    tags=("L5", "F1", "tokenization"),
)
def q_subword_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish regex tokenization: documents are segmented into
    greedy <=4-char alphabetic pieces (a fixed-merge stand-in for a
    BPE vocab) and the top-20 pieces reported — the tokenizer-side
    twin of the whitespace token counts in q_text_tokens.

    Scale shape: regexp_extract_all + explode stay in codegen; the
    shuffle is vocabulary-sized (piece cardinality), not corpus-sized,
    and partial aggregation collapses pieces map-side first.
    """
    docs = scan(spark, sf_dir, "documents")
    return (
        docs.select(
            F.explode(
                F.expr("regexp_extract_all(text, '[a-z]{1,4}', 0)")
            ).alias("piece")
        )
        .groupBy("piece")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "piece")
        .limit(20)
    )


@query(
    "q_temperature_mixture",
    oracle="""
        WITH per AS (SELECT source,
                            CAST(sum(len(string_split(text, ' '))) AS DOUBLE) AS toks
                     FROM documents GROUP BY source),
             t AS (SELECT sum(toks) AS tot FROM per),
             w AS (SELECT source, toks, pow(toks / tot, 0.7) AS wt FROM per, t),
             z AS (SELECT sum(wt) AS zsum FROM w)
        SELECT source,
               CAST(toks AS BIGINT) AS n_tokens,
               round(toks / tot, 4) AS nat_share,
               round(wt / zsum, 4) AS sample_weight
        FROM w, t, z
        ORDER BY source
    """,
    tags=("L7", "mixture"),
)
def q_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source mixture (T=0.7): per-source sampling
    weights proportional to token_share^(1/T'), the standard
    upweighting of small sources when mixing pretraining corpora —
    reported against each source's natural share.

    Scale shape: everything downstream of the per-source token sum
    (|sources| rows) is broadcast arithmetic; the only corpus-sized
    work is the one map-side tokenize + partial sum.
    """
    docs = scan(spark, sf_dir, "documents").select(
        "source", F.size(F.split("text", " ")).alias("ntok")
    )
    per = docs.groupBy("source").agg(
        F.sum("ntok").cast("double").alias("toks")
    )
    tot = per.agg(F.sum("toks").alias("tot"))
    w = per.crossJoin(F.broadcast(tot)).withColumn(
        "wt", F.pow(F.col("toks") / F.col("tot"), 0.7)
    )
    z = w.agg(F.sum("wt").alias("zsum"))
    return (
        w.crossJoin(F.broadcast(z))
        .select(
            "source",
            F.col("toks").cast("long").alias("n_tokens"),
            F.round(F.col("toks") / F.col("tot"), 4).alias("nat_share"),
            F.round(F.col("wt") / F.col("zsum"), 4).alias("sample_weight"),
        )
        .orderBy("source")
    )


@query(
    "q_shipping_priority",
    oracle="""
        SELECT o_orderkey,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(5,2)))) AS DOUBLE)
                 AS revenue,
               date_trunc('day', o_orderdate) AS odate
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-03-15'
          AND l_shipdate > TIMESTAMP '1998-03-15'
        GROUP BY o_orderkey, odate
        ORDER BY revenue DESC, o_orderkey
        LIMIT 10
    """,
    tags=("J1", "J2", "A1", "O2"),
)
def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: top-10 unshipped BUILDING-segment orders by
    open revenue — selective dim filter broadcast onto the fact
    chain, then a single grouped top-k.

    Plan intent at scale: the filtered customer set goes through
    size-aware ``maybe_broadcast`` (customer scales with SF, so a
    blanket hint would OOM at 100 TB); lineitem and orders shuffle
    once on the shared orderkey; the final top-10 is
    TakeOrderedAndProject, not a global sort.
    """
    cutoff = F.lit("1998-03-15").cast("timestamp")
    cust = (
        scan(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = (
        scan(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") < cutoff)
        .select("o_orderkey", "o_custkey", "o_orderdate")
    )
    li = (
        scan(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") > cutoff)
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    return (
        orders.join(
            maybe_broadcast(cust, table_bytes(sf_dir, "customer")),
            orders["o_custkey"] == cust["c_custkey"],
        )
        .join(li, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy(
            "o_orderkey", F.date_trunc("day", "o_orderdate").alias("odate")
        )
        .agg(
            F.sum(
                money("l_extendedprice")
                * (F.lit(1).cast("decimal(5,2)") - rate("l_discount"))
            )
            .cast("double")
            .alias("revenue")
        )
        .select("o_orderkey", "revenue", "odate")
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


@query(
    "q_pretraining_pipeline",
    oracle=f"""
        WITH k AS (SELECT text, min(doc_id) AS doc_id
                   FROM documents WHERE n_chars >= 100 GROUP BY text),
             d AS (SELECT k.doc_id, doc.source, k.text
                   FROM k JOIN documents doc ON doc.doc_id = k.doc_id),
             t AS (SELECT doc_id, source, string_split(text, ' ') AS toks FROM d),
             c AS (SELECT source, doc_id, st // {CHUNK_STRIDE} AS chunk_idx,
                          len(list_slice(toks, st + 1, st + {CHUNK_LEN})) AS n
                   FROM (SELECT doc_id, source, toks,
                                unnest(generate_series(0, len(toks) - 1, {CHUNK_STRIDE})) AS st
                         FROM t)),
             w AS (SELECT source, n,
                          CAST((sum(n) OVER (PARTITION BY source
                                             ORDER BY doc_id, chunk_idx
                                             ROWS UNBOUNDED PRECEDING) - n) // 128
                               AS BIGINT) AS seq_id
                   FROM c),
             per AS (SELECT source, count(*) AS n_chunks,
                            CAST(sum(n) AS BIGINT) AS n_tokens,
                            count(DISTINCT seq_id) AS n_sequences
                     FROM w GROUP BY source),
             dp AS (SELECT source, count(*) AS n_docs FROM d GROUP BY source)
        SELECT source, n_docs, n_chunks, n_sequences, n_tokens
        FROM per JOIN dp USING (source)
        ORDER BY source
    """,
    tags=("L1", "L5", "L7", "chunking", "pipeline"),
)
def q_pretraining_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The END-TO-END pretraining data pipeline as ONE declarative
    plan: length filter -> exact dedup (deterministic min-id keeper)
    -> context-window chunking (32/24) -> 128-token sequence packing
    -> per-source corpus accounting. Every stage is individually
    verified elsewhere (q_dedup_exact_groups, q_doc_chunks,
    q_pack_sequences, q_source_mixture); this query verifies their
    COMPOSITION, which is what actually runs in production.

    Scale shape: the filter pushes to the scan; dedup shuffles 32-byte
    hash keys + ids (not payloads, which rejoin by keeper id);
    chunking is map-only; packing windows per source. One logical
    plan end-to-end means Catalyst prunes columns ACROSS stage
    boundaries — text is dropped the moment token counts exist.
    """
    from pyspark.sql import Window

    docs = scan(spark, sf_dir, "documents").filter(F.col("n_chars") >= 100)
    keepers = docs.groupBy("text").agg(F.min("doc_id").alias("doc_id"))
    d = keepers.join(
        docs.select("doc_id", "source"), "doc_id"
    )  # keeper rows with their source
    c = (
        d.select(
            "doc_id", "source", F.split("text", " ").alias("toks")
        )
        .select(
            "source",
            "doc_id",
            F.explode(
                F.sequence(F.lit(0), F.size("toks") - 1, F.lit(CHUNK_STRIDE))
            ).alias("st"),
            "toks",
        )
        .select(
            "source",
            "doc_id",
            (F.col("st") / CHUNK_STRIDE).cast("long").alias("chunk_idx"),
            F.size(F.expr(f"slice(toks, st + 1, {CHUNK_LEN})")).alias("n"),
        )
    )
    w = Window.partitionBy("source").orderBy("doc_id", "chunk_idx").rowsBetween(
        Window.unboundedPreceding, 0
    )
    packed = c.withColumn(
        "seq_id", ((F.sum("n").over(w) - F.col("n")) / 128).cast("long")
    )
    per = packed.groupBy("source").agg(
        F.count("*").alias("n_chunks"),
        F.sum("n").alias("n_tokens"),
        F.countDistinct("seq_id").alias("n_sequences"),
    )
    dp = d.groupBy("source").agg(F.count("*").alias("n_docs"))
    return (
        per.join(dp, "source")
        .select("source", "n_docs", "n_chunks", "n_sequences", "n_tokens")
        .orderBy("source")
    )


@query(
    "q_pii_redaction",
    oracle="""
        WITH lines AS (SELECT event_id,
                              concat('user', CAST(user_id AS VARCHAR),
                                     '@example.com ', event_type) AS raw
                       FROM events)
        SELECT event_id,
               regexp_replace(raw, '[a-z0-9]+@[a-z.]+', '<EMAIL>') AS redacted,
               substring(sha256(CAST(event_id AS VARCHAR)), 1, 12) AS pseudo
        FROM lines
        ORDER BY event_id
        LIMIT 50
    """,
    tags=("F1", "L7", "compliance"),
)
def q_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing for training data: email-shaped substrings are
    redacted via regex and the row key is pseudonymized with a
    truncated SHA-256 — redact + re-key, the standard compliance pass
    before text enters a training corpus. (The fixture has no real
    PII, so an email-shaped line is synthesized from events columns —
    the redaction path itself is what's verified.)

    Scale shape: pure per-row codegen expressions — no shuffle at all
    until the verification ORDER BY; at 100 TB this is a map-only
    rewrite pass.
    """
    lines = scan(spark, sf_dir, "events").select(
        "event_id",
        F.concat(
            F.lit("user"),
            F.col("user_id").cast("string"),
            F.lit("@example.com "),
            F.col("event_type"),
        ).alias("raw"),
    )
    return (
        lines.select(
            "event_id",
            F.regexp_replace("raw", "[a-z0-9]+@[a-z.]+", "<EMAIL>").alias(
                "redacted"
            ),
            F.substring(
                F.sha2(F.col("event_id").cast("string"), 256), 1, 12
            ).alias("pseudo"),
        )
        .orderBy("event_id")
        .limit(50)
    )


# Corpus-curation additions (round 3): per-domain caps and repeated-line
# boilerplate removal — the two RefinedWeb/C4-style rules not yet in the
# registry.
DOMAIN_CAP_K = 10
BOILERPLATE_MIN_DOCS = 5
_BP_HDR = "subscribe to our newsletter"
_BP_FTR = "all rights reserved"


@query(
    "q_domain_cap",
    oracle=f"""
        WITH r AS (SELECT source, doc_id, n_chars,
                          row_number() OVER (PARTITION BY source
                                             ORDER BY n_chars DESC, doc_id)
                            AS rn
                   FROM documents)
        SELECT source, doc_id, n_chars
        FROM r WHERE rn <= {DOMAIN_CAP_K}
        ORDER BY source, n_chars DESC, doc_id
    """,
    tags=("L7", "W2", "curation"),
)
def q_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain document cap: keep at most 10 docs per source,
    preferring the longest (n_chars desc, doc_id tie-break) — the
    anti-over-representation rule a web-corpus pipeline applies so no
    single domain dominates the training mixture.

    Scale shape: per-group top-k via the two-phase bounded aggregate
    (operators/topk.py grouped_bottom_k) — no ``Window.partitionBy
    (source)``, so a domain with 10^8 pages never funnels through one
    reducer: per-reducer load is bounded by one scan partition's
    (n_chars, doc_id) items and the merge exchange by k structs per
    (source, partition). The oracle's row_number window states the
    semantics, not the plan.
    """
    from hadoop_log_analysis_spark.operators.topk import grouped_bottom_k

    docs = scan(spark, sf_dir, "documents").select(
        "source", "doc_id", "n_chars"
    )
    item = F.struct(
        (-F.col("n_chars")).alias("__neg"), F.col("doc_id"), F.col("n_chars")
    )
    return (
        grouped_bottom_k(docs, ["source"], item, DOMAIN_CAP_K, "__s")
        .select(
            "source",
            F.col("__s.doc_id").alias("doc_id"),
            F.col("__s.n_chars").alias("n_chars"),
        )
        .orderBy("source", F.desc("n_chars"), "doc_id")
    )


def _plant_boilerplate(docs: DataFrame) -> DataFrame:
    """FIXTURE AUGMENTATION, not production logic (ADVICE r3
    pipeline_q.py:870): the parquet fixture is single-line word-soup
    with no repeated lines, so a header is planted on doc_id % 3 == 0
    and a footer on doc_id % 4 == 0 — mirrored verbatim in the
    oracle's first CTE — purely so the removal operator has something
    to remove at every fixture SF. Production callers apply
    ``operators.text.remove_boilerplate`` to their corpus directly."""
    t1 = F.when(
        F.col("doc_id") % 3 == 0,
        F.concat(F.lit(_BP_HDR + "\n"), F.col("text")),
    ).otherwise(F.col("text"))
    text2 = F.when(
        F.col("doc_id") % 4 == 0, F.concat(t1, F.lit("\n" + _BP_FTR))
    ).otherwise(t1)
    return docs.select("doc_id", text2.alias("text"))


@query(
    "q_boilerplate_removal",
    oracle=f"""
        WITH p AS (SELECT doc_id,
                          CASE WHEN doc_id % 4 = 0
                               THEN t1 || chr(10) || '{_BP_FTR}'
                               ELSE t1 END AS text2
                   FROM (SELECT doc_id,
                                CASE WHEN doc_id % 3 = 0
                                     THEN '{_BP_HDR}' || chr(10) || text
                                     ELSE text END AS t1
                         FROM documents)),
             l AS (SELECT doc_id,
                          generate_subscripts(string_split(text2, chr(10)), 1)
                            AS pos,
                          unnest(string_split(text2, chr(10))) AS line
                   FROM p),
             b AS (SELECT line FROM l
                   GROUP BY line
                   HAVING count(DISTINCT doc_id) >= {BOILERPLATE_MIN_DOCS}),
             k AS (SELECT doc_id, pos, line FROM l
                   WHERE line NOT IN (SELECT line FROM b)),
             tot AS (SELECT doc_id, count(*) AS n_lines FROM l GROUP BY doc_id),
             agg AS (SELECT doc_id, count(*) AS n_kept,
                            string_agg(line, chr(10) ORDER BY pos) AS text_clean
                     FROM k GROUP BY doc_id)
        SELECT t.doc_id, t.n_lines,
               coalesce(a.n_kept, 0) AS n_kept,
               coalesce(a.text_clean, '') AS text_clean
        FROM tot t LEFT JOIN agg a USING (doc_id)
        ORDER BY t.doc_id
    """,
    tags=("L1", "L5", "curation"),
)
def q_boilerplate_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeated-line boilerplate removal: any line occurring in >= 5
    distinct documents (nav bars, subscribe prompts, copyright footers)
    is stripped from every document, which is then reassembled in
    original line order — C4/RefinedWeb line-level dedup.

    The production logic is ``operators.text.remove_boilerplate``;
    this registry entry drives it over the fixture corpus augmented by
    ``_plant_boilerplate`` (see its docstring — the raw fixture has no
    repeated lines, so the unaugmented query would be vacuous). Body
    lines occur in <= 2 docs (one exact-dup pair) and survive; the
    planted lines occur in ~n/3 and ~n/4 docs and are removed at every
    fixture SF. Scale shape documented on the operator.
    """
    from hadoop_log_analysis_spark.operators.text import remove_boilerplate

    docs = scan(spark, sf_dir, "documents").select("doc_id", "text")
    return remove_boilerplate(
        _plant_boilerplate(docs), min_docs=BOILERPLATE_MIN_DOCS
    ).orderBy("doc_id")


# Budget-constrained corpus selection: fill a token budget with the
# best-ranked documents (the "select 10B tokens for this training mix"
# op). Budget = 25% of corpus tokens so the query is scale-invariant.
TOKEN_BUDGET_FRAC = 0.25


@query(
    "q_token_budget_fill",
    oracle=f"""
        WITH d AS (SELECT doc_id, n_chars, n_chars // 4 AS tok FROM documents),
             t AS (SELECT sum(tok) AS total FROM d),
             w AS (SELECT doc_id, n_chars, tok,
                          sum(tok) OVER (ORDER BY n_chars DESC, doc_id)
                            AS cum_tok
                   FROM d)
        SELECT doc_id, tok, CAST(cum_tok AS BIGINT) AS cum_tok
        FROM w, t
        WHERE cum_tok - tok < {TOKEN_BUDGET_FRAC} * total
        ORDER BY n_chars DESC, doc_id
    """,
    tags=("L7", "W4", "curation"),
)
def q_token_budget_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget corpus fill: take documents in rank order (longest
    first, doc_id tie-break) until 25% of the corpus's estimated
    tokens (n_chars div 4) are consumed — the budgeted-selection step
    that turns a ranked corpus into a fixed-size training mixture.

    Scale shape (VERDICT r6 "What's wrong" #3 — the old plan's one
    remaining corpus-scale single-task window is gone): two bounded
    mechanisms compose. The prefix-class histogram
    (prefix_weight_classes) cuts the window input to the selected
    prefix plus one boundary class — but that prefix is ~25% of the
    corpus BY CONSTRUCTION here, so the running sum itself is the
    two-phase exact_cumsum (q_curriculum_phases / q_gini pattern):
    per-n_chars class offsets from the bounded histogram + a
    within-class running sum under Window.partitionBy(n_chars) — no
    task ever sorts more than one length class. Integer weights make
    it hash-identical to the naive global window the oracle runs.
    """
    from hadoop_log_analysis_spark.operators.prefix import prefix_weight_classes
    from hadoop_log_analysis_spark.operators.ranking import exact_cumsum

    d = scan(spark, sf_dir, "documents").select(
        "doc_id", "n_chars", F.expr("n_chars div 4").alias("tok")
    )
    tot = d.agg(F.sum("tok").alias("total"))
    keep = prefix_weight_classes(d, "n_chars", "tok", TOKEN_BUDGET_FRAC)
    kept = d.join(F.broadcast(keep), "n_chars")
    return (
        exact_cumsum(
            kept, "n_chars", "doc_id", "tok",
            ascending=False, cumsum_col="cum_tok",
        )
        .crossJoin(F.broadcast(tot))
        .filter(
            F.col("cum_tok") - F.col("tok")
            < TOKEN_BUDGET_FRAC * F.col("total")
        )
        .select("doc_id", "tok", "cum_tok")
        .orderBy(F.desc("n_chars"), "doc_id")
    )


INDEX_QUERY_TERMS = ("join", "window")


@query(
    "q_index_lookup",
    oracle=f"""
        WITH tf AS (SELECT doc_id, tok, count(*) AS tf
                    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                          FROM documents)
                    WHERE tok IN ({", ".join(f"'{t}'" for t in INDEX_QUERY_TERMS)})
                    GROUP BY doc_id, tok)
        SELECT doc_id, count(*) AS n_terms, CAST(sum(tf) AS BIGINT) AS total_tf
        FROM tf
        GROUP BY doc_id
        HAVING count(*) = {len(INDEX_QUERY_TERMS)}
        ORDER BY total_tf DESC, doc_id
        LIMIT 20
    """,
    tags=("L5", "index", "A8"),
)
def q_index_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive (AND) index probe: top-20 documents containing ALL
    query terms, ranked by total term frequency — the lookup side of
    q_inverted_index's build step.

    Scale shape: the term predicate filters the exploded token stream
    BEFORE any aggregation, so the shuffle carries only the query
    terms' postings (|terms| * df rows, not the corpus); the final
    top-20 is TakeOrderedAndProject. Against a PERSISTED index (the
    q_inverted_index output written token-bucketed to parquet) the
    same probe becomes a pushed-down tok-filter scan of two buckets.
    """
    toks = scan(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    )
    tf = (
        toks.filter(F.col("tok").isin(*INDEX_QUERY_TERMS))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("tf"))
    )
    return (
        tf.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_terms"),
            F.sum("tf").alias("total_tf"),
        )
        .filter(F.col("n_terms") == len(INDEX_QUERY_TERMS))
        .orderBy(F.desc("total_tf"), "doc_id")
        .limit(20)
    )


WSAMPLE_K = 25
# The shared cross-engine integer pseudo-random — single definition in
# functions/__init__.py (r4 review: three divergent copies).
WSAMPLE_MULT = HASH_MULT
WSAMPLE_MOD = HASH_MOD


@query(
    "q_weighted_sample",
    oracle=f"""
        WITH u AS (SELECT doc_id, n_chars,
                          (CAST((doc_id % {WSAMPLE_MOD} * {WSAMPLE_MULT}) % {WSAMPLE_MOD} AS DOUBLE)
                           + 1.0) / {WSAMPLE_MOD + 1}.0 AS unit
                   FROM documents
                   WHERE n_chars > 0)
        SELECT doc_id, n_chars,
               round(ln(unit) / n_chars, 8) AS wkey
        FROM u
        ORDER BY wkey DESC, doc_id
        LIMIT {WSAMPLE_K}
    """,
    tags=("L7", "sampling"),
)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis-Spirakis
    exponential keys): each doc draws key = ln(u)/w with u a
    deterministic unit pseudo-random and w its weight (n_chars as the
    quality proxy); the global top-k by key IS a weight-proportional
    sample — the importance-sampling step a curation pipeline uses to
    oversample high-quality documents.

    Determinism discipline: u comes from integer multiplicative
    hashing (doc_id * Knuth-constant mod prime), identical in both
    engines, and the rank key is rounded to 8 decimals before
    ordering so float ln() noise cannot flip ranks; doc_id breaks
    ties. At 100 TB the plan is a map-side key computation +
    TakeOrderedAndProject — no shuffle of the corpus, k rows per
    partition merged on the driver-side reduce.
    """
    docs = scan(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    unit = (
        ((F.col("doc_id") % WSAMPLE_MOD * WSAMPLE_MULT) % WSAMPLE_MOD).cast("double")
        + F.lit(1.0)
    ) / F.lit(float(WSAMPLE_MOD + 1))
    return (
        docs.select(
            "doc_id",
            "n_chars",
            F.round(F.log(unit) / F.col("n_chars"), 8).alias("wkey"),
        )
        .orderBy(F.desc("wkey"), "doc_id")
        .limit(WSAMPLE_K)
    )


@query(
    "q_chunk_dedup",
    oracle=f"""
        WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
             s AS (SELECT doc_id, toks,
                          unnest(generate_series(0, len(toks) - 1, {CHUNK_STRIDE})) AS st
                   FROM t),
             c AS (SELECT doc_id,
                          array_to_string(list_slice(toks, st + 1, st + {CHUNK_LEN}), ' ')
                            AS chunk_text
                   FROM s)
        SELECT chunk_text,
               count(DISTINCT doc_id) AS n_docs,
               count(*) AS n_occurrences
        FROM c
        GROUP BY chunk_text
        HAVING count(DISTINCT doc_id) >= 2
        ORDER BY n_docs DESC, chunk_text
    """,
    tags=("L1", "L5", "chunking", "curation"),
)
def q_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Passage-level dedup report: context-window chunks (q_doc_chunks
    geometry) that recur across >= 2 distinct documents — the
    chunk-granular dedup step run AFTER document-level dedup, because
    distinct documents still share boilerplate passages, quotes, and
    licenses that document hashing cannot see.

    Scale shape: chunking is map-only; the report is a hash agg keyed
    on chunk text (at 100 TB: on sha2(chunk) instead, shuffling
    32-byte keys) with map-side combine. The drop step is the same
    anti-join shape as q_boilerplate_removal's strip.
    """
    t = scan(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    c = t.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.size("toks") - 1, F.lit(CHUNK_STRIDE))
        ).alias("st"),
        "toks",
    ).select(
        "doc_id",
        F.array_join(F.expr(f"slice(toks, st + 1, {CHUNK_LEN})"), " ").alias(
            "chunk_text"
        ),
    )
    return (
        c.groupBy("chunk_text")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count("*").alias("n_occurrences"),
        )
        .filter(F.col("n_docs") >= 2)
        .orderBy(F.desc("n_docs"), "chunk_text")
    )


# Deterministic split: the shared Knuth multiplicative hash
# (functions/__init__.py — cross-engine integer math; neither engine's
# built-in hash appears in an oracle-checked path).
SPLIT_MULT = HASH_MULT
SPLIT_MOD = HASH_MOD
SPLIT_VAL_FRAC = 0.1
SPLIT_TEST_FRAC = 0.1


@query(
    "q_train_val_test_split",
    oracle=f"""
        WITH u AS (SELECT doc_id, source, n_chars,
                          CAST((doc_id % {SPLIT_MOD} * {SPLIT_MULT}) % {SPLIT_MOD} AS DOUBLE)
                              / {SPLIT_MOD} AS unit
                   FROM documents),
         s AS (SELECT CASE WHEN unit < {SPLIT_VAL_FRAC} THEN 'val'
                           WHEN unit < {SPLIT_VAL_FRAC} + {SPLIT_TEST_FRAC}
                                THEN 'test'
                           ELSE 'train' END AS split,
                      n_chars
               FROM u)
        SELECT split, count(*) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS n_chars,
               round(CAST(count(*) AS DOUBLE)
                     / (SELECT count(*) FROM documents), 4) AS frac
        FROM s
        GROUP BY split
        ORDER BY split
    """,
    tags=("L7", "sampling", "curation"),
)
def q_train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split report: each document's
    split is a pure function of its id (multiplicative-hash unit
    random -> 80/10/10 bands), so the assignment is reproducible
    across runs, engines, and re-shards — the property an ML data
    pipeline needs so that re-running ingestion never migrates a
    document across the contamination boundary. Reports per-split
    document count, character volume, and realized fraction.

    Scale shape: split assignment is a map-side expression (no state,
    no shuffle); the report is a 3-group aggregate. The same
    expression, used as a filter, materializes any one split with
    full predicate pushdown on doc_id ranges per parquet row group.
    """
    docs = scan(spark, sf_dir, "documents")
    unit = (
        (F.col("doc_id") % SPLIT_MOD * SPLIT_MULT) % SPLIT_MOD
    ).cast("double") / F.lit(float(SPLIT_MOD))
    split = (
        F.when(unit < SPLIT_VAL_FRAC, "val")
        .when(unit < SPLIT_VAL_FRAC + SPLIT_TEST_FRAC, "test")
        .otherwise("train")
    )
    total = docs.agg(F.count("*").alias("__tot"))
    return (
        docs.select(split.alias("split"), "n_chars")
        .groupBy("split")
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").alias("n_chars"))
        .crossJoin(F.broadcast(total))
        .select(
            "split",
            "n_docs",
            "n_chars",
            F.round(F.col("n_docs").cast("double") / F.col("__tot"), 4).alias(
                "frac"
            ),
        )
        .orderBy("split")
    )


@query(
    "q_data_quality_report",
    oracle="""
        SELECT 'events.event_id unique' AS check_name,
               count(*) AS n_checked,
               count(*) - count(DISTINCT event_id) AS n_violations
        FROM events
        UNION ALL
        SELECT 'events.user_id not null', count(*),
               count(*) - count(user_id)
        FROM events
        UNION ALL
        SELECT 'events.value non-negative', count(*),
               count(*) FILTER (WHERE value < 0)
        FROM events
        UNION ALL
        SELECT 'orders.o_custkey fk customer', count(*),
               count(*) FILTER (WHERE o_custkey NOT IN
                 (SELECT c_custkey FROM customer))
        FROM orders
        UNION ALL
        SELECT 'lineitem.l_orderkey fk orders', count(*),
               count(*) FILTER (WHERE l_orderkey NOT IN
                 (SELECT o_orderkey FROM orders))
        FROM lineitem
        UNION ALL
        SELECT 'documents.text non-empty', count(*),
               count(*) FILTER (WHERE text IS NULL OR length(text) = 0)
        FROM documents
        ORDER BY check_name
    """,
    tags=("A2", "J4", "dq", "curation"),
)
def q_data_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality gate: the assertion battery a pipeline runs before
    promoting a batch — uniqueness, not-null, value-domain, and
    referential-integrity checks, one row per check with checked and
    violating counts (promote iff every n_violations is 0).

    Each check is a single-pass aggregate; the two FK checks count
    probe rows whose key misses the dimension — expressed as
    dimension-count joins so the dimension side is hashed once
    (broadcast when it fits; shuffled hash join at 100 TB) instead of
    a per-row subquery. All six checks share no state, so Spark runs
    the unioned plan's scans concurrently; the output is
    check-count-bounded (6 rows) regardless of data size.
    """
    ev = scan(spark, sf_dir, "events")
    orders = scan(spark, sf_dir, "orders")
    li = scan(spark, sf_dir, "lineitem")
    docs = scan(spark, sf_dir, "documents")
    cust = scan(spark, sf_dir, "customer")

    def check(name, df, violated):
        return df.agg(
            F.lit(name).alias("check_name"),
            F.count("*").alias("n_checked"),
            F.count(F.when(violated, 1)).alias("n_violations"),
        ).select("check_name", "n_checked", "n_violations")

    uniq = ev.agg(
        F.lit("events.event_id unique").alias("check_name"),
        F.count("*").alias("n_checked"),
        (F.count("*") - F.countDistinct("event_id")).alias("n_violations"),
    ).select("check_name", "n_checked", "n_violations")
    notnull = check(
        "events.user_id not null", ev, F.col("user_id").isNull()
    )
    domain = check("events.value non-negative", ev, F.col("value") < 0)
    fk_orders = check(
        "orders.o_custkey fk customer",
        orders.join(
            F.broadcast(
                cust.select(F.col("c_custkey").alias("o_custkey")).distinct()
                .withColumn("dim_hit", F.lit(1))
            ),
            "o_custkey",
            "left",
        ),
        F.col("dim_hit").isNull(),
    )
    fk_line = check(
        "lineitem.l_orderkey fk orders",
        li.join(
            orders.select(F.col("o_orderkey").alias("l_orderkey")).distinct()
            .withColumn("dim_hit", F.lit(1)),
            "l_orderkey",
            "left",
        ),
        F.col("dim_hit").isNull(),
    )
    empty = check(
        "documents.text non-empty",
        docs,
        F.col("text").isNull() | (F.length("text") == 0),
    )
    return (
        uniq.unionByName(notnull)
        .unionByName(domain)
        .unionByName(fk_orders)
        .unionByName(fk_line)
        .unionByName(empty)
        .orderBy("check_name")
    )


@query(
    "q_scd2_build",
    oracle="""
        WITH o AS (
          SELECT user_id, event_type, event_id,
                 epoch_ns(ts) // 1000 AS t_us,
                 CASE WHEN event_type = lag(event_type)
                        OVER (PARTITION BY user_id
                              ORDER BY epoch_ns(ts) // 1000, event_id)
                      THEN 0 ELSE 1 END AS chg
          FROM events),
        g AS (
          SELECT user_id, event_type, t_us,
                 sum(chg) OVER (PARTITION BY user_id
                                ORDER BY t_us, event_id
                                ROWS UNBOUNDED PRECEDING) AS grp
          FROM o),
        runs AS (
          SELECT user_id, event_type, grp,
                 min(t_us) AS valid_from_us
          FROM g GROUP BY user_id, event_type, grp)
        SELECT user_id, event_type,
               valid_from_us,
               lead(valid_from_us)
                 OVER (PARTITION BY user_id ORDER BY valid_from_us)
                 AS valid_to_us,
               (lead(valid_from_us)
                 OVER (PARTITION BY user_id ORDER BY valid_from_us) IS NULL)
                 AS is_current
        FROM runs
        ORDER BY user_id, valid_from_us
    """,
    tags=("W3", "W6", "cdc", "scd2"),
)
def q_scd2_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing-dimension build from an event log: each
    user's consecutive run of the same event_type becomes one
    versioned dimension row with [valid_from, valid_to) validity and
    an is_current flag on the open tail — the CDC-to-warehouse
    pattern that turns append-only logs into point-in-time joinable
    dimensions (the as-of join J7 is its natural consumer).

    Classic gaps-and-islands: change flags via lag, run ids via
    running sum, one aggregate per run, then lead() stitches each
    run's end to the next run's start so validity intervals tile each
    user's timeline with no gaps or overlaps by construction. All
    windows partition by user_id — fully parallel across users, state
    bounded by one user's history (the same partitioning contract as
    sessionization W6). Validity bounds cross the engine boundary as
    epoch-microsecond bigints (ts_ns // 1000), the repo's cross-engine
    time discipline.
    """
    out = _scd2_dimension(spark, sf_dir).withColumn(
        "is_current", F.col("valid_to_us").isNull()
    )
    return out.orderBy("user_id", "valid_from_us")


def _scd2_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared SCD2 run-builder: (user_id, event_type, valid_from_us,
    valid_to_us-nullable) versioned rows tiling each user's timeline.
    One definition feeding both q_scd2_build (the build) and
    q_scd2_point_in_time (the consumer) so the validity semantics
    cannot drift between producer and consumer (the _support_edges
    discipline)."""
    ev = scan(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        "event_id",
        F.expr("ts_ns div 1000").alias("t_us"),
    )
    # Every window that can see same-µs ties carries event_id as the
    # tie-break, on BOTH engines — determinism by contract, not by the
    # fixture's ns spacing (r4 review finding).
    wo = Window.partitionBy("user_id").orderBy("t_us", "event_id")
    o = ev.select(
        "user_id",
        "event_type",
        "event_id",
        "t_us",
        F.when(
            F.col("event_type") == F.lag("event_type").over(wo), 0
        ).otherwise(1).alias("chg"),
    )
    wg = (
        Window.partitionBy("user_id")
        .orderBy("t_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    g = o.withColumn("grp", F.sum("chg").over(wg))
    runs = g.groupBy("user_id", "event_type", "grp").agg(
        F.min("t_us").alias("valid_from_us")
    )
    wl = Window.partitionBy("user_id").orderBy("valid_from_us")
    return runs.select(
        "user_id",
        "event_type",
        "valid_from_us",
        F.lead("valid_from_us").over(wl).alias("valid_to_us"),
    )


@query(
    "q_rrf_fusion",
    oracle=f"""
        WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
             d AS (SELECT doc_id, len(toks) AS dl, unnest(toks) AS tok FROM t),
             tf AS (SELECT doc_id, dl, tok, count(*) AS tf FROM d
                    WHERE tok IN ('join', 'window', 'merge')
                    GROUP BY doc_id, dl, tok),
             dfreq AS (SELECT tok, count(DISTINCT doc_id) AS df FROM tf GROUP BY tok),
             s AS (SELECT count(*) AS n_docs, avg(len(toks)) AS avgdl FROM t),
             lex AS (
               SELECT doc_id,
                      CAST(sum(CAST(floor(
                            (ln((n_docs - df + 0.5) / (df + 0.5) + 1)
                                * (tf * ({BM25_K1} + 1))
                                / (tf + {BM25_K1} * (1 - {BM25_B}
                                   + {BM25_B} * dl / avgdl)))
                            * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
                        / 1000000.0 AS bm25
               FROM tf JOIN dfreq USING (tok), s
               GROUP BY doc_id
               ORDER BY bm25 DESC, doc_id
               LIMIT 50),
             lexr AS (
               SELECT doc_id,
                      row_number() OVER (ORDER BY bm25 DESC, doc_id) AS lex_rank
               FROM lex),
             q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
                   FROM embeddings WHERE vec_id = 0),
             vec AS (
               SELECT vec_id AS doc_id,
                      round(list_cosine_similarity(
                              CAST(embedding AS DOUBLE[]), qv), 6) AS cos
               FROM embeddings, q
               ORDER BY cos DESC, doc_id
               LIMIT 50),
             vecr AS (
               SELECT doc_id,
                      row_number() OVER (ORDER BY cos DESC, doc_id) AS vec_rank
               FROM vec),
             fused AS (
               SELECT coalesce(l.doc_id, v.doc_id) AS doc_id,
                      l.lex_rank, v.vec_rank,
                      round(coalesce(1.0 / (60 + l.lex_rank), 0)
                            + coalesce(1.0 / (60 + v.vec_rank), 0), 6) AS rrf
               FROM lexr l FULL OUTER JOIN vecr v USING (doc_id))
        SELECT doc_id,
               CAST(lex_rank AS BIGINT) AS lex_rank,
               CAST(vec_rank AS BIGINT) AS vec_rank,
               rrf
        FROM fused
        ORDER BY rrf DESC, doc_id
        LIMIT 20
    """,
    tags=("L3", "L5", "ranking", "fusion"),
)
def q_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval via Reciprocal Rank Fusion: the BM25 lexical
    top-50 and the embedding-cosine top-50 (query = doc 0's vector,
    docs <-> vectors 1:1 by id in this corpus) are fused with
    RRF(k=60) = sum 1/(60 + rank), the standard score-free list fusion
    every hybrid search stack ships.

    Scale contract: ranks are assigned INSIDE each retriever's top-50
    candidate list, never over the corpus — each list arrives via a
    bounded TakeOrdered, the rank windows run over 50 rows, and the
    fusion is a full-outer join of two 50-row lists. The corpus-scale
    work is exactly one BM25 pass (term-filtered, broadcast stats) and
    one cosine scan (or its IVF-probed variant at 100 TB: swap
    cosine_topk for ivf_probe, the fusion is unchanged). Scores are
    rounded BEFORE ranking on both engines so rank ties cannot diverge
    on 1e-15 float noise.
    """
    from pyspark.sql import Window
    from hadoop_log_analysis_spark.operators.similarity import cosine

    t = scan(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    stats = t.agg(
        F.count("*").alias("n_docs"), F.avg(F.size("toks")).alias("avgdl")
    )
    tf = (
        t.select(
            "doc_id", F.size("toks").alias("dl"), F.explode("toks").alias("tok")
        )
        .filter(F.col("tok").isin(*BM25_TERMS))
        .groupBy("doc_id", "dl", "tok")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("tok").agg(F.countDistinct("doc_id").alias("df"))
    idf = F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1)
    term_score = idf * (F.col("tf") * (BM25_K1 + 1)) / (
        F.col("tf")
        + BM25_K1 * (1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
    )
    lex = (
        tf.join(F.broadcast(dfreq), "tok")
        .crossJoin(F.broadcast(stats))
        .withColumn("ts_", term_score)
        .groupBy("doc_id")
        .agg(exact_sum("ts_", 6).alias("bm25"))
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(50)
    )
    w_lex = Window.orderBy(F.desc("bm25"), "doc_id")  # 50-row list
    lexr = lex.select(
        "doc_id", F.row_number().over(w_lex).alias("lex_rank")
    )

    emb = scan(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("__qvec")
    )
    vec = (
        emb.crossJoin(F.broadcast(qv))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(cosine(F.col("embedding"), F.col("__qvec")), 6).alias(
                "cos"
            ),
        )
        .orderBy(F.desc("cos"), "doc_id")
        .limit(50)
    )
    w_vec = Window.orderBy(F.desc("cos"), "doc_id")  # 50-row list
    vecr = vec.select(
        "doc_id", F.row_number().over(w_vec).alias("vec_rank")
    )

    fused = lexr.join(vecr, "doc_id", "full_outer").select(
        "doc_id",
        F.col("lex_rank").cast("long").alias("lex_rank"),
        F.col("vec_rank").cast("long").alias("vec_rank"),
        F.round(
            F.coalesce(1.0 / (60 + F.col("lex_rank")), F.lit(0.0))
            + F.coalesce(1.0 / (60 + F.col("vec_rank")), F.lit(0.0)),
            6,
        ).alias("rrf"),
    )
    return fused.orderBy(F.desc("rrf"), "doc_id").limit(20)


@query(
    "q_ndcg_eval",
    oracle=f"""
        WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv, label AS qlabel
                   FROM embeddings WHERE vec_id = 0),
             rel AS (SELECT vec_id AS doc_id,
                            CASE WHEN label = (SELECT qlabel FROM q)
                                 THEN 1 ELSE 0 END AS rel
                     FROM embeddings WHERE vec_id <> 0),
             n_rel AS (SELECT CAST(sum(rel) AS BIGINT) AS r FROM rel),
             vec AS (
               SELECT vec_id AS doc_id,
                      round(list_cosine_similarity(
                              CAST(embedding AS DOUBLE[]), qv), 6) AS score
               FROM embeddings, q WHERE vec_id <> 0
               ORDER BY score DESC, doc_id LIMIT 10),
             ranked AS (
               SELECT doc_id,
                      row_number() OVER (ORDER BY score DESC, doc_id) AS rnk
               FROM vec),
             dcg AS (
               SELECT sum(rel / log2(rnk + 1.0)) AS dcg,
                      CAST(sum(rel) AS BIGINT) AS hits
               FROM ranked JOIN rel USING (doc_id)),
             idcg AS (
               SELECT sum(1.0 / log2(i + 1.0)) AS idcg
               FROM n_rel, unnest(generate_series(1, CAST(least(r, 10) AS INTEGER))) t(i))
        SELECT 'cosine' AS retriever,
               hits AS hits_at_10,
               round(hits * 1.0 / 10, 4) AS precision_at_10,
               round(hits * 1.0 / r, 4) AS recall_at_10,
               round(dcg / idcg, 6) AS ndcg_at_10
        FROM dcg, idcg, n_rel
    """,
    tags=("L3", "ranking", "eval"),
)
def q_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality evaluation: NDCG@10 / precision@10 /
    recall@10 of the cosine retriever against label ground truth (a
    result is relevant iff it carries the query vector's label; the
    query doc itself is excluded) — the offline eval loop every
    embedding model ships with.

    Scale contract mirrors q_rrf_fusion: the corpus-scale work is ONE
    scored scan reduced by TakeOrdered(10); ranks, the relevance join
    and the DCG sum all run on the 10-row candidate list; the ideal
    DCG needs only the scalar relevant-count. Scores are rounded
    before ranking so cross-engine rank ties cannot diverge.
    """
    from pyspark.sql import Window
    from hadoop_log_analysis_spark.operators.similarity import cosine

    emb = scan(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("__qvec"), F.col("label").alias("qlabel")
    )
    rel = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q.select("qlabel")))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.when(F.col("label") == F.col("qlabel"), 1)
            .otherwise(0)
            .alias("rel"),
        )
    )
    n_rel = rel.agg(F.sum("rel").cast("long").alias("r"))
    vec = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q.select("__qvec")))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(cosine(F.col("embedding"), F.col("__qvec")), 6).alias(
                "score"
            ),
        )
        .orderBy(F.desc("score"), "doc_id")
        .limit(10)
    )
    ranked = vec.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("score"), "doc_id"))
        .alias("rnk"),
    )
    dcg = (
        ranked.join(rel, "doc_id")
        .agg(
            F.sum(F.col("rel") / F.log2(F.col("rnk") + 1.0)).alias("dcg"),
            F.sum("rel").cast("long").alias("hits"),
        )
    )
    idcg = (
        n_rel.select(
            F.explode(
                F.sequence(F.lit(1), F.least(F.col("r"), F.lit(10)).cast("int"))
            ).alias("i")
        )
        .agg(F.sum(1.0 / F.log2(F.col("i") + 1.0)).alias("idcg"))
    )
    return (
        dcg.crossJoin(F.broadcast(idcg))
        .crossJoin(F.broadcast(n_rel))
        .select(
            F.lit("cosine").alias("retriever"),
            F.col("hits").alias("hits_at_10"),
            F.round(F.col("hits") / 10, 4).alias("precision_at_10"),
            F.round(F.col("hits") / F.col("r"), 4).alias("recall_at_10"),
            F.round(F.col("dcg") / F.col("idcg"), 6).alias("ndcg_at_10"),
        )
    )


@query(
    "q_rocchio_feedback",
    oracle="""
        WITH q0 AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
                    FROM embeddings WHERE vec_id = 0),
        fb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings, q0
               WHERE vec_id <> 0
               ORDER BY round(list_cosine_similarity(
                           CAST(embedding AS DOUBLE[]), qv), 6)
                          DESC, vec_id
               LIMIT 10),
        dims AS (SELECT u.i, avg(fb.v[u.i]) AS m
                 FROM fb, (SELECT unnest(range(1, len(qv) + 1)) AS i
                           FROM q0) u
                 GROUP BY u.i),
        cent AS (SELECT list(m ORDER BY i) AS cv FROM dims),
        q1 AS (SELECT list_transform(range(1, len(qv) + 1),
                                     i -> qv[i] + 0.75 * cv[i]) AS q1v
               FROM q0, cent),
        scored AS (SELECT e.vec_id,
                          round(list_cosine_similarity(
                                  CAST(e.embedding AS DOUBLE[]), q1v),
                                6) AS sim_new
                   FROM embeddings e, q1 WHERE e.vec_id <> 0)
        SELECT vec_id, sim_new,
               vec_id IN (SELECT vec_id FROM fb) AS was_feedback
        FROM scored
        ORDER BY sim_new DESC, vec_id
        LIMIT 10
    """,
    tags=("L3", "ranking"),
)
def q_rocchio_feedback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pseudo-relevance feedback (Rocchio): retrieve the cosine top-10
    for query vector 0, move the query toward their centroid
    (q1 = q0 + 0.75 * mean(feedback vectors)), and re-retrieve with
    the expanded query — the classic one-round query-expansion loop,
    with a flag showing which of the final top-10 were already in the
    feedback set.

    Fully declarative — no driver iteration: feedback set via
    TakeOrdered (bounded k), per-dimension centroid via posexplode of
    the 10-row feedback set, the expanded query assembled with an
    order-pinned collect_list(struct(pos, m)) and zip_with, then one
    more broadcast scan-and-score pass. The corpus is scanned exactly
    twice and never shuffled; everything between the two scans is
    k x dims sized.
    """
    emb = scan(spark, sf_dir, "embeddings").select(
        "vec_id", F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("v")
    )
    q0 = emb.filter(F.col("vec_id") == 0).select(F.col("v").alias("qv"))
    scored0 = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q0))
        .select(
            "vec_id",
            "v",
            "qv",
            F.round(
                SIM.dot(F.col("v"), F.col("qv"))
                / (SIM.norm(F.col("v")) * SIM.norm(F.col("qv"))),
                6,
            ).alias("s0"),
        )
    )
    fb = scored0.orderBy(F.desc("s0"), "vec_id").limit(10)
    cent = (
        fb.select(F.posexplode("v").alias("pos", "x"))
        .groupBy("pos")
        .agg(F.avg("x").alias("m"))
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))),
                lambda s: s.m,
            ).alias("cv")
        )
    )
    q1 = (
        q0.crossJoin(F.broadcast(cent))
        .select(F.zip_with("qv", "cv", lambda a, b: a + 0.75 * b).alias("q1v"))
    )
    # Both the top-10 selection and the output order run on the 6-dp
    # ROUNDED similarity (with the vec_id tie-break) in BOTH engines —
    # ranking on the unrounded value would let two candidates whose
    # sims differ only past 6 dp order differently per engine
    # (fold-based dot/norm here vs DuckDB list arithmetic; ADVICE r4).
    return (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q1))
        .select(
            "vec_id",
            F.round(
                SIM.dot(F.col("v"), F.col("q1v"))
                / (SIM.norm(F.col("v")) * SIM.norm(F.col("q1v"))),
                6,
            ).alias("sim_new"),
        )
        .orderBy(F.desc("sim_new"), "vec_id")
        .limit(10)
        .join(
            F.broadcast(fb.select("vec_id", F.lit(True).alias("fb_hit"))),
            "vec_id",
            "left",
        )
        .select(
            "vec_id",
            "sim_new",
            F.coalesce("fb_hit", F.lit(False)).alias("was_feedback"),
        )
        .orderBy(F.desc("sim_new"), "vec_id")
    )


@query(
    "q_mmr_rerank",
    oracle="""
        WITH q0 AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
                    FROM embeddings WHERE vec_id = 0),
        cands AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
                         round(list_cosine_similarity(
                                 CAST(embedding AS DOUBLE[]), qv), 6) AS rel
                  FROM embeddings, q0
                  WHERE vec_id <> 0
                  ORDER BY list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                                  qv) DESC, vec_id
                  LIMIT 10),
        pw AS (SELECT a.vec_id AS ai, b.vec_id AS bi,
                      round(list_cosine_similarity(a.v, b.v), 6) AS s
               FROM cands a JOIN cands b ON a.vec_id <> b.vec_id),
        s1 AS (SELECT vec_id, rel, rel AS score FROM cands
               ORDER BY rel DESC, vec_id LIMIT 1),
        sel1 AS (SELECT vec_id FROM s1),
        s2 AS (SELECT c.vec_id, c.rel,
                      0.7 * c.rel - 0.3 * max(p.s) AS score
               FROM cands c JOIN pw p ON p.ai = c.vec_id
                                     AND p.bi IN (SELECT vec_id FROM sel1)
               WHERE c.vec_id NOT IN (SELECT vec_id FROM sel1)
               GROUP BY c.vec_id, c.rel
               ORDER BY score DESC, c.vec_id LIMIT 1),
        sel2 AS (SELECT vec_id FROM sel1 UNION ALL SELECT vec_id FROM s2),
        s3 AS (SELECT c.vec_id, c.rel,
                      0.7 * c.rel - 0.3 * max(p.s) AS score
               FROM cands c JOIN pw p ON p.ai = c.vec_id
                                     AND p.bi IN (SELECT vec_id FROM sel2)
               WHERE c.vec_id NOT IN (SELECT vec_id FROM sel2)
               GROUP BY c.vec_id, c.rel
               ORDER BY score DESC, c.vec_id LIMIT 1),
        sel3 AS (SELECT vec_id FROM sel2 UNION ALL SELECT vec_id FROM s3),
        s4 AS (SELECT c.vec_id, c.rel,
                      0.7 * c.rel - 0.3 * max(p.s) AS score
               FROM cands c JOIN pw p ON p.ai = c.vec_id
                                     AND p.bi IN (SELECT vec_id FROM sel3)
               WHERE c.vec_id NOT IN (SELECT vec_id FROM sel3)
               GROUP BY c.vec_id, c.rel
               ORDER BY score DESC, c.vec_id LIMIT 1),
        sel4 AS (SELECT vec_id FROM sel3 UNION ALL SELECT vec_id FROM s4),
        s5 AS (SELECT c.vec_id, c.rel,
                      0.7 * c.rel - 0.3 * max(p.s) AS score
               FROM cands c JOIN pw p ON p.ai = c.vec_id
                                     AND p.bi IN (SELECT vec_id FROM sel4)
               WHERE c.vec_id NOT IN (SELECT vec_id FROM sel4)
               GROUP BY c.vec_id, c.rel
               ORDER BY score DESC, c.vec_id LIMIT 1)
        SELECT rank, vec_id, rel AS relevance, round(score, 6) AS mmr_score
        FROM (SELECT 1 AS rank, vec_id, rel, score FROM s1
              UNION ALL SELECT 2, vec_id, rel, score FROM s2
              UNION ALL SELECT 3, vec_id, rel, score FROM s3
              UNION ALL SELECT 4, vec_id, rel, score FROM s4
              UNION ALL SELECT 5, vec_id, rel, score FROM s5)
        ORDER BY rank
    """,
    tags=("L3", "ranking"),
)
def q_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance diversified re-rank: from the cosine
    top-10 candidates for query vector 0, greedily select 5 results
    maximizing ``0.7 * relevance - 0.3 * max-sim-to-already-selected``
    — the standard redundancy-penalized re-rank between retrieval and
    consumption (step 1 is pure relevance; ties break on id).

    The greedy recurrence is sequential BY DEFINITION, so the engine
    bounds it instead of distributing it: candidates arrive via ONE
    corpus-scale TakeOrdered (k rows), the pairwise-similarity table
    is k x k, and each of the 5 selection steps is an argmax over
    <= k rows (driver-side scalar per step, like the BPE trainer's
    per-round argmax — k-bounded, never corpus-bounded). Relevance
    and pairwise sims are rounded to 6 dp BEFORE the greedy
    arithmetic on both engines, so the cross-engine argmax is exact,
    not FP-luck. The oracle unrolls all five steps in SQL.
    """
    emb = scan(spark, sf_dir, "embeddings").select(
        "vec_id", F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("v")
    )
    q0 = emb.filter(F.col("vec_id") == 0).select(F.col("v").alias("qv"))
    cands = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q0))
        .select(
            "vec_id",
            "v",
            (
                SIM.dot(F.col("v"), F.col("qv"))
                / (SIM.norm(F.col("v")) * SIM.norm(F.col("qv")))
            ).alias("s_raw"),
        )
        .orderBy(F.desc("s_raw"), "vec_id")
        .limit(10)
        .select("vec_id", "v", F.round("s_raw", 6).alias("rel"))
        .localCheckpoint(eager=True)  # k rows; cut the TakeOrdered lineage
    )
    a, b = cands.alias("a"), cands.alias("b")
    pw = (
        a.join(b, F.col("a.vec_id") != F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("ai"),
            F.col("b.vec_id").alias("bi"),
            F.round(
                SIM.dot(F.col("a.v"), F.col("b.v"))
                / (SIM.norm(F.col("a.v")) * SIM.norm(F.col("b.v"))),
                6,
            ).alias("s"),
        )
        .localCheckpoint(eager=True)  # k*(k-1) rows
    )
    picks: list[tuple[int, int, float, float]] = []
    selected: list[int] = []
    for rank in range(1, 6):
        if not selected:
            head = cands.orderBy(F.desc("rel"), "vec_id").limit(1).collect()
            if not head:  # empty corpus -> empty (schema-stable) result
                break
            r0 = head[0]
            picks.append((rank, r0["vec_id"], float(r0["rel"]), float(r0["rel"])))
        else:
            scored = (
                cands.filter(~F.col("vec_id").isin(selected))
                .join(
                    pw.filter(F.col("bi").isin(selected)),
                    F.col("vec_id") == F.col("ai"),
                )
                .groupBy("vec_id", "rel")
                .agg((0.7 * F.col("rel") - 0.3 * F.max("s")).alias("score"))
                .orderBy(F.desc("score"), "vec_id")
                .limit(1)
                .collect()
            )
            if not scored:  # fewer candidates than the target k
                break
            r0 = scored[0]
            picks.append(
                (rank, r0["vec_id"], float(r0["rel"]), float(r0["score"]))
            )
        selected.append(picks[-1][1])
    out = spark.createDataFrame(
        picks, "rank int, vec_id bigint, relevance double, mmr_score double"
    )
    return out.select(
        "rank", "vec_id", "relevance", F.round("mmr_score", 6).alias("mmr_score")
    ).orderBy("rank")


@query(
    "q_scd2_point_in_time",
    oracle="""
        WITH o AS (
          SELECT user_id, event_type, event_id,
                 epoch_ns(ts) // 1000 AS t_us,
                 CASE WHEN event_type = lag(event_type)
                        OVER (PARTITION BY user_id
                              ORDER BY epoch_ns(ts) // 1000, event_id)
                      THEN 0 ELSE 1 END AS chg
          FROM events),
        g AS (
          SELECT user_id, event_type, t_us,
                 sum(chg) OVER (PARTITION BY user_id
                                ORDER BY t_us, event_id
                                ROWS UNBOUNDED PRECEDING) AS grp
          FROM o),
        runs AS (
          SELECT user_id, event_type, grp,
                 min(t_us) AS valid_from_us
          FROM g GROUP BY user_id, event_type, grp),
        dim AS (
          SELECT user_id, event_type, valid_from_us,
                 lead(valid_from_us)
                   OVER (PARTITION BY user_id ORDER BY valid_from_us)
                   AS valid_to_us
          FROM runs),
        p AS (SELECT user_id,
                     epoch_ns(ts) // 1000 + 1800000000 AS t
              FROM events)
        SELECT d.event_type AS state_type,
               CAST(count(*) AS BIGINT) AS n_probes,
               CAST(count(DISTINCT d.user_id) AS BIGINT) AS n_users
        FROM p JOIN dim d
          ON d.user_id = p.user_id
         AND d.valid_from_us <= p.t
         AND (p.t < d.valid_to_us OR d.valid_to_us IS NULL)
        GROUP BY 1
        ORDER BY 1
    """,
    tags=("J6", "W3", "scd2", "cdc"),
)
def q_scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join against the SCD2 dimension — the consumer
    side of q_scd2_build (same shared run-builder, _scd2_dimension):
    for every probe instant "30 minutes after each event", find the
    dimension row VALID at that instant (valid_from <= t < valid_to,
    open tail matches everything after) and count probes per state.
    Because the SCD2 rows tile each user's timeline with no gaps or
    overlaps by construction, every probe matches exactly ONE row —
    sum(n_probes) == |events|, the tiling invariant made observable.

    This is the warehouse pattern behind "what plan/state was the
    account on when X happened": an interval join keyed by the entity
    id. Spark plans it as an equi-join on user_id with the validity
    range as a post-join filter — per-user dimension rows are few, so
    the filter scans a bounded run list per probe; at 100 TB broadcast
    the dimension if it fits, else both sides shuffle on the SAME
    user_id key the SCD2 build already partitioned by (co-located,
    AQE-coalesced).
    """
    dim = _scd2_dimension(spark, sf_dir)
    probes = scan(spark, sf_dir, "events").select(
        "user_id",
        (F.expr("ts_ns div 1000") + F.lit(1_800_000_000)).alias("t"),
    )
    d, p = dim.alias("d"), probes.alias("p")
    return (
        p.join(
            d,
            (F.col("d.user_id") == F.col("p.user_id"))
            & (F.col("d.valid_from_us") <= F.col("p.t"))
            & (
                (F.col("p.t") < F.col("d.valid_to_us"))
                | F.col("d.valid_to_us").isNull()
            ),
        )
        .groupBy(F.col("d.event_type").alias("state_type"))
        .agg(
            F.count("*").cast("long").alias("n_probes"),
            F.countDistinct("d.user_id").cast("long").alias("n_users"),
        )
        .orderBy("state_type")
    )


@query(
    "q_mrr_eval",
    oracle="""
        WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv,
                          label AS qlabel
                   FROM embeddings
                   WHERE vec_id < 20 AND embedding IS NOT NULL),
        scored AS (
          SELECT q.qid, q.qlabel, e.vec_id AS doc_id, e.label,
                 round(list_cosine_similarity(
                         CAST(e.embedding AS DOUBLE[]), q.qv), 6) AS score
          FROM embeddings e CROSS JOIN q
          WHERE e.vec_id >= 20 AND e.embedding IS NOT NULL),
        best AS (
          SELECT qid, doc_id AS bdoc, score AS bscore
          FROM (SELECT qid, doc_id, score,
                       row_number() OVER (PARTITION BY qid
                                          ORDER BY score DESC, doc_id)
                         AS rn
                FROM scored WHERE label = qlabel)
          WHERE rn = 1),
        ranked AS (
          SELECT b.qid, b.bdoc,
                 1 + count(s.doc_id) FILTER (
                       s.score > b.bscore
                       OR (s.score = b.bscore AND s.doc_id < b.bdoc))
                   AS rnk
          FROM best b JOIN scored s ON s.qid = b.qid
          GROUP BY b.qid, b.bdoc)
        SELECT q.qid,
               CAST(coalesce(r.rnk, 0) AS BIGINT) AS first_rel_rank,
               round(CASE WHEN r.rnk IS NOT NULL AND r.rnk <= 10
                          THEN 1.0 / r.rnk ELSE 0.0 END, 6) AS rr_at_10
        FROM q LEFT JOIN ranked r ON r.qid = q.qid
        ORDER BY q.qid
    """,
    tags=("L3", "ranking", "eval"),
)
def q_mrr_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch retrieval eval, MRR@10: twenty query vectors (vec_id<20)
    each retrieve from the remaining corpus by cosine; per query, the
    rank of the FIRST same-label result and its reciprocal rank
    (0 when the first relevant sits past rank 10 or no relevant doc
    exists) — the multi-query complement of q_ndcg_eval's single-query
    deep-dive, and the shape every eval harness actually runs (a
    query SET, not one probe).

    Rank-without-sorting: the first relevant hit is an argmax over
    the relevant subset (max of (score, -doc_id) structs — one
    hash-agg), and its rank is 1 + the COUNT of corpus docs scoring
    strictly better under the (score desc, doc_id asc) tie order —
    another hash-agg. No per-query top-k sort, no window over the
    scored corpus; both shuffles are bounded by |queries| x |corpus|
    scored ROWS reduced map-side to |queries| groups. Scores are
    rounded to 6 dp before comparison so cross-engine rank ties
    cannot diverge. At production scale the corpus side is an ANN
    candidate list (q_ann_ivf) instead of the full table; the eval
    algebra here is unchanged.
    """
    # NULL-vector rows are excluded on BOTH engines: a NULL cosine
    # would rank under engine-specific NULL-ordering rules (latent —
    # current fixtures carry no NULL embeddings).
    emb = scan(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    q = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qv"),
        F.col("label").alias("qlabel"),
    )
    scored = (
        emb.filter(F.col("vec_id") >= 20)
        .crossJoin(F.broadcast(q))
        .select(
            "qid",
            "qlabel",
            F.col("vec_id").alias("doc_id"),
            "label",
            F.round(SIM.cosine(F.col("embedding"), F.col("qv")), 6).alias(
                "score"
            ),
        )
    )
    best = (
        scored.filter(F.col("label") == F.col("qlabel"))
        .groupBy("qid")
        .agg(
            F.max(
                F.struct(
                    F.col("score").alias("s"), (-F.col("doc_id")).alias("nd")
                )
            ).alias("m")
        )
        .select(
            "qid",
            F.col("m.s").alias("bscore"),
            (-F.col("m.nd")).alias("bdoc"),
        )
    )
    ranked = (
        scored.join(F.broadcast(best), "qid")
        .filter(
            (F.col("score") > F.col("bscore"))
            | (
                (F.col("score") == F.col("bscore"))
                & (F.col("doc_id") < F.col("bdoc"))
            )
        )
        .groupBy("qid")
        .agg((F.count("*") + 1).alias("rnk"))
        # queries whose best hit is rank 1 have ZERO better rows and
        # drop out of the filter+agg — restore them from `best`.
        .join(best.select("qid"), "qid", "right")
        .select("qid", F.coalesce("rnk", F.lit(1)).alias("rnk"))
    )
    return (
        q.select("qid")
        .join(ranked, "qid", "left")
        .select(
            "qid",
            F.coalesce("rnk", F.lit(0)).cast("long").alias("first_rel_rank"),
            F.round(
                F.when(
                    F.col("rnk").isNotNull() & (F.col("rnk") <= 10),
                    1.0 / F.col("rnk"),
                ).otherwise(0.0),
                6,
            ).alias("rr_at_10"),
        )
        .orderBy("qid")
    )


# --- Point-in-time feature backfill ---------------------------------------
PIT_CUTOFF_DAYS = (10, 20, 30)  # cutoffs: min_ts + k days


@query(
    "q_feature_backfill",
    oracle=f"""
        WITH b AS (SELECT min(epoch_ns(ts)) AS t0 FROM events),
        cut AS (
          SELECT unnest([{', '.join(str(d) for d in PIT_CUTOFF_DAYS)}])
                   AS cutoff_day),
        ec AS (
          SELECT e.user_id, c.cutoff_day,
                 epoch_ns(e.ts) AS ns, e.event_id, e.value
          FROM events e
          CROSS JOIN b
          CROSS JOIN cut c
          WHERE epoch_ns(e.ts)
                <= b.t0 + c.cutoff_day * 86400000000000),
        agg AS (
          SELECT user_id, cutoff_day,
                 count(*) AS n_events,
                 max((ns // 1000) * 100 + event_id % 100) AS last_key
          FROM ec GROUP BY user_id, cutoff_day)
        SELECT a.user_id, CAST(a.cutoff_day AS INT) AS cutoff_day,
               CAST(a.n_events AS BIGINT) AS n_events,
               round(max(e.value), 2) AS last_value
        FROM agg a
        JOIN ec e ON e.user_id = a.user_id
                 AND e.cutoff_day = a.cutoff_day
                 AND (e.ns // 1000) * 100 + e.event_id % 100 = a.last_key
        GROUP BY a.user_id, a.cutoff_day, a.n_events
        ORDER BY a.user_id, a.cutoff_day
    """,
    tags=("J7", "A1", "training-data", "pipeline"),
)
def q_feature_backfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time feature backfill (the feature-store training-set
    join): for every user and every training cutoff (3 snapshot dates),
    the event count and LAST event value as of that cutoff — computed
    without leakage: only events at-or-before each cutoff contribute.
    Getting this wrong (using current features for past labels) is the
    classic silent train-serve skew; the PIT join is the fix.

    Scale shape: the fact table fans out by |cutoffs| (x3 — bounded,
    NOT a window over event history per cutoff), then ONE hash agg per
    (user, cutoff) computes the count and the argmax key in the same
    pass; the last value resolves via max_by on a collision-proofed
    key (µs * 100 + event_id mod 100 — the repo's standard sub-µs
    fold, deterministic under same-µs ties where raw max_by
    tie-breaking is engine-defined, and safely inside int64). At
    many cutoffs, replace the fan-out with an as-of join per cutoff
    batch (operators/joins.asof_join).
    """
    b = scan(spark, sf_dir, "events").agg(F.min("ts_ns").alias("t0"))
    cut = spark.createDataFrame(
        [(d,) for d in PIT_CUTOFF_DAYS], "cutoff_day int"
    )
    ev = scan(spark, sf_dir, "events").select(
        "user_id", "ts_ns", "event_id", "value"
    )
    ec = (
        ev.crossJoin(F.broadcast(b))
        .crossJoin(F.broadcast(cut))
        .filter(
            F.col("ts_ns")
            <= F.col("t0") + F.col("cutoff_day").cast("long") * 86400000000000
        )
        .select(
            "user_id",
            "cutoff_day",
            (
                subus_key(F.expr("(ts_ns div 1000)"))
            ).alias("last_key"),
            "value",
        )
    )
    return (
        ec.groupBy("user_id", "cutoff_day")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(F.expr("max_by(value, last_key)"), 2).alias(
                "last_value"
            ),
        )
        .select(
            "user_id",
            F.col("cutoff_day").cast("int").alias("cutoff_day"),
            "n_events",
            "last_value",
        )
        .orderBy("user_id", "cutoff_day")
    )


@query(
    "q_lag_feature_matrix",
    oracle="""
        WITH d AS (
          SELECT epoch_ns(ts) // 86400000000000 AS day,
                 sum(CAST(value AS DECIMAL(18,2))) AS rev_d
          FROM events WHERE event_type = 'purchase' GROUP BY day),
        f AS (
          SELECT day,
                 CAST(rev_d AS DOUBLE) AS rev,
                 CAST(lag(rev_d, 1) OVER w AS DOUBLE) AS lag1,
                 CAST(lag(rev_d, 7) OVER w AS DOUBLE) AS lag7,
                 CAST(sum(rev_d) OVER (ORDER BY day
                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)
                 / count(rev_d) OVER (ORDER BY day
                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS ma7,
                 CAST(rev_d - lag(rev_d, 1) OVER w AS DOUBLE) AS diff1
          FROM d WINDOW w AS (ORDER BY day))
        SELECT CAST(day AS BIGINT) AS day, rev, lag1, lag7, ma7, diff1
        FROM f
        WHERE lag7 IS NOT NULL
        ORDER BY day
    """,
    tags=("W3", "W4", "timeseries", "training-data"),
)
def q_lag_feature_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecasting feature matrix: daily purchase revenue with its
    lag-1, lag-7, trailing 7-day mean, and first difference — the
    supervised-learning representation of a time series (each row is
    a training example; the warm-up rows without a full lag-7 are
    dropped, the standard fit-window convention).

    Scale shape: one corpus-scale (day) hash agg; every lag/rolling
    feature runs on the calendar-bounded daily frame (partition by
    series id when this becomes per-entity). Daily revenue is pinned
    at 2 dp BEFORE the lags/diffs so every derived feature is exact
    arithmetic on pinned values; the moving average re-rounds at 4 dp.
    """
    d = (
        scan(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .groupBy(F.expr("ts_ns div 86400000000000").alias("day"))
        .agg(F.sum(money("value")).alias("rev_d"))
    )
    w = Window.orderBy("day")
    w7 = Window.orderBy("day").rowsBetween(-6, 0)
    # every feature derives from the exact DECIMAL daily revenue via
    # single decimal->double conversions (the ma7 is ONE division of
    # the exact 7-day decimal sum) — no rounded-double arithmetic
    f = d.select(
        F.col("day").cast("long").alias("day"),
        F.col("rev_d").cast("double").alias("rev"),
        F.lag("rev_d", 1).over(w).cast("double").alias("lag1"),
        F.lag("rev_d", 7).over(w).cast("double").alias("lag7"),
        (
            F.sum("rev_d").over(w7).cast("double")
            / F.count("rev_d").over(w7)
        ).alias("ma7"),
        (F.col("rev_d") - F.lag("rev_d", 1).over(w))
        .cast("double")
        .alias("diff1"),
    )
    return f.filter(F.col("lag7").isNotNull()).orderBy("day")


@query(
    "q_loo_target_encoding",
    oracle="""
        WITH c AS (
          SELECT l_returnflag AS cat,
                 CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT) AS y
          FROM lineitem),
        g AS (
          SELECT cat, count(*) AS n, sum(y) AS s
          FROM c GROUP BY cat),
        loo AS (
          SELECT c.cat, g.n, g.s,
                 CAST(floor((CAST(g.s - c.y AS DOUBLE)
                             / (CAST(g.n - 1 AS DOUBLE) * 100.0))
                            * 1000000.0 + 0.5) AS BIGINT) AS e6
          FROM c JOIN g ON g.cat = c.cat),
        m AS (
          SELECT cat, max(n) AS n, max(s) AS s,
                 count(*) AS n_rows, sum(e6) AS se, sum(e6 * e6) AS se2
          FROM loo GROUP BY cat)
        SELECT cat,
               CAST(n_rows AS BIGINT) AS n_rows,
               floor((CAST(se AS DOUBLE)
                      / (CAST(n_rows AS DOUBLE) * 1000000.0))
                     * 1000000.0 + 0.5) / 1000000.0 AS mean_encoding,
               floor((CAST(n_rows * se2 - se * se AS DOUBLE)
                      / (CAST(n_rows AS DOUBLE)
                         * CAST(n_rows - 1 AS DOUBLE) * 1e12))
                     * 10000000000.0 + 0.5) / 10000000000.0
                 AS var_encoding,
               floor((CAST(s AS DOUBLE)
                      / (CAST(n AS DOUBLE) * 100.0))
                     * 1000000.0 + 0.5) / 1000000.0 AS naive_mean
        FROM m
        ORDER BY cat
    """,
    tags=("A1", "A5", "training-data", "pipeline"),
)
def q_loo_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding audit: each row's category is
    encoded by the mean target (discount) of the OTHER rows in its
    category — (sum - y_i)/(n - 1) — the leakage-safe variant of mean
    encoding (naive mean encoding leaks each row's own target into
    its feature; LOO's per-row variance column is exactly the leak
    detector: zero variance means the encoding collapsed to the
    naive mean). Reported per category against the naive mean.

    Scale shape: per-category (n, sum) aggregates broadcast back
    onto the fact stream; the LOO encoding is a within-row
    expression, then ONE per-category audit agg.

    Determinism is EXACT (the r7 integer pattern): discounts
    integerize to cents, the per-row encoding is one identical
    double division floor-pinned to a 1e-6 integer grid, and the
    audit moments (mean, sample variance) compute from exact integer
    sums of that grid — var_samp of near-constant pinned values
    through engine-internal streaming moments was the one remaining
    1e-10-grid fragility here, and n·Σe² − (Σe)² removes it.
    """
    c = scan(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("cat"),
        F.floor(F.col("l_discount") * F.lit(100.0) + F.lit(0.5))
        .cast("long")
        .alias("y"),
    )
    g = c.groupBy(F.col("cat").alias("gcat")).agg(
        F.count("*").alias("n"), F.sum("y").alias("s")
    )
    e6 = F.floor(
        (
            (F.col("s") - F.col("y")).cast("double")
            / ((F.col("n") - 1).cast("double") * F.lit(100.0))
        )
        * F.lit(1000000.0)
        + F.lit(0.5)
    ).cast("long")
    loo = (
        c.join(F.broadcast(g), F.col("cat") == F.col("gcat"))
        .select("cat", "n", "s", e6.alias("e6"))
    )
    m = loo.groupBy("cat").agg(
        F.max("n").alias("n"),
        F.max("s").alias("s"),
        F.count("*").alias("n_rows"),
        F.sum(F.col("e6").cast("decimal(38,0)")).alias("se"),
        F.sum((F.col("e6") * F.col("e6")).cast("decimal(38,0)")).alias(
            "se2"
        ),
    )
    nr_d = F.col("n_rows").cast("double")
    return m.select(
        "cat",
        F.col("n_rows").cast("long").alias("n_rows"),
        (
            F.floor(
                (F.col("se").cast("double") / (nr_d * F.lit(1000000.0)))
                * F.lit(1000000.0)
                + F.lit(0.5)
            )
            / F.lit(1000000.0)
        ).alias("mean_encoding"),
        (
            F.floor(
                (
                    (
                        F.col("n_rows") * F.col("se2")
                        - F.col("se") * F.col("se")
                    ).cast("double")
                    / (
                        nr_d
                        * (F.col("n_rows") - 1).cast("double")
                        * F.lit(1e12)
                    )
                )
                * F.lit(10000000000.0)
                + F.lit(0.5)
            )
            / F.lit(10000000000.0)
        ).alias("var_encoding"),
        (
            F.floor(
                (
                    F.col("s").cast("double")
                    / (F.col("n").cast("double") * F.lit(100.0))
                )
                * F.lit(1000000.0)
                + F.lit(0.5)
            )
            / F.lit(1000000.0)
        ).alias("naive_mean"),
    ).orderBy("cat")


# Thresholds shared with the training-set builder (analytics_q) — the
# eval must score the SAME feature/label windows the builder used.
from hadoop_log_analysis_spark.queries.analytics_q import (  # noqa: E402
    CHURN_FEATURE_DAYS,
    CHURN_LABEL_DAYS,
)

CHURN_RULE_H = 48  # predict churn when recency exceeds this (hours)


@query(
    "q_churn_rule_eval",
    oracle=f"""
        WITH b AS (SELECT min(epoch_ns(ts)) AS t0 FROM events),
        e AS (
          SELECT e.user_id, epoch_ns(e.ts) AS ns,
                 b.t0 + {CHURN_FEATURE_DAYS} * 86400000000000 AS cutoff,
                 b.t0 + {CHURN_FEATURE_DAYS + CHURN_LABEL_DAYS}
                      * 86400000000000 AS label_end
          FROM events e CROSS JOIN b),
        f AS (
          SELECT user_id,
                 count(CASE WHEN ns <= cutoff THEN 1 END) AS n_events,
                 CAST((max(cutoff) - max(CASE WHEN ns <= cutoff
                                              THEN ns END))
                      // 3600000000000 AS BIGINT) AS recency_h,
                 5 * count(CASE WHEN ns > cutoff AND ns <= label_end
                               THEN 1 END)
                   < 2 * count(CASE WHEN ns <= cutoff THEN 1 END)
                   AS churned
          FROM e GROUP BY user_id),
        u AS (SELECT recency_h, churned FROM f WHERE n_events > 0),
        h AS (
          SELECT recency_h AS v,
                 sum(CASE WHEN churned THEN 1 ELSE 0 END) AS pos,
                 sum(CASE WHEN churned THEN 0 ELSE 1 END) AS neg
          FROM u GROUP BY recency_h),
        cum AS (
          SELECT v, pos, neg,
                 coalesce(sum(neg) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS neg_below
          FROM h),
        agg AS (
          SELECT sum(pos) AS n_pos, sum(neg) AS n_neg,
                 sum(pos * (neg_below + neg / 2.0)) AS u_stat
          FROM cum),
        conf AS (
          SELECT sum(CASE WHEN churned AND recency_h >= {CHURN_RULE_H}
                          THEN 1 ELSE 0 END) AS tp,
                 sum(CASE WHEN NOT churned AND recency_h >= {CHURN_RULE_H}
                          THEN 1 ELSE 0 END) AS fp,
                 sum(CASE WHEN churned AND recency_h < {CHURN_RULE_H}
                          THEN 1 ELSE 0 END) AS fn,
                 sum(CASE WHEN NOT churned AND recency_h < {CHURN_RULE_H}
                          THEN 1 ELSE 0 END) AS tn
          FROM u)
        SELECT CAST(a.n_pos + a.n_neg AS BIGINT) AS n_users,
               CAST(a.n_pos AS BIGINT) AS n_churned,
               CASE WHEN a.n_pos * a.n_neg > 0
                    THEN floor((a.u_stat / (a.n_pos * a.n_neg))
                               * 1000000.0 + 0.5) / 1000000.0
                    END AS auc,
               CAST(c.tp AS BIGINT) AS tp, CAST(c.fp AS BIGINT) AS fp,
               CAST(c.fn AS BIGINT) AS fn, CAST(c.tn AS BIGINT) AS tn,
               CASE WHEN c.tp + c.fp > 0
                    THEN floor((c.tp * 1.0 / (c.tp + c.fp))
                               * 1000000.0 + 0.5) / 1000000.0
                    END AS precision_,
               CASE WHEN c.tp + c.fn > 0
                    THEN floor((c.tp * 1.0 / (c.tp + c.fn))
                               * 1000000.0 + 0.5) / 1000000.0
                    END AS recall_,
               CASE WHEN 2 * c.tp + c.fp + c.fn > 0
                    THEN floor((2.0 * c.tp / (2.0 * c.tp + c.fp + c.fn))
                               * 1000000.0 + 0.5) / 1000000.0
                    END AS f1
        FROM agg a CROSS JOIN conf c
    """,
    tags=("A5", "training-data", "eval", "pipeline"),
)
def q_churn_rule_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offline evaluation of a churn predictor INSIDE the engine,
    closing the q_churn_training_set loop (same activity-collapse
    label: 5*n_label < 2*n_feature): the recency-threshold rule
    (predict churn when recency >= 48 h) scored by confusion counts,
    precision/recall/F1, AND the exact rank-based AUC — computed as
    the Mann-Whitney U of recency between churned and retained users
    over the VALUE HISTOGRAM (AUC = P(score_churned > score_retained)
    + tie credit — the q_mann_whitney machinery reused as a model
    metric; no row-grain ranking).

    Scale shape: one conditional-aggregation pass builds the labeled
    frame (the q_churn_training_set plan); AUC runs on the distinct-
    recency histogram (value-grain window); the confusion is one more
    bounded aggregate. All metrics are exact integer ratios, pinned
    at 6 dp with the algorithm-explicit floor(x*1e6+0.5) on both
    engines (integer-ratio midpoints are where engine round()
    tie-breaks diverge).
    """
    b = scan(spark, sf_dir, "events").agg(F.min("ts_ns").alias("t0"))
    ev = scan(spark, sf_dir, "events").select("user_id", "ts_ns")
    day_ns = 86400000000000
    e = ev.crossJoin(F.broadcast(b)).select(
        "user_id",
        "ts_ns",
        (F.col("t0") + CHURN_FEATURE_DAYS * day_ns).alias("cutoff"),
        (
            F.col("t0") + (CHURN_FEATURE_DAYS + CHURN_LABEL_DAYS) * day_ns
        ).alias("label_end"),
    )
    in_f = F.col("ts_ns") <= F.col("cutoff")
    in_l = (F.col("ts_ns") > F.col("cutoff")) & (
        F.col("ts_ns") <= F.col("label_end")
    )
    u = (
        e.groupBy("user_id")
        .agg(
            F.count(F.when(in_f, 1)).alias("n_events"),
            F.expr(
                f"(max(cutoff) - max(CASE WHEN ts_ns <= cutoff THEN ts_ns END))"
                f" div 3600000000000"
            )
            .cast("long")
            .alias("recency_h"),
            (
                5 * F.count(F.when(in_l, 1))
                < 2 * F.count(F.when(in_f, 1))
            ).alias("churned"),
        )
        .filter(F.col("n_events") > 0)
        .select("recency_h", "churned")
    )
    h = u.groupBy(F.col("recency_h").alias("v")).agg(
        F.sum(F.col("churned").cast("long")).alias("pos"),
        F.sum((~F.col("churned")).cast("long")).alias("neg"),
    )
    w_below = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    cum = h.withColumn(
        "neg_below", F.coalesce(F.sum("neg").over(w_below), F.lit(0))
    )
    agg = cum.agg(
        F.sum("pos").alias("n_pos"),
        F.sum("neg").alias("n_neg"),
        F.sum(
            F.col("pos") * (F.col("neg_below") + F.col("neg") / 2.0)
        ).alias("u_stat"),
    )
    pred = F.col("recency_h") >= CHURN_RULE_H
    conf = u.agg(
        F.sum((F.col("churned") & pred).cast("long")).alias("tp"),
        F.sum(((~F.col("churned")) & pred).cast("long")).alias("fp"),
        F.sum((F.col("churned") & ~pred).cast("long")).alias("fn"),
        F.sum(((~F.col("churned")) & ~pred).cast("long")).alias("tn"),
    )
    return (
        agg.crossJoin(F.broadcast(conf))
        .select(
            (F.col("n_pos") + F.col("n_neg")).cast("long").alias("n_users"),
            F.col("n_pos").cast("long").alias("n_churned"),
            F.when(
                F.col("n_pos") * F.col("n_neg") > 0,
                F.floor(
                    (F.col("u_stat") / (F.col("n_pos") * F.col("n_neg")))
                    * F.lit(1000000.0)
                    + F.lit(0.5)
                )
                / F.lit(1000000.0),
            ).alias("auc"),
            F.col("tp").cast("long").alias("tp"),
            F.col("fp").cast("long").alias("fp"),
            F.col("fn").cast("long").alias("fn"),
            F.col("tn").cast("long").alias("tn"),
            F.when(
                F.col("tp") + F.col("fp") > 0,
                F.floor(
                    (F.col("tp") * 1.0 / (F.col("tp") + F.col("fp")))
                    * F.lit(1000000.0)
                    + F.lit(0.5)
                )
                / F.lit(1000000.0),
            ).alias("precision_"),
            F.when(
                F.col("tp") + F.col("fn") > 0,
                F.floor(
                    (F.col("tp") * 1.0 / (F.col("tp") + F.col("fn")))
                    * F.lit(1000000.0)
                    + F.lit(0.5)
                )
                / F.lit(1000000.0),
            ).alias("recall_"),
            F.when(
                2 * F.col("tp") + F.col("fp") + F.col("fn") > 0,
                F.floor(
                    (
                        2.0 * F.col("tp")
                        / (2.0 * F.col("tp") + F.col("fp") + F.col("fn"))
                    )
                    * F.lit(1000000.0)
                    + F.lit(0.5)
                )
                / F.lit(1000000.0),
            ).alias("f1"),
        )
    )
