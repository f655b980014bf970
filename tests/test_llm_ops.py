"""LLM-pipeline operator semantics: recall of probabilistic ops vs
their exact twins, and algebraic properties (SURVEY.md §5.5).

The probabilistic operators (MinHash-LSH L2, IVF L4) are rows-only at
the driver; THESE tests are their correctness story: recall measured
against the exact, fully-oracled formulations on the same fixtures."""

from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_log_analysis_spark.operators.dedup import (
    exact_dedup,
    minhash_near_duplicates,
    simhash_candidate_pairs,
    token_jaccard,
)
from hadoop_log_analysis_spark.operators.similarity import ann_ivf_topk, cosine_topk
from hadoop_log_analysis_spark.sources.catalog import scan
from tests.conftest import SF001


def _exact_near_dup_pairs(docs, threshold):
    """Ground truth: prefix-blocked exact token-Jaccard pairs (the
    fixture's near-dups share a 40-char prefix by construction)."""
    t = docs.select(
        "doc_id",
        F.substring("text", 1, 40).alias("pfx"),
        F.array_distinct(F.split(F.col("text"), " ")).alias("toks"),
    )
    a = t.select(F.col("doc_id").alias("a_id"), "pfx", F.col("toks").alias("a_toks"))
    b = t.select(F.col("doc_id").alias("b_id"), "pfx", F.col("toks").alias("b_toks"))
    return (
        a.join(b, "pfx")
        .filter(F.col("a_id") < F.col("b_id"))
        .withColumn("jacc", token_jaccard("a_toks", "b_toks"))
        .filter(F.col("jacc") >= threshold)
        .select("a_id", "b_id")
    )


def test_minhash_lsh_recall_and_precision(spark):
    docs = scan(spark, SF001, "documents")
    truth = {tuple(r) for r in _exact_near_dup_pairs(docs, 0.6).collect()}
    found = {
        (r.a_id, r.b_id) for r in minhash_near_duplicates(docs, threshold=0.6).collect()
    }
    assert truth, "fixture should contain near-dup pairs"
    # Precision is exact by construction (every candidate re-verified).
    extra = found - truth
    assert not extra, f"LSH emitted pairs failing exact Jaccard: {sorted(extra)[:5]}"
    recall = len(found & truth) / len(truth)
    assert recall >= 0.8, f"LSH recall {recall:.2f} < 0.8 ({len(found)}/{len(truth)})"


def test_ivf_is_exact_within_probed_buckets(spark):
    """IVF's correctness property: output == exact top-k restricted to
    the probed buckets. (Absolute recall is data-dependent: these
    fixture embeddings are near-random — intra-label mean cosine 0.013
    vs inter -0.003 — so recall ~= coverage fraction, n_probe/10;
    on clustered real data the same operator's recall is high.)"""
    from hadoop_log_analysis_spark.operators.similarity import cosine, ivf_centroids

    emb = scan(spark, SF001, "embeddings")
    approx = [
        (r.vec_id, r.sim)
        for r in ann_ivf_topk(emb, query_id=0, k=10, n_probe=3).collect()
    ]
    # Reconstruct the probe set the same way the operator does.
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("__qvec"))
    probed = [
        r.label
        for r in (
            ivf_centroids(emb)
            .crossJoin(F.broadcast(q))
            .select("label", cosine(F.col("centroid"), F.col("__qvec")).alias("cs"))
            .orderBy(F.col("cs").desc(), "label")
            .limit(3)
        ).collect()
    ]
    # Keep the query row itself so cosine_topk can find its vector even
    # when the query's own label is not among the probed buckets.
    exact_in_probed = [
        (r.vec_id, r.sim)
        for r in cosine_topk(
            emb.filter(F.col("label").isin(probed) | (F.col("vec_id") == 0)), 0, k=10
        ).collect()
    ]
    assert approx == exact_in_probed
    # Coverage-level recall floor vs the unrestricted exact top-k.
    exact = [r.vec_id for r in cosine_topk(emb, query_id=0, k=10).collect()]
    recall = len({v for v, _ in approx} & set(exact)) / len(exact)
    assert recall >= 0.2, f"IVF@3/10-probe recall {recall:.2f} below coverage floor"


def test_exact_dedup_idempotent_and_complete(spark):
    docs = scan(spark, SF001, "documents")
    once = exact_dedup(docs, "text", "doc_id")
    twice = exact_dedup(once, "text", "doc_id")
    n_once, n_twice = once.count(), twice.count()
    assert n_once == twice.count() == n_twice
    assert n_once == docs.select("text").distinct().count()


def test_simhash_pairs_are_bounded_and_ordered(spark):
    docs = scan(spark, SF001, "documents")
    rows = simhash_candidate_pairs(docs, max_hamming=8).collect()
    assert rows, "simhash should find candidates among prefix-dup docs"
    assert all(r.a_id < r.b_id and r.hamming <= 8 for r in rows)


def test_sign_band_lsh_equals_bruteforce_on_near_dups(spark):
    """VERDICT r1 item 2: the banded embedding near-dup plan must be
    exact ⊆ (precision, by construction) and, at the 0.9 operating
    point (p≈0.856, r=4, b=16 → per-pair miss ~4e-6), recall 1.0. The
    fixtures carry no pairs ≥ 0.9, so near-dups are synthesized here:
    2%-multiplicative-noise copies (cosine ≈ 0.998) of fixture rows."""
    import random

    from hadoop_log_analysis_spark.operators.similarity import (
        cosine,
        cosine_near_dup_pairs,
    )

    base = scan(spark, SF001, "embeddings").orderBy("vec_id").limit(100).collect()
    rng = random.Random(123)
    rows = [(r.vec_id, [float(x) for x in r.embedding]) for r in base]
    rows += [
        (
            10_000 + r.vec_id,
            [float(x) * (1.0 + rng.gauss(0.0, 0.02)) for x in r.embedding],
        )
        for r in base[:40]
    ]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")
    banded = {
        (r.a_id, r.b_id)
        for r in cosine_near_dup_pairs(df, threshold=0.9).collect()
    }
    a = df.select(F.col("vec_id").alias("a_id"), F.col("embedding").alias("__va"))
    b = df.select(F.col("vec_id").alias("b_id"), F.col("embedding").alias("__vb"))
    exact = {
        (r.a_id, r.b_id)
        for r in (
            a.crossJoin(b)
            .filter(F.col("a_id") < F.col("b_id"))
            .withColumn("sim", cosine(F.col("__va"), F.col("__vb")))
            .filter(F.col("sim") >= 0.9)
        ).collect()
    }
    assert len(exact) >= 30, "synthetic corpus should contain near-dups"
    assert banded <= exact, f"banded emitted non-dups: {sorted(banded - exact)[:5]}"
    assert banded == exact, f"banded missed pairs: {sorted(exact - banded)[:5]}"


def test_ivf_persisted_probe_matches_monolith(spark):
    """VERDICT r1 item 3: probing the persisted IVF index (build once,
    probe many) must return exactly what the build-inline monolith
    returns for the same (query, k, n_probe)."""
    import shutil

    from hadoop_log_analysis_spark.operators.similarity import ivf_build, ivf_probe

    emb = scan(spark, SF001, "embeddings")
    idx = "/root/repo/.tmp/ivf_index_unittest"
    shutil.rmtree(idx, ignore_errors=True)
    ivf_build(spark, emb, idx)
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("__qvec"))
    probed = [
        (r.vec_id, r.sim)
        for r in ivf_probe(spark, idx, q, k=10, n_probe=3, exclude_id=0).collect()
    ]
    mono = [
        (r.vec_id, r.sim)
        for r in ann_ivf_topk(emb, query_id=0, k=10, n_probe=3).collect()
    ]
    assert probed == mono


def test_chunked_inverted_index_equals_plain_and_bounds_groups(spark):
    """Synthetic head-heavy vocab (VERDICT r3 'Next round' #3): one
    'hot' token in ~90% of docs. The chunked build must (a) merge
    back to exactly the plain one-shot build's (tok, df, postings)
    rows and (b) never aggregate more than chunk_size postings in a
    single (tok, chunk) group — the property that removes the
    head-term collect_list funnel at scale."""
    from hadoop_log_analysis_spark.operators.text import (
        inverted_index_chunked,
        merge_chunked_index,
    )

    n, B = 2000, 64
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.when(F.col("id") % 10 != 0, F.lit("hot ")).otherwise(F.lit("")),
            F.lit("tail"),
            (F.col("id") % 37).cast("string"),
        ).alias("text"),
    )

    plain = (
        docs.select(
            "doc_id",
            F.explode(F.array_distinct(F.split("text", " "))).alias("tok"),
        )
        .groupBy("tok")
        .agg(
            F.count("*").alias("df"),
            F.array_join(F.sort_array(F.collect_list("doc_id")), " ").alias(
                "postings"
            ),
        )
    )
    chunked = inverted_index_chunked(docs, chunk_size=B)
    merged = merge_chunked_index(chunked)

    assert merged.exceptAll(plain).count() == 0
    assert plain.exceptAll(merged).count() == 0
    # the hot token really spans many chunks, and every group is bounded
    hot_chunks = chunked.filter(F.col("tok") == "hot")
    assert hot_chunks.count() > n // B // 2
    assert chunked.agg(F.max("df_chunk")).collect()[0][0] <= B


def test_multimodal_header_decode_roundtrip(spark):
    """The JVM-built PNG/JPEG headers must be genuinely parseable:
    decode_features reads fmt/width/height from the payload BYTES, so
    matching the meta struct proves a real header round-trip (VERDICT
    r3 'Next round' #4), not a metadata copy."""
    from hadoop_log_analysis_spark.operators.multimodal import (
        attach_synthetic_binary,
        decode_features,
    )

    docs = scan(spark, SF001, "documents").limit(40)
    binary = attach_synthetic_binary(docs)
    feats = decode_features(binary)
    joined = feats.join(binary.select("doc_id", "meta"), "doc_id")
    mismatched = joined.filter(
        (F.col("fmt") != F.col("meta.fmt"))
        | (F.col("width") != F.col("meta.width"))
        | (F.col("height") != F.col("meta.height"))
    )
    assert feats.count() == 40
    assert mismatched.count() == 0


def test_multimodal_decode_real_parses_and_falls_back():
    """_decode_real: struct-parses handcrafted PNG and JPEG headers,
    raises ValueError on corrupt ones, NotImplementedError on
    headerless payloads (fake-decode fallback contract)."""
    import struct as pystruct
    import zlib

    import pytest

    from hadoop_log_analysis_spark.operators.multimodal import (
        JPEG_HEADER_LEN,
        PNG_HEADER_LEN,
        PNG_SIG,
        _decode_real,
    )

    ihdr_data = pystruct.pack(">II", 640, 480) + b"\x08\x02\x00\x00\x00"
    crc = zlib.crc32(b"IHDR" + ihdr_data)
    png = (
        PNG_SIG
        + pystruct.pack(">I", 13)
        + b"IHDR"
        + ihdr_data
        + pystruct.pack(">I", crc)
        + b"body"
    )
    assert _decode_real(png) == ("png", 640, 480, PNG_HEADER_LEN)

    jpg = (
        b"\xff\xd8\xff\xc0"
        + pystruct.pack(">H", 17)
        + b"\x08"
        + pystruct.pack(">HH", 480, 640)
        + b"\x03\x01\x22\x00\x02\x11\x01\x03\x11\x01"
        + b"body"
    )
    assert _decode_real(jpg) == ("jpg", 640, 480, JPEG_HEADER_LEN)

    with pytest.raises(ValueError):
        _decode_real(PNG_SIG + b"\x00\x00\x00\x0dNOPE")
    with pytest.raises(NotImplementedError):
        _decode_real(b"FAKEsome text bytes")


def test_connected_components_rejects_string_ids(spark):
    """ADVICE r3 clustering.py:85: non-numeric ids null the decimal
    convergence sums and would silently exit after one iteration —
    must raise instead."""
    import pytest

    from hadoop_log_analysis_spark.operators.clustering import (
        connected_components,
    )

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "a_id string, b_id string"
    )
    with pytest.raises(TypeError, match="numeric node ids"):
        connected_components(edges)


def test_asof_quantile_bounds_cached_per_input(spark):
    """VERDICT r3 'Next round' #8: the keyless asof boundary job
    (sample + approxQuantile) must run once per distinct input plan —
    a second identical call reuses the memoized literals."""
    from hadoop_log_analysis_spark.operators import joins as J

    left = spark.range(200).select(
        F.col("id").alias("event_id"), (F.col("id") * 7).alias("tus")
    )
    right = spark.range(50).select(
        (F.col("id") * 29).alias("tus"), (F.col("id") * 1.5).alias("pay")
    )
    before = J._BOUNDS_MISSES
    first = J.asof_join(left, right, ts_col="tus", payload=["pay"]).count()
    mid = J._BOUNDS_MISSES
    second = J.asof_join(left, right, ts_col="tus", payload=["pay"]).count()
    after = J._BOUNDS_MISSES
    assert first == second
    assert mid == before + 1
    assert after == mid  # second call: cache hit, no boundary job


def test_keyless_asof_right_ts_ties_consistent(spark):
    """ADVICE r3 joins.py:163: duplicate right-side timestamps must
    resolve to ONE payload for every left row at/after the tie — the
    in-bucket carry and the cross-boundary seed must agree. Forcing
    many buckets over few rows makes most rows boundary-seeded."""
    from hadoop_log_analysis_spark.operators.joins import (
        _MARK,
        _SRC,
        _keyless_carry,
    )

    left = spark.range(60).select(
        F.col("id").alias("k"), (F.col("id") * 10 + 5).alias("tus")
    )
    # every right ts duplicated with two distinct payloads
    right = spark.range(12).select(
        (F.col("id") % 6 * 100).alias("tus"),
        F.when(F.col("id") < 6, 111.0).otherwise(222.0).alias("pay"),
    )
    from hadoop_log_analysis_spark.operators.joins import asof_join

    out = asof_join(left, right, ts_col="tus", payload=["pay"])
    # each effective asof timestamp must map to exactly one carried value
    per_ts = (
        out.join(left, ["k", "tus"])
        .groupBy("tus")
        .agg(F.countDistinct("pay").alias("n_pay"))
        .agg(F.max("n_pay"))
        .collect()[0][0]
    )
    assert per_ts == 1


def test_remove_boilerplate_untouched_corpus_passes_through(spark):
    """Production path (ADVICE r3 pipeline_q.py:870): on the RAW
    fixture (no planted lines; every line occurs in <= 2 docs) the
    operator must keep every document intact."""
    from hadoop_log_analysis_spark.operators.text import remove_boilerplate

    docs = scan(spark, SF001, "documents").select("doc_id", "text")
    out = remove_boilerplate(docs, min_docs=5)
    assert out.filter(F.col("n_kept") != F.col("n_lines")).count() == 0


def test_heavy_hitters_exact_under_eviction(spark):
    """Misra-Gries with k far below the distinct-item count must still
    return the EXACT heavy-hitter set: candidates are a superset by
    the pigeonhole guarantee, the recount prunes precisely. Synthetic
    hot-key stream: one item takes ~40% of 40k rows, two take ~10%
    each, the rest spread over ~4000 distinct values."""
    from hadoop_log_analysis_spark.operators.sketch import (
        _mg_candidates,
        heavy_hitters,
    )

    n, k = 40_000, 16
    items = spark.range(n).select(
        F.when(F.col("id") % 10 < 4, F.lit("hot"))
        .when(F.col("id") % 10 == 4, F.lit("warm_a"))
        .when(F.col("id") % 10 == 5, F.lit("warm_b"))
        .otherwise(F.concat(F.lit("cold"), (F.col("id") % 4000).cast("string")))
        .alias("item")
    )
    got = {(r["item"], r["n"]) for r in heavy_hitters(items, "item", k=k).collect()}
    want = {
        (r["item"], r["n"])
        for r in items.groupBy("item")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > n // (k + 1))
        .collect()
    }
    assert got == want and {"hot", "warm_a", "warm_b"} <= {i for i, _ in got}
    # pass-1 output is bounded: <= k candidate rows per partition
    per_part = (
        _mg_candidates(items, "item", k)
        .select(F.spark_partition_id().alias("pid"))
        .groupBy("pid")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert per_part <= k


def test_pca_components_spectral_invariants(spark):
    """r4: the PCA output must satisfy the spectral facts implied by
    the covariance it was solved from — eigval ordering, Rayleigh
    bounds (max diagonal <= lambda_1 <= trace), unit-bounded loadings,
    and the positive-max-|loading| sign convention."""
    import numpy as np

    from hadoop_log_analysis_spark.queries import load_registry

    reg = load_registry()
    cov_rows = reg["q_embedding_covariance"].fn(spark, SF001).collect()
    d = max(r["j"] for r in cov_rows)
    c = np.zeros((d, d))
    for r in cov_rows:
        c[r["i"] - 1, r["j"] - 1] = r["cov"]
        c[r["j"] - 1, r["i"] - 1] = r["cov"]
    trace = float(np.trace(c))
    max_diag = float(np.diag(c).max())

    rows = reg["q_pca_components"].fn(spark, SF001).collect()
    assert len(rows) == 16
    by_comp = {}
    for r in rows:
        by_comp.setdefault(r["component"], []).append(r)
    lam1 = by_comp[1][0]["eigval"]
    lam2 = by_comp[2][0]["eigval"]
    assert lam1 >= lam2 > 0
    assert max_diag - 1e-3 <= lam1 <= trace + 1e-3
    for comp_rows in by_comp.values():
        loadings = [r["loading"] for r in comp_rows]
        assert all(abs(x) <= 1.0 for x in loadings)
        assert max(loadings, key=abs) > 0  # sign convention
        assert len({r["eigval"] for r in comp_rows}) == 1


def test_minhash_recall_vs_exact_set_similarity_truth(spark):
    """VERDICT r4 item 4 (L2 cross-validation): quantify
    q_minhash_near_dups against the EXACT similarity-join tier instead
    of merely 'it ran'. The sound truth set is shingle-level: MinHash
    signatures estimate 5-token SHINGLE-set Jaccard (two docs with the
    same token bag in a different order share tokens but no shingles),
    so the ground truth is pairs with shingle-J >= 0.6 that also pass
    the operator's token-J >= 0.6 verify. On the fixture truth has 25
    pairs with min shingle-J 0.875 (band hit probability ~1), measured
    recall 1.0; asserted >= 0.9. Precision is asserted exact, and the
    truth set is cross-checked to be a subset of
    set_similarity_join(0.6) — the fully-oracled exact twin."""
    from hadoop_log_analysis_spark.operators.dedup import (
        set_similarity_join,
        shingles,
    )

    docs = scan(spark, SF001, "documents")
    t = docs.select(
        "doc_id",
        F.array_distinct(shingles("text", 5)).alias("sh"),
        F.array_distinct(F.split("text", " ")).alias("toks"),
    )
    a = t.select(
        F.col("doc_id").alias("a_id"),
        F.col("sh").alias("a_sh"),
        F.col("toks").alias("a_toks"),
    )
    b = t.select(
        F.col("doc_id").alias("b_id"),
        F.col("sh").alias("b_sh"),
        F.col("toks").alias("b_toks"),
    )
    truth_df = (
        a.crossJoin(b)
        .filter(F.col("a_id") < F.col("b_id"))
        .filter(
            (token_jaccard("a_sh", "b_sh") >= 0.6)
            & (token_jaccard("a_toks", "b_toks") >= 0.6)
        )
        .select("a_id", "b_id")
    )
    truth = {tuple(r) for r in truth_df.collect()}
    assert truth, "fixture should contain shingle-level near-dup pairs"

    found = {
        (r.a_id, r.b_id)
        for r in minhash_near_duplicates(docs, threshold=0.6).collect()
    }
    recall = len(found & truth) / len(truth)
    assert recall >= 0.9, f"LSH recall {recall:.2f} vs exact truth"
    # Precision: every emitted pair passes the exact token-J verify.
    tok_ok = (
        a.select("a_id", "a_toks")
        .join(spark.createDataFrame(sorted(found), "a_id long, b_id long"), "a_id")
        .join(b.select("b_id", "b_toks"), "b_id")
        .filter(token_jaccard("a_toks", "b_toks") < 0.6)
        .count()
    )
    assert tok_ok == 0
    # Truth must be a subset of the exact twin's (token-level) output:
    # shingle-J >= 0.6 + token-J >= 0.6 implies membership in
    # set_similarity_join(0.6) — recall-1.0 cross-check of the tiers.
    missing = (
        truth_df.join(
            set_similarity_join(docs, 0.6).select("a_id", "b_id"),
            ["a_id", "b_id"],
            "left_anti",
        ).count()
    )
    assert missing == 0


def test_ann_ivf_query_recall_vs_cosine_knn_query(spark):
    """VERDICT r4 item 4 (L4 cross-validation): the registry's
    q_ann_ivf (persisted partition-pruned IVF probe) quantified
    against q_cosine_knn (exact brute-force top-10) on the same
    fixture. The fixture embeddings are near-random (intra-label mean
    cosine 0.013), so expected recall ~= probe coverage
    n_probe/n_buckets = 3/10; measured 0.4 with the committed seeds.
    The floor asserts the probe actually ranks within buckets (recall
    >= coverage) rather than a fixed high number the data cannot
    support."""
    from hadoop_log_analysis_spark.queries import load_registry

    reg = load_registry()
    exact = [r.vec_id for r in reg["q_cosine_knn"].fn(spark, SF001).collect()]
    approx = [r.vec_id for r in reg["q_ann_ivf"].fn(spark, SF001).collect()]
    assert len(exact) == 10 and len(approx) == 10
    recall = len(set(exact) & set(approx)) / len(exact)
    assert recall >= 0.3, f"IVF top-10 recall {recall:.2f} below coverage"


def test_simhash_recall_vs_bruteforce_hamming_truth(spark):
    """Quantify the SimHash band scheme against the brute-force
    Hamming ground truth (the same exact-twin discipline MinHash and
    IVF carry). Two tiers: pairs at Hamming <= 3 are GUARANTEED found
    (pigeonhole over 4 x 16-bit chunks — a theorem, so recall must be
    exactly 1.0: 17/17 on the fixture), pairs at the verify bound
    <= 8 are probabilistic (measured recall 0.398, floored at 0.3),
    and precision is exact (every emitted pair passes the Hamming
    verify — zero outside the bound)."""
    from hadoop_log_analysis_spark.operators.dedup import simhash

    docs = scan(spark, SF001, "documents")
    fp = docs.select("doc_id", simhash("text").alias("fp"))
    a = fp.select(F.col("doc_id").alias("a_id"), F.col("fp").alias("a_fp"))
    b = fp.select(F.col("doc_id").alias("b_id"), F.col("fp").alias("b_fp"))
    truth = (
        a.crossJoin(b)
        .filter(F.col("a_id") < F.col("b_id"))
        .withColumn("h", F.expr("bit_count(a_fp ^ b_fp)"))
    )
    t3 = {(r.a_id, r.b_id) for r in truth.filter(F.col("h") <= 3).collect()}
    t8 = {(r.a_id, r.b_id) for r in truth.filter(F.col("h") <= 8).collect()}
    found = {
        (r.a_id, r.b_id) for r in simhash_candidate_pairs(docs).collect()
    }
    assert t3, "fixture should contain Hamming<=3 near-dup pairs"
    missed_guaranteed = t3 - found
    assert not missed_guaranteed, (
        f"pigeonhole-guaranteed pairs missed: {sorted(missed_guaranteed)[:5]}"
    )
    assert not found - t8, "emitted pair fails the Hamming<=8 verify"
    recall8 = len(found & t8) / len(t8)
    assert recall8 >= 0.3, f"Hamming<=8 recall {recall8:.2f}"


def test_ann_recall_curve_monotone_and_exact_at_full_probe(spark):
    """The IVF recall curve must be non-decreasing in n_probe (more
    buckets can only add candidates) and EXACTLY 1.0 with zero spread
    at n_probe = 10 (visiting all 10 label buckets = exact search).
    A violation means candidate slicing or ranking depends on
    something other than the probed buckets."""
    from hadoop_log_analysis_spark.queries import load_registry
    from tests.conftest import SF001

    reg = load_registry()
    rows = {
        r.n_probe: r
        for r in reg["q_ann_recall_curve"].fn(spark, SF001).collect()
    }
    assert sorted(rows) == [1, 2, 4, 10]
    means = [rows[p].mean_recall_at_10 for p in (1, 2, 4, 10)]
    assert means == sorted(means), f"recall not monotone: {means}"
    assert rows[10].mean_recall_at_10 == 1.0
    assert rows[10].min_recall_at_10 == 1.0
    assert all(rows[p].n_queries == 20 for p in rows)


def test_compression_ratio_separates_boilerplate_from_natural_text(spark):
    """The gate's correctness story (rows-only query): a planted
    repetitive document must compress FAR below the natural corpus
    band, the natural fixtures must sit inside it, and the per-lang
    report must count flags consistently."""
    from hadoop_log_analysis_spark.queries import load_registry
    from hadoop_log_analysis_spark.queries.llm_ops import _zlib_ratio
    from tests.conftest import SF001

    reg = load_registry()
    rows = reg["q_compression_ratio_filter"].fn(spark, SF001).collect()
    assert rows and all(r.n_docs > 0 for r in rows)
    # natural synthetic text: every language's mean inside a wide sane band
    assert all(0.2 < r.avg_ratio < 0.9 for r in rows)

    planted = spark.createDataFrame(
        [("spam " * 400,), ("the quick brown fox jumps over the lazy dog. "
                            "meanwhile, seventeen astronauts debated quantum "
                            "economics beside a turquoise harpsichord!",)],
        ["text"],
    ).select(_zlib_ratio("text").alias("r")).collect()
    rep, nat = planted[0].r, planted[1].r
    assert rep < 0.05, f"repetitive text should collapse, got {rep}"
    assert rep < min(r.min_ratio for r in rows), "gate cannot separate"
    assert nat > 0.35, f"natural one-off text should not be flagged, got {nat}"


def test_ahash_banding_pigeonhole_recall_and_precision(spark):
    """Banded aHash pairs vs brute-force Hamming truth at sf0.001:
    every truth pair with Hamming < bands MUST be found (pigeonhole),
    every reported pair must be a truth pair at its exact distance
    (precision 1.0 — candidates are exact-verified)."""
    from hadoop_log_analysis_spark.operators.multimodal import (
        ahash64,
        ahash_near_dup_pairs,
        attach_synthetic_binary,
    )
    from hadoop_log_analysis_spark.sources.catalog import scan
    from tests.conftest import SF0001

    docs = scan(spark, SF0001, "documents").select("doc_id", "text")
    hashes = ahash64(attach_synthetic_binary(docs)).collect()
    truth = {}
    for i, ra in enumerate(hashes):
        for rb in hashes[i + 1 :]:
            a, b = sorted((ra.doc_id, rb.doc_id))
            d = bin((ra.ahash ^ rb.ahash) & (2**64 - 1)).count("1")
            if d <= 6:
                truth[(a, b)] = d
    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in ahash_near_dup_pairs(
            ahash64(attach_synthetic_binary(docs)), max_hamming=6, bands=4
        ).collect()
    }
    # precision 1.0: everything reported is true at the exact distance
    for pair, d in got.items():
        assert truth.get(pair) == d, f"false/mis-scored pair {pair}"
    # pigeonhole recall: Hamming < 4 (= bands) is guaranteed found
    guaranteed = {p for p, d in truth.items() if d < 4}
    assert guaranteed <= set(got), "pigeonhole-guaranteed pair missed"
    # sanity: the planted near-dup structure produces at least one pair
    assert len(truth) > 0 and len(got) > 0


def test_shingle_prefix_filter_prunes(spark):
    """q_shingle_similarity_join's reason to exist (VERDICT r10 #4):
    on the word-3-gram SHINGLE vocabulary the PPJoin prefix filter
    must actually prune — |candidates| a small fraction of n(n-1)/2 —
    while recall stays exact (every planted truncated copy found).
    q_set_similarity_join's unigram run degenerates toward all-pairs
    on the fixture's ~31-token vocabulary; this pins the non-degenerate
    behavior on the SAME corpus the registered query joins over
    (llm_ops.shingle_corpus), so the docstring's pruning claim is a
    tested invariant, not prose."""
    from hadoop_log_analysis_spark.operators.dedup import (
        set_similarity_candidates,
    )
    from hadoop_log_analysis_spark.queries.llm_ops import (
        SHINGLE_COPY_MOD,
        SHINGLE_T,
        shingle_corpus,
    )

    docs = scan(spark, SF001, "documents").select("doc_id", "text")
    corpus = shingle_corpus(docs)
    n = corpus.count()
    all_pairs = n * (n - 1) / 2

    cands = set_similarity_candidates(corpus, SHINGLE_T)
    n_cands = cands.count()
    # the pruning claim: candidates are a sliver of the cross product
    # (unigram q_set_similarity_join's candidate set is ~all pairs)
    assert n_cands < 0.01 * all_pairs, (n_cands, all_pairs)

    # recall floor: every planted pair that ACTUALLY qualifies must
    # survive into the candidate set (the filter may only prune
    # NON-qualifying pairs; the exact verify downstream is
    # oracle-checked by the driver). Qualification is computed from
    # the real distinct-shingle sets rather than a word-count margin:
    # repeated 3-grams shrink a doc's shingle SET, so "(m-10)/(m-2)
    # >= t at m >= 42 words" over-claims on texts with duplicate
    # shingles (r11 review finding).
    off = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    sets = corpus.select(
        "doc_id", F.array_distinct(F.split("text", " ")).alias("sh")
    )
    a = sets.select(F.col("doc_id").alias("a_id"), F.col("sh").alias("sa"))
    b = sets.select(
        (F.col("doc_id") - F.lit(off)).alias("a_id"),
        F.col("doc_id").alias("b_id"),
        F.col("sh").alias("sb"),
    ).filter(F.col("b_id") >= off)
    planted = (
        a.join(b, "a_id")
        .withColumn(
            "jacc",
            F.size(F.array_intersect("sa", "sb"))
            / F.size(F.array_union("sa", "sb")),
        )
        .filter(F.col("jacc") >= SHINGLE_T)
        .select("a_id", "b_id")
    )
    n_planted = planted.count()
    assert n_planted > 0
    found = planted.join(
        cands.select("a_id", "b_id"), ["a_id", "b_id"], "left_semi"
    ).count()
    assert found == n_planted, (found, n_planted)


def test_ivf_topk_multi_matches_single_query_op(spark):
    """ivf_topk_multi on a 1-query frame must equal the trusted
    ann_ivf_topk (whose exact-within-probed-buckets identity is pinned
    above) — the multi-query generalization adds routing fan-out, not
    semantics."""
    from hadoop_log_analysis_spark.operators.similarity import (
        ivf_centroids,
        ivf_topk_multi,
    )

    emb = scan(spark, SF001, "embeddings")
    single = [(r.vec_id, r.sim) for r in ann_ivf_topk(emb, 0, k=10, n_probe=3).collect()]
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").cast("array<double>").alias("qvec"),
    )
    multi = [
        (r.vec_id, r.sim)
        for r in ivf_topk_multi(q, emb, ivf_centroids(emb), k=10, n_probe=3)
        .orderBy("rn")
        .collect()
    ]
    assert multi == single


def test_top_bigram_frac_runlength_mode_exact(spark):
    """r14 optimization guard: top_bigram_frac's within-row mode is now
    the longest equal-adjacent run of the SORTED bigram array (O(n log
    n)) instead of one filter pass per distinct bigram (O(n^2)); pin
    equality with the brute-force mode on ties, total repeats,
    single-token docs, and doubled-space empty tokens."""
    from collections import Counter

    from hadoop_log_analysis_spark.operators import text as TXT

    rows = [
        (1, "a b a b a c"),
        (2, "x"),
        (3, "t t t t"),
        (4, "a b c d"),
        (5, "q  w q  w"),
        (6, "z z y y z z"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r.f
        for r in df.select(
            "doc_id", TXT.top_bigram_frac().alias("f")
        ).collect()
    }
    for doc_id, text in rows:
        toks = text.split(" ")
        if len(toks) < 2:
            want = 0.0
        else:
            bg = [f"{toks[i]} {toks[i + 1]}" for i in range(len(toks) - 1)]
            want = max(Counter(bg).values()) / len(bg)
        assert abs(got[doc_id] - want) < 1e-12, (doc_id, got[doc_id], want)
