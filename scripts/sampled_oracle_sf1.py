#!/usr/bin/env python3
"""Hash-grade sf1 evidence for the oracle-infeasible pair queries.

VERDICT r10 "What's missing" #3: four queries' exactness at sf1 rests
on sf0.1 proof + 10x-count consistency because their brute-force
DuckDB oracles are O(N^2)-infeasible at 50k docs. The sf1 probe's
replicas are key-disjoint and within-replica relationships are
preserved EXACTLY (Caesar char rotation is a token-identity bijection;
replica 0 is byte-identical to sf0.1; key shift is +i*1e9), so the
full-sf1 Spark execution's WITHIN-REPLICA output, key-unshifted, must
hash-equal the sf0.1 brute-force oracle. This runs the queries at FULL
sf1 (all 10 replicas in the corpus — candidate generation, prefix
filters, LSH banding and shuffles all see the 10x data) and compares:

* q_containment_join, q_set_similarity_join (and, r11,
  q_shingle_similarity_join with its planted-copy id remap):
  replica-7 slice (a NON-trivial Caesar-rotated, key-shifted
  replica), ids -7e9, vs the sf0.1 oracle. Jaccard/containment are integer-ratio exact, so the
  rotated replica must match to the last 4-dp digit. Cross-replica
  pairs (possible only through the shared digit/punct token space) are
  counted and reported; per-replica output counts must be uniform.
* q_embedding_near_dups: replica-0 slice (byte-identical vectors —
  float accumulation order is preserved only for the unrotated
  replica), with the planted-copy tier offsets remapped from the sf1
  max-id offset to the sf0.1 one, vs the sf0.1 oracle.
* q_two_core: the output is a global 5-column summary, so slicing the
  output is impossible; instead the SAME pipeline runs once over full
  sf1 with the final summary GROUPED BY replica (nodes never cross
  replicas: parts co-purchase only within an order, orders are
  replica-disjoint) — all 10 per-replica rows must equal the sf0.1
  oracle's single row.

q_sparse_cosine_pairs itself is NOT coverable by this method: its idf
term is ln(corpus_n/df) — corpus-size-dependent, so within-replica
cosines at sf1 are legitimately different numbers than at sf0.1, and
the output is a global top-20. r12 (VERDICT r11 "What's missing" #3)
restores hash-grade sf1 evidence through the SHARD-LOCAL variant
(queries.llm_ops.sparse_cosine_pairs_sharded, registered as
q_sparse_cosine_pairs_by_source): sparse_cosine_check runs it at full
sf1 with shard = replica, where the shard-local idf over one replica
EQUALS sf0.1's global idf, so the replica-7 top-20, key-remapped, must
hash-equal the PLAIN query's sf0.1 oracle. That exercises the same
tf/df/df-cut/postings-join/norm/cosine pipeline on the 10x corpus;
the 101 GB dedicated-session DuckDB run remains the only direct
evidence for the global-idf normalizer itself.

Usage:
    python scripts/sampled_oracle_sf1.py [--sf1 .tmp/sf1] [--names ...]

Prints one PASS/FAIL line per query + a DONE summary; exit 1 on any
FAIL. Needs the sf1 probe dir (scripts/make_scale_probe.py).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF01 = "/root/testdata/sf0.1"
KEY_OFF = 1_000_000_000
TOKEN_REPLICA = 7  # a non-trivial Caesar/key-shift replica


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf1", default=os.path.join(REPO, ".tmp", "sf1"))
    ap.add_argument("--names", nargs="*", default=None)
    args = ap.parse_args()

    os.environ.setdefault("HLA_DRIVER_MEM", "24g")

    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from hadoop_log_analysis_spark.oracle import compare_frames, run_oracle
    from hadoop_log_analysis_spark.session import get_spark
    from hadoop_log_analysis_spark.sources.catalog import scan

    spark = get_spark(app_name="hla-sampled-oracle-sf1")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    bad = 0

    def report(name: str, problems: list[str], extra: str = "") -> None:
        nonlocal bad
        if problems:
            bad += 1
            print(f"FAIL {name}: " + " | ".join(problems), flush=True)
        else:
            print(f"PASS {name} {extra}", flush=True)

    def token_pair_check(name: str) -> None:
        """Full-sf1 run; replica-7 slice, -7e9, vs the sf0.1 oracle.
        Cached: counts + slice both derive from one join run (ADVICE
        r11 on shingle_check; same fix here)."""
        df = queries[name](spark, args.sf1).persist()
        rep_a = (F.col("a_id") / KEY_OFF).cast("long")
        rep_b = (F.col("b_id") / KEY_OFF).cast("long")
        try:
            per = (
                df.groupBy(rep_a.alias("ra"), rep_b.alias("rb"))
                .count().collect()
            )
            within = {int(r["ra"]): int(r["count"]) for r in per
                      if r["ra"] == r["rb"]}
            n_cross = sum(int(r["count"]) for r in per if r["ra"] != r["rb"])
            sliced = (
                df.filter((rep_a == TOKEN_REPLICA) & (rep_b == TOKEN_REPLICA))
                .withColumn("a_id", F.col("a_id") - TOKEN_REPLICA * KEY_OFF)
                .withColumn("b_id", F.col("b_id") - TOKEN_REPLICA * KEY_OFF)
                .toPandas()
            )
        finally:
            df.unpersist()
        opdf = run_oracle(oracles[name], SF01)
        problems = compare_frames(sliced, opdf)
        counts = sorted(within.values())
        if len(within) != 10 or counts[0] != counts[-1]:
            problems.append(f"per-replica counts not uniform: {within}")
        report(name, problems,
               f"(replica {TOKEN_REPLICA} slice {len(sliced)} rows == sf0.1 "
               f"oracle; 10x{counts[0] if counts else 0} uniform; "
               f"cross-replica pairs {n_cross})")

    def embedding_check(name: str = "q_embedding_near_dups") -> None:
        """Full-sf1 run; planted-tier ids remapped off_sf1 -> off_sf0.1."""
        off1 = scan(spark, args.sf1, "embeddings").agg(
            F.max("vec_id")).collect()[0][0] + 1
        off01 = scan(spark, SF01, "embeddings").agg(
            F.max("vec_id")).collect()[0][0] + 1

        def remap(c):
            col = F.col(c)
            return (
                F.when(col < off1, col)
                .when(col < 2 * off1, col - off1 + off01)
                .otherwise(col - 2 * off1 + 2 * off01)
            ).alias(c)

        df = queries[name](spark, args.sf1)
        # every surviving pair must live in the replica-0 + planted-id
        # space (base ids < KEY_OFF or planted >= off1); any other id
        # is a cross-replica leak
        leak = df.filter(
            ((F.col("a_id") >= KEY_OFF) & (F.col("a_id") < off1))
            | ((F.col("b_id") >= KEY_OFF) & (F.col("b_id") < off1))
        ).count()
        mapped = (
            queries[name](spark, args.sf1)
            .select(remap("a_id"), remap("b_id"), "sim")
            .toPandas()
        )
        opdf = run_oracle(oracles[name], SF01)
        problems = compare_frames(mapped, opdf)
        if leak:
            problems.append(f"{leak} pairs outside replica-0+planted space")
        report(name, problems,
               f"(full sf1 output {len(mapped)} rows remapped == sf0.1 "
               f"oracle; leak 0)")

    def shingle_check(name: str = "q_shingle_similarity_join") -> None:
        """Full-sf1 run of the r11 shingle join; replica-7 slice vs the
        sf0.1 oracle. Same soundness as token_pair_check — Caesar
        rotation is a word bijection, so 3-gram shingle sets rotate
        with it and within-replica shingle Jaccard is invariant — plus
        one planted-copy wrinkle: copies live at base_id + off where
        off = max(doc_id)+1 of the WHOLE corpus, so replica-7 copy ids
        remap as (id - off_sf1) - 7e9 + off_sf0.1. Replica membership
        of a copy is its base doc's replica. The copy-selection
        predicate (doc_id % 25 == 0) survives the +7e9 key shift
        because 7e9 % 25 == 0 (true of every i*1e9, i = 0..9)."""
        off1 = scan(spark, args.sf1, "documents").agg(
            F.max("doc_id")).collect()[0][0] + 1
        off01 = scan(spark, SF01, "documents").agg(
            F.max("doc_id")).collect()[0][0] + 1

        def rep_of(c):
            col = F.col(c)
            base = F.when(col < off1, col).otherwise(col - off1)
            return (base / KEY_OFF).cast("long")

        def remap(c):
            col = F.col(c)
            return (
                F.when(col < off1, col - TOKEN_REPLICA * KEY_OFF)
                .otherwise(col - off1 - TOKEN_REPLICA * KEY_OFF + off01)
            ).alias(c)

        # cache the join output: the per-replica counts AND the
        # replica-7 slice both derive from it, and the full-sf1 join
        # costs ~18 s+ per run (ADVICE r11 — the r11 version executed
        # it twice)
        df = queries[name](spark, args.sf1).persist()
        try:
            per = (
                df.groupBy(rep_of("a_id").alias("ra"),
                           rep_of("b_id").alias("rb"))
                .count().collect()
            )
            within = {int(r["ra"]): int(r["count"]) for r in per
                      if r["ra"] == r["rb"]}
            n_cross = sum(int(r["count"]) for r in per if r["ra"] != r["rb"])
            sliced = (
                df.filter(
                    (rep_of("a_id") == TOKEN_REPLICA)
                    & (rep_of("b_id") == TOKEN_REPLICA)
                )
                .select(remap("a_id"), remap("b_id"), "jacc")
                .toPandas()
                .sort_values(["a_id", "b_id"])
                .reset_index(drop=True)
            )
        finally:
            df.unpersist()
        opdf = run_oracle(oracles[name], SF01)
        problems = compare_frames(sliced, opdf)
        counts = sorted(within.values())
        if len(within) != 10 or counts[0] != counts[-1]:
            problems.append(f"per-replica counts not uniform: {within}")
        report(name, problems,
               f"(replica {TOKEN_REPLICA} slice {len(sliced)} rows == sf0.1 "
               f"oracle; 10x{counts[0] if counts else 0} uniform; "
               f"cross-replica pairs {n_cross})")

    def sparse_cosine_check(name: str = "q_sparse_cosine_pairs") -> None:
        """Shard-local-idf run at full sf1 with shard = replica; the
        replica-7 top-20, key-remapped, vs the PLAIN query's sf0.1
        oracle. Sound because a replica is an exact Caesar-rotated,
        key-shifted copy of sf0.1: shard-local nd and df equal sf0.1's
        global ones, so every within-replica weight — and therefore
        every 6-dp-rounded cosine — is the same number; the remap is
        order-preserving within a replica, so the per-shard top-20 tie
        break selects the same pairs."""
        from hadoop_log_analysis_spark.queries.llm_ops import (
            sparse_cosine_pairs_sharded,
        )

        # unlike shingle_check there is no planted-copy id tier here:
        # every doc_id comes straight from the documents table, so
        # replica membership and the remap are plain div/shift
        docs = (
            scan(spark, args.sf1, "documents")
            .select("doc_id", "text")
            .withColumn(
                "__rep", (F.col("doc_id") / KEY_OFF).cast("long")
            )
        )
        out = sparse_cosine_pairs_sharded(docs, "__rep", 20).persist()

        def remap(c):
            return (F.col(c) - TOKEN_REPLICA * KEY_OFF).alias(c)

        try:
            per = {int(r["__rep"]): int(r["n"]) for r in out.groupBy(
                "__rep").agg(F.count("*").alias("n")).collect()}
            sliced = (
                out.filter(F.col("__rep") == TOKEN_REPLICA)
                .select(remap("a_id"), remap("b_id"), "cos_sim")
                .toPandas()
            )
        finally:
            out.unpersist()
        opdf = run_oracle(oracles[name], SF01)
        problems = compare_frames(sliced, opdf)
        counts = sorted(per.values())
        if len(per) != 10 or counts[0] != counts[-1]:
            problems.append(f"per-replica counts not uniform: {per}")
        report(name, problems,
               f"(replica {TOKEN_REPLICA} top-{len(sliced)} == sf0.1 "
               f"oracle via shard-local idf; 10x{counts[0] if counts else 0}"
               " uniform)")

    def two_core_check(name: str = "q_two_core") -> None:
        """q_two_core's pipeline (graph_q.py:919) over full sf1 with the
        summary grouped per replica — 10 rows, each == the sf0.1 oracle
        row. Degrees/peels run on the full 10x edge set; correctness of
        the grouping rests on replica-disjoint orders (probe design)."""
        basket = (
            scan(spark, args.sf1, "lineitem")
            .select("l_orderkey", "l_partkey")
            .distinct()
        )
        a, b = basket.alias("a"), basket.alias("b")
        pairs = (
            a.join(
                b,
                (F.col("b.l_orderkey") == F.col("a.l_orderkey"))
                & (F.col("b.l_partkey") > F.col("a.l_partkey")),
            )
            .select(
                F.col("a.l_partkey").alias("pa"),
                F.col("b.l_partkey").alias("pb"),
            )
            .distinct()
        )
        e0 = pairs.select(
            F.col("pa").alias("p"), F.col("pb").alias("q")
        ).unionAll(pairs.select(F.col("pb").alias("p"), F.col("pa").alias("q")))

        def degrees(e):
            return e.groupBy("p").agg(F.count("*").alias("d"))

        def peel(e, keep):
            k1 = keep.select(F.col("p").alias("kp"))
            k2 = keep.select(F.col("p").alias("kq"))
            return (
                e.join(k1, F.col("p") == F.col("kp"))
                .join(k2, F.col("q") == F.col("kq"))
                .select("p", "q")
            )

        rep = (F.col("p") / KEY_OFF).cast("long").alias("rep")
        d0 = degrees(e0)
        keep1 = d0.filter(F.col("d") >= 2).select("p")
        e1 = peel(e0, keep1)
        d1 = degrees(e1)
        keep2 = d1.filter(F.col("d") >= 2).select("p")
        e2 = peel(e1, keep2)
        d2 = degrees(e2)
        core = d2.filter(F.col("d") >= 2)
        n0 = d0.groupBy(rep).agg(F.count("*").alias("n_nodes"))
        n1 = keep1.groupBy(rep).agg(F.count("*").alias("n_after_pass1"))
        nc = core.groupBy(rep).agg(
            F.count("*").alias("n_core_nodes"),
            (F.coalesce(F.sum("d"), F.lit(0)) / 2)
            .cast("long")
            .alias("core_edges_lb"),
        )
        md = d2.groupBy(rep).agg(
            F.coalesce(F.max("d"), F.lit(0)).cast("long")
            .alias("max_core_degree")
        )
        per = (
            n0.join(n1, "rep").join(nc, "rep").join(md, "rep")
            .orderBy("rep")
            .toPandas()
        )
        opdf = run_oracle(oracles[name], SF01)
        problems = []
        if len(per) != 10:
            problems.append(f"expected 10 replica rows, got {len(per)}")
        for _, row in per.iterrows():
            one = per[per["rep"] == row["rep"]].drop(columns=["rep"])
            problems.extend(
                f"rep {int(row['rep'])}: {p}"
                for p in compare_frames(one.reset_index(drop=True), opdf)
            )
        report(name, problems, f"(10 per-replica rows == sf0.1 oracle)")

    todo = args.names or [
        "q_two_core",
        "q_embedding_near_dups",
        "q_set_similarity_join",
        "q_containment_join",
        "q_shingle_similarity_join",
        "q_sparse_cosine_pairs",
    ]
    for name in todo:
        if name == "q_two_core":
            two_core_check()
        elif name == "q_embedding_near_dups":
            embedding_check()
        elif name == "q_shingle_similarity_join":
            shingle_check()
        elif name == "q_sparse_cosine_pairs":
            sparse_cosine_check()
        else:
            token_pair_check(name)

    print(f"DONE: {bad} mismatches over {len(todo)} queries", flush=True)
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
