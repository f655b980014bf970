#!/usr/bin/env python3
"""Time the heaviest queries at sf0.1 vs the derived sf1 scale probe.

VERDICT r9 "What's missing" #2(c): the scaling evidence between bench
scale and the 100 TB design arguments. For each timed query, run the
bench methodology (1 warm + N fresh-plan executions, median) at BOTH
scale dirs and report the per-query scaling exponent

    alpha = log(t_sf1 / t_sf0.1) / log(10)

(alpha ~ 1.0 = linear in data, < 1 = fixed-cost amortizing, > 1 =
superlinear — the shape that predicts a scale cliff). The three
quadratic-ORACLE pair queries (whose DuckDB brute-force twin is
infeasible at 50k docs) run Spark-side only at sf1, recording rows +
time — their exactness is already proven against brute force at
sf0.01/sf0.1; here the question is whether the PLAN's work scales
linearly, which the runtime answers.

Results land in SCALE.md ("sf1 scale probe" section). Run after
scripts/make_scale_probe.py:

    python scripts/scale_probe_time.py [--runs 3] [--out .tmp/scale_probe.json]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASE = "/root/testdata/sf0.1"
PROBE = os.path.join(REPO, ".tmp", "sf1")

# The heaviest batch rows of the bench suite (streaming rows excluded:
# their cost is microbatch-scheduler fixed overhead, already priced in
# BASELINE.md — a 10x drop-dir would time the scheduler, not the data).
TIMED = (
    "q_pagerank_tokens",
    "q_semantic_dedup",
    "q_adamic_adar",
    "q_bfs_hops",
    "q_triangle_count",
    "q_bloom_prefilter_join",
    "q_pricing_summary",
    "q_asof_join",
    "q_join5",
    "q_sessionize",
    "q_image_ahash_dedup",
    "q_bigram_lm_score",
)

# Heavy pair-generators whose ORACLE is brute-force-quadratic
# (infeasible at 50k docs); Spark side runs + counts only.
SPARK_ONLY = (
    "q_containment_join",
    "q_set_similarity_join",
    "q_embedding_near_dups",
)


def median_time(fn, spark, sf_dir: str, runs: int) -> tuple[float, int]:
    df = fn(spark, sf_dir)
    n = df.count()  # warm: plan build + codegen + file listing
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()  # fresh plan: full execution
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts), n


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--out",
                    default=os.path.join(REPO, ".tmp", "scale_probe.json"))
    args = ap.parse_args()

    from hadoop_log_analysis_spark.queries import load_registry
    from hadoop_log_analysis_spark.session import get_spark

    os.environ.setdefault("HLA_DRIVER_MEM", "24g")
    registry = load_registry()
    spark = get_spark(app_name="hla-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    import math

    result: dict = {"runs": args.runs, "timed": {}, "spark_only": {},
                    "load_avg_start": [round(x, 2) for x in os.getloadavg()]}
    for name in TIMED:
        fn = registry[name].fn
        t0, n0 = median_time(fn, spark, BASE, args.runs)
        t1, n1 = median_time(fn, spark, PROBE, args.runs)
        alpha = math.log(t1 / t0) / math.log(10.0)
        result["timed"][name] = {
            "sf0.1_sec": round(t0, 3), "sf1_sec": round(t1, 3),
            "sf0.1_rows": n0, "sf1_rows": n1,
            "alpha": round(alpha, 2),
        }
        print(f"{name}: {t0:.2f}s -> {t1:.2f}s  alpha={alpha:.2f} "
              f"rows {n0} -> {n1}", flush=True)

    for name in SPARK_ONLY:
        fn = registry[name].fn
        t0, n0 = median_time(fn, spark, BASE, 1)
        t1, n1 = median_time(fn, spark, PROBE, 1)
        alpha = math.log(t1 / t0) / math.log(10.0)
        result["spark_only"][name] = {
            "sf0.1_sec": round(t0, 3), "sf1_sec": round(t1, 3),
            "sf0.1_rows": n0, "sf1_rows": n1,
            "alpha": round(alpha, 2),
        }
        print(f"{name} (spark-only): {t0:.2f}s -> {t1:.2f}s "
              f"alpha={alpha:.2f} rows {n0} -> {n1}", flush=True)

    result["load_avg_end"] = [round(x, 2) for x in os.getloadavg()]
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    spark.stop()
    print(json.dumps({k: v for k, v in result.items() if k != "runs"},
                     separators=(",", ":"))[:1800], flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
