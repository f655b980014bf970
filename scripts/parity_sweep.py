"""Full-registry Spark-vs-DuckDB parity sweep at an arbitrary SF.

The evidence machinery behind BASELINE.md's tri-scale claims: runs
every `__spark_entry__.queries()` entry against its `oracle_sql()`
string (rows + schema + order-insensitive value hash — the driver's
exact comparator) and prints one line per rows-only/FAIL query plus a
final `DONE: <n> mismatches over <m> queries` summary.

Usage:
    python scripts/parity_sweep.py [sf_dir]     # default sf0.1

Notes (learned the hard way):
- 24 GiB driver heap: sf0.1's largest result (q_containment_join,
  8.28M rows) dies fetching through a long-lived default-heap sweep
  JVM (the r8 "sweep-harness memory artifact"); with 24g the r9 sweep
  was the first fully-clean sf0.1 run.
- Console progress bars off: \r-frames corrupt machine-read stdout
  (memory/bench-json discipline).
"""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from hadoop_log_analysis_spark.oracle import compare_frames, run_oracle  # noqa: E402


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = (
        SparkSession.builder.master("local[16]")
        .appName("parity-sweep")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    bad = 0
    for name, fn in queries.items():
        try:
            spdf = fn(spark, sf).toPandas()
        except Exception as e:  # noqa: BLE001 — record and continue
            bad += 1
            print(f"FAIL {name}: spark {type(e).__name__}: {e}", flush=True)
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"rows-only {name}: {len(spdf)}", flush=True)
            continue
        try:
            opdf = run_oracle(sql, sf)
        except Exception as e:  # noqa: BLE001
            bad += 1
            print(f"FAIL {name}: oracle {type(e).__name__}: {e}", flush=True)
            continue
        problems = compare_frames(spdf, opdf)
        if problems:
            bad += 1
            print(f"FAIL {name}: " + " | ".join(problems), flush=True)
    print(f"DONE: {bad} mismatches over {len(queries)} queries")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
