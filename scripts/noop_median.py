"""Median-of-N noop-sink timing (guide §1 isolation discipline) for
named queries. Usage: python scripts/noop_median.py <n> <query> [...];
honors SPARK_GRAFT_SF_DIR (default sf0.1)."""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hadoop_log_analysis_spark.queries import load_registry  # noqa: E402
from hadoop_log_analysis_spark.session import get_spark  # noqa: E402


def main() -> None:
    n = int(sys.argv[1])
    names = sys.argv[2:]
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reg = load_registry()
    spark = get_spark(app_name="noop-median")
    spark.sparkContext.setLogLevel("ERROR")
    print(f"load_avg: {[round(x, 2) for x in os.getloadavg()]}")
    for name in names:
        fn = reg[name].fn
        spark.sparkContext.setJobDescription(f"{name}: warm")
        fn(spark, sf).write.format("noop").mode("overwrite").save()
        runs = []
        for i in range(n):
            spark.sparkContext.setJobDescription(f"{name}: run {i}")
            t0 = time.perf_counter()
            fn(spark, sf).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)
        print(f"RES {name} med={statistics.median(runs):.3f} "
              f"min={min(runs):.3f} max={max(runs):.3f}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
