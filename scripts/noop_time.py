"""Annex-method timing (1 warm + 1 timed noop-sink run) for named
queries. Usage: python scripts/noop_time.py <query> [...]; honors
SPARK_GRAFT_SF_DIR (default sf0.1)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hadoop_log_analysis_spark.queries import load_registry  # noqa: E402
from hadoop_log_analysis_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reg = load_registry()
    spark = get_spark(app_name="noop-time")
    spark.sparkContext.setLogLevel("ERROR")
    print(f"load_avg: {[round(x, 2) for x in os.getloadavg()]}")
    for name in names:
        fn = reg[name].fn
        spark.sparkContext.setJobDescription(f"{name}: warm")
        fn(spark, sf).write.format("noop").mode("overwrite").save()
        spark.sparkContext.setJobDescription(f"{name}: timed")
        t0 = time.perf_counter()
        fn(spark, sf).write.format("noop").mode("overwrite").save()
        print(f"RES {name} {time.perf_counter() - t0:.3f}s", flush=True)
        spark.sparkContext.setJobDescription(None)
    spark.stop()


if __name__ == "__main__":
    main()
