"""Capture .explain('formatted') for named queries into plans/<round>/ (HLA_PLANS_ROUND, default r15).

Usage: python scripts/capture_plans.py <suffix> <query> [<query> ...]
Writes plans/<round>/<query>_<suffix>.txt. SPARK_GRAFT_SF_DIR overrides
the default sf0.1 input.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hadoop_log_analysis_spark.queries import load_registry  # noqa: E402
from hadoop_log_analysis_spark.session import get_spark  # noqa: E402

def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", os.environ.get("HLA_PLANS_ROUND", "r15"))
    os.makedirs(out_dir, exist_ok=True)
    reg = load_registry()
    spark = get_spark(app_name="capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = reg[name].fn(spark, sf)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"))
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    spark.stop()

if __name__ == "__main__":
    main()
