"""One-line plan-shape audit per query: Exchange count, join strategies,
Python-eval nodes, SortAggregate presence, scan partition hints.

Usage: python scripts/plan_audit.py [query ...]   (default: bench HEADLINE)
"""
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hadoop_log_analysis_spark.queries import load_registry  # noqa: E402
from hadoop_log_analysis_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    if not names:
        import bench
        names = [n for n in bench.HEADLINE]
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reg = load_registry()
    spark = get_spark(app_name="plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted")
    for name in names:
        try:
            df = reg[name].fn(spark, sf)
            plan = df._jdf.queryExecution().explainString(mode)
        except Exception as e:  # streaming queries can't explain batch
            print(f"{name:32s} SKIP ({type(e).__name__})")
            continue
        n_ex = len(re.findall(r"\bExchange\b", plan))
        n_bex = len(re.findall(r"BroadcastExchange", plan))
        joins = "+".join(sorted(set(re.findall(
            r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
            r"BroadcastNestedLoopJoin|CartesianProduct)", plan))))
        py = "+".join(sorted(set(re.findall(
            r"(BatchEvalPython|ArrowEvalPython|MapInPandas|MapInArrow|"
            r"FlatMapGroupsInPandas)", plan))))
        sortagg = plan.count("SortAggregate")
        objagg = plan.count("ObjectHashAggregate")
        print(f"{name:32s} ex={n_ex - n_bex:2d} bex={n_bex} "
              f"sortAgg={sortagg} objAgg={objagg} "
              f"joins=[{joins}] py=[{py}]")
    spark.stop()


if __name__ == "__main__":
    main()
