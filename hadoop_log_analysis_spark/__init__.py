"""hadoop_log_analysis_spark — a PySpark-native batch/stream log-analytics engine.

A from-scratch, Spark-first engine with the query surface of the
reference repo ``ankurdave/hadoop-log-analysis`` (classic Hadoop batch
log analytics: parse line-oriented logs, relational aggregates, top-k,
time rollups, dimension joins), extended with LLM-data-pipeline
operators (dedup, similarity search, multimodal columns, text
analysis).

The reference checkout at /root/reference is empty (SURVEY.md §0), so
the binding operator inventory is SURVEY.md §2; every operator is
declared in :mod:`hadoop_log_analysis_spark.queries` and verified
against a DuckDB oracle.

Design principles (SURVEY.md §4):

* DataFrame-first: every operator is ``(spark, sf_dir) -> DataFrame``;
  Catalyst owns pushdown, pruning, join selection, partial aggregation.
* JVM-side expressions in the hot path; Arrow-batched pandas UDFs only
  where built-ins cannot express the semantics (MinHash, SimHash,
  multimodal decode).
* Scale posture: AQE on, broadcast hints for dims, salting/bucketing
  documented per operator for the 100 TB target (see SCALE.md).
"""

from hadoop_log_analysis_spark.session import configure_session, get_spark
from hadoop_log_analysis_spark.sources.catalog import TABLES, scan

__all__ = ["configure_session", "get_spark", "scan", "TABLES"]
