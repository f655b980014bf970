"""DuckDB differential-oracle harness (SURVEY.md §5 t2).

Mirrors the driver's correctness gate: run the Spark query and the
oracle SQL over the same parquet fixtures, then compare row count,
column names, and order-insensitive canonicalized values. Used by the
local pytest suite so every registered query is validated BEFORE the
driver runs it.
"""

from __future__ import annotations

import math
from typing import Any

import duckdb
import pandas as pd

from hadoop_log_analysis_spark.sources.catalog import TABLES


def duckdb_connection(sf_dir: str) -> "duckdb.DuckDBPyConnection":
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb_connection(sf_dir)
    try:
        return con.execute(sql).df()
    finally:
        con.close()


def _canon_cell(v: Any) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        if v == 0.0:
            v = 0.0  # fold -0.0
        return repr(v)
    if isinstance(v, pd.Timestamp):
        if pd.isna(v):
            return "NULL"
        return v.isoformat()
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (int, bool, str)):
        return str(v)
    # numpy scalars and anything else with .item()
    item = getattr(v, "item", None)
    if item is not None:
        return _canon_cell(item())
    if pd.isna(v):
        return "NULL"
    return str(v)


def canonical_rows(df: pd.DataFrame) -> list[tuple[str, ...]]:
    """Sort columns by name, canonicalize cells, sort rows — the
    order-insensitive value comparison the driver's hash implies."""
    df = df.reindex(sorted(df.columns), axis=1)
    return sorted(
        tuple(_canon_cell(v) for v in row) for row in df.itertuples(index=False)
    )


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    """Return a list of human-readable mismatch descriptions (empty = match)."""
    problems: list[str] = []
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
    s_cols, o_cols = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if s_cols != o_cols:
        problems.append(f"columns: spark={s_cols} oracle={o_cols}")
        return problems
    s_rows, o_rows = canonical_rows(spark_pdf), canonical_rows(oracle_pdf)
    if s_rows != o_rows:
        diff_s = [r for r in s_rows if r not in set(o_rows)][:5]
        diff_o = [r for r in o_rows if r not in set(s_rows)][:5]
        problems.append(
            f"values differ (cols={s_cols}); spark-only sample: {diff_s}; "
            f"oracle-only sample: {diff_o}"
        )
    return problems
