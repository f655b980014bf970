"""UDF / UDAF / UDTF surface U1-U5 (SURVEY.md §2.9).

The escape hatches, ranked slow to fast: row-at-a-time Python UDF
(U1 — demonstrated, never used in hot paths), Arrow-vectorized pandas
UDFs (U2 scalar, U3 grouped-agg), applyInPandas grouped-map (U4), and
Python UDTF (U5). Each query computes something a plain SQL oracle
can also compute, so even the Python paths are hash-verified — the
UDF machinery itself is what's under test.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf, udf, udtf

from hadoop_log_analysis_spark.queries import query
from hadoop_log_analysis_spark.sources.catalog import scan


@query(
    "q_python_udf",
    oracle="""
        SELECT doc_id, length(text) % 97 AS len_mod
        FROM documents
        ORDER BY doc_id
    """,
    tags=("U1",),
)
def q_python_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1: row-at-a-time scalar Python UDF (the slow path, verified
    against the equivalent SQL)."""

    @udf(returnType=T.LongType())
    def len_mod(s: str) -> int:
        return len(s) % 97

    docs = scan(spark, sf_dir, "documents")
    return docs.select("doc_id", len_mod("text").alias("len_mod")).orderBy("doc_id")


@query(
    "q_pandas_udf",
    oracle="""
        SELECT event_id, round(ln(1 + value) * 2.0, 6) AS lv
        FROM events
        ORDER BY event_id
    """,
    tags=("U2",),
)
def q_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2: Arrow-vectorized scalar pandas UDF (Series -> Series)."""

    @pandas_udf(T.DoubleType())
    def log_boost(v: pd.Series) -> pd.Series:
        import numpy as np

        return np.log1p(v) * 2.0

    ev = scan(spark, sf_dir, "events")
    return ev.select(
        "event_id", F.round(log_boost("value"), 6).alias("lv")
    ).orderBy("event_id")


@query(
    "q_pandas_udaf",
    oracle="""
        SELECT event_type, round(exp(avg(ln(value))), 6) AS geo_mean
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    tags=("U3",),
)
def q_pandas_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3: grouped-agg pandas UDAF — geometric mean per event type."""

    @pandas_udf(T.DoubleType())
    def geo_mean(v: pd.Series) -> float:
        import numpy as np

        return float(np.exp(np.log(v).mean()))

    ev = scan(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(F.round(geo_mean("value"), 6).alias("geo_mean"))
        .orderBy("event_type")
    )


@query(
    "q_apply_in_pandas",
    oracle="""
        SELECT user_id, round(max(abs((value - m) / sd)), 4) AS max_absz
        FROM (SELECT user_id, value,
                     avg(value) OVER (PARTITION BY user_id) AS m,
                     stddev_samp(value) OVER (PARTITION BY user_id) AS sd
              FROM events)
        GROUP BY user_id
        ORDER BY user_id
    """,
    tags=("U4",),
)
def q_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U4: grouped-map applyInPandas — per-user z-score normalization,
    reduced to the max |z| so the oracle stays SQL-expressible."""

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("max_absz", T.DoubleType()),
        ]
    )

    def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
        z = (pdf["value"] - pdf["value"].mean()) / pdf["value"].std(ddof=1)
        return pd.DataFrame(
            {"user_id": [pdf["user_id"].iloc[0]], "max_absz": [z.abs().max()]}
        )

    ev = scan(spark, sf_dir, "events").select("user_id", "value")
    grouped = ev.groupBy("user_id").applyInPandas(normalize, out_schema)
    return grouped.select(
        "user_id", F.round("max_absz", 4).alias("max_absz")
    ).orderBy("user_id")


@query(
    "q_udtf",
    oracle="""
        SELECT tok, count(*) AS n
        FROM (SELECT unnest(string_split(text, ' ')) AS tok
              FROM documents WHERE doc_id < 5)
        GROUP BY tok
        ORDER BY tok
    """,
    tags=("U5",),
)
def q_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U5: Python UDTF — one document row expands to one row per
    token; re-aggregated to token counts."""

    @udtf(returnType="tok: string")
    class Tokenize:
        def eval(self, text: str):
            for tok in text.split(" "):
                yield (tok,)

    spark.udtf.register("hla_tokenize", Tokenize)
    docs = scan(spark, sf_dir, "documents").filter(F.col("doc_id") < 5)
    docs.createOrReplaceTempView("__udtf_docs")
    toks = spark.sql(
        "SELECT t.tok FROM __udtf_docs, LATERAL hla_tokenize(text) AS t"
    )
    return toks.groupBy("tok").agg(F.count("*").alias("n")).orderBy("tok")
