"""Declared, verifiable query surface (SURVEY.md §2).

Every operator the engine claims is registered here as a
``QuerySpec``: a DataFrame-building callable ``(spark, sf_dir) ->
DataFrame`` plus, where SQL-expressible, a DuckDB oracle SQL string
computing the same result over the same parquet fixtures. The driver
hash-compares the two at sf0.01 (__spark_entry__.py docstring).

Discipline shared by every query (FIXTURES.md "oracle-comparison
rules"):

* alias every computed column identically on both sides;
* deterministic tie-breaks on every ORDER BY / LIMIT / window order;
* round floating aggregates identically on both sides (double sums
  are order-sensitive at the 1e-12 level; round(., 2) for sums,
  round(., 4+) for avgs/ratios);
* never emit raw ``events.ts`` — emit date_trunc buckets or integer
  ``ts_ns`` nanos (DuckDB: ``epoch_ns(ts)``).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None -> driver does rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)

    @property
    def doc(self) -> str:
        return (self.fn.__doc__ or "").strip()


REGISTRY: dict[str, QuerySpec] = {}

# Submodules that register queries on import, in SURVEY.md §2 order.
_MODULES = (
    "sources_q",
    "relational",
    "joins_q",
    "aggregates",
    "windows_q",
    "setops",
    "scalar_fns",
    "advanced",
    "analytics_q",
    "llm_ops",
    "pipeline_q",
    "udfs",
    "streaming_q",
    "scale_q",
)


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator registering a query (and optional DuckDB oracle)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, tags=tuple(tags))
        return fn

    return deco


def load_registry() -> dict[str, QuerySpec]:
    """Import all query modules and return the populated registry."""
    for mod in _MODULES:
        importlib.import_module(f"hadoop_log_analysis_spark.queries.{mod}")
    return REGISTRY
