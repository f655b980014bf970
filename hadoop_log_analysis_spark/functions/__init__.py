"""Shared scalar expression helpers (SURVEY.md §2.7)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def ts_us(col: str = "ts_ns") -> Column:
    """Event time as integer epoch MICROseconds.

    The exact cross-engine time unit: DuckDB 1.0.0 truncates the
    fixtures' ns timestamps to µs on read (`epoch_us(ts)`), and
    integer `div 1000` on the raw nanos matches that truncation
    exactly. Use this — never raw ns — in any oracle-compared
    ordering, gap, or range boundary.
    """
    return F.expr(f"{col} div 1000")
