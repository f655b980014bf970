"""Skew mitigation: salted aggregation and salted join (SURVEY.md §4
"skew handling").

AQE's skew-join splitting (enabled in session.REQUIRED_CONFS) is the
first line of defense and needs no code. These operators are the
*explicit* fallback for the cases AQE cannot fix at 100 TB:

* a hot grouping key whose single partial-agg partition still
  overwhelms one task -> ``salted_agg`` splits it into ``n_salts``
  partial groups, then reduces the partials (two-phase, both phases
  map-side combinable);
* a broadcast-too-large / shuffle join with one hot key ->
  ``salted_join`` replicates the small side ``n_salts`` times and
  scatters the big side deterministically, so the hot key spreads
  over ``n_salts`` tasks.

Both are RESULT-PRESERVING rewrites — the registry queries that use
them carry full DuckDB oracles proving output equality with the
unsalted formulation.

The salt is ``pmod(xxhash64(unique_col), n)``, not ``rand()``:
deterministic reruns (retried tasks must not re-salt differently —
rand() in a salt is a correctness bug under task retry, since a
replayed partition would route rows to different salts than the
partials already reduced).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salt_col(unique_col: str | Column, n_salts: int) -> Column:
    col = F.col(unique_col) if isinstance(unique_col, str) else unique_col
    return F.pmod(F.xxhash64(col), F.lit(n_salts)).cast("int")


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    unique_col: str,
    n_salts: int = 16,
    aggs: dict[str, str] | None = None,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    Phase 1 groups by (keys..., salt) — the hot key's rows split over
    ``n_salts`` partial groups; phase 2 reduces partials by keys alone.
    Supported aggs (name -> source col): count, sum, min, max — the
    decomposable ones (avg = sum/count composed by the caller).
    """
    aggs = aggs or {"n": "count:*"}
    partial_exprs, final_exprs = [], []
    for out, spec in aggs.items():
        op, col = spec.split(":")
        if op == "count":
            partial_exprs.append(F.count("*").alias(f"__p_{out}"))
            final_exprs.append(F.sum(f"__p_{out}").alias(out))
        elif op == "sum":
            partial_exprs.append(F.sum(col).alias(f"__p_{out}"))
            final_exprs.append(F.sum(f"__p_{out}").alias(out))
        elif op == "min":
            partial_exprs.append(F.min(col).alias(f"__p_{out}"))
            final_exprs.append(F.min(f"__p_{out}").alias(out))
        elif op == "max":
            partial_exprs.append(F.max(col).alias(f"__p_{out}"))
            final_exprs.append(F.max(f"__p_{out}").alias(out))
        else:
            raise ValueError(f"non-decomposable agg {op!r}")
    partial = df.groupBy(*keys, salt_col(unique_col, n_salts).alias("__salt")).agg(
        *partial_exprs
    )
    return partial.groupBy(*keys).agg(*final_exprs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    big_unique_col: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: small side replicated ``n_salts``x, big side
    salted deterministically; join on (key, salt).

    Replication costs |small| * n_salts — use when the small side fits
    n_salts-fold but one big-side key floods a single shuffle task.
    """
    salts = small.crossJoin(
        F.broadcast(
            small.sparkSession.range(n_salts).select(
                F.col("id").cast("int").alias("__salt")
            )
        )
    )
    big_salted = big.withColumn("__salt", salt_col(big_unique_col, n_salts))
    joined = big_salted.join(
        salts,
        (big_salted[big_key] == salts[small_key])
        & (big_salted["__salt"] == salts["__salt"]),
        how,
    )
    return joined.drop("__salt")
