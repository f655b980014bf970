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


# The cross-engine integer pseudo-random: Knuth's multiplicative-hash
# constant and a prime modulus, computable bit-identically in BOTH
# engines (Spark's xxhash64 and DuckDB's hash() are different
# functions, so neither may appear in an oracle-checked sampler).
# SINGLE definition — q_weighted_sample, q_train_val_test_split, and
# q_bootstrap_ci all alias these (r4 review: three divergent copies
# risked a fix landing in one site only). If a larger modulus is ever
# needed (id * MULT approaching 2^63), change it HERE.
HASH_MULT = 2654435761
HASH_MOD = 1_000_003
