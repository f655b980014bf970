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


def subus_key(ts_us_col: Column, id_col: str = "event_id") -> Column:
    """Collision-proof sub-microsecond ordering key: ``µs*100 + id%100``.

    Truncating ns timestamps to µs can collapse two events onto one
    instant, where argmin/argmax/as-of tie-breaks would diverge
    across engines; folding the low id digits into the sub-µs slot
    makes the key unique per event while preserving time order.
    Safe range: epoch-µs ~1.7e15 * 100 = 1.7e17 < 2^63. Mirror in
    oracles with ``epoch_us(ts) * 100 + event_id % 100``.
    """
    return ts_us_col * 100 + F.col(id_col) % 100


def pin(col: Column, dp: int) -> Column:
    """Algorithm-explicit decimal pin: ``floor(x * 10^dp + 0.5) / 10^dp``.

    The cross-engine-safe replacement for ``F.round`` in any
    oracle-hash-compared output (r7, VERDICT r6 "Next round" #7):
    Spark's round() is BigDecimal-of-shortest-string HALF_UP while
    DuckDB's is nearbyint(x*10^dp) half-even — two different
    ALGORITHMS that diverge on the same double whenever the value
    sits on an exact decimal midpoint, which ratios of small integer
    counts (k/32, k/128, k/160...) hit deterministically. floor has
    no tie-break rule: identical doubles in, identical doubles out.
    Mirror in the oracle with ``floor((expr) * 10000.0 + 0.5) /
    10000.0`` (see sql_pin).
    """
    g = float(10**dp)
    return F.floor(col * F.lit(g) + F.lit(0.5)) / F.lit(g)


def sql_pin(expr: str, dp: int) -> str:
    """DuckDB mirror of :func:`pin` for oracle strings."""
    g = f"{float(10 ** dp):.1f}"
    return f"floor(({expr}) * {g} + 0.5) / {g}"


def exact_avg(col: Column | str, dp: int) -> Column:
    """Order-free cross-engine AVG of a double column (aggregate).

    ``avg(x)`` over doubles is partition-order-dependent (float sums
    don't commute), so even a pinned final avg pins two engines'
    slightly-different doubles — the q_embedding_covariance r5/r6
    lesson. This pins EACH ROW to the 1e-dp integer grid first
    (identical per-row doubles -> identical grid ints), accumulates
    as exact order-free int64, and performs ONE double division by
    count * 10^dp — bit-identical on both engines by construction.
    Mirror in the oracle with :func:`sql_exact_avg`. int64 headroom:
    |x| * 10^dp * rows must stay < 2^63 (~9.2e18) — holds for
    bounded ratios/scores at dp<=6 up to ~1e12 rows.
    """
    g = float(10**dp)
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(F.floor(c * F.lit(g) + F.lit(0.5)).cast("long")).cast(
        "double"
    ) / (F.count("*").cast("double") * F.lit(g))


def sql_exact_avg(expr: str, dp: int) -> str:
    """DuckDB mirror of :func:`exact_avg` for oracle strings."""
    g = f"{float(10 ** dp):.1f}"
    return (
        f"CAST(sum(CAST(floor(({expr}) * {g} + 0.5) AS BIGINT)) AS DOUBLE)"
        f" / (CAST(count(*) AS DOUBLE) * {g})"
    )


def money(col: Column | str) -> Column:
    """Exact DECIMAL(18,2) view of a 2-dp money double.

    The fixtures' money columns (o_totalprice, l_extendedprice,
    *_acctbal, events.value, l_discount/l_tax) are 2-dp decimals
    stored as the nearest double; casting back to DECIMAL(18,2)
    recovers the exact decimal identically on both engines (the
    stored double is never ON a 2-dp midpoint — exact midpoints have
    exact binary representations and exact casts). All downstream
    arithmetic on the decimal is exact and order-free, eliminating
    the round(sum(double)) fragility class the sf0.1 sweep falsified
    in q_hhi_concentration (BASELINE.md r6 addendum 3). Mirror in
    oracles with ``CAST(c AS DECIMAL(18,2))``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("decimal(18,2)")


def rate(col: Column | str) -> Column:
    """Exact DECIMAL(5,2) view of a 2-dp rate double (discount/tax).

    Use in revenue expressions: ``money(price) * (F.lit(1).cast(
    "decimal(5,2)") - rate(disc))`` is exact DECIMAL(24,4) per line
    (the q_hhi_concentration idiom). Mirror in oracles with
    ``(1 - CAST(d AS DECIMAL(5,2)))``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("decimal(5,2)")


def money_sum(col: Column | str) -> Column:
    """Order-free money total: exact DECIMAL sum displayed as double.

    Replaces ``F.round(F.sum(money_double), 2)``: the double sum can
    land within an ulp of a 2-dp boundary and flip with accumulation
    order (observed at sf0.1); the decimal sum is exact, and the ONE
    final decimal->double conversion is IEEE round-to-nearest of the
    same exact rational on both engines. Mirror with
    :func:`sql_money_sum`.
    """
    return F.sum(money(col)).cast("double")


def sql_money_sum(expr: str) -> str:
    """DuckDB mirror of :func:`money_sum` for oracle strings."""
    return f"CAST(sum(CAST({expr} AS DECIMAL(18,2))) AS DOUBLE)"


def exact_sum(col: Column | str, dp: int) -> Column:
    """Order-free cross-engine SUM of computed double terms.

    Per-row 1e-dp grid pin -> exact int64 accumulation -> ONE double
    division by 10^dp (the :func:`exact_avg` recipe without the
    count): for sums of per-row float expressions (log terms, scores)
    whose engine float sum is partition-order-dependent. Mirror with
    :func:`sql_exact_sum`. Same int64 headroom note as exact_avg.
    """
    g = float(10**dp)
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(F.floor(c * F.lit(g) + F.lit(0.5)).cast("long")).cast(
        "double"
    ) / F.lit(g)


def sql_exact_sum(expr: str, dp: int) -> str:
    """DuckDB mirror of :func:`exact_sum` for oracle strings."""
    g = f"{float(10 ** dp):.1f}"
    return (
        f"CAST(sum(CAST(floor(({expr}) * {g} + 0.5) AS BIGINT)) AS DOUBLE)"
        f" / {g}"
    )
