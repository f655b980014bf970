"""Broadcast Bloom-filter semi-join prefilter.

The 100 TB pattern: a big fact table must be semi-joined against a
key set that is too large to broadcast as an exact hash set but whose
*Bloom bitmap* is tiny (m bits regardless of key width). Building the
bitmap costs one aggregate over the key side; probing is a pure
map-side expression on the fact side, so ~(1 - selectivity) of the
fact rows are dropped BEFORE the shuffle of the exact verification
join. This is the manual, deterministic twin of Spark's own runtime
row-level Bloom filter (`spark.sql.optimizer.runtime.bloomFilter.*`),
kept explicit so the plan is assertable and the bitmap is reusable
across queries.

Exactness: the Bloom probe alone admits false positives (never false
negatives), so callers MUST keep the exact semi-join after the
prefilter — the composition is exactly equal to the plain semi-join,
which is what the DuckDB oracle of q_bloom_prefilter_join verifies.

Sizing: fpp ≈ (1 - e^(-k·n/m))^k. The default m = 2^20 bits (128 KiB
as 16 Ki longs) holds n = 100k keys at k = 3 under fpp ≈ 2 %; at
larger n, scale m linearly (the bitmap is an array<long> literal in
the plan, so keep it ≤ a few MiB — past that, switch to Spark's
runtime Bloom which ships the bitmap as a proper broadcast, or raise
`max_build_keys` knowingly).

Everything JVM-side: xxhash64 + shift/AND run inside whole-stage
codegen; the only driver action is collecting the m/64-long bitmap
(bounded by construction, independent of data size).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Fixed, documented seeds -> k = len(SEEDS) hash functions.
SEEDS = (0x9E3779B9, 0x85EBCA6B, 0xC2B2AE35)


def _shl1(bits: Column) -> Column:
    """1L << bits with a Column shift amount (F.shiftleft only accepts
    a Python-int amount; the SQL function accepts a column)."""
    return F.call_function("shiftleft", F.lit(1).cast("long"), bits)


def _positions(col: Column, m_bits: int) -> list[Column]:
    """k bit positions of a key, each in [0, m_bits)."""
    return [
        F.pmod(F.xxhash64(col, F.lit(seed)), F.lit(m_bits)) for seed in SEEDS
    ]


def bloom_build(keys: DataFrame, key_col: str, m_bits: int = 1 << 20) -> list[int]:
    """Aggregate the key side into an m_bits Bloom bitmap.

    One distributed pass: explode each key's k positions, map to
    (word = pos div 64, mask = 1 << (pos mod 64)), bit_or per word.
    Returns the dense m_bits/64 signed-long word list (driver-side,
    bounded: 16 Ki longs at the default m — NOT proportional to data).
    """
    if m_bits % 64 != 0:
        raise ValueError(f"m_bits must be a multiple of 64, got {m_bits}")
    pos = F.explode(F.array(*_positions(F.col(key_col), m_bits))).alias("pos")
    sparse = (
        keys.select(pos)
        .distinct()
        .select(
            (F.col("pos") / 64).cast("int").alias("word"),
            _shl1((F.col("pos") % 64).cast("int")).alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("mask"))
        .collect()
    )
    words = [0] * (m_bits // 64)
    for row in sparse:
        words[row["word"]] = row["mask"]
    return words


def bloom_might_contain(col: Column, words: list[int], m_bits: int) -> Column:
    """Pure-expression Bloom probe: True if every one of the key's k
    bits is set in the bitmap (false positives possible, negatives
    impossible). The bitmap rides in the plan as an array<long>
    literal, so the probe is a codegen'd map-side predicate."""
    lit_words = F.lit(words)
    checks = []
    for pos in _positions(col, m_bits):
        word = F.element_at(lit_words, (pos / 64).cast("int") + F.lit(1))
        mask = _shl1((pos % 64).cast("int"))
        checks.append(word.bitwiseAND(mask) == mask)
    out = checks[0]
    for c in checks[1:]:
        out = out & c
    return out


def bloom_semi_join(
    fact: DataFrame,
    keys: DataFrame,
    fact_key: str,
    keys_key: str,
    m_bits: int = 1 << 20,
) -> DataFrame:
    """Exact left-semi join with a Bloom prefilter on the fact side.

    Plan shape: fact -> Filter(bloom probe, map-side) -> shuffled
    LeftSemi against the key set. The final semi-join keeps the result
    exact; the Bloom filter only shrinks what reaches its shuffle.
    No broadcast hint on the verify join on purpose: the premise of
    this operator is a key set too big to broadcast (AQE may still
    choose broadcast at toy scale — harmless)."""
    words = bloom_build(keys.select(keys_key), keys_key, m_bits)
    pruned = fact.where(bloom_might_contain(F.col(fact_key), words, m_bits))
    return pruned.join(
        keys.select(F.col(keys_key).alias(fact_key)).distinct(),
        on=fact_key,
        how="left_semi",
    )
