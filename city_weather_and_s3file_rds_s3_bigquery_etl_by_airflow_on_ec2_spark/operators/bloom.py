"""Bloom-filter semi-join pre-filter: cut fact-side shuffle volume
before a non-broadcastable join.

The scale problem this solves: a selective dimension that is too big
to broadcast as a hash relation forces a shuffle of the ENTIRE fact
side into the sort-merge join, even though most fact rows will not
survive the join.  A Bloom filter of the dimension keys is kilobytes
regardless of dimension row width, so it CAN ship to every fact
partition, and `might_contain` drops non-matching fact rows *before*
the fact-side Exchange — the same idea as Spark's AQE runtime bloom
filter (spark.sql.optimizer.runtime.bloomFilter.*), exposed here as
an explicit, composable operator with a chosen m/k.

Semantics: a Bloom filter has false positives but NO false negatives,
so `bloom_semi_join` (pre-filter + exact semi-join on the survivors)
is bit-equal to the plain semi-join — the oracle for the registry
entry is the plain `EXISTS` SQL.

Implementation is expression-only on the hot path: the k probe bit
positions are `pmod(xxhash64(key, seed_i), m)` (JVM-side; the forall
probe is an interpreted higher-order expression but never Python),
and the bitmap is a constant-folded array<long> literal in the
filter expression.  The build side collects the DISTINCT set bit
positions to the driver — bounded by m_bits (default 2^16 → at most
65 536 ints, a metadata-scale collect like operators/ids.py's
per-bucket offsets, NOT data-scale) — then packs them into
m_bits/64 longs.

Sizing: false-positive rate ≈ (1 - e^(-k·n/m))^k; the default
m=2^16, k=5 holds fpr < 1 % up to n ≈ 6 500 build keys and degrades
gracefully (false positives only cost wasted shuffle, never wrong
results).  At 100 TB with a 10^8-key build side, pick m = 2^30
(128 MiB bitmap): too big for an expression literal, at which point
use the same `_bit_positions` columns with a broadcast DataFrame of
set words and an equi-join on word index — the operator's contract
(prefilter, then exact join) is unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bit_positions(key: Column, m_bits: int, k: int) -> list[Column]:
    """k probe positions in [0, m_bits): xxhash64 seeded by probe
    index (seed goes through the hashed tuple, not the xxhash64 seed
    argument, so one codegen'd hash family serves all k)."""
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m_bits)).cast("int")
        for i in range(k)
    ]


def build_bloom(keys: DataFrame, key_col: str,
                m_bits: int = 1 << 16, k: int = 5) -> list[int]:
    """Build the bitmap from the (already filtered) build side →
    list of m_bits/64 signed longs.

    Distributed part: per-row position arrays explode into a DISTINCT
    on ≤ m_bits ints (map-side partial distinct makes the shuffle at
    most m_bits rows per partition).  Driver part: pack bits — bounded
    by the bitmap size, independent of build-side row count."""
    if m_bits % 64 != 0 or m_bits <= 0:
        raise ValueError(f"m_bits must be a positive multiple of 64: {m_bits}")
    pos = (keys.select(
        F.explode(F.array(*_bit_positions(F.col(key_col), m_bits, k)))
        .alias("p")).distinct())
    words = [0] * (m_bits // 64)
    for (p,) in pos.collect():
        words[p >> 6] |= 1 << (p & 63)
    # LongType literals are signed
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def might_contain(bitmap: list[int], key: Column,
                  m_bits: int, k: int) -> Column:
    """Expression-only membership probe: AND over the k bit tests.
    The bitmap array literal is constant-folded once by Catalyst, not
    rebuilt per row."""
    arr = F.array(*[F.lit(w).cast("long") for w in bitmap])
    probes = F.array(*_bit_positions(key, m_bits, k))

    def _bit_set(pos: Column) -> Column:
        word = F.element_at(arr, F.shiftright(pos, 6) + F.lit(1))
        # pyspark's F.shiftleft only accepts a Python-int shift; the SQL
        # function takes an expression, so call it directly
        mask = F.call_function("shiftleft", F.lit(1).cast("long"),
                               F.pmod(pos, F.lit(64)))
        return word.bitwiseAND(mask) != F.lit(0)

    # forall keeps ONE copy of the bitmap literal in the expression
    # tree (an unrolled k-way AND would embed it k times per side —
    # constant-folded either way, but 10 printed copies of a
    # 1024-long array make plans unreadable and bloat the driver's
    # serialized plan)
    return F.forall(probes, _bit_set)


def bloom_semi_join(fact: DataFrame, dim: DataFrame,
                    fact_key: str, dim_key: str,
                    m_bits: int = 1 << 16, k: int = 5) -> DataFrame:
    """Semi-join `fact` to `dim` with a Bloom pre-filter on the fact
    side, then the exact semi-join over the survivors (merge-hinted:
    the operator exists precisely for dims too big to broadcast).
    Bit-equal to ``fact SEMI JOIN dim`` — no false negatives."""
    bitmap = build_bloom(dim.select(dim_key).distinct(), dim_key, m_bits, k)
    pre = fact.where(might_contain(bitmap, F.col(fact_key), m_bits, k))
    return pre.join(dim.hint("merge"),
                    F.col(fact_key) == F.col(dim_key), "left_semi")
