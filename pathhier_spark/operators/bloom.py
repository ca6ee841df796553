"""Deterministic Bloom filter + semi-join reduction.

The classic big-join optimization at cluster scale: when a huge fact table
joins a selective small side, build a Bloom filter over the small side's
keys and apply it as a MAP-SIDE pre-filter on the fact table BEFORE the
join's shuffle — rows that cannot match never enter the exchange. False
positives only cost a little extra shuffle (the exact join still runs);
false negatives are impossible, so the final result is byte-identical to
the unfiltered join (asserted in tests).

Everything is md5-derived (the engine-portable hex32 used throughout), so
the filter's bit words — and therefore every membership verdict — are
value-reproducible in SQL (q61's oracle rebuilds the identical bloom with
DuckDB bit_or). Words merge by bitwise OR, making the build one
combiner-friendly aggregate; the filter itself rides into the fact-table
scan as a literal word array (m_bits/64 longs — e.g. 64 literals for a
4096-bit filter), keeping membership a pure column expression."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _signed64(v: int) -> int:
    """Python int -> the signed two's-complement int64 Spark/DuckDB store."""
    v &= (1 << 64) - 1
    return v - (1 << 64) if v >= (1 << 63) else v


def _pow2_64() -> Column:
    return F.array(*[F.lit(_signed64(1 << b)).cast("long") for b in range(64)])


def _positions(key: Column, k: int, m_bits: int) -> list[Column]:
    return [
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"bloom:{i}:"), key.cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % F.lit(m_bits)
        for i in range(k)
    ]


def bloom_build(
    df: DataFrame, key_col: str, *, m_bits: int = 4096, k: int = 4
) -> DataFrame:
    """Build the filter: (word_idx, word) rows, one per non-zero 64-bit
    word. Each key sets k md5-derived bits; the aggregation is bit_or per
    word — partial-aggregatable, so the build is one combiner groupBy
    whose state is at most m_bits/64 rows regardless of input size.
    Filters over disjoint inputs merge by unioning and bit_or-ing again
    (asserted in tests)."""
    if m_bits % 64 != 0:
        raise ValueError(f"m_bits must be a multiple of 64, got {m_bits}")
    pow2 = _pow2_64()
    # NULL keys set no bits: md5(NULL) is NULL and would otherwise emit a
    # NULL word_idx that crashes bloom_words_literal. Dropping them matches
    # the equi-join the filter fronts for (NULL never equals anything), and
    # bloom_member likewise evaluates NULL -> filtered for a NULL probe key
    bits = df.filter(F.col(key_col).isNotNull()).select(
        F.explode(
            F.array(*[
                F.struct(
                    (pos / 64).cast("long").alias("word_idx"),
                    F.element_at(pow2, (pos % 64 + 1).cast("int")).alias("w"),
                )
                for pos in _positions(F.col(key_col), k, m_bits)
            ])
        ).alias("b")
    )
    return (
        bits.groupBy("b.word_idx")
        .agg(F.bit_or("b.w").alias("word"))
    )


def bloom_words_literal(bloom: DataFrame, *, m_bits: int) -> list[int]:
    """Collect the filter into a dense word list (driver-side, m_bits/64
    longs — 32 KB at one million bits); bounded by the FILTER size, never
    the data."""
    words = [0] * (m_bits // 64)
    for r in bloom.collect():
        words[r["word_idx"]] = r["word"]
    return words


def bloom_member(
    key: Column, words: list[int], *, m_bits: int, k: int = 4
) -> Column:
    """Membership as a pure column expression over the literal word array:
    every one of the key's k bits must be set. No shuffle, no join — this
    is the expression bloom_prune pushes into the fact-table scan."""
    words_lit = F.array(*[F.lit(int(w)).cast("long") for w in words])
    pow2 = _pow2_64()
    cond = None
    for pos in _positions(key, k, m_bits):
        word = F.element_at(words_lit, (pos / 64).cast("int") + 1)
        bit = F.element_at(pow2, (pos % 64 + 1).cast("int"))
        this = word.bitwiseAND(bit) != 0
        cond = this if cond is None else (cond & this)
    return cond


def bloom_prune(
    big: DataFrame,
    small_keys: DataFrame,
    *,
    big_key: str,
    small_key: str,
    m_bits: int = 4096,
    k: int = 4,
) -> DataFrame:
    """Semi-join reduction: filter `big` down to rows whose key MIGHT be in
    `small_keys`, map-side, before any join shuffle. The caller still runs
    the exact join on the pruned frame — the bloom never drops a matching
    row (no false negatives), so join-after-prune equals join-without-prune
    (asserted in tests); false positives just ride along into the exact
    join. Use when the small side is selective but too large or too late
    to broadcast the join itself."""
    bloom = bloom_build(small_keys, small_key, m_bits=m_bits, k=k)
    words = bloom_words_literal(bloom, m_bits=m_bits)
    return big.filter(
        bloom_member(F.col(big_key), words, m_bits=m_bits, k=k)
    )
