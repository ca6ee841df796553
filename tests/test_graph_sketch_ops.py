"""Fuzzy join (length-band blocking), triangle counting, HyperLogLog."""

import math

import pytest
from pyspark.sql import functions as F

from pathhier_spark.operators.graph import triangle_count
from pathhier_spark.operators.linking import fuzzy_join, fuzzy_vocab_pairs
from pathhier_spark.operators.textstats import (
    _tokens,
    hll_estimate,
    hll_registers,
)


def test_fuzzy_join_finds_within_band(spark):
    left = spark.createDataFrame([("kitten",), ("apple",)], "name string")
    right = spark.createDataFrame(
        [("sitten",), ("kitte",), ("banana",), ("apple",)], "name string"
    )
    out = {
        (r["name"], r["_r_name"], r["dist"])
        for r in fuzzy_join(left, right, "name", max_dist=1).collect()
    }
    assert ("kitten", "sitten", 1) in out
    assert ("kitten", "kitte", 1) in out
    assert ("apple", "apple", 0) in out
    assert all(d <= 1 for (_, _, d) in out)
    assert not any(b == "banana" for (_, b, _) in out)


def test_fuzzy_join_band_is_lossless(spark):
    # brute force over a small vocab at max_dist=2 equals the banded join
    words = ["spark", "spork", "sprk", "shark", "sharks", "quartz", "a"]
    df = spark.createDataFrame([(w,) for w in words], "name string")
    got = {
        (r["name"], r["_r_name"])
        for r in fuzzy_join(df, df, "name", max_dist=2).collect()
    }

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    want = {(a, b) for a in words for b in words if lev(a, b) <= 2}
    assert got == want


def test_fuzzy_vocab_pairs(spark):
    docs = spark.createDataFrame(
        [(0, "color colour analyse analyze xy"), (1, "color colour")],
        "doc_id long, text string",
    )
    out = {
        (r["a"], r["b"]): r["dist"]
        for r in fuzzy_vocab_pairs(docs, _tokens("text"), max_dist=1).collect()
    }
    assert out[("color", "colour")] == 1
    assert out[("analyse", "analyze")] == 1
    # 'xy' is below min_len and absent; pairs are a < b only
    assert all(a < b for (a, b) in out)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_triangle_count_known_graph(spark):
    # K4 on {0,1,2,3} (every node in C(3,2)=3 triangles) plus a pendant 4
    pairs = [(a, b) for a in range(4) for b in range(4) if a < b] + [(0, 4)]
    out = {r["node"]: r["n_tri"] for r in triangle_count(_edges(spark, pairs)).collect()}
    assert out == {0: 3, 1: 3, 2: 3, 3: 3}


def test_triangle_count_canonicalizes_input(spark):
    # duplicates, both directions, and self-loops must not change counts
    messy = [(0, 1), (1, 0), (1, 2), (2, 1), (0, 2), (0, 0), (0, 1)]
    out = {r["node"]: r["n_tri"] for r in triangle_count(_edges(spark, messy)).collect()}
    assert out == {0: 1, 1: 1, 2: 1}


def test_triangle_count_no_triangles(spark):
    out = triangle_count(_edges(spark, [(0, 1), (1, 2), (2, 3)])).collect()
    assert out == []


def test_hll_registers_merge_by_max(spark):
    vals = spark.range(2000).select(F.col("id").cast("string").alias("v"))
    a = vals.limit(1000)
    b = vals.subtract(a)
    full = hll_registers(vals, "v")
    merged = (
        hll_registers(a, "v")
        .unionByName(hll_registers(b, "v"))
        .groupBy("j")
        .agg(F.max("reg").alias("reg"))
    )
    assert {(r["j"], r["reg"]) for r in full.collect()} == {
        (r["j"], r["reg"]) for r in merged.collect()
    }


def test_hll_estimate_accuracy(spark):
    # 1.04/sqrt(64) ~ 13% standard error; allow 3 sigma
    for n in (500, 5000):
        vals = spark.range(n).select(F.col("id").cast("string").alias("v"))
        est = hll_estimate(hll_registers(vals, "v")).collect()[0]["est"]
        assert abs(est - n) / n < 0.4, (n, est)


def test_hll_small_range_correction(spark):
    # tiny cardinality -> zero registers remain -> linear counting branch
    vals = spark.range(10).select(F.col("id").cast("string").alias("v"))
    regs = hll_registers(vals, "v")
    row = hll_estimate(regs).collect()[0]
    assert row["n_zero"] > 0
    m = 64
    assert row["est"] == pytest.approx(m * math.log(m / row["n_zero"]), rel=1e-12)
    assert abs(row["est"] - 10) < 5


def test_hll_rejects_non_power_of_two(spark):
    vals = spark.range(4).select(F.col("id").cast("string").alias("v"))
    with pytest.raises(ValueError):
        hll_registers(vals, "v", m=48)


def test_fuzzy_join_long_strings_use_gram_path(spark):
    # strings with > q*d distinct grams take the prefix-gram path; brute
    # force equality proves it lossless on realistic-length words
    words = [
        "statistics", "statistcs", "statistical", "mathematics",
        "mathematic", "mathematisc", "completely", "different",
    ]
    df = spark.createDataFrame([(w,) for w in words], "name string")
    got = {
        (r["name"], r["_r_name"])
        for r in fuzzy_join(df, df, "name", max_dist=2).collect()
    }

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    want = {(a, b) for a in words for b in words if lev(a, b) <= 2}
    assert got == want
