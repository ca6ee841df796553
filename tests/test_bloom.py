"""Bloom filter + semi-join reduction (operators/bloom.py)."""

import pytest
from pyspark.sql import functions as F


def test_bloom_prune_is_transparent_and_selective(spark):
    """Join-after-prune must equal join-without-prune (no false negatives),
    and the prune must actually drop non-matching rows."""
    from pathhier_spark.operators.bloom import bloom_prune

    big = spark.range(0, 20000).select(
        (F.col("id") % 1000).alias("k"), F.col("id").alias("payload")
    )
    small = spark.range(0, 1000).filter(F.col("id") % 50 == 0).select(
        F.col("id").alias("k")
    )  # 20 of 1000 keys
    pruned = bloom_prune(big, small, big_key="k", small_key="k")
    n_big, n_pruned = big.count(), pruned.count()
    assert n_pruned < n_big * 0.1  # 2% of keys match; fp rate is small

    plain = big.join(small, "k").orderBy("payload").collect()
    via_bloom = pruned.join(small, "k").orderBy("payload").collect()
    assert via_bloom == plain  # byte-identical result


def test_bloom_member_no_false_negatives_and_merge(spark):
    from pathhier_spark.operators.bloom import (
        bloom_build,
        bloom_member,
        bloom_words_literal,
    )

    a = spark.range(0, 100).select(F.col("id").alias("k"))
    b = spark.range(100, 200).select(F.col("id").alias("k"))
    both = a.unionByName(b)
    merged = (
        bloom_build(a, "k").unionByName(bloom_build(b, "k"))
        .groupBy("word_idx")
        .agg(F.bit_or("word").alias("word"))
    )
    whole = {
        (r["word_idx"], r["word"]) for r in bloom_build(both, "k").collect()
    }
    got = {(r["word_idx"], r["word"]) for r in merged.collect()}
    assert got == whole  # OR-mergeable: union of builds == build of union

    words = bloom_words_literal(bloom_build(both, "k"), m_bits=4096)
    probe = spark.range(0, 200).select(F.col("id").alias("k")).withColumn(
        "m", bloom_member(F.col("k"), words, m_bits=4096)
    )
    assert all(r["m"] for r in probe.collect())  # every inserted key hits


def test_bloom_member_plan_is_map_only(spark):
    from pathhier_spark.operators.bloom import (
        bloom_build,
        bloom_member,
        bloom_words_literal,
    )

    small = spark.range(0, 50).select(F.col("id").alias("k"))
    words = bloom_words_literal(bloom_build(small, "k"), m_bits=4096)
    big = spark.range(0, 1000).select(F.col("id").alias("k"))
    out = big.filter(bloom_member(F.col("k"), words, m_bits=4096))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # the filter is a pure column expression


def test_bloom_build_guard(spark):
    from pathhier_spark.operators.bloom import bloom_build

    df = spark.range(3).select(F.col("id").alias("k"))
    with pytest.raises(ValueError):
        bloom_build(df, "k", m_bits=100)


def test_bloom_prune_null_keys(spark):
    from pyspark.sql import functions as F

    from pathhier_spark.operators.bloom import bloom_prune

    big = spark.createDataFrame(
        [(1, "a"), (2, "b"), (None, "c"), (3, "d")], "k long, v string"
    )
    small = spark.createDataFrame([(1,), (None,), (3,)], "k long")
    # NULL keys must neither crash the build nor survive the prune (an
    # equi-join would drop them too)
    pruned = bloom_prune(big, small, big_key="k", small_key="k")
    got = {r["v"] for r in pruned.collect()}
    exact = {
        r["v"] for r in big.join(small.distinct(), "k", "left_semi").collect()
    }
    assert exact <= got  # no false negatives
    assert "c" not in got  # NULL probe key filtered like the equi-join
