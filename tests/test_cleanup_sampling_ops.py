"""Repeated-n-gram stripping, weighted sampling, grouped percentiles,
label propagation."""

import math

import pytest
from pyspark.sql import functions as F

from pathhier_spark.operators.graph import label_propagation
from pathhier_spark.operators.sampling import weighted_sample
from pathhier_spark.operators.textstats import (
    grouped_value_percentiles,
    strip_repeated_ngrams,
)


def test_strip_repeated_ngrams_basic(spark):
    df = spark.createDataFrame(
        [
            (0, "click here click here click here now"),
            (1, "a b c d e"),
            (2, "x y"),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r for r in strip_repeated_ngrams(df, "text").collect()
    }
    # positions 3,4 start repeats of 'click here click' / 'here click here'
    assert rows[0]["clean_text"] == "click here click here now"
    assert rows[0]["n_dropped"] == 2
    # no repetition: untouched
    assert rows[1]["clean_text"] == "a b c d e" and rows[1]["n_dropped"] == 0
    # shorter than n: kept whole
    assert rows[2]["clean_text"] == "x y" and rows[2]["n_dropped"] == 0
    assert rows[3]["clean_text"] == "" and rows[3]["n_dropped"] == 0


def test_strip_repeated_ngrams_doubled_doc(spark):
    df = spark.createDataFrame(
        [(0, "p q r s t p q r s t")], "doc_id long, text string"
    )
    row = strip_repeated_ngrams(df, "text").collect()[0]
    # grams starting at positions 6-8 repeat grams 1-3 and are dropped;
    # the 2-token tail starts no gram and survives
    assert row["clean_text"] == "p q r s t s t"
    assert row["n_dropped"] == 3


def test_weighted_sample_deterministic_and_biased(spark):
    df = spark.range(1000).select(
        F.col("id").alias("k"),
        F.when(F.col("id") < 100, F.lit(100)).otherwise(F.lit(1)).alias("w"),
    )
    a = [r["k"] for r in weighted_sample(df, "k", "w", 50).collect()]
    b = [r["k"] for r in weighted_sample(df.repartition(7), "k", "w", 50).collect()]
    assert sorted(a) == sorted(b)  # partitioning-invariant
    # heavy rows (10% of keys, 100x weight) should dominate the sample
    heavy = sum(1 for k in a if k < 100)
    assert heavy > 25
    # zero/NULL weights never selected
    df2 = df.withColumn(
        "w", F.when(F.col("k") == 0, F.lit(0)).otherwise(F.col("w"))
    )
    assert 0 not in {
        r["k"] for r in weighted_sample(df2, "k", "w", 1000).collect()
    }


def test_weighted_sample_matches_formula(spark):
    import hashlib

    df = spark.range(20).select(
        F.col("id").alias("k"), (F.col("id") + 1).alias("w")
    )
    got = {r["k"]: r["skey"] for r in weighted_sample(df, "k", "w", 20).collect()}
    for k, skey in got.items():
        h = int(hashlib.md5(f"wsample:{k}".encode()).hexdigest()[:8], 16)
        want = math.log((h + 1) / 2**32) / (k + 1)
        assert skey == pytest.approx(want, rel=1e-12)


def test_grouped_percentiles(spark):
    rows = [("a", v) for v in range(1, 101)] + [("b", v) for v in (5, 5, 9)]
    df = spark.createDataFrame(rows, "g string, v long")
    out = {r["g"]: r for r in grouped_value_percentiles(df, "g", "v").collect()}
    # group a: 1..100 -> rank floor(99*q)+1
    assert out["a"]["p50"] == 50 and out["a"]["p90"] == 90
    assert out["a"]["p99"] == 99
    # group b: [5,5,9] -> rank floor(2*q)+1; p50 and p90 both hit rank 2
    # -> 5 (numpy percentile method='lower' agrees), p99 too
    assert out["b"]["p50"] == 5 and out["b"]["p90"] == 5
    assert out["b"]["p99"] == 5


def test_label_propagation_two_cliques(spark):
    # two triangles bridged by one edge: communities = the cliques
    edges = [(0, 1), (1, 2), (0, 2), (10, 11), (11, 12), (10, 12), (2, 10)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = {r["node"]: r["label"] for r in label_propagation(df).collect()}
    assert out[0] == out[1]
    assert out[10] == out[11] == out[12]
    assert out[0] != out[11]


def test_label_propagation_deterministic_ties(spark):
    # single edge: both nodes see one neighbor label; after round 1 they
    # swap; fixed rounds => deterministic final state across runs
    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    a = sorted(label_propagation(df, iterations=3).collect())
    b = sorted(label_propagation(df.repartition(5), iterations=3).collect())
    assert a == b


# --- cross-split leakage audit (q137, round 5) ---

def test_split_leakage_hand_computed(spark):
    from pathhier_spark.operators.sampling import split_leakage

    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (4, 5)], "id_a long, id_b long"
    )
    splits = spark.createDataFrame(
        [(1, "train"), (2, "train"), (3, "test"), (4, "val"), (5, "test")],
        "doc_id long, split string",
    )
    got = {
        (r["split_lo"], r["split_hi"]): (r["n_pairs"], r["is_cross"])
        for r in split_leakage(pairs, splits).collect()
    }
    # (1,2) train-train diag; (1,3) train-test leak; (4,5) test-val leak
    # (least/greatest canonicalizes val/test -> (test, val))
    assert got[("train", "train")] == (1, 0)
    assert got[("test", "train")] == (1, 1)
    assert got[("test", "val")] == (1, 1)
    assert len(got) == 3


# --- temperature-scaled mixture allocation (q144, round 5) ---

def test_temperature_allocation_hand_case(spark):
    from pathhier_spark.operators.sampling import temperature_allocation

    # en: 16 tokens, de: 4 tokens, fr: 1 token -> sqrt masses 4:2:1
    docs = spark.createDataFrame(
        [
            (1, " ".join(["w"] * 16), "en"),
            (2, " ".join(["w"] * 4), "de"),
            (3, "w", "fr"),
        ],
        "doc_id long, text string, lang string",
    )
    got = {
        r["lang"]: (r["n_tokens"], r["w_fp"], r["alloc_tokens"])
        for r in temperature_allocation(docs, budget=700).collect()
    }
    # weights 4000:2000:1000 -> exact 400/200/100
    assert got["en"] == (16, 4000, 400)
    assert got["de"] == (4, 2000, 200)
    assert got["fr"] == (1, 1000, 100)


def test_temperature_allocation_sums_to_budget(spark):
    from pathhier_spark.operators.sampling import temperature_allocation

    docs = spark.createDataFrame(
        [
            (1, " ".join(["a"] * 7), "en"),
            (2, " ".join(["b"] * 3), "de"),
            (3, " ".join(["c"] * 2), "fr"),
            (4, " ".join(["d"] * 5), "es"),
        ],
        "doc_id long, text string, lang string",
    )
    rows = temperature_allocation(docs, budget=1001).collect()
    assert sum(r["alloc_tokens"] for r in rows) == 1001
    # alpha = 0.5 compresses: the smallest lang's share exceeds its
    # proportional share, the largest lang's is below it
    shares = {r["lang"]: r["alloc_tokens"] / 1001 for r in rows}
    assert shares["fr"] > 2 / 17
    assert shares["en"] < 7 / 17


def test_cluster_safe_split_has_zero_leakage(spark, sf_dir):
    """The q162 property: splitting by near-dup CLUSTER id makes
    cross-split near-dup pairs impossible, where doc-id splitting
    (q55/q137) leaks."""
    from pathhier_spark.operators.sampling import split_leakage
    from pathhier_spark.queries import (
        q11_neardup_pairs,
        q162_cluster_safe_splits,
    )

    pairs = q11_neardup_pairs(spark, sf_dir).select("id_a", "id_b")
    splits = q162_cluster_safe_splits(spark, sf_dir).select(
        "doc_id", "split"
    )
    leaks = split_leakage(pairs, splits).filter("is_cross = 1").collect()
    assert leaks == []


def test_cluster_safe_split_members_share_split(spark, sf_dir):
    from pyspark.sql import functions as F

    from pathhier_spark.queries import q162_cluster_safe_splits

    out = q162_cluster_safe_splits(spark, sf_dir)
    n_bad = (
        out.groupBy("cluster")
        .agg(F.countDistinct("split").alias("ns"))
        .filter("ns > 1")
        .count()
    )
    assert n_bad == 0


def test_set_cover_greedy_hand_case(spark):
    """set_cover_select (q186): the textbook greedy trace — biggest doc
    first, gains count only UNCOVERED tokens, min-id tie-break, early
    stop when everything coverable is covered."""
    import pytest as _pytest

    from pathhier_spark.operators.sampling import set_cover_select

    rows = [
        (1, ["a", "b", "c"]),        # 3 fresh tokens -> picked first
        (2, ["c", "d"]),             # then gains 1 (d)
        (3, ["a", "b"]),             # never gains after doc 1
        (4, ["d"]),                  # subset of doc 2's contribution
    ]
    df = spark.createDataFrame(rows, "doc_id long, toks array<string>")
    got = [
        (r["sel"], r["doc_id"], r["gain"], r["n_covered"])
        for r in set_cover_select(df, k=4).orderBy("sel").collect()
    ]
    # round 0: doc 1 (gain 3); round 1: doc 2 (gain 1, covers d);
    # round 2: best gain is 0 -> early stop
    assert got == [(0, 1, 3, 3), (1, 2, 1, 4)]

    # min-id tie-break: two identical docs -> lower id wins
    tie = spark.createDataFrame(
        [(7, ["x", "y"]), (5, ["x", "y"])], "doc_id long, toks array<string>"
    )
    got = set_cover_select(tie, k=2).collect()
    assert [(r["sel"], r["doc_id"]) for r in got] == [(0, 5)]

    with _pytest.raises(ValueError):
        set_cover_select(df, k=0)


def test_pareto_frontier_hand_case(spark):
    """(2,7) dominates everything at x<=2 with y<=7; (3,1) survives as
    the only x=3 point; exact duplicates of a frontier point all stay;
    NULL-signal rows are disqualified."""
    from pathhier_spark.operators.sampling import pareto_frontier2d

    df = spark.createDataFrame(
        [(1, 1, 5), (2, 2, 5), (3, 2, 5), (4, 1, 6), (5, 3, 1),
         (6, 2, 7), (7, 2, 7), (8, None, 9)],
        "doc_id long, x long, y long",
    )
    got = sorted(
        map(tuple, pareto_frontier2d(df, x_col="x", y_col="y").collect())
    )
    assert got == [(5, 3, 1), (6, 2, 7), (7, 2, 7)]


def test_pareto_frontier_equals_brute_force(spark):
    from pathhier_spark.operators.sampling import pareto_frontier2d

    pts = [(i, (i * 7) % 23, (i * 13) % 19) for i in range(200)]
    df = spark.createDataFrame(pts, "doc_id long, x long, y long")
    got = sorted(
        map(tuple, pareto_frontier2d(df, x_col="x", y_col="y").collect())
    )
    want = sorted(
        (i, x, y)
        for (i, x, y) in pts
        if not any(
            bx >= x and by >= y and (bx > x or by > y)
            for (_, bx, by) in pts
        )
    )
    assert got == want


def test_priority_sample_exact_when_k_covers_all(spark):
    from pathhier_spark.operators.sampling import priority_sample_sums

    # k >= population: tau is NULL -> estimator degrades to the exact sum
    rows = [("a", 1, 10), ("a", 2, 20), ("b", 3, 5)]
    df = spark.createDataFrame(rows, "event_type string, event_id long, w long")
    got = {
        r["event_type"]: (r["n_items"], r["exact_sum"], r["n_sampled"],
                          r["est_sum"])
        for r in priority_sample_sums(df, k=100).collect()
    }
    assert got["a"] == (2, 30, 2, 30.0)
    assert got["b"] == (1, 5, 1, 5.0)


def test_priority_sample_estimates_within_bounds(spark):
    from pathhier_spark.operators.sampling import priority_sample_sums

    # 500 items, k=100: estimates stay positive and in a sane envelope
    # of the exact sums, and the sample size equals k overall
    rows = [("g%d" % (i % 4), i, 1 + (i % 7)) for i in range(500)]
    df = spark.createDataFrame(rows, "event_type string, event_id long, w long")
    out = priority_sample_sums(df, k=100).collect()
    tot_sampled = sum(r["n_sampled"] for r in out)
    assert tot_sampled == 100
    for r in out:
        assert r["est_sum"] > 0
        # DLT at k=100 over near-uniform weights: generous 2x envelope
        assert 0.5 * r["exact_sum"] < r["est_sum"] < 2.0 * r["exact_sum"]
