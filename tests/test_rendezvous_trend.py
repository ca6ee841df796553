"""rendezvous_shard (operators/packing.py, q176) and group_trend
(operators/profile.py, q177) — the property each gate row rests on:
rendezvous' minimal-disruption guarantee (every mover under N -> N+1
lands ON the new shard; survivors never reshuffle) and exact OLS
moments on hand series.
"""

import datetime

import pytest
from pyspark.sql import functions as F

from pathhier_spark.operators.packing import rendezvous_shard
from pathhier_spark.operators.profile import group_trend


def test_rendezvous_movers_all_land_on_new_shard(spark):
    # THE consistent-hashing property: growing 8 -> 9 shards, a row
    # either keeps its shard or moves to shard 8 (the new one) — never
    # between survivors. Checked over 500 ids.
    df = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
    a = rendezvous_shard(df, n_shards=8, out_col="s8")
    b = rendezvous_shard(a, n_shards=9, out_col="s9")
    bad = b.filter((F.col("s9") != F.col("s8")) & (F.col("s9") != 8))
    assert bad.count() == 0
    moved = b.filter(F.col("s9") != F.col("s8")).count()
    assert 0 < moved < 500 * 0.25  # ~1/9 expected; generous bound


def test_rendezvous_full_range_and_determinism(spark):
    df = spark.createDataFrame([(i,) for i in range(2000)], "doc_id long")
    out = rendezvous_shard(df, n_shards=8)
    shards = {r["shard"] for r in out.select("shard").distinct().collect()}
    assert shards == set(range(8))  # every shard populated, none out of range
    again = rendezvous_shard(df, n_shards=8)
    assert out.exceptAll(again).count() == 0


def test_rendezvous_rejects_bad_n(spark):
    df = spark.createDataFrame([(1,)], "doc_id long")
    with pytest.raises(ValueError):
        rendezvous_shard(df, n_shards=0)


def _trend(spark, rows):
    df = spark.createDataFrame(
        [(g, datetime.date(2024, 1, d), n) for g, d, n in rows],
        "g string, day date, n long",
    )
    return {
        r["g"]: (r["n_days"], r["slope_num"], r["slope_den"], r["slope"])
        for r in group_trend(df, group_col="g", day_col="day").collect()
    }


def test_trend_hand_slopes(spark):
    got = _trend(
        spark,
        [
            # rising: counts 1,2,3 on days 0,1,2 -> slope exactly 1
            ("up", 1, 1), ("up", 2, 2), ("up", 3, 3),
            # flat: slope 0
            ("flat", 1, 5), ("flat", 2, 5), ("flat", 3, 5),
            # falling by 2/day
            ("down", 1, 9), ("down", 2, 7), ("down", 3, 5),
        ],
    )
    assert got["up"] == (3, 6, 6, 1.0)
    assert got["flat"] == (3, 0, 6, 0.0)
    assert got["down"] == (3, -12, 6, -2.0)


def test_trend_counts_aggregate_within_day_and_gaps_stay_absent(spark):
    # two rows on day 1 sum to y=3; the gap day 2 is NOT densified, so
    # x values are {0, 2}: slope = (3-1)/(2-0) = 1... computed exactly
    got = _trend(spark, [("g", 1, 1), ("g", 1, 2), ("g", 3, 5)])
    n_days, num, den, slope = got["g"]
    assert n_days == 2
    assert slope == (2 * 10 - 2 * 8) / (2 * 4 - 4)  # = 1.0
    assert (num, den) == (4, 4)


def test_trend_single_day_null_slope(spark):
    got = _trend(spark, [("g", 1, 7)])
    assert got["g"] == (1, 0, 0, None)


def test_corpus_quantile_bins_hand_case(spark):
    """corpus_quantile_bins (q183): exact rank bins, tie sharing, and
    cross-group normalization on a hand corpus."""
    import pytest as _pytest

    from pathhier_spark.operators.profile import corpus_quantile_bins

    # group A holds the 4 lowest scores, B the 4 highest; 2 bins
    rows = [("A", s) for s in (10, 20, 30, 40)] + [
        ("B", s) for s in (50, 60, 70, 80)
    ]
    df = spark.createDataFrame(rows, "source string, score_fp long")
    got = {
        (r["source"], r["qbin"]): r["n_rows"]
        for r in corpus_quantile_bins(df, n_bins=2).collect()
    }
    assert got == {("A", 0): 4, ("B", 1): 4}

    # ties share a bin: all-equal scores -> below = 0 -> everyone bin 0
    tied = spark.createDataFrame(
        [("A", 5), ("B", 5), ("B", 5)], "source string, score_fp long"
    )
    got = {
        (r["source"], r["qbin"]): r["n_rows"]
        for r in corpus_quantile_bins(tied, n_bins=10).collect()
    }
    assert got == {("A", 0): 1, ("B", 0): 2}
    with _pytest.raises(ValueError):
        corpus_quantile_bins(df, n_bins=0)


def test_kmv_key_overlap_exact_regime_and_ground_truth(spark):
    """kmv_key_overlap (q184): below k distinct keys the sketch is in
    its exact regime — est_union equals the true union size and
    est_jaccard the true Jaccard; exact columns carry ground truth
    including join-row multiplicity."""
    from pathhier_spark.operators.textstats import kmv_key_overlap

    # A keys {1..6}, B keys {4..9}: union 9, inter 3, jaccard 1/3.
    # B carries key 4 twice -> exact_join_rows counts multiplicity.
    a = spark.createDataFrame([(i,) for i in range(1, 7)], "ka long")
    b = spark.createDataFrame(
        [(i,) for i in range(4, 10)] + [(4,)], "kb long"
    )
    r = kmv_key_overlap(a, b, key_a="ka", key_b="kb", k=64).collect()[0]
    assert r["k_used"] == 9 and r["n_both"] == 3
    assert r["est_union"] == 9.0
    assert r["est_jaccard"] == 3 / 9
    assert r["est_inter"] == 3.0
    assert r["exact_inter"] == 3
    assert r["exact_join_rows"] == 4  # key 4 joins twice
