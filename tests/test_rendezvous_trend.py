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
