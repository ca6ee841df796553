"""as-of join and bin-bucketed range join (operators/temporal.py)."""

import datetime

import pytest
from pyspark.sql import functions as F

from pathhier_spark.operators.temporal import asof_join, range_join


def ts(h, m=0, s=0):
    return datetime.datetime(2024, 1, 1, h, m, s)


def test_asof_join_backward_inclusive(spark):
    left = spark.createDataFrame(
        [(1, ts(10), "a"), (1, ts(12), "b"), (2, ts(9), "c"), (3, ts(8), "d")],
        "k long, ts timestamp, lv string",
    )
    right = spark.createDataFrame(
        [(1, ts(9), 90.0), (1, ts(12), 120.0), (2, ts(11), 110.0)],
        "k long, ts timestamp, rv double",
    )
    out = {(r["k"], r["ts"]): r for r in
           asof_join(left, right, on="k").collect()}
    # latest right at-or-before: strict-before case
    assert out[(1, ts(10))]["r_rv"] == 90.0
    assert out[(1, ts(10))]["r_ts"] == ts(9)
    # INCLUSIVE: equal timestamps match
    assert out[(1, ts(12))]["r_rv"] == 120.0
    # right exists only in the future -> no match (left-outer NULLs)
    assert out[(2, ts(9))]["r_rv"] is None
    # key absent from right entirely
    assert out[(3, ts(8))]["r_rv"] is None
    # left columns survive untouched
    assert out[(1, ts(12))]["lv"] == "b"


def test_asof_join_multiple_left_same_key(spark):
    """Many left rows per key each independently pick their own as-of
    match; left rows never consume or shadow each other."""
    left = spark.createDataFrame(
        [(1, ts(10)), (1, ts(10, 30)), (1, ts(11))],
        "k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, ts(10), 1.0), (1, ts(10, 45), 2.0)],
        "k long, ts timestamp, rv double",
    )
    got = {r["ts"]: r["r_rv"] for r in asof_join(left, right, on="k").collect()}
    assert got == {ts(10): 1.0, ts(10, 30): 1.0, ts(11): 2.0}


def test_range_join_boundaries_and_bins(spark):
    """[start, end) semantics exactly: start inclusive, end exclusive;
    intervals spanning multiple bins still match points in every bin."""
    points = spark.createDataFrame(
        [(1, 1, ts(10)), (2, 1, ts(12)), (3, 1, ts(13, 59, 59)),
         (4, 1, ts(14)), (5, 2, ts(11))],
        "pid long, k long, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [(100, 1, ts(10), ts(14))],  # 4h window, crosses hourly bins
        "iid long, k long, start_ts timestamp, end_ts timestamp",
    )
    got = sorted(
        r["pid"]
        for r in range_join(
            points, intervals, on="k", bin_seconds=3600
        ).collect()
    )
    # pid 1 at start (inclusive), 2 inside, 3 just before end; 4 AT end
    # (exclusive) out; 5 wrong key out
    assert got == [1, 2, 3]


def test_range_join_left_and_global(spark):
    points = spark.createDataFrame(
        [(1, ts(10)), (2, ts(20))], "pid long, ts timestamp"
    )
    intervals = spark.createDataFrame(
        [(7, ts(9), ts(11))], "iid long, start_ts timestamp, end_ts timestamp"
    )
    out = {r["pid"]: r for r in range_join(
        points, intervals, on=None, bin_seconds=3600, how="left"
    ).collect()}
    assert out[1]["iid"] == 7
    assert out[2]["iid"] is None
    assert len(out) == 2


def test_pagerank_fixedpoint(spark):
    """Star graph: the hub all leaves point at accumulates rank; sources
    with no in-edges settle at the teleport floor; integer ranks are
    bit-identical across runs and conserve no more than total input mass
    (dangling leak is by design)."""
    from pathhier_spark.operators.graph import pagerank_fixedpoint

    edges = spark.createDataFrame(
        [("a", "hub"), ("b", "hub"), ("c", "hub"), ("hub", "a")],
        "src string, dst string",
    )
    out = {r["node"]: r for r in pagerank_fixedpoint(edges).collect()}
    # sources b,c have no in-edges -> exactly the teleport term
    assert out["b"]["rank_fp"] == out["c"]["rank_fp"] == 150_000
    # the hub dominates; 'a' gets hub's mass back but less than hub
    assert out["hub"]["rank_fp"] > out["a"]["rank_fp"] > out["b"]["rank_fp"]
    # deterministic to the last integer
    again = {r["node"]: r["rank_fp"] for r in pagerank_fixedpoint(edges).collect()}
    assert again == {k: v["rank_fp"] for k, v in out.items()}
    # dangling leak only: total mass never exceeds N * scale
    assert sum(v["rank_fp"] for v in out.values()) <= 4 * 1_000_000


def test_asof_join_null_right_ts_never_matches(spark):
    """A right row with NULL ts must not become a universal fallback match
    (review r4): DuckDB ASOF / pandas merge_asof semantics — NULL ts can
    never satisfy ts <= left_ts."""
    left = spark.createDataFrame([(1, ts(10))], "k long, ts timestamp")
    right = spark.createDataFrame(
        [(1, None, 99.0), (1, ts(11), 1.0)],
        "k long, ts timestamp, rv double",
    )
    row = asof_join(left, right, on="k").collect()[0]
    assert row["r_rv"] is None and row["r_ts"] is None


def test_range_join_left_null_column_no_duplicate(spark):
    """A matched point carrying a NULL column must appear exactly once
    (review r4): the unmatched-side anti-join is NULL-safe, so the NULL
    never makes the row 'unequal to itself' and duplicated."""
    points = spark.createDataFrame(
        [(1, ts(10), None), (2, ts(20), "x")],
        "pid long, ts timestamp, note string",
    )
    intervals = spark.createDataFrame(
        [(7, ts(9), ts(11))], "iid long, start_ts timestamp, end_ts timestamp"
    )
    rows = range_join(
        points, intervals, on=None, bin_seconds=3600, how="left"
    ).collect()
    assert len(rows) == 2
    out = {r["pid"]: r for r in rows}
    assert out[1]["iid"] == 7 and out[1]["note"] is None
    assert out[2]["iid"] is None


def test_asof_join_null_key_never_matches(spark):
    """ADVICE r4: Window.partitionBy groups NULL keys together, so a
    NULL-key left row used to as-of-match a NULL-key right row — unlike
    DuckDB ASOF / pandas merge_asof / any equi-join where NULL never
    equals NULL. NULL-key right rows are now dropped; NULL-key left rows
    still come through, unmatched."""
    left = spark.createDataFrame(
        [(None, 10, "l1"), ("k", 10, "l2")], "k string, ts int, lv string"
    )
    right = spark.createDataFrame(
        [(None, 5, "SHOULD_NEVER_MATCH"), ("k", 5, "rv")],
        "k string, ts int, rv string",
    )
    got = {
        r["lv"]: r["r_rv"]
        for r in asof_join(left, right, on="k").collect()
    }
    assert got == {"l1": None, "l2": "rv"}


# --- sliding-window distinct -----------------------------------------------


def test_sliding_window_distinct_hand_computed(spark):
    from pathhier_spark.operators.temporal import sliding_window_distinct

    rows = [
        # (ts, user): day 1 has users {1,2}; day 2 {2}; day 5 {3};
        # gap days 3-4 have no rows (and must emit no output rows)
        ("2024-01-01 10:00:00", 1),
        ("2024-01-01 11:00:00", 2),
        ("2024-01-01 12:00:00", 1),  # same user twice in one day
        ("2024-01-02 09:00:00", 2),
        ("2024-01-05 09:00:00", 3),
    ]
    ev = spark.createDataFrame(rows, "ts string, user_id long").select(
        F.to_timestamp("ts").alias("ts"), "user_id"
    )
    out = {
        str(r["day"]): r
        for r in sliding_window_distinct(ev, window_days=3).collect()
    }
    assert sorted(out) == ["2024-01-01", "2024-01-02", "2024-01-05"]
    d1 = out["2024-01-01"]
    assert (d1["n_events_day"], d1["n_users_day"]) == (3, 2)
    assert (d1["n_events_win"], d1["n_users_win"]) == (3, 2)
    d2 = out["2024-01-02"]  # window covers days 1-2: users {1,2}
    assert (d2["n_events_day"], d2["n_users_day"]) == (1, 1)
    assert (d2["n_events_win"], d2["n_users_win"]) == (4, 2)
    d5 = out["2024-01-05"]  # window covers days 3-5: only user 3
    assert (d5["n_events_win"], d5["n_users_win"]) == (1, 1)


# --- gap-fill + LOCF (q117, round 5) ---

def test_gapfill_locf_hand_computed(spark):
    import datetime as dt
    from pathhier_spark.operators.temporal import gapfill_locf

    d = lambda day: dt.date(2024, 1, day)  # noqa: E731
    daily = spark.createDataFrame(
        [("a", d(1), 10), ("a", d(4), 40), ("b", d(2), 20)],
        "series string, day date, value long",
    )
    got = sorted(
        (r["series"], r["day"].day, r["value"], r["is_gap"])
        for r in gapfill_locf(daily).collect()
    )
    # series a: days 1-4 dense, 2 and 3 carry 10; series b: single day,
    # no grid beyond its own span
    assert got == [
        ("a", 1, 10, 0), ("a", 2, 10, 1), ("a", 3, 10, 1), ("a", 4, 40, 0),
        ("b", 2, 20, 0),
    ]


def test_gapfill_locf_no_cross_series_leak(spark):
    import datetime as dt
    from pathhier_spark.operators.temporal import gapfill_locf

    d = lambda day: dt.date(2024, 1, day)  # noqa: E731
    daily = spark.createDataFrame(
        [("a", d(1), 111), ("b", d(1), 222), ("b", d(3), 333)],
        "series string, day date, value long",
    )
    got = {(r["series"], r["day"].day): r["value"]
           for r in gapfill_locf(daily).collect()}
    # b's gap on day 2 must carry b's 222, never a's 111
    assert got[("b", 2)] == 222


# --- SCD2 change-point intervalization (q123, round 5) ---

def test_change_intervals_hand_computed(spark):
    import datetime as dt
    from pathhier_spark.operators.temporal import change_intervals

    T = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    rows = [("u1", T(0), 1, "A"), ("u1", T(1), 2, "A"), ("u1", T(2), 3, "B"),
            ("u1", T(3), 4, "B"), ("u1", T(4), 5, "A"), ("u2", T(0), 6, "X")]
    df = spark.createDataFrame(
        rows, "key string, ts timestamp, eid long, value string"
    )
    got = sorted(
        (r["key"], r["value"], r["valid_from"].minute,
         r["valid_to"].minute if r["valid_to"] else None, r["n_events"])
        for r in change_intervals(df, tiebreak_col="eid").collect()
    )
    # A-run reappearing after B must open a NEW interval (A,0-2), (B,2-4),
    # (A,4-open) — not merge with the first A run
    assert got == sorted([
        ("u1", "A", 0, 2, 2), ("u1", "B", 2, 4, 2), ("u1", "A", 4, None, 1),
        ("u2", "X", 0, None, 1),
    ])


def test_change_intervals_ts_tie_total_order(spark):
    import datetime as dt
    from pathhier_spark.operators.temporal import change_intervals

    # two rows at the SAME timestamp: the tiebreak column decides run
    # boundaries deterministically (eid 1's A precedes eid 2's B)
    t0 = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [("u", t0, 2, "B"), ("u", t0, 1, "A")],
        "key string, ts timestamp, eid long, value string",
    )
    got = sorted(
        (r["value"], r["n_events"])
        for r in change_intervals(df, tiebreak_col="eid").collect()
    )
    assert got == [("A", 1), ("B", 1)]


# --- daily-rate anomaly detection (q134, round 5) ---

def test_rate_anomalies_hand_computed(spark):
    import datetime as dt
    from pathhier_spark.operators.temporal import rate_anomalies

    # series "a": day counts [1,1,1,1,1,11] -> n=6, Σx=16, Σx²=126;
    # z = (n·x − Σx)/sqrt(n·Σx² − (Σx)²) = (6x−16)/sqrt(500);
    # z(11) = 50/22.36068 = 2.236068 -> anomaly; z(1) = −10/22.36068 =
    # −0.447214 -> not.  series "b": constant counts -> zero variance
    # -> z NULL, never flagged.
    rows = []
    T = lambda day, i: dt.datetime(2024, 1, day, 0, i)  # noqa: E731
    for day, n in [(1, 1), (2, 1), (3, 1), (4, 1), (5, 1), (6, 11)]:
        rows += [("a", T(day, i)) for i in range(n)]
    rows += [("b", T(1, 0)), ("b", T(2, 0))]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    got = {
        (r["series"], r["day"].day): (r["n_events"], r["z"], r["is_anomaly"])
        for r in rate_anomalies(df).collect()
    }
    assert got[("a", 6)] == (11, 2.236068, 1)
    assert got[("a", 1)] == (1, -0.447214, 0)
    assert got[("b", 1)] == (1, None, 0)
    assert len(got) == 8


# ----------------------------- ordered_funnel -----------------------------


def test_funnel_hand_case(spark):
    from datetime import datetime as dt

    from pathhier_spark.operators.temporal import ordered_funnel

    rows = [
        # u1 completes in order within window
        (1, "signup", dt(2024, 1, 1)), (1, "view", dt(2024, 1, 2)),
        (1, "purchase", dt(2024, 1, 3)),
        # u2 views BEFORE signup -> stops at signup
        (2, "view", dt(2024, 1, 1)), (2, "signup", dt(2024, 1, 2)),
        (2, "purchase", dt(2024, 1, 2, 0, 0, 1)),
        # wait: u2 purchase after signup but no view after signup
        # u3 converts view but purchase past the 7-day deadline
        (3, "signup", dt(2024, 1, 1)), (3, "view", dt(2024, 1, 2)),
        (3, "purchase", dt(2024, 1, 20)),
        # u4 never signs up
        (4, "view", dt(2024, 1, 1)), (4, "purchase", dt(2024, 1, 2)),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp"
    )
    got = {r["step"]: r for r in ordered_funnel(ev).collect()}
    assert got[1]["n_users"] == 3            # u1, u2, u3
    assert got[2]["n_users"] == 2            # u1, u3
    assert got[3]["n_users"] == 1            # u1 only
    assert got[1]["conv_prev_fp"] == 1_000_000
    assert got[2]["conv_prev_fp"] == 666_666
    assert got[3]["conv_prev_fp"] == 500_000
    assert got[3]["conv_start_fp"] == 333_333


def test_funnel_strictly_after_and_deadline_inclusive(spark):
    from datetime import datetime as dt, timedelta

    from pathhier_spark.operators.temporal import ordered_funnel

    t0 = dt(2024, 1, 1)
    ev = spark.createDataFrame(
        [
            # simultaneous view does NOT count (strictly after)
            (1, "signup", t0), (1, "view", t0),
            # view exactly at the deadline DOES count (inclusive)
            (2, "signup", t0), (2, "view", t0 + timedelta(days=7)),
        ],
        "user_id long, event_type string, ts timestamp",
    )
    got = {r["step"]: r["n_users"] for r in ordered_funnel(ev).collect()}
    assert got[1] == 2 and got[2] == 1


# --------------------------- frequent_sequences ---------------------------


def test_frequent_sequences_hand_case(spark):
    from datetime import datetime as dt

    from pathhier_spark.operators.temporal import frequent_sequences

    rows = []
    # users 1..4 all do a->b; users 1,2 continue ->c; user 5 does b->a
    for u in (1, 2, 3, 4):
        rows += [(u, 10 * u + 1, "a", dt(2024, 1, 1, u)),
                 (u, 10 * u + 2, "b", dt(2024, 1, 1, u, 1))]
    for u in (1, 2):
        rows.append((u, 10 * u + 3, "c", dt(2024, 1, 1, u, 2)))
    rows += [(5, 51, "b", dt(2024, 1, 2)), (5, 52, "a", dt(2024, 1, 2, 1))]
    ev = spark.createDataFrame(
        rows, "user_id long, event_id long, event_type string, ts timestamp"
    )
    got = {(r["k"], r["pattern"]): (r["support"], r["support_fp"])
           for r in frequent_sequences(ev).collect()}
    assert got[(2, "a>b")] == (4, 800000)
    assert got[(2, "b>c")] == (2, 400000)
    assert got[(2, "b>a")] == (1, 200000)
    assert got[(3, "a>b>c")] == (2, 400000)
    # a>c never contiguous
    assert (2, "a>c") not in got


def test_frequent_sequences_support_is_distinct_users(spark):
    from datetime import datetime as dt

    from pathhier_spark.operators.temporal import frequent_sequences

    # one user loops a->b 100 times; support must stay 1
    from datetime import timedelta

    t0 = dt(2024, 1, 1)
    rows = []
    for i in range(100):
        rows += [(1, 2 * i, "a", t0 + timedelta(seconds=2 * i)),
                 (1, 2 * i + 1, "b", t0 + timedelta(seconds=2 * i + 1))]
    rows += [(2, 1000, "x", dt(2024, 1, 2))]
    ev = spark.createDataFrame(
        rows, "user_id long, event_id long, event_type string, ts timestamp"
    )
    got = {r["pattern"]: r["support"]
           for r in frequent_sequences(ev, min_support_fp=0).collect()}
    assert got["a>b"] == 1


def test_interval_coverage_hand_computed(spark):
    from pathhier_spark.operators.temporal import interval_coverage

    rows = [
        # user 1: [0,10) + [5,12) overlap -> one block covering 12;
        # [12,15) touches (half-open merge) -> still one block, +3;
        # [20,25) disjoint -> second block, +5
        (1, 0, 10), (1, 5, 12), (1, 12, 15), (1, 20, 25),
        # user 2: containment — [0,100) swallows [10,20) and [90,95)
        (2, 0, 100), (2, 10, 20), (2, 90, 95),
        # user 3: zero-length and inverted intervals are dropped
        (3, 5, 5), (3, 9, 4), (3, 1, 3),
        # user 4: NULL bounds dropped entirely -> no output row
        (4, None, 7), (4, 7, None),
    ]
    df = spark.createDataFrame(rows, "user_id long, start long, end long")
    got = {
        r["user_id"]: (r["n_intervals"], r["covered"], r["n_blocks"])
        for r in interval_coverage(df).collect()
    }
    assert got[1] == (4, 20, 2)
    assert got[2] == (3, 100, 1)
    assert got[3] == (1, 2, 1)
    assert 4 not in got


def test_allen_relation_counts_all_seven(spark):
    from pathhier_spark.operators.temporal import allen_relation_counts

    rows = [
        # one pair per relation, key 1 (ids fix the lex tie for equals)
        (1, 1, 0, 10), (1, 2, 20, 30),    # precedes
        (1, 3, 40, 50), (1, 4, 50, 60),   # meets
        (1, 5, 100, 110), (1, 6, 105, 120),  # overlaps
        (1, 7, 200, 210), (1, 8, 200, 220),  # starts
        (1, 9, 300, 340), (1, 10, 310, 320),  # contains
        (1, 11, 400, 420), (1, 12, 410, 420),  # finished_by
        (1, 13, 500, 510), (1, 14, 500, 510),  # equals
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, start long, end long"
    )
    got = {
        (r["user_id"], r["relation"]): r["n_pairs"]
        for r in allen_relation_counts(df).collect()
    }
    for rel in ("meets", "overlaps", "starts", "contains",
                "finished_by", "equals"):
        assert got[(1, rel)] == 1, rel
    # every cross-block pair is 'precedes': 7 blocks of 2 -> C(14,2)=91
    # pairs total, 6 non-precedes within-block, 1 precedes within-block
    assert got[(1, "precedes")] == 91 - 6


def test_allen_relation_counts_cap_reports_drops(spark):
    from pathhier_spark.operators.temporal import allen_relation_counts

    rows = [(1, i, 10 * i, 10 * i + 5) for i in range(10)]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, start long, end long"
    )
    out = allen_relation_counts(df, max_per_key=4).collect()
    assert {(r["relation"], r["n_pairs"], r["n_dropped"]) for r in out} == {
        ("precedes", 6, 6)
    }


def test_decayed_engagement_hand_computed(spark):
    from datetime import datetime as dt

    from pathhier_spark.operators.temporal import decayed_engagement

    HL = 7 * 24 * 3600 * 1_000_000
    anchor = dt(2024, 3, 1)
    anchor_us = int(anchor.timestamp() * 1_000_000)
    rows = [
        # age 0 (at anchor): full 100 cents
        (1, "a", anchor, 1.00),
        # age 1 (one half-life back): 200 -> 100
        (1, "a", dt(2024, 2, 23), 2.00),
        # age 2 (2.5 half-lives back floors to 2): 200 -> 50
        (1, "a", dt(2024, 2, 13, 12), 2.00),
        # future event clamps to age 0
        (1, "b", dt(2024, 3, 5), 3.00),
        (2, "a", None, 9.99),  # NULL ts dropped
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp, value double"
    )
    got = {
        (r["user_id"], r["event_type"]):
            (r["n_events"], r["raw_cents"], r["decayed_cents"])
        for r in decayed_engagement(df, anchor_us=anchor_us).collect()
    }
    assert got[(1, "a")] == (3, 500, 250)
    assert got[(1, "b")] == (1, 300, 300)
    assert (2, "a") not in got


def test_kaplan_meier_hand_computed(spark):
    from datetime import datetime as dt

    from pathhier_spark.operators.temporal import kaplan_meier

    rows = [
        # A: 10h lifetime, death          B: 10h, death
        ("A", dt(2024, 1, 1, 0)), ("A", dt(2024, 1, 1, 10)),
        ("B", dt(2024, 1, 1, 1)), ("B", dt(2024, 1, 1, 11)),
        # C: 20h, death      D: single event -> 0h, death
        ("C", dt(2024, 1, 1, 0)), ("C", dt(2024, 1, 1, 20)),
        ("D", dt(2024, 1, 5, 0)),
        # E: sets the study end; censored (last event == end)
        ("E", dt(2024, 1, 1, 0)), ("E", dt(2024, 3, 1, 0)),
    ]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp")
    got = [
        (r["t_hours"], r["n_at_risk"], r["n_deaths"], r["surv_fp"])
        for r in kaplan_meier(df).orderBy("t_hours").collect()
    ]
    # t=0: 1/5 die -> 0.8; t=10: 2/4 -> 0.4; t=20: 1/2 -> 0.2;
    # E's censoring emits no row and no death
    assert got == [(0, 5, 1, 800000), (10, 4, 2, 400000), (20, 2, 1, 200000)]


def test_cusum_hand_computed(spark):
    from datetime import datetime as dt

    from pathhier_spark.operators.temporal import cusum_changepoints

    # 6 days: counts 10,10,10,22,22,10 -> total 84, mean 14, k=1, h=8.
    # S+ walk: max(0, S+ + x - 15): 0,0,0,7,14,9 -> alarm on days 5,6
    # S- walk: max(0, S- + 13 - x): 3,6,9,0,0,3 -> alarm on day 3 (9>=8)
    rows = []
    counts = [10, 10, 10, 22, 22, 10]
    for d, c in enumerate(counts, start=1):
        rows += [(dt(2024, 2, d, 12),)] * c
    df = spark.createDataFrame(rows, "ts timestamp")
    got = [
        (str(r["day"]), r["x"], r["s_pos"], r["s_neg"], r["alarm"])
        for r in cusum_changepoints(df).collect()
    ]
    assert got == [
        ("2024-02-01", 10, 0, 3, False),
        ("2024-02-02", 10, 0, 6, False),
        ("2024-02-03", 10, 0, 9, True),
        ("2024-02-04", 22, 7, 0, False),
        ("2024-02-05", 22, 14, 0, True),
        ("2024-02-06", 10, 9, 3, True),
    ]


def test_holt_forecast_hand_computed(spark):
    from datetime import datetime as dt

    from pathhier_spark.operators.temporal import holt_forecast

    # counts 10, 12, 14: init l=10000, b=2000 (scale 1000).
    # day2: fc=12000, err=0; l=(12000+10000+2000)//2=12000, b=(2000+2000)//2=2000
    # day3: fc=14000, err=0 (perfect linear series forecasts exactly)
    rows = []
    for d, c in [(1, 10), (2, 12), (3, 14)]:
        rows += [(dt(2024, 5, d),)] * c
    df = spark.createDataFrame(rows, "ts timestamp")
    got = [
        (str(r["day"]), r["x"], r["forecast_fp"], r["abs_err_fp"])
        for r in holt_forecast(df).collect()
    ]
    assert got == [
        ("2024-05-02", 12, 12000, 0),
        ("2024-05-03", 14, 14000, 0),
    ]


def test_holt_forecast_adapts_to_break(spark):
    from datetime import datetime as dt

    from pathhier_spark.operators.temporal import holt_forecast

    # flat 10,10,10 then jump to 30: the break day carries the full
    # 20000 error; the next forecast moves most of the way up
    rows = []
    for d, c in [(1, 10), (2, 10), (3, 10), (4, 30), (5, 30)]:
        rows += [(dt(2024, 5, d),)] * c
    df = spark.createDataFrame(rows, "ts timestamp")
    got = {str(r["day"]): (r["forecast_fp"], r["abs_err_fp"])
           for r in holt_forecast(df).collect()}
    assert got["2024-05-04"] == (10000, 20000)
    assert got["2024-05-05"][1] < 10000  # adapted past half the gap


def test_theil_sen_ignores_outlier_day(spark):
    from datetime import datetime as dt

    from pathhier_spark.operators.temporal import theil_sen_trend

    # perfect slope-2 line except one wild day: median slope stays 2
    counts = [10, 12, 14, 90, 18, 20, 22]
    rows = []
    for d, c in enumerate(counts, start=1):
        rows += [(dt(2024, 6, d),)] * c
    df = spark.createDataFrame(rows, "ts timestamp")
    r = theil_sen_trend(df).collect()[0]
    assert r["n_days"] == 7 and r["n_pairs"] == 21
    assert abs(r["slope"] - 2.0) < 1e-12
    # intercept = median of y_i - 2*i = [8,8,8,82,8,8,8] -> 8
    assert abs(r["intercept"] - 8.0) < 1e-12


def test_best_sse_split_finds_the_break(spark):
    from datetime import datetime as dt

    from pathhier_spark.operators.temporal import best_sse_split

    # 10,10,10 then 30,30,30: the optimal split is after day 3 with
    # zero residual SSE; one-segment SSE = 6*(20-mean)^2 = 600
    rows = []
    for d, c in [(1, 10), (2, 10), (3, 10), (4, 30), (5, 30), (6, 30)]:
        rows += [(dt(2024, 7, d),)] * c
    df = spark.createDataFrame(rows, "ts timestamp")
    r = best_sse_split(df).collect()[0]
    assert r["n_days"] == 6
    assert r["split_idx"] == 3 and str(r["split_day"]) == "2024-07-03"
    assert abs(r["sse_two"]) < 1e-9
    assert abs(r["sse_one"] - 600.0) < 1e-9


def test_markov_attribution_hand_solved(spark):
    from datetime import datetime as dt

    from pathhier_spark.operators.temporal import markov_attribution

    # u1: click -> purchase; u2: click -> end; u3: view -> end.
    # v[click] = (1*scale)/2 = 500000, v[view] = 0,
    # base = START: (2*500000 + 0)//3 = 333333.
    # remove click -> START value 0 (effect 1.0, full share);
    # remove view -> unchanged (effect 0).
    rows = [
        (1, 1, "click", dt(2024, 8, 1, 0)),
        (1, 2, "purchase", dt(2024, 8, 1, 1)),
        (2, 3, "click", dt(2024, 8, 1, 0)),
        (3, 4, "view", dt(2024, 8, 1, 0)),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, event_type string, ts timestamp"
    )
    got = {
        r["channel"]: (
            r["conv_base_fp"], r["conv_removed_fp"],
            r["removal_effect"], r["share"],
        )
        for r in markov_attribution(df, channels=("click", "view")).collect()
    }
    assert got["click"] == (333333, 0, 1.0, 1.0)
    assert got["view"] == (333333, 333333, 0.0, 0.0)


def test_markov_attribution_journey_cut_at_first_purchase(spark):
    from datetime import datetime as dt

    from pathhier_spark.operators.temporal import markov_attribution

    # events AFTER the first purchase must not create transitions:
    # u1: view -> purchase -> click; the trailing click is ignored, so
    # removing click changes nothing
    rows = [
        (1, 1, "view", dt(2024, 8, 1, 0)),
        (1, 2, "purchase", dt(2024, 8, 1, 1)),
        (1, 3, "click", dt(2024, 8, 1, 2)),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, event_type string, ts timestamp"
    )
    got = {
        r["channel"]: (r["conv_base_fp"], r["conv_removed_fp"])
        for r in markov_attribution(df, channels=("click", "view")).collect()
    }
    assert got["click"] == (1000000, 1000000)
    assert got["view"] == (1000000, 0)


def test_shapley_efficiency_and_dummy(spark):
    from datetime import datetime as dt

    from pathhier_spark.operators.temporal import shapley_attribution

    # u1: click -> purchase; u2: click -> end; u3: view -> end.
    # 'view' never reaches a conversion on any path -> dummy channel,
    # phi(view) = 0 exactly; efficiency: sum(phi_num) = 24*(v_all - v_none)
    rows = [
        (1, 1, "click", dt(2024, 8, 1, 0)),
        (1, 2, "purchase", dt(2024, 8, 1, 1)),
        (2, 3, "click", dt(2024, 8, 1, 0)),
        (3, 4, "view", dt(2024, 8, 1, 0)),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, event_type string, ts timestamp"
    )
    out = shapley_attribution(df, channels=("click", "view")).collect()
    got = {r["channel"]: r for r in out}
    n_fact = 2  # n=2 channels -> n! = 2
    v_all, v_none = got["click"]["v_all_fp"], got["click"]["v_none_fp"]
    assert v_none == 0
    # dummy axiom: view contributes nothing in any coalition
    assert got["view"]["phi_num"] == 0
    # efficiency axiom, exact to the unit in fixed point
    total = sum(r["phi_num"] for r in out)
    assert total == n_fact * (v_all - v_none)
    assert got["click"]["phi_num"] == n_fact * v_all


def test_continuation_operators_handle_empty_inputs(spark):
    """Empty-input sweep for the continuation-tranche temporal/graph
    operators (a filtered shard can legitimately be empty at scale)."""
    from pathhier_spark.operators.graph import hash_priority_matching
    from pathhier_spark.operators.temporal import (
        best_sse_split,
        cusum_changepoints,
        decayed_engagement,
        holt_forecast,
        interval_coverage,
        kaplan_meier,
        markov_attribution,
        shapley_attribution,
        theil_sen_trend,
    )

    eev = spark.createDataFrame(
        [], "user_id long, event_id long, event_type string,"
        " ts timestamp, value double"
    )
    eedges = spark.createDataFrame([], "src string, dst string")
    eiv = spark.createDataFrame([], "user_id long, start long, end long")
    assert interval_coverage(eiv).count() == 0
    assert decayed_engagement(eev).count() == 0
    assert kaplan_meier(eev).count() == 0
    assert cusum_changepoints(eev).count() == 0
    assert holt_forecast(eev).count() == 0
    assert theil_sen_trend(eev).count() == 0
    assert best_sse_split(eev).count() == 0
    assert markov_attribution(eev).count() == 4  # channels, all zero
    assert shapley_attribution(eev).count() == 4
    assert hash_priority_matching(eedges).count() == 0


def test_seasonal_decompose_recovers_planted_weekly_pattern(spark):
    from datetime import datetime as dt, timedelta

    from pathhier_spark.operators.temporal import seasonal_decompose_daily

    # 28 days: base 20/day with +14 every 7th day (a planted weekly
    # spike). Trend sums are constant (7*20 + 14 = 154); the spike slot's
    # seasonal index is 7*34-154 = 84, others 7*20-154 = -14; remainders 0.
    t0 = dt(2024, 9, 2)
    rows = []
    for d in range(28):
        n = 20 + (14 if d % 7 == 0 else 0)
        rows += [(t0 + timedelta(days=d, hours=1),)] * n
    df = spark.createDataFrame(rows, "ts timestamp")
    out = seasonal_decompose_daily(df).collect()
    assert len(out) == 28 - 6  # full centered windows only
    assert all(r["trend_sum"] == 154 for r in out)
    spike = [r for r in out if r["x"] == 34]
    flat = [r for r in out if r["x"] == 20]
    assert spike and all(r["seasonal_fp"] == 84 for r in spike)
    assert all(r["seasonal_fp"] == -14 for r in flat)
    assert all(r["remainder_fp"] == 0 for r in out)


def test_pla_segments_ramp_then_shift(spark):
    from datetime import datetime as dt, timedelta

    from pathhier_spark.operators.temporal import pla_segments

    # perfect ramp 10,12,...,28 (ONE segment at eps=1 — every point on
    # the slope-2 line), then a level shift to 100,100,100: the jump
    # costs a one-step connector segment (anchored at the old level, a
    # line cannot also hold the plateau) and the plateau is the third
    t0 = dt(2024, 10, 1)
    counts = [10 + 2 * i for i in range(10)] + [100, 100, 100]
    rows = []
    for d, c in enumerate(counts):
        rows += [(t0 + timedelta(days=d),)] * c
    df = spark.createDataFrame(rows, "ts timestamp")
    out = pla_segments(df, eps=1).collect()
    assert [(r["t_start"], r["t_end"]) for r in out] == [
        (1, 10), (10, 11), (11, 13)
    ]
    assert (out[0]["y_start"], out[0]["y_end"]) == (10, 28)
    assert out[2]["y_end"] == 100


def test_pla_flat_series_is_one_segment(spark):
    from datetime import datetime as dt, timedelta

    from pathhier_spark.operators.temporal import pla_segments

    t0 = dt(2024, 10, 1)
    rows = []
    for d in range(20):
        rows += [(t0 + timedelta(days=d),)] * 15
    df = spark.createDataFrame(rows, "ts timestamp")
    out = pla_segments(df, eps=1).collect()
    assert len(out) == 1 and out[0]["n_points"] == 20
