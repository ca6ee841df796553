"""bellman_bounded (operators/graph.py, q178) and wasserstein1
(operators/profile.py, q179) — hand-checkable semantics: the hop-bound
invariant (d_r = min cost using <= r edges), cheaper-long-path wins,
parallel-edge collapse, early stop; and exact earth-mover values
including the shift/identity/split cases and the single-value and
empty-class edges.
"""

from pathhier_spark.operators.graph import bellman_bounded
from pathhier_spark.operators.profile import wasserstein1


def _bf(spark, edges, roots, hops):
    e = spark.createDataFrame(edges, "src string, dst string, w long")
    s = spark.createDataFrame([(r,) for r in roots], "node string")
    return {
        (r["root"], r["node"]): r["dist"]
        for r in bellman_bounded(e, s, max_hops=hops).collect()
    }


def test_bellman_cheaper_long_path_beats_short(spark):
    # direct a->c costs 10; a->b->c costs 2+3=5: within 2 hops the
    # cheaper two-edge route wins, within 1 hop only the direct exists
    edges = [("a", "b", 2), ("b", "c", 3), ("a", "c", 10)]
    assert _bf(spark, edges, ["a"], 1)[("a", "c")] == 10
    assert _bf(spark, edges, ["a"], 2)[("a", "c")] == 5


def test_bellman_parallel_edges_collapse_to_min(spark):
    edges = [("a", "b", 7), ("a", "b", 4), ("a", "b", 9)]
    assert _bf(spark, edges, ["a"], 3)[("a", "b")] == 4


def test_bellman_hop_bound_and_root_zero(spark):
    edges = [("a", "b", 1), ("b", "c", 1), ("c", "d", 1)]
    got = _bf(spark, edges, ["a"], 2)
    assert got[("a", "a")] == 0
    assert got[("a", "c")] == 2
    assert ("a", "d") not in got  # 3 edges away, horizon is 2


def test_bellman_multi_root_and_early_stop(spark):
    # two disconnected stars; frontier empties after round 1 so the
    # loop stops early and results still carry both roots
    edges = [("a", "b", 5), ("x", "y", 6)]
    got = _bf(spark, edges, ["a", "x"], 4)
    assert got == {("a", "a"): 0, ("a", "b"): 5, ("x", "x"): 0, ("x", "y"): 6}


def _w1(spark, rows):
    df = spark.createDataFrame(rows, "v long, snap long")
    r = wasserstein1(df).collect()[0]
    return r["n_a"], r["n_b"], r["w1_num"], r["w1"]


def test_wasserstein_unit_shift(spark):
    # A at {0, 1}, B at {1, 2}: every unit of mass moves exactly 1
    got = _w1(spark, [(0, 0), (1, 0), (1, 1), (2, 1)])
    assert got == (2, 2, 4, 1.0)


def test_wasserstein_identical_is_zero(spark):
    assert _w1(spark, [(3, 0), (9, 0), (3, 1), (9, 1)]) == (2, 2, 0, 0.0)


def test_wasserstein_distance_scales_with_gap(spark):
    # single points 0 vs 10: W1 = 10; vs 0 vs 1: W1 = 1
    assert _w1(spark, [(0, 0), (10, 1)])[3] == 10.0
    assert _w1(spark, [(0, 0), (1, 1)])[3] == 1.0


def test_wasserstein_split_mass(spark):
    # A all at 0 (2 rows), B at {0, 2}: half the mass moves 2 -> W1 = 1
    assert _w1(spark, [(0, 0), (0, 0), (0, 1), (2, 1)]) == (2, 2, 4, 1.0)


def test_wasserstein_single_value_and_empty_class(spark):
    assert _w1(spark, [(5, 0), (5, 1)]) == (1, 1, 0, 0.0)
    n_a, n_b, num, w1 = _w1(spark, [(5, 0), (6, 0)])
    assert (n_a, n_b, w1) == (2, 0, None)


def test_ks_hand_computed(spark):
    """A=[1,2,3], B=[3,4,5]: cum pairs (1,0)(2,0)(3,1)(3,2)(3,3) under
    n_a=n_b=3 -> d_num=max(3,6,6,3,0)=6, D=2/3,
    stat=sqrt(9/6)*2/3."""
    import math
    from pathhier_spark.operators.profile import ks_two_sample

    df = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 0), (3, 1), (4, 1), (5, 1)],
        "v long, snap int",
    )
    r = ks_two_sample(df).collect()[0]
    assert (r["n_a"], r["n_b"], r["d_num"]) == (3, 3, 6)
    assert abs(r["ks_d"] - round(2.0 / 3.0, 6)) < 1e-12
    want = round(math.sqrt(9.0 / 6.0) * (6.0 / 9.0), 6)
    assert abs(r["ks_stat"] - want) < 1e-12


def test_ks_identical_distributions_zero(spark):
    from pathhier_spark.operators.profile import ks_two_sample

    rows = [(v, g) for v in (1, 5, 9, 9, 20) for g in (0, 1)]
    df = spark.createDataFrame(rows, "v long, snap int")
    r = ks_two_sample(df).collect()[0]
    assert r["d_num"] == 0 and r["ks_d"] == 0.0 and r["ks_stat"] == 0.0


def test_ks_spikes_where_w1_sleeps(spark):
    """A narrow-band shift: move 10 of 100 docs one value over. W1 is
    tiny (10 units of mass x 1 step / 10000); KS sees the full 10%
    threshold divergence — the sup-vs-integral distinction that
    motivates shipping both."""
    from pathhier_spark.operators.profile import ks_two_sample, wasserstein1

    a = [(v, 0) for v in range(100)]
    b = [(v if not (40 <= v < 50) else 50, 1) for v in range(100)]
    df = spark.createDataFrame(a + b, "v long, snap int")
    ks = ks_two_sample(df).collect()[0]
    w1 = wasserstein1(df).collect()[0]
    assert abs(ks["ks_d"] - 0.1) < 1e-9
    # W1 is ~0.1 value-units over a 100-wide domain; normalized per unit
    # of domain width it is 30x smaller than the KS alarm
    assert w1["w1"] / 100.0 < ks["ks_d"] / 10.0


def test_ks_empty_side_null(spark):
    from pathhier_spark.operators.profile import ks_two_sample

    df = spark.createDataFrame([(3, 0), (4, 0)], "v long, snap int")
    r = ks_two_sample(df).collect()[0]
    assert r["n_b"] == 0
    assert r["ks_d"] is None and r["ks_stat"] is None
