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
