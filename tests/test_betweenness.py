"""betweenness_seeded (operators/graph.py, q173) — exact Brandes values
on hand graphs: the single path, the diamond split, multi-root
accumulation, depth truncation, endpoint/root exclusion, and the
empty-at-shallow-horizon edge.
"""

from pathhier_spark.operators.graph import betweenness_seeded

SCALE = 1_000_000


def _run(spark, edges, roots, depth=3):
    e = spark.createDataFrame(edges, "src string, dst string")
    s = spark.createDataFrame([(r,) for r in roots], "node string")
    return {
        r["node"]: (r["bc_fp"], r["bc"])
        for r in betweenness_seeded(e, s, max_depth=depth).collect()
    }


def test_single_path_interior_gets_one(spark):
    got = _run(spark, [("a", "b"), ("b", "c")], ["a"])
    assert got == {"b": (SCALE, 1.0)}  # a (root) and c (endpoint) excluded


def test_diamond_splits_evenly(spark):
    got = _run(
        spark,
        [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d")],
        ["a"],
    )
    assert got == {"b": (SCALE // 2, 0.5), "c": (SCALE // 2, 0.5)}


def test_undirected_path_sums_over_roots(spark):
    # symmetrized a-b-c with all three nodes as roots: b carries the
    # a->c and c->a paths; from root b nothing is interior.
    es = [("a", "b"), ("b", "a"), ("b", "c"), ("c", "b")]
    got = _run(spark, es, ["a", "b", "c"])
    assert got == {"b": (2 * SCALE, 2.0)}


def test_depth_truncation_bounds_credit(spark):
    # a->b->c->d->e at depth 3 stops at d: delta(c)=1 (path to d),
    # delta(b)=1*(1+1)=2; e beyond the horizon contributes nothing.
    got = _run(
        spark,
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")],
        ["a"],
        depth=3,
    )
    assert got == {"b": (2 * SCALE, 2.0), "c": (SCALE, 1.0)}


def test_sigma_multiplicity_weights_paths(spark):
    # two parallel length-2 routes a->{b,c}->d plus a->x->d gives d
    # sigma 3; interior deltas split 1/3 each (floor in micro-units).
    got = _run(
        spark,
        [
            ("a", "b"), ("a", "c"), ("a", "x"),
            ("b", "d"), ("c", "d"), ("x", "d"),
        ],
        ["a"],
    )
    third = SCALE // 3  # 333333 — floored identically on both engines
    assert got["b"] == (third, round(third / SCALE, 6))
    assert got["b"] == got["c"] == got["x"]


def test_shallow_horizon_is_empty_with_schema(spark):
    e = spark.createDataFrame([("a", "b")], "src string, dst string")
    s = spark.createDataFrame([("a",)], "node string")
    out = betweenness_seeded(e, s, max_depth=3)
    assert out.count() == 0
    assert out.columns == ["node", "bc_fp", "bc"]


def _run_edges(spark, edges, roots, depth=3):
    from pathhier_spark.operators.graph import edge_betweenness_seeded

    e = spark.createDataFrame(edges, "src string, dst string")
    s = spark.createDataFrame([(r,) for r in roots], "node string")
    return {
        (r["src"], r["dst"]): (r["eb_fp"], r["eb"])
        for r in edge_betweenness_seeded(e, s, max_depth=depth).collect()
    }


def test_edge_betweenness_path_counts_root_edge(spark):
    # a->b->c from a: edge (a,b) lies on the paths to b AND c -> 2;
    # edge (b,c) only on the path to c -> 1
    got = _run_edges(spark, [("a", "b"), ("b", "c")], ["a"])
    assert got == {("a", "b"): (2 * SCALE, 2.0), ("b", "c"): (SCALE, 1.0)}


def test_edge_betweenness_diamond_split(spark):
    got = _run_edges(
        spark,
        [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d")],
        ["a"],
    )
    # each first-hop edge: its endpoint (1) + half the paths to d (0.5)
    half = SCALE // 2
    assert got[("a", "b")] == (SCALE + half, 1.5)
    assert got[("a", "c")] == (SCALE + half, 1.5)
    assert got[("b", "d")] == (half, 0.5)
    assert got[("c", "d")] == (half, 0.5)


def test_edge_betweenness_consistent_with_node_deltas(spark):
    # node betweenness of an interior node equals the sum of its
    # OUT-edge credits (Brandes: delta(u) = sum of edge terms) — the
    # mutual-consistency claim in the docstring
    edges = [("a", "b"), ("b", "c"), ("b", "d")]
    nodes = _run(spark, edges, ["a"])
    eb = _run_edges(spark, edges, ["a"])
    assert nodes["b"][0] == eb[("b", "c")][0] + eb[("b", "d")][0]


def test_edge_betweenness_single_edge(spark):
    got = _run_edges(spark, [("a", "b")], ["a"])
    assert got == {("a", "b"): (SCALE, 1.0)}
