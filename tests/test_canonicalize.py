"""Connected components vs the union-find oracle (FIXTURES.md §4 cases)."""

import random

from pathhier_spark.functions.oracle import UnionFind
from pathhier_spark.operators.canonicalize import (
    assign_local_ids,
    connected_components,
    xref_cooccurrence_edges,
)
from pathhier_spark.sources import corpus as corpus_mod


def _oracle_components(pairs):
    uf = UnionFind()
    for a, b in pairs:
        uf.union(a, b)
    return uf.components()


def _check(spark, pairs):
    df = spark.createDataFrame(pairs, "xref_a string, xref_b string")
    got = {
        r["node"]: r["component"] for r in connected_components(df).collect()
    }
    want = _oracle_components(pairs)
    assert got == want, f"mismatch: {dict(sorted(got.items()))[:10]}"


def test_fixture_graph(spark):
    c = corpus_mod.generate(n_classes=40, n_docs=10, seed=42)
    pairs = [(x["xref_a"], x["xref_b"]) for x in c.xref_pairs]
    _check(spark, pairs)


def test_random_graph_vs_oracle(spark):
    rng = random.Random(13)
    nodes = [f"N:{i:04d}" for i in range(300)]
    pairs = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(250)
    ]  # sparse -> many components, some large
    _check(spark, pairs)


def test_long_chain(spark):
    # worst-case diameter: star algorithm must converge in O(log n) rounds
    pairs = [(f"X:{i:05d}", f"X:{i + 1:05d}") for i in range(200)]
    _check(spark, pairs)


def test_cooccurrence_edges_degree_guard(spark):
    rows = [
        ("e1", ["a", "b", "c"]),
        ("e2", ["c", "d"]),
        ("e3", []),  # no xrefs -> skipped
        ("e4", [f"hub{i}" for i in range(12)]),  # >10 xrefs -> skipped
        ("e5", ["z"]),  # singleton -> self-loop survives
    ]
    df = spark.createDataFrame(rows, "uid string, xrefs array<string>")
    edges = xref_cooccurrence_edges(df)
    got = {(r["xref_a"], r["xref_b"]) for r in edges.collect()}
    assert ("a", "b") in got and ("c", "d") in got and ("z", "z") in got
    assert not any(x.startswith("hub") for pair in got for x in pair)
    comps = connected_components(edges)
    labels = {r["node"]: r["component"] for r in comps.collect()}
    # a,b,c,d all one component; z alone
    assert len({labels[x] for x in "abcd"}) == 1
    assert labels["z"] == "z"
    with_ids = assign_local_ids(comps)
    ids = {r["node"]: r["local_id"] for r in with_ids.collect()}
    assert ids["a"] == ids["d"] != ids["z"]


def test_component_size_histogram_shape(spark):
    """q116 composition: CC labels -> size histogram. Two triangles and
    one isolated pair -> histogram {2: 1, 3: 2}."""
    from pyspark.sql import functions as F
    from pathhier_spark.operators.canonicalize import connected_components

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"),
         ("p", "q"), ("q", "r"), ("r", "p"),
         ("x", "y")],
        "xref_a string, xref_b string",
    )
    hist = {
        r["component_size"]: r["n_components"]
        for r in connected_components(edges)
        .groupBy("component")
        .agg(F.count(F.lit(1)).alias("sz"))
        .groupBy(F.col("sz").alias("component_size"))
        .agg(F.count(F.lit(1)).alias("n_components"))
        .collect()
    }
    assert hist == {2: 1, 3: 2}


def test_cc_incremental_matches_scratch_and_spares_untouched(spark):
    """cc_incremental (q185): merging two components via a delta edge
    relabels exactly the touched components to the global min; labels
    of untouched components pass through; brand-new nodes register;
    the result equals a from-scratch recompute; empty delta is a
    passthrough."""
    from pathhier_spark.operators.canonicalize import (
        cc_incremental,
        connected_components,
    )

    def edges(pairs):
        return spark.createDataFrame(pairs, "xref_a string, xref_b string")

    # history: {a,b}, {c,d}, {x,y} (+ self-loop singleton s)
    old = edges(
        [("a", "b"), ("c", "d"), ("x", "y"), ("s", "s")]
    )
    hist = connected_components(old)
    # delta: join {a,b} with {c,d}; attach brand-new node z to x
    new = edges([("b", "c"), ("z", "x")])
    got = {
        r["node"]: r["component"]
        for r in cc_incremental(hist, new).collect()
    }
    scratch = {
        r["node"]: r["component"]
        for r in connected_components(old.union(new)).collect()
    }
    assert got == scratch
    assert got["d"] == "a"          # merged component takes the global min
    assert got["z"] == "x"          # new node joined the x-component
    assert got["s"] == "s"          # untouched singleton label unchanged

    # empty delta: every label passes through
    empty = edges([])
    got2 = {
        r["node"]: r["component"]
        for r in cc_incremental(hist, empty).collect()
    }
    assert got2 == {r["node"]: r["component"] for r in hist.collect()}
