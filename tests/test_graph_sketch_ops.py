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


def test_hll_grouped_matches_per_group_ungrouped(spark):
    from pathhier_spark.operators.textstats import (
        hll_estimate_grouped,
        hll_registers_grouped,
    )

    df = spark.range(3000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        F.col("id").cast("string").alias("v"),
    )
    grouped = {
        (r["g"], r["j"]): r["reg"]
        for r in hll_registers_grouped(df, "g", "v").collect()
    }
    for g in ("0", "1", "2"):
        solo = {
            r["j"]: r["reg"]
            for r in hll_registers(df.filter(F.col("g") == g), "v").collect()
        }
        assert {j: grouped[(g, j)] for j in solo} == solo
    ests = {
        r["g"]: r["est"]
        for r in hll_estimate_grouped(
            hll_registers_grouped(df, "g", "v"), "g"
        ).collect()
    }
    for g in ("0", "1", "2"):
        solo_est = hll_estimate(
            hll_registers(df.filter(F.col("g") == g), "v")
        ).collect()[0]["est"]
        assert ests[g] == pytest.approx(solo_est, rel=1e-12)


def test_hll_grouped_merge_by_max_across_shards(spark):
    from pathhier_spark.operators.textstats import hll_registers_grouped

    df = spark.range(2000).select(
        (F.col("id") % 2).cast("string").alias("g"),
        F.col("id").cast("string").alias("v"),
    )
    shard_a = df.filter(F.col("id") < 1000)
    shard_b = df.subtract(shard_a)
    full = {
        (r["g"], r["j"]): r["reg"]
        for r in hll_registers_grouped(df, "g", "v").collect()
    }
    merged = {
        (r["g"], r["j"]): r["reg"]
        for r in (
            hll_registers_grouped(shard_a, "g", "v")
            .unionByName(hll_registers_grouped(shard_b, "g", "v"))
            .groupBy("g", "j")
            .agg(F.max("reg").alias("reg"))
        ).collect()
    }
    assert full == merged


def test_hits_bipartite_ranking(spark):
    from pathhier_spark.operators.graph import hits_fixedpoint

    # h1 points at both authorities, h2 at one; a1 has both hubs, a2 one
    edges = _edges_str(spark, [("h1", "a1"), ("h1", "a2"), ("h2", "a1")])
    out = {r["node"]: r for r in hits_fixedpoint(edges).collect()}
    assert out["h1"]["h_fp"] == 1_000_000  # top hub pinned at scale
    assert out["a1"]["a_fp"] == 1_000_000  # top authority pinned at scale
    assert out["h1"]["h_fp"] > out["h2"]["h_fp"] > 0
    assert out["a1"]["a_fp"] > out["a2"]["a_fp"] > 0
    # pure-source / pure-sink: hubs have no authority and vice versa
    assert out["h1"]["a_fp"] == 0 and out["a1"]["h_fp"] == 0


def _edges_str(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_hits_matches_integer_replica(spark):
    from pathhier_spark.operators.graph import hits_fixedpoint

    pairs = [
        ("u0", "v0"), ("u0", "v1"), ("u1", "v1"), ("u1", "v2"),
        ("u2", "v0"), ("u2", "v2"), ("v0", "u1"),
    ]
    scale, iters = 1_000_000, 3
    nodes = sorted({x for p in pairs for x in p})
    h = {n: scale for n in nodes}

    def half(score, fwd):
        raw = {}
        for s, d in pairs:
            src, dst = (s, d) if fwd else (d, s)
            raw[dst] = raw.get(dst, 0) + score[src]
        m = max(raw.values())
        return {
            n: (raw.get(n, 0) * scale) // m if m > 0 else 0 for n in nodes
        }

    for _ in range(iters):
        a = half(h, True)
        h = half(a, False)
    out = {
        r["node"]: (r["h_fp"], r["a_fp"])
        for r in hits_fixedpoint(_edges_str(spark, pairs)).collect()
    }
    assert out == {n: (h[n], a[n]) for n in nodes}


def test_hits_empty_graph_scores_zero(spark):
    from pathhier_spark.operators.graph import hits_fixedpoint

    # no edges at all -> no nodes, empty result (guard: no div-by-zero)
    df = spark.createDataFrame([], "src string, dst string")
    assert hits_fixedpoint(df).collect() == []


# --- local clustering coefficient ------------------------------------------


def test_local_clustering_known_graph(spark):
    from pathhier_spark.operators.graph import local_clustering

    # K4 on {0,1,2,3} plus pendant 4 attached to 0:
    #   nodes 1,2,3: deg 3, tri 3 -> lcc = 2*3/(3*2) = 1.0
    #   node 0: deg 4, tri 3 -> lcc = 2*3/(4*3) = 0.5
    #   node 4: deg 1 -> excluded (lcc undefined)
    pairs = [(a, b) for a in range(4) for b in range(4) if a < b] + [(0, 4)]
    out = {r["node"]: r for r in local_clustering(_edges(spark, pairs)).collect()}
    assert set(out) == {0, 1, 2, 3}
    assert out[0]["lcc"] == 0.5 and out[0]["deg"] == 4
    assert all(out[n]["lcc"] == 1.0 for n in (1, 2, 3))


def test_local_clustering_triangle_free(spark):
    from pathhier_spark.operators.graph import local_clustering

    # path graph: middle nodes have deg 2 but no triangles -> lcc 0.0
    out = {
        r["node"]: r
        for r in local_clustering(
            _edges(spark, [(0, 1), (1, 2), (2, 3)])
        ).collect()
    }
    assert set(out) == {1, 2}
    assert all(r["n_tri"] == 0 and r["lcc"] == 0.0 for r in out.values())


# --- deterministic walks ----------------------------------------------------


def test_deterministic_walks_reproducible_and_sinks(spark):
    from pathhier_spark.operators.graph import deterministic_walks

    # hub 0 -> {1,2,3}; 1 -> {4}; everything else is a sink
    e = spark.createDataFrame(
        [("n0", "n1"), ("n0", "n2"), ("n0", "n3"), ("n1", "n4")],
        "src string, dst string",
    )
    out1 = sorted(
        (r["walk_id"], r["step"], r["node"])
        for r in deterministic_walks(e, n_seeds=2, length=3).collect()
    )
    # seeds = top out-degree: n0 (3), n1 (1)
    assert {w for w, _, _ in out1} == {"n0", "n1"}
    # step 0 is the seed itself
    assert ("n0", 0, "n0") in out1 and ("n1", 0, "n1") in out1
    # n1's walk: n1 -> n4 (only edge) then n4 is a sink -> walk ends
    n1_walk = [(s, n) for w, s, n in out1 if w == "n1"]
    assert n1_walk == [(0, "n1"), (1, "n4")]
    # n0's walk takes exactly one of {n1,n2,n3} at step 1 (hash argmin)
    n0_step1 = [n for w, s, n in out1 if w == "n0" and s == 1]
    assert len(n0_step1) == 1 and n0_step1[0] in {"n1", "n2", "n3"}
    # reproducible under a different partitioning of the same edges
    out2 = sorted(
        (r["walk_id"], r["step"], r["node"])
        for r in deterministic_walks(
            e.repartition(7), n_seeds=2, length=3
        ).collect()
    )
    assert out1 == out2


# --- neighborhood_aggregate / common_neighbor_links /
# --- transitive_closure_mindist (round 5)

def test_neighbor_agg_hand_computed(spark):
    from pathhier_spark.operators.graph import neighborhood_aggregate

    # 1 -> 2, 1 -> 3, 2 -> 3 ; feat = out-degree: {1: 2, 2: 1, 3: 0}
    e = spark.createDataFrame([(1, 2), (1, 3), (2, 3)], "src int, dst int")
    f = spark.createDataFrame(
        [(1, 2), (2, 1), (3, 0)], "node int, feat int"
    )
    got = {
        r["node"]: (r["h1_sum"], r["h1_cnt"], r["h2_sum"], r["h2_cnt"])
        for r in neighborhood_aggregate(e, f, hops=2).collect()
    }
    # node 1: 1-hop nbrs {2,3} -> sum 1+0=1 cnt 2; 2-hop paths 1->2->3 -> sum 0 cnt 1
    # node 2: 1-hop {3} -> (0,1); no 2-hop (3 has no out-edges) -> (0,0)
    # node 3: no out-edges -> all zero
    assert got == {1: (1, 2, 0, 1), 2: (0, 1, 0, 0), 3: (0, 0, 0, 0)}


def test_neighbor_agg_path_multiplicity(spark):
    from pathhier_spark.operators.graph import neighborhood_aggregate

    # diamond: 1->2, 1->3, 2->4, 3->4 — TWO 2-hop paths from 1 to 4
    e = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 4), (3, 4)], "src int, dst int"
    )
    f = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 0), (4, 7)], "node int, feat int"
    )
    got = {
        r["node"]: (r["h2_sum"], r["h2_cnt"])
        for r in neighborhood_aggregate(e, f, hops=2).collect()
    }
    assert got[1] == (14, 2)  # 4's feat counted once per path


def test_common_neighbor_links_wedge(spark):
    from pathhier_spark.operators.graph import common_neighbor_links

    # square 1-2-3-4-1: (1,3) and (2,4) are the non-adjacent diagonals,
    # each sharing exactly the two opposite corners
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1)], "src int, dst int"
    )
    rows = {
        (r["a"], r["b"]): (r["common"], r["deg_a"], r["deg_b"], r["jaccard"])
        for r in common_neighbor_links(e, min_common=2).collect()
    }
    assert set(rows) == {(1, 3), (2, 4)}
    assert rows[(1, 3)] == (2, 2, 2, 1.0)  # jaccard 2/(2+2-2)


def test_common_neighbor_links_excludes_existing_edges(spark):
    from pathhier_spark.operators.graph import common_neighbor_links

    # triangle + pendant: every wedge pair is already an edge
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3)], "src int, dst int"
    )
    assert common_neighbor_links(e, min_common=1).count() == 0


def test_common_neighbor_links_max_degree_drops_hub_wedges(spark):
    from pathhier_spark.operators.graph import common_neighbor_links

    # star: hub 0 connects 1..4; all pairs share only the hub
    e = spark.createDataFrame(
        [(0, i) for i in range(1, 5)], "src int, dst int"
    )
    assert common_neighbor_links(e, min_common=1).count() == 6
    assert (
        common_neighbor_links(e, min_common=1, max_degree=3).count() == 0
    )


def test_transitive_closure_chain_and_bound(spark):
    from pathhier_spark.operators.graph import transitive_closure_mindist

    # chain 0->1->...->9: distances up to 9, but 3 doublings close only <= 8
    e = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], "src int, dst int"
    )
    got = {
        (r["src"], r["dst"]): r["dist"]
        for r in transitive_closure_mindist(e, doublings=3).collect()
    }
    assert got[(0, 8)] == 8
    assert (0, 9) not in got  # dist 9 > 2**3
    assert got[(3, 7)] == 4
    assert len(got) == sum(min(9 - i, 8) for i in range(9))


def test_transitive_closure_takes_min_and_survives_cycles(spark):
    from pathhier_spark.operators.graph import transitive_closure_mindist

    # cycle 1->2->3->1 plus shortcut 1->3
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (1, 3)], "src int, dst int"
    )
    got = {
        (r["src"], r["dst"]): r["dist"]
        for r in transitive_closure_mindist(e, doublings=3).collect()
    }
    assert got[(1, 3)] == 1  # min(shortcut, via 2)
    assert got[(3, 2)] == 2  # 3->1->2
    assert all(a != b for (a, b) in got)  # self-pairs filtered


# --- reciprocity (q108, round 5) ---

def test_reciprocity_hand_computed(spark):
    from pathhier_spark.operators.graph import reciprocity

    # edges: a->b, b->a (reciprocal pair), a->c (one-way), c->c (self,
    # dropped), plus a duplicate a->b (deduped)
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("a", "c"), ("c", "c"), ("a", "b")],
        "src string, dst string",
    )
    r = reciprocity(edges).collect()[0]
    assert (r["n_edges"], r["n_reciprocal"]) == (3, 2)
    assert r["reciprocity"] == round(2 / 3, 6)


def test_reciprocity_extremes(spark):
    from pathhier_spark.operators.graph import reciprocity

    dag = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "src string, dst string"
    )
    assert reciprocity(dag).collect()[0]["reciprocity"] == 0.0
    sym = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("b", "c"), ("c", "b")],
        "src string, dst string",
    )
    assert reciprocity(sym).collect()[0]["reciprocity"] == 1.0


# --- degree assortativity (q110, round 5) ---

def test_assortativity_hand_computed(spark):
    from pathhier_spark.operators.graph import degree_assortativity

    # triangle a-b-c plus pendant c-d (degrees a=2 b=2 c=3 d=1):
    # networkx degree_assortativity_coefficient = -5/7; duplicates and
    # self-loops must be dropped before degree counting
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"),
         ("b", "a"), ("d", "d")],
        "src string, dst string",
    )
    r = degree_assortativity(edges).collect()[0]
    assert r["n_pairs"] == 8  # 4 undirected edges, both orientations
    assert r["assortativity"] == round(-5 / 7, 6)


def test_assortativity_extremes(spark):
    from pathhier_spark.operators.graph import degree_assortativity

    # star K1,3: hub wires only to leaves -> perfectly disassortative
    star = spark.createDataFrame(
        [("c", "a"), ("c", "b"), ("c", "d")], "src string, dst string"
    )
    assert degree_assortativity(star).collect()[0]["assortativity"] == -1.0
    # 3-cycle: regular graph, zero degree variance -> NULL (undefined)
    cyc = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], "src string, dst string"
    )
    assert degree_assortativity(cyc).collect()[0]["assortativity"] is None


# --- redirect-chain resolution / pointer doubling (q111, round 5) ---

def test_resolve_chains_hand_computed(spark):
    from pathhier_spark.operators.graph import resolve_chains

    # two chains merging into terminal T: a->b->c->T and y->x->T
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "T"), ("x", "T"), ("y", "x")],
        "src string, dst string",
    )
    got = sorted(tuple(r) for r in resolve_chains(edges).collect())
    assert got == [
        ("a", "T", 3), ("b", "T", 2), ("c", "T", 1),
        ("x", "T", 1), ("y", "T", 2),
    ]


def test_resolve_chains_long_chain_log_rounds(spark):
    from pathhier_spark.operators.graph import resolve_chains

    # a 200-link chain must converge within ceil(log2(200)) = 8 doubling
    # rounds — max_rounds=8 passing IS the log-convergence assertion
    edges = spark.createDataFrame(
        [(f"n{i}", f"n{i+1}") for i in range(200)], "src string, dst string"
    )
    out = {r["src"]: (r["final"], r["hops"]) for r in
           resolve_chains(edges, max_rounds=8).collect()}
    assert out["n0"] == ("n200", 200)
    assert out["n199"] == ("n200", 1)
    assert out["n100"] == ("n200", 100)


def test_resolve_chains_cycle_raises(spark):
    from pathhier_spark.operators.graph import resolve_chains
    import pytest as _pytest

    cyc = spark.createDataFrame(
        [("a", "b"), ("b", "a")], "src string, dst string"
    )
    with _pytest.raises(ValueError, match="cycle"):
        resolve_chains(cyc, max_rounds=5).collect()


# --- TrustRank (q112, round 5) ---

def test_trustrank_hand_computed(spark):
    from pathhier_spark.operators.graph import trustrank_fixedpoint

    # chain a->b->c with seed {a}, plus a seed-unreachable edge x->y;
    # 2 rounds at damping 85, scale 1e6 (teleport 150000):
    #   r1: a=150000, b=floor(.85*1e6)=850000, c=0
    #   r2: a=150000, b=floor(.85*150000)=127500, c=floor(.85*850000)=722500
    # x and y never see trust — the defining TrustRank property
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y")], "src string, dst string"
    )
    seeds = spark.createDataFrame([("a",)], "node string")
    got = {
        r["node"]: r["rank_fp"]
        for r in trustrank_fixedpoint(edges, seeds, iterations=2).collect()
    }
    assert got == {
        "a": 150000, "b": 127500, "c": 722500, "x": 0, "y": 0,
    }


# --- co-citation similarity (q113, round 5) ---

def test_cocitation_hand_computed(spark):
    from pathhier_spark.operators.graph import cocitation_pairs

    # s1 and s2 both cite {a, b}; s3 cites {a, c}; duplicate edge deduped
    edges = spark.createDataFrame(
        [("s1", "a"), ("s1", "b"), ("s2", "a"), ("s2", "b"),
         ("s3", "a"), ("s3", "c"), ("s1", "a")],
        "src string, dst string",
    )
    got = sorted(tuple(r) for r in cocitation_pairs(edges).collect())
    # (a,b) co-cited by s1+s2 = 2 >= min_count; (a,c) only by s3 -> pruned
    assert got == [("a", "b", 2)]


def test_cocitation_hub_guard(spark):
    from pathhier_spark.operators.graph import cocitation_pairs

    # a hub citing 5 targets is dropped at max_out_degree=4, so the pairs
    # it alone would have created disappear entirely
    hub = [("hub", t) for t in ["a", "b", "c", "d", "e"]]
    pair = [("s1", "a"), ("s1", "b"), ("s2", "a"), ("s2", "b")]
    edges = spark.createDataFrame(hub + pair, "src string, dst string")
    got = sorted(
        tuple(r)
        for r in cocitation_pairs(edges, max_out_degree=4).collect()
    )
    assert got == [("a", "b", 2)]
    # raising the cap readmits the hub: (a,b) now 3, hub-only pairs at 1
    # stay below min_count
    got2 = sorted(
        tuple(r)
        for r in cocitation_pairs(edges, max_out_degree=5).collect()
    )
    assert got2 == [("a", "b", 3)]


# --- neighborhood function: exact + HyperBall (q115, round 5) ---

def test_neighborhood_exact_hand_computed(spark):
    from pathhier_spark.operators.graph import neighborhood_function

    # chain a->b->c->d: hop1 = 3 edges, hop2 adds (a,c),(b,d), hop3 adds
    # (a,d); saturates at 6
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], "src string, dst string"
    )
    got = {r["hop"]: r["n_pairs"]
           for r in neighborhood_function(edges, max_hops=4).collect()}
    assert got == {1: 3, 2: 5, 3: 6, 4: 6}


def test_hyperball_tracks_exact_curve(spark):
    from pathhier_spark.operators.graph import (
        hyperball_neighborhood, neighborhood_function,
    )

    # deterministic 2-out expander on 300 nodes; md5-derived registers
    # make the estimates exact constants, so the bound is a pinned fact,
    # not a flaky statistical assertion
    edges = spark.createDataFrame(
        [(f"n{i}", f"n{(i * 7 + 1) % 300}") for i in range(300)]
        + [(f"n{i}", f"n{(i * 13 + 5) % 300}") for i in range(300)],
        "src string, dst string",
    )
    exact = {r["hop"]: r["n_pairs"]
             for r in neighborhood_function(edges, max_hops=4).collect()}
    est = {r["hop"]: r["est_pairs"]
           for r in hyperball_neighborhood(edges, max_hops=4).collect()}
    assert exact == {1: 600, 2: 1800, 3: 4194, 4: 8874}
    for h, n in exact.items():
        assert abs(est[h] - n) / n < 0.05, (h, est[h], n)
    # the estimate curve must be monotone like the exact one
    assert est[1] < est[2] < est[3] < est[4]


# --- metapath composition counts (q121, round 5) ---

def test_metapath_hand_computed(spark):
    from pathhier_spark.operators.graph import metapath_counts

    # a -p1-> m -p2-> x, a -p1-> m -p2-> y, b -p1-> m -p2-> x
    # => (p1,p2): paths = 2 subj-sides x 2 obj-sides via m = 4, pairs 4
    triples = spark.createDataFrame(
        [("a", "p1", "m"), ("b", "p1", "m"),
         ("m", "p2", "x"), ("m", "p2", "y"),
         ("z", "p3", "w")],  # p3 composes with nothing
        "subj string, pred string, obj string",
    )
    got = sorted(
        tuple(r) for r in metapath_counts(triples, min_count=1).collect()
    )
    assert got == [("p1", "p2", 4, 4)]


def test_metapath_mid_degree_cap(spark):
    from pathhier_spark.operators.graph import metapath_counts

    # hub middle with in_deg 3 > cap 2 is dropped entirely
    triples = spark.createDataFrame(
        [("a", "p1", "hub"), ("b", "p1", "hub"), ("c", "p1", "hub"),
         ("hub", "p2", "x"),
         ("a", "p1", "m"), ("m", "p2", "y")],
        "subj string, pred string, obj string",
    )
    got = sorted(
        tuple(r)
        for r in metapath_counts(
            triples, max_mid_degree=2, min_count=1
        ).collect()
    )
    # only the small middle m survives
    assert got == [("p1", "p2", 1, 1)]


# --- deterministic negative sampling (q122, round 5) ---

def test_negative_samples_contract(spark):
    from pathhier_spark.operators.graph import negative_samples

    t = spark.createDataFrame(
        [("a", "p", "b"), ("b", "p", "c"), ("c", "q", "a"), ("a", "q", "c")],
        "subj string, pred string, obj string",
    )
    rows = sorted(tuple(r) for r in negative_samples(t).collect())
    # deterministic: identical on re-run
    assert rows == sorted(tuple(r) for r in negative_samples(t).collect())
    # every corruption is a real entity and never the true object
    ents = {"a", "b", "c"}
    for s, p, o, neg in rows:
        assert neg in ents and neg != o
    # collision rows (corruption == true obj) are dropped, not mutated:
    # output is a subset of the input triples
    inputs = {("a", "p", "b"), ("b", "p", "c"), ("c", "q", "a"),
              ("a", "q", "c")}
    assert {(s, p, o) for s, p, o, _ in rows} <= inputs


def test_negative_samples_spread_on_larger_graph(spark):
    from pathhier_spark.operators.graph import negative_samples

    # 100 triples over 50 entities: corruptions must hit MANY distinct
    # entities (the md5 predecessor is uniform, not a constant fallback)
    t = spark.createDataFrame(
        [(f"e{i}", "p", f"e{(i * 7 + 3) % 50}") for i in range(100)],
        "subj string, pred string, obj string",
    )
    rows = negative_samples(t).collect()
    distinct_negs = {r["neg_obj"] for r in rows}
    assert len(distinct_negs) > 20, len(distinct_negs)


def test_hyperball_empty_edges_returns_zero(spark):
    """Review regression: SUM over zero rows is NULL — the estimate must
    report 0.0 like the exact counterpart, not crash on float(None)."""
    from pathhier_spark.operators.graph import hyperball_neighborhood

    empty = spark.createDataFrame([], "src string, dst string")
    got = {r["hop"]: r["est_pairs"]
           for r in hyperball_neighborhood(empty, max_hops=2).collect()}
    assert got == {1: 0.0, 2: 0.0}


# --- power-law degree exponent (q130, round 5) ---

def test_powerlaw_alpha_hand_computed(spark):
    import math
    from pathhier_spark.operators.graph import powerlaw_alpha

    # star K1,5: only the hub (degree 5) is in the xmin=2 tail ->
    # alpha = 1 + 1/ln(5/2)
    e = spark.createDataFrame(
        [("h", f"l{i}") for i in range(5)], "src string, dst string"
    )
    r = powerlaw_alpha(e).collect()[0]
    assert (r["n_tail"], r["max_deg"]) == (1, 5)
    assert r["alpha"] == round(1 + 1 / math.log(2.5), 6)


def test_powerlaw_alpha_degenerate_null(spark):
    from pathhier_spark.operators.graph import powerlaw_alpha

    # single edge: both degrees 1, empty tail -> alpha NULL (no fit)
    e = spark.createDataFrame([("a", "b")], "src string, dst string")
    r = powerlaw_alpha(e).collect()[0]
    assert r["n_tail"] == 0 and r["alpha"] is None
    # all degrees exactly xmin: ln terms all 0 -> NULL, not a div-by-zero
    cyc = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], "src string, dst string"
    )
    r2 = powerlaw_alpha(cyc).collect()[0]
    assert r2["n_tail"] == 3 and r2["alpha"] is None


# --- modularity (q133, round 5) ---

def test_modularity_hand_computed(spark):
    from pathhier_spark.operators.graph import modularity

    # two triangles + one bridge, perfect 2-community split:
    # m=7, e_in=6, d_L = d_R = 7 -> Q = 6/7 - 98/196 = 0.357143
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"),
         ("x", "y"), ("y", "z"), ("z", "x"), ("c", "x")],
        "src string, dst string",
    )
    lab = spark.createDataFrame(
        [(n, "L" if n in "abc" else "R") for n in "abcxyz"],
        "node string, label string",
    )
    r = modularity(e, lab).collect()[0]
    assert tuple(r) == (2, 7, 6, 98, 0.357143)


def test_modularity_single_community_is_zero(spark):
    from pathhier_spark.operators.graph import modularity

    # everything in one community: e_in = m and D2 = (2m)^2 -> Q = 0
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "src string, dst string"
    )
    lab = spark.createDataFrame(
        [("a", "c1"), ("b", "c1"), ("c", "c1")], "node string, label string"
    )
    assert modularity(e, lab).collect()[0]["modularity"] == 0.0


# --- KG referential-integrity profile (q138, round 5) ---

def test_kg_integrity_hand_computed(spark):
    from pathhier_spark.operators.graph import kg_integrity

    triples = spark.createDataFrame(
        [("a", "p1", "b"), ("a", "p1", "zz"), ("zz", "p1", "zz"),
         ("b", "p2", "a")],
        "subj string, pred string, obj string",
    )
    dictionary = spark.createDataFrame(
        [("a",), ("b",), ("a",)], "term string"  # dup 'a': distinct inside
    )
    got = {
        r["pred"]: (r["n_edges"], r["n_subj_linked"], r["n_obj_linked"],
                    r["n_both_linked"], r["subj_rate"], r["both_rate"])
        for r in kg_integrity(triples, dictionary).collect()
    }
    # p1: 3 edges; subj linked a,a (2); obj linked b (1); both = (a,b) 1
    assert got["p1"] == (3, 2, 1, 1, 0.666667, 0.333333)
    assert got["p2"] == (1, 1, 1, 1, 1.0, 1.0)


# --- TextRank keywords (q140, round 5) ---

def test_textrank_hub_token_wins(spark):
    from pathhier_spark.operators.textstats import textrank_keywords

    # "hub" co-occurs with every other token; leaf tokens only with hub.
    # The star center must out-rank every leaf; k caps the output and
    # kw_rank is 1..k with the (rank desc, token asc) tie-break.
    docs = spark.createDataFrame(
        [(1, "hub aa"), (2, "hub bb"), (3, "hub cc"), (4, "hub dd")],
        "doc_id long, text string",
    )
    out = textrank_keywords(docs, k=3).collect()
    assert [r["kw_rank"] for r in out] == [1, 2, 3]
    assert out[0]["token"] == "hub"
    assert out[0]["rank_fp"] > out[1]["rank_fp"]
    # leaves tie -> lexicographic order among equals
    assert [r["token"] for r in out[1:]] == ["aa", "bb"]


# --- bounded-depth harmonic centrality (q141, round 5) ---

def test_harmonic_centrality_path_graph(spark):
    from pathhier_spark.operators.graph import harmonic_centrality

    # undirected path a-b-c-d (both directions passed explicitly);
    # from a within depth 3: b@1, c@2, d@3 ->
    # h_fp = 1000000 + 500000 + 333333 = 1833333 (floor micro-units)
    und = [("a", "b"), ("b", "c"), ("c", "d")]
    edges = spark.createDataFrame(
        und + [(y, x) for x, y in und], "src string, dst string"
    )
    sources = spark.createDataFrame([("a",), ("d",)], "node string")
    got = {r["node"]: (r["n_reached"], r["h_fp"], r["harmonic"])
           for r in harmonic_centrality(edges, sources, max_depth=3).collect()}
    assert got["a"] == (3, 1833333, 1.833333)
    assert got["d"] == (3, 1833333, 1.833333)


def test_harmonic_centrality_depth_cap(spark):
    from pathhier_spark.operators.graph import harmonic_centrality

    und = [("a", "b"), ("b", "c"), ("c", "d")]
    edges = spark.createDataFrame(
        und + [(y, x) for x, y in und], "src string, dst string"
    )
    sources = spark.createDataFrame([("a",)], "node string")
    got = harmonic_centrality(edges, sources, max_depth=1).collect()
    # depth 1: only b reachable
    assert [(r["n_reached"], r["h_fp"]) for r in got] == [(1, 1000000)]


# --- ontology LCA + path similarity (q142, round 5) ---

def test_ontology_lca_hand_case(spark):
    from pathhier_spark.operators.graph import (
        ontology_lca,
        transitive_closure_mindist,
    )

    # hierarchy: x -> p, y -> p, p -> r, z -> r (child -> parent)
    edges = spark.createDataFrame(
        [("x", "p"), ("y", "p"), ("p", "r"), ("z", "r")],
        "src string, dst string",
    )
    closure = transitive_closure_mindist(edges, doublings=3)
    pairs = spark.createDataFrame(
        [("x", "y"), ("p", "x"), ("x", "z"), ("x", "q")],
        "a string, b string",
    )
    got = {
        (r["a"], r["b"]): (
            r["lca"], r["dist_a"], r["dist_b"], r["dist_sum"], r["sim_fp"]
        )
        for r in ontology_lca(closure, pairs).collect()
    }
    # siblings: LCA p at 1+1
    assert got[("x", "y")] == ("p", 1, 1, 2, 333333)
    # ancestor pair: LCA is the ancestor itself (dist 0 on that side)
    assert got[("p", "x")] == ("p", 0, 1, 1, 500000)
    # cousins via the root: LCA r at 2+1
    assert got[("x", "z")] == ("r", 2, 1, 3, 250000)
    # q is not in the hierarchy: only the self-ancestor, no common -> no row
    assert ("x", "q") not in got
    assert len(got) == 3


def test_ontology_lca_tiebreak_lexicographic(spark):
    from pathhier_spark.operators.graph import ontology_lca

    # two common ancestors at the identical (dsum, da): pick min-name 'm'
    closure = spark.createDataFrame(
        [("x", "m", 1), ("x", "t", 1), ("y", "m", 1), ("y", "t", 1)],
        "src string, dst string, dist int",
    )
    pairs = spark.createDataFrame([("x", "y")], "a string, b string")
    rows = ontology_lca(closure, pairs).collect()
    assert len(rows) == 1
    assert rows[0]["lca"] == "m"
    assert rows[0]["dist_sum"] == 2


# --- fixed-round k-truss (q145, round 5) ---

def test_ktruss_hand_case(spark):
    from pathhier_spark.operators.graph import ktruss

    # K4 on {a,b,c,d} (every edge in 2 triangles) + pendant triangle
    # {d,e,f} (each edge in exactly 1) + dangling edge (f,g)
    k4 = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
          ("c", "d")]
    tri = [("d", "e"), ("d", "f"), ("e", "f")]
    edges = spark.createDataFrame(
        k4 + tri + [("f", "g")], "src string, dst string"
    )
    # k=4: need support >= 2 -> only the K4 survives, support 2 each
    got4 = {(r["u"], r["v"]): r["support"]
            for r in ktruss(edges, k=4, rounds=3).collect()}
    assert got4 == {e: 2 for e in k4}
    # k=3: need support >= 1 -> K4 + triangle survive, dangling edge drops
    got3 = {(r["u"], r["v"]): r["support"]
            for r in ktruss(edges, k=3, rounds=2).collect()}
    assert set(got3) == set(k4 + tri)
    assert all(got3[e] == 1 for e in tri)


def test_ktruss_cascade_and_convergence(spark):
    from pathhier_spark.operators.graph import ktruss

    # two triangles sharing edge (b,c): edge (b,c) has support 2, all
    # others 1. k=4 kills the outer edges round 1, then (b,c) loses its
    # triangles and dies round 2 -> empty truss (cascade needs >1 round)
    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c"), ("b", "d"), ("c", "d")],
        "src string, dst string",
    )
    assert ktruss(edges, k=4, rounds=1).count() == 1  # (b,c) still alive
    assert ktruss(edges, k=4, rounds=2).count() == 0
    assert ktruss(edges, k=4, rounds=3).count() == 0  # converged


def test_ktruss_rejects_k2(spark):
    from pathhier_spark.operators.graph import ktruss

    edges = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError):
        ktruss(edges, k=2)


# --- double-sweep diameter lower bound (q147, round 5) ---

def test_double_sweep_path_graph(spark):
    from pathhier_spark.operators.graph import double_sweep_diameter

    # path a-b-c-d-e (symmetric edges): start = 'a', sweep 1 reaches e@4,
    # sweep 2 from e comes all the way back -> diameter_lb = 4 (exact on
    # trees)
    und = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")]
    edges = spark.createDataFrame(
        und + [(y, x) for x, y in und], "src string, dst string"
    )
    r = double_sweep_diameter(edges, max_depth=6).collect()[0]
    assert (r["start_node"], r["far_node"], r["ecc_start"]) == ("a", "e", 4)
    assert (r["far2_node"], r["diameter_lb"]) == ("a", 4)


def test_double_sweep_improves_on_first_ecc(spark):
    from pathhier_spark.operators.graph import double_sweep_diameter

    # star + tail: start 'a' (min name) sits one hop from the hub, but
    # the true diameter is leaf->hub->tail1->tail2 = 3. Sweep 1 from 'a'
    # finds t2@3? a-hub=1, hub-leaves=1, tail: hub-t1-t2.
    # from a: hub@1, b@2,c@2,t1@2, t2@3 -> far=t2 ecc1=3; sweep 2 from t2
    # -> a/b/c @3 -> lb=3 (tie -> min name 'a')
    und = [("hub", "a"), ("hub", "b"), ("hub", "c"), ("hub", "t1"),
           ("t1", "t2")]
    edges = spark.createDataFrame(
        und + [(y, x) for x, y in und], "src string, dst string"
    )
    r = double_sweep_diameter(edges, max_depth=6).collect()[0]
    assert r["start_node"] == "a"
    assert (r["far_node"], r["ecc_start"]) == ("t2", 3)
    assert (r["far2_node"], r["diameter_lb"]) == ("a", 3)


def test_double_sweep_depth_cap(spark):
    from pathhier_spark.operators.graph import double_sweep_diameter

    und = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")]
    edges = spark.createDataFrame(
        und + [(y, x) for x, y in und], "src string, dst string"
    )
    r = double_sweep_diameter(edges, max_depth=2).collect()[0]
    # capped: sweep 1 from a reaches c@2; sweep 2 from c reaches a/e@2
    assert r["ecc_start"] == 2
    assert r["diameter_lb"] == 2


# --- Adamic-Adar link prediction (q150, round 5) ---

def test_adamic_adar_hand_case(spark):
    import math
    from pathhier_spark.operators.graph import adamic_adar_links

    # a and b share neighbors w1 (deg 2: only a, b) and hub (deg 4:
    # a, b, c, d); a-b not adjacent
    edges = spark.createDataFrame(
        [("a", "w1"), ("b", "w1"), ("a", "hub"), ("b", "hub"),
         ("c", "hub"), ("d", "hub")],
        "src string, dst string",
    )
    rows = adamic_adar_links(edges, min_common=2).collect()
    got = {(r["a"], r["b"]): (r["common"], r["adamic_adar"]) for r in rows}
    exp = round(1 / math.log(2) + 1 / math.log(4), 6)
    assert got[("a", "b")] == (2, exp)


def test_adamic_adar_prefers_rare_neighbors(spark):
    from pathhier_spark.operators.graph import adamic_adar_links

    # (a,b) share one rare neighbor (deg 2); (c,d) share one hub (deg 6):
    # same common count, AA ranks the rare-shared pair higher
    edges = spark.createDataFrame(
        [("a", "r"), ("b", "r"),
         ("c", "h"), ("d", "h"), ("e1", "h"), ("e2", "h"), ("e3", "h"),
         ("e4", "h")],
        "src string, dst string",
    )
    rows = adamic_adar_links(edges, min_common=1).collect()
    got = {(r["a"], r["b"]): r["adamic_adar"] for r in rows}
    assert got[("a", "b")] > got[("c", "d")]


def test_adamic_adar_excludes_existing_edges(spark):
    from pathhier_spark.operators.graph import adamic_adar_links

    # triangle a-b-c: every pair is already an edge -> no candidates
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c")], "src string, dst string"
    )
    assert adamic_adar_links(edges, min_common=1).count() == 0


# --- two-iteration SimRank (q153, round 5) ---

def test_simrank_square_hand_case(spark):
    from pathhier_spark.operators.graph import simrank_pairs

    # 4-cycle a-b-c-d-a: classic SimRank with C=0.8 gives
    # s2(a,c) = 0.2*(1 + 0.4 + 0.4 + 1) = 0.56
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("a", "d")],
        "src string, dst string",
    )
    qpairs = spark.createDataFrame(
        [("a", "c"), ("b", "d"), ("a", "b")], "a string, b string"
    )
    got = {(r["a"], r["b"]): r["s2_fp"]
           for r in simrank_pairs(edges, qpairs).collect()}
    assert got[("a", "c")] == 560000
    assert got[("b", "d")] == 560000
    # adjacent pair a-b: N(a)={b,d}, N(b)={a,c};
    # s1(a,b)=s1(a,c)... all four neighbor pairs are distinct nodes with
    # common counts: (b,a):cm? |N(b)∩N(a)| = 0 (N(b)={a,c}, N(a)={b,d})
    # -> s1 terms: (b,a)=0, (b,c): |{a,c}∩{b,d}|=0 -> 0, (d,a): 0,
    # (d,c): 0 -> s2(a,b) = 0
    assert got[("a", "b")] == 0


def test_simrank_shared_neighbor_beats_distant(spark):
    from pathhier_spark.operators.graph import simrank_pairs

    # star: x and y both hang off hub h; z hangs off a different hub g
    edges = spark.createDataFrame(
        [("x", "h"), ("y", "h"), ("z", "g"), ("g", "h")],
        "src string, dst string",
    )
    qpairs = spark.createDataFrame(
        [("x", "y"), ("x", "z")], "a string, b string"
    )
    got = {(r["a"], r["b"]): r["s2_fp"]
           for r in simrank_pairs(edges, qpairs).collect()}
    # x,y share the hub: s2 = C/(1*1) * s1(h,h) = 0.8
    assert got[("x", "y")] == 800000
    assert got[("x", "z")] < got[("x", "y")]


def test_scc_hand_graph(spark):
    from pathhier_spark.operators.graph import scc_colored

    # cycle {1,2,3}, cycle {10,11}, chain 20->21->1, branch 3->30
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (10, 11), (11, 10), (20, 21), (21, 1),
         (3, 30)],
        "src long, dst long",
    )
    got = {r["node"]: (r["scc_id"], r["scc_size"])
           for r in scc_colored(edges).collect()}
    # each SCC labeled by its minimum member
    assert got[1] == got[2] == got[3] == (1, 3)
    assert got[10] == got[11] == (10, 2)
    # tendrils are singleton SCCs labeled self
    assert got[20] == (20, 1)
    assert got[21] == (21, 1)
    assert got[30] == (30, 1)


def test_scc_two_cycles_bridged_stay_separate(spark):
    from pathhier_spark.operators.graph import scc_colored

    # a one-way bridge between two cycles must NOT merge them
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 5), (5, 6), (6, 5)], "src long, dst long"
    )
    got = {r["node"]: r["scc_id"] for r in scc_colored(edges).collect()}
    assert got[1] == got[2] == 1
    assert got[5] == got[6] == 5


def test_scc_back_bridge_merges_into_one(spark):
    from pathhier_spark.operators.graph import scc_colored

    # bridges BOTH ways -> one SCC of all four nodes
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 5), (5, 6), (6, 5), (6, 1)],
        "src long, dst long",
    )
    rows = scc_colored(edges).collect()
    assert {r["scc_id"] for r in rows} == {1}
    assert all(r["scc_size"] == 4 for r in rows)


def test_scc_self_loops_and_nulls_ignored(spark):
    from pathhier_spark.operators.graph import scc_colored

    edges = spark.createDataFrame(
        [(1, 1), (1, 2), (2, 1), (None, 3), (3, None), (3, 4)],
        "src long, dst long",
    )
    got = {r["node"]: (r["scc_id"], r["scc_size"])
           for r in scc_colored(edges).collect()}
    assert got[1] == got[2] == (1, 2)
    # NULL-endpoint edges dropped; 3 only present via the 3->4 edge
    assert got[3] == (3, 1)
    assert got[4] == (4, 1)


def test_scc_strict_raises_on_starved_rounds(spark):
    from pathhier_spark.operators.graph import scc_colored

    # a long chain with trim starved to 1 round and a single peel cannot
    # finish; strict must raise, strict=False labels stragglers NULL
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(8)] + [(8, 7)], "src long, dst long"
    )
    with pytest.raises(ValueError):
        scc_colored(edges, trim_rounds=1, peels=1, fb_rounds=1).collect()
    rows = scc_colored(
        edges, trim_rounds=1, peels=1, fb_rounds=1, strict=False
    ).collect()
    assert any(r["scc_id"] is None for r in rows)


def test_dag_longest_paths_diamond(spark):
    from pathhier_spark.operators.graph import dag_longest_paths

    e = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4)], "src long, dst long"
    )
    got = {r["node"]: (r["depth"], r["n_ancestors"])
           for r in dag_longest_paths(e).collect()}
    assert got[0] == (0, 0)
    assert got[1] == (1, 1) and got[2] == (1, 1)
    # longest path wins over the shortest route
    assert got[3] == (2, 3)
    assert got[4] == (3, 4)


def test_dag_longest_paths_cycle_raises(spark):
    from pathhier_spark.operators.graph import dag_longest_paths

    e = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    with pytest.raises(ValueError, match="cycle"):
        dag_longest_paths(e).collect()


def test_dag_longest_paths_saturation_raises(spark):
    from pathhier_spark.operators.graph import dag_longest_paths

    # a 4-hop chain saturates 2**2 = 4 exactly -> must refuse
    e = spark.createDataFrame(
        [(i, i + 1) for i in range(4)], "src long, dst long"
    )
    with pytest.raises(ValueError, match="saturated"):
        dag_longest_paths(e, doublings=2)
    got = {r["node"]: r["depth"]
           for r in dag_longest_paths(e, doublings=3).collect()}
    assert got[4] == 4


def test_scc_deep_backward_distance_raises_not_mislabels(spark):
    """Regression (r5 review): a hub SCC whose backward distance to the
    pivot exceeds fb_rounds must RAISE, never emit a partial SCC plus
    orphaned singletons."""
    from pathhier_spark.operators.graph import scc_colored

    edges = [(1, i) for i in range(2, 13)] \
        + [(i, i + 1) for i in range(2, 12)] + [(12, 1)]
    e = spark.createDataFrame(edges, "src long, dst long")
    with pytest.raises(ValueError, match="backward reach"):
        scc_colored(e).collect()
    rows = scc_colored(e, fb_rounds=16).collect()
    assert all(r["scc_id"] == 1 and r["scc_size"] == 12 for r in rows)


@pytest.mark.parametrize("driver_finish", [0, 100_000])
def test_boruvka_known_mst(spark, driver_finish):
    from pathhier_spark.operators.graph import boruvka_msf

    # classic 4-node graph; MST = {(0,1,1),(1,2,2),(1,3,4)} — identical
    # through the all-distributed path (driver_finish=0) and the hybrid
    # driver-Kruskal finish (the default)
    e = spark.createDataFrame(
        [(0, 1, 1), (1, 2, 2), (0, 2, 3), (1, 3, 4), (2, 3, 5)],
        "src long, dst long, w long",
    )
    got = {
        (r["a"], r["b"], r["w"])
        for r in boruvka_msf(e, driver_finish=driver_finish).collect()
    }
    assert got == {(0, 1, 1), (1, 2, 2), (1, 3, 4)}


def test_boruvka_hybrid_equals_distributed(spark):
    """The driver-Kruskal finish and the all-distributed path must emit
    the identical unique MSF — including when the hybrid kicks in MID-
    LOOP (driver_finish below the initial edge count, above the
    post-round-1 cross-component count)."""
    from pathhier_spark.operators.graph import boruvka_msf

    # 40-node graph: ring + chords, md5-style distinct pseudo-weights
    edges = [
        (i, (i + 1) % 40, (7 * i + 13) % 1000 + 1000) for i in range(40)
    ] + [(i, (i * 17 + 5) % 40, (11 * i + 3) % 1000 + 3000)
         for i in range(0, 40, 3)]
    edges = [(u, v, w) for u, v, w in edges if u != v]
    e = spark.createDataFrame(edges, "src long, dst long, w long")
    dist = {(r["a"], r["b"], r["w"])
            for r in boruvka_msf(e, driver_finish=0).collect()}
    entry = {(r["a"], r["b"], r["w"])
             for r in boruvka_msf(e).collect()}
    # ring halves components fast: after round 1 the cross-component
    # edge count is well under len(edges) — force the mid-loop branch
    mid = {(r["a"], r["b"], r["w"])
           for r in boruvka_msf(e, driver_finish=len(edges) // 3).collect()}
    assert entry == dist
    assert mid == dist


def test_boruvka_forest_spans_each_component(spark):
    from pathhier_spark.operators.graph import boruvka_msf

    e = spark.createDataFrame(
        [(0, 1, 1), (1, 2, 2), (0, 2, 3), (10, 11, 4)],
        "src long, dst long, w long",
    )
    got = {(r["a"], r["b"]) for r in boruvka_msf(e).collect()}
    assert got == {(0, 1), (1, 2), (10, 11)}


def test_boruvka_rejects_tied_weights(spark):
    from pathhier_spark.operators.graph import boruvka_msf

    e = spark.createDataFrame(
        [(0, 1, 7), (1, 2, 7)], "src long, dst long, w long"
    )
    with pytest.raises(ValueError, match="distinct"):
        boruvka_msf(e)


def test_boruvka_single_linkage_cut_equals_threshold_cc(spark):
    """Cutting the MSF at weight t must reproduce the flat t-threshold
    connected components — the single-linkage dendrogram property."""
    from pyspark.sql import functions as F

    from pathhier_spark.operators.canonicalize import connected_components
    from pathhier_spark.operators.graph import boruvka_msf

    edges = [(0, 1, 1), (1, 2, 2), (0, 2, 9), (2, 3, 6), (3, 4, 3),
             (4, 5, 8), (0, 5, 11), (1, 4, 12)]
    e = spark.createDataFrame(edges, "src long, dst long, w long")
    msf = boruvka_msf(e)
    for t in (2, 6, 8):
        pad = lambda c: F.lpad(c.cast("string"), 20, "0")  # noqa: E731
        nodes = e.select(pad(F.col("src")).alias("xref_a")).union(
            e.select(pad(F.col("dst")).alias("xref_a"))
        ).distinct().select("xref_a", F.col("xref_a").alias("xref_b"))

        def clusters(edge_df):
            cut = edge_df.filter(F.col("w") <= t) if "w" in edge_df.columns \
                else edge_df
            ce = cut.selectExpr("a as u", "b as v") \
                if "a" in cut.columns else cut.selectExpr(
                    "src as u", "dst as v")
            comp = connected_components(
                ce.select(pad(F.col("u")).alias("xref_a"),
                          pad(F.col("v")).alias("xref_b")).union(nodes)
            )
            return {(r["node"], r["component"]) for r in comp.collect()}

        assert clusters(msf) == clusters(e), f"threshold {t}"


def test_bowtie_hand_graph(spark):
    from pathhier_spark.operators.graph import bowtie_decomposition

    # core {5,6}; in: 1->5; out: 6->20->21; other: 30->31; a second
    # smaller SCC {40,41} must NOT become core
    edges = spark.createDataFrame(
        [(5, 6), (6, 5), (1, 5), (6, 20), (20, 21), (30, 31),
         (40, 41), (41, 40), (5, 6)],
        "src long, dst long",
    )
    got = {r["node"]: r["cls"]
           for r in bowtie_decomposition(edges).collect()}
    assert got[5] == got[6] == "core"
    assert got[1] == "in"
    assert got[20] == got[21] == "out"
    assert got[30] == got[31] == "other"
    # the size-2 tie broke to the smaller scc_id: {5,6} (id 5) beats
    # {40,41} (id 40)
    assert got[40] == got[41] == "other"


def test_bowtie_in_out_disjoint_and_total(spark):
    from pathhier_spark.operators.graph import bowtie_decomposition
    from pyspark.sql import functions as F

    docs = spark.range(0, 360).select(F.col("id").alias("doc_id"))
    n = F.col("doc_id") % 120
    e1 = docs.select(n.alias("src"), ((n * 2 + 5) % 120).alias("dst"))
    e2 = docs.filter(F.col("doc_id") % 3 == 0).select(
        n.alias("src"), ((n * 9 + 1) % 120).alias("dst")
    )
    out = bowtie_decomposition(e1.union(e2))
    counts = {r["cls"]: r["n"] for r in
              out.groupBy("cls").agg(F.count(F.lit(1)).alias("n"))
              .collect()}
    assert counts == {"core": 4, "in": 28, "out": 10, "other": 78}


def test_wl_fingerprint_path_separates_roles(spark):
    from pathhier_spark.operators.graph import wl_fingerprint

    # P4: a-b-c-d. Endpoints (a,d) are one structural role, internals
    # (b,c) another; one WL round already separates them (degree), and
    # further rounds must keep each pair merged.
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], "src string, dst string"
    )
    lbl = {r["node"]: r["wl_label"]
           for r in wl_fingerprint(edges, rounds=3).collect()}
    assert set(lbl) == {"a", "b", "c", "d"}
    assert lbl["a"] == lbl["d"]
    assert lbl["b"] == lbl["c"]
    assert lbl["a"] != lbl["b"]


def test_wl_fingerprint_star_hub_distinct(spark):
    from pathhier_spark.operators.graph import wl_fingerprint
    from pyspark.sql import functions as F

    edges = spark.createDataFrame(
        [("hub", f"leaf{i}") for i in range(4)], "src string, dst string"
    )
    out = wl_fingerprint(edges, rounds=2)
    hist = {r["wl_label"]: r["n"] for r in
            out.groupBy("wl_label").agg(F.count(F.lit(1)).alias("n"))
            .collect()}
    # exactly two roles: one hub, four interchangeable leaves
    assert sorted(hist.values()) == [1, 4]


def test_wl_fingerprint_isomorphism_invariant_histogram(spark):
    from pathhier_spark.operators.graph import wl_fingerprint
    from pyspark.sql import functions as F

    def hist(pairs):
        e = spark.createDataFrame(pairs, "src string, dst string")
        return sorted(
            (r["wl_label"], r["n"])
            for r in wl_fingerprint(e, rounds=3)
            .groupBy("wl_label").agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )

    # the same 6-node graph (two triangles bridged by an edge) under a
    # node renaming: label histograms must be identical, label-for-label
    g = [("a", "b"), ("b", "c"), ("c", "a"),
         ("d", "e"), ("e", "f"), ("f", "d"), ("c", "d")]
    ren = {"a": "x1", "b": "x2", "c": "x3", "d": "x4", "e": "x5", "f": "x6"}
    g2 = [(ren[u], ren[v]) for u, v in g]
    assert hist(g) == hist(g2)

    # and a NON-isomorphic same-edge-count graph (6-path plus a chord
    # making one triangle) must differ
    g3 = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("e", "f"),
          ("f", "a"), ("a", "c")]
    assert hist(g) != hist(g3)


def test_butterfly_k22_and_k23(spark):
    from pathhier_spark.operators.graph import butterfly_count

    k22 = spark.createDataFrame(
        [("s1", "d1"), ("s1", "d2"), ("s2", "d1"), ("s2", "d2"),
         ("s1", "d1")],  # duplicate edge must dedup
        "src string, dst string",
    )
    r = butterfly_count(k22).collect()[0]
    assert (r["n_edges"], r["wedges"], r["butterflies"]) == (4, 2, 1)
    assert abs(r["bfly_per_wedge"] - 0.5) < 1e-12

    k23 = spark.createDataFrame(
        [(s, d) for s in ("s1", "s2") for d in ("d1", "d2", "d3")],
        "src string, dst string",
    )
    r = butterfly_count(k23).collect()[0]
    # three dst of degree 2 -> 3 wedges; the one src pair has codeg 3
    # -> C(3,2) = 3 butterflies
    assert (r["wedges"], r["butterflies"]) == (3, 3)


def test_butterfly_degree_cap_reports_drops(spark):
    from pathhier_spark.operators.graph import butterfly_count

    edges = [("s1", "d1"), ("s1", "d2"), ("s2", "d1"), ("s2", "d2")]
    hot = [(f"s{i}", "hot") for i in range(1, 6)]  # degree-5 dst
    df = spark.createDataFrame(edges + hot, "src string, dst string")
    uncapped = butterfly_count(df).collect()[0]
    capped = butterfly_count(df, max_df=4).collect()[0]
    assert uncapped["n_dropped_dst"] == 0
    assert capped["n_dropped_dst"] == 1
    # with the hot dst removed the graph is exactly K2,2 again
    assert (capped["n_edges"], capped["wedges"], capped["butterflies"]) == (
        4, 2, 1,
    )
    # and uncapped counts include the hot wedge contributions
    assert uncapped["wedges"] == 2 + 10


def test_katz_fixedpoint_hand_computed(spark):
    from pathhier_spark.operators.graph import katz_fixedpoint

    # a->b, c->b, b->d: dmax = indeg(b) = 2, so with alpha_pct=20 and
    # scale=100 each edge carries floor(x / 10). Fixed point after two
    # rounds: sources stay at beta=100, b = 100 + 2*10 = 120,
    # d = 100 + floor(120/10) = 112.
    e = spark.createDataFrame(
        [("a", "b"), ("c", "b"), ("b", "d")], "src string, dst string"
    )
    got = {
        r["node"]: r["katz_fp"]
        for r in katz_fixedpoint(e, iterations=4, alpha_pct=20, scale=100).collect()
    }
    assert got == {"a": 100, "c": 100, "b": 120, "d": 112}


def test_katz_bounded_at_hub_degree(spark):
    from pathhier_spark.operators.graph import katz_fixedpoint

    # 200 spokes -> one hub: the dmax normalization must keep the hub's
    # score <= scale * (1 + alpha) regardless of in-degree (a plain
    # alpha^k recursion would give hub = scale * (1 + 200 * alpha)).
    e = spark.createDataFrame(
        [(f"s{i}", "hub") for i in range(200)], "src string, dst string"
    )
    got = {
        r["node"]: r["katz_fp"]
        for r in katz_fixedpoint(e, iterations=3, alpha_pct=20, scale=1_000_000).collect()
    }
    # each spoke contributes floor(1e6 * 20 / (100 * 200)) = 1000
    assert got["hub"] == 1_000_000 + 200 * 1000
    assert got["s0"] == 1_000_000


def test_hash_priority_matching_is_a_matching(spark):
    from pathhier_spark.operators.graph import hash_priority_matching

    # path a-b-c-d plus isolated edge e-f: any maximal matching covers
    # e-f and exactly one of {a-b, b-c, c-d} without sharing endpoints
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("e", "f")],
        "src string, dst string",
    )
    out = hash_priority_matching(e, rounds=4).collect()
    assert out and out[0]["n_left"] == 0  # maximal: nothing matchable left
    srcs = [r["src"] for r in out]
    dsts = [r["dst"] for r in out]
    ends = srcs + dsts
    assert len(ends) == len(set(ends))  # endpoint-disjoint
    assert ("e", "f") in {(r["src"], r["dst"]) for r in out}


def test_hash_priority_matching_star_matches_one(spark):
    from pathhier_spark.operators.graph import hash_priority_matching

    # a star can match exactly one edge; the rest become unmatchable
    # (hub gone), so n_left must be 0 after the hub's neighbors drop out
    e = spark.createDataFrame(
        [("hub", f"x{i}") for i in range(6)], "src string, dst string"
    )
    out = hash_priority_matching(e, rounds=4).collect()
    assert len(out) == 1 and out[0]["n_left"] == 0


def test_densest_subgraph_peel_isolates_planted_clique(spark):
    from pathhier_spark.operators.graph import densest_subgraph_peel

    # a 6-clique (density 15/6 = 2.5) plus a long path of pendants:
    # peeling strips the path first; the best round is the pure clique
    clique = [(f"c{i}", f"c{j}") for i in range(6) for j in range(i + 1, 6)]
    path = [(f"p{i}", f"p{i+1}") for i in range(8)] + [("p0", "c0")]
    e = spark.createDataFrame(clique + path, "src string, dst string")
    out = densest_subgraph_peel(e, rounds=12).collect()
    best = [r for r in out if r["is_best"]]
    assert len(best) == 1
    assert (best[0]["n_nodes"], best[0]["n_edges"]) == (6, 15)
    assert abs(best[0]["density"] - 2.5) < 1e-12
    # round 0 contains the whole graph
    assert out[0]["round"] == 0 and out[0]["n_nodes"] == 15
