"""Rule-tier scoring + greedy bipartite matching vs hand-computed goldens."""

import numpy as np
import pytest

from pathhier_spark.operators.align import (
    aggregate_pair_scores,
    align_pairs,
    greedy_align_matrix,
    pair_alignment_score,
    prelim_alignments,
)


def test_rule_tiers(spark):
    # FIXTURES.md §8: tiers 1.0 / 0.75 / 0.5 / 0.25 / blocked
    left = spark.createDataFrame(
        [
            ("p", 0, "Protein", ["X:1"], ["alpha"], ["P:1"]),
            ("p", 1, "Protein", ["X:9"], ["beta"], ["P:2"]),
            ("p", 2, "Group", ["X:5"], ["gamma"], ["P:3"]),
        ],
        "pair_id string, idx int, obj_type string, eq_xrefs array<string>,"
        " eq_names array<string>, parent_xrefs array<string>",
    ).withColumnRenamed("idx", "idx")
    right = spark.createDataFrame(
        [
            ("p", 0, "Protein", ["X:1"], ["other"], ["P:9"]),   # xref tier vs l0
            ("p", 1, "SmallMolecule", ["X:7"], ["beta"], []),   # names-only vs l1
            ("p", 2, "Protein", ["X:8"], ["beta"], []),          # names+type vs l1
            ("p", 3, "Protein", [], [], ["P:2"]),                # parent tier vs l1
            ("p", 4, "Protein", ["X:5"], ["gamma"], []),         # blocked vs l2 (Group)
        ],
        "pair_id string, idx int, obj_type string, eq_xrefs array<string>,"
        " eq_names array<string>, parent_xrefs array<string>",
    )
    got = {
        (r["i"], r["j"]): r["rule_score"]
        for r in prelim_alignments(left, right).collect()
    }
    assert got[(0, 0)] == 1.0
    assert got[(1, 1)] == 0.5
    assert got[(1, 2)] == 0.75
    assert got[(1, 3)] == 0.25
    assert got[(2, 4)] == 0.0  # Group vs non-Group restricted


def test_greedy_align_simple():
    sim = np.array(
        [
            [0.9, 0.1, 0.0],
            [0.2, 0.8, 0.0],
            [0.0, 0.0, 0.3],  # below 0.5 floor -> unmatched
        ]
    )
    got = greedy_align_matrix(sim)
    assert {(i, j) for i, j, _ in got} == {(0, 0), (1, 1)}


def test_greedy_align_preaccepts_and_ties():
    sim = np.array([[1.0, 0.0], [0.0, 0.76]])
    got = greedy_align_matrix(sim)
    assert {(i, j) for i, j, _ in got} == {(0, 0), (1, 1)}
    # epsilon co-keep: two cells within 1e-2 on the same row both accepted
    sim2 = np.array([[0.70, 0.695], [0.0, 0.0]])
    got2 = {(i, j) for i, j, _ in greedy_align_matrix(sim2)}
    assert got2 == {(0, 0), (0, 1)}


def test_greedy_align_flip_orientation():
    sim = np.array([[0.9, 0.2, 0.6]])  # n1=1 < n2=3 -> internal transpose
    got = greedy_align_matrix(sim)
    assert (0, 0) in {(i, j) for i, j, _ in got}
    assert all(i == 0 for i, _, _ in got)


def test_pair_alignment_score_formula():
    # pathway_aligner.py:769-772: mean * n / (0.5*(n1+n2))
    assert pair_alignment_score([1.0, 0.5], 2, 2) == pytest.approx(
        0.75 * 2 / 2.0
    )
    assert pair_alignment_score([], 2, 2) == 0.0


def test_align_pairs_distributed(spark):
    cells = spark.createDataFrame(
        [
            ("a", 0, 0, 0.9),
            ("a", 1, 1, 0.8),
            ("a", 1, 0, 0.2),
            ("b", 0, 0, 0.3),  # all below floor -> no matches for b
        ],
        "pair_id string, i int, j int, score double",
    )
    got = align_pairs(cells).collect()
    by_pair = {}
    for r in got:
        by_pair.setdefault(r["pair_id"], set()).add((r["i"], r["j"]))
    assert by_pair == {"a": {(0, 0), (1, 1)}}
    sizes = spark.createDataFrame([("a", 2, 2)], "pair_id string, n1 int, n2 int")
    agg = aggregate_pair_scores(align_pairs(cells), sizes).collect()
    assert agg[0]["align_score"] == pytest.approx(((0.9 + 0.8) / 2) * 2 / 2.0)


def test_fused_similarity_cells_matches_numpy_reference(spark):
    """fused_similarity_cells reproduces _run_graph_aligner
    (pathway_aligner.py:455-504): cosine of concatenated embeddings,
    negatives clamped, rule score overrides upward, type-restricted zeroed —
    verified cell-by-cell against a numpy replica, then driven through
    align_pairs end-to-end."""
    import numpy as np

    from pathhier_spark.operators.align import (
        align_pairs,
        fused_similarity_cells,
        prelim_alignments,
    )

    rng = np.random.RandomState(7)
    n1, n2, d = 4, 3, 6
    e1 = rng.randn(n1, d)
    t1 = rng.randn(n1, d)
    e2 = rng.randn(n2, d)
    t2 = rng.randn(n2, d)

    def mkrows(e, t):
        return [
            ("p", i, [float(x) for x in e[i]], [float(x) for x in t[i]])
            for i in range(len(e))
        ]

    schema = "pair_id string, idx int, emb array<double>, top_emb array<double>"
    left_emb = spark.createDataFrame(mkrows(e1, t1), schema)
    right_emb = spark.createDataFrame(mkrows(e2, t2), schema)

    # rule side: entity 0<->0 shares an xref (tier 1.0); left entity 3 is a
    # Group vs non-Group rights (type-restricted -> forced 0)
    def ent(i, typ, xr, nm, side):
        return ("p", i, typ, [xr], [nm], [f"{side}par{i}"])

    eschema = ("pair_id string, idx int, obj_type string, eq_xrefs array<string>,"
               " eq_names array<string>, parent_xrefs array<string>")
    left = spark.createDataFrame(
        [ent(0, "Protein", "X:1", "alpha", "l"), ent(1, "Protein", "X:2", "beta", "l"),
         ent(2, "Protein", "X:3", "gamma", "l"), ent(3, "Group", "X:4", "delta", "l")],
        eschema,
    )
    right = spark.createDataFrame(
        [ent(0, "Protein", "X:1", "zeta", "r"), ent(1, "Protein", "X:9", "eta", "r"),
         ent(2, "Protein", "X:8", "delta", "r")],
        eschema,
    )
    rules = prelim_alignments(left, right)
    cells = fused_similarity_cells(left_emb, right_emb, rules)
    got = {(r["i"], r["j"]): r["score"] for r in cells.collect()}

    # numpy replica of the reference kernel
    c1 = np.concatenate([e1, t1], axis=1)
    c2 = np.concatenate([e2, t2], axis=1)
    sim = (c1 @ c2.T) / (
        np.linalg.norm(c1, axis=1)[:, None] * np.linalg.norm(c2, axis=1)[None, :]
    )
    sim[sim < 0.0] = 0.0
    sim[0, 0] = max(sim[0, 0], 1.0)  # xref tier override
    sim[3, :] = 0.0                  # Group vs non-Group restriction
    for i in range(n1):
        for j in range(n2):
            assert got[(i, j)] == pytest.approx(sim[i, j], abs=1e-9), (i, j)

    # e2e: the fused cells drive the greedy matcher; (0,0) is pre-accepted
    matches = {
        (r["i"], r["j"]) for r in align_pairs(cells).collect()
    }
    assert (0, 0) in matches
    assert all(i != 3 for i, _ in matches)  # restricted row never matches


# --- mutual_best_match (q107, round 5) ---

def test_mutual_best_match_basic(spark):
    from pathhier_spark.operators.align import mutual_best_match

    # l1's best is r1 and r1's best is l1 (mutual). l2's best is r1 (taken,
    # not mutual); r2's best is l2 but l2's best is r1 -> no pair for l2/r2.
    df = spark.createDataFrame(
        [
            ("l1", "r1", 9.0),
            ("l1", "r2", 1.0),
            ("l2", "r1", 8.0),
            ("l2", "r2", 2.0),
        ],
        "l string, r string, s double",
    )
    out = [tuple(r) for r in mutual_best_match(df, "l", "r", "s").collect()]
    assert out == [("l1", "r1", 9.0)]


def test_mutual_best_match_tie_breaks_on_smaller_partner(spark):
    from pathhier_spark.operators.align import mutual_best_match

    # l1 ties r1/r2 at 5.0 -> picks r1 (smaller id); r1's best is l1
    df = spark.createDataFrame(
        [("l1", "r1", 5.0), ("l1", "r2", 5.0), ("l2", "r1", 3.0)],
        "l string, r string, s double",
    )
    out = [tuple(r) for r in mutual_best_match(df, "l", "r", "s").collect()]
    assert out == [("l1", "r1", 5.0)]


def test_mutual_best_match_one_to_one(spark):
    from pathhier_spark.operators.align import mutual_best_match

    # output is a partial matching: each left and each right at most once
    import random

    rng = random.Random(7)
    rows = [
        (f"l{i}", f"r{j}", float(rng.randint(1, 50)))
        for i in range(12)
        for j in range(12)
    ]
    df = spark.createDataFrame(rows, "l string, r string, s double")
    out = mutual_best_match(df, "l", "r", "s").collect()
    ls = [r["l"] for r in out]
    rs = [r["r"] for r in out]
    assert len(ls) == len(set(ls)) and len(rs) == len(set(rs))
    assert len(out) >= 1
