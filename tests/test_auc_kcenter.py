"""auc_exact (operators/profile.py, q174) and kcenter_select
(operators/sampling.py, q175) — hand-checkable semantics: exact
Mann-Whitney AUC values (perfect/reversed/tied/half-credit, NULL
labels, empty-class NULL), and the greedy farthest-point selection
against a pure-Python mirror including the duplicate early-stop and
k > n edges.
"""

import hashlib
import math

from pathhier_spark.operators.profile import auc_exact
from pathhier_spark.operators.sampling import kcenter_select


def _auc(spark, rows):
    df = spark.createDataFrame(rows, "score_fp long, is_pos boolean")
    r = auc_exact(df).collect()[0]
    return r["n_pos"], r["n_neg"], r["wins2"], r["auc"]


def test_auc_perfect_and_reversed(spark):
    assert _auc(spark, [(3, True), (2, True), (1, False)])[3] == 1.0
    assert _auc(spark, [(1, True), (2, False), (3, False)])[3] == 0.0


def test_auc_half_credit_ties(spark):
    # one pos and one neg at the same score: exactly half credit
    assert _auc(spark, [(2, True), (2, False)]) == (1, 1, 1, 0.5)


def test_auc_hand_mixed(spark):
    # pos {3, 1}, neg {2}: one win, one loss -> 0.5 with wins2 = 2
    assert _auc(spark, [(3, True), (1, True), (2, False)]) == (2, 1, 2, 0.5)


def test_auc_null_label_ignored_and_empty_class_null(spark):
    df = spark.createDataFrame(
        [(3, True), (2, None), (1, False)], "score_fp long, is_pos boolean"
    )
    r = auc_exact(df).collect()[0]
    assert (r["n_pos"], r["n_neg"], r["auc"]) == (1, 1, 1.0)
    assert _auc(spark, [(1, True), (2, True)])[3] is None  # no negatives


def _py_kcenter(pts, k):
    """Pure-Python mirror of the operator's exact arithmetic."""
    q = {i: [math.floor(x * 1_000_000) for x in v] for i, v in pts.items()}
    seed = min(q, key=lambda i: (hashlib.md5(f"kc:{i}".encode()).hexdigest(), i))
    chosen = [(0, seed, 0)]
    mind = {
        i: sum((a - b) ** 2 for a, b in zip(v, q[seed])) for i, v in q.items()
    }
    for r in range(1, k):
        m = max(mind.values())
        if m == 0:
            break
        pick = min(i for i, d in mind.items() if d == m)
        chosen.append((r, pick, m))
        for i, v in q.items():
            mind[i] = min(mind[i], sum((a - b) ** 2 for a, b in zip(v, q[pick])))
    return chosen


def _spark_kcenter(spark, pts, k):
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in pts.items()],
        "vec_id long, embedding array<float>",
    )
    return [
        (r["sel"], r["vec_id"], r["dist_fp"])
        for r in kcenter_select(df, k=k).orderBy("sel").collect()
    ]


def test_kcenter_matches_pure_python_mirror(spark):
    pts = {1: [0.0, 0.0], 2: [1.0, 0.0], 3: [0.0, 1.0],
           4: [10.0, 10.0], 5: [10.0, 9.0]}
    assert _spark_kcenter(spark, pts, 4) == _py_kcenter(pts, 4)


def test_kcenter_duplicate_early_stop(spark):
    # two coincident points and one distinct: the third pick would have
    # distance 0, so selection stops at 2 rows even with k=5
    pts = {1: [0.0], 2: [0.0], 3: [5.0]}
    got = _spark_kcenter(spark, pts, 5)
    assert got == _py_kcenter(pts, 5)
    assert len(got) == 2


def test_kcenter_k_exceeds_n(spark):
    pts = {7: [0.0], 9: [3.0]}
    got = _spark_kcenter(spark, pts, 6)
    assert len(got) == 2 and got == _py_kcenter(pts, 6)


def test_signal_correlations_hand_values(spark):
    """signal_correlations (q180): exact ±1 on linear signals, 0 on an
    orthogonal pattern, NULL on a constant signal, and auditable
    integer moments."""
    from pathhier_spark.operators.profile import signal_correlations

    rows = [
        # a rises 1..4; b = 2a (corr +1); c = -a + 10 (corr -1);
        # d constant (corr NULL against everything)
        (1, 2, 9, 5),
        (2, 4, 8, 5),
        (3, 6, 7, 5),
        (4, 8, 6, 5),
    ]
    df = spark.createDataFrame(rows, "a long, b long, c long, d long")
    got = {
        (r["sig_a"], r["sig_b"]): r
        for r in signal_correlations(df, cols=["a", "b", "c", "d"]).collect()
    }
    assert got[("a", "b")]["corr"] == 1.0
    assert got[("a", "c")]["corr"] == -1.0
    assert got[("b", "c")]["corr"] == -1.0
    for pair in [("a", "d"), ("b", "d"), ("c", "d")]:
        assert got[pair]["corr"] is None
        assert got[pair]["den_b"] == 0  # d is constant
    # auditable exact moments: n*Sab - Sa*Sb for a=1..4, b=2a:
    # Sab = 2*(1+4+9+16) = 60, Sa = 10, Sb = 20 -> 4*60 - 200 = 40
    assert got[("a", "b")]["corr_num"] == 40
    assert got[("a", "b")]["n"] == 4


def test_signal_correlations_rejects_single_column(spark):
    import pytest as _pytest

    from pathhier_spark.operators.profile import signal_correlations

    df = spark.createDataFrame([(1,)], "a long")
    with _pytest.raises(ValueError):
        signal_correlations(df, cols=["a"])


def test_mutual_information_hand_values(spark):
    """mutual_information (q181): 0 nats on an independent joint,
    ln 2 on a deterministic 2x2 bijection, NULL categories dropped."""
    import math

    from pathhier_spark.operators.profile import mutual_information

    # independent: every (x, y) cell equally likely
    indep = spark.createDataFrame(
        [(x, y) for x in "ab" for y in "cd" for _ in range(3)],
        "x string, y string",
    )
    r = mutual_information(indep, x_col="x", y_col="y").collect()[0]
    assert (r["n"], r["n_cells"], r["mi"]) == (12, 4, 0.0)

    # deterministic bijection: knowing x pins y -> I = H = ln 2
    dep = spark.createDataFrame(
        [("a", "c"), ("a", "c"), ("b", "d"), ("b", "d")],
        "x string, y string",
    )
    r = mutual_information(dep, x_col="x", y_col="y").collect()[0]
    assert (r["n"], r["n_cells"]) == (4, 2)
    assert r["mi"] == round(math.log(2), 6)

    # NULL categories dropped from the joint
    withnull = spark.createDataFrame(
        [("a", "c"), ("a", None), (None, "d"), ("b", "d")],
        "x string, y string",
    )
    r = mutual_information(withnull, x_col="x", y_col="y").collect()[0]
    assert r["n"] == 2 and r["n_cells"] == 2
    assert r["mi"] == round(math.log(2), 6)


def test_calibration_bins_hand_case(spark):
    """calibration_bins (q182): decile binning, exact per-bin counts and
    one-division fractions, NULL labels occupy n but not n_pos,
    top-of-range folds into the last bin, empty bins absent."""
    import pytest as _pytest

    from pathhier_spark.operators.profile import calibration_bins

    rows = [
        (50_000, True),    # bin 0
        (50_000, False),   # bin 0
        (150_000, None),   # bin 1: NULL label
        (950_000, True),   # bin 9
        (1_000_000, True), # exactly scale -> folds into bin 9
    ]
    df = spark.createDataFrame(rows, "score_fp long, is_pos boolean")
    got = {
        r["bin"]: (r["n"], r["n_pos"], r["frac_pos"], r["mean_score_fp"])
        for r in calibration_bins(df).collect()
    }
    assert set(got) == {0, 1, 9}  # empty bins absent
    assert got[0] == (2, 1, 0.5, 50_000.0)
    assert got[1] == (1, 0, 0.0, 150_000.0)
    assert got[9] == (2, 2, 1.0, 975_000.0)
    with _pytest.raises(ValueError):
        calibration_bins(df, n_bins=0)


def test_spearman_hand_values(spark):
    """spearman_rho (q189): ±1 on monotone data regardless of linearity,
    exact tie midranks, NULL on constants, NULL rows dropped."""
    from pathhier_spark.operators.profile import spearman_rho

    def rho(rows):
        df = spark.createDataFrame(rows, "x long, y long")
        r = spearman_rho(df, x_col="x", y_col="y").collect()[0]
        return r

    # monotone but wildly nonlinear -> rho is +/-1 up to the fixed-shape
    # divide-sqrt-divide (irrational denominators make the float land a
    # few ulps off the algebraic +/-1; BOTH engines compute the identical
    # value — compare against the same expression, not the ideal)
    r = rho([(1, 1), (2, 10), (3, 1000), (4, 1000000)])
    assert r["n"] == 4
    assert r["rho"] == r["sum_dxdy"] / (r["sum_dx2"] ** 0.5) / (
        r["sum_dy2"] ** 0.5
    )
    assert abs(r["rho"] - 1.0) < 1e-12
    rr = rho([(1, 9), (2, 5), (3, 1)])
    assert abs(rr["rho"] + 1.0) < 1e-12
    # exact midrank ties: x = (1,2,2,3) vs y = (1,2,3,4):
    # doubled ranks x: 2,5,5,8 ; y: 2,4,6,8 ; mean 5
    # dx = -3,0,0,3  dy = -3,-1,1,3 -> sum dxdy = 18, dx2 = 18, dy2 = 20
    r = rho([(1, 1), (2, 2), (2, 3), (3, 4)])
    assert (r["sum_dxdy"], r["sum_dx2"], r["sum_dy2"]) == (18, 18, 20)
    assert r["rho"] == 18 / (18**0.5) / (20**0.5)
    # constant x -> NULL
    assert rho([(5, 1), (5, 2)])["rho"] is None
    # NULL rows dropped
    df = spark.createDataFrame(
        [(1, 1), (2, 2), (None, 9)], "x long, y long"
    )
    assert spearman_rho(df, x_col="x", y_col="y").collect()[0]["n"] == 2


def test_jackknife_hand_properties(spark):
    """jackknife_mean_se (q190): mean is exact T/n; identical values in
    every shard give SE exactly 0; a planted outlier inflates SE; NULLs
    drop; n_shards validation."""
    import pytest as _pytest

    from pathhier_spark.operators.profile import jackknife_mean_se

    def run(rows, **kw):
        df = spark.createDataFrame(rows, "doc_id long, v long")
        return jackknife_mean_se(df, value_col="v", **kw).collect()[0]

    # constant values: every leave-one-out mean equals the mean -> SE 0
    const = run([(i, 7) for i in range(40)])
    assert const["mean"] == 7.0 and const["jk_se"] == 0.0
    assert const["n"] == 40

    # an outlier makes the shard holding it diverge -> SE > 0
    out = run([(i, 7) for i in range(40)] + [(99, 70000)])
    assert out["jk_se"] > 0.0
    assert out["n"] == 41

    # NULL values excluded from n and the mean
    df = spark.createDataFrame(
        [(1, 10), (2, None), (3, 20)], "doc_id long, v long"
    )
    r = jackknife_mean_se(df, value_col="v").collect()[0]
    assert r["n"] == 2 and r["mean"] == 15.0

    with _pytest.raises(ValueError):
        run([(1, 1)], n_shards=1)
