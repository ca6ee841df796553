"""winnowing_fingerprints / winnowing_matches (operators/textstats.py,
q171) and pr_curve (operators/profile.py, q172) — the hand-checkable
semantics each gate row rests on: the winnowing detection GUARANTEE
(shared runs >= w + k - 1 must pair), selection-density and short-doc
edges, and exact tp/fpos/fneg/prec/rec/f1 arithmetic on a curve small
enough to verify by hand.
"""

import hashlib

import pytest
from pyspark.sql import functions as F

from pathhier_spark.operators.profile import pr_curve
from pathhier_spark.operators.textstats import (
    winnowing_fingerprints,
    winnowing_matches,
)

K, W = 3, 4


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _fps(spark, rows, **kw):
    out = {}
    for r in winnowing_fingerprints(_docs(spark, rows), **kw).collect():
        out.setdefault(r["doc_id"], set()).add(r["fp"])
    return out


def _py_winnow(text, k, w):
    """Independent pure-Python oracle for the selection itself."""
    toks = [t for t in text.lower().split() if t]
    if len(toks) < k:
        return set()
    h = [
        hashlib.md5(" ".join(toks[i : i + k]).encode()).hexdigest()
        for i in range(len(toks) - k + 1)
    ]
    if len(h) < w:
        return {min(h)}
    return {min(h[j : j + w]) for j in range(len(h) - w + 1)}


def test_selection_matches_pure_python_oracle(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "pathway analysis of the quick brown fox genome assembly"),
        (3, "one two three"),          # exactly k tokens -> 1 gram
        (4, "just two"),               # < k tokens -> nothing
        (5, "a b c d e f g h i j k l m n o p q r s t u v w x y z"),
    ]
    got = _fps(spark, rows, k=K, w=W)
    for doc_id, text in rows:
        assert got.get(doc_id, set()) == _py_winnow(text, K, W), doc_id


def test_guarantee_shared_run_always_pairs(spark):
    # Docs 1 and 2 share a run of exactly w + k - 1 = 6 tokens embedded in
    # otherwise-disjoint text: the guarantee says >= 1 shared fingerprint.
    shared = "alpha beta gamma delta epsilon zeta"
    rows = [
        (1, "xx yy zz " + shared + " qq ww ee"),
        (2, "aa bb cc dd " + shared + " rr tt"),
        (3, "totally unrelated text with no overlap at all here"),
    ]
    pairs = {
        (r["a"], r["b"]): r["shared"]
        for r in winnowing_matches(
            _docs(spark, rows), k=K, w=W, min_shared=1
        ).collect()
    }
    assert (1, 2) in pairs
    assert all(3 not in p for p in pairs)


def test_short_doc_single_window_and_min_shared_filter(spark):
    # 4 tokens with k=3 -> 2 grams < w: the whole doc is one window and
    # selects exactly one fingerprint (the global min).
    rows = [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta")]
    fps = _fps(spark, rows, k=K, w=W)
    assert len(fps[1]) == 1 and fps[1] == fps[2]
    m2 = winnowing_matches(_docs(spark, rows), k=K, w=W, min_shared=2)
    assert m2.count() == 0  # identical docs, but only 1 shared fp
    m1 = winnowing_matches(_docs(spark, rows), k=K, w=W, min_shared=1)
    assert [(r["a"], r["b"], r["shared"]) for r in m1.collect()] == [(1, 2, 1)]


def test_winnowing_rejects_bad_params(spark):
    with pytest.raises(ValueError):
        winnowing_fingerprints(_docs(spark, [(1, "a b")]), k=0, w=4)


def _curve(spark, rows):
    df = spark.createDataFrame(rows, "score_fp long, is_pos boolean")
    return {
        r["score_fp"]: (
            r["tp"], r["fpos"], r["fneg"], r["prec"], r["rec"], r["f1"]
        )
        for r in pr_curve(df).collect()
    }


def test_pr_curve_hand_case(spark):
    # scores desc: 90(+), 80(-), 80(+), 70(-)  -> total_pos = 2
    rows = [(90, True), (80, False), (80, True), (70, False)]
    got = _curve(spark, rows)
    assert set(got) == {90, 80, 70}
    assert got[90] == (1, 0, 1, 1.0, 0.5, 2 * 1 / 3)
    assert got[80] == (2, 1, 0, 2 / 3, 1.0, 4 / 5)
    assert got[70] == (2, 2, 0, 0.5, 1.0, 2 / 3)


def test_pr_curve_no_positives_null_rec_f1(spark):
    got = _curve(spark, [(10, False), (20, False)])
    assert got[20][0] == 0 and got[20][1] == 1
    assert got[20][4] is None and got[20][5] is None  # rec, f1 NULL
    assert got[20][3] == 0.0  # precision still defined: 0 / pp


def test_pr_curve_null_label_counts_predicted_not_positive(spark):
    df = spark.createDataFrame(
        [(10, True), (10, None)], "score_fp long, is_pos boolean"
    )
    r = pr_curve(df).collect()[0]
    assert (r["tp"], r["fpos"], r["prec"]) == (1, 1, 0.5)
