"""char_entropy_profile (operators/textstats.py) — hand-checkable edge
semantics for the q155 gate row: exact entropy on tiny alphabets, the
degenerate single-char and empty-text rows, the entropy bound, and the
map-only (no-Exchange) plan contract the operator's 100 TB claim rests on.
"""

import math

from pyspark.sql import functions as F

from pathhier_spark.operators.textstats import char_entropy_profile


def _profile(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        r["doc_id"]: (r["n_chars"], r["n_distinct"], r["char_entropy"])
        for r in char_entropy_profile(df).collect()
    }


def test_hand_computed_entropies(spark):
    got = _profile(
        spark,
        [
            (1, "aaaa"),            # one symbol -> entropy 0
            (2, "abab"),            # two equiprobable symbols -> ln 2
            (3, "aabb" * 3),        # still two equiprobable -> ln 2
            (4, "abcd"),            # four equiprobable -> ln 4
            (5, ""),                # empty -> NULL, counts 0
            (6, "aab"),             # 2/3,1/3 -> ln3 - (2/3)ln2
        ],
    )
    assert got[1] == (4, 1, 0.0)
    assert got[2] == (4, 2, round(math.log(2), 6))
    assert got[3] == (12, 2, round(math.log(2), 6))
    assert got[4] == (4, 4, round(math.log(4), 6))
    assert got[5] == (0, 0, None)
    assert got[6] == (
        3,
        2,
        round(math.log(3) - (2.0 / 3.0) * math.log(2), 6),
    )


def test_entropy_bounded_by_ln_alphabet(spark):
    # 0 <= H <= ln(n_distinct) for every non-empty doc; repeated-char spam
    # scores at the floor, uniform noise at the ceiling -> both filterable
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "zzzzzzzzzzzzzzzzzzzzzz"),
        (3, "abcdefghijklmnopqrstuvwxyz"),
    ]
    out = _profile(spark, rows)
    for _n, nd, h in out.values():
        assert 0.0 <= h <= round(math.log(nd), 6) + 1e-9
    assert out[2][2] == 0.0
    assert out[3][2] == round(math.log(26), 6)


def test_map_only_plan_no_exchange(spark):
    df = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    plan = char_entropy_profile(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_readability_hand_counts_and_formula(spark):
    """with_readability (q187): exact sentence/word/vowel-group counts
    and the integer Flesch formula, incl. the min-1 floors, the
    zero-word NULL, and a negative score on dense text."""
    from pathhier_spark.operators.textstats import with_readability

    rows = [
        (1, "The cat sat. The dog ran!"),   # 2 sentences, 6 words
        (2, "no punctuation here"),          # fragment -> 1 sentence
        (3, ""),                             # empty -> NULL score
        (4, "xyz qrst"),                     # vowel-less words -> 1 syl each
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (
            r["n_sentences"], r["n_words"], r["n_syllables"], r["flesch_fp"]
        )
        for r in with_readability(df).collect()
    }
    # doc 1: 6 monosyllables, 2 sentences: wps=3000, spw=1000
    exp1 = 206_835_000 - 1015 * 3000 - 84_600 * 1000
    assert got[1] == (2, 6, 6, exp1)
    # doc 2: "no"(1) "punctuation"(u-ua-io -> groups u,u,a,io = 4+? count:
    # p-u-nct-ua-t-io-n -> vowel runs: u, ua, io = 3) "here"(e,e = 2)
    assert got[2][0] == 1 and got[2][1] == 3
    assert got[2][2] == 1 + 3 + 2
    # empty: 1 sentence floor, 0 words, NULL score
    assert got[3] == (1, 0, 0, None)
    # vowel-less words floor at 1 syllable each
    assert got[4][2] == 2
