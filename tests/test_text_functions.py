"""Spark column expressions vs the pure-Python reference oracle.

Golden vectors per FIXTURES.md §8 plus property tests over generated strings.
"""

import math

import pytest
from pyspark.sql import functions as F

from pathhier_spark.functions import oracle
from pathhier_spark.functions.text import (
    STOPWORDS,
    char_ngrams,
    idf_table,
    jaccard,
    normalize_string,
    set_overlap,
    tokenize,
)

CASES = [
    "Glycolysis / Gluconeogenesis",
    "  MAPK-signaling_pathway  ",
    "the of and",  # all stopwords -> fallback rule
    "a b c",  # one-letter words are kept (stopword list keeps len>1 only)
    "pathway pathways signaling",  # domain stopwords
    "TCA cycle:citrate",
    "",
    "   ",
    "42-deoxy/ribose_5:phosphate",
    "IS Is iS",  # stopwords after lowering
    "don't stop",
]


def _run(spark, expr_builder, values):
    df = spark.createDataFrame([(v,) for v in values], ["s"])
    return [r[0] for r in df.select(expr_builder(F.col("s"))).collect()]


def test_normalize(spark):
    got = _run(spark, normalize_string, CASES)
    want = [oracle.normalize_string(s) for s in CASES]
    assert got == want


def test_tokenize(spark):
    got = _run(spark, tokenize, CASES)
    want = [list(oracle.tokenize_string(s)) for s in CASES]
    assert got == want


@pytest.mark.parametrize("n", [3, 4, 5])
def test_char_ngrams(spark, n):
    got = _run(spark, lambda c: char_ngrams(c, n), CASES)
    want = [oracle.get_character_ngrams(s, n) for s in CASES]
    assert got == want


def test_jaccard_and_overlap(spark):
    pairs = [
        (["a", "b", "c"], ["b", "c", "d"]),
        ([], []),
        (["x"], []),
        (["a", "a", "b"], ["a", "b"]),  # duplicate-insensitive
        (["q"], ["q"]),
    ]
    df = spark.createDataFrame(pairs, ["a", "b"])
    got = df.select(
        jaccard(F.col("a"), F.col("b")).alias("j"),
        set_overlap(F.col("a"), F.col("b")).alias("o"),
    ).collect()
    for (a, b), row in zip(pairs, got):
        assert row["j"] == pytest.approx(oracle.jaccard(set(a), set(b)))
        assert row["o"] == pytest.approx(oracle.set_overlap(set(a), set(b)))


def test_idf_formula(spark):
    # 3 entities; doc_total = 4; token 'x' in 2 ents, 'y' in 1, 'z' in 3
    rows = [
        (1, ["x", "y", "z"]),
        (2, ["x", "z", "z"]),  # duplicate token within entity counts once
        (3, ["z"]),
    ]
    df = spark.createDataFrame(rows, ["ent_id", "tokens"])
    got = {r["token"]: (r["df"], r["idf"]) for r in idf_table(df).collect()}
    assert got["x"][0] == 2 and got["y"][0] == 1 and got["z"][0] == 3
    assert got["x"][1] == pytest.approx(oracle.idf(4, 2))
    assert got["y"][1] == pytest.approx(math.log(4 / 2))
    assert got["z"][1] == pytest.approx(math.log(4 / 4))


def test_stopword_list_shape():
    # one-letter entries are excluded, domain words included
    assert "a" not in STOPWORDS and "i" not in STOPWORDS
    assert "pathway" in STOPWORDS and "pathways" in STOPWORDS
    assert "the" in STOPWORDS and "don" in STOPWORDS


def test_property_fuzz(spark):
    import random

    rng = random.Random(42)
    alphabet = "ab c-_/:XY 09.'&"
    values = [
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 40)))
        for _ in range(200)
    ]
    got_norm = _run(spark, normalize_string, values)
    got_tok = _run(spark, tokenize, values)
    got_3g = _run(spark, lambda c: char_ngrams(c, 3), values)
    for v, gn, gt, g3 in zip(values, got_norm, got_tok, got_3g):
        assert gn == oracle.normalize_string(v)
        assert gt == list(oracle.tokenize_string(v))
        assert g3 == oracle.get_character_ngrams(v, 3)
