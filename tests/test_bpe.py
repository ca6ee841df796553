"""Distributed BPE merge training (operators/bpe.py)."""

from pyspark.sql import functions as F


def test_bpe_train_classic_example(spark):
    """The textbook corpus: 'er' (14 weighted occurrences) must win round
    0, then 'w'+'er' (lower 5 + newer 6 = 11), with deterministic
    tie-breaks after."""
    from pathhier_spark.operators.bpe import bpe_train

    words = spark.createDataFrame(
        [("lower", 5), ("lowest", 2), ("newer", 6), ("wider", 3)],
        "w string, n long",
    )
    got = [(r["a"], r["b"], r["cnt"]) for r in bpe_train(words, n_merges=3).collect()]
    assert got[0] == ("e", "r", 14)
    assert got[1] == ("w", "er", 11)
    assert len(got) == 3


def test_bpe_merge_is_nonoverlapping_left_to_right(spark):
    """'aaaa' under merge (a,a) must become [aa, aa] — greedy
    non-overlapping, never re-merging the freshly created symbol."""
    from pathhier_spark.operators.bpe import bpe_encode

    df = spark.createDataFrame([("aaaa",), ("aaa",)], "w string")
    out = {
        r["w"]: r["toks"]
        for r in df.select(
            "w", bpe_encode("w", [("a", "a")]).alias("toks")
        ).collect()
    }
    assert out["aaaa"] == ["aa", "aa"]
    assert out["aaa"] == ["aa", "a"]


def test_bpe_encode_roundtrip_and_single_char(spark):
    """Encoding never loses characters (concat of symbols == word), and
    single-char words survive training (the sequence(1,0) descending
    trap)."""
    from pathhier_spark.operators.bpe import bpe_encode, bpe_train

    words = spark.createDataFrame(
        [("a", 100), ("ab", 10), ("abab", 5), ("b", 50)], "w string, n long"
    )
    merges = [(r["a"], r["b"]) for r in bpe_train(words, n_merges=2).collect()]
    assert merges  # training proceeded despite single-char words
    enc = words.select(
        "w", bpe_encode("w", merges).alias("toks")
    ).collect()
    for r in enc:
        assert "".join(r["toks"]) == r["w"]


def test_bpe_train_stops_when_no_pairs(spark):
    from pathhier_spark.operators.bpe import bpe_train

    words = spark.createDataFrame([("x", 3), ("y", 2)], "w string, n long")
    assert bpe_train(words, n_merges=4).count() == 0


def test_bpe_train_ignores_empty_word(spark):
    from pathhier_spark.operators.bpe import bpe_train

    words = spark.createDataFrame(
        [("", 5), ("ab", 2)], "w string, n long"
    )
    merges = bpe_train(words, n_merges=2).collect()
    # the empty word must not fabricate ('','') pairs; the only real
    # adjacent pair is (a, b)
    assert [(m["a"], m["b"]) for m in merges] == [("a", "b")]
