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


# --- tokenizer fertility (q146, round 5) ---

def test_fertility_known_merges(spark):
    """Fertility over a corpus where the trained merges perfectly cover
    one language's vocabulary and fragment the other's."""
    from pathhier_spark.queries import q146_fertility  # noqa: F401  (shape)
    from pathhier_spark.operators.bpe import bpe_encode
    from pyspark.sql import functions as F

    # direct contract on the composition shape: encode once per distinct
    # word, weight by occurrence count
    merges = [("a", "b"), ("ab", "c")]
    docs = spark.createDataFrame(
        [("en", "abc abc abc"), ("de", "xy")],
        "lang string, text string",
    )
    lw = (
        docs.select("lang", F.explode(F.split("text", " ")).alias("w"))
        .groupBy("lang", "w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    enc_len = lw.select("w").distinct().select(
        "w", F.size(bpe_encode("w", merges)).cast("long").alias("k")
    )
    per = (
        lw.join(enc_len, "w")
        .groupBy("lang")
        .agg(
            F.sum("n").alias("n_words"),
            F.sum(F.col("n") * F.col("k")).alias("n_bpe"),
        )
    )
    got = {r["lang"]: (r["n_words"], r["n_bpe"]) for r in per.collect()}
    # 'abc' encodes to ['abc'] (1 token x 3 occurrences); 'xy' stays
    # 2 chars -> 2 tokens
    assert got["en"] == (3, 3)
    assert got["de"] == (1, 2)
