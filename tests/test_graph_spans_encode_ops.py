"""k-core peeling, cross-doc duplicated spans, BPE encoding."""

from pyspark.sql import functions as F

from pathhier_spark.operators.bpe import bpe_encode
from pathhier_spark.operators.dedup import duplicated_ngram_spans
from pathhier_spark.operators.graph import kcore


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_kcore_peels_pendant_path(spark):
    # 4-clique {1,2,3,4} with a pendant path 1-5-6: at k=2 the path peels
    # over two rounds (6 first, then 5) and the clique survives intact
    clique = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    df = _edges(spark, clique + [(1, 5), (5, 6)])
    out = {r["node"]: r["deg"] for r in kcore(df, k=2, rounds=3).collect()}
    assert out == {1: 3, 2: 3, 3: 3, 4: 3}


def test_kcore_empty_when_nothing_survives(spark):
    # a path has max core number 1: k=3 removes everything
    df = _edges(spark, [(1, 2), (2, 3), (3, 4)])
    assert kcore(df, k=3, rounds=3).count() == 0


def test_kcore_fixed_rounds_converged(spark):
    # the gate's round count must have converged: one extra round is a
    # no-op on the q74 graph shape (two bridged cliques + pendant)
    clique_a = [(1, 2), (1, 3), (2, 3)]
    clique_b = [(10, 11), (10, 12), (11, 12)]
    df = _edges(spark, clique_a + clique_b + [(3, 10), (12, 20)])
    a = sorted(map(tuple, kcore(df, k=2, rounds=3).collect()))
    b = sorted(map(tuple, kcore(df, k=2, rounds=4).collect()))
    assert a == b and len(a) == 6


def test_dup_spans_shared_and_unique(spark):
    shared = "alpha beta gamma delta epsilon"
    df = spark.createDataFrame(
        [
            (0, f"{shared} zeta"),
            (1, f"eta {shared}"),
            (2, "one two three four five six"),
            (3, "tiny doc"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in duplicated_ngram_spans(df, n=5).collect()}
    # docs 0 and 1 share exactly one 5-gram; it covers 5 positions in each
    for d in (0, 1):
        assert out[d]["n_dup_starts"] == 1
        assert out[d]["n_dup_tokens"] == 5
        assert out[d]["n_toks"] == 6
    # unique doc and short doc: zero counts but present with n_toks
    assert out[2]["n_dup_starts"] == 0 and out[2]["n_dup_tokens"] == 0
    assert out[3]["n_toks"] == 2 and out[3]["n_dup_tokens"] == 0


def test_dup_spans_overlapping_union(spark):
    # identical 6-token docs: both 5-gram starts duplicated, and the
    # covered-position UNION is 6 (not 10 — overlaps collapse)
    df = spark.createDataFrame(
        [(0, "a b c d e f"), (1, "a b c d e f")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in duplicated_ngram_spans(df, n=5).collect()}
    for d in (0, 1):
        assert out[d]["n_dup_starts"] == 2
        assert out[d]["n_dup_tokens"] == 6


def test_bpe_encode_greedy_non_overlapping(spark):
    df = spark.createDataFrame([("aaab",), ("ba",)], "w string")
    out = {
        r["w"]: r["s"]
        for r in df.select(
            "w", bpe_encode("w", [("a", "a"), ("aa", "b")]).alias("s")
        ).collect()
    }
    # 'aaab': (a,a) merges greedily left-to-right -> [aa, a, b]; then
    # (aa,b) does not fire (aa is not adjacent to b); 'ba' untouched
    assert out["aaab"] == ["aa", "a", "b"]
    assert out["ba"] == ["b", "a"]


def test_bpe_encode_merge_order_matters(spark):
    df = spark.createDataFrame([("abab",)], "w string")
    s1 = df.select(
        bpe_encode("w", [("a", "b"), ("ab", "ab")]).alias("s")
    ).collect()[0]["s"]
    assert s1 == ["abab"]
