"""Round-5 additions: anchor-host link graph (operators/urls.py), Markov
transition matrix (operators/temporal.py), overlapped chunking
(operators/packing.py), single-pass profiler (operators/profile.py), and
bigram surprisal (operators/textstats.py). The q88-q92 gate rows carry the
full-corpus DuckDB parity; these tests pin the hand-checkable edge
semantics the gate's synthetic data can't isolate."""

import math

import pytest
from pyspark.sql import functions as F

from pathhier_spark.operators.packing import chunk_with_overlap
from pathhier_spark.operators.profile import profile_columns
from pathhier_spark.operators.temporal import transition_matrix
from pathhier_spark.operators.textstats import bigram_surprisal
from pathhier_spark.operators.urls import anchor_host_edges


# --------------------------- anchor_host_edges ---------------------------


def _pages(spark, rows):
    return spark.createDataFrame(rows, "url string, html string")


def test_anchor_edges_absolute_relative_empty(spark):
    pages = _pages(spark, [
        (
            "https://a.example.com/p/1",
            '<a href="https://B.example.org/x">1</a>'   # host lowercased
            '<a href="/local">2</a>'                     # relative -> src
            '<a href="">3</a>'                           # empty -> dropped
            '<a href="https://b.example.org:8080/y">4</a>'  # port stripped
            '<a href="//CDN.example.net:443/l.js">5</a>',  # protocol-relative
        ),
    ])
    got = {
        (r["src_host"], r["dst_host"]): (r["internal"], r["n_links"])
        for r in anchor_host_edges(pages).collect()
    }
    assert got == {
        ("a.example.com", "b.example.org"): (False, 2),
        ("a.example.com", "a.example.com"): (True, 1),
        ("a.example.com", "cdn.example.net"): (False, 1),
    }


def test_anchor_edges_no_anchors_and_aggregation(spark):
    pages = _pages(spark, [
        ("https://a.example.com/", "<p>no links here</p>"),
        ("https://a.example.com/2", '<a href="https://c.example.org/">x</a>'),
        ("https://a.example.com/3", '<a href="https://c.example.org/">y</a>'),
    ])
    rows = anchor_host_edges(pages).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["src_host"], r["dst_host"], r["n_links"]) == (
        "a.example.com", "c.example.org", 2)


# --------------------------- transition_matrix ---------------------------


def test_transition_matrix_counts_and_probs(spark):
    # user 1: a -> b -> a -> c; user 2: a -> b; user 3: single event (none)
    ev = spark.createDataFrame(
        [
            (1, 1, 10, "a"), (2, 1, 20, "b"), (3, 1, 30, "a"), (4, 1, 40, "c"),
            (5, 2, 10, "a"), (6, 2, 20, "b"),
            (7, 3, 10, "z"),
        ],
        "event_id long, user_id long, ts long, event_type string",
    )
    got = {
        (r["src_event"], r["dst_event"]): (r["n_trans"], r["prob"])
        for r in transition_matrix(ev).collect()
    }
    assert got == {
        ("a", "b"): (2, 0.666667),
        ("a", "c"): (1, 0.333333),
        ("b", "a"): (1, 1.0),
    }
    # outgoing probabilities sum to 1 per src
    sums = {}
    for (s, _), (_, p) in got.items():
        sums[s] = round(sums.get(s, 0.0) + p, 5)
    assert all(abs(v - 1.0) < 1e-4 for v in sums.values())


def test_transition_matrix_tiebreak_order(spark):
    # equal ts: event_id breaks the tie, so the order is a(1) -> b(2) -> c(3)
    ev = spark.createDataFrame(
        [(1, 1, 10, "a"), (2, 1, 10, "b"), (3, 1, 10, "c")],
        "event_id long, user_id long, ts long, event_type string",
    )
    got = {(r["src_event"], r["dst_event"]) for r in
           transition_matrix(ev).collect()}
    assert got == {("a", "b"), ("b", "c")}


# --------------------------- chunk_with_overlap ---------------------------


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunk_overlap_grid_and_trailing(spark):
    # 10 tokens, size 4, stride 3 -> starts 0,3,6,9; lens 4,4,4,1
    text = " ".join(f"t{i}" for i in range(10))
    rows = chunk_with_overlap(
        _docs(spark, [(1, text)]), size=4, stride=3
    ).orderBy("chunk_id").collect()
    assert [(r["chunk_id"], r["start_tok"], r["chunk_len"]) for r in rows] == [
        (0, 0, 4), (1, 3, 4), (2, 6, 4), (3, 9, 1)]
    # overlap: chunk 1 covers tokens 3..6, chunk 0 covers 0..3
    import hashlib
    want = hashlib.md5(" ".join(
        f"t{i}" for i in range(3, 7)).encode()).hexdigest()
    assert rows[1]["chunk_md5"] == want


def test_chunk_overlap_small_and_empty_docs(spark):
    rows = chunk_with_overlap(
        _docs(spark, [(1, "only two"), (2, "   "), (3, "")]),
        size=4, stride=3,
    ).collect()
    # doc 1: single chunk shorter than size; docs 2/3: no rows
    assert [(r["doc_id"], r["chunk_id"], r["chunk_len"]) for r in rows] == [
        (1, 0, 2)]


def test_chunk_overlap_rejects_bad_params(spark):
    d = _docs(spark, [(1, "x")])
    with pytest.raises(ValueError):
        chunk_with_overlap(d, size=0, stride=3)
    with pytest.raises(ValueError):
        chunk_with_overlap(d, size=4, stride=0)


# --------------------------- profile_columns ---------------------------


def test_profile_columns_stats(spark):
    df = spark.createDataFrame(
        [(1, 2.5, "a"), (2, None, "b"), (3, 7.25, None), (4, 7.25, "a")],
        "k long, v double, s string",
    )
    rows = {r["column"]: r for r in profile_columns(df).collect()}
    assert set(rows) == {"k", "v", "s"}
    k = rows["k"]
    assert (k["n_rows"], k["n_nulls"], k["n_distinct"]) == (4, 0, 4)
    assert (k["min_num"], k["max_num"]) == (1.0, 4.0)
    assert k["min_str"] is None and k["max_str"] is None
    v = rows["v"]
    assert (v["n_nulls"], v["n_distinct"]) == (1, 2)
    assert (v["min_num"], v["max_num"]) == (2.5, 7.25)
    s = rows["s"]
    assert (s["n_nulls"], s["n_distinct"]) == (1, 2)
    assert (s["min_str"], s["max_str"]) == ("a", "b")
    assert s["min_num"] is None and s["max_num"] is None


def test_profile_columns_validation_and_approx(spark):
    df = spark.createDataFrame([(1, [1, 2])], "k long, arr array<long>")
    with pytest.raises(ValueError):
        profile_columns(df, columns=["missing"])
    with pytest.raises(ValueError):
        profile_columns(df, columns=["arr"])
    # default column selection skips non-scalar columns entirely
    assert [r["column"] for r in profile_columns(df).collect()] == ["k"]
    # approx path returns a sane estimate on a tiny exact-cardinality input
    big = spark.range(100).select(F.col("id").alias("k"))
    r = profile_columns(big, exact_distinct=False).collect()[0]
    assert 90 <= r["n_distinct"] <= 110


# --------------------------- bigram_surprisal ---------------------------


def test_bigram_surprisal_hand_computed(spark):
    # corpus: doc1 = "a b a b", doc2 = "a b", doc3 = "a" (no bigram)
    # bigrams: (a,b) x3, (b,a) x1; prefix counts: a->3, b->1
    # p(b|a) = 3/3 = 1 -> ln 0; p(a|b) = 1/1 = 1 -> ln 0
    docs = _docs(spark, [(1, "a b a b"), (2, "a b"), (3, "a")])
    got = {r["doc_id"]: r for r in bigram_surprisal(docs).collect()}
    assert got[1]["n_bigrams"] == 3 and got[1]["avg_surprisal"] == 0.0
    assert got[2]["n_bigrams"] == 1 and got[2]["avg_surprisal"] == 0.0
    assert got[3]["n_bigrams"] == 0 and got[3]["avg_surprisal"] is None


def test_bigram_surprisal_rare_transition_scores_higher(spark):
    # "x y" appears once; "x x" dominates x's continuations, so the doc
    # holding the rare transition x->y scores strictly higher
    docs = _docs(spark, [
        (1, "x x x x x"), (2, "x y"),
    ])
    got = {r["doc_id"]: r["avg_surprisal"]
           for r in bigram_surprisal(docs).collect()}
    assert got[2] > got[1]
    # exact: p(y|x) = 1/5 -> ln 5; p(x|x) = 4/5 -> ln(5/4)
    assert math.isclose(got[2], math.log(5.0), rel_tol=1e-9)
    assert math.isclose(got[1], math.log(5.0 / 4.0), rel_tol=1e-9)


def test_bigram_surprisal_shuffle_join_path_matches_broadcast(spark):
    docs = _docs(spark, [
        (i, f"w{i % 3} common w{(i * 2) % 5} tail") for i in range(20)
    ])
    a = {(r["doc_id"], r["n_bigrams"], round(r["avg_surprisal"], 9))
         for r in bigram_surprisal(docs, broadcast_vocab=True).collect()}
    b = {(r["doc_id"], r["n_bigrams"], round(r["avg_surprisal"], 9))
         for r in bigram_surprisal(docs, broadcast_vocab=False).collect()}
    assert a == b


# --- join-key skew probe (q120, round 5) ---

def test_join_key_skew_hand_computed(spark):
    from pathhier_spark.operators.profile import join_key_skew

    # one hot key holding 90% of rows over 11 keys
    rows = [("hot",)] * 90 + [(f"k{i}",) for i in range(10)]
    df = spark.createDataFrame(rows, "k string")
    r = join_key_skew(df, "k").collect()[0]
    assert (r["n_rows"], r["n_keys"], r["max_freq"], r["p990_freq"]) == (
        100, 11, 90, 90,
    )
    assert r["top1_share"] == 0.9
    assert r["skew_factor"] == 9.9


def test_join_key_skew_uniform_and_nulls(spark):
    from pathhier_spark.operators.profile import join_key_skew

    # perfectly uniform -> skew_factor exactly 1; NULL keys count as ONE
    # key (they land on one shuffle partition in a real join)
    uni = spark.createDataFrame(
        [(f"k{i % 5}",) for i in range(50)], "k string"
    )
    r = join_key_skew(uni, "k").collect()[0]
    assert (r["n_keys"], r["skew_factor"]) == (5, 1.0)
    nulls = spark.createDataFrame(
        [(None,), (None,), (None,), ("a",)], "k string"
    )
    r2 = join_key_skew(nulls, "k").collect()[0]
    assert (r2["n_rows"], r2["n_keys"], r2["max_freq"]) == (4, 2, 3)


# --- per-source label diversity (q139, round 5) ---

def test_source_diversity_hand_computed(spark):
    import math

    from pathhier_spark.operators.profile import source_diversity

    # s1: langs a,a,b,b -> H = ln2, effective 2, tie a vs b -> top 'a'
    # s2: single lang -> H exactly 0.0, effective exactly 1.0
    rows = [("s1", "a"), ("s1", "a"), ("s1", "b"), ("s1", "b"),
            ("s2", "x"), ("s2", "x"), ("s2", "x")]
    df = spark.createDataFrame(rows, "source string, lang string")
    got = {r["source"]: r for r in source_diversity(df).collect()}
    r1 = got["s1"]
    assert (r1["n_docs"], r1["n_labels"], r1["top_label"]) == (4, 2, "a")
    assert r1["top_share"] == 0.5
    assert r1["entropy"] == round(math.log(2), 6)
    assert r1["effective_labels"] == 2.0
    r2 = got["s2"]
    assert (r2["n_labels"], r2["entropy"], r2["effective_labels"]) == (1, 0.0, 1.0)
    assert r2["top_share"] == 1.0


# ------------------------- anchor_text_dictionary -------------------------


def test_anchor_text_dictionary_normalize_and_filters(spark):
    from pathhier_spark.operators.urls import anchor_text_dictionary

    pages = _pages(spark, [
        (
            "https://src.example.com/p",
            '<a href="https://T.example.org/a">  Widget\t ONE </a>'   # case+ws
            '<a href="https://t.example.org/b">widget one</a>'        # same phrase
            '<a href="/nav">Self Nav</a>'                              # internal
            '<a href="https://t.example.org/c"></a>'                   # empty text
            '<a href="//t.example.org:443/d">proto rel</a>',           # proto-rel
        ),
    ])
    got = {
        (r["dst_host"], r["phrase"]): (r["n_refs"], r["rnk"])
        for r in anchor_text_dictionary(pages).collect()
    }
    # normalization folds both widget anchors into one phrase with count 2
    assert got == {
        ("t.example.org", "widget one"): (2, 1),
        ("t.example.org", "proto rel"): (1, 2),
    }


def test_anchor_text_dictionary_topk_tiebreak_and_min_refs(spark):
    from pathhier_spark.operators.urls import anchor_text_dictionary

    html = (
        '<a href="https://d.example.org/1">bb</a>'
        '<a href="https://d.example.org/2">aa</a>'
        '<a href="https://d.example.org/3">cc</a>'
        '<a href="https://d.example.org/4">cc</a>'
    )
    pages = _pages(spark, [("https://s.example.com/p", html)])
    rows = anchor_text_dictionary(pages, top=2).orderBy("rnk").collect()
    # cc (2 refs) first; aa beats bb lexicographically at equal counts
    assert [(r["phrase"], r["n_refs"], r["rnk"]) for r in rows] == [
        ("cc", 2, 1), ("aa", 1, 2),
    ]
    pruned = anchor_text_dictionary(pages, min_refs=2).collect()
    assert [(r["phrase"], r["n_refs"]) for r in pruned] == [("cc", 2)]


# ----------------------- trigram_backoff_surprisal -----------------------


def test_trigram_backoff_tiers_hand_computed(spark):
    import math

    from pathhier_spark.operators.textstats import trigram_backoff_surprisal

    # train half (even ids): "a b c a b c" + "a b c d"
    # -> c3: abc=3, bca=1, cab=1, bcd=1; prefixes (a,b)=3, (b,c)=2, (c,a)=1
    # -> bi: ab=3, bc=3, ca=1, cd=1; uni: a=3,b=3,c=3,d=1 (N=10, U=4)
    docs = spark.createDataFrame(
        [(0, "a b c a b c"), (2, "a b c d"),
         (1, "a b c"), (3, "a b x"), (5, "zz")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in trigram_backoff_surprisal(docs).collect()}
    # doc 0: 4 trigram hits; only bca is non-zero: ln(2/1)
    assert (got[0]["n_tri"], got[0]["n_bi"], got[0]["n_uni"]) == (4, 0, 0)
    assert got[0]["avg_surprisal"] == round(math.log(2) / 4, 6)
    # doc 1 held out but its trigram is in-LM: ln(3/3) = 0
    assert got[1]["avg_surprisal"] == 0.0
    # doc 3: trigram (a,b,x) unseen, bigram (b,x) unseen, x OOV ->
    # 2*(-ln .4) + ln(N+U+1) - ln(0+1)
    assert (got[3]["n_tri"], got[3]["n_bi"], got[3]["n_uni"]) == (0, 0, 1)
    assert got[3]["avg_surprisal"] == round(
        -2 * math.log(0.4) + math.log(15), 6
    )
    # doc 5: < 3 tokens -> nothing scored
    assert got[5]["n_scored"] == 0 and got[5]["avg_surprisal"] is None


def test_trigram_backoff_bigram_tier(spark):
    import math

    from pathhier_spark.operators.textstats import trigram_backoff_surprisal

    # train: "p q r" and "x q r" -> trigrams pqr, xqr; bigrams pq,qr,xq,qr
    # probe doc 1 "z q r": trigram (z,q,r) unseen; bigram (q,r) seen c2=2,
    # prefix c2p(q)=2 -> -ln(.4) + ln(2/2)
    docs = spark.createDataFrame(
        [(0, "p q r"), (2, "x q r"), (1, "z q r")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in trigram_backoff_surprisal(docs).collect()}
    assert (got[1]["n_tri"], got[1]["n_bi"], got[1]["n_uni"]) == (0, 1, 0)
    assert got[1]["avg_surprisal"] == round(-math.log(0.4), 6)


def test_trigram_backoff_train_filter_param(spark):
    from pyspark.sql import functions as F

    from pathhier_spark.operators.textstats import trigram_backoff_surprisal

    # train on ALL docs -> self-scoring never backs off
    docs = spark.createDataFrame(
        [(0, "a b c"), (1, "c b a")], "doc_id long, text string"
    )
    got = trigram_backoff_surprisal(
        docs, train_filter=F.lit(True)
    ).collect()
    assert all(r["n_bi"] == 0 and r["n_uni"] == 0 for r in got)


# ------------------------------- text_tiling -------------------------------


def test_text_tiling_finds_vocabulary_shift(spark):
    from pathhier_spark.operators.textstats import text_tiling

    # block 1: animal words; block 2: same topic; block 3: total shift
    text = ("cat dog bird fish cat dog bird fish cat dog "
            "dog cat fish bird dog cat fish bird dog cat "
            "tax bond loan rate tax bond loan rate tax bond")
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = {r["gap_idx"]: r for r in text_tiling(docs).collect()}
    assert got[0]["jacc_fp"] == 1_000_000 and not got[0]["is_boundary"]
    assert got[1]["jacc_fp"] == 0 and got[1]["is_boundary"]


def test_text_tiling_short_doc_emits_nothing(spark):
    from pathhier_spark.operators.textstats import text_tiling

    docs = spark.createDataFrame(
        [(1, "only ten tokens here nothing more to see at all")],
        "doc_id long, text string",
    )
    assert text_tiling(docs).count() == 0


def test_text_tiling_ragged_final_block_participates(spark):
    from pathhier_spark.operators.textstats import text_tiling

    # 12 tokens -> blocks of 10 and 2; one gap; last block {k, l}
    text = "a b c d e f g h i j k l"
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = text_tiling(docs).collect()
    assert len(rows) == 1 and rows[0]["jacc_fp"] == 0


def test_kneser_ney_hand_computed(spark):
    """Train on even ids: doc0 'a b a b c', doc2 'b c'. bi: (a,b)=2,
    (b,a)=1, (b,c)=2; pre: a=(2,1), b=(3,2); bwd: a=1,b=1,c=1; B=3, U=3,
    M=7. Doc1 'a b x': (a,b) seen -> p=((8-3)*7+3*1*2)/(4*2*7)=41/56;
    (b,x) disc -> p=(0+3*2*1)/(4*3*7)=6/84."""
    import math
    from pathhier_spark.operators.textstats import kneser_ney_surprisal

    docs = spark.createDataFrame(
        [(0, "a b a b c"), (1, "a b x"), (2, "b c")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in kneser_ney_surprisal(docs).collect()}
    r1 = rows[1]
    assert (r1["n_scored"], r1["n_seen"], r1["n_disc"], r1["n_oovctx"]) == (
        2, 1, 1, 0,
    )
    want = round((math.log(56.0 / 41.0) + math.log(84.0 / 6.0)) / 2, 6)
    assert abs(r1["avg_surprisal"] - want) < 1e-9
    # doc0 scores against itself: every bigram seen, no backoff
    assert rows[0]["n_seen"] == 4 and rows[0]["n_disc"] == 0


def test_kneser_ney_continuation_beats_frequency(spark):
    """The Kneser-Ney point: 'francisco' is as FREQUENT as 'the' in train
    but only ever follows 'san', so under an unseen context its
    continuation probability (n1b=1) must be lower -> surprisal higher
    than 'the' (n1b=3). Stupid backoff (raw unigram fallback) scores
    them identically."""
    from pathhier_spark.operators.textstats import kneser_ney_surprisal

    docs = spark.createDataFrame(
        [
            (0, "a the b the c the san francisco san francisco san francisco"),
            (1, "q the"),
            (3, "q francisco"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in kneser_ney_surprisal(docs).collect()}
    assert rows[1]["n_oovctx"] == 1 and rows[3]["n_oovctx"] == 1
    assert rows[3]["avg_surprisal"] > rows[1]["avg_surprisal"]


def test_kneser_ney_short_and_empty_docs(spark):
    from pathhier_spark.operators.textstats import kneser_ney_surprisal

    docs = spark.createDataFrame(
        [(0, "a b c"), (1, "solo"), (3, "")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in kneser_ney_surprisal(docs).collect()}
    for d in (1, 3):
        assert rows[d]["n_scored"] == 0
        assert rows[d]["avg_surprisal"] is None


def test_kneser_ney_shuffle_join_path_matches_broadcast(spark):
    from pathhier_spark.operators.textstats import kneser_ney_surprisal

    docs = spark.createDataFrame(
        [(i, f"tok{i % 7} tok{(i * 3) % 7} tok{(i * 5) % 11} common")
         for i in range(40)],
        "doc_id long, text string",
    )
    a = sorted(map(tuple, kneser_ney_surprisal(docs).collect()))
    b = sorted(map(tuple, kneser_ney_surprisal(
        docs, broadcast_vocab=False).collect()))
    assert a == b


def test_kendall_tau_hand_computed(spark):
    from pathhier_spark.operators.profile import kendall_tau

    df = spark.createDataFrame(
        [(1, 1), (2, 3), (3, 2)], "x long, y long"
    )
    r = kendall_tau(df, x_col="x", y_col="y").collect()[0]
    assert (r["n"], r["concordant"], r["discordant"]) == (3, 2, 1)
    assert (r["ties_x"], r["ties_y"]) == (0, 0)
    assert abs(r["tau_b"] - 1 / 3) < 1e-12


def test_kendall_tau_tie_correction(spark):
    from pathhier_spark.operators.profile import kendall_tau

    df = spark.createDataFrame(
        [(1, 1), (1, 2), (2, 2)], "x long, y long"
    )
    r = kendall_tau(df, x_col="x", y_col="y").collect()[0]
    # one concordant pair; one x-tie pair, one y-tie pair; n0=3
    assert (r["concordant"], r["discordant"]) == (1, 0)
    assert (r["ties_x"], r["ties_y"]) == (1, 1)
    assert abs(r["tau_b"] - 0.5) < 1e-12


def test_kendall_tau_constant_signal_is_null(spark):
    from pathhier_spark.operators.profile import kendall_tau

    df = spark.createDataFrame(
        [(5, 1), (5, 2), (5, 3)], "x long, y long"
    )
    r = kendall_tau(df, x_col="x", y_col="y").collect()[0]
    assert r["tau_b"] is None


def test_constraint_profile_verdicts(spark):
    from pathhier_spark.operators.profile import constraint_profile

    dim = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 10), (3, "c", 20)],
        "k long, name string, grp long",
    )
    fact = spark.createDataFrame(
        [(1, 100), (1, 101), (2, 102), (9, 103)], "fk long, payload long"
    )
    out = {
        r["cname"]: (r["n_lhs"], r["n_check"], r["holds"])
        for r in constraint_profile(
            {"dim": dim, "fact": fact},
            fds=[("dim", "k", "name"), ("dim", "grp", "name")],
            inds=[("fact", "fk", "dim", "k"), ("dim", "grp", "fact", "payload")],
        ).collect()
    }
    assert out["dim.k -> dim.name"] == (3, 3, True)
    # grp 10 maps to two names -> 2 lhs values but 3 pairs
    assert out["dim.grp -> dim.name"] == (2, 3, False)
    # fk 9 has no dim row -> 1 missing value reported
    assert out["fact.fk subset-of dim.k"] == (3, 1, False)
    assert out["dim.grp subset-of fact.payload"] == (2, 2, False)


def test_burrows_delta_styled_source_stands_out(spark):
    from pathhier_spark.operators.profile import burrows_delta

    # sources a and b share marker rates; source c inverts them —
    # Delta(a,b) must be far below Delta(a,c) and Delta(b,c)
    rows = []
    for i in range(10):
        rows.append((3 * i, "a", "the the the of and extra words here"))
        rows.append((3 * i + 1, "b", "the the the of and other filler text"))
        rows.append((3 * i + 2, "c", "of of of and the unusual style marker"))
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {
        (r["src_a"], r["src_b"]): r["delta"]
        for r in burrows_delta(df, top_k=5).collect()
    }
    assert got[("a", "b")] < got[("a", "c")]
    assert got[("a", "b")] < got[("b", "c")]


def test_burrows_delta_identical_sources_zero(spark):
    from pathhier_spark.operators.profile import burrows_delta

    rows = [
        (1, "x", "alpha beta gamma"), (2, "y", "alpha beta gamma"),
        (3, "z", "totally different words now"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {
        (r["src_a"], r["src_b"]): r["delta"]
        for r in burrows_delta(df, top_k=4).collect()
    }
    assert abs(got[("x", "y")]) < 1e-12
    assert got[("x", "z")] > 0.1


def test_k_anonymity_audit_flags(spark):
    from pathhier_spark.operators.profile import k_anonymity_audit

    rows = (
        # class (a, 1): size 5, 3 users -> no violations at k=5, l=2
        [("a", 1, u) for u in (1, 2, 3, 1, 2)]
        # class (a, 2): size 2 -> k violation; 2 users -> l ok
        + [("a", 2, 7), ("a", 2, 8)]
        # class (b, 1): size 6 but ONE user -> homogeneity (l) violation
        + [("b", 1, 9)] * 6
    )
    df = spark.createDataFrame(rows, "t string, g long, user long")
    got = {
        (r["t"], r["g"]): (
            r["class_size"], r["n_sensitive"],
            r["k_violation"], r["l_violation"],
        )
        for r in k_anonymity_audit(
            df, qi_cols=["t", "g"], sensitive_col="user", k=5, l_div=2
        ).collect()
    }
    assert got[("a", 1)] == (5, 3, False, False)
    assert got[("a", 2)] == (2, 2, True, False)
    assert got[("b", 1)] == (6, 1, False, True)


def test_benford_exact_counts_and_chi2(spark):
    import math

    from pathhier_spark.operators.profile import benford_digit_test

    # values 1.00, 1.50, 19.99 -> cents 100, 150, 1999 -> digits 1,1,1
    # plus 0.005 (0 cents, dropped) and None (dropped)
    df = spark.createDataFrame(
        [(1.00,), (1.50,), (19.99,), (0.005,), (None,)], "value double"
    )
    got = {r["digit"]: r for r in benford_digit_test(df).collect()}
    assert got[1]["observed"] == 3
    assert all(got[d]["observed"] == 0 for d in range(2, 10))
    e1 = 3 * math.log10(2)
    assert abs(got[1]["expected"] - e1) < 1e-12
    assert abs(got[1]["chi2_term"] - (3 - e1) ** 2 / e1) < 1e-12
    # total = sum of the nine terms, identical on every row
    tot = sum(
        (got[d]["observed"] - got[d]["expected"]) ** 2 / got[d]["expected"]
        for d in range(1, 10)
    )
    assert abs(got[5]["chi2_total"] - tot) < 1e-9


def test_v_optimal_histogram_finds_plateaus(spark):
    from pathhier_spark.operators.profile import v_optimal_histogram

    # three exact frequency plateaus -> k=3 recovers them with SSE 0
    rows = []
    for v, f in [(1, 10), (2, 10), (3, 50), (4, 50), (5, 90), (6, 90)]:
        rows += [(v,)] * f
    df = spark.createDataFrame(rows, "x long")
    out = v_optimal_histogram(df, value_col="x", n_buckets=3).collect()
    got = [(r["bucket"], r["lo"], r["hi"], r["total_freq"], r["sse"])
           for r in out]
    assert got == [
        (1, 1, 2, 20, 0.0), (2, 3, 4, 100, 0.0), (3, 5, 6, 180, 0.0),
    ]


def test_v_optimal_histogram_beats_equiwidth(spark):
    from pathhier_spark.operators.profile import v_optimal_histogram

    # skewed: one hot value among flats -> v-optimal isolates it
    rows = []
    for v, f in [(1, 5), (2, 5), (3, 500), (4, 5), (5, 5), (6, 5)]:
        rows += [(v,)] * f
    df = spark.createDataFrame(rows, "x long")
    out = v_optimal_histogram(df, value_col="x", n_buckets=3).collect()
    # the hot value 3 sits alone in its bucket
    solo = [r for r in out if r["lo"] == 3 and r["hi"] == 3]
    assert len(solo) == 1 and solo[0]["total_freq"] == 500
    assert sum(r["sse"] for r in out) == 0.0


def test_fd_mode_repair_counts(spark):
    from pathhier_spark.operators.profile import fd_mode_repair

    rows = (
        [("s1", "en")] * 7 + [("s1", "fr")] * 2 + [("s1", "de")]
        + [("s2", "en")] * 3
        # s3: tie 2-2 -> lexicographic 'de' wins deterministically
        + [("s3", "fr")] * 2 + [("s3", "de")] * 2
    )
    df = spark.createDataFrame(rows, "source string, lang string")
    got = {
        r["source"]: (r["majority_rhs"], r["n_rows"], r["n_values"],
                      r["n_repaired"])
        for r in fd_mode_repair(df, lhs_col="source", rhs_col="lang").collect()
    }
    assert got["s1"] == ("en", 10, 3, 3)
    assert got["s2"] == ("en", 3, 1, 0)
    assert got["s3"] == ("de", 4, 2, 2)
