"""BM25 retrieval, exact set-similarity join (prefix filter), PMI pairs."""

import math

import pytest
from pyspark.sql import functions as F

from pathhier_spark.operators.retrieval import (
    bm25_topk,
    build_postings,
    setsim_join_exact,
)
from pathhier_spark.operators.textstats import _tokens, pmi_pairs


def _docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bm25_ranks_matching_doc_first(spark):
    docs = _docs_df(
        spark,
        [
            (0, "spark shuffle join"),
            (1, "spark shuffle join spark shuffle"),
            (2, "cat dog fish bird mouse"),
            (3, "spark only here with lots of other words padding length"),
        ],
    )
    toks = docs.select("doc_id", _tokens("text").alias("ts"))
    qterms = spark.createDataFrame(
        [(1, "spark"), (1, "shuffle"), (1, "join")], "qid long, term string"
    )
    out = bm25_topk(toks, qterms, F.col("ts"), k=4).collect()
    by_rank = {r["rank"]: r for r in out}
    # doc 2 shares no term: absent entirely
    assert all(r["doc_id"] != 2 for r in out)
    # docs containing all three terms outrank the one-term doc 3
    assert by_rank[1]["doc_id"] in (0, 1)
    assert by_rank[len(by_rank)]["doc_id"] == 3
    # scores strictly ordered and positive
    scores = [by_rank[i]["score"] for i in range(1, len(by_rank) + 1)]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)


def test_bm25_matches_reference_formula(spark):
    # tiny corpus, hand-computed Okapi BM25
    docs = _docs_df(spark, [(0, "a b"), (1, "a a c"), (2, "d e f")])
    toks = docs.select("doc_id", _tokens("text").alias("ts"))
    qterms = spark.createDataFrame([(0, "a")], "qid long, term string")
    out = {
        r["doc_id"]: r["score"]
        for r in bm25_topk(toks, qterms, F.col("ts"), k1=1.2, b=0.75, k=10).collect()
    }
    n, df_a, avgdl = 3, 2, (2 + 3 + 3) / 3
    idf = math.log((n - df_a + 0.5) / (df_a + 0.5) + 1.0)

    def s(tf, dl):
        return idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))

    assert out[0] == pytest.approx(s(1, 2), rel=1e-12)
    assert out[1] == pytest.approx(s(2, 3), rel=1e-12)
    assert 2 not in out


def test_postings_shape(spark):
    docs = _docs_df(spark, [(0, "x y x"), (1, "y")])
    toks = docs.select("doc_id", _tokens("text").alias("ts"))
    rows = {
        (r["doc_id"], r["term"]): r["tf"]
        for r in build_postings(toks, F.col("ts")).collect()
    }
    assert rows == {(0, "x"): 2, (0, "y"): 1, (1, "y"): 1}


def _brute_jaccard_pairs(spark, toks, threshold):
    sets = {r["doc_id"]: set(r["ts"]) for r in toks.collect()}
    ids = sorted(sets)
    out = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            uni = len(sets[a] | sets[b])
            if uni and inter / uni >= threshold:
                out.add((a, b, round(inter / uni, 6)))
    return out


@pytest.mark.parametrize("threshold", [0.3, 0.5, 0.8])
def test_setsim_exact_equals_brute_force(spark, sf_dir, threshold):
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .limit(120)
        .select("doc_id", "text")
    )
    toks = docs.select(
        "doc_id", F.array_distinct(_tokens("text")).alias("ts")
    )
    got = {
        (r["a"], r["b"], r["jacc"])
        for r in setsim_join_exact(docs, _tokens("text"), threshold=threshold).collect()
    }
    want = _brute_jaccard_pairs(spark, toks, threshold)
    # prefix filtering is lossless: EXACT equality, not recall-bounded
    assert got == want
    assert len(want) > 0  # non-vacuous at these thresholds on this corpus


def test_setsim_and_containment_shuffle_path_equals_broadcast(spark, sf_dir):
    """broadcast_freq only changes the JOIN STRATEGY of the rarity-rank
    join (the web-scale escape hatch for the vocabulary-scale freq
    table) — results must be identical through both plans."""
    from pathhier_spark.operators.retrieval import containment_join_exact

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .limit(120)
        .select("doc_id", "text")
    )
    a = {(r["a"], r["b"], r["jacc"])
         for r in setsim_join_exact(docs, _tokens("text")).collect()}
    b = {(r["a"], r["b"], r["jacc"])
         for r in setsim_join_exact(
             docs, _tokens("text"), broadcast_freq=False).collect()}
    assert a == b and len(a) > 0
    ca = {(r["a"], r["b"], r["inter"])
          for r in containment_join_exact(docs, _tokens("text")).collect()}
    cb = {(r["a"], r["b"], r["inter"])
          for r in containment_join_exact(
              docs, _tokens("text"), broadcast_freq=False).collect()}
    assert ca == cb and len(ca) > 0


def test_pmi_hand_example(spark):
    # x,y co-occur in every doc; x,z never beyond chance
    rows = [(i, "alpha beta unique%d" % i) for i in range(8)]
    rows += [(100 + i, "gamma delta%d" % i) for i in range(8)]
    docs = _docs_df(spark, rows)
    out = {
        (r["x"], r["y"]): (r["c_xy"], r["pmi"])
        for r in pmi_pairs(docs, cap=20, min_pairs=5).collect()
    }
    assert set(out) == {("alpha", "beta")}
    c_xy, pmi = out[("alpha", "beta")]
    assert c_xy == 8
    assert pmi == pytest.approx(math.log(16 * 8 / (8 * 8)), rel=1e-12)


def test_pmi_cap_bounds_pairs(spark):
    # 30 distinct tokens but cap=5 -> only first-5 tokens pair up
    text = " ".join(f"t{i:02d}" for i in range(30))
    docs = _docs_df(spark, [(i, text) for i in range(6)])
    out = pmi_pairs(docs, cap=5, min_pairs=5).collect()
    assert len(out) == 10  # C(5,2)
    toks = {t for r in out for t in (r["x"], r["y"])}
    assert toks == {f"t{i:02d}" for i in range(5)}


def test_containment_join_directional_quote(spark):
    from pathhier_spark.operators.retrieval import containment_join_exact
    from pathhier_spark.operators.textstats import _tokens

    big = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    quote = "gamma delta epsilon zeta"  # contiguous slice of big
    other = "one two three four five six seven"
    docs = spark.createDataFrame(
        [(0, big), (1, quote), (2, other)], "doc_id long, text string"
    )
    out = {
        (r["a"], r["b"]): r["containment"]
        for r in containment_join_exact(
            docs, _tokens("text"), n=3, threshold=0.9
        ).collect()
    }
    # quote (2 shingles) fully contained in big; big NOT contained in quote
    assert out == {(1, 0): 1.0}


def test_containment_prefix_filter_is_lossless(spark):
    from pathhier_spark.operators.retrieval import containment_join_exact
    from pathhier_spark.operators.textstats import _tokens

    # overlapping sentence fragments force partial containments
    base = "the quick brown fox jumps over the lazy dog again and again"
    toks = base.split()
    rows = [
        (i, " ".join(toks[s:s + ln]))
        for i, (s, ln) in enumerate(
            [(0, 12), (0, 6), (3, 6), (6, 6), (2, 9), (0, 3), (9, 3)]
        )
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    t = 0.5
    got = {
        (r["a"], r["b"], r["inter"])
        for r in containment_join_exact(
            docs, _tokens("text"), n=3, threshold=t
        ).collect()
    }

    def sh(text, n=3):
        ws = text.split()
        return {
            " ".join(ws[i:i + n]) for i in range(len(ws) - n + 1)
        } if len(ws) >= n else set()

    want = set()
    for a, ta in rows:
        for b, tb in rows:
            sa, sb = sh(ta), sh(tb)
            if a != b and sa and len(sa & sb) / len(sa) >= t:
                want.add((a, b, len(sa & sb)))
    assert got == want and len(want) > 3


def test_containment_skips_short_docs(spark):
    from pathhier_spark.operators.retrieval import containment_join_exact
    from pathhier_spark.operators.textstats import _tokens

    docs = spark.createDataFrame(
        [(0, "just two"), (1, "just two words here now")],
        "doc_id long, text string",
    )
    assert containment_join_exact(
        docs, _tokens("text"), n=3, threshold=0.1
    ).collect() == []


# --- reciprocal-rank fusion -------------------------------------------------


def test_rrf_fuse_known_values(spark):
    from pathhier_spark.operators.retrieval import rrf_fuse

    bm = spark.createDataFrame(
        [(1, 10, 1), (1, 20, 2), (1, 30, 3)], "qid long, id long, rank long"
    )
    dn = spark.createDataFrame(
        [(1, 20, 1), (1, 40, 2)], "qid long, id long, rank long"
    )
    out = rrf_fuse({"bm25": bm, "dense": dn}, k0=60, k=10).collect()
    rows = {r["id"]: r for r in out}
    # doc 20 appears in both channels: 1/62 + 1/61 — the winner
    assert rows[20]["rank"] == 1
    assert rows[20]["rrf"] == pytest.approx(1 / 62 + 1 / 61, abs=1e-6)
    assert rows[20]["bm25_rank"] == 2 and rows[20]["dense_rank"] == 1
    # single-channel docs carry a NULL for the missing channel
    assert rows[10]["dense_rank"] is None
    assert rows[40]["bm25_rank"] is None
    # 1/61 (rank-1 single channel) beats 1/63 but loses to the fused doc
    assert rows[10]["rrf"] == pytest.approx(1 / 61, abs=1e-6)
    assert [r["id"] for r in sorted(out, key=lambda r: r["rank"])] == [
        20, 10, 40, 30,
    ]


def test_rrf_fuse_tie_breaks_by_id(spark):
    from pathhier_spark.operators.retrieval import rrf_fuse

    # two docs with identical (symmetric) channel ranks -> equal rrf;
    # the lower id must win the tie deterministically
    bm = spark.createDataFrame(
        [(1, 7, 1), (1, 5, 2)], "qid long, id long, rank long"
    )
    dn = spark.createDataFrame(
        [(1, 5, 1), (1, 7, 2)], "qid long, id long, rank long"
    )
    out = sorted(
        rrf_fuse({"bm25": bm, "dense": dn}, k0=60, k=10).collect(),
        key=lambda r: r["rank"],
    )
    assert [r["id"] for r in out] == [5, 7]
    assert out[0]["rrf"] == out[1]["rrf"]


# --- phrase_search (q103, round 5) ---

def test_phrase_search_counts_and_positions(spark):
    from pathhier_spark.operators.retrieval import phrase_search

    docs = spark.createDataFrame(
        [
            (1, "big table scan beats small table scan"),
            (2, "table scan"),
            (3, "scan table"),           # reversed: no match
            (4, "table only here"),
            (5, "TABLE   Scan"),         # case + multi-space normalize
        ],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r for r in phrase_search(docs, ["table", "scan"]).collect()}
    assert set(out) == {1, 2, 5}
    assert (out[1]["n_hits"], out[1]["first_pos"]) == (2, 1)
    assert (out[2]["n_hits"], out[2]["first_pos"]) == (1, 0)
    assert (out[5]["n_hits"], out[5]["first_pos"]) == (1, 0)


def test_phrase_search_duplicate_term_overlaps(spark):
    from pathhier_spark.operators.retrieval import phrase_search

    # "batch batch batch" contains TWO overlapping "batch batch" matches
    docs = spark.createDataFrame(
        [(1, "batch batch batch"), (2, "batch x batch")],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r for r in phrase_search(docs, ["batch", "batch"]).collect()}
    assert set(out) == {1}
    assert (out[1]["n_hits"], out[1]["first_pos"]) == (2, 0)


def test_phrase_search_single_token_and_empty(spark):
    import pytest as _pytest

    from pathhier_spark.operators.retrieval import phrase_search

    docs = spark.createDataFrame(
        [(1, "a b a"), (2, "c")], "doc_id bigint, text string"
    )
    out = {r["doc_id"]: r for r in phrase_search(docs, ["a"]).collect()}
    assert (out[1]["n_hits"], out[1]["first_pos"]) == (2, 0)
    assert 2 not in out
    with _pytest.raises(ValueError):
        phrase_search(docs, [])


# --- kwic_snippets (q109, round 5) ---

def test_kwic_snippet_window_and_edges(spark):
    from pathhier_spark.operators.retrieval import kwic_snippets

    docs = spark.createDataFrame(
        [
            (1, "w1 w2 w3 table scan x1 x2 x3 x4"),   # interior match
            (2, "table scan tail1 tail2"),            # left-edge clamp
            (3, "a b c d e table scan"),              # right-edge clamp
            (4, "no match here"),
        ],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r for r in kwic_snippets(docs, ["table", "scan"], window=2).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1]["snippet"] == "w2 w3 table scan x1 x2"
    assert out[2]["snippet"] == "table scan tail1 tail2"
    assert out[3]["snippet"] == "d e table scan"
    assert out[2]["first_pos"] == 0 and out[3]["first_pos"] == 5


def test_kwic_uses_first_occurrence(spark):
    from pathhier_spark.operators.retrieval import kwic_snippets

    docs = spark.createDataFrame(
        [(1, "x table scan y z table scan w")], "doc_id bigint, text string"
    )
    r = kwic_snippets(docs, ["table", "scan"], window=1).collect()[0]
    assert r["n_hits"] == 2
    assert r["snippet"] == "x table scan y"


# --- retrieval evaluation: MRR / nDCG (q126, round 5) ---

def test_retrieval_eval_hand_computed(spark):
    import math
    from pathhier_spark.operators.retrieval import retrieval_eval

    ranking = spark.createDataFrame(
        [(1, 1, "a"), (1, 2, "b"), (1, 3, "c"), (2, 1, "x"), (2, 2, "y")],
        "qid long, rank long, doc_id string",
    )
    # q1: relevant {b, c, zz} -> first hit rank 2, dcg = w2 + w3,
    # idcg over min(3, k)=3 ideal slots; q2: one relevant, none retrieved
    rel = spark.createDataFrame(
        [(1, "b"), (1, "c"), (1, "zz"), (2, "nope")],
        "qid long, doc_id string",
    )
    got = {r["qid"]: (r["n_rel"], r["mrr"], r["ndcg"])
           for r in retrieval_eval(ranking, rel, k=3).collect()}
    dcg = 1 / math.log2(3) + 1 / math.log2(4)
    idcg = 1.0 + 1 / math.log2(3) + 1 / math.log2(4)
    assert got[1] == (3, 0.5, round(dcg / idcg, 6))
    assert got[2] == (1, 0.0, 0.0)


def test_retrieval_eval_perfect_ranking_scores_one(spark):
    from pathhier_spark.operators.retrieval import retrieval_eval

    ranking = spark.createDataFrame(
        [(1, 1, "a"), (1, 2, "b")], "qid long, rank long, doc_id string"
    )
    rel = spark.createDataFrame(
        [(1, "a"), (1, "b")], "qid long, doc_id string"
    )
    r = retrieval_eval(ranking, rel, k=2).collect()[0]
    assert (r["mrr"], r["ndcg"]) == (1.0, 1.0)


# --- inverted-index materialization (q127, round 5) ---

def test_inverted_index_hand_computed(spark):
    from pyspark.sql import functions as F
    from pathhier_spark.operators.retrieval import inverted_index

    docs = spark.createDataFrame(
        [(1, ["a", "a", "b"]), (2, ["a", "b", "b", "b"]), (3, ["c"])],
        "doc_id long, ts array<string>",
    )
    got = {
        r["term"]: (r["df"], r["cf"], r["top_postings"])
        for r in inverted_index(docs, F.col("ts"), postings_cap=2).collect()
    }
    # 'a': doc1 tf2, doc2 tf1 -> postings tf-desc; 'b': doc2 tf3, doc1 tf1
    assert got["a"] == (2, 3, ["1:2", "2:1"])
    assert got["b"] == (2, 4, ["2:3", "1:1"])
    assert got["c"] == (1, 1, ["3:1"])


def test_inverted_index_postings_cap_keeps_full_df(spark):
    from pyspark.sql import functions as F
    from pathhier_spark.operators.retrieval import inverted_index

    # 10 docs all contain 't': df/cf count ALL of them even though the
    # postings head is capped at 3
    docs = spark.createDataFrame(
        [(i, ["t"] * (i + 1)) for i in range(10)],
        "doc_id long, ts array<string>",
    )
    r = inverted_index(docs, F.col("ts"), postings_cap=3).collect()[0]
    assert (r["df"], r["cf"]) == (10, sum(range(1, 11)))
    assert r["top_postings"] == ["9:10", "8:9", "7:8"]


def test_retrieval_eval_duplicate_gold_is_deduped(spark):
    """Review regression: duplicated gold pairs must not inflate
    DCG/n_rel — a perfect ranking stays exactly 1.0."""
    from pathhier_spark.operators.retrieval import retrieval_eval

    ranking = spark.createDataFrame(
        [(1, 1, "a")], "qid long, rank long, doc_id string"
    )
    rel = spark.createDataFrame(
        [(1, "a"), (1, "a"), (1, "a")], "qid long, doc_id string"
    )
    r = retrieval_eval(ranking, rel, k=1).collect()[0]
    assert (r["n_rel"], r["mrr"], r["ndcg"]) == (1, 1.0, 1.0)


def test_rouge_hand_case(spark):
    from pathhier_spark.operators.textstats import rouge_pairs

    pairs = spark.createDataFrame(
        [(1, "the cat sat on the mat", "the cat is on the mat")],
        "pair_id long, cand string, ref string",
    )
    got = {r["n"]: r for r in rouge_pairs(pairs).collect()}
    # unigrams: the(2),cat,on,mat clip -> 5 of 6
    assert got[1]["match_n"] == 5
    assert got[1]["rouge_p"] == got[1]["rouge_r"] == 0.833333
    # bigrams: "the cat","on the","the mat" -> 3 of 5
    assert got[2]["match_n"] == 3
    assert got[2]["rouge_f1"] == 0.6


def test_rouge_clipping_bounds_repeats(spark):
    from pathhier_spark.operators.textstats import rouge_pairs

    # candidate spams "the" — clipped match must stay at ref's count
    pairs = spark.createDataFrame(
        [(1, "the the the the", "the cat")],
        "pair_id long, cand string, ref string",
    )
    got = {r["n"]: r for r in rouge_pairs(pairs).collect()}
    assert got[1]["match_n"] == 1
    assert got[1]["rouge_p"] == 0.25
    assert got[1]["rouge_r"] == 0.5


def test_rouge_gram_boundary_no_collision(spark):
    from pathhier_spark.operators.textstats import rouge_pairs

    # "ab c" vs "a bc": joined without a separator both bigrams would
    # collide as "abc"; the 0x1f joiner must keep them distinct
    pairs = spark.createDataFrame(
        [(1, "ab c", "a bc")], "pair_id long, cand string, ref string"
    )
    got = {r["n"]: r for r in rouge_pairs(pairs).collect()}
    assert got[2]["match_n"] == 0


def test_rouge_empty_sides_null_not_zero_div(spark):
    from pathhier_spark.operators.textstats import rouge_pairs

    pairs = spark.createDataFrame(
        [(1, "", "x y"), (2, "", "")],
        "pair_id long, cand string, ref string",
    )
    rows = {(r["pair_id"], r["n"]): r for r in rouge_pairs(pairs).collect()}
    assert rows[(1, 1)]["rouge_p"] is None
    assert rows[(1, 1)]["rouge_r"] == 0.0
    assert rows[(2, 1)]["rouge_f1"] is None


def test_dirichlet_ql_hand_computed(spark):
    """d1='a b', d2='a b b c', query (a), mu=10: C=6, ctf(a)=2;
    score(d) = ln(tf*6+20)-ln(20) + 1*(ln 10 - ln(dl+10)). Shorter doc
    outranks (the smoothing denominator IS the length penalty)."""
    import math
    from pathhier_spark.operators.retrieval import dirichlet_ql_topk
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(1, ["a", "b"]), (2, ["a", "b", "b", "c"])],
        "doc_id long, ts array<string>",
    )
    q = spark.createDataFrame([(100, "a")], "qid long, term string")
    rows = dirichlet_ql_topk(docs, q, F.col("ts"), mu=10, k=5).collect()
    got = {r["doc_id"]: r for r in rows}
    assert [r["doc_id"] for r in sorted(rows, key=lambda r: r["rank"])] == [1, 2]
    s1 = math.log(26.0) - math.log(20.0) + (math.log(10.0) - math.log(12.0))
    s2 = math.log(26.0) - math.log(20.0) + (math.log(10.0) - math.log(14.0))
    assert abs(got[1]["score"] - s1) < 1e-12
    assert abs(got[2]["score"] - s2) < 1e-12
    assert got[1]["n_match"] == 1


def test_dirichlet_ql_rank_equivalent_to_loglikelihood(spark):
    """The decomposed score differs from sum-ln-p by a per-query
    constant, so the produced ranking must equal ranking by the true
    smoothed log-likelihood computed directly."""
    import math
    from collections import Counter
    from pathhier_spark.operators.retrieval import dirichlet_ql_topk
    from pyspark.sql import functions as F

    corpus = {
        1: "the graph spark engine".split(),
        2: "the the graph".split(),
        3: "spark spark shuffle".split(),
        4: "engine shuffle plan".split(),
    }
    mu = 7
    docs = spark.createDataFrame(
        list(corpus.items()), "doc_id long, ts array<string>"
    )
    q = spark.createDataFrame(
        [(9, "spark"), (9, "the")], "qid long, term string"
    )
    out = dirichlet_ql_topk(docs, q, F.col("ts"), mu=mu, k=10).collect()
    got = [r["doc_id"] for r in sorted(out, key=lambda r: r["rank"])]

    ctf = Counter(w for ws in corpus.values() for w in ws)
    c_tot = sum(ctf.values())
    def llh(d):
        ws = corpus[d]
        return sum(
            math.log((Counter(ws)[w] + mu * ctf[w] / c_tot)
                     / (len(ws) + mu))
            for w in ("spark", "the")
        )
    cand = [d for d in corpus if {"spark", "the"} & set(corpus[d])]
    want = sorted(cand, key=lambda d: (-llh(d), d))
    assert got == want


def test_dirichlet_ql_oov_term_dropped(spark):
    from pathhier_spark.operators.retrieval import dirichlet_ql_topk
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(1, ["a", "b"]), (2, ["b", "c"])], "doc_id long, ts array<string>"
    )
    q = spark.createDataFrame(
        [(5, "a"), (5, "zzz_oov")], "qid long, term string"
    )
    rows = dirichlet_ql_topk(docs, q, F.col("ts"), mu=10, k=5).collect()
    # OOV contributes neither a lift nor an nq slot; only d1 matches
    assert [r["doc_id"] for r in rows] == [1]
    assert rows[0]["n_match"] == 1


def test_proximity_search_slop_semantics(spark):
    from pathhier_spark.operators.retrieval import proximity_search

    df = spark.createDataFrame(
        [
            (1, "join the big merge now"),        # dist 3 -> within slop 3
            (2, "join a b c d e merge"),          # dist 6 -> excluded
            (3, "merge join"),                    # order-free, dist 1
            (4, "join join merge"),               # pairs: d=2, d=1 -> 2 within
            (5, "no terms at all"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_pairs_within"], r["min_dist"])
        for r in proximity_search(df, "join", "merge", slop=3).collect()
    }
    assert got == {1: (1, 3), 3: (1, 1), 4: (2, 1)}


def test_prf_expansion_recovers_vocabulary_mismatch(spark):
    from pyspark.sql import functions as F

    from pathhier_spark.operators.retrieval import bm25_topk, prf_bm25_topk
    from pathhier_spark.operators.textstats import _tokens

    # query: "car". Feedback doc 1 pairs car with automobile; doc 3
    # says only "automobile" and can NEVER match the raw query — PRF
    # must expand to 'automobile' and retrieve doc 3.
    rows = [
        (1, "car automobile automobile automobile"),
        (2, "car common"),
        (3, "automobile engine factory"),
        (4, "common words everywhere"),
        (5, "common other stuff"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string").select(
        "doc_id", _tokens("text").alias("ts")
    )
    q = spark.createDataFrame([(100, "car")], "qid long, term string")
    base = {r["doc_id"] for r in bm25_topk(docs, q, F.col("ts"), k=10).collect()}
    assert base == {1, 2}  # raw query cannot see doc 3
    prf = {
        r["doc_id"]
        for r in prf_bm25_topk(
            docs, q, F.col("ts"), fb_docs=2, exp_terms=2, k=10
        ).collect()
    }
    assert 3 in prf  # expansion bridged the vocabulary mismatch
    assert {1, 2} <= prf


def test_prf_expansion_excludes_original_terms(spark):
    from pyspark.sql import functions as F

    from pathhier_spark.operators.retrieval import prf_bm25_topk
    from pathhier_spark.operators.textstats import _tokens

    # degenerate corpus where the query term dominates every doc: the
    # expansion must still pick NON-query terms (never re-add 'car')
    rows = [(i, "car car unique%d filler" % i) for i in range(6)]
    docs = spark.createDataFrame(rows, "doc_id long, text string").select(
        "doc_id", _tokens("text").alias("ts")
    )
    q = spark.createDataFrame([(1, "car")], "qid long, term string")
    out = prf_bm25_topk(docs, q, F.col("ts"), fb_docs=3, exp_terms=2, k=6)
    assert out.count() == 6  # all docs still retrievable, no crash
