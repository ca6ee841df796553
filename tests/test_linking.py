"""Linking stage vs a pure-Python port of the reference candidate selector."""

import math
from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from pathhier_spark import config
from pathhier_spark.functions import oracle
from pathhier_spark.operators.linking import (
    FEATURE_COLS,
    bow_link,
    candidate_pairs,
    entity_token_table,
    fuse_channels,
    lr_score,
    pair_features,
    top_matches,
)


def _oracle_candidates(source, target, top_n=20):
    """candidate_selector.py:111-178 semantics on (id -> token set) dicts."""
    t_total = len(target) + 1
    postings = defaultdict(set)
    for tid, toks in target.items():
        for t in set(toks):
            postings[t].add(tid)
    idf = {t: math.log(t_total / (len(ids) + 1)) for t, ids in postings.items()}
    out = {}
    for sid, toks in source.items():
        scores = defaultdict(float)
        for t in set(toks):
            for tid in postings.get(t, ()):
                scores[tid] += idf[t]
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:top_n]
        out[sid] = ranked
    return out


SOURCE = {
    "s1": ["glycolysis", "glucose", "breakdown"],
    "s2": ["mapk", "signaling"],
    "s3": ["citrate", "cycle"],
    "s4": ["nothing", "shared"],
    "s5": ["glucose", "signaling", "cycle"],
}
TARGET = {
    "t1": ["glycolysis", "glucose"],
    "t2": ["mapk", "signaling", "cascade"],
    "t3": ["citrate", "cycle", "tca"],
    "t4": ["glucose", "transport"],
    "t5": ["signaling", "cycle"],
    "t6": ["unrelated", "tokens"],
}


def _tok_df(spark, d):
    return spark.createDataFrame(
        [(k, v) for k, v in sorted(d.items())], "ent_id string, tokens array<string>"
    )


def test_candidate_pairs_vs_oracle(spark):
    got_df = candidate_pairs(_tok_df(spark, SOURCE), _tok_df(spark, TARGET))
    got = defaultdict(list)
    for r in got_df.orderBy("s_id", "rank").collect():
        got[r["s_id"]].append((r["t_id"], r["cand_score"]))
    want = _oracle_candidates(SOURCE, TARGET)
    for sid, ranked in want.items():
        if not ranked:
            assert sid not in got
            continue
        assert [t for t, _ in got[sid]] == [t for t, _ in ranked]
        for (gt, gs), (wt, ws) in zip(got[sid], ranked):
            assert gs == pytest.approx(ws)


def test_candidate_idf_floor_prunes_hot_tokens(spark):
    # a token present in (almost) every target entity has idf < ln(20) once
    # the target side is big enough; the floor must remove those candidates
    target = {f"t{i}": ["hot", f"rare{i}"] for i in range(40)}
    source = {"s0": ["hot"], "s1": ["rare7", "hot"]}
    got = candidate_pairs(
        _tok_df(spark, source),
        _tok_df(spark, target),
        idf_floor=config.IDF_LIMIT,
    )
    rows = got.collect()
    # 'hot': idf = ln(41/41) = 0 < ln 20 -> pruned; only rare7 match remains
    assert {(r["s_id"], r["t_id"]) for r in rows} == {("s1", "t7")}


def test_pair_features_vs_oracle(spark):
    pairs = [
        ("Glycolysis / Gluconeogenesis", "glycolysis gluconeogenesis"),
        ("MAPK-signaling pathway", "mapk cascade"),
        ("the of", "the of"),
        ("abc", "abd"),
    ]
    df = spark.createDataFrame(pairs, "kb_cls string, pw_cls string")
    got = pair_features(df, "kb_cls", "pw_cls").collect()
    for (kb, pw), row in zip(pairs, got):
        want = oracle.pair_features(kb, pw)
        assert row["len_diff_perc"] == pytest.approx(want["len_diff_perc"])
        assert row["token_jaccard"] == pytest.approx(want["token_jaccard"])
        for n in (3, 4, 5):
            assert row[f"ngram{n}_jaccard"] == pytest.approx(
                want[f"{n}gram_jaccard"]
            ), (kb, pw, n)


def test_lr_score_is_sigmoid(spark):
    df = spark.createDataFrame(
        [(0.0, 0.0, 0.0, 0.0, 0.0), (1.0, 1.0, 1.0, 1.0, 1.0)],
        ", ".join(f"{c} double" for c in FEATURE_COLS),
    )
    got = lr_score(df, [1.0, 2.0, 0.5, 0.25, 0.25], -2.0).collect()
    assert got[0]["p1"] == pytest.approx(1 / (1 + math.exp(2.0)))
    assert got[1]["p1"] == pytest.approx(1 / (1 + math.exp(-2.0)))


def test_fuse_channels(spark):
    rows = [
        ("a", "x", 0.8, "name"),
        ("a", "x", 0.6, "name"),
        ("a", "x", 0.4, "def"),
        ("a", "y", 0.2, "name"),  # 0.75*0.2 = 0.15 < 0.25 -> dropped
        ("b", "z", 0.0, "def"),  # 0.25*0 -> dropped
    ]
    df = spark.createDataFrame(rows, "s_id string, t_id string, score double, data_type string")
    got = {(r["s_id"], r["t_id"]): r["score"] for r in fuse_channels(df).collect()}
    assert got == {("a", "x"): pytest.approx(0.75 * 0.8 + 0.25 * 0.4)}


def test_top_matches_cap_and_ties(spark):
    rows = [("s", f"t{i:02d}", 1.0 - 0.01 * i) for i in range(15)]
    rows += [("s", "t00b", 1.0)]  # tie with t00 -> deterministic by t_id
    df = spark.createDataFrame(rows, "s_id string, t_id string, score double")
    got = top_matches(df).collect()
    assert len(got) == config.KEEP_TOP_N_MATCHES
    assert got[0]["t_id"] in ("t00", "t00b")


def test_bow_link_end_to_end(spark):
    got = bow_link(_tok_df(spark, SOURCE), _tok_df(spark, TARGET))
    rows = got.collect()
    assert all(0.0 <= r["score"] <= 1.0 for r in rows)
    assert max(r["score"] for r in rows) == pytest.approx(1.0)
    # s4 shares no tokens -> absent
    assert not [r for r in rows if r["s_id"] == "s4"]
    # normalization matches oracle: score = cand/max over all pairs
    want = _oracle_candidates(SOURCE, TARGET)
    best = max(s for ranked in want.values() for _, s in ranked)
    want_scores = {
        (sid, tid): s / best
        for sid, ranked in want.items()
        for tid, s in ranked
        if s / best >= config.BOW_SIMSCORE_THRESHOLD
    }
    got_scores = {(r["s_id"], r["t_id"]): r["score"] for r in rows}
    assert set(got_scores) == set(want_scores)
    for k, v in want_scores.items():
        assert got_scores[k] == pytest.approx(v)


def test_entity_token_table(spark):
    df = spark.createDataFrame(
        [("e1", "MAPK-signaling", "a cascade of events")],
        "uid string, name string, definition string",
    )
    got = entity_token_table(df, "uid", ["name", "definition"]).collect()[0]
    # 'a' survives: the stopword set keeps only len>1 words
    # (candidate_selector.py:32 — one-letter words are meaningful here)
    assert got["tokens"] == ["mapk", "signaling", "a", "cascade", "events"]


def test_salted_candidates_equal_unsalted(spark):
    from pathhier_spark.operators.linking import salted_candidate_pairs

    plain = candidate_pairs(_tok_df(spark, SOURCE), _tok_df(spark, TARGET))
    salted = salted_candidate_pairs(
        _tok_df(spark, SOURCE), _tok_df(spark, TARGET),
        hot_df_threshold=1, salt_buckets=4,  # force salting of every token
    )
    a = {(r["s_id"], r["t_id"]): (round(r["cand_score"], 9), r["rank"]) for r in plain.collect()}
    b = {(r["s_id"], r["t_id"]): (round(r["cand_score"], 9), r["rank"]) for r in salted.collect()}
    assert a == b


# --------------------------- dictionary_augment ---------------------------


def test_dictionary_augment_hand_case(spark):
    from pathhier_spark.operators.linking import dictionary_augment

    phrases = spark.createDataFrame(
        [(1, "spring yellow saddle"), (2, "click here"),
         (3, "goldenrod lavender spring yellow saddle")],
        "phrase_id long, phrase string",
    )
    dic = spark.createDataFrame(
        [(10, "goldenrod lavender spring yellow saddle"),
         (11, "spring yellow"), (12, "azure rose")],
        "cls_id long, cls_name string",
    )
    got = {r["phrase_id"]: r
           for r in dictionary_augment(phrases, dic).collect()}
    # 2/3 (cls 11) beats 3/5 (cls 10)
    assert got[1]["cls_id"] == 11 and got[1]["jacc_fp"] == 666666
    assert got[1]["is_new"] is True
    # exact alias: not new
    assert got[3]["cls_id"] == 10 and got[3]["jacc_fp"] == 1000000
    assert got[3]["is_new"] is False
    # no class above threshold: NULL row kept
    assert got[2]["cls_id"] is None and got[2]["is_new"] is None


def test_dictionary_augment_tie_breaks_min_cls(spark):
    from pathhier_spark.operators.linking import dictionary_augment

    phrases = spark.createDataFrame(
        [(1, "red widget")], "phrase_id long, phrase string"
    )
    dic = spark.createDataFrame(
        [(20, "red widget"), (7, "red widget")],
        "cls_id long, cls_name string",
    )
    got = dictionary_augment(phrases, dic).collect()[0]
    assert got["cls_id"] == 7


def test_dictionary_augment_prefix_filter_lossless(spark):
    """Prefix-filtered candidates must equal the brute-force cross
    product above threshold (the AllPairs bound, bipartite form)."""
    from pyspark.sql import functions as F

    from pathhier_spark.operators.linking import dictionary_augment

    vocab = ["a", "b", "c", "d", "e", "f", "g", "h"]
    # deterministic token soup: phrase i / class j get hash-derived sets
    phrases = spark.createDataFrame(
        [(i, " ".join(v for k, v in enumerate(vocab)
                      if (i * 7 + k * 3) % 5 < 2))
         for i in range(30)],
        "phrase_id long, phrase string",
    ).filter(F.length("phrase") > 0)
    dic = spark.createDataFrame(
        [(j, " ".join(v for k, v in enumerate(vocab)
                      if (j * 11 + k * 5) % 7 < 3))
         for j in range(40)],
        "cls_id long, cls_name string",
    ).filter(F.length("cls_name") > 0)
    got = {
        r["phrase_id"]: (r["cls_id"], r["jacc_fp"])
        for r in dictionary_augment(phrases, dic, threshold=0.5).collect()
    }
    # brute force in python
    pts = {r["phrase_id"]: set(r["phrase"].split())
           for r in phrases.collect()}
    cts = {r["cls_id"]: set(r["cls_name"].split()) for r in dic.collect()}
    for pid, ps in pts.items():
        best = None
        for cid in sorted(cts):
            cs = cts[cid]
            inter = len(ps & cs)
            jfp = (1000000 * inter) // (len(ps) + len(cs) - inter)
            if jfp >= 500000 and (best is None or jfp > best[1]):
                best = (cid, jfp)
        assert got[pid] == (best if best else (None, None)), pid
