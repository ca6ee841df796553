"""Extraction stage: byte-identical text invariant + mention/triple parsing."""

import pytest
from pyspark.sql import functions as F

from pathhier_spark.operators.extract import (
    extract_mentions,
    extract_text_py,
    extract_token_triples,
    with_extracted_text,
)
from pathhier_spark.sources import corpus as corpus_mod


def test_extract_text_pure():
    html = b"<html><head><title>t</title></head><body><p>hello &amp; <b>world</b></p></body></html>"
    assert extract_text_py(html) == "hello & world"
    assert extract_text_py(b"<script>var x=1;</script><p>keep</p>") == "keep"


def test_byte_identical_text_invariant(spark):
    """BASELINE.json input_hint: byte-identical extracted text per url."""
    c = corpus_mod.generate(n_classes=50, n_docs=80, seed=42)
    docs, *_ = corpus_mod.to_spark(spark, c)
    out = with_extracted_text(docs)
    mism = out.filter(F.col("extracted_text") != F.col("text")).count()
    assert mism == 0
    assert out.count() == 80


def test_extract_mentions_gold_parity(spark):
    """Every gold triple's sentence must parse back to (subj, pred, obj)."""
    c = corpus_mod.generate(n_classes=50, n_docs=80, seed=7)
    docs, _, gold_triples, gold_mentions, *_ = corpus_mod.to_spark(spark, c)
    mentions = extract_mentions(docs)
    # count parity: one extracted row per gold triple
    assert mentions.count() == gold_triples.count()
    # predicate distribution parity
    got = {r["pred"]: r["n"] for r in mentions.groupBy("pred").agg(F.count("*").alias("n")).collect()}
    want = {r["pred"]: r["n"] for r in gold_triples.groupBy("pred").agg(F.count("*").alias("n")).collect()}
    assert got == want


def test_token_triples_driver_table(spark, sf_dir):
    trig = {"join": "participant", "merge": "component", "group": "member"}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = extract_token_triples(docs, trig)
    rows = out.filter(F.col("doc_id") == 0).orderBy("pos").collect()
    text = docs.filter(F.col("doc_id") == 0).collect()[0]["text"]
    toks = text.lower().split()
    expected = [
        (i, toks[i - 1], trig[toks[i]], toks[i + 1])
        for i in range(1, len(toks) - 1)
        if toks[i] in trig
    ]
    assert [(r["pos"], r["subj"], r["pred"], r["obj"]) for r in rows] == expected


def test_predicate_profile_known_graph(spark):
    from pathhier_spark.operators.extract import predicate_profile

    triples = spark.createDataFrame(
        [
            # "born_in": functional (each subj one obj), shared obj
            ("a", "born_in", "x"),
            ("b", "born_in", "x"),
            ("c", "born_in", "y"),
            ("c", "born_in", "y"),  # duplicate mention collapses
            # "knows": subj a asserts two objects -> one violation
            ("a", "knows", "b"),
            ("a", "knows", "c"),
            ("b", "knows", "c"),
        ],
        "subj string, pred string, obj string",
    )
    out = {r["pred"]: r for r in predicate_profile(triples).collect()}
    bi = out["born_in"]
    assert (bi["n_triples"], bi["n_subj"], bi["n_obj"]) == (3, 3, 2)
    assert bi["functionality"] == 1.0
    assert bi["inv_functionality"] == pytest.approx(2 / 3, abs=1e-6)
    assert bi["n_multi_subj"] == 0
    kn = out["knows"]
    assert (kn["n_triples"], kn["n_subj"], kn["n_obj"]) == (3, 2, 2)
    assert kn["functionality"] == pytest.approx(2 / 3, abs=1e-6)
    assert kn["n_multi_subj"] == 1


# --- typed mention extraction (q128, round 5) ---

def test_typed_mentions_hand_computed(spark):
    from pathhier_spark.operators.extract import typed_mentions

    df = spark.createDataFrame(
        [(1, "mail a.b@x.co or see https://w.example.com/p?q=1 in 1999 "
             "with 42 items")],
        "doc_id long, text string",
    )
    got = sorted(tuple(r) for r in typed_mentions(df).collect())
    # the year 1999 double-reports as number AND year — the documented
    # long-format contract (consumers filter by type)
    assert got == [
        (1, "email", "a.b@x.co"),
        (1, "number", "1"),
        (1, "number", "1999"),
        (1, "number", "42"),
        (1, "url", "https://w.example.com/p?q=1"),
        (1, "year", "1999"),
    ]


def test_typed_mentions_no_false_positives(spark):
    from pathhier_spark.operators.extract import typed_mentions

    df = spark.createDataFrame(
        [(1, "plain words only at example dot com twenty twenty")],
        "doc_id long, text string",
    )
    assert typed_mentions(df).count() == 0


# --- functional-conflict resolution (q136, round 5) ---

def test_resolve_functional_conflicts_majority_and_ties(spark):
    from pathhier_spark.operators.extract import resolve_functional_conflicts

    rows = (
        [("s1", "p", "x")] * 3 + [("s1", "p", "y")] * 2   # majority x 3/5
        + [("s2", "p", "a"), ("s2", "p", "b")]            # tie -> smallest a
        + [("s3", "p", "only")] * 4                       # unconflicted: dropped
    )
    df = spark.createDataFrame(rows, "subj string, pred string, obj string")
    got = {
        r["subj"]: (r["winner_obj"], r["support"], r["n_obj"], r["total"],
                    r["confidence"])
        for r in resolve_functional_conflicts(df).collect()
    }
    assert got["s1"] == ("x", 3, 2, 5, 0.6)
    assert got["s2"] == ("a", 1, 2, 2, 0.5)
    assert "s3" not in got and len(got) == 2


def test_hearst_hypernyms_patterns(spark):
    from pathhier_spark.operators.extract import hearst_hypernyms

    df = spark.createDataFrame(
        [
            (1, "engines such as spark and flink dominate"),
            (2, "flink and other engines exist"),
            (3, "plain text with no patterns"),
            (4, "dbs such as duckdb and sqlite plus pandas and other tools"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["hypernym"], r["hyponym"], r["pattern"])
        for r in hearst_hypernyms(df).collect()
    }
    assert got == {
        (1, "engines", "spark", "such_as"),
        (1, "engines", "flink", "such_as"),
        (2, "engines", "flink", "and_other"),
        (4, "dbs", "duckdb", "such_as"),
        (4, "dbs", "sqlite", "such_as"),
        (4, "tools", "pandas", "and_other"),
    }


def test_extract_html_tables_ragged_and_headers(spark):
    from pathhier_spark.operators.extract import extract_html_tables

    df = spark.createDataFrame(
        [
            (1, "<table><tr><th>a</th><th>b</th></tr>"
                "<tr><td>1</td><td>2</td><td>3</td></tr></table>"),
            (2, "<p>no table</p>"),
        ],
        "doc_id long, html string",
    )
    got = {
        (r["doc_id"], r["row_idx"], r["col_idx"]): (r["cell"], r["is_header"])
        for r in extract_html_tables(df).collect()
    }
    assert got[(1, 0, 0)] == ("a", True)
    assert got[(1, 0, 1)] == ("b", True)
    assert got[(1, 1, 2)] == ("3", False)
    assert len([k for k in got if k[0] == 2]) == 0
    assert len(got) == 5
