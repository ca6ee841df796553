"""Bootstrap loop end-to-end + BOW embedding averaging (M3/M5)."""

import pytest
from pyspark.sql import functions as F

from pathhier_spark.operators.bootstrap import bootstrap_loop
from pathhier_spark.operators.embeddings import entity_bow_embeddings
from pathhier_spark.operators.linking import FEATURE_COLS, pair_features
from pathhier_spark.plans.pipeline import expand_structural_tokens, ontology_token_table
from pathhier_spark.sources import corpus as corpus_mod


def test_bootstrap_loop_e2e(spark):
    """Candidates: string pairs; positives share tokens, negatives don't.
    The loop must learn to score true pairs high and accumulate training
    rows with lr_iter provenance that the final fit excludes."""
    pos = [(f"s{i}", f"t{i}", f"alpha beta {i}", f"alpha beta {i}") for i in range(30)]
    neg = [(f"s{i}", f"u{i}", f"alpha beta {i}", "zq xw yk") for i in range(30)]
    cand = spark.createDataFrame(
        pos + neg, "s_id string, t_id string, s_txt string, t_txt string"
    )
    feats = pair_features(cand, "s_txt", "t_txt").select(
        "s_id", "t_id", *FEATURE_COLS
    ).cache()
    seed = spark.createDataFrame(
        [(1.0, 0.0, 0.9, 0.9, 0.9, 1), (0.5, 1.0, 0.1, 0.0, 0.0, 0),
         (0.9, 0.1, 0.8, 0.8, 0.7, 1), (0.4, 0.9, 0.0, 0.1, 0.0, 0)],
        ", ".join(f"{c} double" for c in FEATURE_COLS) + ", label int",
    )
    model, train = bootstrap_loop(spark, feats, seed, n_iterations=3)
    provs = {r["provenance"] for r in train.select("provenance").distinct().collect()}
    assert "seed" in provs and any(p.startswith("lr_iter") for p in provs)
    # learned model separates: token_jaccard=1 pair scores higher than 0
    from pathhier_spark.operators.linking import lr_score

    scored = lr_score(feats, model.coef, model.intercept)
    avg = scored.groupBy(F.col("t_id").substr(1, 1).alias("side")).agg(
        F.avg("p1").alias("p")
    )
    got = {r["side"]: r["p"] for r in avg.collect()}
    assert got["t"] > got["u"]


def test_entity_bow_embeddings(spark):
    ents = spark.createDataFrame(
        [("e1", ["alpha", "beta"]), ("e2", ["alpha"]), ("e3", ["zzz_oov"])],
        "ent_id string, tokens array<string>",
    )
    vecs = spark.createDataFrame(
        [("alpha", [1.0, 0.0]), ("beta", [0.0, 1.0])],
        "token string, vector array<double>",
    )
    got = {r["ent_id"]: r["embedding"] for r in entity_bow_embeddings(ents, vecs).collect()}
    assert got["e1"] == pytest.approx([0.5, 0.5])
    assert got["e2"] == pytest.approx([1.0, 0.0])
    # OOV: deterministic, in (-1, 1)
    oov1 = got["e3"]
    assert all(-1.0 <= x <= 1.0 for x in oov1)
    got2 = {r["ent_id"]: r["embedding"] for r in entity_bow_embeddings(ents, vecs).collect()}
    assert got2["e3"] == pytest.approx(oov1)


def test_structural_token_expansion(spark):
    c = corpus_mod.generate(n_classes=30, n_docs=5, seed=3)
    _, onto, *_ = corpus_mod.to_spark(spark, c)
    base = ontology_token_table(onto)
    expanded = expand_structural_tokens(onto, base)
    b = {r["ent_id"]: set(r["tokens"]) for r in base.collect()}
    e = {r["ent_id"]: set(r["tokens"]) for r in expanded.collect()}
    # expansion is a superset everywhere; strictly larger for classes with parents
    assert all(b[k] <= e[k] for k in b)
    parents = {r["class_id"]: r["subClassOf"] for r in onto.collect()}
    grew = [k for k in b if e[k] > b[k]]
    with_parent = [k for k, p in parents.items() if p]
    assert grew and set(grew) >= set()  # some grew
    # every class with a parent includes that parent's base tokens
    for k in with_parent:
        for p in parents[k]:
            assert b[p] <= e[k]
