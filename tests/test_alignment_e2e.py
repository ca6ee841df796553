"""Pairwise alignment end-to-end over the synthetic corpus (SURVEY §7.1
step 7): document pairs -> per-pair entity tables -> rule-tier scoring ->
greedy matching (applyInPandas) -> pair score; shared-class P/R >= 0.95."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from pathhier_spark.operators.align import (
    aggregate_pair_scores,
    align_pairs,
    prelim_alignments,
)
from pathhier_spark.sources import corpus as corpus_mod


@pytest.fixture(scope="module")
def aligned(spark):
    c = corpus_mod.generate(n_classes=60, n_docs=60, seed=11)
    docs, onto, gold_triples, gold_mentions, *_ = corpus_mod.to_spark(spark, c)

    # per-document entity sets = gold mention classes
    doc_ents = gold_mentions.select("url", "class_id").distinct()

    # candidate pairs: docs sharing >= 2 classes (J9-style blocking)
    a = doc_ents.select(F.col("url").alias("url_a"), "class_id")
    b = doc_ents.select(F.col("url").alias("url_b"), "class_id")
    pairs = (
        a.join(b, "class_id")
        .filter(F.col("url_a") < F.col("url_b"))
        .groupBy("url_a", "url_b")
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= 2)
        .limit(20)
    )
    pairs = pairs.withColumn(
        "pair_id", F.concat_ws("|", "url_a", "url_b")
    ).cache()

    # per-side entity tables with the enriched-set columns the rule join uses
    onto_sets = onto.select(
        "class_id",
        F.transform("aliases", F.lower).alias("eq_names"),
        F.concat(F.array(F.col("class_id")), F.col("synonyms")).alias("eq_xrefs"),
        F.col("subClassOf").alias("parent_xrefs"),
    )

    def side(url_col, side_url):
        ents = (
            pairs.select("pair_id", F.col(url_col).alias("url"))
            .join(doc_ents, "url")
            .join(F.broadcast(onto_sets), "class_id")
        )
        w = Window.partitionBy("pair_id").orderBy("class_id")
        return ents.withColumn("idx", F.row_number().over(w) - 1).select(
            "pair_id",
            "idx",
            F.col("class_id"),
            F.lit("Protein").alias("obj_type"),
            "eq_xrefs",
            "eq_names",
            "parent_xrefs",
        )

    left = side("url_a", "a")
    right = side("url_b", "b")

    cells = prelim_alignments(
        left.drop("class_id"), right.drop("class_id")
    ).withColumnRenamed("rule_score", "score")
    matches = align_pairs(cells.filter(F.col("score") > 0))
    return pairs, left, right, matches


def test_shared_class_recovery(spark, aligned):
    pairs, left, right, matches = aligned
    # map matched (i, j) back to class ids
    m = (
        matches.join(
            left.select("pair_id", F.col("idx").alias("i"), F.col("class_id").alias("cls_a")),
            ["pair_id", "i"],
        )
        .join(
            right.select("pair_id", F.col("idx").alias("j"), F.col("class_id").alias("cls_b")),
            ["pair_id", "j"],
        )
    )
    got = m.filter(F.col("cls_a") == F.col("cls_b")).select(
        "pair_id", "cls_a"
    ).distinct()
    # gold: every shared class in every candidate pair
    gold = (
        left.select("pair_id", "class_id")
        .join(right.select("pair_id", "class_id"), ["pair_id", "class_id"])
        .distinct()
    )
    tp = got.join(gold, ["pair_id", got["cls_a"] == gold["class_id"]]).count() if False else (
        got.join(gold, (got["pair_id"] == gold["pair_id"]) & (got["cls_a"] == gold["class_id"])).count()
    )
    n_gold = gold.count()
    n_got_all = m.select("pair_id", "i", "j").distinct().count()
    recall = tp / n_gold
    precision_same_class = got.count() / n_got_all if n_got_all else 0.0
    assert n_gold > 0
    assert recall >= 0.95, (tp, n_gold)
    # xref-tier matches dominate: nearly every accepted match is the true one
    assert precision_same_class >= 0.9


def test_pair_scores_positive(spark, aligned):
    pairs, left, right, matches = aligned
    sizes = (
        left.groupBy("pair_id").agg(F.count(F.lit(1)).alias("n1"))
        .join(right.groupBy("pair_id").agg(F.count(F.lit(1)).alias("n2")), "pair_id")
    )
    scores = aggregate_pair_scores(matches, sizes)
    rows = scores.collect()
    assert rows and all(0.0 < r["align_score"] <= 1.5 for r in rows)
