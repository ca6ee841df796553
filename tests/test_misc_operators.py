"""Textstats, multimodal plumbing, bootstrap loop."""

import pytest
from pyspark.sql import functions as F

from pathhier_spark.operators.bootstrap import LRModel, fit_lr, split_train_dev
from pathhier_spark.operators.multimodal import (
    FEATURE_DIM,
    extract_media_features,
    sample_video_frames,
    synthetic_media,
)
from pathhier_spark.operators.textstats import (
    with_fingerprint,
    with_lang_id,
    with_quality_features,
    with_token_counts,
)


def test_quality_features(spark):
    df = spark.createDataFrame(
        [(0, "the quick brown fox"), (1, ""), (2, "!!! ???")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in with_quality_features(df).collect()}
    assert rows[0]["n_tokens"] == 4
    assert rows[0]["stopword_ratio"] == pytest.approx(0.25)  # 'the'
    assert rows[0]["punct_ratio"] == 0.0
    assert rows[1]["n_tokens"] == 0 and rows[1]["quality_score"] == pytest.approx(0.3)
    assert rows[2]["punct_ratio"] > 0.5
    assert all(0.0 <= r["quality_score"] <= 1.0 for r in rows.values())


def test_lang_id(spark):
    df = spark.createDataFrame(
        [
            (0, "the cat and the dog is in that house"),
            (1, "der hund und die katze ist nicht hier"),
            (2, "le chat et la maison est une belle"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r["lang_pred"] for r in with_lang_id(df).collect()}
    assert rows == {0: "en", 1: "de", 2: "fr"}


def test_token_counts(spark):
    df = spark.createDataFrame([(0, "aa bbbb cccccccc")], "doc_id long, text string")
    r = with_token_counts(df).collect()[0]
    assert r["ws_tokens"] == 3
    assert r["bpe_tokens_est"] == 1 + 1 + 2


def test_fingerprint_stability(spark):
    base = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"
    df = spark.createDataFrame(
        [(0, base), (1, base), (2, "totally different words here now ok yes no")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r["fingerprint"] for r in with_fingerprint(df).collect()}
    assert rows[0] == rows[1] != rows[2]


def test_media_features_plumbing(spark):
    media = synthetic_media(spark, n=30)
    out = extract_media_features(media)
    rows = out.collect()
    assert len(rows) == 30
    assert all(len(r["features"]) == FEATURE_DIM for r in rows)
    assert all(0.0 <= x <= 1.0 for r in rows for x in r["features"])
    # deterministic across runs
    rows2 = extract_media_features(media).collect()
    assert {r["media_id"]: r["checksum"] for r in rows} == {
        r["media_id"]: r["checksum"] for r in rows2
    }


def test_video_frame_sampling(spark):
    media = synthetic_media(spark, n=30)
    frames = sample_video_frames(media, every_ms=1000)
    per_vid = (
        frames.groupBy("media_id").agg(F.count("*").alias("n")).collect()
    )
    assert per_vid and all(r["n"] == 5 for r in per_vid)  # 5000ms / 1000


def test_fit_lr_separates():
    # token_jaccard high -> label 1
    rows = []
    for i in range(20):
        x = i / 19.0
        rows.append(([0.0, x, 0.0, 0.0, 0.0], 1 if x > 0.5 else 0))
    m = fit_lr(rows)
    assert isinstance(m, LRModel)
    import math

    def p(x):
        z = sum(w * v for w, v in zip(m.coef, [0.0, x, 0.0, 0.0, 0.0])) + m.intercept
        return 1 / (1 + math.exp(-z))

    assert p(0.9) > 0.7 and p(0.1) < 0.3


def test_split_seeded():
    rows = [{"i": i} for i in range(100)]
    t1, d1 = split_train_dev(rows, 0.3, seed=7)
    t2, d2 = split_train_dev(rows, 0.3, seed=7)
    assert t1 == t2 and d1 == d2 and len(d1) == 30


def test_operators_handle_empty_inputs(spark):
    """Empty-input sweep: every operator family returns an empty result
    cleanly instead of crashing (a corpus shard or filtered stage can
    legitimately be empty at scale)."""
    from pathhier_spark.operators.canonicalize import assign_local_ids
    from pathhier_spark.operators.dedup import (
        exact_dedup,
        minhash_dedup,
        segment_dedup,
        simhash,
    )
    from pathhier_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
        lsh_bucket_topk,
    )
    from pathhier_spark.operators.textstats import with_quality_features

    edocs = spark.createDataFrame([], "doc_id long, text string")
    eq = spark.createDataFrame([], "q_id long, embedding array<double>")
    ec = spark.createDataFrame([], "c_id long, embedding array<double>")
    ecomp = spark.createDataFrame([], "node string, component string")
    assert exact_dedup(edocs).count() == 0
    assert simhash(edocs).count() == 0
    assert segment_dedup(edocs).count() == 0
    assert minhash_dedup(edocs).count() == 0
    assert with_quality_features(edocs).count() == 0
    assert brute_force_topk(eq, ec, k=3).count() == 0
    assert lsh_bucket_topk(eq, ec, k=3).count() == 0
    assert ivf_topk(eq, ec, k=3).count() == 0
    assert assign_local_ids(ecomp).count() == 0
    # schema is preserved on the typed-empty paths
    assert lsh_bucket_topk(eq, ec, k=3).columns == ["q_id", "c_id", "cos", "nn_rank"]
