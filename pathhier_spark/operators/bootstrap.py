"""Bootstrap self-training loop (pathhier/pw_aligner.py:485-530, M3).

Driver-orchestrated loop of Spark jobs:
  seed labels -> [fit LR on collected (small) training set
                  -> score all candidate pairs distributed (broadcast coefs)
                  -> partition pos/neg at SIMSCORE_THRESHOLD
                  -> keep top KEEP_TOP_N_PERCENT_MATCHES/2 of each
                  -> anti-join vs already-added pairs
                  -> seeded split, append to the training table] x N

Differences from the reference, by design:
  * the LR is fit on the driver with sklearn-free closed-form-ish gradient
    descent (5 features; the training set is tiny by construction — the
    distributed part is inference, which is a broadcast dot product, see
    linking.lr_score). The reference uses sklearn LogisticRegressionCV
    (pw_aligner.py:512) — CV regularization-path selection is not semantics
    we need to reproduce bit-exact; thresholds and keep-fractions are.
  * every random choice is seeded (the reference's train_test_split is
    unseeded — SURVEY.md §7.3).
"""

from __future__ import annotations

import math
import random
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pathhier_spark import config
from pathhier_spark.operators.linking import FEATURE_COLS, lr_score


@dataclass
class LRModel:
    coef: list[float]
    intercept: float


def fit_lr(rows: list[tuple[list[float], int]], *, iters: int = 300, lr: float = 0.5) -> LRModel:
    """Plain batch gradient-descent logistic regression on the driver.
    Deterministic (fixed init, fixed iteration count)."""
    if not rows:
        return LRModel([0.0] * len(FEATURE_COLS), 0.0)
    n_feat = len(rows[0][0])
    w = [0.0] * n_feat
    b = 0.0
    n = len(rows)
    for _ in range(iters):
        gw = [0.0] * n_feat
        gb = 0.0
        for x, y in rows:
            z = sum(wi * xi for wi, xi in zip(w, x)) + b
            p = 1.0 / (1.0 + math.exp(-max(min(z, 35.0), -35.0)))
            d = p - y
            for i in range(n_feat):
                gw[i] += d * x[i]
            gb += d
        w = [wi - lr * gi / n for wi, gi in zip(w, gw)]
        b = b - lr * gb / n
    return LRModel(w, b)


def collect_training_rows(train_df: DataFrame, label_col: str = "label") -> list:
    rows = train_df.select(*FEATURE_COLS, label_col).collect()
    return [([r[c] for c in FEATURE_COLS], int(r[label_col])) for r in rows]


def split_train_dev(
    rows: list[dict], dev_frac: float, seed: int
) -> tuple[list[dict], list[dict]]:
    """Seeded stand-in for the reference's unseeded train_test_split
    (pathway_utils.py:332-361)."""
    rng = random.Random(seed)
    shuffled = rows[:]
    rng.shuffle(shuffled)
    n_dev = int(len(shuffled) * dev_frac)
    return shuffled[n_dev:], shuffled[:n_dev]


def bootstrap_loop(
    spark,
    featurized_candidates: DataFrame,
    seed_train: DataFrame,
    *,
    n_iterations: int = config.NUM_BOOTSTRAP_MODELS,
    keep_frac: float = config.KEEP_TOP_N_PERCENT_MATCHES,
    threshold: float = config.SIMSCORE_THRESHOLD,
    seed: int = 42,
) -> tuple[LRModel, DataFrame]:
    """Run the bootstrap loop.

    featurized_candidates: (s_id, t_id, <FEATURE_COLS>) — all candidate
    pairs with features, produced by the linking stage. Cached by caller.
    seed_train: (<FEATURE_COLS>, label) seed training rows.

    Returns the final model and the accumulated training DataFrame. The
    `added` anti-join mirrors pw_aligner.py:495,521-528; keep-top fractions
    mirror _keep_new_predictions (pw_aligner.py:328-341).
    """
    train = seed_train.select(*FEATURE_COLS, "label", F.lit("seed").alias("provenance"))
    added = featurized_candidates.select("s_id", "t_id").limit(0)
    model = LRModel([0.0] * len(FEATURE_COLS), 0.0)

    for it in range(n_iterations):
        model = fit_lr(collect_training_rows(train))
        scored = lr_score(featurized_candidates, model.coef, model.intercept)
        fresh = scored.join(added, ["s_id", "t_id"], "left_anti")
        pos = fresh.filter(F.col("p1") > threshold)
        neg = fresh.filter((1.0 - F.col("p1")) > threshold)
        n_pos = pos.count()
        n_neg = neg.count()
        keep_pos = int(keep_frac * n_pos / 2)
        keep_neg = int(keep_frac * n_neg / 2)
        # at test scale the 0.25% fraction rounds to zero — keep at least one
        # per side so the loop makes progress (documented test-scale floor)
        keep_pos = max(keep_pos, 1 if n_pos else 0)
        keep_neg = max(keep_neg, 1 if n_neg else 0)
        new_pos = pos.orderBy(F.col("p1").desc(), "s_id", "t_id").limit(keep_pos)
        new_neg = neg.orderBy(F.col("p1").asc(), "s_id", "t_id").limit(keep_neg)
        new_rows = new_pos.select(
            "s_id", "t_id", *FEATURE_COLS, F.lit(1).alias("label")
        ).union(
            new_neg.select("s_id", "t_id", *FEATURE_COLS, F.lit(0).alias("label"))
        )
        if new_rows.limit(1).count() == 0:
            break
        added = added.union(new_rows.select("s_id", "t_id")).distinct().localCheckpoint()
        train = train.union(
            new_rows.select(
                *FEATURE_COLS, "label", F.lit(f"lr_iter{it}").alias("provenance")
            )
        ).localCheckpoint()

    # final model drops bootstrap-generated rows (pw_aligner.py:587, P8)
    final_train = train.filter(~F.col("provenance").startswith("lr_iter"))
    model = fit_lr(collect_training_rows(final_train))
    return model, train
