"""Pairwise alignment: rule-tier scoring + greedy bipartite matching.

Reproduces the reference's per-pathway-pair alignment kernel:
  * rule tiers (pathhier/pathway_aligner.py:387-453): score 1.0 if expanded
    xref sets intersect and types match; 0.75 if expanded name sets intersect
    and types match; 0.5 if names intersect; 0.25 if parent xrefs intersect
    and types match; Group-vs-non-Group pairs are type-restricted (forced 0).
  * similarity fusion (pathway_aligner.py:455-504): cosine channel clamped at
    >= 0, overridden upward by the rule score, zeroed on type restriction.
  * greedy matching (pathway_aligner.py:506-562): pre-accept all cells
    >= 0.75, then repeatedly take the argmax, co-accept ties within
    epsilon=0.01 along its row/col, zero the row+col, stop when max < 0.5.
  * pair score (pathway_aligner.py:769-772):
    mean(match scores) * n_matches / (0.5 * (n1 + n2)).

The greedy loop is inherently sequential per pair but independent across
pairs — exactly the applyInPandas shape: Spark distributes pairs, numpy runs
the small per-pair matrix loop vectorized. No per-row Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pathhier_spark import config


def rule_tier_score(
    xrefs_match: Column,
    names_match: Column,
    parents_match: Column,
    same_type: Column,
    type_restricted: Column,
) -> Column:
    """The tier cascade as a coalesce chain (continue-semantics preserved:
    tiers are evaluated in priority order)."""
    return (
        F.when(type_restricted, F.lit(0.0))
        .when(xrefs_match & same_type, F.lit(1.0))
        .when(names_match & same_type, F.lit(0.75))
        .when(names_match, F.lit(0.5))
        .when(parents_match & same_type, F.lit(0.25))
        .otherwise(F.lit(0.0))
    )


def prelim_alignments(
    left: DataFrame,
    right: DataFrame,
    pair_col: str = "pair_id",
) -> DataFrame:
    """Within-pair entity cross product scored by the rule tiers. Inputs
    carry (pair_id, idx, obj_type, eq_xrefs, eq_names, parent_xrefs) per
    entity, where eq_xrefs/eq_names are the pre-unioned expanded sets
    (pathway_aligner.py:403-431 builds these unions; at scale they arrive
    pre-joined from the enrichment dictionary as array columns)."""
    l = left.select(
        F.col(pair_col),
        F.col("idx").alias("i"),
        F.col("obj_type").alias("lt"),
        F.col("eq_xrefs").alias("lx"),
        F.col("eq_names").alias("ln"),
        F.col("parent_xrefs").alias("lp"),
    )
    r = right.select(
        F.col(pair_col),
        F.col("idx").alias("j"),
        F.col("obj_type").alias("rt"),
        F.col("eq_xrefs").alias("rx"),
        F.col("eq_names").alias("rn"),
        F.col("parent_xrefs").alias("rp"),
    )
    joined = l.join(r, pair_col)
    type_restricted = (F.col("lt") == "Group") != (F.col("rt") == "Group")
    return joined.select(
        pair_col,
        "i",
        "j",
        rule_tier_score(
            F.arrays_overlap("lx", "rx"),
            F.arrays_overlap("ln", "rn"),
            F.arrays_overlap("lp", "rp"),
            F.col("lt") == F.col("rt"),
            type_restricted,
        ).alias("rule_score"),
        type_restricted.alias("type_restricted"),
    )


def fused_similarity_cells(
    left_emb: DataFrame,
    right_emb: DataFrame,
    rule_cells: DataFrame,
    *,
    pair_col: str = "pair_id",
    emb_col: str = "emb",
    top_col: str = "top_emb",
) -> DataFrame:
    """The embedding similarity channel fused with the rule tiers —
    pathway_aligner.py:455-504 `_run_graph_aligner` as DataFrame ops, and
    the functional counterpart of the reference's M4 NN channel (the NN
    model's learned entity encodings are out of scope — 2018 allennlp +
    pretrained PubMed vectors — but the channel's role in the fusion is
    reproduced with BOW embeddings from operators.embeddings):

      1. per-entity vector = ent_embedding ++ top_embedding (concat,
         pathway_aligner.py:481-486);
      2. cell score = cosine over the within-pair cross product, negatives
         clamped to 0 (line 494);
      3. rule-tier alignments override upward: max(cos, rule_score)
         (lines 497-498);
      4. type-restricted cells forced to 0 even if cosine is high
         (lines 500-502).

    Inputs: left_emb/right_emb (pair_id, idx, emb ARRAY<DOUBLE>,
    top_emb ARRAY<DOUBLE>), rule_cells = prelim_alignments output.
    Output: (pair_id, i, j, score) — ready for align_pairs."""
    from pathhier_spark.operators.similarity import cosine_from_norms, norm_expr

    l = left_emb.select(
        F.col(pair_col),
        F.col("idx").alias("i"),
        F.concat(F.col(emb_col), F.col(top_col)).alias("ev_l"),
    ).withColumn("_nl", norm_expr(F.col("ev_l")))
    r = right_emb.select(
        F.col(pair_col),
        F.col("idx").alias("j"),
        F.concat(F.col(emb_col), F.col(top_col)).alias("ev_r"),
    ).withColumn("_nr", norm_expr(F.col("ev_r")))
    cells = l.join(r, pair_col).select(
        pair_col, "i", "j",
        F.greatest(
            cosine_from_norms(
                F.col("ev_l"), F.col("ev_r"), F.col("_nl"), F.col("_nr")
            ),
            F.lit(0.0),
        ).alias("cos"),
    )
    return cells.join(rule_cells, [pair_col, "i", "j"], "left").select(
        pair_col, "i", "j",
        F.when(F.coalesce(F.col("type_restricted"), F.lit(False)), F.lit(0.0))
        .otherwise(
            F.greatest(F.col("cos"), F.coalesce(F.col("rule_score"), F.lit(0.0)))
        )
        .alias("score"),
    )


def greedy_align_matrix(sim: np.ndarray) -> list[tuple[int, int, float]]:
    """pathway_aligner.py:506-562 _greedy_align, including the transpose-
    when-flipped behavior and row-major argmax tie order. Returns
    (i, j, score) matches in acceptance order (coordinates in the original
    orientation).

    Documented divergence: the reference writes `score_mat[:][y_ind] = 0.`
    (pathway_aligner.py:532,553) which in numpy zeroes ROW y_ind, not column
    y_ind — its columns are never actually cleared. We implement the
    intended semantics (zero row x and column y) per SURVEY.md §7.3."""
    n1, n2 = sim.shape
    flip = n1 < n2
    mat = sim.T.copy() if flip else sim.copy()

    matches: list[tuple[int, int, float]] = []
    pos = np.transpose(np.nonzero(mat >= 0.75))
    for x, y in pos:
        matches.append((int(x), int(y), float(mat[x][y])))
    for x, y in pos:
        mat[x, :] = 0.0
        mat[:, y] = 0.0

    while mat.size and np.max(mat) > config.MIN_ALIGNMENT_THRESHOLD:
        max_val = float(np.max(mat))
        x, y = np.unravel_index(int(mat.argmax()), mat.shape)
        matches.append((int(x), int(y), max_val))
        mat[x, y] = 0.0
        eps = config.ALIGNMENT_SCORE_EPSILON
        for col, v in enumerate(mat[x, :]):
            if v >= max_val - eps:
                matches.append((int(x), int(col), float(v)))
        for row, v in enumerate(mat[:, y]):
            if v >= max_val - eps:
                matches.append((int(row), int(y), float(v)))
        mat[x, :] = 0.0
        mat[:, y] = 0.0

    if flip:
        matches = [(j, i, s) for i, j, s in matches]
    return matches


def pair_alignment_score(match_scores: list[float], n1: int, n2: int) -> float:
    """pathway_aligner.py:769-772."""
    if not match_scores or (n1 + n2) == 0:
        return 0.0
    return float(np.mean(match_scores)) * len(match_scores) / (0.5 * (n1 + n2))


def align_pairs(
    cells: DataFrame,
    *,
    pair_col: str = "pair_id",
    score_col: str = "score",
) -> DataFrame:
    """Distributed greedy alignment: input is the fused similarity cells
    (pair_id, i, j, score) — sparse; missing cells are 0. applyInPandas
    groups by pair, rebuilds the small dense matrix, runs the greedy kernel.

    Output: one row per accepted match (pair_id, i, j, match_score) plus the
    aggregate is computed downstream with pair_alignment_score semantics.
    """

    def _kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pid = pdf["pair_id"].iloc[0]
        n1 = int(pdf["i"].max()) + 1
        n2 = int(pdf["j"].max()) + 1
        mat = np.zeros((n1, n2))
        mat[pdf["i"].to_numpy(), pdf["j"].to_numpy()] = pdf[score_col].to_numpy()
        matches = greedy_align_matrix(mat)
        if not matches:
            return pd.DataFrame(columns=["pair_id", "i", "j", "match_score"])
        out = pd.DataFrame(matches, columns=["i", "j", "match_score"])
        out.insert(0, "pair_id", pid)
        return out

    return cells.groupBy(pair_col).applyInPandas(
        _kernel, schema=f"{pair_col} string, i int, j int, match_score double"
    )


def aggregate_pair_scores(
    matches: DataFrame, sizes: DataFrame, pair_col: str = "pair_id"
) -> DataFrame:
    """A3 (pathway_aligner.py:769-772) as a grouped aggregate: sizes carries
    (pair_id, n1, n2)."""
    agg = matches.groupBy(pair_col).agg(
        F.avg("match_score").alias("mean_score"),
        F.count(F.lit(1)).alias("n_matches"),
    )
    return agg.join(sizes, pair_col).select(
        pair_col,
        (
            F.col("mean_score")
            * F.col("n_matches")
            / (0.5 * (F.col("n1") + F.col("n2")))
        ).alias("align_score"),
        "n_matches",
    )


def mutual_best_match(
    df: DataFrame,
    left_col: str,
    right_col: str,
    score_col: str,
) -> DataFrame:
    """Reciprocal-best-match alignment: keep (left, right) pairs where
    each side is the OTHER's argmax — the classic high-precision
    ontology/KG matcher (PARIS-style mutual-best, the bidirectional
    strictness the reference's greedy matcher (T5/G7, this module)
    relaxes one side at a time). Unlike greedy matching it needs no
    sequential passes: two combiner-friendly argmax aggregations + one
    equi-join, fully parallel.

    Determinism: argmax via min(struct(-score, right)) — a partial-agg
    (combiner) shape, no window over the candidate table; ties break on
    the smallest partner id, and callers should pass an already-ROUNDED
    score so ties are decided identically across engines (rounding
    first, then tie-breaking, is the engine-portable order). The -x
    negation round-trips exactly in IEEE.

    Scale shape: two groupBys keyed on the two entity-id columns and one
    (left,right) equi-join — all combiner-friendly; nothing corpus-sized
    survives past the first agg. Output: (left, right, score), the
    score from the left argmax row."""
    neg = (-F.col(score_col)).alias("ns")
    best_l = (
        df.groupBy(left_col)
        .agg(F.min(F.struct(neg, F.col(right_col).alias("p"))).alias("b"))
        .select(
            left_col,
            F.col("b.p").alias(right_col),
            (-F.col("b.ns")).alias(score_col),
        )
    )
    best_r = (
        df.groupBy(right_col)
        .agg(F.min(F.struct(neg, F.col(left_col).alias("p"))).alias("b"))
        .select(F.col("b.p").alias(left_col), right_col)
    )
    return best_l.join(best_r, [left_col, right_col])
