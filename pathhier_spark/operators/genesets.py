"""Constrained agglomerative clustering for gene-set generation (G6).

Mirrors pathhier/generate_gene_sets.py:294-408: walk candidate pairs in
descending fused-score order, merging clusters unless (a) the two items are
already co-clustered, or (b) the merge would put two pathways from the same
KB into one cluster (constraint filter, generate_gene_sets.py:248-292);
stop when the top remaining score < threshold (0.25); finally add qualifying
singletons (>= GENE_SET_MINIMUM_SIZE entities, constants.py:238).

The pair list is cluster-corpus sized (pathway pairs, not document pairs) —
small by construction — so the greedy walk runs on the driver over collected
rows, exactly like the reference; the expensive part (scoring the pairs) is
the distributed stage upstream (cluster_model.py:370-425 -> J9 set-similarity
join, here `score_pathway_pairs`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pathhier_spark import config
from pathhier_spark.functions.text import jaccard, set_overlap


def score_pathway_pairs(
    members: DataFrame,
    *,
    id_col: str = "pathway_id",
    kb_col: str = "kb",
    ents_col: str = "entities",
) -> DataFrame:
    """J9 (cluster_model.py:370-425): all cross-KB pathway pairs scored by
    entity-set jaccard and Dice-like overlap; fused = mean(sim, overlap)
    (generate_gene_sets.py:317-320 uses mean(mean(sim, overlap), align) —
    without an alignment channel the fused score is the inner mean).
    Output: (id_a, kb_a, id_b, kb_b, sim, overlap, fused)."""
    a = members.select(
        F.col(id_col).alias("id_a"), F.col(kb_col).alias("kb_a"),
        F.col(ents_col).alias("ents_a"),
    )
    b = members.select(
        F.col(id_col).alias("id_b"), F.col(kb_col).alias("kb_b"),
        F.col(ents_col).alias("ents_b"),
    )
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .filter(F.col("kb_a") != F.col("kb_b"))
        .select(
            "id_a", "kb_a", "id_b", "kb_b",
            jaccard(F.col("ents_a"), F.col("ents_b")).alias("sim"),
            set_overlap(F.col("ents_a"), F.col("ents_b")).alias("overlap"),
        )
        .withColumn("fused", (F.col("sim") + F.col("overlap")) / 2.0)
    )


def constrained_clustering(
    pairs: list[tuple[float, str, str, str, str]],
    *,
    threshold: float = config.SIMSCORE_THRESHOLD,
) -> dict[str, int]:
    """Driver-side greedy walk. pairs: (score, id_a, kb_a, id_b, kb_b).
    Returns item -> cluster_id. Deterministic: ties broken by (id_a, id_b)."""
    ordered = sorted(pairs, key=lambda p: (-p[0], p[1], p[3]))
    cluster_of: dict[str, int] = {}
    members: dict[int, set[str]] = {}
    kbs: dict[int, set[str]] = {}
    next_id = 0

    def _new_cluster(item: str, kb: str) -> int:
        nonlocal next_id
        cid = next_id
        next_id += 1
        cluster_of[item] = cid
        members[cid] = {item}
        kbs[cid] = {kb}
        return cid

    for score, id_a, kb_a, id_b, kb_b in ordered:
        if score < threshold:
            break
        ca = cluster_of.get(id_a)
        cb = cluster_of.get(id_b)
        if ca is not None and ca == cb:
            continue  # already co-clustered (constraint a)
        if ca is None and cb is None:
            if kb_a == kb_b:
                continue
            cid = _new_cluster(id_a, kb_a)
            cluster_of[id_b] = cid
            members[cid].add(id_b)
            kbs[cid].add(kb_b)
        elif ca is not None and cb is None:
            if kb_b in kbs[ca]:
                continue  # same-KB-twice (constraint b)
            cluster_of[id_b] = ca
            members[ca].add(id_b)
            kbs[ca].add(kb_b)
        elif cb is not None and ca is None:
            if kb_a in kbs[cb]:
                continue
            cluster_of[id_a] = cb
            members[cb].add(id_a)
            kbs[cb].add(kb_a)
        else:
            if kbs[ca] & kbs[cb]:
                continue
            # merge smaller into larger (deterministic: lower id wins on tie)
            keep, drop = (ca, cb) if (len(members[ca]), -ca) >= (len(members[cb]), -cb) else (cb, ca)
            for it in members[drop]:
                cluster_of[it] = keep
            members[keep] |= members.pop(drop)
            kbs[keep] |= kbs.pop(drop)
    return cluster_of


def cluster_pathways(
    spark,
    scored_pairs: DataFrame,
    all_items: DataFrame,
    *,
    threshold: float = config.SIMSCORE_THRESHOLD,
    score_col: str = "fused",
) -> DataFrame:
    """Distributed wrapper: collect the (small) scored pair list, run the
    greedy walk, broadcast assignments back; unclustered items become
    singletons with their own cluster id (generate_gene_sets.py:357-381).
    all_items: (pathway_id, kb)."""
    rows = scored_pairs.select(
        score_col, "id_a", "kb_a", "id_b", "kb_b"
    ).collect()
    assign = constrained_clustering(
        [(r[0], r[1], r[2], r[3], r[4]) for r in rows], threshold=threshold
    )
    n_clusters = max(assign.values()) + 1 if assign else 0
    items = [r["pathway_id"] for r in all_items.select("pathway_id").collect()]
    singles = {}
    nxt = n_clusters
    for it in sorted(items):
        if it not in assign:
            singles[it] = nxt
            nxt += 1
    assign.update(singles)
    adf = spark.createDataFrame(
        sorted(assign.items()), "pathway_id string, cluster_id long"
    )
    return all_items.join(F.broadcast(adf), "pathway_id")
