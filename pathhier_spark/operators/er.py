"""Entity resolution: multi-pass blocking -> edit-distance verify ->
connected-components clustering -> canonical record — the record-linkage
funnel (Fellegi-Sunter shape) composing the repo's ER pieces end to end:
q135 evaluates blocking quality, q66 fuzzy-joins vocabularies, q31/q18
cluster; this runs the whole chain as ONE operator the way the
reference's aligner chains candidate selection -> scoring -> merge
(pathhier/pw_aligner.py:208-280's loop, recast distributed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pathhier_spark.functions.text import WS_SPLIT_RE


def er_resolve(
    records: DataFrame,
    *,
    id_col: str = "rec_id",
    name_col: str = "name",
    max_edit: int = 1,
    max_block: int | None = None,
) -> DataFrame:
    """Resolve duplicate records by name. Stages:

    1. MULTI-PASS BLOCKING — two complementary deterministic keys per
       record: (last token : first char of first token) survives a
       corrupted first-token tail, (first token : last token) survives
       a corrupted middle; a true pair only needs to share ONE pass's
       key (union of passes, the standard multi-pass blocking recipe).
       Blocking is the quadratic-work firewall: candidate pairs are sum
       of per-block C(n,2), never corpus C(n,2). Pass max_block to cap
       pathological blocks (cap mirrors q11's LSH bucket cap; capped
       blocks are DROPPED, trading recall for a hard cost bound —
       production hygiene for adversarial keys).
    2. VERIFY — exact Levenshtein <= max_edit on the candidate pairs
       only (JVM built-in, no cross product anywhere).
    3. CLUSTER — undirected CC over verified matches (large-star/
       small-star kernel via canonicalize.connected_components), so
       transitive matches (A~B~C) resolve to one entity.
    4. CANONICALIZE — entity_id = min rec_id of the cluster;
       is_canonical marks the surviving record.

    Output: (rec_id, entity_id, cluster_size, is_canonical), one row
    per input record (singletons included)."""
    from pathhier_spark.operators.canonicalize import connected_components

    recs = records.select(
        F.col(id_col).alias("rec_id"), F.col(name_col).alias("name")
    )
    # the CC detour rides the 20-char zero-pad string idiom (q31), whose
    # order matches numeric order ONLY for non-negative integers up to
    # 19 digits — validate instead of silently electing a wrong canonical
    # (lpad('-1') > lpad('-2') lexicographically) or NULLing string ids
    id_type = records.schema[id_col].dataType.typeName()
    if id_type not in ("byte", "short", "integer", "long"):
        raise ValueError(
            f"er_resolve: id column {id_col!r} must be an integer type "
            f"(got {id_type}); map string ids to int64 first"
        )
    lo = recs.agg(F.min("rec_id").alias("lo")).collect()[0]["lo"]
    if lo is not None and lo < 0:
        raise ValueError(
            "er_resolve: negative record ids break the zero-pad ordering "
            "the min-id canonicalization relies on; shift ids to >= 0"
        )
    toks = F.filter(
        F.split(F.col("name"), WS_SPLIT_RE), lambda t: t != ""
    )
    keyed = recs.select("rec_id", "name", toks.alias("toks")).filter(
        F.size("toks") > 0
    )
    k1 = F.concat(
        F.element_at("toks", -1),
        F.lit(":"),
        F.substring(F.element_at("toks", 1), 1, 1),
    )
    k2 = F.concat(
        F.element_at("toks", 1), F.lit(":"), F.element_at("toks", -1)
    )
    kall = keyed.select("rec_id", "name", k1.alias("k")).union(
        keyed.select("rec_id", "name", k2.alias("k"))
    )
    if max_block is not None:
        small = (
            kall.groupBy("k")
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") <= max_block)
            .select("k")
        )
        kall = kall.join(small, "k", "left_semi")
    cands = (
        kall.select(
            F.col("k"),
            F.col("rec_id").alias("ra"),
            F.col("name").alias("na"),
        )
        .join(
            kall.select(
                F.col("k"),
                F.col("rec_id").alias("rb"),
                F.col("name").alias("nb"),
            ),
            "k",
        )
        .filter(F.col("ra") < F.col("rb"))
        .select("ra", "rb", "na", "nb")
        .distinct()
    )
    matched = cands.filter(
        F.levenshtein("na", "nb") <= F.lit(int(max_edit))
    ).select("ra", "rb")
    pad = lambda c: F.lpad(c.cast("string"), 20, "0")  # noqa: E731
    edges = matched.select(
        pad(F.col("ra")).alias("xref_a"), pad(F.col("rb")).alias("xref_b")
    )
    nodes = recs.select(pad(F.col("rec_id")).alias("xref_a")).select(
        "xref_a", F.col("xref_a").alias("xref_b")
    )
    comp = connected_components(edges.union(nodes)).select(
        F.col("node").cast("bigint").alias("rec_id"),
        F.col("component").cast("bigint").alias("entity_id"),
    )
    sizes = comp.groupBy("entity_id").agg(
        F.count(F.lit(1)).cast("long").alias("cluster_size")
    )
    return comp.join(sizes, "entity_id").select(
        "rec_id",
        "entity_id",
        "cluster_size",
        (F.col("rec_id") == F.col("entity_id")).alias("is_canonical"),
    )
