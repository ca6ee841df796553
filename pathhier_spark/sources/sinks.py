"""Sinks: TSV match files (S11) and GMT gene-set files (S12).

S11 mirrors pw_aligner.py:453-483 _write_matches_to_file: group matches by
kb_id, keep the top-10 by score, join display names/definitions, write a
7-column TSV. S12 mirrors pathhier/utils/pathway_utils.py:432-446
write_gene_sets_to_gmt: one line per set, 'name<TAB>origin<TAB>sym1<TAB>...'.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pathhier_spark import config


def write_match_tsv(
    matches: DataFrame,
    kb_names: DataFrame,
    pw_names: DataFrame,
    path: str,
    top_n: int = config.KEEP_TOP_N_MATCHES,
) -> None:
    """matches(kb_id, pw_id, score[, label]); kb_names(kb_id, kb_name,
    kb_def); pw_names(pw_id, pw_name, pw_def). Writes TSV with header,
    top-10 per kb_id sorted desc (S11)."""
    w = Window.partitionBy("kb_id").orderBy(F.col("score").desc(), F.col("pw_id"))
    top = (
        matches.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= top_n)
        .drop("rn")
    )
    out = (
        top.join(F.broadcast(kb_names), "kb_id", "left")
        .join(F.broadcast(pw_names), "pw_id", "left")
        .select(
            "kb_id", "kb_name", "kb_def", "pw_id", "pw_name", "pw_def",
            F.round("score", 6).alias("score"),
        )
        .orderBy("kb_id", F.col("score").desc(), "pw_id")
    )
    (
        out.coalesce(1)
        .write.mode("overwrite")
        .option("sep", "\t")
        .option("header", True)
        .csv(path)
    )


def write_gmt(gene_sets: DataFrame, path: str) -> None:
    """gene_sets(name, origin, symbols ARRAY<STRING>) -> GMT text lines
    (S12): name \t origin \t sym1 \t sym2 ... Symbols sorted for
    determinism (generate_gene_sets.py:445-469 sorts the union)."""
    lines = gene_sets.select(
        F.concat_ws(
            "\t",
            F.col("name"),
            F.col("origin"),
            F.concat_ws("\t", F.sort_array(F.array_distinct(F.col("symbols")))),
        ).alias("value")
    ).orderBy("value")
    lines.coalesce(1).write.mode("overwrite").text(path)


def gene_sets_from_components(
    nodes: DataFrame,
    components: DataFrame,
    *,
    min_size: int = config.GENE_SET_MINIMUM_SIZE,
) -> DataFrame:
    """A7 (generate_gene_sets.py:445-469): per component, the sorted distinct
    union of member xref symbols; keep sets of >= min_size entities
    (constants.py:238). nodes(uid, xrefs ARRAY, name); components(uid,
    component)."""
    joined = nodes.join(components, "uid")
    return (
        joined.groupBy("component")
        .agg(
            F.count(F.lit(1)).alias("n_entities"),
            F.sort_array(
                F.array_distinct(F.flatten(F.collect_list("xrefs")))
            ).alias("symbols"),
            F.min("name").alias("name"),
        )
        .filter(F.col("n_entities") >= min_size)
        .select(
            "name",
            F.lit("pathhier_spark").alias("origin"),
            "symbols",
            "n_entities",
        )
    )
