"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship KG query: documents -> token-triple extraction ->
                 entity linking against the part-name dictionary -> linked
                 (subj, pred, obj) triples (SURVEY.md §3.2 / §7.1 step 3).
queries()      — one entry per implemented operator family (SURVEY.md §2).
oracle_sql()   — DuckDB-equivalent SQL for each query.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pathhier_spark import queries as q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: extract (subj, pred, obj)
    token triples from documents, link subj/obj mentions to the part-name
    dictionary via the IDF inverted-index candidate join, emit linked
    triples with link scores."""
    from pyspark.sql import functions as F

    from pathhier_spark.operators.extract import extract_token_triples
    from pathhier_spark.operators.linking import candidate_pairs
    from pathhier_spark.functions.text import tokenize

    sf_dir = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    part = spark.read.parquet(f"{sf_dir}/part.parquet")

    triples = extract_token_triples(docs, q.TRIGGERS)
    mentions = (
        triples.select(F.col("subj").alias("mention"))
        .union(triples.select(F.col("obj").alias("mention")))
        .distinct()
    )
    m_tokens = mentions.select(
        F.col("mention").alias("s_id"), tokenize(F.col("mention")).alias("tokens")
    )
    dict_tokens = part.select(
        F.col("p_name").alias("ent_id"), tokenize(F.col("p_name")).alias("tokens")
    ).distinct()
    links = (
        candidate_pairs(m_tokens, dict_tokens, top_n=1)
        .select(F.col("s_id").alias("mention"), F.col("t_id").alias("linked_name"))
    )
    # NO forced broadcast of `links`: it is distinct-surface-form-sized and
    # grows with the corpus (billions of rows at 10^12 docs), exactly the
    # broadcast plans/pipeline.py:203-208 refuses — let AQE pick the
    # strategy (it broadcasts at gate scale on its own size evidence)
    return (
        triples.join(
            links.withColumnRenamed("mention", "subj").withColumnRenamed(
                "linked_name", "subj_link"
            ),
            "subj",
            "left",
        )
        .join(
            links.withColumnRenamed("mention", "obj").withColumnRenamed(
                "linked_name", "obj_link"
            ),
            "obj",
            "left",
        )
        .select("doc_id", "pos", "subj", "pred", "obj", "subj_link", "obj_link")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return q.queries()


def oracle_sql() -> dict[str, str]:
    return q.oracle_sql()
