"""clean_xrefs (P5), TSV/GMT sinks (S11/S12), constrained clustering (G6)."""

import glob
import os

import pytest
from pyspark.sql import functions as F

from pathhier_spark.functions.xrefs import clean_xrefs, get_xref_db
from pathhier_spark.operators.genesets import (
    cluster_pathways,
    constrained_clustering,
    score_pathway_pairs,
)
from pathhier_spark.sources.sinks import (
    gene_sets_from_components,
    write_gmt,
    write_match_tsv,
)


def test_clean_xrefs(spark):
    rows = [
        (
            [
                "CHEBI:CHEBI:15377",       # duplicated prefix collapses
                "UniProtKB:P12345",        # db canonicalized
                "pubmed:123",              # avoid term -> dropped
                "KEGG Compound:C00001",    # spelling variant -> kegg
                "chebi:15377",
            ],
        )
    ]
    df = spark.createDataFrame(rows, "xrefs array<string>")
    got = df.select(clean_xrefs(F.col("xrefs")).alias("x")).collect()[0]["x"]
    assert got == [
        "chebi:15377",
        "uniprot:P12345",
        "kegg:C00001",
    ]


def test_get_xref_db(spark):
    df = spark.createDataFrame([("Entrez Gene:999",), ("HMDB:HMDB01",)], "x string")
    got = [r[0] for r in df.select(get_xref_db(F.col("x"))).collect()]
    assert got == ["ncbigene", "hmdb"]


def test_match_tsv_sink(spark, tmp_path):
    matches = spark.createDataFrame(
        [("k1", f"p{i}", 1.0 - i * 0.05) for i in range(15)],
        "kb_id string, pw_id string, score double",
    )
    kb = spark.createDataFrame([("k1", "KB One", "def k")], "kb_id string, kb_name string, kb_def string")
    pw = spark.createDataFrame(
        [(f"p{i}", f"PW {i}", f"def {i}") for i in range(15)],
        "pw_id string, pw_name string, pw_def string",
    )
    out = str(tmp_path / "matches_tsv")
    write_match_tsv(matches, kb, pw, out)
    files = glob.glob(os.path.join(out, "*.csv"))
    assert files
    lines = open(files[0]).read().strip().split("\n")
    assert lines[0].split("\t") == [
        "kb_id", "kb_name", "kb_def", "pw_id", "pw_name", "pw_def", "score",
    ]
    assert len(lines) == 11  # header + top-10


def test_gmt_sink(spark, tmp_path):
    gs = spark.createDataFrame(
        [("set1", "orig", ["b", "a", "b"])],
        "name string, origin string, symbols array<string>",
    )
    out = str(tmp_path / "gmt")
    write_gmt(gs, out)
    files = glob.glob(os.path.join(out, "*.txt"))
    line = open(files[0]).read().strip()
    assert line == "set1\torig\ta\tb"


def test_constrained_clustering_semantics():
    pairs = [
        (0.9, "a1", "kbA", "b1", "kbB"),
        (0.8, "b1", "kbB", "c1", "kbC"),
        (0.7, "a2", "kbA", "b1", "kbB"),   # blocked: kbA already in cluster
        (0.6, "a2", "kbA", "c2", "kbC"),   # new cluster
        (0.1, "x1", "kbA", "y1", "kbB"),   # below threshold -> stop
    ]
    assign = constrained_clustering(pairs, threshold=0.25)
    assert assign["a1"] == assign["b1"] == assign["c1"]
    assert assign["a2"] == assign["c2"] != assign["a1"]
    assert "x1" not in assign


def test_cluster_pathways_and_gene_sets(spark):
    members = spark.createDataFrame(
        [
            ("p1", "kbA", ["g1", "g2", "g3"]),
            ("p2", "kbB", ["g1", "g2", "g4"]),
            ("p3", "kbC", ["g9"]),
        ],
        "pathway_id string, kb string, entities array<string>",
    )
    scored = score_pathway_pairs(members)
    rows = {(r["id_a"], r["id_b"]): r for r in scored.collect()}
    assert rows[("p1", "p2")]["sim"] == pytest.approx(2 / 4)
    assert rows[("p1", "p2")]["overlap"] == pytest.approx(2 * 2 / 6)
    clustered = cluster_pathways(
        spark, scored, members.select("pathway_id", "kb")
    )
    got = {r["pathway_id"]: r["cluster_id"] for r in clustered.collect()}
    assert got["p1"] == got["p2"] != got["p3"]

    nodes = spark.createDataFrame(
        [(f"e{i}", [f"SYM:{i % 4}"], f"ent {i}") for i in range(20)],
        "uid string, xrefs array<string>, name string",
    )
    comps = spark.createDataFrame(
        [(f"e{i}", "c0" if i < 16 else "c1") for i in range(20)],
        "uid string, component string",
    )
    gs = gene_sets_from_components(nodes, comps, min_size=15)
    rows = gs.collect()
    assert len(rows) == 1 and rows[0]["n_entities"] == 16
    assert rows[0]["symbols"] == ["SYM:0", "SYM:1", "SYM:2", "SYM:3"]
