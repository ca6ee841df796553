"""Flat-file parsers (S9) and graph utilities (G4/G5/A5/A6/P10/J5)."""

import pytest
from pyspark.sql import functions as F

from pathhier_spark.operators.graph import (
    bfs_closure,
    bow_overlap_feature,
    entity_count_histogram,
    name_pair_expansion,
    pathway_hierarchy,
    string_entry,
)
from pathhier_spark.sources.flatfile import (
    parse_dat_text,
    parse_kegg_indented,
    read_dat,
)

DAT = """# comment
UNIQUE-ID - PWY-1
TYPES - Pathways
COMMON-NAME - glycolysis
/continued name part
//
UNIQUE-ID - PWY-2
TYPES - Super-Pathways
//
"""


def test_parse_dat_text():
    rows = parse_dat_text(DAT)
    by = {(r["record_id"], r["attr"]): r["value"] for r in rows}
    assert by[("PWY-1", "COMMON-NAME")] == "glycolysis continued name part"
    assert by[("PWY-2", "TYPES")] == "Super-Pathways"
    assert {r["record_no"] for r in rows} == {0, 1}


def test_read_dat_spark(spark, tmp_path):
    p = tmp_path / "f1.dat"
    p.write_text(DAT)
    df = read_dat(spark, str(tmp_path))
    rows = df.collect()
    assert len(rows) == len(parse_dat_text(DAT))
    assert all(r["file"].endswith("f1.dat") for r in rows)


def test_parse_kegg_indented():
    text = "A09100 Metabolism\nB  09101 Carbohydrate\nC    00010 Glycolysis\nB  09102 Energy\n"
    rows = parse_kegg_indented(text)
    by = {r["entry_id"]: r for r in rows}
    assert by["00010"]["parent_id"] == "09101"
    assert by["09101"]["parent_id"] == "09100"
    assert by["09102"]["parent_id"] == "09100"
    assert by["09100"]["parent_id"] is None and by["09100"]["depth"] == 0


def test_hierarchy_and_bfs(spark):
    edges = spark.createDataFrame(
        [
            ("r", "component", "a", "pw", "x"),
            ("a", "component", "b", "pw", "x"),
            ("b", "component", "c", "pw", "x"),
            ("q", "participant", "z", "pw", "x"),
            ("other", "component", "island", "pw", "x"),
        ],
        "subj string, pred string, obj string, pathway_uid string, provenance string",
    )
    h = pathway_hierarchy(edges)
    assert h.count() == 4
    roots = spark.createDataFrame([("r",)], "node string")
    reach = bfs_closure(h, roots)
    got = {r["node"]: r["depth"] for r in reach.collect()}
    assert got == {"r": 0, "a": 1, "b": 2, "c": 3}


def test_stats_and_features(spark):
    nodes = spark.createDataFrame(
        [("e1", "p1"), ("e2", "p1"), ("e3", "p2")], "uid string, pathway_uid string"
    )
    hist = {r["pathway_uid"]: r["n_entities"] for r in entity_count_histogram(nodes).collect()}
    assert hist == {"p1": 2, "p2": 1}

    pairs = spark.createDataFrame(
        [(["a", "b", "b"], ["b", "c"])], "lt array<string>, rt array<string>"
    )
    assert bow_overlap_feature(pairs, "lt", "rt").collect()[0]["bow_overlap"] == 1


def test_string_entry_and_name_pairs(spark):
    df = spark.createDataFrame(
        [(["N1", "N2", "N1"], "a def", ["P1"])],
        "aliases array<string>, definition string, parents array<string>",
    )
    e = string_entry(df, parent_names_col="parents").collect()[0]["entry"]
    assert e == "N1; N2; a def; subClassOf: P1"

    pairs = spark.createDataFrame(
        [("x", ["a", "b"], ["c", "d"])],
        "pair string, l_aliases array<string>, r_aliases array<string>",
    )
    got = {(r["l_name"], r["r_name"]) for r in name_pair_expansion(pairs).collect()}
    assert got == {("a", "c"), ("a", "d"), ("b", "c"), ("b", "d")}


def test_read_pathway_pairs_tsv(spark, tmp_path):
    """3-line record-group format (pathway_utils.py:391-417): header, then
    (ids, names, separator) triplets; truncated trailing record dropped."""
    from pathhier_spark.sources.flatfile import read_pathway_pairs_tsv

    f = tmp_path / "pairs.tsv"
    lines = [
        "sim_score\toverlap\tpw_id\tkb1_id\tkb2_id",
        "0.9\t0.8\tPW:1\tkegg:hsa1\tsmp:SMP1",
        "_\t_\t_\tGlycolysis\tGlycolysis I",
        "",
        "0.5\t0.4\tPW:2\tkegg:hsa2\tpid:p2",
        "_\t_\t_\tTCA\tCitric acid cycle",
        "",
        "0.1\t0.1\tPW:3\tkegg:hsa3\tsmp:SMP3",  # truncated: no names line
    ]
    f.write_text("\n".join(lines) + "\n")
    got = read_pathway_pairs_tsv(spark, str(f)).collect()
    assert [(r["pw_id"], r["sim_score"], r["kb1_name"]) for r in got] == [
        ("PW:1", 0.9, "Glycolysis"),
        ("PW:2", 0.5, "TCA"),
    ]
    assert got[0]["kb2_id"] == "smp:SMP1" and got[1]["overlap"] == 0.4


def test_read_documents_format_dispatch(spark, tmp_path, sf_dir):
    """S4 extension dispatch: the same documents round-trip through parquet,
    orc, json, and tsv and read back identically via read_documents."""
    from pathhier_spark.sources.flatfile import read_documents

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text", "lang")
        .filter("doc_id < 50")
    )
    want = {(r["doc_id"], r["text"], r["lang"]) for r in docs.collect()}
    schema = "doc_id long, text string, lang string"

    p = str(tmp_path / "d.parquet")
    docs.write.parquet(p)
    o = str(tmp_path / "d.orc")
    docs.write.orc(o)
    j = str(tmp_path / "d.json")
    docs.write.json(j)
    t = str(tmp_path / "d.tsv")
    docs.write.option("header", "true").option("sep", "\t").csv(t)

    for path in (p, o, j, t):
        got = {
            (r["doc_id"], r["text"], r["lang"])
            for r in read_documents(spark, path, schema=schema).collect()
        }
        assert got == want, f"round-trip mismatch for {path}"


def test_read_documents_avro_guard(spark, tmp_path, sf_dir):
    """S4 avro branch: round-trips when the spark-avro module is on the
    classpath; otherwise raises the documented capability guard (the module
    is external to pyspark's bundled jars — sandbox has only avro-core)."""
    import pytest as _pytest

    from pathhier_spark.sources.flatfile import avro_available, read_documents

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text", "lang")
        .filter("doc_id < 20")
    )
    path = str(tmp_path / "d.avro")
    if avro_available(spark):
        docs.write.format("avro").save(path)
        got = {
            (r["doc_id"], r["text"], r["lang"])
            for r in read_documents(spark, path).collect()
        }
        assert got == {(r["doc_id"], r["text"], r["lang"]) for r in docs.collect()}
    else:
        with _pytest.raises(NotImplementedError, match="spark-avro"):
            read_documents(spark, path)
