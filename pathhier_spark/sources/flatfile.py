"""Chunked attribute-record flat-file parser (S9).

The reference parses BioCyc `.dat` files: records delimited by `//` lines,
`ATTR - value` attribute lines, `/`-prefixed continuation lines
(pathhier/utils/file_utils.py:2-15 chunkify + biocyc_ontology.py:20-43).
Spark-side: spark.read.text + a stateful per-partition reassembly. Because a
record may span a partition boundary when Spark splits a large text file, we
read whole files (wholetext) for correctness at fixture scale and document
the scale path: pre-chunk large .dat files on ingest (they are per-organism,
naturally file-parallel — the reference's own corpus is many small files).
mapInPandas keeps the parse Arrow-batched.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession


def parse_dat_text(text: str) -> list[dict]:
    """Pure parser: text -> list of {record_id, attr, value} rows.
    Mirrors chunkify (split on '//' lines) + attribute parsing with '/'
    continuation lines appended to the previous value."""
    rows: list[dict] = []
    rec_no = 0
    cur_id: str | None = None
    last: dict | None = None
    for raw in text.splitlines():
        line = raw.rstrip("\n")
        if line.startswith("#"):
            continue
        if line.strip() == "//":
            rec_no += 1
            cur_id = None
            last = None
            continue
        if line.startswith("/") and last is not None:
            last["value"] += " " + line[1:].strip()
            continue
        if " - " in line:
            attr, value = line.split(" - ", 1)
            attr = attr.strip()
            value = value.strip()
            if attr == "UNIQUE-ID":
                cur_id = value
            last = {
                "record_no": rec_no,
                "record_id": cur_id,
                "attr": attr,
                "value": value,
            }
            rows.append(last)
    return rows


def read_dat(spark: SparkSession, path: str) -> DataFrame:
    """Directory/glob of .dat files -> (file, record_no, record_id, attr,
    value). File-parallel; per-file parse is Arrow-batched."""
    files = spark.read.format("text").option("wholetext", True).load(path)
    files = files.selectExpr("input_file_name() AS file", "value AS text")

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                for r in parse_dat_text(row["text"]):
                    r["file"] = row["file"]
                    out.append(r)
            yield pd.DataFrame(
                out,
                columns=["file", "record_no", "record_id", "attr", "value"],
            )

    return files.mapInPandas(
        _parse,
        schema="file string, record_no int, record_id string, attr string, value string",
    )


def parse_kegg_indented(text: str) -> list[dict]:
    """KEGG indented-list parser (extract_training_data.py:88-120 shape):
    lines 'X  name' where the letter/indent encodes depth; emits
    (depth, entry_id, name, parent_id)."""
    rows: list[dict] = []
    stack: list[tuple[int, str]] = []
    for line in text.splitlines():
        if not line.strip() or line.startswith(("#", "!")):
            continue
        depth = ord(line[0]) - ord("A") if line[0].isalpha() and line[0].isupper() else None
        if depth is None:
            continue
        body = line[1:].strip()
        if not body:
            continue
        parts = body.split(None, 1)
        entry_id = parts[0]
        name = parts[1] if len(parts) > 1 else ""
        while stack and stack[-1][0] >= depth:
            stack.pop()
        parent = stack[-1][1] if stack else None
        rows.append(
            {"depth": depth, "entry_id": entry_id, "name": name, "parent_id": parent}
        )
        stack.append((depth, entry_id))
    return rows


def read_pathway_pairs_tsv(spark: SparkSession, path: str) -> DataFrame:
    """3-line record-group TSV reader (S8) — the format of the reference's
    clustering output consumed by load_pathway_pairs
    (pathhier/utils/pathway_utils.py:391-417): a header line, then per
    record three lines:

      1. sim_score \\t overlap \\t pw_id \\t kb1_id \\t kb2_id
      2. _ \\t _ \\t _ \\t kb1_name \\t kb2_name
      3. separator (blank)

    A truncated trailing record (ids line without its names line) is
    dropped, matching the reference's StopIteration-before-append behavior.

    Distributed form: line numbers via zipWithIndex (per-partition offsets,
    order-preserving over the text source), record id = (line-1) // 3, then
    the ids and names lines of each record equi-join on the record id.
    Output: (rec BIGINT, sim_score DOUBLE, overlap DOUBLE, pw_id, kb1_id,
    kb2_id, kb1_name, kb2_name)."""
    from pyspark.sql import functions as F

    lines = (
        spark.sparkContext.textFile(path)
        .zipWithIndex()
        .toDF(["line", "idx"])
    )
    body = (
        lines.filter(F.col("idx") > 0)
        .withColumn("rec", ((F.col("idx") - 1) / 3).cast("long"))
        .withColumn("pos", (F.col("idx") - 1) % 3)
        .withColumn("f", F.split("line", "\t"))
    )
    ids = body.filter(F.col("pos") == 0).select(
        "rec",
        F.col("f").getItem(0).cast("double").alias("sim_score"),
        F.col("f").getItem(1).cast("double").alias("overlap"),
        F.col("f").getItem(2).alias("pw_id"),
        F.col("f").getItem(3).alias("kb1_id"),
        F.col("f").getItem(4).alias("kb2_id"),
    )
    names = body.filter(F.col("pos") == 1).select(
        "rec",
        F.col("f").getItem(3).alias("kb1_name"),
        F.col("f").getItem(4).alias("kb2_name"),
    )
    return ids.join(names, "rec").orderBy("rec")


_EXT_FORMATS = {
    ".parquet": "parquet",
    ".orc": "orc",
    ".json": "json",
    ".jsonl": "json",
    ".csv": "csv",
    ".tsv": "csv",
    ".avro": "avro",
}


def avro_available(spark: SparkSession) -> bool:
    """The avro DataSource lives in the external spark-avro module (not
    bundled with pyspark's jars in this sandbox — only avro-core is).
    Capability-probe it like the warehouse probes the Iceberg runtime.
    A Class.forName probe is NOT enough: some avro SQL classes ship in the
    bundled jars while the data-source registration does not — probe the
    actual source lookup and classify the failure."""
    try:
        spark.read.format("avro").schema("probe int").load(
            "/nonexistent-avro-capability-probe"
        )
        return True
    except Exception as e:
        return "Failed to find data source" not in str(e)


def read_documents(
    spark: SparkSession,
    path: str,
    fmt: str = "auto",
    schema: str | None = None,
):
    """Extension-dispatch document reader (the S4 generalization — the
    reference routes files to parsers by extension,
    pathhier/pathway_kb_loader.py's per-format loaders). fmt='auto' infers
    from the path suffix; self-describing container formats (parquet/orc)
    ignore `schema`, text formats (json/csv/tsv) apply it when given.
    TSV gets tab delimiter + header; CSV gets header."""
    if fmt == "auto":
        import os as _os

        ext = _os.path.splitext(path.rstrip("/"))[1].lower()
        fmt = _EXT_FORMATS.get(ext, "parquet")
        is_tsv = ext == ".tsv"
    else:
        is_tsv = fmt == "tsv"
        fmt = "csv" if fmt == "tsv" else fmt
    if fmt == "avro" and not avro_available(spark):
        raise NotImplementedError(
            "avro input needs the external spark-avro module on the "
            "classpath (--packages org.apache.spark:spark-avro_2.13); "
            "it is not bundled in this sandbox"
        )
    reader = spark.read
    if schema and fmt in ("json", "csv"):
        reader = reader.schema(schema)
    if fmt == "csv":
        reader = reader.option("header", "true")
        if is_tsv:
            reader = reader.option("sep", "\t")
    return reader.format(fmt).load(path)
