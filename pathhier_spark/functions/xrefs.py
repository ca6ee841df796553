"""Xref cleaning and id normalization (P5/P6).

Re-expressions of pathhier/utils/pathway_utils.py:85-113 (clean_xrefs) and
the DB-name canonicalization map (pathhier/constants.py:101-138
DB_XREF_MAP-style) as higher-order array functions — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# pathway_utils.py:88-90 — xrefs containing these substrings are dropped
AVOID_TERMS = ["pubmed", "pmc", "doi", "reactome,", "wikipathways"]

# canonicalization of database-prefix spellings (constants.py:101-138 shape;
# the reference maps many case/spelling variants onto one canonical prefix)
DB_XREF_MAP = {
    "kegg compound": "kegg",
    "kegg.compound": "kegg",
    "ligand": "kegg",
    "chebi": "chebi",
    "uniprot isoform": "uniprot",
    "uniprotkb": "uniprot",
    "uniprot knowledgebase": "uniprot",
    "entrez gene": "ncbigene",
    "entrez": "ncbigene",
    "gene id": "ncbigene",
    "pubchem-compound": "pubchem",
    "pubchem.compound": "pubchem",
    "chemspider": "chemspider",
    "hmdb": "hmdb",
    "ensembl": "ensembl",
}


def _db_map_lit() -> Column:
    pairs = []
    for k, v in sorted(DB_XREF_MAP.items()):
        pairs += [F.lit(k), F.lit(v)]
    return F.create_map(*pairs)


def clean_xref(x: Column) -> Column:
    """One xref 'db:id' -> canonical 'db:id' (lower/canonical db; collapse a
    duplicated db prefix like 'CHEBI:CHEBI:123')."""
    db = F.lower(F.substring_index(x, ":", 1))
    rest = F.array_join(F.slice(F.split(x, ":"), 2, 100000), ":")
    canon_db = F.coalesce(F.element_at(_db_map_lit(), db), db)
    # collapse duplicated prefix: db:db:id -> db:id
    rest2 = F.when(
        F.lower(F.substring_index(rest, ":", 1)) == canon_db,
        F.array_join(F.slice(F.split(rest, ":"), 2, 100000), ":"),
    ).otherwise(rest)
    return F.when(rest2 != "", F.concat(canon_db, F.lit(":"), rest2)).otherwise(
        F.lower(x)
    )


def clean_xrefs(xrefs: Column) -> Column:
    """pathway_utils.py:85-113 semantics over an ARRAY<STRING> column:
    drop avoid-term xrefs, canonicalize db prefix, dedup."""
    kept = F.filter(
        xrefs,
        lambda x: ~(
            F.lower(x).rlike("|".join(AVOID_TERMS))
        ),
    )
    return F.array_distinct(F.transform(kept, clean_xref))


def get_xref_db(x: Column) -> Column:
    """db prefix of an xref (pathway_utils.py:469-490 get_pathway_kb
    routing)."""
    db = F.lower(F.substring_index(x, ":", 1))
    return F.coalesce(F.element_at(_db_map_lit(), db), db)
