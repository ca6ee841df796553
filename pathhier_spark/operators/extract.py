"""Extraction stage: html -> text (Arrow UDF) and text -> triple mentions.

Generalizes the reference's HTML tag/entity stripping
(scripts/process_biocyc_hierarchy.py:15-27: `<[^>]+>` removal + HTML-entity
replacement) into the page-text extractor the north rule requires, plus a
fully-declarative (subj, pred, obj) mention extractor over the closed
predicate vocabulary (pathhier/constants.py:213-221).

Scale notes:
  * extract_text is a vectorized pandas/Arrow UDF — one Python call per Arrow
    batch, no per-row Python. It is the only Python hop in the pipeline's
    hot path and is embarrassingly parallel (map-only, no shuffle).
  * extract_mentions is pure column expressions (split/explode/regexp) —
    whole-stage codegen, no UDF at all. explode of sentences is map-side;
    no shuffle until linking.
  * The extractor is a pure deterministic function html -> text; the
    byte-identity invariant (BASELINE.json input_hint) is asserted in
    tests/test_extract.py on every synthetic page.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from pathhier_spark.functions.text import WS_SPLIT_RE
from pathhier_spark.sources.corpus import TRIGGER_TO_PRED

_TAG_RE = re.compile(r"<[^>]+>")
_WS_RE = re.compile(r"\s+")
# scripts/process_biocyc_hierarchy.py:20-26 — entity replacements, extended
# with the standard XML escapes
_ENTITIES = {
    "&alpha;": "alpha",
    "&beta;": "beta",
    "&gamma;": "gamma",
    "&delta;": "delta",
    "&amp;": "&",
    "&lt;": "<",
    "&gt;": ">",
    "&quot;": '"',
    "&apos;": "'",
    "&nbsp;": " ",
}


def extract_text_py(html: bytes) -> str:
    """Pure deterministic html -> text. Shared by the Arrow UDF and the
    tests (SURVEY.md §1.4: implemented once, reused everywhere)."""
    s = html.decode("utf-8", errors="replace")
    # drop non-content blocks wholesale, then strip tags
    s = re.sub(r"(?is)<(script|style|head)[^>]*>.*?</\1>", " ", s)
    s = _TAG_RE.sub(" ", s)
    for k, v in _ENTITIES.items():
        s = s.replace(k, v)
    return _WS_RE.sub(" ", s).strip()


def extract_text_udf():
    """Arrow-batched html->text UDF. Built lazily: pandas_udf needs an
    active SparkSession to parse its return-type DDL."""

    @pandas_udf("string")
    def _udf(html: pd.Series) -> pd.Series:
        return html.map(extract_text_py)

    return _udf


def with_extracted_text(docs: DataFrame, html_col: str = "html") -> DataFrame:
    """documents(+html) -> + extracted_text column (Arrow-batched)."""
    return docs.withColumn("extracted_text", extract_text_udf()(F.col(html_col)))


_TRIGGER_ALTERNATION = "|".join(sorted(TRIGGER_TO_PRED))
_SENT_PATTERN = rf"^\s*(.*?)\s+({_TRIGGER_ALTERNATION})\s+(.*?)\s*$"


def _pred_map() -> Column:
    pairs = []
    for k, v in sorted(TRIGGER_TO_PRED.items()):
        pairs += [F.lit(k), F.lit(v)]
    return F.create_map(*pairs)


def extract_mentions(
    docs: DataFrame,
    text_col: str = "text",
    url_col: str = "url",
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """text -> one row per (subj_mention, pred, obj_mention) sentence triple.

    Sentence grammar: "<subject phrase> <trigger> <object phrase>." with the
    trigger lexicon mapped onto the closed predicate vocabulary. Output:
    (url, sent_no INT, subj_mention STRING, pred STRING, obj_mention STRING).
    Sentences that do not match the grammar are dropped (no nulls emitted).
    """
    extra = [F.col(c) for c in passthrough]
    sents = docs.select(
        F.col(url_col).alias("url"),
        *extra,
        F.posexplode(F.split(F.col(text_col), r"\.\s*")).alias("sent_no", "sentence"),
    ).filter(F.length("sentence") > 0)
    parsed = sents.select(
        "url",
        *passthrough,
        "sent_no",
        F.regexp_extract("sentence", _SENT_PATTERN, 1).alias("subj_mention"),
        F.regexp_extract("sentence", _SENT_PATTERN, 2).alias("trigger"),
        F.regexp_extract("sentence", _SENT_PATTERN, 3).alias("obj_mention"),
    ).filter((F.col("trigger") != "") & (F.col("subj_mention") != "") & (F.col("obj_mention") != ""))
    return parsed.select(
        "url",
        *passthrough,
        "sent_no",
        "subj_mention",
        F.element_at(_pred_map(), F.col("trigger")).alias("pred"),
        "obj_mention",
    )


def extract_token_triples(
    docs: DataFrame,
    trigger_to_pred: dict[str, str],
    text_col: str = "text",
    id_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """Token-window triple extraction for free-text corpora (the driver's
    documents table has no sentence grammar): any token triple
    (w[i-1], trigger=w[i], w[i+1]) emits (subj, pred, obj).

    Map-only: the window scan happens INSIDE the token array (transform over
    the index range + filter + one explode) — no shuffle at all, so the
    stage scales linearly with cores/executors. The earlier explode+self-join
    formulation shuffled |tokens| rows twice and capped scaling at ~1.3x
    from 8->32 cores; this version is embarrassingly parallel."""
    pairs = []
    for k, v in sorted(trigger_to_pred.items()):
        pairs += [F.lit(k), F.lit(v)]
    pred_map = F.create_map(*pairs)
    # materialize the token split into a COLUMN first: referencing the
    # split expression from the filter node and again from the projection
    # re-ran the regex split per operator (no cross-operator CSE) —
    # measured 3.4x slower than splitting once into _tk and scanning that
    base = docs.select(
        *[F.col(c) for c in id_cols],
        F.split(F.lower(F.col(text_col)), WS_SPLIT_RE).alias("_tk"),
    )
    toks = F.col("_tk")
    # two-phase to keep allocation proportional to HITS, not tokens: first
    # an int array of trigger positions, then structs only for those
    trigger_lit = F.array(*[F.lit(k) for k in sorted(trigger_to_pred)])
    positions = F.filter(
        # 0-based trigger positions 1 .. n-2
        F.sequence(F.lit(1), F.greatest(F.size(toks) - 2, F.lit(0))),
        lambda i: F.array_contains(trigger_lit, F.element_at(toks, i + 1)),
    )
    windows = F.transform(
        positions,
        lambda i: F.struct(
            i.cast("int").alias("pos"),
            F.element_at(toks, i).alias("subj"),
            F.element_at(pred_map, F.element_at(toks, i + 1)).alias("pred"),
            F.element_at(toks, i + 2).alias("obj"),
        ),
    )
    return (
        base.filter(F.size(toks) >= 3)
        .select(*[F.col(c) for c in id_cols], F.explode(windows).alias("w"))
        .select(
            *id_cols,
            F.col("w.pos").alias("pos"),
            F.col("w.subj").alias("subj"),
            F.col("w.pred").alias("pred"),
            F.col("w.obj").alias("obj"),
        )
    )


def predicate_profile(triples: DataFrame) -> DataFrame:
    """KG quality profile per predicate: the constraint statistics a
    knowledge-graph factory checks before trusting extracted edges.

    Over the DISTINCT (subj, pred, obj) triple set:

    * ``n_triples`` / ``n_subj`` / ``n_obj`` — edge and endpoint counts.
    * ``functionality`` — n_subj / n_triples (PARIS-style, Suchanek et
      al. 2011): 1.0 means every subject takes exactly one object (the
      predicate behaves like a function); low values mean fan-out.
    * ``inv_functionality`` — n_obj / n_triples, the same for the
      inverse direction.
    * ``n_multi_subj`` — subjects asserting >1 distinct object: the
      VIOLATION count if the predicate is declared functional; the pairs
      a curation pass would send to conflict resolution.

    Scale shape: one distinct over the triple set (the only corpus-sized
    shuffle, keyed on the full triple — no hot key), then two
    combiner-friendly groupBys whose outputs are |preds|- and
    |pred, subj|-sized; the final join is on the tiny predicate domain
    and broadcasts. Ratios are single IEEE divisions of exact integers —
    bit-reproducible on any engine.
    """
    t = triples.select("subj", "pred", "obj").distinct()
    base = t.groupBy("pred").agg(
        F.count(F.lit(1)).cast("long").alias("n_triples"),
        F.countDistinct("subj").cast("long").alias("n_subj"),
        F.countDistinct("obj").cast("long").alias("n_obj"),
    )
    multi = (
        t.groupBy("pred", "subj")
        .agg(F.count(F.lit(1)).alias("n_o"))
        .filter(F.col("n_o") > 1)
        .groupBy("pred")
        .agg(F.count(F.lit(1)).cast("long").alias("n_multi_subj"))
    )
    return (
        base.join(F.broadcast(multi), "pred", "left")
        .na.fill({"n_multi_subj": 0})
        .select(
            "pred",
            "n_triples",
            "n_subj",
            "n_obj",
            (
                F.round(
                    F.col("n_subj").cast("double") / F.col("n_triples"), 6
                )
                + F.lit(0.0)
            ).alias("functionality"),
            (
                F.round(
                    F.col("n_obj").cast("double") / F.col("n_triples"), 6
                )
                + F.lit(0.0)
            ).alias("inv_functionality"),
            "n_multi_subj",
        )
    )


MENTION_PATTERNS = {
    # type -> (regex, why it is anchored the way it is)
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "url": r"https?://[^\s<>\"]+",
    "year": r"\b(?:19|20)\d{2}\b",
    "number": r"\b\d+(?:\.\d+)?\b",
}


def typed_mentions(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    patterns: dict[str, str] | None = None,
) -> DataFrame:
    """Typed mention extraction — the IE input surface of KG
    construction: pull every email / URL / year / number mention into a
    long-format (doc_id, mention_type, mention) table that downstream
    linking (q07) and canonicalization (q18) consume. Pure
    regexp_extract_all column expressions — one map-only pass per
    pattern unioned together, no UDF, no shuffle until the caller
    aggregates. 'year' deliberately wins over 'number' only by type
    label (both patterns emit the 1999 token; consumers filter by the
    type they want — double-reporting is the honest long-format
    contract, pinned in tests).

    Ordering note: patterns apply independently, so a URL containing
    digits also yields number mentions — real extractors dedupe by
    span; this table keeps everything and lets the consumer decide."""
    pats = patterns or MENTION_PATTERNS
    parts = []
    for mtype, rx in sorted(pats.items()):
        parts.append(
            docs.select(
                F.col(id_col),
                F.lit(mtype).alias("mention_type"),
                F.explode(
                    F.regexp_extract_all(F.col(text_col), F.lit(rx), 0)
                ).alias("mention"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def resolve_functional_conflicts(
    triples: DataFrame,
    *,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
) -> DataFrame:
    """Truth-discovery majority vote over a functional predicate: when the
    corpus asserts several distinct objects for one (subj, pred) — the
    knowledge-fusion conflict case (Dong et al., KDD 2014's voting
    baseline) — keep the object with the most supporting assertions,
    tie-broken by lexicographically-smallest object so both engines pick
    the identical winner with no RNG.

    Only CONFLICTED keys are emitted (n_obj > 1): the clean majority of a
    KG's keys never leave the combiner. Scale shape: one (subj, pred, obj)
    combiner groupBy to collapse assertions into votes, then windows
    partitioned by (subj, pred) — one shuffle total, partition width
    bounded by the distinct-object fan-out of a single key, never by
    corpus size. confidence = support/total is the q110 fixed-shape double
    over exact int64 counts, round-6. Output: (subj, pred, winner_obj,
    support, n_obj, total, confidence)."""
    from pyspark.sql import Window

    votes = triples.groupBy(
        F.col(subj_col).alias("subj"),
        F.col(pred_col).alias("pred"),
        F.col(obj_col).alias("obj"),
    ).agg(F.count(F.lit(1)).alias("support"))
    key = Window.partitionBy("subj", "pred")
    rk = key.orderBy(F.desc("support"), F.asc("obj"))
    ranked = votes.select(
        "subj",
        "pred",
        "obj",
        "support",
        F.row_number().over(rk).alias("rk"),
        F.count(F.lit(1)).over(key).alias("n_obj"),
        F.sum("support").over(key).alias("total"),
    ).filter((F.col("rk") == 1) & (F.col("n_obj") > 1))
    conf = F.round(
        F.col("support").cast("double") / F.col("total").cast("double"), 6
    )
    return ranked.select(
        "subj",
        "pred",
        F.col("obj").alias("winner_obj"),
        "support",
        "n_obj",
        "total",
        (conf + F.lit(0.0)).alias("confidence"),
    )


HEARST_SUCH_AS = r"(\w+) such as (\w+) and (\w+)"
HEARST_OTHER = r"(\w+) and other (\w+)"


def hearst_hypernyms(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Hearst-pattern hypernym mining — the IS-A edge grower for the
    ontology, the lexical complement to the alias edges q211's
    abbreviation miner produces: '<X> such as <Y> and <Z>' yields
    (X, Y) and (X, Z); '<Y> and other <X>' yields (X, Y). These are
    the classic high-precision taxonomy-induction patterns (Hearst
    1992), and the mined pairs slot directly into the subsumption
    closure (q100) as candidate parent links.

    Map-only: per pattern one regexp_extract_all per capture group,
    zipped positionally and exploded — no shuffle until a consumer
    aggregates. Both engines run the same patterns (Java regex vs RE2:
    \\w and the literal anchors behave identically here).
    Output: (id, hypernym, hyponym, pattern)."""
    def mine(pat: str, pairs: list[tuple[int, int]], tag: str):
        groups = {
            i: F.regexp_extract_all(F.col(text_col), F.lit(pat), i)
            for i in {g for p in pairs for g in p}
        }
        outs = []
        for hyper_i, hypo_i in pairs:
            outs.append(
                df.where(F.col(text_col).isNotNull())
                .select(
                    F.col(id_col),
                    F.explode(
                        F.arrays_zip(
                            groups[hyper_i].alias("hyper"),
                            groups[hypo_i].alias("hypo"),
                        )
                    ).alias("z"),
                )
                .select(
                    id_col,
                    F.col("z.hyper").alias("hypernym"),
                    F.col("z.hypo").alias("hyponym"),
                    F.lit(tag).alias("pattern"),
                )
            )
        return outs

    parts = mine(HEARST_SUCH_AS, [(1, 2), (1, 3)], "such_as")
    parts += mine(HEARST_OTHER, [(2, 1)], "and_other")
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


TR_PATTERN = r"<tr>(.*?)</tr>"
CELL_PATTERN = r"<t[dh][^>]*>([^<]*)</t[dh]>"


def extract_html_tables(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    html_col: str = "html",
) -> DataFrame:
    """HTML table extraction into long-format (row, col, cell) — the
    STRUCTURED-data source channel of web-KG construction next to the
    free-text one (P11 html→text, q88 anchors): infobox-style tables
    carry the highest-precision attribute triples a page has, and this
    is the scan that feeds them to the extractor as typed rows instead
    of flattened prose.

    Two nested regex explosions, both positional: <tr> bodies with
    row_idx (posexplode), then header/data cells with col_idx; a row
    is a header row iff it contains a <th cell. Cell bodies use the
    [^<]* form (no nested markup) so Java regex and RE2 agree exactly;
    rows use non-greedy (.*?), supported identically by both. Map-only
    — no shuffle in the operator at all.
    Output: (id, row_idx, col_idx, cell, is_header)."""
    rows = df.where(F.col(html_col).isNotNull()).select(
        F.col(id_col),
        F.posexplode(
            F.regexp_extract_all(F.col(html_col), F.lit(TR_PATTERN), 1)
        ).alias("row_idx", "row_html"),
    )
    return rows.select(
        id_col,
        "row_idx",
        F.posexplode(
            F.regexp_extract_all(F.col("row_html"), F.lit(CELL_PATTERN), 1)
        ).alias("col_idx", "cell"),
        F.col("row_html").contains("<th").alias("is_header"),
    )
