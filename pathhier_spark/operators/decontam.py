"""Benchmark decontamination — flag training documents that overlap an
evaluation/benchmark set by shared word n-grams.

The standard pretraining-hygiene step (the n-gram collision check used for
public-benchmark decontamination): any document containing a token n-gram
that also appears in the benchmark set is marked contaminated so it can be
dropped or audited before training. The reference pipeline never needed
this (curated databases), but a Common-Crawl-scale corpus does — public
benchmarks leak into web text constantly.

Scale shape: the benchmark side is the tiny one (thousands of prompts →
at most a few million distinct n-grams), so it is aggregated to a distinct
n-gram set and BROADCAST; the corpus side explodes each document's
per-doc-distinct n-grams map-side and probes the broadcast hash — no
corpus-sized shuffle anywhere. The only shuffle is the per-doc hit count,
which is combiner-friendly (sum of 0/1 longs keyed by doc id). Tokens and
n-grams reuse textstats' machinery so the decontamination keys are exactly
the corpus-analysis keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from pathhier_spark.operators.textstats import _tokens, _word_ngrams


def benchmark_ngrams(
    bench: DataFrame, *, text_col: str = "text", n: int = 3
) -> DataFrame:
    """Distinct word n-grams of the benchmark set → one `gram` column.
    Distinct keeps the broadcast side minimal; at benchmark scale this is
    a few MB."""
    return (
        bench.select(
            F.explode(_word_ngrams(_tokens(text_col), n)).alias("gram")
        )
        .distinct()
    )


def decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    max_hits: int = 0,
) -> DataFrame:
    """Adds `n_contaminated` (distinct benchmark n-grams found in the doc)
    and `contaminated` (n_contaminated > max_hits) to `docs`.

    `bench` is either raw benchmark text (same text_col) or a pre-computed
    gram frame (any frame with a `gram` column and no text column, e.g.
    benchmark_ngrams() output — extra metadata columns are ignored; a
    frame carrying BOTH columns is ambiguous and refused). Per-doc n-grams
    are DISTINCT before the probe so a repeated phrase counts once — the
    signal is "how many benchmark grams appear", not term frequency. The
    probe is a broadcast inner join; docs with zero hits never reach the
    count shuffle. The join back of hits onto the corpus is also
    broadcast-hinted: hits is bounded by the CONTAMINATED doc count,
    small by presumption in a sane decontamination run — if contamination
    is pervasive enough for hits to blow the broadcast, the corpus is the
    problem, not the plan (drop the hint and accept the key shuffle while
    triaging)."""
    if "gram" in bench.columns:
        if text_col in bench.columns:
            raise ValueError(
                f"bench has both 'gram' and {text_col!r} columns — pass "
                "either raw benchmark text or a gram frame, not both"
            )
        grams = bench.select("gram")
    else:
        grams = benchmark_ngrams(bench, text_col=text_col, n=n)
    doc_grams = docs.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(_word_ngrams(_tokens(text_col), n))
        ).alias("gram"),
    )
    hits = (
        doc_grams.join(broadcast(grams), "gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_contaminated"))
    )
    return (
        docs.join(broadcast(hits), id_col, "left")
        .withColumn(
            "n_contaminated", F.coalesce(F.col("n_contaminated"), F.lit(0))
        )
        .withColumn(
            "contaminated", F.col("n_contaminated") > F.lit(max_hits)
        )
    )
