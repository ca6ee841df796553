"""Distributed BPE (byte-pair-encoding) merge training.

Tokenizer training as a Spark job: learn the top-N BPE merges of a corpus
the way the classic algorithm does — repeatedly count adjacent symbol
pairs (weighted by word frequency) and merge the most frequent pair
everywhere — but with each round one combiner-friendly aggregate over the
frequency-collapsed vocabulary, never the raw corpus:

  * the corpus collapses to (word, count) ONCE — pair statistics are
    identical on the collapsed form, and the vocabulary is orders of
    magnitude smaller than the corpus at web scale;
  * each round = one groupBy(pair) sum + a 1-row argmax collect + a
    map-side fold applying the merge to every word's symbol array
    (greedy left-to-right non-overlapping, the standard BPE semantics);
  * the working table is eagerly localCheckpoint-ed per round (the
    connected-components/PageRank discipline) so round r never re-executes
    rounds 0..r-1's lineage.

Everything is deterministic — ties break on (count DESC, pair ASC) — so
the learned merge table is value-reproducible in SQL: q62's oracle
replays the rounds as unrolled DuckDB CTEs (the q36 Lloyd / q51 PageRank
trick applied to tokenizer training), with the merge application expressed
as a list_reduce fold that mirrors this module's F.aggregate exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _char_split(text_col: str) -> Column:
    """Character split guarded for the empty string: Spark's
    sequence(1, 0) is DESCENDING [1, 0], so an unguarded transform would
    turn '' into two empty symbols — which then trains/encodes a bogus
    ('', '') merge pair and diverges from the oracle's generate_series
    (empty for an empty word)."""
    return F.when(
        F.length(text_col) >= 1,
        F.transform(
            F.sequence(F.lit(1), F.length(text_col)),
            lambda i: F.col(text_col).substr(i, F.lit(1)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _apply_merge(s: Column, a: str, b: str) -> Column:
    """Greedy left-to-right non-overlapping merge of adjacent (a, b) into
    a+b over a symbol array: fold with the first symbol as the seed; at
    each step either extend the last symbol (when it is `a` and the
    incoming is `b`) or append. After a merge the NEW symbol a+b is the
    last element, so it cannot immediately re-merge as the `a` of the
    same pair — exactly BPE's non-overlapping application ('aaa' under
    (a,a) becomes [aa, a], not [aa, aa-overlap])."""
    merged = F.lit(a + b)
    return F.aggregate(
        F.slice(s, 2, F.greatest(F.size(s) - 1, F.lit(0))),
        F.slice(s, 1, 1),
        lambda acc, x: F.when(
            (F.element_at(acc, -1) == F.lit(a)) & (x == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(merged)
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_train(
    words: DataFrame,
    *,
    word_col: str = "w",
    count_col: str = "n",
    n_merges: int = 6,
) -> DataFrame:
    """Learn `n_merges` BPE merges from a (word, count) vocabulary frame.
    Returns the merge table (round INT, a STRING, b STRING, merged STRING,
    cnt LONG — the pair's weighted frequency when it was chosen), the
    artifact a tokenizer ships. Each round's argmax is a single-row
    collect (bounded: one row per round, like ivf_topk's centroid means);
    the heavy work — pair counting and merge application — stays
    distributed. Stops early when no adjacent pair remains."""
    spark = words.sparkSession
    cur = words.select(
        F.col(word_col).alias("w"),
        F.col(count_col).cast("long").alias("n"),
        _char_split(word_col).alias("s"),
    ).localCheckpoint(eager=True)
    merges: list[tuple[int, str, str, str, int]] = []
    for r in range(n_merges):
        # guard single-symbol words: Spark's sequence(1, 0) is DESCENDING
        # [1, 0], so an unguarded transform would index past the array
        pairs = cur.select(
            "n",
            F.explode(
                F.when(
                    F.size("s") >= 2,
                    F.transform(
                        F.sequence(F.lit(1), F.size("s") - 1),
                        lambda i: F.struct(
                            F.element_at(F.col("s"), i).alias("a"),
                            F.element_at(F.col("s"), i + 1).alias("b"),
                        ),
                    ),
                ).otherwise(
                    F.array().cast("array<struct<a:string,b:string>>")
                )
            ).alias("p"),
        )
        best = (
            pairs.groupBy("p.a", "p.b")
            .agg(F.sum("n").alias("cnt"))
            .orderBy(F.col("cnt").desc(), "a", "b")
            .limit(1)
            .collect()
        )
        if not best:
            break
        a, b, cnt = best[0]["a"], best[0]["b"], best[0]["cnt"]
        merges.append((r, a, b, a + b, int(cnt)))
        cur = cur.withColumn("s", _apply_merge(F.col("s"), a, b)).localCheckpoint(
            eager=True
        )
    return spark.createDataFrame(
        merges, "round int, a string, b string, merged string, cnt long"
    )


def bpe_encode(text_col: str, merges: list[tuple[str, str]]) -> Column:
    """Apply a learned merge list to a column of words (symbols column
    expression): character-split then each merge in training order — the
    standard BPE encode. Pure column expressions (one fold per merge), so
    encoding runs at scan speed; for production-sized merge lists compile
    to a ranked-pair loop in a Pandas UDF instead."""
    s = _char_split(text_col)
    for a, b in merges:
        s = _apply_merge(s, a, b)
    return s
