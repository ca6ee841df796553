"""Sequence packing: block-decomposition exactness, edge cases."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from pathhier_spark.operators.packing import pack_sequences


def _naive(df, capacity):
    w = Window.orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    n = F.coalesce(F.col("n_tokens"), F.lit(0)).cast("long")
    pos = df.select(
        "doc_id",
        n.alias("n"),
        (F.sum(n).over(w) - n).alias("start_off"),
    )
    first = F.floor(F.col("start_off") / capacity)
    last = F.when(
        F.col("n") > 0,
        F.floor((F.col("start_off") + F.col("n") - 1) / capacity),
    ).otherwise(first)
    return pos.select(
        "doc_id",
        "n",
        "start_off",
        first.cast("long").alias("first_chunk"),
        last.cast("long").alias("last_chunk"),
        F.when(F.col("n") > 0, last - first + 1)
        .otherwise(F.lit(0))
        .cast("long")
        .alias("n_chunks"),
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture(scope="module")
def corpus(spark):
    # sparse ids, a zero, a NULL, counts straddling the capacity
    data = [
        (0, 100), (1, 200), (2, 0), (5, None), (7, 56), (8, 512),
        (100, 1), (101, 255), (102, 257), (999, 3000),
    ]
    return spark.createDataFrame(data, "doc_id long, n_tokens long")


def test_matches_naive_single_window(spark, corpus):
    got = pack_sequences(corpus, capacity=256, block_size=3)
    assert _rows(got) == _rows(_naive(corpus, 256))


def test_block_size_never_changes_results(spark, corpus):
    a = _rows(pack_sequences(corpus, capacity=256, block_size=1))
    b = _rows(pack_sequences(corpus, capacity=256, block_size=7))
    c = _rows(pack_sequences(corpus, capacity=256, block_size=10_000))
    assert a == b == c


def test_offsets_are_contiguous(spark):
    df = spark.createDataFrame(
        [(i, 10 * (i + 1)) for i in range(20)], "doc_id long, n_tokens long"
    )
    rows = sorted(
        (r["doc_id"], r["start_off"], r["n"])
        for r in pack_sequences(df, capacity=64, block_size=4).collect()
    )
    off = 0
    for _, start, n in rows:
        assert start == off
        off += n


def test_chunk_span_semantics(spark):
    df = spark.createDataFrame(
        [(0, 256), (1, 1), (2, 511), (3, 0)], "doc_id long, n_tokens long"
    )
    out = {
        r["doc_id"]: r
        for r in pack_sequences(df, capacity=256, block_size=2).collect()
    }
    # doc 0 fills chunk 0 exactly; doc 1 is the first token of chunk 1
    assert (out[0]["first_chunk"], out[0]["last_chunk"]) == (0, 0)
    assert (out[1]["first_chunk"], out[1]["last_chunk"]) == (1, 1)
    # doc 2 spans chunks 1..2 (tokens 257..767)
    assert (out[2]["first_chunk"], out[2]["last_chunk"], out[2]["n_chunks"]) \
        == (1, 2, 2)
    # empty doc: position preserved, zero chunks
    assert (out[3]["start_off"], out[3]["n_chunks"]) == (768, 0)


def test_rejects_bad_params(spark, corpus):
    with pytest.raises(ValueError):
        pack_sequences(corpus, capacity=0)
    with pytest.raises(ValueError):
        pack_sequences(corpus, block_size=0)


# --- snake-balanced shard packing (q149, round 5) ---

def test_snake_assignment_order(spark):
    from pathhier_spark.operators.packing import snake_shard_assignment

    # sizes 9..2, 2 shards: ranks 0..7, snake pattern 0,1,1,0,0,1,1,0
    docs = spark.createDataFrame(
        [(i, 10 - i) for i in range(1, 9)], "doc_id long, n_chars long"
    )
    got = {r["doc_id"]: (r["rank0"], r["shard"])
           for r in snake_shard_assignment(docs, n_shards=2).collect()}
    assert [got[i][0] for i in range(1, 9)] == list(range(8))
    assert [got[i][1] for i in range(1, 9)] == [0, 1, 1, 0, 0, 1, 1, 0]


def test_snake_balances_skewed_sizes(spark):
    from pyspark.sql import functions as F
    from pathhier_spark.operators.packing import snake_shard_assignment

    # one giant + many small docs: snake keeps shard totals within the
    # giant's size; modulo-by-id sharding would not be asserted here,
    # the balance bound is the contract
    rows = [(0, 1000)] + [(i, 10) for i in range(1, 41)]
    docs = spark.createDataFrame(rows, "doc_id long, n_chars long")
    a = snake_shard_assignment(docs, n_shards=4)
    totals = [
        r["t"] for r in
        a.groupBy("shard").agg(F.sum("n_chars").alias("t")).collect()
    ]
    assert len(totals) == 4
    assert max(totals) - min(totals) <= 1000
    # the small docs alone are dealt evenly: drop the giant's shard and
    # the rest are within one small doc of each other
    small = sorted(totals)[:3]
    assert max(small) - min(small) <= 10


def test_snake_ties_break_by_id(spark):
    from pathhier_spark.operators.packing import snake_shard_assignment

    docs = spark.createDataFrame(
        [(3, 5), (1, 5), (2, 5)], "doc_id long, n_chars long"
    )
    got = {r["doc_id"]: r["rank0"]
           for r in snake_shard_assignment(docs, n_shards=2).collect()}
    assert got == {1: 0, 2: 1, 3: 2}
