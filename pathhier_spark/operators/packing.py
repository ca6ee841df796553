"""Sequence packing for LLM training: concatenate documents in a
deterministic order and cut the token stream into fixed-capacity training
chunks (GPT-style concat-and-chunk), emitting each document's global token
offset and the chunk span it lands in.

The naive formulation is ONE window cumulative sum over the whole corpus —
a SinglePartition exchange, the canonical scale-killer. This module
computes the identical numbers with the classic two-level parallel prefix
sum: combiner-friendly per-block totals, a prefix walk over the tiny
block-totals table, then an independent within-block window per block.
Block granularity changes parallelism only, never results (asserted in
tests/test_packing.py by equality across block sizes and vs the naive
single window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    count_col: str = "n_tokens",
    capacity: int = 256,
    block_size: int = 1024,
) -> DataFrame:
    """Assign every document a token offset in the concatenation ordered by
    `id_col`, then the chunk ids covering it at `capacity` tokens/chunk.

    Output columns: id_col, n (the coalesced count), start_off (global
    token offset of the doc's first token), first_chunk, last_chunk,
    n_chunks (chunks the doc spans; 0 when n = 0, with
    last_chunk = first_chunk so empty docs still carry a position).

    Scale shape: blocks = id_col // block_size (any monotone bucketing of
    the order key works — granularity is a parallelism knob, not a
    semantics knob). Per-block totals are one combiner groupBy; the prefix
    walk is a window over the BLOCK TOTALS table (corpus_tokens /
    (block_size * avg_doc) rows — thousands at 100 TB, so its single
    partition is a non-issue, the q45 "window over the tiny domain"
    argument); the block-offset table broadcasts back; the within-block
    cumulative window partitions by block and runs fully parallel. NULL
    counts pack as 0 (position preserved, nothing consumed). Requires a
    numeric, unique order key; ties would make the concatenation order —
    and therefore every offset — undefined."""
    if capacity <= 0:
        raise ValueError(f"capacity must be positive, got {capacity}")
    if block_size <= 0:
        raise ValueError(f"block_size must be positive, got {block_size}")
    d = df.select(
        F.col(id_col).alias("_id"),
        F.coalesce(F.col(count_col), F.lit(0)).cast("long").alias("n"),
    ).withColumn("_blk", F.floor(F.col("_id") / F.lit(block_size)))
    blk_tot = d.groupBy("_blk").agg(F.sum("n").alias("_tot"))
    wblk = (
        Window.orderBy("_blk")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    blk_off = blk_tot.select(
        "_blk", (F.sum("_tot").over(wblk) - F.col("_tot")).alias("_off")
    )
    win = (
        Window.partitionBy("_blk")
        .orderBy("_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pos = d.join(F.broadcast(blk_off), "_blk").select(
        "_id",
        "n",
        (F.col("_off") + F.sum("n").over(win) - F.col("n")).alias(
            "start_off"
        ),
    )
    first = F.floor(F.col("start_off") / F.lit(capacity))
    last = F.when(F.col("n") > 0, F.floor(
        (F.col("start_off") + F.col("n") - 1) / F.lit(capacity)
    )).otherwise(first)
    return pos.select(
        F.col("_id").alias(id_col),
        "n",
        "start_off",
        first.cast("long").alias("first_chunk"),
        last.cast("long").alias("last_chunk"),
        F.when(F.col("n") > 0, last - first + 1)
        .otherwise(F.lit(0))
        .cast("long")
        .alias("n_chunks"),
    )


def chunk_with_overlap(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    size: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Split each document into overlapping token windows — the RAG /
    retrieval-indexing chunker (size-token windows every stride tokens,
    overlap = size - stride), the per-document counterpart of
    pack_sequences' corpus-level concat-and-chunk: packing feeds
    pretraining, overlapped chunking feeds embedding + retrieval indexes,
    and both consume the same whitespace tokenization (q21/q44/q45).

    Window rule (deterministic, engine-portable): chunk starts at every
    multiple of stride below n_tokens; each chunk covers
    min(size, n - start) tokens, so trailing chunks shrink rather than
    re-anchor (re-anchoring — snapping the last window to n-size — makes
    chunk content depend on n in a way incremental pipelines can't cache;
    a fixed start grid means a doc's chunk k never changes when text is
    appended). Empty docs produce no rows.

    Output: id_col, chunk_id (0-based), start_tok, chunk_len,
    chunk_md5 (md5 of the space-joined window — the dedup/content key;
    the text itself stays out of the output so the result table is
    index-sized, not corpus-sized).

    Scale shape: pure per-row column work — tokenize, F.sequence over the
    start grid, posexplode, F.slice — no shuffle at all (the plan is one
    map stage at scan speed); output rows ~ n_tokens/stride per doc.
    Chunk text is recomputable from (doc, start, len) on demand."""
    if size <= 0 or stride <= 0:
        raise ValueError(f"size and stride must be positive, got {size}/{stride}")
    # explicit whitespace class, not \s: Java's \s matches \x0B, RE2's (the
    # DuckDB oracle's) does not — the WS_SPLIT_RE parity rule (q21/q44/q45)
    from pathhier_spark.functions.text import WS_SPLIT_RE

    toks = F.filter(
        F.split(F.lower(F.col(text_col)), WS_SPLIT_RE), lambda t: t != ""
    )
    base = df.select(F.col(id_col), toks.alias("toks"), F.size(toks).alias("n"))
    exploded = base.select(
        id_col,
        "n",
        "toks",
        F.posexplode(starts_over("toks", stride)).alias("chunk_id", "start_tok"),
    )
    return exploded.select(
        id_col,
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.col("start_tok").cast("long").alias("start_tok"),
        F.least(F.lit(size), F.col("n") - F.col("start_tok"))
        .cast("long")
        .alias("chunk_len"),
        F.md5(
            F.array_join(
                F.slice(F.col("toks"), F.col("start_tok") + 1, F.lit(size)), " "
            )
        ).alias("chunk_md5"),
    )


def starts_over(toks_col: str, stride: int):
    """Start-offset grid for chunk_with_overlap: [0, stride, 2*stride, ...)
    up to (exclusive) the token count — empty array for empty docs."""
    n = F.size(F.col(toks_col))
    return F.when(
        n > 0, F.sequence(F.lit(0), n - 1, F.lit(stride))
    ).otherwise(F.array().cast("array<int>"))


def snake_shard_assignment(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    size_col: str = "n_chars",
    n_shards: int = 8,
) -> DataFrame:
    """Balanced output sharding by snake (boustrophedon) assignment:
    order documents by size descending, deal them across n_shards
    left-to-right then right-to-left alternately — the classic LPT-lite
    that keeps per-shard byte totals within one max-document of each
    other on skewed size distributions, where hash/modulo sharding can
    land several giants on one shard (the straggler file that stalls a
    training-data loader).

    The global size rank is computed WITHOUT a corpus-sized window (the
    q45 inverted-CDF discipline): a per-size-value combiner histogram,
    a cumulative walk over the tiny size-value domain, then a
    row_number window PARTITIONED BY the size value (each partition is
    one value group — no SinglePartition exchange). The oracle replays
    the rank as one global row_number — different mechanism, identical
    total order (size DESC, id ASC is tie-free).

    Returns one row per document: (id, size, rank0, shard), 0-based
    rank in the dealt order; aggregate per shard downstream."""
    sizes = df.select(F.col(id_col), F.col(size_col).cast("long").alias("sz"))
    hist = sizes.groupBy("sz").agg(F.count(F.lit(1)).alias("cnt"))
    w_dom = Window.orderBy(F.col("sz").desc())
    base = hist.select(
        "sz",
        (F.coalesce(F.sum("cnt").over(w_dom), F.lit(0)) - F.col("cnt"))
        .cast("long")
        .alias("base"),
    )
    w_val = Window.partitionBy("sz").orderBy(F.col(id_col))
    ranked = (
        sizes.join(base, "sz")
        .withColumn("intra", F.row_number().over(w_val) - 1)
        .withColumn("rank0", (F.col("base") + F.col("intra")).cast("long"))
    )
    k = int(n_shards)
    # integer block index (never float-divide a rank: double rounding can
    # misplace the floor at exact block boundaries for huge corpora)
    shard = F.when(
        F.expr(f"rank0 DIV {k}") % 2 == 0, F.col("rank0") % k
    ).otherwise(k - 1 - F.col("rank0") % k)
    return ranked.select(
        F.col(id_col),
        F.col("sz").alias(size_col),
        "rank0",
        shard.cast("int").alias("shard"),
    )


def rendezvous_shard(
    df: DataFrame,
    *,
    n_shards: int,
    id_col: str = "doc_id",
    out_col: str = "shard",
    salt: str = "rdv",
) -> DataFrame:
    """Rendezvous (highest-random-weight) shard assignment: each row
    goes to the shard s in [0, n_shards) maximizing
    md5(salt || ':' || id || ':' || s) — the consistent-hashing
    discipline a 100 TB ingest needs: when the fleet grows from N to
    N+1 shards, ONLY rows whose new winner IS the new shard move
    (every old shard keeps its relative order under any surviving
    shard, so no row reshuffles between survivors — expected movement
    exactly 1/(N+1), the provable minimum; modulo sharding moves
    ~N/(N+1) of the corpus by contrast). Deterministic and
    engine-portable: md5 hex compares lexicographically the same
    everywhere; ties (never in practice) break toward the HIGHER shard
    id via struct ordering.

    Scale shape: map-only — one array_max over an n_shards-length
    in-row array of (hash, shard) structs, no explode, no shuffle, no
    state; n_shards is a literal, so the whole assignment inlines into
    the scan's codegen. Output: df plus `out_col` int."""
    if n_shards < 1:
        raise ValueError("rendezvous_shard needs n_shards >= 1")
    best = F.array_max(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_shards - 1)),
            lambda s: F.struct(
                F.md5(
                    F.concat_ws(
                        ":",
                        F.lit(salt),
                        F.col(id_col).cast("string"),
                        s.cast("string"),
                    )
                ).alias("h"),
                s.cast("int").alias("s"),
            ),
        )
    )
    return df.withColumn(out_col, best.getField("s"))
