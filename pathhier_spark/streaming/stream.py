"""Structured Streaming surface.

The reference is batch-only (SURVEY.md §2.9: no streaming operators), but the
engine's layout is streaming-ready: documents partitioned by crawl date, all
extraction transforms stateless. This module wires the same extract stage as
a streaming job — file-source -> extraction -> watermarked windowed counts ->
sink — so a continuously-crawled corpus can feed the pipeline incrementally.

The transformations reuse the exact batch functions (extract_mentions is a
pure column-expression transform, legal in streaming); only the source/sink
differ. Watermark handles late crawl records.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pathhier_spark.operators.extract import extract_mentions
from pathhier_spark.sources.corpus import DOCUMENTS_SCHEMA


def stream_documents(
    spark: SparkSession, input_dir: str, max_files_per_trigger: int = 4
) -> DataFrame:
    """File-source stream over a documents parquet directory (new files =
    new crawl batches)."""
    return (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )


def streaming_mention_counts(
    docs_stream: DataFrame,
    *,
    watermark: str = "10 minutes",
    window: str = "5 minutes",
) -> DataFrame:
    """Stateless extraction + stateful windowed aggregation with a watermark
    for late data: mentions per predicate per crawl-time window."""
    mentions = extract_mentions(
        docs_stream.select("url", "warc_ts", F.col("text")),
        passthrough=("warc_ts",),
    )
    return (
        mentions.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window), "pred")
        .agg(F.count(F.lit(1)).alias("n_mentions"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "pred",
            "n_mentions",
        )
    )


def streaming_dedup(
    docs_stream: DataFrame, *, watermark: str = "1 hour"
) -> DataFrame:
    """Stateful streaming dedup: first occurrence per url wins within the
    watermark horizon (the streaming analog of dedup.exact_dedup /
    pathway.py:741-747). dropDuplicatesWithinWatermark — NOT plain
    dropDuplicates(subset) — because with a subset that excludes the
    event-time column the watermark never evicts dedup state: a
    continuously-crawled corpus would accumulate one state row per key
    forever. WithinWatermark evicts each key once it falls behind the
    horizon, so state size ~ keys per horizon and a late re-crawl beyond it
    is a new version by design."""
    return docs_stream.withWatermark(
        "warc_ts", watermark
    ).dropDuplicatesWithinWatermark(["url"])


def _duration_ms(spec: str) -> int:
    """'30 minutes' / '10 seconds' / '1 hour' -> milliseconds."""
    n, unit = spec.split()
    mult = {
        "second": 1_000, "seconds": 1_000,
        "minute": 60_000, "minutes": 60_000,
        "hour": 3_600_000, "hours": 3_600_000,
    }[unit]
    return int(n) * mult


def streaming_stateful_dedup(
    docs_stream: DataFrame,
    *,
    watermark: str = "10 minutes",
    expire_after: str = "30 minutes",
    id_col: str = "url",
    ts_col: str = "warc_ts",
) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState — the
    explicit-state analog of streaming_dedup: per-key state (occurrence
    count) with an event-time timeout. Emits ('first', n) when a key is
    first seen, ('expired', n) when its state times out `expire_after` past
    the watermark; duplicates within the horizon update state silently; a
    key reappearing after expiry emits 'first' again. State stays bounded by
    the expiry horizon — the contract a continuously-crawled 100 TB corpus
    needs (state size ~ keys per horizon, not total keys ever seen)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    horizon_ms = _duration_ms(expire_after)
    out_schema = f"{id_col} string, event string, n_seen long"
    state_schema = "n_seen long, last_ms long"
    # Arrow hands the worker tz-NAIVE timestamps rendered in the session
    # timezone, while getCurrentWatermarkMs is epoch-UTC — localize with the
    # session tz before converting, or every expiry is shifted by the tz
    # offset (pd.Timestamp.timestamp() treats naive as UTC)
    session_tz = docs_stream.sparkSession.conf.get(
        "spark.sql.session.timeZone", "UTC"
    )

    def fn(key, pdfs, state):
        if state.hasTimedOut:
            n, _last = state.get
            state.remove()
            yield pd.DataFrame(
                {id_col: [key[0]], "event": ["expired"], "n_seen": [n]}
            )
        else:
            n_new = 0
            batch_max_ms = 0
            for p in pdfs:
                n_new += len(p)
                if len(p):
                    ts = p[ts_col].max()
                    if ts.tzinfo is None:
                        ts = ts.tz_localize(session_tz)
                    batch_max_ms = max(batch_max_ms, int(ts.timestamp() * 1000))
            first = not state.exists
            n_prev, last_prev = state.get if state.exists else (0, 0)
            n = n_prev + n_new
            last_ms = max(last_prev, batch_max_ms)
            state.update((n, last_ms))
            # expire `expire_after` past the key's last event time, anchored
            # to event time (NOT the watermark — at the first trigger the
            # watermark is still epoch 0 and the state would expire
            # instantly); clamp above the watermark as the API requires
            state.setTimeoutTimestamp(
                max(last_ms + horizon_ms, state.getCurrentWatermarkMs() + 1)
            )
            if first:
                yield pd.DataFrame(
                    {id_col: [key[0]], "event": ["first"], "n_seen": [n]}
                )

    return (
        docs_stream.withWatermark(ts_col, watermark)
        .groupBy(id_col)
        .applyInPandasWithState(
            fn, out_schema, state_schema, "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


def run_stream_to_memory(
    spark: SparkSession, input_dir: str, query_name: str = "mention_counts"
):
    """Start the stream into an in-memory sink (tests / demos). Returns the
    StreamingQuery; caller awaits processAllAvailable() then reads
    spark.sql(f"select * from {query_name}")."""
    counts = streaming_mention_counts(stream_documents(spark, input_dir))
    return (
        counts.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .start()
    )


def streaming_session_counts(
    docs_stream: DataFrame,
    *,
    watermark: str = "10 minutes",
    gap: str = "30 minutes",
    key_col: str = "url",
    ts_col: str = "warc_ts",
) -> DataFrame:
    """Streaming sessionization — the streaming analog of the batch q16
    gap-sessionize: Spark's native session_window merges events per key into
    sessions that close after `gap` of event-time silence; the watermark
    bounds state and finalizes sessions. Output: (key, session_start,
    session_end, n_events), emitted in append mode once the watermark passes
    a session's end."""
    return (
        docs_stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col(key_col),
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


def streaming_join_annotations(
    docs_stream: DataFrame,
    ann_stream: DataFrame,
    *,
    watermark: str = "10 minutes",
    join_window: str = "30 minutes",
) -> DataFrame:
    """Watermarked stream-stream inner join: a crawl stream (url, warc_ts)
    joins an annotation stream (ann_url, label, ann_ts) on url within an
    event-time interval |ann_ts - warc_ts| <= join_window. Watermarks on
    BOTH sides + the interval condition let Spark bound the join state (rows
    older than watermark + window are evicted) — without them a stream-stream
    join buffers forever. Output: (url, warc_ts, label, ann_ts)."""
    d = docs_stream.withWatermark("warc_ts", watermark)
    a = ann_stream.withWatermark("ann_ts", watermark)
    cond = (
        (F.col("url") == F.col("ann_url"))
        & (F.col("ann_ts") >= F.expr(f"warc_ts - interval {join_window}"))
        & (F.col("ann_ts") <= F.expr(f"warc_ts + interval {join_window}"))
    )
    return d.join(a, cond).select("url", "warc_ts", "label", "ann_ts")


def stream_to_warehouse(
    stream_df: DataFrame,
    warehouse,
    table: str,
    *,
    checkpoint_dir: str,
    partition_by: list[str] | None = None,
    allow_new_columns: bool = False,
    allow_missing_columns: bool = False,
):
    """foreachBatch sink committing each micro-batch into the Warehouse as
    an append with fingerprint 'batch:<id>'. Combined with the streaming
    checkpoint this is exactly-once at the table level: after a crash
    between the data write and the offset commit, Spark replays the batch
    with the SAME batch_id and Warehouse.write skips the matching
    fingerprint instead of duplicating rows. Returns the StreamingQuery.

    The schema-evolution flags pass through to Warehouse.write: a stream
    restarted against a source that gained (or lost) a column would
    otherwise fail the sink's append validation inside _commit with no
    opt-in path, killing the StreamingQuery."""

    def _commit(batch_df: DataFrame, batch_id: int) -> None:
        warehouse.write(
            batch_df, table,
            partition_by=partition_by, mode="append",
            fingerprint=f"batch:{batch_id}",
            allow_new_columns=allow_new_columns,
            allow_missing_columns=allow_missing_columns,
        )

    return (
        stream_df.writeStream.foreachBatch(_commit)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )


def stream_training_corpus(
    docs_stream: DataFrame,
    *,
    quality_floor: float = 0.5,
    lang: str = "en",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming analog of the q35 batch prep funnel: quality scoring +
    language ID (stateless column expressions — the exact batch operators,
    legal in streaming) -> content-hash exact dedup (stateful
    dropDuplicatesWithinWatermark). A continuously-crawled corpus flows through the same
    funnel the batch pipeline applies, with dedup state bounded by the
    watermark horizon (the first copy of a text wins within it; a re-crawl
    beyond the horizon is a new version by design — same contract as
    streaming_dedup). Output: the surviving documents plus their quality /
    language / hash columns."""
    from pathhier_spark.operators.textstats import (
        with_lang_id,
        with_quality_features,
    )

    scored = with_lang_id(with_quality_features(docs_stream))
    kept = scored.filter(
        (F.col("quality_score") >= quality_floor) & (F.col("lang_pred") == lang)
    )
    # WithinWatermark, not dropDuplicates(subset): see streaming_dedup —
    # a subset without the event-time column is never evicted from state
    return (
        kept.withColumn("content_hash", F.md5(F.col("text")))
        .withWatermark("warc_ts", watermark)
        .dropDuplicatesWithinWatermark(["content_hash"])
    )


def stream_hll_rollup(
    stream_df: DataFrame,
    warehouse,
    table: str,
    group_col: str,
    col: str,
    *,
    m: int = 64,
    prefix: str = "hll",
    checkpoint_dir: str,
):
    """Incrementally maintained per-group HyperLogLog sketches: each
    micro-batch's grouped registers (textstats.hll_registers_grouped) are
    APPENDED to the warehouse as a sketch delta — exactly-once via the
    batch-id fingerprint — and readers max-merge deltas at query time
    (hll_rollup_read). Append-only beats read-modify-write here twice
    over: no cross-writer races, and register max-merge is commutative /
    idempotent, so even a replayed delta that slipped past the
    fingerprint would not change a single register. This is the q82
    'store sketches per shard/day, never rescan history' shape running
    live: the corpus-sized token stream is reduced to m-row frames inside
    each micro-batch, and nothing downstream ever touches raw text.
    Returns the StreamingQuery."""
    from pathhier_spark.operators.textstats import hll_registers_grouped

    def _commit(batch_df: DataFrame, batch_id: int) -> None:
        regs = hll_registers_grouped(
            batch_df, group_col, col, m=m, prefix=prefix
        )
        warehouse.write(
            regs, table, mode="append", fingerprint=f"batch:{batch_id}"
        )

    return (
        stream_df.writeStream.foreachBatch(_commit)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )


def hll_rollup_read(
    warehouse, table: str, group_col: str
) -> DataFrame:
    """Max-merge the appended sketch deltas of stream_hll_rollup back into
    one dense register frame per group — input rows = m x groups x
    batches (tiny), so the merge never touches corpus data."""
    return (
        warehouse.read(table)
        .groupBy(group_col, "j")
        .agg(F.max("reg").cast("long").alias("reg"))
    )


def stream_kg_ingest(
    docs_stream: DataFrame,
    ontology: DataFrame,
    warehouse_root: str,
    *,
    checkpoint_dir: str,
    edges_table: str = "kg_edges",
):
    """Continuous crawl -> KG: every micro-batch of pages runs the FULL
    incremental pipeline (plans.pipeline.run_pipeline_incremental —
    extract, link, assemble, url-keyed merge into the warehouse edge
    table), so a re-crawled url's edges are replaced and an
    empty re-crawl tombstones them, continuously. foreachBatch rather
    than a streaming plan because linking joins + the COW merge aren't
    expressible as one incremental streaming query — the standard
    Structured Streaming escape hatch for batch-shaped sinks.

    Exactly-once at the table level, same argument as stream_to_warehouse:
    Spark replays a crashed micro-batch under the SAME batch_id, and the
    merge no-ops on the already-applied 'stream:<id>' fingerprint. Within
    one run batch_ids are monotone, so the stale-batch guard
    (Warehouse.merge's carried-forward applied set) only ever suppresses
    true replays, never fresh batches.

    Batch-wise == full-recompute equivalence carries over verbatim from
    run_pipeline_incremental (no stage holds corpus state); the streaming
    form just decides WHEN batches happen. A url crawled twice WITHIN one
    micro-batch keeps only its latest version (max warc_ts, content-hash
    tie-break) before the pipeline runs — otherwise both versions' edges
    would union under the url, something the per-url merge can only
    prevent ACROSS batches. Returns the StreamingQuery."""
    from pyspark.sql import Window

    from pathhier_spark.plans.pipeline import run_pipeline_incremental

    def _commit(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.isEmpty():
            w = Window.partitionBy("url").orderBy(
                F.col("warc_ts").desc(), F.md5(F.col("html")).desc()
            )
            latest = (
                batch_df.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .drop("_rn")
            )
            run_pipeline_incremental(
                batch_df.sparkSession, latest, ontology, warehouse_root,
                f"stream:{batch_id}", edges_table=edges_table,
            )

    return (
        docs_stream.writeStream.foreachBatch(_commit)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )


def stream_countmin_rollup(
    stream_df: DataFrame,
    warehouse,
    table: str,
    col: str,
    *,
    width: int = 1024,
    depth: int = 4,
    checkpoint_dir: str,
):
    """Incrementally maintained count-min frequency sketch: each
    micro-batch's sketch cells (textstats.countmin_sketch) append to the
    warehouse as a delta; readers SUM deltas at query time
    (countmin_rollup_read). The exactly-once contrast with
    stream_hll_rollup is the point: HLL deltas merge by MAX (idempotent —
    a replayed delta is harmless), count-min deltas merge by ADDITION
    (a replayed delta double-counts), so here the warehouse's batch-id
    fingerprint is load-bearing correctness, not belt-and-braces. The
    parity test feeds the same corpus through the stream and through one
    batch countmin_sketch and asserts the merged counter tables are
    IDENTICAL cell-for-cell — the sketch is deterministic, so streaming
    changes nothing about the answer, only about when the work happens.
    Returns the StreamingQuery."""
    from pathhier_spark.operators.textstats import countmin_sketch

    def _commit(batch_df: DataFrame, batch_id: int) -> None:
        cells = countmin_sketch(batch_df, col, width=width, depth=depth)
        warehouse.write(
            cells, table, mode="append", fingerprint=f"batch:{batch_id}"
        )

    return (
        stream_df.writeStream.foreachBatch(_commit)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )


def countmin_rollup_read(warehouse, table: str) -> DataFrame:
    """Sum-merge the appended count-min deltas back into one sketch —
    input rows <= depth x width x batches (sketch-sized, never
    corpus-sized)."""
    return (
        warehouse.read(table)
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )


def streaming_daily_counts(
    events_stream: DataFrame,
    *,
    watermark: str = "1 day",
    series_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Watermarked tumbling-day counts per event series — the streaming
    producer for the rate-anomaly path: stream -> daily counts ->
    (exactly-once warehouse commit) -> batch rate_anomalies_from_daily.
    A day's count finalizes (append-mode emit) once the watermark passes
    the window end, so state is bounded by |series| x watermark-days.
    Output: (series, day DATE, x) — the exact input shape of
    operators/temporal.rate_anomalies_from_daily; parity with the batch
    rate_anomalies over the same events is asserted in
    tests/test_streaming.py."""
    return (
        events_stream.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(F.col(ts_col), "1 day").alias("w"),
            F.col(series_col).alias("series"),
        )
        .agg(F.count(F.lit(1)).alias("x"))
        .select("series", F.col("w.start").cast("date").alias("day"), "x")
    )


def streaming_trending_terms(
    docs_stream: DataFrame,
    *,
    watermark: str = "10 minutes",
    window: str = "10 minutes",
    slide: str = "5 minutes",
    text_col: str = "text",
    ts_col: str = "warc_ts",
) -> DataFrame:
    """SLIDING-window streaming term counts — the trending detector, and
    the overlapping-window pattern the tumbling aggregations here
    (streaming_mention_counts, stream_hll_rollup) don't exercise: with
    window/slide overlap every event lands in window÷slide windows, so
    a term burst surfaces while it is STILL RISING instead of after a
    tumbling window closes — at the cost of window÷slide× aggregation
    state, which the watermark still bounds (closed windows evict).

    Emits raw (window, token, n) counts rather than a top-k: ranking
    inside the stream would force complete output mode (unbounded
    result state); rank-at-read keeps the sink append-only and the
    state watermark-bounded — the same split as stream_hll_rollup
    (sketch in the stream, estimate at read). Batch parity is free by
    construction: F.window(ts, window, slide) is the identical
    expression in batch, so the same groupBy over the same static table
    must produce identical counts (pinned in tests, the funnel-parity
    discipline). Output: (window_start, window_end, token, n)."""
    from pathhier_spark.operators.textstats import _tokens

    toks = docs_stream.withWatermark(ts_col, watermark).select(
        F.col(ts_col).alias("_ts"), F.explode(_tokens(text_col)).alias("token")
    )
    return (
        toks.groupBy(F.window("_ts", window, slide), "token")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "token",
            "n",
        )
    )
