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
    pathway.py:741-747). State is bounded by the watermark — late
    re-crawls beyond it are treated as new versions by design."""
    return docs_stream.withWatermark("warc_ts", watermark).dropDuplicates(
        ["url"]
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
