"""Structured Streaming extraction: file source -> watermarked windowed agg."""

from pyspark.sql import functions as F

from pathhier_spark.sources import corpus as corpus_mod
from pathhier_spark.streaming.stream import run_stream_to_memory


def test_streaming_mention_counts(spark, tmp_path):
    c = corpus_mod.generate(n_classes=30, n_docs=60, seed=42)
    docs, *_ = corpus_mod.to_spark(spark, c)
    input_dir = str(tmp_path / "docs_stream")
    # two "crawl batches" as separate files
    docs.filter(F.col("url").substr(-1, 1).isin("0", "1", "2", "3", "4")).coalesce(
        1
    ).write.mode("append").parquet(input_dir)
    docs.filter(~F.col("url").substr(-1, 1).isin("0", "1", "2", "3", "4")).coalesce(
        1
    ).write.mode("append").parquet(input_dir)

    q = run_stream_to_memory(spark, input_dir, query_name="mc_test")
    try:
        q.processAllAvailable()
        out = spark.sql("select * from mc_test")
        rows = out.collect()
        assert rows, "stream produced no windows"
        total = sum(r["n_mentions"] for r in rows)
        assert total == len(c.gold_triples)
        assert {r["pred"] for r in rows} <= {
            "participant", "controller", "component", "member", "to", "other"
        }
    finally:
        q.stop()
