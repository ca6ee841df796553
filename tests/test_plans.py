"""Physical-plan regression tests: every operator docstring in this repo
makes a scale claim ("broadcasts", "no SinglePartition", "map-only", "the
scan prunes columns") — these tests pin the claims to the ACTUAL Catalyst
output so a refactor that silently de-optimizes a plan fails CI, not a
100 TB run. String-matching explain output is deliberately coarse: the
assertions target operator names (BroadcastNestedLoopJoin, SinglePartition,
Exchange), not formatting."""

import pytest
from pyspark.sql import functions as F


def _plan(df, mode="formatted"):
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode
    )


def test_url_prefix_filter_broadcasts_rules(spark):
    """The startswith theta join must be a BROADCAST nested-loop join —
    a non-broadcast NLJ over the corpus would be quadratic-shaped."""
    from pathhier_spark.operators.urls import url_prefix_filter

    urls = spark.createDataFrame([("https://h/a",)], "url string")
    rules = spark.createDataFrame(
        [("https://h", 1)], "prefix string, allow int"
    )
    plan = _plan(url_prefix_filter(urls, rules))
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_gapfill_and_change_intervals_no_single_partition(spark):
    """Both temporal windows partition by the series/entity key — a
    global (SinglePartition) window anywhere means the per-key claim
    broke."""
    import datetime as dt
    from pathhier_spark.operators.temporal import (
        change_intervals,
        gapfill_locf,
    )

    daily = spark.createDataFrame(
        [("a", dt.date(2024, 1, 1), 1)], "series string, day date, value long"
    )
    assert "SinglePartition" not in _plan(gapfill_locf(daily))
    ev = spark.createDataFrame(
        [("u", dt.datetime(2024, 1, 1), 1, "A")],
        "key string, ts timestamp, eid long, value string",
    )
    assert "SinglePartition" not in _plan(
        change_intervals(ev, tiebreak_col="eid")
    )


def test_epoch_shuffle_window_partitions_by_shard(spark):
    """The position ranking must never be a global window."""
    from pathhier_spark.operators.sampling import epoch_shuffle

    df = spark.createDataFrame([(1, "t")], "doc_id long, text string")
    assert "SinglePartition" not in _plan(epoch_shuffle(df))


def test_docs_scan_prunes_columns(spark):
    """Column pruning reaches the parquet scan: a doc_id-only projection
    must not read the text column (ReadSchema shows the pruned struct)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = docs.filter(F.col("doc_id") % 16 != 0).select("doc_id")
    plan = _plan(out)
    assert "ReadSchema" in plan
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "doc_id" in read_schema and "text" not in read_schema


def test_trustrank_round_has_no_cartesian(spark):
    """Each fixed-point round is an equi-join on the node key — a
    refactor degrading it to a cartesian/NLJ would melt at scale."""
    from pathhier_spark.operators.graph import trustrank_fixedpoint

    e = spark.createDataFrame([("a", "b")], "src string, dst string")
    seeds = spark.createDataFrame([("a",)], "node string")
    plan = _plan(trustrank_fixedpoint(e, seeds, iterations=1))
    assert "CartesianProduct" not in plan


def test_exact_dedup_uses_aggregate_not_window(spark):
    """exact_dedup's docstring promises a combiner aggregate, NOT a
    window over content_hash (no map-side combine -> hot-hash funnel)."""
    from pathhier_spark.operators.dedup import exact_dedup

    df = spark.createDataFrame([(1, "t")], "doc_id long, text string")
    plan = _plan(exact_dedup(df))
    assert "Window" not in plan
    assert "HashAggregate" in plan or "SortAggregate" in plan
