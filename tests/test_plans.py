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


def test_rendezvous_shard_is_map_only(spark):
    """rendezvous_shard's 100 TB claim is zero-shuffle: the in-row
    struct-array argmax must compile to a plain projection — any
    Exchange or explode (Generate) means the map-only claim broke."""
    from pathhier_spark.operators.packing import rendezvous_shard

    df = spark.createDataFrame([(1,)], "doc_id long")
    plan = _plan(rendezvous_shard(df, n_shards=8))
    assert "Exchange" not in plan
    assert "Generate" not in plan


def test_signal_correlations_single_scan(spark):
    """signal_correlations claims ONE fused aggregate pass: the plan
    must contain exactly one scan of the input and no join — a second
    scan or a join means the moments stopped fusing."""
    from pathhier_spark.operators.profile import signal_correlations

    df = spark.createDataFrame([(1, 2)], "a long, b long").localCheckpoint()
    # simple mode: formatted mode lists each node twice (tree + details)
    plan = _plan(signal_correlations(df, cols=["a", "b"]), mode="simple")
    assert plan.count("Scan ExistingRDD") == 1
    assert "Join" not in plan
    assert "partial_sum" in plan  # map-side combine actually planned


def test_winnowing_selection_is_map_only(spark):
    """The winnowing SELECTION (before any pairing join) must be
    map-only: one Generate for the final explode is expected, but no
    Exchange — per-window mins are in-row expressions, not a shuffle."""
    from pathhier_spark.operators.textstats import winnowing_fingerprints

    df = spark.createDataFrame([(1, "a b c d e f")], "doc_id long, text string")
    plan = _plan(winnowing_fingerprints(df))
    assert "Exchange" not in plan


def test_pr_curve_windows_run_on_histogram_not_corpus(spark):
    """pr_curve's SinglePartition window is legal ONLY above the
    score-histogram aggregate (q45 discipline): the plan must aggregate
    (HashAggregate) BEFORE the Window operator — window-over-raw-rows
    would sort the corpus."""
    from pathhier_spark.operators.profile import pr_curve

    df = spark.createDataFrame([(1, True)], "score_fp long, is_pos boolean")
    plan = _plan(pr_curve(df), mode="simple")
    w = plan.index("Window")
    assert "HashAggregate" in plan[w:], "no aggregate below the window"


def test_calibration_bins_no_window_no_single_partition_sort(spark):
    """calibration_bins claims one combiner groupBy straight to the
    bins table — no Window operator anywhere."""
    from pathhier_spark.operators.profile import calibration_bins

    df = spark.createDataFrame([(1, True)], "score_fp long, is_pos boolean")
    assert "Window" not in _plan(calibration_bins(df))


def test_interval_coverage_windows_by_key_not_global(spark):
    """interval_coverage claims its sweep window partitions BY KEY —
    no SinglePartition anywhere in the plan."""
    from pathhier_spark.operators.temporal import interval_coverage

    df = spark.createDataFrame(
        [(1, 0, 10)], "user_id long, start long, end long"
    )
    assert "SinglePartition" not in _plan(interval_coverage(df))


def test_decayed_engagement_has_partial_aggregation(spark):
    """decayed_engagement claims map-side partial sums: the plan must
    show a partial HashAggregate before the exchange and no Window."""
    from pathhier_spark.operators.temporal import decayed_engagement

    df = spark.createDataFrame(
        [(1, "a", None, 1.0)],
        "user_id long, event_type string, ts timestamp, value double",
    )
    plan = _plan(decayed_engagement(df, anchor_us=0))
    assert "partial" in plan.lower()
    assert "Window" not in plan


def test_dbscan_grid_join_is_equi_not_cartesian(spark):
    """dbscan_2d claims the radius search is an equi-join on grid
    cells — no CartesianProduct / BroadcastNestedLoopJoin in the
    candidate-pair subplan."""
    from pathhier_spark.operators.similarity import dbscan_2d

    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [0.001, 0.0]), (3, [0.5, 0.5])],
        "vec_id long, embedding array<float>",
    )
    plan = _plan(dbscan_2d(df, eps_q=20_000, min_pts=2))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_proximity_search_no_nested_loop(spark):
    """proximity_search's pair-distance check is an equi-join on doc —
    the |p1-p2| filter must be a post-filter, not a join condition that
    degrades to a nested loop."""
    from pathhier_spark.operators.retrieval import proximity_search

    df = spark.createDataFrame([(1, "join merge")], "doc_id long, text string")
    plan = _plan(proximity_search(df, "join", "merge", slop=3))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_allen_census_pair_join_is_keyed(spark):
    """allen_relation_counts' pairwise census joins equi ON KEY; the
    lex-order canonicalization must stay a filter, not force a
    cartesian plan."""
    from pathhier_spark.operators.temporal import allen_relation_counts

    df = spark.createDataFrame(
        [(1, 1, 0, 10), (1, 2, 5, 12)],
        "user_id long, event_id long, start long, end long",
    )
    plan = _plan(allen_relation_counts(df))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_entry_links_join_not_hint_broadcast(spark):
    """entry()'s links table is distinct-surface-form-sized and grows
    with the corpus — the flagship query must NOT force-broadcast it
    (VERDICT r5 item 1; plans/pipeline.py:203-208 states the rule).
    AQE may still choose a broadcast at gate scale from size evidence;
    what is pinned here is that no broadcast HINT forces it."""
    import __spark_entry__ as entry_mod

    df = entry_mod.entry(spark)
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    assert "ResolvedHint" not in optimized
    assert df.count() > 0
