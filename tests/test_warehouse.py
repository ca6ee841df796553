"""Warehouse writer (Iceberg-style manifest commits) + per-partition lineage
+ streaming dedup."""

import json
import os

from pyspark.sql import functions as F

from pathhier_spark.sources.warehouse import Warehouse


def test_warehouse_commit_and_idempotence(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    assert wh.fmt == "parquet"  # no iceberg jar in sandbox
    df = spark.createDataFrame(
        [(1, "participant"), (2, "component"), (3, "participant")],
        "id long, pred string",
    )
    wh.write(df, "edges", partition_by=["pred"], fingerprint="v1")
    man = wh.manifest("edges")
    assert man["fingerprint"] == "v1" and man["partition_by"] == ["pred"]
    back = wh.read("edges")
    assert back.count() == 3
    # partitioned layout on disk
    assert any(
        p.startswith("pred=") for p in os.listdir(man["snapshot"])
    )
    # same fingerprint -> no-op (mtime unchanged)
    mtime = os.path.getmtime(wh._manifest_path("edges"))
    wh.write(df, "edges", partition_by=["pred"], fingerprint="v1")
    assert os.path.getmtime(wh._manifest_path("edges")) == mtime
    # new fingerprint -> recommit
    wh.write(df.limit(1), "edges", partition_by=["pred"], fingerprint="v2")
    assert wh.manifest("edges")["fingerprint"] == "v2"
    assert wh.read("edges").count() == 1


def test_per_partition_lineage(spark, tmp_path):
    from pathhier_spark.plans.checkpoint import CheckpointManager

    cp = CheckpointManager(spark, str(tmp_path / "cp"))
    df = spark.createDataFrame(
        [(i, "a" if i % 2 else "b") for i in range(10)], "id long, part string"
    )
    cp.stage("s1", lambda: df, fingerprint="f1", partition_by=["part"])
    rows = cp.lineage()
    assert rows[-1]["rows"] == 10
    per = {p["partition"]: p["rows"] for p in json.loads(rows[-1]["partition_rows"])}
    assert per == {"part=a": 5, "part=b": 5}


def test_streaming_dedup(spark, tmp_path):
    from pathhier_spark.sources import corpus as corpus_mod
    from pathhier_spark.streaming.stream import stream_documents, streaming_dedup

    c = corpus_mod.generate(n_classes=20, n_docs=30, seed=42)
    docs, *_ = corpus_mod.to_spark(spark, c)
    input_dir = str(tmp_path / "stream_in")
    docs.coalesce(1).write.mode("append").parquet(input_dir)
    docs.coalesce(1).write.mode("append").parquet(input_dir)  # duplicate batch

    deduped = streaming_dedup(stream_documents(spark, input_dir))
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_test")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        n = spark.sql("select count(distinct url) c, count(*) n from dedup_test").collect()[0]
        assert n["n"] == 30 and n["c"] == 30  # duplicates dropped
    finally:
        q.stop()


def test_compaction(spark, tmp_path):
    """Small-files compaction: a 64-file table rewrites to few files in a new
    snapshot, the manifest pointer swaps atomically, rows are identical, and
    the old snapshot stays on disk (time-travel/crash safety)."""
    import os

    from pathhier_spark.sources.warehouse import Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh"), fmt="parquet")
    df = spark.range(10000).selectExpr("id", "id % 7 AS k")
    wh.write(df.repartition(64), "tiny", fingerprint="v1")
    old_snap = wh.manifest("tiny")["snapshot"]

    stats = wh.compact("tiny", target_file_bytes=64 * 1024 * 1024,
                       sort_within_by=["k"])
    assert stats["files_before"] >= 32
    assert stats["files_after"] < stats["files_before"]
    man = wh.manifest("tiny")
    assert man["snapshot"] != old_snap and man["compaction"]["files_after"] == stats["files_after"]
    # rows identical through the swapped pointer
    got = wh.read("tiny")
    assert got.count() == 10000
    assert got.agg({"id": "sum"}).collect()[0][0] == sum(range(10000))
    # old snapshot untouched (readers of it are unaffected)
    assert os.path.exists(os.path.join(old_snap, "_SUCCESS"))


def test_compaction_partitioned(spark, tmp_path):
    from pathhier_spark.sources.warehouse import Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh2"), fmt="parquet")
    df = spark.range(5000).selectExpr("id", "id % 3 AS part")
    wh.write(df.repartition(32), "ptab", partition_by=["part"], fingerprint="v1")
    stats = wh.compact("ptab")
    assert stats["files_after"] <= stats["files_before"]
    got = wh.read("ptab")
    assert got.count() == 5000
    # partition column survives the rewrite
    assert {r["part"] for r in got.select("part").distinct().collect()} == {0, 1, 2}


def test_append_fingerprint_discipline(spark, tmp_path):
    """ADVICE r2: (a) append requires an explicit fingerprint — the 'static'
    default would silently dedupe the second append; (b) appends dedupe
    against ALL applied append fingerprints, not just the last; (c) each
    write owns its own sub-directory, so uncommitted data is invisible and
    a replayed batch overwrites itself instead of duplicating."""
    import os

    import pytest as _pytest

    wh = Warehouse(spark, str(tmp_path / "wh3"), fmt="parquet")
    df1 = spark.createDataFrame([(1,), (2,)], "id long")
    df2 = spark.createDataFrame([(3,)], "id long")

    wh.write(df1, "t", fingerprint="base")
    with _pytest.raises(ValueError, match="explicit fingerprint"):
        wh.write(df2, "t", mode="append")

    wh.write(df2, "t", mode="append", fingerprint="batch:0")
    assert wh.read("t").count() == 3
    # replay of an OLD batch (not the latest) is still skipped
    wh.write(df2, "t", mode="append", fingerprint="batch:0")
    assert wh.read("t").count() == 3
    wh.write(df2, "t", mode="append", fingerprint="batch:1")
    assert wh.read("t").count() == 4
    wh.write(df2, "t", mode="append", fingerprint="batch:0")
    assert wh.read("t").count() == 4

    man = wh.manifest("t")
    assert len(man["snapshots"]) == 3
    assert set(man["applied_fingerprints"]) == {"base", "batch:0", "batch:1"}

    # crash-window safety: a data dir NOT in the manifest is invisible
    orphan = os.path.join(str(tmp_path / "wh3"), "t", "data_deadbeefdeadbeef")
    df2.write.mode("overwrite").parquet(orphan)
    assert wh.read("t").count() == 4

    # an overwrite resets the snapshot list and the applied set
    wh.write(df1, "t", fingerprint="base2")
    assert wh.read("t").count() == 2
    assert wh.manifest("t")["snapshots"] == [wh.manifest("t")["snapshot"]]


def test_compaction_conflict_detection(spark, tmp_path):
    """compact() aborts (instead of dropping the commit) when another write
    lands between its manifest read and its pointer swap."""
    import pytest as _pytest

    from pathhier_spark.sources.warehouse import Warehouse as W

    wh = W(spark, str(tmp_path / "wh4"), fmt="parquet")
    df = spark.range(100).selectExpr("id")
    wh.write(df.repartition(8), "t", fingerprint="v1")

    real_manifest = W.manifest
    state = {"injected": False}

    def racing_manifest(self, table):
        man = real_manifest(self, table)
        if not state["injected"]:
            # first read inside compact(): sneak a concurrent append in
            # AFTER compact has captured this manifest
            state["injected"] = True
            real_write = W.write
            real_write(
                self, df.limit(5), table, mode="append", fingerprint="race"
            )
        return man

    try:
        W.manifest = racing_manifest
        with _pytest.raises(RuntimeError, match="concurrent commit"):
            wh.compact("t")
    finally:
        W.manifest = real_manifest
    # the racing append survived, nothing was lost
    assert wh.read("t").count() == 105


def test_compaction_size_aware_salting(spark, tmp_path):
    """A partition value holding ~95% of rows must split into more output
    files than the tiny values (size-aware salt moduli), and tiny values
    must not be over-split."""
    import os as _os

    wh = Warehouse(spark, str(tmp_path / "wh5"), fmt="parquet")
    # value 0: 95k rows; values 1..5: 1k each
    df = spark.range(100000).selectExpr(
        "id", "CASE WHEN id < 95000 THEN 0 ELSE 1 + id % 5 END AS part"
    )
    wh.write(df.repartition(64), "skewed", partition_by=["part"], fingerprint="v1")

    # small target -> several output files; the hot value should claim most
    stats = wh.compact("skewed", target_file_bytes=64 * 1024)
    man = wh.manifest("skewed")
    snap = man["snapshot"]

    def files_in(value):
        d = _os.path.join(snap, f"part={value}")
        return sum(1 for n in _os.listdir(d) if n.endswith(".parquet"))

    hot, cold = files_in(0), max(files_in(v) for v in range(1, 6))
    assert hot > cold, (hot, cold)
    assert cold <= 2  # tiny values stay at ~one file
    got = wh.read("skewed")
    assert got.count() == 100000
    assert stats["files_after"] < stats["files_before"]


def test_partitioned_append_read_and_compact(spark, tmp_path):
    """Appends to a PARTITIONED table: the multi-snapshot read unions
    per-directory (one multi-root read refuses partitioned layouts), and
    compaction collapses the snapshots back to one partitioned dir."""
    wh = Warehouse(spark, str(tmp_path / "wh6"), fmt="parquet")
    df1 = spark.range(10).selectExpr("id", "id % 2 AS part")
    df2 = spark.range(10, 15).selectExpr("id", "id % 2 AS part")
    wh.write(df1, "t", partition_by=["part"], fingerprint="base")
    wh.write(df2, "t", partition_by=["part"], mode="append", fingerprint="b1")
    got = wh.read("t")
    assert got.count() == 15
    assert sorted(r["part"] for r in got.select("part").distinct().collect()) == [0, 1]
    stats = wh.compact("t")
    assert stats["files_after"] >= 1
    man = wh.manifest("t")
    assert man["snapshots"] == [man["snapshot"]]
    back = wh.read("t")
    assert back.count() == 15
    assert back.agg({"id": "sum"}).collect()[0][0] == sum(range(15))


def test_compaction_keeps_null_partition_rows(spark, tmp_path):
    """Rows with a NULL partition value must survive compaction (the salt
    join is NULL-safe; a plain equi-join would silently drop them)."""
    wh = Warehouse(spark, str(tmp_path / "wh7"), fmt="parquet")
    df = spark.range(100).selectExpr(
        "id", "CASE WHEN id % 10 = 0 THEN NULL ELSE id % 3 END AS part"
    )
    wh.write(df.repartition(8), "t", partition_by=["part"], fingerprint="v1")
    assert wh.read("t").count() == 100
    wh.compact("t")
    got = wh.read("t")
    assert got.count() == 100
    assert got.filter("part IS NULL").count() == 10


def test_overwrite_cannot_destroy_live_snapshot_dir(spark, tmp_path):
    """An overwrite reusing a fingerprint whose directory is still in the
    live snapshot list must refuse instead of destroying committed data
    before the manifest swap."""
    import pytest as _pytest

    wh = Warehouse(spark, str(tmp_path / "wh8"), fmt="parquet")
    df = spark.range(10).selectExpr("id")
    wh.write(df, "t", fingerprint="base")
    wh.write(df, "t", mode="append", fingerprint="b1")
    # man.fingerprint is now 'b1', so an overwrite with 'base' is NOT the
    # idempotent-skip case — but its dir is live; must raise, data intact
    with _pytest.raises(ValueError, match="live snapshot"):
        wh.write(spark.range(1).selectExpr("id"), "t", fingerprint="base")
    assert wh.read("t").count() == 20  # 10 base + 10 appended, all intact
    # a fresh fingerprint overwrites cleanly
    wh.write(spark.range(3).selectExpr("id"), "t", fingerprint="base2")
    assert wh.read("t").count() == 3


def test_write_write_conflict_detected(spark, tmp_path, monkeypatch):
    """Two concurrent appends read the same manifest; the slower one's
    pointer swap must ABORT instead of rewriting the snapshot list without
    the faster one's directory (silent loss of its committed rows). The
    race is simulated by making the pre-swap guard re-read observe a
    manifest that changed after the initial read."""
    import pytest as _pytest

    wh = Warehouse(spark, str(tmp_path / "wh"), fmt="parquet")
    df = spark.range(5).withColumnRenamed("id", "v")
    wh.write(df, "t", fingerprint="base")

    orig = Warehouse.manifest
    calls = {"n": 0}

    def racy(self, table):
        m = orig(self, table)
        calls["n"] += 1
        if calls["n"] == 2 and m is not None:  # the guard's re-read
            m = dict(m)
            m["fingerprint"] = "foreign-commit"
        return m

    monkeypatch.setattr(Warehouse, "manifest", racy)
    with _pytest.raises(RuntimeError, match="concurrent commit"):
        wh.write(df, "t", mode="append", fingerprint="b1")
    monkeypatch.setattr(Warehouse, "manifest", orig)
    # the aborted write leaked nothing: table still reads the base snapshot
    assert wh.read("t").count() == 5
    # and a clean re-run (no race) commits fine
    wh.write(df, "t", mode="append", fingerprint="b1")
    assert wh.read("t").count() == 10


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    """Two tables bucketed on the join key with the same bucket count must
    join with NO Exchange in the physical plan (co-located buckets), and
    produce the same rows as the plain shuffled join."""
    from pathhier_spark.sources.warehouse import read_bucketed, write_bucketed

    nodes = spark.range(0, 1000).select(
        F.col("id").alias("node_id"),
        (F.col("id") % 7).alias("part"),
    )
    edges = spark.range(0, 3000).select(
        (F.col("id") % 1000).alias("node_id"),
        (F.col("id") % 13).alias("w"),
    )
    write_bucketed(
        spark, nodes, "b_nodes", bucket_by=["node_id"], n_buckets=8,
        sort_by=["node_id"], path=str(tmp_path / "b_nodes"),
    )
    write_bucketed(
        spark, edges, "b_edges", bucket_by=["node_id"], n_buckets=8,
        sort_by=["node_id"], path=str(tmp_path / "b_edges"),
    )
    # isolate the co-located-join regime: at production scale neither side
    # broadcasts — locally the tiny tables would, and the planner then
    # rightly skips the bucketed scan as broadcast is cheaper
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        old_aqe = spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold")
    except Exception:
        old_aqe = None
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        bn, be = read_bucketed(spark, "b_nodes"), read_bucketed(spark, "b_edges")
        joined = bn.join(be, "node_id")
        got = {(r["node_id"], r["part"], r["w"]) for r in joined.collect()}
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        plain = nodes.join(edges, "node_id")
        want = {(r["node_id"], r["part"], r["w"]) for r in plain.collect()}
        assert got == want and len(got) == 3000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        if old_aqe is not None:
            spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", old_aqe)
        else:
            spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_nodes")
        spark.sql("DROP TABLE IF EXISTS b_edges")


def test_commit_lock_blocks_and_breaks_stale(spark, tmp_path):
    """A held commit lock makes a concurrent write abort; a stale lock
    (crashed writer — its data never entered the manifest) is broken after
    the timeout and the write proceeds."""
    import os
    import pytest as _pytest

    wh = Warehouse(spark, str(tmp_path / "wh"), fmt="parquet")
    df = spark.range(3).withColumnRenamed("id", "v")
    wh.write(df, "t", fingerprint="base")
    lock = os.path.join(str(tmp_path / "wh"), "t", "manifest.lock")
    with open(lock, "w") as f:
        f.write("123")
    with _pytest.raises(RuntimeError, match="commit lock held"):
        wh.write(df, "t", mode="append", fingerprint="b1")
    # age the lock past the stale threshold -> broken, write succeeds
    os.utime(lock, (1, 1))
    wh.write(df, "t", mode="append", fingerprint="b1")
    assert wh.read("t").count() == 6
    assert not os.path.exists(lock)


def test_zorder_key_bits():
    """Morton interleave: known small values, and ordering locality."""
    from pathhier_spark.functions.zorder import zorder_key  # noqa: F401

    # pure expression check happens in the Spark test below; here just the
    # guard rails
    import pytest as _pytest

    with _pytest.raises(ValueError):
        zorder_key(bits=21)
    with _pytest.raises(ValueError):
        zorder_key("a", "b", "c", bits=21)  # 63 > 62


def test_compact_zorder_prunes_both_dimensions(spark, tmp_path):
    """Z-ordered compaction keeps BOTH dimensions' per-file min/max ranges
    bounded, unlike a linear sort (leading column tight, second column
    spanning its whole domain in every file) — the property parquet
    min/max file skipping needs for predicates on either column."""
    import pyarrow.parquet as pq

    from pathhier_spark.functions.zorder import zorder_key

    # two independent uniform dims
    df = spark.range(40000).selectExpr(
        "id", "id % 317 AS x", "(id * 7919) % 311 AS y"
    )
    # interleave sanity on a couple of known values: (x=1, y=0) -> bit 0
    # set at position 0; (x=0, y=1) -> bit set at position 1
    row = spark.createDataFrame([(1, 0), (0, 1), (3, 5)], "x long, y long").select(
        zorder_key("x", "y").alias("z")
    ).collect()
    assert [r["z"] for r in row[:2]] == [1, 2]
    # x=3 (bits 0,1 -> pos 0,2), y=5 (bits 0,2 -> pos 1,5): 1+4+2+32 = 39
    assert row[2]["z"] == 39

    def ranges(snapshot_dir):
        import os as _os

        spans = []
        for root, _d, names in _os.walk(snapshot_dir):
            for n in names:
                if not n.endswith(".parquet"):
                    continue
                md = pq.read_metadata(_os.path.join(root, n))
                lo_x = min(md.row_group(i).column(1).statistics.min
                           for i in range(md.num_row_groups))
                hi_x = max(md.row_group(i).column(1).statistics.max
                           for i in range(md.num_row_groups))
                lo_y = min(md.row_group(i).column(2).statistics.min
                           for i in range(md.num_row_groups))
                hi_y = max(md.row_group(i).column(2).statistics.max
                           for i in range(md.num_row_groups))
                spans.append(((hi_x - lo_x + 1) * (hi_y - lo_y + 1)))
        return spans

    wh = Warehouse(spark, str(tmp_path / "wh"), fmt="parquet")
    wh.write(df.repartition(16), "lin", fingerprint="v1")
    wh.compact("lin", target_file_bytes=64 * 1024, sort_within_by=["x"])
    lin_spans = ranges(wh.manifest("lin")["snapshot"])

    wh.write(df.repartition(16), "zo", fingerprint="v1")
    wh.compact("zo", target_file_bytes=64 * 1024, zorder_by=["x", "y"])
    zo_spans = ranges(wh.manifest("zo")["snapshot"])

    assert len(zo_spans) > 4 and len(lin_spans) > 4
    # mean covered-domain area per file: z-order must be materially tighter
    lin_avg = sum(lin_spans) / len(lin_spans)
    zo_avg = sum(zo_spans) / len(zo_spans)
    assert zo_avg < lin_avg * 0.6, (lin_avg, zo_avg)
    # rows survive the rewrite
    assert wh.read("zo").count() == 40000


def test_stale_lock_break_two_writers_single_winner(spark, tmp_path):
    """Two writers that BOTH observe the same stale lock must resolve to
    exactly one holder of the critical section (ADVICE r4: the old
    unlink+recreate break let writer B unlink writer A's FRESH lock and
    both proceed into the manifest swap). The break is now an atomic
    os.rename — exactly one renamer wins; the loser aborts with the
    held-lock RuntimeError. Repeated trials with a start barrier to
    exercise interleavings; a concurrency counter asserts the section is
    never entered by two threads at once."""
    import os
    import threading
    import time

    wh = Warehouse(spark, str(tmp_path / "wh"), fmt="parquet")
    df = spark.range(3).withColumnRenamed("id", "v")
    wh.write(df, "t", fingerprint="base")
    lock = os.path.join(str(tmp_path / "wh"), "t", "manifest.lock")

    for _trial in range(10):
        with open(lock, "w") as f:
            f.write("999999")  # orphaned writer's pid
        os.utime(lock, (1, 1))  # age past stale_s

        barrier = threading.Barrier(2)
        inside = []
        max_inside = []
        errors = []
        acquired = []
        mu = threading.Lock()

        def worker():
            barrier.wait()
            try:
                with wh._commit_lock("t"):
                    with mu:
                        inside.append(1)
                        max_inside.append(len(inside))
                    time.sleep(0.05)
                    with mu:
                        inside.pop()
                    acquired.append(1)
            except RuntimeError as e:
                errors.append(str(e))

        ts = [threading.Thread(target=worker) for _ in range(2)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert len(acquired) == 1, (acquired, errors)
        assert len(errors) == 1 and "commit lock held" in errors[0]
        assert max(max_inside) == 1  # critical section never shared
        assert not os.path.exists(lock)


def test_compact_rejects_sort_within_and_zorder_together(spark, tmp_path):
    """ADVICE r4: compact(sort_within_by=..., zorder_by=...) used to let
    the z-key sort silently win; now it is an explicit ValueError."""
    import pytest as _pytest

    wh = Warehouse(spark, str(tmp_path / "wh"), fmt="parquet")
    df = spark.range(10).select(
        F.col("id").alias("a"), (F.col("id") * 2).alias("b")
    )
    wh.write(df, "t", fingerprint="base")
    with _pytest.raises(ValueError, match="mutually exclusive"):
        wh.compact(table="t", sort_within_by=["a"], zorder_by=["a", "b"])


def test_read_incremental_delta_feed(spark, tmp_path):
    """Changed-data feed: a consumer holding the last-processed fingerprint
    re-reads only the directories committed after it."""
    import pytest as _pytest

    from pathhier_spark.sources.warehouse import Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh"), fmt="parquet")
    base = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    wh.write(base, "t", fingerprint="base")
    wh.write(
        spark.createDataFrame([(3, "c")], "id long, v string"),
        "t", mode="append", fingerprint="b1",
    )
    wh.write(
        spark.createDataFrame([(4, "d")], "id long, v string"),
        "t", mode="append", fingerprint="b2",
    )

    # full read sees everything; delta since base sees only the appends
    assert {r["id"] for r in wh.read("t").collect()} == {1, 2, 3, 4}
    assert {
        r["id"] for r in wh.read_incremental("t", "base").collect()
    } == {3, 4}
    assert {
        r["id"] for r in wh.read_incremental("t", "b1").collect()
    } == {4}
    # caught up: empty, schema preserved
    up = wh.read_incremental("t", "b2")
    assert up.count() == 0 and up.columns == ["id", "v"]
    # unknown fingerprint -> explicit full-refresh error
    with _pytest.raises(ValueError, match="full refresh"):
        wh.read_incremental("t", "nope")


def test_read_incremental_across_compaction(spark, tmp_path):
    """Compaction resets history but keeps the last commit's fingerprint:
    a caught-up consumer stays caught up; stale consumers must refresh."""
    import pytest as _pytest

    from pathhier_spark.sources.warehouse import Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh"), fmt="parquet")
    wh.write(
        spark.createDataFrame([(1, "a")], "id long, v string"),
        "t", fingerprint="base",
    )
    wh.write(
        spark.createDataFrame([(2, "b")], "id long, v string"),
        "t", mode="append", fingerprint="b1",
    )
    wh.compact("t")
    # caught up through b1 (the last commit pre-compaction): still caught up
    assert wh.read_incremental("t", "b1").count() == 0
    # stale consumer (only saw 'base'): full refresh demanded
    with _pytest.raises(ValueError, match="full refresh"):
        wh.read_incremental("t", "base")
    # post-compaction appends flow as deltas from the compacted point
    wh.write(
        spark.createDataFrame([(3, "c")], "id long, v string"),
        "t", mode="append", fingerprint="b2",
    )
    assert {
        r["id"] for r in wh.read_incremental("t", "b1").collect()
    } == {3}
    assert {r["id"] for r in wh.read("t").collect()} == {1, 2, 3}


def test_read_at_time_travel(spark, tmp_path):
    """read_at returns the table AS OF a named commit: earlier appends
    included, later ones excluded; history resets invalidate old
    fingerprints."""
    import pytest as _pytest

    from pathhier_spark.sources.warehouse import Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh"), fmt="parquet")
    wh.write(
        spark.createDataFrame([(1, "a")], "id long, v string"),
        "t", fingerprint="base",
    )
    wh.write(
        spark.createDataFrame([(2, "b")], "id long, v string"),
        "t", mode="append", fingerprint="b1",
    )
    wh.write(
        spark.createDataFrame([(3, "c")], "id long, v string"),
        "t", mode="append", fingerprint="b2",
    )
    assert {r["id"] for r in wh.read_at("t", "base").collect()} == {1}
    assert {r["id"] for r in wh.read_at("t", "b1").collect()} == {1, 2}
    assert {r["id"] for r in wh.read_at("t", "b2").collect()} == {1, 2, 3}
    with _pytest.raises(ValueError, match="not in"):
        wh.read_at("t", "nope")
    # compaction resets history: only the compacted commit remains readable
    wh.compact("t")
    last = wh.manifest("t")["fingerprint"]
    assert {r["id"] for r in wh.read_at("t", last).collect()} == {1, 2, 3}
    with _pytest.raises(ValueError):
        wh.read_at("t", "b1")


def test_vacuum_removes_only_aged_orphans(spark, tmp_path):
    """vacuum (the remove_orphan_files analog): overwrite + compaction
    leave superseded data_* dirs on disk; vacuum deletes exactly the
    unreferenced ones past the age horizon, never live snapshot or
    commit-log dirs, and reads/time-travel are unaffected."""
    import os

    from pathhier_spark.sources.warehouse import Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh"), fmt="parquet")
    df1 = spark.range(10).withColumnRenamed("id", "v")
    df2 = spark.range(10, 25).withColumnRenamed("id", "v")
    wh.write(df1, "t", mode="overwrite", fingerprint="v1")
    wh.write(df2, "t", mode="append", fingerprint="a1")
    wh.write(df1, "t", mode="overwrite", fingerprint="v2")  # orphans v1+a1
    wh.write(df2, "t", mode="append", fingerprint="a2")
    wh.compact("t", target_file_bytes=1 << 30)  # orphans v2+a2 dirs

    tdir = os.path.join(str(tmp_path / "wh"), "t")
    data_dirs = [d for d in os.listdir(tdir) if d.startswith("data_")]
    man = wh.manifest("t")
    live = set(wh._snapshot_dirs(man))
    for c in man.get("commits") or []:
        live.update(c["dirs"])
    n_orphans = len(data_dirs) - len(
        {os.path.basename(d) for d in live} & set(data_dirs)
    )
    assert n_orphans >= 4  # v1, a1, v2, a2 all superseded

    # young orphans survive a long horizon
    res = wh.vacuum("t", older_than_s=10_000)
    assert res["removed"] == 0 and res["kept_young"] == n_orphans

    before = sorted(r["v"] for r in wh.read("t").collect())
    res = wh.vacuum("t", older_than_s=0)
    assert res["removed"] == n_orphans and res["kept_young"] == 0
    # live dirs intact; reads and current-fingerprint time-travel unaffected
    remaining = {
        os.path.join(tdir, d)
        for d in os.listdir(tdir)
        if d.startswith("data_")
    }
    assert remaining == live
    assert sorted(r["v"] for r in wh.read("t").collect()) == before
    # second vacuum is a no-op
    assert wh.vacuum("t", older_than_s=0)["removed"] == 0


def test_vacuum_missing_table_raises(spark, tmp_path):
    import pytest as _pytest

    from pathhier_spark.sources.warehouse import Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh"), fmt="parquet")
    with _pytest.raises(FileNotFoundError):
        wh.vacuum("nope")


# --------------------------- merge / apply_changelog ---------------------------


def _kv(spark, rows):
    return spark.createDataFrame(rows, "id long, pred string, v long")


def test_merge_upsert_delete_insert(spark, tmp_path):
    from pathhier_spark.sources.warehouse import Warehouse as W

    wh = W(spark, str(tmp_path / "wh"))
    wh.write(_kv(spark, [(1, "a", 10), (2, "b", 20), (3, "a", 30)]),
             "t", partition_by=["pred"], fingerprint="v1")
    updates = spark.createDataFrame(
        [(2, "b", 99, False),   # update in place
         (4, "c", 40, False),   # insert new key
         (3, "a", 0, True)],    # tombstone
        "id long, pred string, v long, deleted boolean",
    )
    wh.merge(updates, "t", key="id", fingerprint="m1", delete_col="deleted")
    got = {r["id"]: (r["pred"], r["v"]) for r in wh.read("t").collect()}
    assert got == {1: ("a", 10), 2: ("b", 99), 4: ("c", 40)}
    man = wh.manifest("t")
    # partition layout survives the merge; history reset to the merge commit
    assert man["partition_by"] == ["pred"]
    assert [c["mode"] for c in man["commits"]] == ["merge"]
    # replay with the same fingerprint is a no-op
    mtime = os.path.getmtime(wh._manifest_path("t"))
    wh.merge(updates, "t", key="id", fingerprint="m1", delete_col="deleted")
    assert os.path.getmtime(wh._manifest_path("t")) == mtime


def test_merge_creates_table_and_validates(spark, tmp_path):
    import pytest as _pytest

    from pathhier_spark.sources.warehouse import Warehouse as W

    wh = W(spark, str(tmp_path / "wh"))
    ups = spark.createDataFrame(
        [(1, "a", 10, False), (2, "b", 20, True)],
        "id long, pred string, v long, deleted boolean",
    )
    wh.merge(ups, "fresh", key="id", fingerprint="m1", delete_col="deleted")
    assert {r["id"] for r in wh.read("fresh").collect()} == {1}
    # bad key / bad delete_col / schema drift all refuse
    with _pytest.raises(ValueError, match="merge key"):
        wh.merge(ups, "fresh", key="nope", fingerprint="m2")
    with _pytest.raises(ValueError, match="delete_col"):
        wh.merge(ups, "fresh", key="id", fingerprint="m2", delete_col="nope")
    drift = spark.createDataFrame([(1, 5)], "id long, extra long")
    with _pytest.raises(ValueError, match="schema"):
        wh.merge(drift, "fresh", key="id", fingerprint="m2")


def test_merge_aborts_on_concurrent_commit(spark, tmp_path):
    """A commit landing between merge's manifest capture and its swap must
    abort the merge (same OCC contract as compact) — otherwise the racing
    append's rows would be silently folded out of the rewritten snapshot."""
    import pytest as _pytest

    from pathhier_spark.sources.warehouse import Warehouse as W

    wh = W(spark, str(tmp_path / "wh"))
    wh.write(_kv(spark, [(1, "a", 10)]), "t", fingerprint="v1")

    real_manifest = W.manifest
    state = {"injected": False}

    def racing_manifest(self, table):
        man = real_manifest(self, table)
        if not state["injected"]:
            state["injected"] = True
            W.write(self, _kv(spark, [(9, "z", 90)]), table,
                    mode="append", fingerprint="race")
        return man

    ups = spark.createDataFrame([(1, "a", 11, False)],
                                "id long, pred string, v long, deleted boolean")
    try:
        W.manifest = racing_manifest
        with _pytest.raises(RuntimeError, match="concurrent commit"):
            wh.merge(ups, "t", key="id", fingerprint="m1",
                     delete_col="deleted")
    finally:
        W.manifest = real_manifest
    # the racing append survived; rerunning the merge now succeeds
    assert wh.read("t").count() == 2
    wh.merge(ups, "t", key="id", fingerprint="m1", delete_col="deleted")
    got = {r["id"]: r["v"] for r in wh.read("t").collect()}
    assert got == {1: 11, 9: 90}


def test_apply_changelog_mor_matches_merge_cow(spark, tmp_path):
    """Merge-on-read over base+changelog equals the materialized COW merge
    — the two halves of the Iceberg COW/MOR split agree row-for-row."""
    from pathhier_spark.sources.warehouse import Warehouse as W, apply_changelog

    wh = W(spark, str(tmp_path / "wh"))
    base_rows = [(i, "a" if i % 2 else "b", i * 10) for i in range(20)]
    wh.write(_kv(spark, base_rows), "t", fingerprint="v1")
    changes = spark.createDataFrame(
        [(5, "a", 999, False), (6, "b", 0, True), (100, "c", 1, False),
         (None, "n", 7, False)],
        "id long, pred string, v long, deleted boolean",
    )
    mor = apply_changelog(wh.read("t"), changes, key="id",
                          delete_col="deleted")
    mor_rows = {tuple(r) for r in mor.collect()}
    wh.merge(changes, "t", key="id", fingerprint="m1", delete_col="deleted")
    cow_rows = {tuple(r) for r in wh.read("t").collect()}
    assert mor_rows == cow_rows
    # NULL-keyed upsert inserted, never matched against base
    assert (None, "n", 7) in cow_rows
    # tombstoned key gone, updated key replaced, new key present
    ids = {r[0] for r in cow_rows}
    assert 6 not in ids and 100 in ids
    assert dict((r[0], r[2]) for r in cow_rows)[5] == 999


def test_merge_replay_dedupes_old_appends_and_stale_batches(spark, tmp_path):
    """merge carries the applied-fingerprint set FORWARD: (a) replaying an
    append that predates the merge must no-op (its rows live inside the
    merged snapshot — re-applying would duplicate them); (b) replaying an
    OLDER merge batch must not clobber a newer batch's rows with its
    stale rewrite."""
    from pathhier_spark.sources.warehouse import Warehouse as W

    wh = W(spark, str(tmp_path / "wh"))
    wh.write(_kv(spark, [(1, "a", 10)]), "t", fingerprint="v1")
    wh.write(_kv(spark, [(2, "b", 20)]), "t", mode="append", fingerprint="a1")
    m1 = spark.createDataFrame([(1, "a", 11, False)],
                               "id long, pred string, v long, deleted boolean")
    wh.merge(m1, "t", key="id", fingerprint="m1", delete_col="deleted")
    # (a) at-least-once replay of the pre-merge append: must not duplicate
    wh.write(_kv(spark, [(2, "b", 20)]), "t", mode="append", fingerprint="a1")
    assert wh.read("t").count() == 2
    assert {r["v"] for r in wh.read("t").collect()} == {11, 20}
    # (b) newer merge, then replay of the older one: stale rewrite no-ops
    m2 = spark.createDataFrame([(1, "a", 12, False)],
                               "id long, pred string, v long, deleted boolean")
    wh.merge(m2, "t", key="id", fingerprint="m2", delete_col="deleted")
    wh.merge(m1, "t", key="id", fingerprint="m1", delete_col="deleted")
    got = {r["id"]: r["v"] for r in wh.read("t").collect()}
    assert got == {1: 12, 2: 20}


def test_hits_zero_iterations_returns_uniform(spark):
    from pathhier_spark.operators.graph import hits_fixedpoint

    e = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    rows = hits_fixedpoint(e, iterations=0).collect()
    assert len(rows) == 3
    assert all(r["h_fp"] == 1_000_000 and r["a_fp"] == 1_000_000 for r in rows)


def test_snapshot_diff_multiset_and_keyed(spark, tmp_path):
    """snapshot_diff: multiset exceptAll semantics without keys;
    insert/delete/update three-way classification with keys (updates
    emitted from the NEW side); warehouse.diff between APPEND commits is
    insert-only by construction."""
    from pathhier_spark.sources.warehouse import Warehouse, snapshot_diff

    a = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, v string"
    )
    b = spark.createDataFrame(
        [(1, "a"), (2, "B"), (4, "d")], "id long, v string"
    )
    keyed = sorted(
        (r["_change"], r["id"], r["v"])
        for r in snapshot_diff(a, b, key_cols=["id"]).collect()
    )
    assert keyed == [
        ("delete", 3, "c"), ("insert", 4, "d"), ("update", 2, "B"),
    ]
    flat = sorted(
        (r["_change"], r["id"], r["v"])
        for r in snapshot_diff(a, b).collect()
    )
    # multiset view: the update shows as delete-old + insert-new
    assert flat == [
        ("delete", 2, "b"), ("delete", 3, "c"),
        ("insert", 2, "B"), ("insert", 4, "d"),
    ]

    # warehouse.diff across the append-only commit log
    wh = Warehouse(spark, str(tmp_path / "wh"), fmt="parquet")
    wh.write(a, "t", mode="append", fingerprint="c1")
    wh.write(
        spark.createDataFrame([(4, "d")], "id long, v string"),
        "t", mode="append", fingerprint="c2",
    )
    got = sorted(
        (r["_change"], r["id"], r["v"])
        for r in wh.diff("t", "c1", "c2").collect()
    )
    assert got == [("insert", 4, "d")]


def test_snapshot_diff_detects_null_position_swap(spark):
    """Review regression: xxhash64 skips NULL inputs, so a value migrating
    across columns past a NULL used to hash as 'unchanged' — the JSON
    row encoding must catch it as an update."""
    from pathhier_spark.sources.warehouse import snapshot_diff

    a = spark.createDataFrame([(1, "x", None)], "id long, c1 string, c2 string")
    b = spark.createDataFrame([(1, None, "x")], "id long, c1 string, c2 string")
    got = [tuple(r) for r in snapshot_diff(a, b, key_cols=["id"]).collect()]
    assert got == [("update", 1, None, "x")]


# ---------------------------- schema evolution ----------------------------


def test_schema_append_exact_match_ok(spark, tmp_path):
    from pathhier_spark.sources.warehouse import Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh"), fmt="parquet")
    df = spark.createDataFrame([(1, "a")], "id long, name string")
    wh.write(df, "t", fingerprint="v1")
    wh.write(
        spark.createDataFrame([(2, "b")], "id long, name string"),
        "t", mode="append", fingerprint="b1",
    )
    assert wh.read("t").count() == 2
    assert wh.manifest("t")["schema"] == [["id", "bigint"],
                                         ["name", "string"]]


def test_schema_append_new_column_refused_then_evolves(spark, tmp_path):
    import pytest as _pytest

    from pathhier_spark.sources.warehouse import Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh"), fmt="parquet")
    wh.write(spark.createDataFrame([(1, "a")], "id long, name string"),
             "t", fingerprint="v1")
    wide = spark.createDataFrame(
        [(2, "b", "en")], "id long, name string, lang string"
    )
    with _pytest.raises(ValueError, match="adds columns"):
        wh.write(wide, "t", mode="append", fingerprint="b1")
    # refused append left nothing visible
    assert wh.read("t").count() == 1
    wh.write(wide, "t", mode="append", fingerprint="b1",
             allow_new_columns=True)
    out = wh.read("t")
    # canonical projection: evolved column appended at the END, old rows
    # read as typed NULLs
    assert out.columns == ["id", "name", "lang"]
    rows = {r["id"]: r["lang"] for r in out.collect()}
    assert rows == {1: None, 2: "en"}


def test_schema_append_missing_column_policy(spark, tmp_path):
    import pytest as _pytest

    from pathhier_spark.sources.warehouse import Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh"), fmt="parquet")
    wh.write(spark.createDataFrame([(1, "a")], "id long, name string"),
             "t", fingerprint="v1")
    narrow = spark.createDataFrame([(2,)], "id long")
    with _pytest.raises(ValueError, match="lacks columns"):
        wh.write(narrow, "t", mode="append", fingerprint="b1")
    wh.write(narrow, "t", mode="append", fingerprint="b1",
             allow_missing_columns=True)
    rows = {r["id"]: r["name"] for r in wh.read("t").collect()}
    assert rows == {1: "a", 2: None}


def test_schema_type_change_always_refused(spark, tmp_path):
    import pytest as _pytest

    from pathhier_spark.sources.warehouse import Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh"), fmt="parquet")
    wh.write(spark.createDataFrame([(1, "a")], "id long, name string"),
             "t", fingerprint="v1")
    retyped = spark.createDataFrame([("x", "b")], "id string, name string")
    with _pytest.raises(ValueError, match="type changes"):
        wh.write(retyped, "t", mode="append", fingerprint="b1",
                 allow_new_columns=True, allow_missing_columns=True)


def test_schema_overwrite_resets(spark, tmp_path):
    from pathhier_spark.sources.warehouse import Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh"), fmt="parquet")
    wh.write(spark.createDataFrame([(1, "a")], "id long, name string"),
             "t", fingerprint="v1")
    wh.write(spark.createDataFrame([(9,)], "other long"), "t",
             fingerprint="v2")
    assert wh.manifest("t")["schema"] == [["other", "bigint"]]
    assert wh.read("t").columns == ["other"]


def test_schema_survives_compaction(spark, tmp_path):
    from pathhier_spark.sources.warehouse import Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh"), fmt="parquet")
    wh.write(spark.createDataFrame([(1, "a")], "id long, name string"),
             "t", fingerprint="v1")
    wh.write(spark.createDataFrame([(2, "b", "en")],
                                   "id long, name string, lang string"),
             "t", mode="append", fingerprint="b1", allow_new_columns=True)
    wh.compact("t")
    assert wh.manifest("t")["schema"] == [
        ["id", "bigint"], ["name", "string"], ["lang", "string"]
    ]
    assert wh.read("t").columns == ["id", "name", "lang"]


def test_incremental_read_projects_current_schema(spark, tmp_path):
    """r5 review: the delta feed must present the CURRENT table schema —
    a batch that lacked an evolved column would otherwise flap the
    consumer's frame shape batch to batch."""
    from pathhier_spark.sources.warehouse import Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh"), fmt="parquet")
    wh.write(spark.createDataFrame([(1, "a")], "id long, name string"),
             "t", fingerprint="v1")
    wh.write(spark.createDataFrame([(2, "b", "en")],
                                   "id long, name string, lang string"),
             "t", mode="append", fingerprint="b1", allow_new_columns=True)
    wh.write(spark.createDataFrame([(3,)], "id long"),
             "t", mode="append", fingerprint="b2",
             allow_missing_columns=True)
    delta = wh.read_incremental("t", since_fingerprint="b1")
    assert delta.columns == ["id", "name", "lang"]
    assert delta.collect()[0]["name"] is None


def test_stream_sink_passes_evolution_flags(spark, tmp_path):
    """The foreachBatch sink must be able to opt into evolution — a
    restarted stream whose source gained a column would otherwise kill
    the StreamingQuery with no recourse."""
    from pathhier_spark.sources.warehouse import Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh"), fmt="parquet")
    wh.write(spark.createDataFrame([(1, "a")], "id long, name string"),
             "t", fingerprint="v1")
    # simulate the sink's _commit with the flags threaded through
    import inspect

    from pathhier_spark.streaming.stream import stream_to_warehouse

    sig = inspect.signature(stream_to_warehouse)
    assert "allow_new_columns" in sig.parameters
    assert "allow_missing_columns" in sig.parameters


def test_expire_snapshots_bounds_log_keeps_data(spark, tmp_path):
    """expire_snapshots trims the commit log to keep_last: expired
    fingerprints raise on read_at/read_incremental (bounded replay),
    recent ones still time-travel, read() sees every row (data is never
    touched), exactly-once replay suppression survives expiry, and the
    trimmed manifest preserves the other fields."""
    import pytest as _pytest

    from pathhier_spark.sources.warehouse import Warehouse

    wh = Warehouse(spark, str(tmp_path / "whx"), fmt="parquet")
    for i, fp in enumerate(["f0", "f1", "f2", "f3"]):
        wh.write(
            spark.createDataFrame([(i, f"v{i}")], "id long, v string"),
            "t",
            mode="append" if i else "overwrite",
            fingerprint=fp,
        )
    out = wh.expire_snapshots("t", keep_last=2)
    assert out == {"expired": 2, "kept": 2}
    # data intact
    assert {r["id"] for r in wh.read("t").collect()} == {0, 1, 2, 3}
    # recent fingerprints still travel; expired ones raise the existing
    # expired-snapshot contract
    assert {r["id"] for r in wh.read_at("t", "f3").collect()} == {0, 1, 2, 3}
    assert {r["id"] for r in wh.read_at("t", "f2").collect()} == {0, 1, 2}
    for old in ("f0", "f1"):
        with _pytest.raises(ValueError, match="not in"):
            wh.read_at("t", old)
        with _pytest.raises(ValueError, match="not in"):
            wh.read_incremental("t", since_fingerprint=old)
    # exactly-once suppression survives: replaying an EXPIRED write is
    # still a no-op
    wh.write(
        spark.createDataFrame([(99, "dup")], "id long, v string"),
        "t",
        mode="append",
        fingerprint="f1",
    )
    assert {r["id"] for r in wh.read("t").collect()} == {0, 1, 2, 3}
    # idempotent when already within budget; keep_last validation
    assert wh.expire_snapshots("t", keep_last=10) == {"expired": 0, "kept": 2}
    with _pytest.raises(ValueError, match="keep_last"):
        wh.expire_snapshots("t", keep_last=0)
    man = wh.manifest("t")
    assert [c["fingerprint"] for c in man["commits"]] == ["f2", "f3"]
    assert set(man["applied_fingerprints"]) >= {"f0", "f1", "f2", "f3"}
