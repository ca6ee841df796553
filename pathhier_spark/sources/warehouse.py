"""Iceberg-style table writer abstraction.

The north rule targets Iceberg node/edge tables. The sandbox has no Iceberg
runtime jar (SURVEY.md §7.0), so the default backend is partitioned parquet
plus a JSON manifest with Iceberg-commit-like semantics (atomic pointer to
the current snapshot; idempotent overwrite per fingerprint). The `fmt`
switch selects a real Iceberg catalog writer when the runtime is present —
the calling code never changes.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession


def _iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.Table")
        return True
    except Exception:
        return False


class Warehouse:
    """warehouse_root/<table>/data/... + <table>/manifest.json"""

    def __init__(self, spark: SparkSession, root: str, fmt: str = "auto"):
        self.spark = spark
        self.root = root
        if fmt == "auto":
            fmt = "iceberg" if _iceberg_available(spark) else "parquet"
        self.fmt = fmt
        os.makedirs(root, exist_ok=True)

    def _table_dir(self, table: str) -> str:
        return os.path.join(self.root, table)

    def _manifest_path(self, table: str) -> str:
        return os.path.join(self._table_dir(table), "manifest.json")

    def manifest(self, table: str) -> dict | None:
        p = self._manifest_path(table)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def write(
        self,
        df: DataFrame,
        table: str,
        *,
        partition_by: list[str] | None = None,
        mode: str = "overwrite",
        fingerprint: str = "static",
    ) -> None:
        """Commit = data write + manifest pointer swap. A re-run with the
        same fingerprint is a no-op (idempotent resume) — for BOTH modes:
        an append whose fingerprint equals the last committed one is a
        streaming micro-batch replay (restart between the data write and
        the offset commit) and must not duplicate rows."""
        man = self.manifest(table)
        if man and man.get("fingerprint") == fingerprint:
            return
        if self.fmt == "iceberg":
            writer = df.writeTo(f"local.{table}")
            if partition_by:
                from pyspark.sql import functions as F

                writer = writer.partitionedBy(*[F.col(c) for c in partition_by])
            writer.createOrReplace()
            snapshot = f"iceberg:local.{table}"
        else:
            data_dir = os.path.join(self._table_dir(table), "data")
            writer = df.write.mode(mode)
            if partition_by:
                writer = writer.partitionBy(*partition_by)
            writer.parquet(data_dir)
            snapshot = data_dir
        tmp = self._manifest_path(table) + ".tmp"
        os.makedirs(self._table_dir(table), exist_ok=True)
        with open(tmp, "w") as f:
            json.dump(
                {
                    "table": table,
                    "format": self.fmt,
                    "snapshot": snapshot,
                    "fingerprint": fingerprint,
                    "partition_by": partition_by or [],
                    "committed_at": time.strftime(
                        "%Y-%m-%dT%H:%M:%SZ", time.gmtime()
                    ),
                },
                f,
            )
        os.replace(tmp, self._manifest_path(table))  # atomic pointer swap

    def read(self, table: str) -> DataFrame:
        man = self.manifest(table)
        if man is None:
            raise FileNotFoundError(f"table {table} has no committed snapshot")
        if man["format"] == "iceberg":
            return self.spark.read.table(man["snapshot"].split(":", 1)[1])
        return self.spark.read.parquet(man["snapshot"])

    def compact(
        self,
        table: str,
        *,
        target_file_bytes: int = 128 * 1024 * 1024,
        sort_within_by: list[str] | None = None,
    ) -> dict:
        """Small-files compaction — the Iceberg `rewrite_data_files` analog.
        A long-running ingest (streaming micro-batches, per-stage commits)
        accumulates many small parquet files; at 100 TB that kills scan
        parallelism bookkeeping and NameNode/manifest pressure. Rewrite the
        current snapshot into ceil(bytes / target_file_bytes) files in a NEW
        snapshot directory and swap the manifest pointer atomically — readers
        of the old snapshot are unaffected (time-travel semantics), and a
        crash mid-compaction leaves the table on the old snapshot.

        sort_within_by optionally clusters rows within each output file
        (the z-order-lite analog) so downstream point-lookups prune files.
        Returns {files_before, files_after, bytes}."""
        import math

        man = self.manifest(table)
        if man is None:
            raise FileNotFoundError(f"table {table} has no committed snapshot")
        if man["format"] == "iceberg":
            raise NotImplementedError(
                "iceberg backend compaction = CALL rewrite_data_files; "
                "no iceberg runtime in this sandbox"
            )
        snap = man["snapshot"]
        files = []
        for root, _dirs, names in os.walk(snap):
            files += [
                os.path.join(root, n) for n in names if n.endswith(".parquet")
            ]
        total_bytes = sum(os.path.getsize(f) for f in files)
        n_out = max(1, math.ceil(total_bytes / target_file_bytes))
        df = self.spark.read.parquet(snap)
        partition_by = man.get("partition_by") or []
        if partition_by:
            # repartition(n_out, *partition_by) would hash ONLY on the
            # partition columns — every row of one partition value lands in
            # a single task and is written as one file, however large. Add
            # a row-hash salt bounded by ceil(n_out / n_values) so each
            # partition value splits into enough files to respect
            # target_file_bytes (approximation: assumes roughly even value
            # sizes; a skew-aware version would size salts per value).
            from pyspark.sql import functions as F

            n_values = max(
                1, df.select(*partition_by).distinct().count()
            )
            per_value = max(1, math.ceil(n_out / n_values))
            salt = F.pmod(F.xxhash64(*df.columns), F.lit(per_value))
            df = df.repartition(n_out, *partition_by, salt)
        else:
            df = df.repartition(n_out)
        if sort_within_by:
            df = df.sortWithinPartitions(*sort_within_by)
        new_dir = os.path.join(
            self._table_dir(table), f"data_compacted_{int(time.time() * 1000)}"
        )
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(new_dir)
        files_after = sum(
            1
            for root, _d, names in os.walk(new_dir)
            for n in names
            if n.endswith(".parquet")
        )
        man = dict(man)
        man["snapshot"] = new_dir
        man["compaction"] = {
            "files_before": len(files),
            "files_after": files_after,
            "bytes": total_bytes,
            "previous_snapshot": snap,
        }
        man["committed_at"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
        tmp = self._manifest_path(table) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(man, f)
        os.replace(tmp, self._manifest_path(table))
        return man["compaction"]
