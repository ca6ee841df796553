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
        same fingerprint is a no-op (idempotent resume)."""
        man = self.manifest(table)
        if mode == "overwrite" and man and man.get("fingerprint") == fingerprint:
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
