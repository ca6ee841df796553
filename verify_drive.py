"""Verify drive (skill: verify) — exercises the three product surfaces as a
plain script over __spark_entry__, NOT via pytest.

1. Driver-contract replica: every queries() entry on Spark vs its
   oracle_sql() on DuckDB over /root/testdata/sf0.01 (row count + schema +
   order-insensitive canonical value compare, the driver's gate).
2. KG pipeline on a fresh-seed synthetic corpus: P/R >= 0.95.

(Surface 2 of the skill, bench.py, is driven separately — it needs its own
process so its session config is bench's own.)

Usage: python verify_drive.py [--subset q01,q02,...] [--sf /root/testdata/sf0.01]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import duckdb  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.6f}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    return str(v)


def idx_rows(rows, idx):
    for r in rows:
        yield [r[i] for i in idx]


def main() -> None:
    sf_dir = "/root/testdata/sf0.01"
    subset = None
    args = sys.argv[1:]
    if "--sf" in args:
        sf_dir = args[args.index("--sf") + 1]
    if "--subset" in args:
        subset = args[args.index("--subset") + 1].split(",")

    import __spark_entry__ as entrymod
    from pathhier_spark.session import get_spark

    spark = get_spark("verify_drive", cores=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM"
            f" read_parquet('{sf_dir}/{t}.parquet')"
        )

    registry = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = subset or sorted(registry)
    n_pass = n_fail = 0
    t_start = time.time()
    for name in names:
        try:
            sdf = registry[name](spark, sf_dir)
            scols = [c.lower() for c in sdf.columns]
            srows = [tuple(r) for r in sdf.collect()]
            sql = oracles.get(name)
            if sql is None:
                n_pass += 1
                continue
            res = con.execute(sql)
            dcols = [d[0].lower() for d in res.description]
            drows = res.fetchall()
            assert sorted(scols) == sorted(dcols), f"cols {scols} vs {dcols}"
            assert len(srows) == len(drows), f"rows {len(srows)} vs {len(drows)}"
            sset = sorted(
                "|".join(_canon(x) for x in r)
                for r in idx_rows(srows, sorted(range(len(scols)), key=lambda i: scols[i]))
            )
            dset = sorted(
                "|".join(_canon(x) for x in r)
                for r in idx_rows(drows, sorted(range(len(dcols)), key=lambda i: dcols[i]))
            )
            if sset != dset:
                diff = [(a, b) for a, b in zip(sset, dset) if a != b][:3]
                raise AssertionError(f"value mismatch: {diff}")
            n_pass += 1
        except Exception as e:  # noqa: BLE001
            n_fail += 1
            print(f"FAIL {name}: {e}", flush=True)
    print(
        f"oracle replica: {n_pass} pass / {n_fail} fail over {len(names)}"
        f" queries at {sf_dir} in {round(time.time() - t_start, 1)}s",
        flush=True,
    )

    # --- KG pipeline on a fresh seed (not the test's 42) ---
    from pathhier_spark.plans.pipeline import run_pipeline, triple_precision_recall
    from pathhier_spark.sources import corpus as corpus_mod

    c = corpus_mod.generate(n_classes=120, n_docs=300, seed=1347)
    docs, onto, gold_triples, *_ = corpus_mod.to_spark(spark, c)
    import tempfile

    with tempfile.TemporaryDirectory() as root:
        out = run_pipeline(spark, docs, onto, root)
        pr = triple_precision_recall(out["triples"], gold_triples)
    print(f"pipeline P/R (seed 1347): {pr}", flush=True)
    ok = pr["precision"] >= 0.95 and pr["recall"] >= 0.95
    print(f"pipeline gate: {'PASS' if ok else 'FAIL'}", flush=True)

    spark.stop()
    sys.exit(1 if (n_fail or not ok) else 0)


if __name__ == "__main__":
    main()
