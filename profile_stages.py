"""Per-stage profiler for optimization work (guide §1/§7) — NOT the driver
bench. Runs one registry query with the event log enabled, then prints each
stage's duration, task count, shuffle bytes and row counts so the expensive
exchange/aggregate is identifiable without the UI.

Usage: python profile_stages.py q207_dbscan [--runs 2]
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    runs = 2
    if "--runs" in sys.argv:
        runs = int(sys.argv[sys.argv.index("--runs") + 1])
    name = args[0]

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    os.environ.setdefault("SPARK_DRIVER_MEM", "48g")
    evdir = "/tmp/spark-events"
    import shutil

    shutil.rmtree(evdir, ignore_errors=True)
    os.makedirs(evdir, exist_ok=True)

    from pathhier_spark.session import get_spark

    spark = get_spark(
        "profile_stages",
        cores=cores,
        shuffle_partitions=max(cores, 8),
        extra={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    from pathhier_spark import queries as q

    registry = q.queries()
    wall = []
    for i in range(runs):
        spark.sparkContext.setJobDescription(f"{name} run{i}")
        t0 = time.time()
        registry[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        wall.append(round(time.time() - t0, 3))
    print(f"wall: {wall}")
    spark.stop()

    # parse the event log: stage durations + metrics
    stages = []
    paths = [p for p in glob.glob(f"{evdir}/**/*", recursive=True) if os.path.isfile(p)]
    for path in paths:
        with open(path) as fh:
            for line in fh:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if ev.get("Event") == "SparkListenerStageCompleted":
                    si = ev["Stage Info"]
                    sub = si.get("Submission Time")
                    comp = si.get("Completion Time")
                    if sub is None or comp is None:
                        continue
                    acc = {
                        a["Name"]: a.get("Value")
                        for a in si.get("Accumulables", [])
                    }
                    stages.append(
                        {
                            "stage": si["Stage ID"],
                            "name": si["Stage Name"].split("\n")[0][:80],
                            "sec": round((comp - sub) / 1000.0, 2),
                            "tasks": si["Number of Tasks"],
                            "shuf_read_mb": round(
                                (acc.get("internal.metrics.shuffle.read.remoteBytesRead", 0) or 0)
                                / 1e6
                                + (acc.get("internal.metrics.shuffle.read.localBytesRead", 0) or 0)
                                / 1e6,
                                1,
                            ),
                            "shuf_write_mb": round(
                                (acc.get("internal.metrics.shuffle.write.bytesWritten", 0) or 0)
                                / 1e6,
                                1,
                            ),
                            "out_rows": acc.get("number of output rows"),
                            "cpu_sec": round(
                                (acc.get("internal.metrics.executorCpuTime", 0) or 0) / 1e9, 1
                            ),
                            "run_sec": round(
                                (acc.get("internal.metrics.executorRunTime", 0) or 0) / 1e3, 1
                            ),
                        }
                    )
    stages.sort(key=lambda s: -s["sec"])
    total = sum(s["sec"] for s in stages)
    print(f"total stage-seconds: {round(total, 1)} across {len(stages)} stages")
    for s in stages[:25]:
        print(
            f"  stage {s['stage']:>4} {s['sec']:>7.2f}s tasks={s['tasks']:>3} "
            f"cpu={s['cpu_sec']:>7.1f}s run={s['run_sec']:>7.1f}s "
            f"shufR={s['shuf_read_mb']:>8.1f}MB shufW={s['shuf_write_mb']:>8.1f}MB  {s['name']}"
        )


if __name__ == "__main__":
    main()
