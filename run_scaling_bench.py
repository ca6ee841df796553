"""Scaling-efficiency evidence (BASELINE.md target): run bench.py at two
parallelism levels (local[8] = N, local[32] = 4N — the sandbox stand-in for
N vs 4N executors) on the same sf0.1 input, compute efficiency =
(throughput@4N / throughput@N) / 4, and write BENCH/BASELINE.md."""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPO = os.path.dirname(os.path.abspath(__file__))


REPLICATE = os.environ.get("SPARK_GRAFT_REPLICATE", "20")


def run_bench(cores: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=SF_DIR, SPARK_GRAFT_CPUS=str(cores),
               SPARK_GRAFT_REPLICATE=REPLICATE)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=3000,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    results = {}
    for cores in (8, 32):
        t0 = time.time()
        results[cores] = run_bench(cores)
        print(f"cores={cores}: {results[cores]['value']} docs/sec "
              f"(bench wall {time.time() - t0:.0f}s)", file=sys.stderr)

    n, n4 = results[8], results[32]
    eff = (n4["value"] / n["value"]) / 4 if n["value"] else 0.0
    speedup = n4["value"] / n["value"] if n["value"] else 0.0

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    lines = [
        "# BENCH/BASELINE — measured throughput & scaling",
        "",
        f"Input: `{SF_DIR}` ({n['n_docs']} documents). Pipeline = html->text",
        "extraction (Arrow UDF) -> token-triple extraction -> IDF inverted-index",
        "entity linking (bench.py headline path). Same input at two parallelism",
        "levels per the two-cluster-size rule (local[8] = N, local[32] = 4N;",
        "sandbox stand-in for N vs 4N executors).",
        "",
        "| parallelism | docs/sec | pipeline sec |",
        "|---|---|---|",
        f"| local[8] (N) | {n['value']} | {n['pipeline_sec']} |",
        f"| local[32] (4N) | {n4['value']} | {n4['pipeline_sec']} |",
        "",
        f"**Speedup N->4N: {speedup:.2f}x; scaling efficiency = {speedup:.2f}/4 = {eff:.3f}**"
        + (" (>= 0.8 target met)" if eff >= 0.8 else " (below 0.8 target — see notes)"),
        "",
        "## Per-query seconds",
        "",
        "| query | local[8] | local[32] |",
        "|---|---|---|",
    ]
    for q in sorted(n["queries"]):
        lines.append(f"| {q} | {n['queries'][q]} | {n4['queries'].get(q, '-')} |")
    lines += [
        "",
        "Raw JSON:",
        "```json",
        json.dumps(n),
        json.dumps(n4),
        "```",
        "",
    ]
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write("\n".join(lines))
    print(json.dumps({"efficiency": round(eff, 3), "speedup": round(speedup, 2),
                      "n8": n["value"], "n32": n4["value"]}))


if __name__ == "__main__":
    main()
