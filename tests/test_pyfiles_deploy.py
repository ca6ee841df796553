"""spark-submit --py-files deployment smoke (BASELINE.md rule: "run via
spark-submit --py-files").

Everything upstream assumes the package is importable because the repo is
on sys.path; a real cluster ships ONLY dist/pathhier_spark.zip to the
executors. This test proves that path end-to-end: build the zip with
package_pyfiles.build(), then launch a genuinely separate spark-submit
process from a neutral cwd (the repo is NOT on its sys.path and cwd is a
tmp dir), so `import pathhier_spark` can resolve from the zip alone, and
run a driver-gate query against sf0.001. Failure modes it catches that
in-process tests cannot: a module missed by the zip walk (e.g. a new
subpackage without .py files picked up), data files assumed next to the
source, and cwd-relative paths inside the package.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")

DRIVER = """
import sys

# fail loudly if the package would resolve from anywhere but --py-files
for p in list(sys.path):
    if p.rstrip("/").endswith("repo"):
        sys.path.remove(p)

import pathhier_spark  # noqa: F401  (zip import is the point)
from pathhier_spark import queries as q
from pyspark.sql import SparkSession

src = next(iter(pathhier_spark.__path__))
assert ".zip" in src, f"package resolved outside the zip: {src}"

spark = (
    SparkSession.builder.master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
rows = q.queries()["q01_pricing_summary"](spark, sys.argv[1]).collect()
assert len(rows) >= 1, "q01 returned no rows under --py-files deploy"
print("PYFILES_DEPLOY_OK", len(rows))
spark.stop()
"""


@pytest.mark.skipif(
    shutil.which("spark-submit") is None, reason="spark-submit not on PATH"
)
def test_spark_submit_pyfiles_deploy(tmp_path):
    sys.path.insert(0, REPO)
    from package_pyfiles import build

    zip_path = build(str(tmp_path / "pathhier_spark.zip"))
    assert os.path.exists(zip_path)

    script = tmp_path / "driver.py"
    script.write_text(DRIVER)

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the only source
    proc = subprocess.run(
        [
            "spark-submit",
            "--master", "local[4]",
            "--py-files", zip_path,
            "--conf", "spark.driver.memory=2g",
            str(script), f"{TESTDATA}/sf0.001",
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, (
        f"spark-submit failed\nstdout:\n{proc.stdout[-3000:]}\n"
        f"stderr:\n{proc.stderr[-3000:]}"
    )
    assert "PYFILES_DEPLOY_OK" in proc.stdout
