"""North-rule deployment contract: the flagship pipeline runs via
``spark-submit --py-files curator_spark.zip`` (the reference ships Ray
jobs; our cluster unit is a Spark application). The test packages the
zip exactly as ``tools/submit_example.sh`` does and submits
``tools/run_fuzzy_dedup.py`` from a working directory that does NOT
contain the repo — the driver and executors resolve ``curator_spark``
from the ``--py-files`` zip alone."""

from __future__ import annotations

import json
import os
import pathlib
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
SPARK_SUBMIT = shutil.which("spark-submit")


def _package_zip(dest: pathlib.Path) -> pathlib.Path:
    zpath = dest / "curator_spark.zip"
    with zipfile.ZipFile(zpath, "w") as z:
        for p in sorted((REPO / "curator_spark").rglob("*.py")):
            z.write(p, p.relative_to(REPO))
    return zpath


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")
def test_spark_submit_py_files_runs_flagship(spark, tmp_path):
    inp = tmp_path / "clips.parquet"
    from curator_spark.datagen import generate_clips

    generate_clips(spark, 800, seed=7).write.parquet(str(inp))

    zpath = _package_zip(tmp_path)
    workdir = tmp_path / "empty_cwd"  # no curator_spark importable from cwd
    workdir.mkdir()
    ckpt = tmp_path / "ckpt"
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    out = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master",
            "local[4]",
            "--py-files",
            str(zpath),
            "--conf",
            "spark.sql.shuffle.partitions=4",
            "--conf",
            "spark.sql.execution.arrow.pyspark.enabled=true",
            str(REPO / "tools" / "run_fuzzy_dedup.py"),
            str(inp),
            str(ckpt),
        ],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=workdir,
        env=env,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    payload = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    assert payload, out.stdout[-2000:]
    res = json.loads(payload[-1])
    assert res["num_duplicates"] > 0
    assert res["num_components"] > 0

    # the checkpointed stages are real parquet readable by a fresh reader
    comps = spark.read.parquet(str(ckpt / "ConnectedComponents" / "data"))
    assert comps.count() >= res["num_components"]
