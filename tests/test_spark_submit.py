"""spark-submit --py-files deployment smoke (north rule: "runs via
spark-submit --py-files ... on a multi-executor cluster").

Packages the library as a zip, launches a REAL spark-submit process (no
sys.path leakage from the repo checkout: cwd is a temp dir and the job
script contains no path hacks), and asserts the pipeline reaches
pairwise F1 = 1.0 on the synthetic corpus with resumable stage
checkpoints written.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import zipfile
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


def _package_zip(tmp_path) -> Path:
    pkg = tmp_path / "bde_pkg.zip"
    with zipfile.ZipFile(pkg, "w", zipfile.ZIP_DEFLATED) as z:
        for p in sorted((REPO / "bigdataentityresolution_spark").rglob("*.py")):
            z.write(p, p.relative_to(REPO))
    return pkg


def _submit(master: str, pkg: Path, out_dir: Path, extra: list[str] | None = None):
    job = REPO / "scripts" / "submit_job.py"
    env = dict(
        os.environ,
        PYSPARK_PYTHON=sys.executable,
        PYSPARK_DRIVER_PYTHON=sys.executable,
        SPARK_HOME=os.environ.get("SPARK_HOME", "/opt/spark"),
    )
    # cwd = temp dir so the repo checkout is NOT importable; the job's
    # imports must come from the --py-files zip.
    return subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", master,
            "--driver-memory", "4g",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=8",
            *(extra or []),
            "--py-files", str(pkg),
            str(job), str(out_dir), "100", "200",
        ],
        env=env,
        cwd=tempfile.gettempdir(),
        capture_output=True,
        text=True,
        timeout=600,
    )


def _check(res, out_dir: Path):
    assert res.returncode == 0, res.stderr[-3000:]
    report = json.loads(res.stdout.strip().splitlines()[-1])
    assert report["f1"] == 1.0
    assert (out_dir / "labels" / "_SUCCESS").exists()
    # resumable stage checkpoints were written with manifests
    manifests = list((out_dir / "stages").glob("*/_manifest.json"))
    assert manifests, "no stage manifests written"


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not installed"
)
def test_spark_submit_py_files_end_to_end(tmp_path):
    out_dir = tmp_path / "out"
    _check(_submit("local[4]", _package_zip(tmp_path), out_dir), out_dir)


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not installed"
)
def test_spark_submit_multi_executor(tmp_path):
    """Same job on a MULTI-EXECUTOR deployment: local-cluster[2,2,2048]
    spawns two separate executor JVMs (own heaps, own Python workers)
    talking to the driver over RPC — shuffles, broadcasts, --py-files
    shipping, and Arrow exchanges all cross real process boundaries, the
    closest this sandbox gets to the north rule's multi-executor
    cluster."""
    out_dir = tmp_path / "out_mc"
    res = _submit(
        "local-cluster[2,2,2048]",
        _package_zip(tmp_path),
        out_dir,
        extra=["--conf", "spark.executor.memory=2g"],
    )
    _check(res, out_dir)
