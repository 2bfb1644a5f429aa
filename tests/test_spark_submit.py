"""North-rule deployment check: the KG job really runs via
``spark-submit --py-files <package.zip>`` with the package imported FROM
the zip (the submit script is copied to a bare temp dir so nothing
resolves from the repo checkout)."""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

import pyspark

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spark_submit_pyfiles_end_to_end(tmp_path):
    sys.path.insert(0, _REPO)
    from tools.package_pyfiles import build_zip

    zip_path = build_zip(str(tmp_path / "fastobo_py_spark.zip"))
    script = tmp_path / "build_kg.py"
    shutil.copy(os.path.join(_REPO, "jobs", "build_kg.py"), script)
    out = tmp_path / "kg_out"
    spark_submit = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    env = dict(os.environ, SPARK_GRAFT_CPUS="4")
    r = subprocess.run(
        [
            spark_submit, "--master", "local[4]", "--py-files", zip_path,
            str(script), "--synthetic", "30", "--out", str(out), "--salts", "2",
        ],
        cwd=str(tmp_path),  # bare dir: package must come from the zip
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert r.returncode == 0, f"spark-submit failed:\n{r.stdout[-2000:]}\n{r.stderr[-4000:]}"
    assert (out / "_manifest").is_dir()
    assert (out / "edges").is_dir()
    assert (out / "_metrics").is_dir()
