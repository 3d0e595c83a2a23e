"""The north-rule ship path, exercised for real: build the --py-files zip,
launch a fresh JVM via spark-submit with NO repo dir on sys.path, run a
3-wave synthetic crawl through jobs/crawl_job.py, and then resume it for a
4th wave from the on-disk checkpoint in a second spark-submit — proving the
deployed artifact is self-contained and the state layout survives process
boundaries (north rule: "ships via spark-submit --py-files ... resumable
from checkpoint snapshots")."""

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SPARK_SUBMIT = shutil.which("spark-submit") or os.path.join(
    os.path.dirname(sys.executable), "..", "lib", "python3.11",
    "site-packages", "pyspark", "bin", "spark-submit",
)


def _submit(zip_path: str, state_dir: str, waves: int, cwd: str) -> dict:
    env = dict(
        os.environ,
        PYSPARK_PYTHON=sys.executable,
        PYSPARK_DRIVER_PYTHON=sys.executable,
    )
    # scrub any inherited path that could mask a broken zip
    env.pop("PYTHONPATH", None)
    proc = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]",
         "--conf", "spark.sql.shuffle.partitions=8",
         "--py-files", zip_path,
         os.path.join(REPO, "jobs", "crawl_job.py"),
         "--state-dir", state_dir, "--seeds", "2000", "--hosts", "64",
         "--waves", str(waves), "--budget", "16"],
        capture_output=True, text=True, timeout=600, cwd=cwd, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    line = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def test_spark_submit_py_files_run_and_resume(tmp_path):
    import package

    zip_path = package.build(str(tmp_path / "llm_scraper_spark.zip"))
    state_dir = str(tmp_path / "state")
    # cwd OUTSIDE the repo: the engine must come from the zip, not from ./
    out1 = _submit(zip_path, state_dir, waves=3, cwd=str(tmp_path))
    lw1 = out1["ledger"]["waves"]
    assert [w["wave"] for w in lw1] == [-1, 0, 1, 2]  # -1 = seed commit
    assert all(w["scheduled"] > 0 for w in lw1 if w["wave"] >= 0)

    # second process, same state dir: resumes at wave 3, ledger is appended
    out2 = _submit(zip_path, state_dir, waves=4, cwd=str(tmp_path))
    lw2 = out2["ledger"]["waves"]
    assert [w["wave"] for w in lw2] == [-1, 0, 1, 2, 3]
    # earlier waves' metrics are byte-stable across the resume boundary
    assert lw2[:4] == lw1
