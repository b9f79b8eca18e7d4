"""spark-submit --py-files launch-path smoke test.

The north rule requires the engine be launchable "via spark-submit
--py-files on a multi-executor cluster" (BASELINE.json ``north_rule``).
The rest of the suite drives the library in-process; this test exercises
the actual submit surface end to end: package ``literature_crawler_spark``
into a zip, launch ``scripts/run_crawl.py`` under a fresh spark-submit JVM
from a NEUTRAL cwd — so the import can only resolve from ``--py-files`` —
run two waves, then re-submit against the same state directory and assert
the resume contract holds across driver processes (reference analogue:
re-running the Celery crawl task against the same DB state,
``/root/reference/app/service/protocol_io/process_task/protocol_io_crawl.py``).

Skipped when no spark-submit binary is on the box (pip-only installs).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"

pytestmark = pytest.mark.skipif(
    not os.path.exists(SUBMIT), reason="no spark-submit distribution on this box"
)


def _zip_package(tmp_path) -> str:
    zip_path = str(tmp_path / "lcs.zip")
    pkg_root = os.path.join(REPO, "literature_crawler_spark")
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, dirnames, filenames in os.walk(pkg_root):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for fn in filenames:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    zf.write(full, os.path.relpath(full, REPO))
    return zip_path


def _submit(zip_path, state_dir, cwd, *extra) -> dict:
    """Run one spark-submit invocation; return the final summary line."""
    env = dict(os.environ)
    # workers and driver must agree on the interpreter under test
    env.setdefault("PYSPARK_PYTHON", sys.executable)
    env.setdefault("PYSPARK_DRIVER_PYTHON", sys.executable)
    # keep the submit JVM small — the in-process test JVM may still be live
    cmd = [
        SUBMIT,
        "--master", "local[2]",
        "--driver-memory", "2g",
        "--py-files", zip_path,
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.sql.shuffle.partitions=4",
        os.path.join(REPO, "scripts", "run_crawl.py"),
        "--state", state_dir,
        "--pages", "300", "--hosts", "6", "--seeds", "12", "--budget", "5",
        *extra,
    ]
    proc = subprocess.run(
        cmd, cwd=cwd, env=env, capture_output=True, text=True, timeout=420
    )
    assert proc.returncode == 0, f"spark-submit failed:\n{proc.stderr[-4000:]}"
    summaries = [
        json.loads(line)
        for line in proc.stdout.splitlines()
        if line.startswith("{") and '"summary": true' in line
    ]
    assert len(summaries) == 1, f"expected one summary line, got:\n{proc.stdout}"
    return summaries[0]


def test_spark_submit_py_files_launch_and_resume(tmp_path):
    zip_path = _zip_package(tmp_path)
    state_dir = str(tmp_path / "crawl_state")
    # neutral cwd: literature_crawler_spark must NOT be importable from
    # here — only from the --py-files zip
    neutral = tmp_path / "neutral_cwd"
    neutral.mkdir()

    first = _submit(zip_path, state_dir, str(neutral), "--waves", "2", "--fresh")
    assert first["waves_run"] == 2
    assert first["scheduled_total"] > 0
    assert first["seen_total"] >= first["scheduled_total"]

    # second driver process, same state dir, no --fresh: resumes from the
    # committed snapshots and crawls strictly further
    second = _submit(zip_path, state_dir, str(neutral), "--waves", "1")
    assert second["waves_run"] == 1
    assert second["last_wave"] == first["last_wave"] + 1
    assert second["seen_total"] >= first["seen_total"]
    assert second["scheduled_total"] > first["scheduled_total"]
