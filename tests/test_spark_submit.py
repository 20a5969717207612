"""Ship-shape test (north_rule: "run via spark-submit --py-files"):
package voz_spark into dist/voz_spark.zip and run the crawl-round job
through the REAL `spark-submit` binary from a scratch directory, so
the only source of the package for driver and Python workers is the
zip on --py-files — proving the artifact is self-sufficient.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spark_submit_pyfiles_runs_a_round():
    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        import pytest

        pytest.skip("spark-submit binary not on PATH")

    sys.path.insert(0, REPO)
    from jobs.make_pyfiles import main as make_zip

    zip_path = make_zip()
    assert os.path.exists(zip_path)

    scratch = tempfile.mkdtemp(prefix="submit-")
    job = os.path.join(scratch, "crawl_rounds.py")
    shutil.copy(os.path.join(REPO, "jobs", "crawl_rounds.py"), job)
    workdir = os.path.join(scratch, "crawl")

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    proc = subprocess.run(
        [
            spark_submit,
            "--master",
            "local[8]",
            "--py-files",
            zip_path,
            job,
            "--workdir",
            workdir,
            "--seeds",
            "6",
            "--images",
            "200",
            "--rounds",
            "2",
        ],
        cwd=scratch,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    # the job prints one JSON summary line
    summary = None
    for line in proc.stdout.splitlines():
        line = line.strip()
        if line.startswith("{") and "urls_scheduled" in line:
            summary = json.loads(line)
    assert summary is not None, proc.stdout[-4000:]
    assert summary["rounds"] == 2
    assert summary["urls_scheduled"] > 0
    # the committed catalog is resumable state: round markers exist
    assert os.path.isdir(workdir)

    # resume through spark-submit as well: same workdir, one more round
    proc2 = subprocess.run(
        [
            spark_submit,
            "--master",
            "local[8]",
            "--py-files",
            zip_path,
            job,
            "--workdir",
            workdir,
            "--seeds",
            "6",
            "--images",
            "200",
            "--rounds",
            "1",
        ],
        cwd=scratch,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc2.returncode == 0, proc2.stderr[-4000:]
    summary2 = None
    for line in proc2.stdout.splitlines():
        line = line.strip()
        if line.startswith("{") and "urls_scheduled" in line:
            summary2 = json.loads(line)
    assert summary2 is not None and summary2["resumed_from_round"] == 2
    shutil.rmtree(scratch, ignore_errors=True)
