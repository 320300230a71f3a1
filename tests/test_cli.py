"""spark-submit entry point smoke (jobs/crawl.py, M7 packaging)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_crawl_job_cli(tmp_path):
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = "4"
    out = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "jobs", "crawl.py"),
            "--warehouse", str(tmp_path / "wh"),
            "--synthetic", "60", "--waves", "2",
        ],
        capture_output=True, text=True, timeout=420, env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = [ln for ln in out.stdout.splitlines()
            if ln.startswith("crawl finished:")][-1]
    assert "waves=2" in line
    # resume from the CLI continues the same warehouse
    out2 = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "jobs", "crawl.py"),
            "--warehouse", str(tmp_path / "wh"),
            "--synthetic", "60", "--waves", "3", "--resume",
        ],
        capture_output=True, text=True, timeout=420, env=env,
    )
    assert out2.returncode == 0, out2.stderr[-2000:]
    line2 = [ln for ln in out2.stdout.splitlines()
             if ln.startswith("crawl finished:")][-1]
    assert "waves=3" in line2
