"""materialize="reliable" vs a REAL executor death (r9 VERDICT task 2).

SCALE.md's executor-loss claim was previously pinned only by
checkpoint-files-on-disk assertions; this test kills actual executor
processes. It launches tests/executor_loss_driver.py in a subprocess
(one JVM = one SparkContext, and the suite's shared session is
local[*]) on Spark's ``local-cluster[2,1,1024]`` master — two real
forked executor processes — SIGKILLs them mid-job, and asserts:

- a reliable (``checkpoint()``) materialization survives the death of
  EVERY executor and returns the exact answer (replacements re-read the
  checkpoint files);
- the same workload under ``local`` (``localCheckpoint()``) fails —
  the blocks died with the executors and lineage is truncated;
- a full ``connected_components(materialize="reliable")`` run killed
  mid-iteration completes with the exact union-find labeling, with the
  kill timestamped before job completion.

Skips when local-cluster executors cannot register in this
environment (containers without process-fork room).
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DRIVER = os.path.join(REPO, "tests", "executor_loss_driver.py")


def test_reliable_materialization_survives_real_executor_death(tmp_path):
    # bounded by the subprocess timeout below (pytest-timeout not installed)
    env = {**os.environ, "PYTHONPATH": REPO}
    proc = subprocess.run(
        [sys.executable, DRIVER, str(tmp_path)],
        capture_output=True,
        text=True,
        timeout=540,
        env=env,
        cwd=REPO,
    )
    out = proc.stdout
    if "LC_UNAVAILABLE" in out:
        pytest.skip("local-cluster executors unavailable in this environment")
    assert proc.returncode == 0, f"driver failed\nstdout:{out}\nstderr:{proc.stderr[-3000:]}"
    # the kills really found live executor processes each round
    for marker in ("KILLED1 [", "KILLED3 ["):
        line = next(ln for ln in out.splitlines() if ln.startswith(marker))
        assert line != f"{marker}]", f"no executor process found to kill: {line}"
    assert "PRIMITIVE_RELIABLE_OK" in out
    assert "PRIMITIVE_LOCAL_FAILED" in out
    assert "PRIMITIVE_LOCAL_SURVIVED" not in out
    assert "CC_LOCAL_FAILED" in out
    assert "CC_LOCAL_SURVIVED" not in out
    assert "CC_RELIABLE_OK" in out
