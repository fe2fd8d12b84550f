"""Real 2-process multihost run (scripts/multihost_localhost.py).

Launches two OS processes with an explicit jax.distributed coordinator on
localhost CPU devices and asserts the full multi-process seam works:
``jax.make_array_from_process_local_data`` camera stitching, the scanned
shard_map DP step over a process-spanning mesh, bitwise state consistency
across processes, and the collective checkpoint write + barrier.  This is
the only place ``process_count > 1`` actually executes in CI — the other
multihost tests cover the single-process degenerate forms.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "multihost_localhost.py")


@pytest.mark.heavy
def test_two_process_localhost_run():
    env = dict(os.environ)
    # the parent sets its children's env itself; just make sure no stale
    # child/coordinator vars leak in from the outer test environment
    for k in ("S3G_CHILD", "S3G_COORDINATOR", "S3G_NUM_PROCESSES",
              "S3G_PROCESS_ID"):
        env.pop(k, None)
    res = subprocess.run([sys.executable, SCRIPT], env=env,
                         capture_output=True, text=True, timeout=900)
    assert res.returncode == 0, res.stdout + res.stderr
    assert "MULTIHOST_OK" in res.stdout
