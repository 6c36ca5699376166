"""Cross-PROCESS distributed execution test.

``misc/multihost_dryrun.py`` joins two OS processes (4 virtual CPU devices
each) into one 8-device global mesh via ``jax.distributed`` over localhost
and runs the fleet's solve_body + psum-stats program with the batch sharded
across the process boundary — the closest single-machine analog of the
multi-host DCN path (SURVEY §2.3: communication backend).
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_process_distributed_dryrun():
    env = dict(os.environ)
    # the workers configure their own virtual-device count and platform;
    # drop the test-session overrides so they start clean
    env.pop("XLA_FLAGS", None)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "misc", "multihost_dryrun.py")],
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "MULTIHOST DRYRUN: PASS" in out.stdout
    assert "[worker 0] OK" in out.stdout and "[worker 1] OK" in out.stdout
