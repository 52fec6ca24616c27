"""Driver-contract tests for __graft_entry__.py.

The round-1 driver artifact failed because ``dryrun_multichip`` assumed the
caller pre-configured an 8-device platform (MULTICHIP_r01.json: rc=1).  The
contract is now self-sufficient: when the current process lacks devices it
re-execs a child that forces a CPU mesh.  Ref anchor: SURVEY §2.4
(utils/distributed.py::init_dist — bootstrap belongs to the component).
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_dryrun_in_process_fast_path(capsys):
    """With the conftest 8-device CPU mesh visible, no subprocess is spawned."""
    sys.path.insert(0, REPO)
    try:
        import __graft_entry__ as g
    finally:
        sys.path.remove(REPO)
    g.dryrun_multichip(8)
    out = capsys.readouterr().out
    assert "dryrun_multichip ok" in out
    assert "'data': 4" in out and "'model': 2" in out


@pytest.mark.slow
def test_dryrun_env_less_driver_invocation():
    """Exactly the driver's call: fresh process, no env setup, must self-boot."""
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS", "PYTHONPATH")
    }
    proc = subprocess.run(
        [sys.executable, "-c", "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd=REPO,
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
        timeout=900,
    )
    assert proc.returncode == 0, proc.stdout
    assert "dryrun_multichip ok" in proc.stdout
