"""Driver-contract regression tests for __graft_entry__.py.

dryrun_multichip must force the CPU platform itself (the driver calls it in a
fresh process where the harness presets a real-TPU platform — the round-1
failure mode, VERDICT.md Missing #1), so run it exactly the way the driver
does: a clean subprocess with no test-harness env forcing.
"""
import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_dryrun(n_devices, pre_init=False):
    pre = "import jax; jax.devices();\n" if pre_init else ""
    code = (
        pre
        + "import __graft_entry__\n"
        + f"__graft_entry__.dryrun_multichip({n_devices})\n"
    )
    env = {
        k: v
        for k, v in os.environ.items()
        # strip the conftest's CPU forcing: the dryrun must do this itself
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS")
    }
    return subprocess.run(
        [sys.executable, "-c", code],
        cwd=_REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=560,
    )


def test_dryrun_multichip_subprocess():
    res = _run_dryrun(8)
    assert res.returncode == 0, f"stdout:\n{res.stdout}\nstderr:\n{res.stderr}"
    assert "dryrun_multichip(8)" in res.stdout
