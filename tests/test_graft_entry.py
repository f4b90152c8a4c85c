"""Regression tests for the driver contract (`__graft_entry__.py`).

Round-1 failure mode: the driver imported the module in a process where the
axon sitecustomize had force-registered the tunneled TPU backend, then called
`dryrun_multichip(8)` in-process — a computation dispatched to the
half-initialized TPU client and died (MULTICHIP_r01: rc=1). These tests
simulate that exact call shape: a child interpreter with the hostile env
(axon sitecustomize on PYTHONPATH, no JAX_PLATFORMS=cpu preset) imports the
module and calls dryrun_multichip.
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
AXON_SITE = "/root/.axon_site"


def _driver_env():
    env = dict(os.environ)
    # undo the pytest conftest's CPU pinning: the driver does not set these
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    paths = [p for p in env.get("PYTHONPATH", "").split(os.pathsep) if p]
    if os.path.isdir(AXON_SITE) and AXON_SITE not in paths:
        paths.append(AXON_SITE)  # the hostile sitecustomize, like the driver
    if REPO not in paths:
        paths.insert(0, REPO)
    env["PYTHONPATH"] = os.pathsep.join(paths)
    return env


def test_dryrun_multichip_survives_driver_env():
    """import module + dryrun_multichip(8) must succeed with no env pre-set."""
    proc = subprocess.run(
        [
            sys.executable,
            "-c",
            "import __graft_entry__ as g; g.dryrun_multichip(8)",
        ],
        cwd=REPO,
        env=_driver_env(),
        capture_output=True,
        text=True,
        timeout=1500,
    )
    assert proc.returncode == 0, f"STDOUT:\n{proc.stdout}\nSTDERR:\n{proc.stderr}"
    assert "dryrun_multichip(8): ok" in proc.stdout


def test_dryrun_does_not_touch_default_backend():
    """The public dryrun_multichip must not initialize JAX in the calling
    process (that is what poisoned round 1)."""
    # NOTE: the axon sitecustomize imports jax at interpreter startup, so
    # `jax in sys.modules` is unavoidable — the poisonous thing is an
    # *initialized backend* in the calling process.
    code = (
        "import sys, __graft_entry__ as g; g.dryrun_multichip(2)\n"
        "if 'jax' in sys.modules:\n"
        "    import jax._src.xla_bridge as xb\n"
        "    assert not xb._backends, f'dryrun initialized backends in-process: {list(xb._backends)}'\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        cwd=REPO,
        env=_driver_env(),
        capture_output=True,
        text=True,
        timeout=1500,
    )
    assert proc.returncode == 0, f"STDOUT:\n{proc.stdout}\nSTDERR:\n{proc.stderr}"
