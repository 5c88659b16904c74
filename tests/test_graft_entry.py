"""Regression tests for the driver-facing ``__graft_entry__`` module.

Round 1's only red gate was ``dryrun_multichip`` initialising the default
(TPU) backend before pinning CPU (MULTICHIP_r01.json: libtpu mismatch).
These tests invoke the entry points in a fresh subprocess *exactly* as the
driver does — with and without the driver's env vars — so the gate cannot
silently regress.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(code: str, env: dict) -> subprocess.CompletedProcess:
    full_env = {k: v for k, v in os.environ.items()
                if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    full_env.update(env)
    return subprocess.run(
        [sys.executable, "-c", code],
        cwd=REPO,
        env=full_env,
        capture_output=True,
        text=True,
        timeout=900,
    )


@pytest.mark.slow
def test_dryrun_multichip_driver_invocation():
    """Exactly the driver's call: env flags set, n=8."""
    r = _run(
        "import __graft_entry__; __graft_entry__.dryrun_multichip(8)",
        {
            "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
            "JAX_PLATFORMS": "cpu",
        },
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "ok" in r.stdout


@pytest.mark.slow
def test_dryrun_multichip_no_env():
    """No env help at all: the module must pin CPU + device count itself."""
    r = _run(
        "import __graft_entry__; __graft_entry__.dryrun_multichip(8)",
        {},
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "ok" in r.stdout
