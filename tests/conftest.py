"""Test configuration: force CPU JAX with 8 virtual devices.

Tests never touch the real TPU; the sharding tests use the virtual CPU mesh
(the same mechanism the driver's ``dryrun_multichip`` uses).

NOTE: in this environment the ``JAX_PLATFORMS`` env var is overridden by
the TPU platform plugin — ``jax.config.update('jax_platforms', ...)`` is
the reliable way to pin the CPU backend.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
