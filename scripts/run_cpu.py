"""Run a script pinned to the CPU JAX backend.

On this box the ``JAX_PLATFORMS`` env var is ignored (the axon TPU plugin
overrides it); the only reliable pin is
``jax.config.update('jax_platforms', 'cpu')`` before backend init. Use
this wrapper to smoke-test examples/scripts without touching the TPU
tunnel (one TPU client at a time — CLAUDE.md):

    python scripts/run_cpu.py examples/rl_cartpole_ppo.py --rollouts 2
"""

import runpy
import sys

import jax

jax.config.update("jax_platforms", "cpu")

if len(sys.argv) < 2:
    sys.exit("usage: run_cpu.py <script.py> [args...]")
sys.argv = sys.argv[1:]
runpy.run_path(sys.argv[0], run_name="__main__")
