"""Persistent XLA compilation cache setup.

The flagship jits (T=16 train step, 49-step sampler) take minutes to
compile on TPU; enabling JAX's persistent compilation cache makes every
process after the first start in seconds. Called by the CLI, bench, and
the driver entry points; safe to call multiple times.
"""

from __future__ import annotations

import os


def _default_cache_dir() -> str:
    """Repo-local cache (survives across driver sessions; /tmp does not)."""
    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    return os.path.join(repo_root, ".jax_cache")


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    cache_dir = path or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", _default_cache_dir()
    )
    try:
        # scope by platform: XLA:CPU AOT artifacts are machine-feature
        # sensitive and reloading them across hosts warns (or SIGILLs)
        platform = jax.default_backend()
    except Exception:
        platform = "any"
    cache_dir = os.path.join(cache_dir, platform)
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without these flags
