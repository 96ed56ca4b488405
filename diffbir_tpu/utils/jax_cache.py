"""Persistent XLA compilation cache for every entry point.

Compiles cost ~25-150 s on this class of host (CLAUDE.md); the on-disk cache
amortizes them across CLI invocations, server restarts, and bench reruns.
Call ``enable_persistent_cache()`` right after importing jax in an entry
script (before the first jit compilation; backend init order is irrelevant).
"""

from __future__ import annotations

import os


def enable_persistent_cache(path: str | None = None) -> None:
    import jax

    path = path or os.environ.get(
        "DIFFBIR_TPU_JAX_CACHE", "/tmp/diffbir_tpu_jax_cache"
    )
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # older jax without these options: run uncached
