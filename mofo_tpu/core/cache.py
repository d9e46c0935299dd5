"""Persistent XLA compilation cache.

First compiles of the ViT-B train step take minutes; the cache makes every
subsequent process start instantly. Called by the CLI runners and bench.
"""

from __future__ import annotations

import os


def enable_compilation_cache(
    path: str = os.path.expanduser("~/.cache/mofo_tpu_xla"),
) -> None:
    import jax

    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is an optimization, never a failure
