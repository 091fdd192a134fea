"""Persistent XLA compilation cache.

The fused image->pose program takes minutes to compile on TPU; enabling
JAX's persistent compilation cache makes every rerun at a seen shape load in
seconds. Called by the CLI tools and bench harness.
"""
from __future__ import annotations

import os


def enable_compilation_cache(cache_dir: str | None = None) -> str:
    import jax
    cache_dir = cache_dir or os.environ.get(
        "PVNET_JAX_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "pvnet_tpu_xla"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir
