"""Persistent XLA compilation cache.

The fused image->pose program takes minutes to compile on TPU; enabling
JAX's persistent compilation cache makes every rerun at a seen shape load in
seconds. Called by the CLI tools and bench harness.
"""
from __future__ import annotations

import os


def host_fingerprint() -> str:
    """Short hash of the host CPU feature flags.

    XLA:CPU's persistent cache stores AOT machine code keyed WITHOUT the
    host microarchitecture (`cpu_aot_loader.cc` only warns at load time —
    and even a same-machine hit warns about the `prefer-no-gather/scatter`
    pseudo-features, so the warning alone proves nothing). Containers
    sharing a home volume across heterogeneous hosts would execute
    foreign machine code on a hit; suffixing cache dirs with this
    fingerprint makes entries host-private. (The 2026-08-20 fresh-process
    segfaults initially blamed on this turned out to be LAPACK custom
    calls in jax.export artifacts — see ops/smalllinalg.py — but the
    cross-host hazard is real regardless.)"""
    import hashlib
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    return hashlib.sha1(line.encode()).hexdigest()[:10]
    except OSError:
        pass
    import platform
    return platform.machine() or "unknown"


def pin_platform_from_env() -> None:
    """Honor a PVNET_PLATFORM env var (e.g. 'cpu') before JAX picks a
    backend. The axon TPU plugin overrides the standard JAX_PLATFORMS env
    route, so hermetic child processes (test suites spawning CLI tools)
    need this config-API escape hatch to stay off the shared chip."""
    plat = os.environ.get("PVNET_PLATFORM")
    if plat:
        import jax
        jax.config.update("jax_platforms", plat)


def enable_compilation_cache(cache_dir: str | None = None) -> str:
    import jax
    cache_dir = cache_dir or os.environ.get(
        "PVNET_JAX_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache",
                     "pvnet_tpu_xla-" + host_fingerprint()))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir
