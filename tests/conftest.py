"""Test config: force an 8-device virtual CPU platform before JAX starts.

Multi-chip shardings are validated on this virtual mesh (the real TPU is a
single chip in CI); numeric kernels run in XLA-CPU / Pallas interpret mode.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax

if os.environ.get("PVNET_TEST_TPU", "0") != "1":
    # The env-var route (JAX_PLATFORMS) is overridden by the axon TPU plugin
    # in this image; the config API wins.
    jax.config.update("jax_platforms", "cpu")
    # Child CLI processes (export/export_weights subprocess tests) must be
    # hermetic too: without this they grab the real TPU through the tunnel
    # — slow, and contended if anything else (a training run) holds the
    # chip. tools/*.py honor it via utils.cache.pin_platform_from_env.
    os.environ.setdefault("PVNET_PLATFORM", "cpu")

# Persistent compilation cache for the suite: XLA-CPU compiles dominate the
# ~35-min single-core wall time, and the long-run flaky segfault this suite
# has seen lives INSIDE backend_compile (jax compiler.py:362) — cache hits
# skip that code path entirely on reruns, shrinking both the wall time and
# the crash window.
from pvnet_tpu.utils.cache import host_fingerprint  # noqa: E402

# Host-fingerprinted dir: XLA:CPU AOT cache entries are machine code not
# keyed on the host microarchitecture (utils/cache.host_fingerprint);
# containers sharing this home volume across heterogeneous hosts must not
# share entries.
_cache_dir = os.environ.get(
    "PVNET_TEST_JAX_CACHE",
    os.path.join(os.path.expanduser("~"), ".cache",
                 "pvnet_tpu_xla_tests-" + host_fingerprint()))
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
# Child CLI processes (test_export/test_export_weights subprocess tests)
# inherit os.environ: point their enable_compilation_cache() at the same
# persistent dir (entries are platform-keyed, so TPU/CPU coexist) instead
# of each child cold-compiling while the parent suite owns the core.
os.environ.setdefault("PVNET_JAX_CACHE", _cache_dir)

import shutil
import subprocess

import numpy as np
import pytest

# Build the native C++ lib once per session so tests/test_native.py runs
# by default instead of silently skipping (round-2 review weak #7). Only
# skipped when no compiler exists; build failures surface loudly.
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_NATIVE = os.path.join(_REPO, "pvnet_tpu", "native")
if shutil.which("make") and (shutil.which("g++") or shutil.which("cc")):
    subprocess.run(["make", "-C", _NATIVE], check=True,
                   stdout=subprocess.DEVNULL)


@pytest.fixture
def rng():
    return np.random.RandomState(0)


# Subprocess-spawning tests go FIRST: their child processes need the host
# core and a sane memory budget, and the late suite has neither (the
# round-4 review saw test_export_cli_roundtrip hit its 900 s cap ~70%
# through the run while passing standalone in 113 s). Running them before
# the parent accumulates hundreds of XLA-CPU executables keeps the child's
# compile window uncontended.
_SUBPROCESS_MODULES = ("test_export.py", "test_export_weights.py",
                       "test_multihost.py")


def pytest_collection_modifyitems(session, config, items):
    items.sort(key=lambda it: 0 if os.path.basename(
        str(it.fspath)) in _SUBPROCESS_MODULES else 1)


# The full suite compiles hundreds of XLA-CPU programs in one process; the
# accumulated executables have repeatedly crashed the late suite inside
# XLA compile/cache-load native code (SIGSEGV/SIGABRT at ~70%, always in
# the big 8-device programs — test_spatial/test_train — while the same
# files pass standalone). Dropping the in-memory executable caches between
# modules caps that growth; the persistent disk cache above makes any
# re-load cheap.
@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    yield
    jax.clear_caches()
