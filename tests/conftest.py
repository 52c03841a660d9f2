"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; per SURVEY.md section 4 the
sharding/collective paths are validated with
``--xla_force_host_platform_device_count=8`` fake devices, the TPU-native
answer to "multi-node tests without a cluster".
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# jax may already be imported (and JAX_PLATFORMS captured) by an interpreter
# startup hook, so override via config rather than the environment.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

# Persistent compilation cache, shared with __graft_entry__'s dryrun: the CI
# host has a single CPU core, so cold XLA:CPU compiles dominate the suite's
# wall time; re-runs hit this cache and the suite gates in minutes.
# Scoped per host CPU fingerprint: XLA:CPU AOT entries are machine-feature
# specific, and loading another machine's entries segfaults (see
# utils/compile_cache.py::host_cpu_tag).
from clap2diffusion_tpu.utils.compile_cache import host_cpu_tag  # noqa: E402

_cache = os.environ.get("C2D_TEST_CACHE") or os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".cache", "jax", host_cpu_tag(),
)
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_devices():
    devs = jax.devices()
    assert len(devs) >= 8, f"expected 8 fake CPU devices, got {len(devs)}"
    return devs


@pytest.fixture(autouse=True, scope="module")
def _bound_live_executables():
    """Drop JAX's in-memory jit caches after each test module.

    A single-process full-suite run accumulates hundreds of live XLA:CPU
    executables; past ~200 the native serializer crashed (SIGSEGV inside
    ``put_executable_and_time`` while writing the persistent cache — seen
    twice, deterministically, at the same test). Clearing between modules
    bounds the accumulation; cross-module recompiles hit the persistent
    on-disk cache, so the wall-time cost is seconds."""
    yield
    jax.clear_caches()
