"""Persistent XLA compilation cache for user-facing entry points.

The full 512px serving program takes minutes to compile cold (the SD UNet
under a 50-step ``lax.scan``); XLA's persistent cache cuts repeat launches
to seconds. Every bench tool already opts in — this makes the CLI, HTTP
server, gradio app and trainer do the same by default.

Env contract:
  C2D_COMPILE_CACHE=0        disable
  C2D_COMPILE_CACHE=<path>   cache directory (default
                             ~/.cache/clap2diffusion_tpu/xla)
"""

from __future__ import annotations

import hashlib
import os


def host_cpu_tag() -> str:
    """Short fingerprint of this host's CPU feature set.

    XLA:CPU AOT executables are compiled FOR the build host's exact
    feature flags (avx512*, amx-*, ...); the persistent cache does not key
    on them, so an entry written on one machine can SIGILL/segfault when
    deserialized on another (observed in CI: 'Machine type used for
    XLA:CPU compilation doesn't match the machine type for execution',
    then a segfault inside put_executable_and_time). Scoping the cache
    directory by this tag makes every host hit only its own entries.
    """
    try:
        with open("/proc/cpuinfo") as f:
            line = next(l for l in f if l.startswith("flags"))
    except Exception:
        import platform

        line = platform.processor() or platform.machine() or "unknown"
    return hashlib.sha1(line.encode()).hexdigest()[:10]


def enable_compilation_cache() -> str | None:
    """Idempotently point JAX at a persistent compile cache; returns the
    directory, or None when disabled. Call before the first jit dispatch
    (later calls still help future compiles — nothing breaks)."""
    value = os.environ.get("C2D_COMPILE_CACHE", "")
    if value == "0":
        return None
    path = value or os.path.join(
        os.path.expanduser("~"), ".cache", "clap2diffusion_tpu", "xla"
    )
    path = os.path.join(path, host_cpu_tag())
    try:
        os.makedirs(path, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:  # unwritable dir / too-old jax: run uncached
        return None
    return path
