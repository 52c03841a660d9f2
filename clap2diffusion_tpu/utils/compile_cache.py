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

import os


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
    try:
        os.makedirs(path, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:  # unwritable dir / too-old jax: run uncached
        return None
    return path
