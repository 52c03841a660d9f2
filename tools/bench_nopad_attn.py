#!/usr/bin/env python
"""A/B: per-head flash with host-side 128-lane padding (default) vs
C2D_FLASH_NOPAD=1 (kernel consumes raw head dim, Mosaic pads tiles
internally). Chained-scan timing per the axon protocol; numerics checked.

Targets the batch-16 trace finding: pads + data formatting = 10% of the
step, attention entry layout named as the next ~5% (BENCH_NOTES.md).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


def timed(fn, *args, iters=5):
    fn(*args)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(out).ravel()[:1]
        ts.append(time.perf_counter() - t0)
    return float(np.min(ts))


def chained_cost(step, carry0, k=16, iters=5):
    def prog(n):
        @jax.jit
        def run(c):
            c, _ = jax.lax.scan(lambda c, _: (step(c), ()), c, None, length=n)
            return c

        return run

    t1 = timed(prog(k), carry0, iters=iters)
    t2 = timed(prog(2 * k), carry0, iters=iters)
    return (t2 - t1) / k


def bench(shape, label):
    from clap2diffusion_tpu.ops import flash_attention as fa

    b, h, s, d = shape
    ks = jax.random.split(jax.random.key(0), 3)
    q = jax.random.normal(ks[0], (b, h, s, d), jnp.bfloat16)
    k_ = jax.random.normal(ks[1], (b, h, s, d), jnp.bfloat16)
    v = jax.random.normal(ks[2], (b, h, s, d), jnp.bfloat16)
    scale = float(d) ** -0.5

    results = {}
    outs = {}
    for mode in ("pad", "nopad"):
        os.environ.pop("C2D_FLASH_NOPAD", None)
        if mode == "nopad":
            os.environ["C2D_FLASH_NOPAD"] = "1"

        # fresh lambda per mode -> fresh jit cache entry (env is read at
        # trace time)
        def step(c, _k=k_, _v=v):
            return fa._flash_fwd_perhead(c, _k, _v, scale)

        try:
            results[mode] = chained_cost(step, q)
            outs[mode] = np.asarray(jax.jit(step)(q), np.float32)
        except Exception as e:  # Mosaic may reject the unpadded layout
            print(f"{label} {mode}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            results[mode] = None
    os.environ.pop("C2D_FLASH_NOPAD", None)

    if results.get("pad") and results.get("nopad"):
        err = float(np.abs(outs["pad"] - outs["nopad"]).max())
        speedup = results["pad"] / results["nopad"]
        print(
            f"{label}: pad {results['pad']*1e3:.3f} ms vs nopad "
            f"{results['nopad']*1e3:.3f} ms -> {speedup:.2f}x, max|d|={err:.2e}",
            flush=True,
        )


def main():
    # SD v1.5 attention shapes: level0 self (the hot one), level1 self
    for b in (2, 32):
        bench((b, 8, 4096, 40), f"b{b} h8 s4096 d40")
    bench((2, 8, 1024, 80), "b2 h8 s1024 d80")
    bench((32, 8, 1024, 80), "b32 h8 s1024 d80")


if __name__ == "__main__":
    main()
