#!/usr/bin/env python
"""A/B the Pallas Winograd conv vs XLA direct conv at SD UNet shapes."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from clap2diffusion_tpu.ops.winograd_pallas import (
    conv3x3_winograd_pallas,
    eligible,
)


def chained(label, fn, x, w, iters=3, k=200, flops=None):
    @jax.jit
    def prog(x, w):
        def body(c, _):
            return fn(c, w) * 0.98, None

        # scalar result: fetching the full activation over the tunnel would
        # swamp the timing (~5 MB -> hundreds of ms)
        return jnp.sum(jax.lax.scan(body, x, None, length=k)[0])

    float(prog(x, w))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(prog(x, w))
        ts.append((time.perf_counter() - t0) / k)
    ms = min(ts) * 1000
    msg = f"{label}: {ms:.3f} ms/conv"
    if flops:
        msg += f"  {flops / (ms / 1000) / 1e12:.1f} TF/s"
    print(msg, flush=True)


def direct(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def main():
    rng = np.random.default_rng(0)
    cases = [
        (2, 64, 64, 320, 320),
        (2, 32, 32, 640, 640),
        (16, 64, 64, 320, 320),
    ]
    for b, h, w_, cin, co in cases:
        x = jnp.asarray(
            rng.normal(size=(b, h, w_, cin)).astype(np.float32)
        ).astype(jnp.bfloat16)
        w = (jnp.asarray(
            rng.normal(size=(3, 3, cin, co)).astype(np.float32)) * 0.05
        ).astype(jnp.bfloat16)
        fl = 2 * b * h * w_ * 9 * cin * co
        tag = f"b{b} {h}x{w_} {cin}->{co}"
        if not eligible(x.shape, cin, co):
            print(f"{tag}: NOT eligible (VMEM)", flush=True)
            continue
        try:
            chained(f"wino   {tag}", conv3x3_winograd_pallas, x, w, flops=fl)
        except Exception as e:
            print(f"wino   {tag}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
        chained(f"direct {tag}", direct, x, w, flops=fl)


if __name__ == "__main__":
    main()
