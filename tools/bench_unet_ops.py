#!/usr/bin/env python
"""Per-op UNet microbenchmarks on the real TPU: where do the 24 ms of a
folded-CFG step actually go, and what would a fused transformer block buy?

Chained (lax.scan) timing with T(2K)-T(K) differencing — see
bench_scaling.py for why single-call numbers lie on the axon tunnel.

Ops (SD v1.5 geometry, bf16):
  - flash vs XLA attention at the three self-attn shapes
    (4096x40, 1024x80, 256x160), 8 heads, cfg-batch 2 and 16
  - 3x3 conv + GroupNorm+SiLU at 64x64x320 (the resnet hot path)
  - a full XLA transformer block at 4096x320 (LN+QKV+attn+proj+FF-GEGLU)
    — baseline the fused-block kernel must beat
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, iters=3):
    for attempt in range(3):
        try:
            fn(*args)
            break
        except Exception as e:
            if attempt == 2:
                raise
            print(f"  retry after: {type(e).__name__}", flush=True)
            time.sleep(20)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0][0]).ravel()[:1]
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def chained(label, step, carry0, k=16, iters=3, flops=None):
    def run(n):
        @jax.jit
        def prog(c):
            def body(c, _):
                return step(c), ()

            c, _ = jax.lax.scan(body, c, None, length=n)
            return c

        return prog

    t1 = timed(run(k), carry0, iters=iters)
    t2 = timed(run(2 * k), carry0, iters=iters)
    per = (t2 - t1) / k
    extra = ""
    if flops:
        extra = f"  {flops/per/1e12:.1f} TFLOP/s ({100*flops/per/1e12/197:.0f}% MFU)"
    print(f"{label}: {per*1e3:.3f} ms{extra}", flush=True)
    return per


def attn_flops(b, h, s, d):
    return 2 * 2 * b * h * s * s * d  # QK^T + PV


def main():
    from clap2diffusion_tpu.ops.flash_attention import (
        _xla_attention,
        flash_attention_wrapper,
    )

    key = jax.random.key(0)
    shapes = [(8, 4096, 40), (8, 1024, 80), (8, 256, 160)]
    for b in (2, 16):
        for h, s, d in shapes:
            q, k, v = (
                jax.random.normal(jax.random.key(i), (b, h, s, d), jnp.bfloat16)
                for i in range(3)
            )

            def fstep(c, k=k, v=v):
                return flash_attention_wrapper(c, k, v).astype(jnp.bfloat16)

            def xstep(c, k=k, v=v, d=d):
                return _xla_attention(c, k, v, d ** -0.5).astype(jnp.bfloat16)

            fl = attn_flops(b, h, s, d)
            chained(f"flash b{b} {s}x{d}", fstep, q, k=8, flops=fl)
            chained(f"xla   b{b} {s}x{d}", xstep, q, k=8, flops=fl)

    # resnet hot path at 64x64x320
    for b in (2, 16):
        x = jax.random.normal(key, (b, 64, 64, 320), jnp.bfloat16)
        w = jax.random.normal(key, (3, 3, 320, 320), jnp.bfloat16) * 0.02

        def conv_step(c):
            out = jax.lax.conv_general_dilated(
                c, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            )
            return out.astype(jnp.bfloat16)

        conv_fl = 2 * b * 64 * 64 * 320 * 320 * 9
        chained(f"conv3x3 b{b} 64x64x320", conv_step, x, k=8, flops=conv_fl)

        def gn_silu(c):
            g = c.reshape(b, 64 * 64, 32, 10)
            mu = g.mean(axis=(1, 3), keepdims=True)
            var = ((g - mu) ** 2).mean(axis=(1, 3), keepdims=True)
            g = (g - mu) * jax.lax.rsqrt(var + 1e-5)
            g = g.reshape(c.shape)
            return (g * jax.nn.sigmoid(g)).astype(jnp.bfloat16)

        chained(f"gn+silu b{b} 64x64x320", gn_silu, x, k=8)

    # full XLA transformer block at 4096x320 (what a fused kernel must beat)
    for b in (2, 16):
        c0 = jax.random.normal(key, (b, 4096, 320), jnp.bfloat16)
        wqkv = jax.random.normal(key, (320, 960), jnp.bfloat16) * 0.02
        wo = jax.random.normal(key, (320, 320), jnp.bfloat16) * 0.02
        wff1 = jax.random.normal(key, (320, 2560 * 2), jnp.bfloat16) * 0.02
        wff2 = jax.random.normal(key, (2560, 320), jnp.bfloat16) * 0.02

        def block(c):
            h = c - c.mean(-1, keepdims=True)
            h = h * jax.lax.rsqrt(h.var(-1, keepdims=True) + 1e-5)
            qkv = h @ wqkv
            q, k, v = jnp.split(qkv, 3, axis=-1)

            def heads(t):
                return t.reshape(b, 4096, 8, 40).transpose(0, 2, 1, 3)

            a = flash_attention_wrapper(heads(q), heads(k), heads(v))
            a = a.transpose(0, 2, 1, 3).reshape(b, 4096, 320)
            c = c + a @ wo
            h = c - c.mean(-1, keepdims=True)
            h = h * jax.lax.rsqrt(h.var(-1, keepdims=True) + 1e-5)
            u, g = jnp.split(h @ wff1, 2, axis=-1)
            c = c + (u * jax.nn.gelu(g)) @ wff2
            return c.astype(jnp.bfloat16)

        fl = (
            attn_flops(b, 8, 4096, 40)
            + 2 * b * 4096 * (320 * 960 + 320 * 320 + 320 * 5120 + 2560 * 320)
        )
        chained(f"xfmr block b{b} 4096x320", block, c0, k=8, flops=fl)


if __name__ == "__main__":
    main()
