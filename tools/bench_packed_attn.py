#!/usr/bin/env python
"""Packed (transpose-free, head-fused) attention vs the per-head flash path
on the real TPU, standalone and inside a full transformer block."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, iters=3):
    fn(*args)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0][0]).ravel()[:1]
        ts.append(time.perf_counter() - t0)
    # min, not median: the axon tunnel adds sporadic multi-ms stalls and the
    # device-time floor is the signal
    return float(np.min(ts))


def chained(label, step, carry0, k=16, iters=5, flops=None):
    def run(n):
        @jax.jit
        def prog(c):
            c, _ = jax.lax.scan(lambda c, _: (step(c), ()), c, None, length=n)
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


def main():
    from clap2diffusion_tpu.ops import flash_attention as fa
    from clap2diffusion_tpu.ops.attention import mha

    h, s, d = 8, 4096, 40
    hd = h * d
    for b in (2, 16):
        ks = jax.random.split(jax.random.key(0), 3)
        qn, kn, vn = (
            jax.random.normal(kk, (b, s, hd), jnp.bfloat16) for kk in ks
        )
        fl = 2 * 2 * b * h * s * s * d

        def packed_step(c):
            return fa.packed_flash_nhd(c, kn, vn, h, 3, d**-0.5).astype(c.dtype)

        chained(f"packed-nhd b{b} {s}x{d}", packed_step, qn, k=24, flops=fl)

        qh, kh, vh = (
            x.reshape(b, s, h, d).transpose(0, 2, 1, 3) for x in (qn, kn, vn)
        )

        def flash_step(c, kh=kh, vh=vh):
            return fa._flash_fwd_perhead(c, kh, vh, d**-0.5).astype(c.dtype)

        chained(f"flash-perhead b{b} {s}x{d}", flash_step, qh, k=24, flops=fl)

    # full transformer block, old vs new mha routing
    for b in (2, 16):
        c0 = jax.random.normal(jax.random.key(0), (b, s, 320), jnp.bfloat16)
        wqkv = jax.random.normal(jax.random.key(1), (320, 960), jnp.bfloat16) * 0.02
        wo = jax.random.normal(jax.random.key(2), (320, 320), jnp.bfloat16) * 0.02
        wff1 = jax.random.normal(jax.random.key(3), (320, 5120), jnp.bfloat16) * 0.02
        wff2 = jax.random.normal(jax.random.key(4), (2560, 320), jnp.bfloat16) * 0.02

        def block(c, packed):
            x = c - c.mean(-1, keepdims=True)
            x = x * jax.lax.rsqrt(x.var(-1, keepdims=True) + 1e-5)
            qkv = x @ wqkv
            q, k, v = jnp.split(qkv, 3, axis=-1)
            if packed:
                a = fa.packed_flash_nhd(q, k, v, h, 3, d**-0.5)
            else:
                qh, kh, vh = (
                    t.reshape(b, s, h, d).transpose(0, 2, 1, 3)
                    for t in (q, k, v)
                )
                ah = fa._flash_fwd_perhead(qh, kh, vh, d**-0.5)
                a = ah.transpose(0, 2, 1, 3).reshape(b, s, 320)
            c = c + a @ wo
            x = c - c.mean(-1, keepdims=True)
            x = x * jax.lax.rsqrt(x.var(-1, keepdims=True) + 1e-5)
            u, g = jnp.split(x @ wff1, 2, axis=-1)
            c = c + (u * jax.nn.gelu(g)) @ wff2
            return c.astype(jnp.bfloat16)

        fl = 2 * 2 * b * h * s * s * d + 2 * b * s * (
            320 * 960 + 320 * 320 + 320 * 5120 + 2560 * 320
        )
        chained(f"block packed b{b}", lambda c: block(c, True), c0, k=16, flops=fl)
        chained(f"block perhead b{b}", lambda c: block(c, False), c0, k=16, flops=fl)


if __name__ == "__main__":
    main()
