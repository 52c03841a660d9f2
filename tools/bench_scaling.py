#!/usr/bin/env python
"""Batch-scaling diagnosis on the real TPU (VERDICT round-1 weak #2).

Measures true device time per component by chaining K iterations inside one
jit (lax.scan with a serializing carry) and reporting (T(2K) - T(K)) / K —
this cancels both dispatch RPC latency and the single host transfer, which
dominate single-call numbers on the tunneled axon backend.

Components x batch sizes:
  - UNet folded-CFG step   @ CFG-batch 2 (user batch 1) and 16 (user batch 8)
  - VAE decode 512px       @ batch 1 and 8
  - CLAP encode            @ batch 1 and 8
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, iters=3):
    """Median wall time of fn(*args), synced via host transfer."""
    for attempt in range(3):  # remote compile can drop the pipe transiently
        try:
            fn(*args)  # warmup/compile
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


def chained(label, make_step, k=12, iters=3):
    """Device time per step: scan the step k and 2k times, diff the medians."""
    step = make_step()

    def run(n):
        @jax.jit
        def prog(carry):
            def body(c, _):
                return step(c), ()

            c, _ = jax.lax.scan(body, carry, None, length=n)
            return c

        return prog

    carry0 = step.init_carry()
    p1, p2 = run(k), run(2 * k)
    t1 = timed(p1, carry0, iters=iters)
    t2 = timed(p2, carry0, iters=iters)
    per = (t2 - t1) / k
    print(f"{label}: {per*1000:.2f} ms/iter  (T{k}={t1:.3f}s T{2*k}={t2:.3f}s)",
          flush=True)
    return per


def main():
    from clap2diffusion_tpu.core.config import Config
    from clap2diffusion_tpu.diffusion.pipeline import cached_init_params as init_params
    from clap2diffusion_tpu.models.unet import UNet2DCondition
    from clap2diffusion_tpu.models.vae import AutoencoderKL
    from clap2diffusion_tpu.models.clap.frontend import log_mel_spectrogram
    from clap2diffusion_tpu.models.clap.htsat import HTSATEncoder

    cfg = Config()
    print("initializing params...", flush=True)
    params = init_params(cfg, seed=0, dtype=jnp.bfloat16)

    unet = UNet2DCondition(cfg=cfg.diffusion.unet)
    vae = AutoencoderKL(cfg=cfg.diffusion.vae)

    results = {}

    # ---- UNet folded-CFG step at CFG-batch B ----
    def unet_case(b):
        class Step:
            def init_carry(self):
                return jnp.ones((b, 64, 64, 4), jnp.bfloat16)

            def __call__(self, lat):
                t = jnp.full((b,), 500, jnp.int32)
                ctx = jnp.ones((b, 77, 768), jnp.bfloat16)
                audio = {k: jnp.ones((b, 10, 768), jnp.bfloat16)
                         for k in ("early", "mid", "late")}
                out = unet.apply({"params": params["unet"]}, lat, t, ctx, audio)
                return out.astype(jnp.bfloat16)

        return Step()

    for b in (2, 4, 16):
        results[f"unet_cfg_b{b}"] = chained(
            f"unet step cfg-batch {b}", lambda b=b: unet_case(b), k=8)

    # ---- VAE decode at batch B ----
    def vae_case(b):
        class Step:
            def init_carry(self):
                return jnp.ones((b, 64, 64, 4), jnp.bfloat16)

            def __call__(self, z):
                img = vae.apply({"params": params["vae"]}, z,
                                method=AutoencoderKL.decode_latent)
                # serialize: feed a cheap reduction of the image back in
                fb = jnp.mean(img.astype(jnp.float32)) * 1e-6
                return (z + fb).astype(jnp.bfloat16)

        return Step()

    for b in (1, 8):
        results[f"vae_decode_b{b}"] = chained(
            f"vae decode 512px batch {b}", lambda b=b: vae_case(b), k=4)

    # ---- CLAP encode (mel + HTSAT) at batch B ----
    htsat = HTSATEncoder(cfg=cfg.clap.audio)

    def clap_case(b):
        n = cfg.clap.frontend.num_samples

        class Step:
            def init_carry(self):
                return jnp.ones((b, n), jnp.float32) * 0.01

            def __call__(self, wav):
                mel = log_mel_spectrogram(wav, cfg.clap.frontend)
                emb = htsat.apply({"params": params["clap_audio"]}, mel)
                fb = jnp.mean(emb) * 1e-6
                return wav + fb

        return Step()

    for b in (1, 8):
        results[f"clap_encode_b{b}"] = chained(
            f"clap encode batch {b}", lambda b=b: clap_case(b), k=4)

    # ---- summary ----
    print("\n== scaling summary ==", flush=True)
    u2, u16 = results["unet_cfg_b2"], results["unet_cfg_b16"]
    print(f"unet: b16/b2 time ratio {u16/u2:.2f}x for 8x work "
          f"(perfect scaling would be <=8x; lower is better)")
    v1, v8 = results["vae_decode_b1"], results["vae_decode_b8"]
    print(f"vae:  b8/b1 time ratio {v8/v1:.2f}x for 8x work")
    c1, c8 = results["clap_encode_b1"], results["clap_encode_b8"]
    print(f"clap: b8/b1 time ratio {c8/c1:.2f}x for 8x work")
    # implied batch-8 image latency from components
    implied_b8 = 50 * u16 + v8 + c8
    implied_b1 = 50 * u2 + v1 + c1
    print(f"implied full b1: {implied_b1:.3f}s  b8: {implied_b8:.3f}s "
          f"({8/implied_b8:.2f} img/s)")
    # UNet MFU: ~0.68 TFLOP per CFG-sample-pair forward (round-1 estimate
    # 1.36 TFLOP per 2-batch step)
    for b in (2, 4, 16):
        tflop = 0.68 * b
        t = results[f"unet_cfg_b{b}"]
        print(f"unet b{b}: {tflop/t:.1f} TFLOP/s ({100*tflop/t/197:.1f}% MFU)")


if __name__ == "__main__":
    main()
