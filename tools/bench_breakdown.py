#!/usr/bin/env python
"""Latency breakdown on the real TPU: CLAP encode / single folded-CFG UNet
step / VAE decode / full pipeline, plus batch-8 throughput (BASELINE.md
configs 1, 2, 3, 4). Diagnostics only — bench.py remains the one-line
headline contract.
"""

from __future__ import annotations

import sys
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from clap2diffusion_tpu.core.config import Config
    from clap2diffusion_tpu.diffusion.pipeline import AudioToImagePipeline, cached_init_params as init_params
    from clap2diffusion_tpu.utils.profiling import Timer

    cfg = Config()
    params = init_params(cfg, seed=0, dtype=jnp.bfloat16)
    pipe = AudioToImagePipeline(cfg, params=params)
    timer = Timer()

    rng = np.random.default_rng(0)
    wav = (rng.normal(size=(1, cfg.clap.frontend.num_samples)) * 0.1).astype(
        np.float32
    )
    ids = rng.integers(0, 49_000, size=(1, 77)).astype(np.int32)

    # config 1: CLAP encode
    timer.time_fn("clap_encode", lambda: pipe.encode_audio(jnp.asarray(wav)),
                  warmup=1, iters=10)

    # config 2-ish: single folded-CFG UNet step at 64x64 latents (512px)
    from clap2diffusion_tpu.models.unet import UNet2DCondition

    unet = UNet2DCondition(cfg=cfg.diffusion.unet)

    @jax.jit
    def unet_step(p, lat, t, ctx, audio):
        return unet.apply({"params": p}, lat, t, ctx, audio)

    lat2 = jnp.ones((2, 64, 64, 4), jnp.bfloat16)
    t2 = jnp.array([500, 500], jnp.int32)
    ctx2 = jnp.ones((2, 77, 768), jnp.bfloat16)
    audio2 = {k: jnp.ones((2, 10, 768), jnp.bfloat16) for k in ("early", "mid", "late")}
    timer.time_fn("unet_step_cfg2", lambda: unet_step(params["unet"], lat2, t2, ctx2, audio2),
                  warmup=1, iters=10)

    # VAE decode at 512
    from clap2diffusion_tpu.models.vae import AutoencoderKL

    vae = AutoencoderKL(cfg=cfg.diffusion.vae)

    @jax.jit
    def decode(p, z):
        return vae.apply({"params": p}, z, method=AutoencoderKL.decode_latent)

    z = jnp.ones((1, 64, 64, 4), jnp.bfloat16)
    timer.time_fn("vae_decode_512", lambda: decode(params["vae"], z),
                  warmup=1, iters=5)

    # config 3: full 50-step pipeline, batch 1
    timer.time_fn(
        "full_50step_b1",
        lambda: pipe.generate(waveform=wav[0], text_ids=ids, num_steps=50, seed=0),
        warmup=1, iters=3,
    )

    # config 4: batch-8 throughput
    ids8 = np.repeat(ids, 8, axis=0)
    timer.time_fn(
        "full_50step_b8",
        lambda: pipe.generate(waveform=wav[0], text_ids=ids8, num_steps=50,
                              seed=0, batch=8),
        warmup=1, iters=3,
    )

    summary = timer.summary()
    for k, v in summary.items():
        print(f"{k}: p50={v['p50']*1000:.1f}ms  min={v['min']*1000:.1f}ms", flush=True)
    b8 = summary["full_50step_b8"]["p50"]
    print(f"batch-8 throughput: {8.0/b8:.2f} images/s ({b8/8*1000:.0f} ms/image)")


if __name__ == "__main__":
    main()
