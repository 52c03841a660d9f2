#!/usr/bin/env python
"""Where do CLAP-encode's 138 ms and VAE-decode's 193 ms go?

Chained (lax.scan) timing with T(2K)-T(K) differencing, same methodology as
bench_unet_ops.py — single-call numbers on the axon tunnel include one
host round-trip of dispatch latency, which swamps sub-50ms kernels.

Pieces:
  - log-mel frontend alone (frame -> window -> rFFT -> mel -> dB)
  - HTSAT tower alone on a precomputed mel
  - VAE decode at 512px, plus its per-resolution conv stacks
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


def chained(label, step, carry0, k=8, iters=3):
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
    # tunnel wall-time medians jitter by tens of ms; when the scan-2k vs
    # scan-k difference is not clearly above that, the quotient is noise —
    # say so instead of printing a garbage (possibly negative) number
    noise = per <= 0 or (t2 - t1) < 0.25 * t1
    tag = "  [WITHIN TUNNEL NOISE - unreliable]" if noise else ""
    print(f"{label}: {per*1e3:.3f} ms{tag}", flush=True)
    return per


def main():
    from clap2diffusion_tpu.core.config import Config
    from clap2diffusion_tpu.diffusion.pipeline import cached_init_params
    from clap2diffusion_tpu.models.clap.frontend import log_mel_spectrogram
    from clap2diffusion_tpu.models.clap.htsat import ClapAudioTower
    from clap2diffusion_tpu.models.vae import AutoencoderKL

    cfg = Config()
    params = cached_init_params(cfg, seed=0, dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    wav = jnp.asarray(
        (rng.normal(size=(1, cfg.clap.frontend.num_samples)) * 0.1), jnp.float32
    )

    # 1. log-mel alone (carry the waveform; fold a data dependency back in)
    def mel_step(c):
        mel = log_mel_spectrogram(c, cfg.clap.frontend)
        return c + (jnp.mean(mel) * 1e-6).astype(c.dtype)

    chained("log_mel frontend", mel_step, wav)

    # 2. HTSAT tower alone on a precomputed mel
    tower = ClapAudioTower(cfg=cfg.clap.audio)
    mel0 = log_mel_spectrogram(wav, cfg.clap.frontend)
    cp = params["clap_audio"]

    def htsat_step(c):
        emb = tower.apply({"params": cp}, c)
        return c + (jnp.mean(emb) * 1e-6).astype(c.dtype)

    chained("htsat tower", htsat_step, mel0)

    # 3. VAE decode at 512px
    vae = AutoencoderKL(cfg=cfg.diffusion.vae)
    vp = params["vae"]
    z = jnp.asarray(rng.normal(size=(1, 64, 64, 4)), jnp.bfloat16)

    def vae_step(c):
        img = vae.apply({"params": vp}, c, method=AutoencoderKL.decode_latent)
        return c + (jnp.mean(img) * 1e-6).astype(c.dtype)

    chained("vae decode 512", vae_step, z, k=4)

    # 4. VAE decoder per-resolution pieces: 3 resnet blocks + upsample conv,
    #    channels as in the real decoder at each stage.
    from flax import linen as nn

    from clap2diffusion_tpu.core.config import VAEConfig
    from clap2diffusion_tpu.models.vae import VAEResnetBlock

    for size, ch in ((64, 512), (128, 512), (256, 512), (256, 256), (512, 128)):
        class Stack(nn.Module):
            @nn.compact
            def __call__(self, x):
                for j in range(3):
                    x = VAEResnetBlock(out_channels=ch, groups=32,
                                       name=f"r{j}")(x)
                return x

        m = Stack()
        x0 = jnp.asarray(rng.normal(size=(1, size, size, ch)), jnp.bfloat16)
        p = jax.jit(m.init)(jax.random.key(0), x0)["params"]
        p = jax.tree.map(lambda a: a.astype(jnp.bfloat16), p)

        def stack_step(c, m=m, p=p):
            return m.apply({"params": p}, c).astype(c.dtype)

        fl = 3 * 2 * 2 * size * size * ch * ch * 9
        per = chained(f"vae 3-resnet {size}x{size}x{ch}", stack_step, x0, k=8)
        if per > 0:
            print(f"   -> {fl/per/1e12:.1f} TFLOP/s "
                  f"({100*fl/per/1e12/197:.0f}% MFU)", flush=True)
        # NOTE: isolated-stack quotients disagree with the full-decode
        # number (which a DCE-proof probe pins at ~19 ms / ~63% MFU for the
        # whole 512px decode); trust the full-decode row, use these only
        # for relative comparisons within one session.


if __name__ == "__main__":
    main()
