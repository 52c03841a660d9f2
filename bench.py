#!/usr/bin/env python
"""Headline benchmark: p50 end-to-end audio+text -> 512x512 image latency at
50-step DDIM with CFG 7.5 and Norm-60, one TPU chip (BASELINE.md config 3).

Baseline: the reference's published ~2 s/image on an unspecified GPU
(reference README.md:73). ``vs_baseline`` = baseline_seconds / our_p50
(>1.0 means faster than the reference).

Prints ONE JSON line. Extra diagnostics go to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# Persistent compilation cache: the 50-step pipeline program is large; cache
# hits cut repeat-bench compile time from minutes to seconds.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

BASELINE_SECONDS = 2.0


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from clap2diffusion_tpu.core.config import Config
    from clap2diffusion_tpu.diffusion.pipeline import (
        AudioToImagePipeline,
        cached_init_params,
    )

    cfg = Config()
    log(f"devices: {jax.devices()}")

    t0 = time.time()
    params = cached_init_params(
        cfg, seed=0, dtype=jnp.bfloat16,
        cache_dir=os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".cache", "params"),
    )
    pipe = AudioToImagePipeline(cfg, params=params)
    log(f"init_params: {time.time() - t0:.1f}s")

    rng = np.random.default_rng(0)
    # PCM16 input — what a real WAV corpus contains and what load_audio
    # returns for mono 48 kHz 16-bit sources; uploads half the bytes of
    # float32 and is dequantized + peak-normalized on device.
    wav = (rng.normal(size=cfg.clap.frontend.num_samples) * 0.1 * 32767.0).clip(
        -32768, 32767
    ).astype(np.int16)
    text_ids = rng.integers(0, 49_000, size=(1, 77)).astype(np.int32)

    # Warmup / compile
    t0 = time.time()
    img = pipe.generate(waveform=wav, text_ids=text_ids, seed=0)
    log(f"compile+first run: {time.time() - t0:.1f}s, image {img.shape}")

    times = []
    for i in range(5):
        t0 = time.time()
        img = pipe.generate(waveform=wav, text_ids=text_ids, seed=i)
        times.append(time.time() - t0)
    p50 = float(np.median(times))
    log(f"times: {[f'{t:.3f}' for t in times]}")

    print(
        json.dumps(
            {
                "metric": "p50 audio+text->512px image latency, 50-step DDIM+CFG, 1 chip",
                "value": round(p50, 4),
                "unit": "s/image",
                "vs_baseline": round(BASELINE_SECONDS / p50, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
