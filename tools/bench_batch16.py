#!/usr/bin/env python
"""Single-chip throughput at user-batch 8 vs 16 (full 50-step pipeline).

BENCH_NOTES' batch-8 number (1.12 img/s) runs the chip at ~80% of the
self-derived ~1.4 img/s roofline; the open question is whether doubling
the device batch buys more MXU occupancy or the step is already
saturated. One number answers it: img/s at batch 16 vs batch 8.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".cache", "jax", "tpu")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from clap2diffusion_tpu.core.config import Config
    from clap2diffusion_tpu.diffusion.pipeline import (
        AudioToImagePipeline,
        cached_init_params,
    )

    cfg = Config()
    t0 = time.time()
    params = cached_init_params(cfg, seed=0, dtype=jnp.bfloat16)
    pipe = AudioToImagePipeline(cfg, params=params)
    print(f"params ready: {time.time() - t0:.1f}s", flush=True)

    rng = np.random.default_rng(0)
    wav = (rng.normal(size=(1, cfg.clap.frontend.num_samples)) * 0.1).astype(
        np.float32
    )
    ids = rng.integers(0, 49_000, size=(1, 77)).astype(np.int32)

    for b in (8, 16):
        idsb = np.repeat(ids, b, axis=0)
        t0 = time.time()
        pipe.generate(waveform=wav[0], text_ids=idsb, num_steps=50, seed=0,
                      batch=b)
        print(f"b{b} warmup(compile): {time.time() - t0:.1f}s", flush=True)
        ts = []
        for i in range(3):
            t0 = time.time()
            img = pipe.generate(waveform=wav[0], text_ids=idsb, num_steps=50,
                                seed=i, batch=b)
            assert img.shape[0] == b
            ts.append(time.time() - t0)
        p50 = float(np.median(ts))
        print(f"batch {b}: {p50:.2f} s/batch -> {b / p50:.3f} img/s "
              f"(runs: {[f'{t:.2f}' for t in ts]})", flush=True)


if __name__ == "__main__":
    main()
