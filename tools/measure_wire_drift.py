#!/usr/bin/env python
"""Image drift of the int8 wire format at REAL weights scale (VERDICT r4 #3).

tests/test_wire.py bounds the drift on the tiny pipeline; this measures it
on the production 512px model: one 50-step DDIM image generated from the
bf16 params vs the same generation from the int8-wire dequantized params
(identical program — weights are jit args, so both runs hit one compiled
executable). Reports uint8 mean/max diff and the >2-count pixel fraction —
the same criteria the frozen golden test uses (tests/test_image_golden.py).

Usage: python tools/measure_wire_drift.py [--seeds 0 1]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, nargs="+", default=[0])
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".cache", "jax", "tpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp

    from clap2diffusion_tpu.core.config import Config
    from clap2diffusion_tpu.diffusion.pipeline import (
        AudioToImagePipeline,
        params_cache_path,
        restore_params_host,
    )
    from clap2diffusion_tpu.utils.wire import dequantize_wire, quantize_wire

    cfg = Config()
    path = params_cache_path(
        cfg, seed=0, dtype=jnp.bfloat16,
        cache_dir=os.path.join(REPO, ".cache", "params"),
    )
    assert path and os.path.exists(path), "run bench.py once to build the cache"
    host = restore_params_host(path)

    rng = np.random.default_rng(0)
    wav = (rng.normal(size=cfg.clap.frontend.num_samples) * 0.1 * 32767.0
           ).clip(-32768, 32767).astype(np.int16)
    text_ids = rng.integers(0, 49_000, size=(1, 77)).astype(np.int32)

    pipe = AudioToImagePipeline(cfg, params=jax.device_put(host))
    imgs_fp = {}
    for s in args.seeds:
        t0 = time.time()
        imgs_fp[s] = pipe.generate(waveform=wav, text_ids=text_ids, seed=s)
        print(f"fp seed {s}: {time.time() - t0:.1f}s", flush=True)

    wire, dtypes, stats = quantize_wire(host)
    del host
    pipe.params = dequantize_wire(jax.device_put(wire), dtypes)
    del wire
    print(f"int8 wire: {stats['raw_bytes'] / 2**30:.2f} -> "
          f"{stats['wire_bytes'] / 2**30:.2f} GiB, "
          f"{int(stats['quantized_leaves'])} leaves", flush=True)

    for s in args.seeds:
        t0 = time.time()
        img_q = pipe.generate(waveform=wav, text_ids=text_ids, seed=s)
        d = np.abs(img_q.astype(np.int32) - imgs_fp[s].astype(np.int32))
        print(f"int8 seed {s}: {time.time() - t0:.1f}s  "
              f"drift mean|d|={d.mean():.3f} max={d.max()} "
              f">2-count={float((d > 2).mean()):.2%}", flush=True)


if __name__ == "__main__":
    main()
