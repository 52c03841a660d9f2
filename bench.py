#!/usr/bin/env python
"""Headline benchmark: p50 end-to-end audio+text -> 512x512 image latency at
50-step DDIM with CFG 7.5 and Norm-60, one TPU chip (BASELINE.md config 3).

Baseline: the reference's published ~2 s/image on an unspecified GPU
(reference README.md:73). ``vs_baseline`` = baseline_seconds / our_p50
(>1.0 means faster than the reference).

Prints ONE JSON line. Extra diagnostics go to stderr — including a
decomposition of the session cold start (VERDICT r3 weak #2):

  restore_host_s   orbax checkpoint -> host numpy (local disk, no tunnel)
  upload_s         host -> TPU over the tunnel (~1.7 GiB bf16; bandwidth-
                   bound, runs in a background thread)
  aot_compile_s    XLA compile of the 50-step program from abstract avals,
                   overlapped with the upload (neither needs the other);
                   writes the persistent compile cache
  warmup_s         first pipe.generate: trace + compile-cache hit
                   (deserialize) + first execution

The persistent compile cache lives in the REPO (.cache/jax/tpu), not /tmp:
/tmp is wiped between driver sessions, the repo directory survives — so a
later session deserializes this one's executables instead of recompiling.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
BASELINE_SECONDS = 2.0


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _setup_compile_cache(jax):
    cache = os.path.join(REPO, ".cache", "jax", "tpu")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    return cache


def _aot_precompile(pipe, wav, text_ids, num_steps: int = 50):
    """Compile the exact 50-step serving program from abstract avals only —
    no parameter values needed, so it runs while the upload thread owns the
    tunnel's bandwidth. The executable lands in the persistent compile
    cache; the warmup call's trace then deserializes instead of compiling.
    """
    import jax

    f32 = jax.ShapeDtypeStruct((), np.dtype(np.float32))
    params_sds = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype), pipe.params
    )
    # .lower reached through the bound method resolves on the underlying
    # jit wrapper (method attribute access forwards to __func__), so self
    # is passed explicitly as the static arg 0
    lowered = type(pipe)._generate_jit.lower(
        pipe,
        params_sds,
        jax.ShapeDtypeStruct((1, wav.shape[0]), np.dtype(np.int16)),
        jax.ShapeDtypeStruct(text_ids.shape, np.dtype(np.int32)),
        jax.ShapeDtypeStruct(text_ids.shape, np.dtype(np.int32)),
        num_steps,             # (static)
        f32,                   # guidance_scale
        "hierarchical",        # model_type (static)
        jax.ShapeDtypeStruct((), np.dtype(np.int32)),  # seed
        1,                     # batch (static)
        f32,                   # norm_target
        f32,                   # temperature
        "ddim",                # sampler (static)
        0,                     # init_steps (static)
        None,                  # init_image
        None,                  # waveform2
        None,                  # audio_mix
        None,                  # mask
        None,                  # seeds
        f32,                   # guidance_rescale
    )
    lowered.compile()


def main():
    import jax

    cache_dir = _setup_compile_cache(jax)
    import jax.numpy as jnp

    from clap2diffusion_tpu.core.config import Config
    from clap2diffusion_tpu.diffusion.pipeline import (
        AudioToImagePipeline,
        cached_init_params,
        params_cache_path,
        restore_params_host,
    )

    cfg = Config()
    log(f"devices: {jax.devices()}")
    log(f"compile cache: {cache_dir} "
        f"({len(os.listdir(cache_dir))} entries)")

    rng = np.random.default_rng(0)
    # PCM16 input — what a real WAV corpus contains and what load_audio
    # returns for mono 48 kHz 16-bit sources; uploads half the bytes of
    # float32 and is dequantized + peak-normalized on device.
    wav = (rng.normal(size=cfg.clap.frontend.num_samples) * 0.1 * 32767.0).clip(
        -32768, 32767
    ).astype(np.int16)
    text_ids = rng.integers(0, 49_000, size=(1, 77)).astype(np.int32)

    t_session = time.time()
    path = params_cache_path(
        cfg, seed=0, dtype=jnp.bfloat16,
        cache_dir=os.path.join(REPO, ".cache", "params"),
    )
    if path and os.path.exists(path):
        # warm param cache: disk -> host, then overlap the tunnel upload
        # (background thread) with the AOT compile (main thread)
        t0 = time.time()
        host_params = restore_params_host(path)
        t_restore = time.time() - t0
        log(f"restore_host: {t_restore:.1f}s "
            f"(leaf type {type(jax.tree.leaves(host_params)[0]).__name__})")
        pipe = AudioToImagePipeline(cfg, params=host_params)

        result = {}
        # C2D_INT8_WIRE=1: halve the tunnel bytes (the TTFI binding
        # constraint) — int8+scales on the wire, expanded to bf16 on
        # device; numerics drift bounded + tested (utils/wire.py)
        int8_wire = os.environ.get("C2D_INT8_WIRE") == "1"
        if int8_wire:
            from clap2diffusion_tpu.utils.wire import (
                dequantize_wire, quantize_wire,
            )

            t0 = time.time()
            wire_tree, wire_dtypes, wstats = quantize_wire(host_params)
            log(f"quantize_wire (host): {time.time() - t0:.1f}s, "
                f"{wstats['raw_bytes'] / 2**30:.2f} -> "
                f"{wstats['wire_bytes'] / 2**30:.2f} GiB "
                f"({int(wstats['quantized_leaves'])} leaves quantized)")

        def upload():
            try:
                t = time.time()
                if int8_wire:
                    p = dequantize_wire(jax.device_put(wire_tree), wire_dtypes)
                else:
                    p = jax.device_put(host_params)
                jax.block_until_ready(p)
                # block_until_ready lies on the axon backend (see
                # .claude/skills/verify); a tiny op + host fetch rides the
                # same stream behind the queued transfers and forces a real
                # sync
                np.asarray(jax.jit(lambda: jnp.zeros(()))())
                result["params"] = p
                result["upload_s"] = time.time() - t
            except Exception as e:  # surfaced on the main thread post-join
                result["error"] = e

        th = threading.Thread(target=upload)
        th.start()
        t0 = time.time()
        try:
            _aot_precompile(pipe, wav, text_ids)
            log(f"aot_compile: {time.time() - t0:.1f}s (overlapped with upload)")
        except Exception as e:  # non-fatal: warmup compiles the slow way
            log(f"aot_compile FAILED after {time.time() - t0:.1f}s "
                f"(non-fatal): {type(e).__name__}: {e}")
        th.join()
        if "error" in result:
            raise RuntimeError("param upload thread failed") from result["error"]
        pipe.params = result["params"]
        pipe.compute_dtype = jax.tree.leaves(pipe.params["unet"])[0].dtype
        log(f"upload: {result['upload_s']:.1f}s")
    else:
        # cold param cache (first session on this machine): jit-init all
        # towers on device and persist them for every later session
        t0 = time.time()
        params = cached_init_params(
            cfg, seed=0, dtype=jnp.bfloat16,
            cache_dir=os.path.join(REPO, ".cache", "params"),
        )
        pipe = AudioToImagePipeline(cfg, params=params)
        log(f"init_params (cache miss — init on device + save): "
            f"{time.time() - t0:.1f}s")

    # Warmup / first image: trace + compile-cache deserialize + execute
    t0 = time.time()
    img = pipe.generate(waveform=wav, text_ids=text_ids, seed=0)
    log(f"warmup (first image): {time.time() - t0:.1f}s, image {img.shape}")
    log(f"time-to-first-image (session start -> image): "
        f"{time.time() - t_session:.1f}s")

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
