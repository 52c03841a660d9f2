#!/usr/bin/env python
"""Stage-2/3 training throughput on the real TPU (VERDICT round-1 item 5):
UNet-in-the-loop fwd+bwd steps/s at the reference's stage batch sizes
(stage2 bs=4, stage3 bs=2 — reference configs/training_config.yaml:23-40),
with the flash backward kernel and rematerialization toggled.

Latents are the precomputed-VAE kind the real trainer consumes; CLAP/text
embeddings are frozen-tower outputs (precompute_embeddings path), so the
step is exactly the hot loop of train/stages.py.

Usage: python tools/bench_train23.py [--quick]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


def bench_stage(stage: int, flash: bool, remat: bool, quick: bool,
                dtype: str = "float32") -> None:
    from clap2diffusion_tpu.core.config import Config, apply_overrides
    from clap2diffusion_tpu.train.stages import (
        TrainState,
        make_stage2_step,
        make_stage3_step,
    )

    cfg = apply_overrides(
        Config(),
        [
            f"diffusion.unet.flash_attention={flash}",
            f"diffusion.unet.remat={remat}",
            f"train.compute_dtype={dtype}",
            # measure the raw step (MultiSteps accumulation just averages)
            f"train.stage{stage}.grad_accum=1",
        ],
    )
    scfg = getattr(cfg.train, f"stage{stage}")
    bs = scfg.batch_size
    lat = cfg.diffusion.image_size // 8

    make = make_stage2_step if stage == 2 else make_stage3_step
    step_fn, init_tx, modules = make(cfg)

    keys = jax.random.split(jax.random.key(0), 4)
    params = {}
    hier = modules[0]
    unet = modules[-1]
    params["hierarchical"] = jax.jit(
        lambda k: hier.init(k, jnp.ones((1, cfg.condition.clap_dim)), 1.0)
    )(keys[0])["params"]
    if stage == 3:
        adapter = modules[1]
        params["adapter"] = jax.jit(
            lambda k: adapter.init(k, jnp.ones((1, cfg.condition.clap_dim)))
        )(keys[1])["params"]
    params["unet"] = jax.jit(
        lambda k: unet.init(
            k,
            jnp.ones((1, lat, lat, 4)),
            jnp.ones((1,), jnp.int32),
            jnp.ones((1, 77, cfg.diffusion.unet.cross_attention_dim)),
            {lvl: jnp.ones((1, cfg.condition.num_tokens,
                            cfg.diffusion.unet.cross_attention_dim))
             for lvl in ("early", "mid", "late")},
        )
    )(keys[2])["params"]

    tx = init_tx(params)
    state = TrainState.create(params, tx)

    rng = np.random.default_rng(0)
    batch = {
        "clap": rng.normal(size=(bs, 512)).astype(np.float32),
        "latent": rng.normal(size=(bs, lat, lat, 4)).astype(np.float32),
        "text_ctx": rng.normal(size=(bs, 77, 768)).astype(np.float32) * 0.02,
        "text_emb": rng.normal(size=(bs, 768)).astype(np.float32),
    }
    batch = jax.tree.map(jnp.asarray, batch)

    K = 2 if quick else 8
    stacked = jax.tree.map(lambda x: jnp.broadcast_to(x, (K,) + x.shape), batch)
    rkeys = jax.random.split(jax.random.key(1), K)

    @jax.jit
    def run_chunk(state, stacked, rkeys):
        def body(s, xs):
            b, r = xs
            s, m = step_fn(s, b, r, tx)
            return s, m["total"]

        return jax.lax.scan(body, state, (stacked, rkeys))

    t0 = time.perf_counter()
    state, losses = run_chunk(state, stacked, rkeys)
    np.asarray(losses)
    compile_s = time.perf_counter() - t0

    chunks = 2 if quick else 3
    t0 = time.perf_counter()
    for _ in range(chunks):
        state, losses = run_chunk(state, stacked, rkeys)
        np.asarray(losses)
    dt = time.perf_counter() - t0
    iters = chunks * K
    print(
        f"stage{stage} bs={bs} flash={int(flash)} remat={int(remat)} "
        f"{dtype}: "
        f"{iters/dt:.2f} steps/s ({dt/iters*1000:.0f} ms/step, "
        f"{iters*bs/dt:.1f} samples/s) loss={float(losses[-1]):.4f} "
        f"[compile {compile_s:.0f}s]",
        flush=True,
    )


def main():
    quick = "--quick" in sys.argv
    if "--bf16" in sys.argv:
        # the default mixed-precision policy (train.compute_dtype=bfloat16)
        bench_stage(2, flash=True, remat=False, quick=quick, dtype="bfloat16")
        bench_stage(2, flash=True, remat=True, quick=quick, dtype="bfloat16")
        bench_stage(3, flash=True, remat=False, quick=quick, dtype="bfloat16")
        return
    # stage2 is the real cost (UNet fwd+bwd); A/B flash bwd and remat there
    bench_stage(2, flash=True, remat=False, quick=quick)
    bench_stage(2, flash=False, remat=False, quick=quick)
    bench_stage(2, flash=True, remat=True, quick=quick)
    bench_stage(3, flash=True, remat=False, quick=quick)


if __name__ == "__main__":
    main()
