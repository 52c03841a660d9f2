#!/usr/bin/env python
"""Training throughput benchmark (BASELINE.md config 5): stage-1 adapter
training over (CLAP, text) embedding batches, data-parallel over all local
devices. Reports steps/s and samples/s.

On the single-chip axon TPU this exercises the mesh path with data=1;
multi-chip scaling is validated structurally by __graft_entry__.dryrun_multichip.
"""

from __future__ import annotations

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from clap2diffusion_tpu.core.config import Config, apply_overrides
    from clap2diffusion_tpu.models.condition import AudioAdapter
    from clap2diffusion_tpu.parallel.sharding import make_train_mesh, replicate, shard_batch
    from clap2diffusion_tpu.train.stages import TrainState, make_stage1_step

    cfg = apply_overrides(Config(), ["train.stage1.grad_accum=1"])
    scfg = cfg.train.stage1
    bs = scfg.batch_size  # 8, the reference stage-1 batch

    step_fn, init_tx, adapter = make_stage1_step(cfg)
    params = jax.jit(
        lambda k: adapter.init(k, jnp.ones((1, cfg.condition.clap_dim)))
    )(jax.random.key(0))["params"]
    tx = init_tx(params)
    state = TrainState.create(params, tx)

    n_dev = len(jax.devices())
    dp = max(d for d in range(1, n_dev + 1) if bs % d == 0)
    mesh = make_train_mesh(dp)
    state = replicate(state, mesh)
    batch = shard_batch(
        {
            "clap": np.random.default_rng(0).normal(size=(bs, 512)).astype(np.float32),
            "text_emb": np.random.default_rng(1).normal(size=(bs, 768)).astype(np.float32),
        },
        mesh,
    )
    # scan K steps per dispatch (steps_per_call pattern): robust to the
    # per-call RPC latency of remote-tunneled TPUs.
    K = 50
    stacked = jax.tree.map(lambda x: jnp.broadcast_to(x, (K,) + x.shape), batch)

    @jax.jit
    def run_chunk(state, stacked, keys):
        def body(s, xs):
            b, r = xs
            s, m = step_fn(s, b, r, tx)
            return s, m["total"]
        return jax.lax.scan(body, state, (stacked, keys))

    keys = jax.random.split(jax.random.key(0), K)
    state, losses = run_chunk(state, stacked, keys)
    np.asarray(losses)  # host transfer = the only reliable sync on axon
    t0 = time.perf_counter()
    chunks = 4
    for i in range(chunks):
        state, losses = run_chunk(state, stacked, keys)
        np.asarray(losses)
    dt = time.perf_counter() - t0
    iters = chunks * K
    print(
        f"stage1 training (scan-of-{K}): {iters/dt:.1f} steps/s, "
        f"{iters*bs/dt:.0f} samples/s (bs={bs}, dp={dp}, "
        f"loss={float(losses[-1]):.4f})"
    )


if __name__ == "__main__":
    main()
