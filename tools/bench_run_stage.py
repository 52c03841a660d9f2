#!/usr/bin/env python
"""Training throughput measured THROUGH the real trainer (VERDICT r2 #3).

tools/bench_train23.py measures the raw jitted step (scan-of-K, synthetic
device-resident batches). This tool runs ``run_stage`` itself — prefetch
loader, chunked embedding frontend (one fused dispatch per chunk), EMA on,
checkpoint/log plumbing — on a full-geometry fixture dataset, and reports
the marginal steps/s between JSONL log entries after the compile chunk.
Done-criterion: within ~10% of the tool-path numbers (BENCH_NOTES.md).

Usage: python tools/bench_run_stage.py [--stage 2|3|1] [--steps N]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

# round-2 tool-path numbers (bench_train23, bf16+flash) for comparison
TOOL_PATH_STEPS_S = {1: 747.0, 2: 9.39, 3: 16.06}


def bench(stage: int, steps: int) -> None:
    from clap2diffusion_tpu.core.config import Config, apply_overrides
    from clap2diffusion_tpu.data.fixtures import make_fixture_dataset
    from clap2diffusion_tpu.diffusion.pipeline import init_params
    from clap2diffusion_tpu.train.trainer import run_stage

    spc = getattr(Config().train, f"stage{stage}").steps_per_call
    cfg = apply_overrides(Config(), [
        # raw micro-step rate (MultiSteps accumulation just averages).
        # log_every = 2 chunks: non-logging chunks skip the host sync, so
        # host-side chunk assembly overlaps async device dispatch.
        f"train.stage{stage}.grad_accum=1",
        f"train.stage{stage}.log_every={2 * spc}",
        f"train.stage{stage}.save_every=1000000",
    ])
    scfg = getattr(cfg.train, f"stage{stage}")
    n_fixture = max(scfg.batch_size * scfg.steps_per_call, 64)

    with tempfile.TemporaryDirectory() as tmp:
        root = os.path.join(tmp, "ds")
        t0 = time.perf_counter()
        make_fixture_dataset(root, n_train=n_fixture, n_val=1, n_test=1,
                             duration_s=cfg.data.duration_s,
                             latent_hw=cfg.diffusion.image_size // 8)
        print(f"fixture: {n_fixture} samples in "
              f"{time.perf_counter() - t0:.0f}s", flush=True)
        t0 = time.perf_counter()
        params = init_params(cfg, seed=0)
        print(f"init_params: {time.perf_counter() - t0:.0f}s", flush=True)

        if "--no-cache" not in sys.argv:
            # production shape: frozen-tower embeddings precomputed once
            # (tools/precompute_embeddings.py). Without the cache, every
            # 25-step chunk re-uploads ~190 MB of raw wav through the TPU
            # tunnel, which dominates the step (measured 40% of tool path).
            from tools.precompute_embeddings import precompute

            t0 = time.perf_counter()
            n = precompute(cfg, params, root, splits=("train",))
            print(f"precompute: {n} embeddings in "
                  f"{time.perf_counter() - t0:.0f}s", flush=True)

        log_dir = os.path.join(tmp, "logs")
        t0 = time.perf_counter()
        state = run_stage(cfg, stage, params, data_root=root,
                          max_steps=steps, log_dir=log_dir)
        wall = time.perf_counter() - t0
        assert int(state.step) == steps

        rows = [json.loads(l) for l in
                open(os.path.join(log_dir, f"stage{stage}.jsonl"))]
        rows = [r for r in rows if "steps_per_s" in r]
        if len(rows) >= 3:
            # marginal rate after the compile chunk
            a, b = rows[1], rows[-1]
            marginal = (b["step"] - a["step"]) / (b["time"] - a["time"])
        else:
            marginal = steps / wall
            print(
                f"WARNING: only {len(rows)} log rows — rate below INCLUDES "
                "compile (run with --steps >= 3*log_every for a clean "
                "marginal number)",
                flush=True,
            )
        tool = TOOL_PATH_STEPS_S.get(stage)
        ratio = f" = {marginal / tool:.0%} of tool-path {tool}" if tool else ""
        print(
            f"run_stage stage{stage} bs={scfg.batch_size} "
            f"spc={scfg.steps_per_call} ema={int(scfg.use_ema)}: "
            f"{marginal:.2f} steps/s marginal "
            f"({1000/marginal:.0f} ms/step, "
            f"{marginal * scfg.batch_size:.1f} samples/s){ratio}; "
            f"wall incl. compile {wall:.0f}s for {steps} steps",
            flush=True,
        )


def main():
    stage = int(sys.argv[sys.argv.index("--stage") + 1]) if "--stage" in sys.argv else 2
    # default 150 = 3 x log_every(50): rows at 50/100/150, so the marginal
    # window never includes the compile chunk
    steps = int(sys.argv[sys.argv.index("--steps") + 1]) if "--steps" in sys.argv else 150
    bench(stage, steps)


if __name__ == "__main__":
    main()
