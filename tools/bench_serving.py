#!/usr/bin/env python
"""Serving throughput under concurrent load: pipelined one-at-a-time
dispatch vs --coalesce-ms micro-batching.

Drives the real ``InferenceService`` (the HTTP handler's service layer —
same base64 audio decode, tokenize, dispatch, PNG encode path; the socket
itself adds nothing measurable) with N concurrent client threads and
reports aggregate img/s per mode. Diagnostics only — bench.py remains the
one-line headline contract.

    python tools/bench_serving.py [--n 8] [--steps 50] [--window-ms 300]
"""

from __future__ import annotations

import argparse
import base64
import io
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_request(cfg) -> dict:
    rng = np.random.default_rng(0)
    wav = (rng.normal(size=(cfg.clap.frontend.num_samples,)) * 0.1).astype(
        np.float32
    )
    from clap2diffusion_tpu.utils.audio_io import write_wav

    buf = io.BytesIO()
    write_wav(buf, wav, cfg.clap.frontend.sample_rate)
    return {
        "audio_b64": base64.b64encode(buf.getvalue()).decode(),
        "text": "thunder rolls over a beach",
        "seed": 0,
    }


def run_mode(service, req: dict, n: int, steps: int, waves: int = 1) -> float:
    """n concurrent clients each issue ``waves`` back-to-back requests;
    return wall seconds until all n*waves responses arrive. waves > 1
    exercises the sustained-load overlap (group k+1's compute vs group
    k's host fetch/encode)."""
    body = dict(req, steps=steps)
    errors = []
    done = threading.Barrier(n + 1)

    def client():
        try:
            for _ in range(waves):
                out = service.generate(dict(body))
                assert "image_b64" in out
        except Exception as e:  # pragma: no cover - diagnostics tool
            errors.append(e)
        done.wait()

    threads = [threading.Thread(target=client) for _ in range(n)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    done.wait()
    wall = time.perf_counter() - t0
    for t in threads:
        t.join()
    if errors:
        raise errors[0]
    return wall


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8, help="concurrent clients")
    ap.add_argument("--waves", type=int, default=1,
                    help="back-to-back requests per client (sustained load)")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--window-ms", type=float, default=300.0)
    ap.add_argument("--max-batch", type=int, default=8)
    args = ap.parse_args()

    import jax.numpy as jnp

    from clap2diffusion_tpu.apps.server import InferenceService
    from clap2diffusion_tpu.core.config import Config
    from clap2diffusion_tpu.diffusion.pipeline import cached_init_params
    from clap2diffusion_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = Config()
    req = build_request(cfg)
    params = cached_init_params(
        cfg, seed=0, dtype=jnp.bfloat16,
        cache_dir=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".cache", "params",
        ),
    )

    results = {}
    for mode, ms in (("pipelined", 0.0), ("coalesced", args.window_ms)):
        service = InferenceService(
            cfg=cfg, params=params,
            coalesce_ms=ms, coalesce_max_batch=args.max_batch,
        )
        # warmup: compile the programs this mode will use (batch 1, and for
        # the coalescer the padded power-of-two group size)
        run_mode(service, req, args.n if ms else 1, args.steps)
        wall = run_mode(service, req, args.n, args.steps, args.waves)
        results[mode] = wall
        total = args.n * args.waves
        print(json.dumps({
            "mode": mode,
            "n": args.n,
            "waves": args.waves,
            "steps": args.steps,
            "wall_s": round(wall, 3),
            "img_s": round(total / wall, 3),
            "coalesce": service.metrics()["coalesce"],
        }))

    if all(m in results for m in ("pipelined", "coalesced")):
        print(json.dumps({
            "speedup": round(results["pipelined"] / results["coalesced"], 3)
        }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
