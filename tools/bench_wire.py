#!/usr/bin/env python
"""A/B the parameter-upload wire formats on the real chip.

The session cold start is bound by the host->TPU tunnel upload of ~1.7 GiB
bf16 params (BENCH_NOTES.md "Session cold start"), and tunnel bandwidth
swings ~10x BETWEEN sessions — so a fair comparison must alternate both
formats INSIDE one process. This tool restores the param cache to host
numpy once, then alternates:

  bf16:  jax.device_put(host_params)                    (the default path)
  int8:  device_put(int8 wire) + jitted on-device dequant (C2D_INT8_WIRE=1)

and reports per-round times + effective wire bandwidth. Each round's
arrays are explicitly deleted so HBM holds one tree at a time.

Usage: python tools/bench_wire.py [--rounds 2]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _sync(jax, jnp):
    # block_until_ready lies on the axon backend (see .claude/skills/verify):
    # force a real sync with a tiny op + host fetch behind the queued work
    np.asarray(jax.jit(lambda: jnp.zeros(()))())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=2)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from clap2diffusion_tpu.core.config import Config
    from clap2diffusion_tpu.diffusion.pipeline import (
        params_cache_path, restore_params_host,
    )
    from clap2diffusion_tpu.utils.wire import dequantize_wire, quantize_wire

    cfg = Config()
    path = params_cache_path(
        cfg, seed=0, dtype=jnp.bfloat16,
        cache_dir=os.path.join(REPO, ".cache", "params"),
    )
    if not (path and os.path.exists(path)):
        log("param cache missing — run bench.py once first"); sys.exit(1)

    t0 = time.time()
    host = restore_params_host(path)
    log(f"restore_host: {time.time() - t0:.1f}s")

    t0 = time.time()
    wire, dtypes, st = quantize_wire(host)
    log(f"quantize_wire (host): {time.time() - t0:.1f}s  "
        f"{st['raw_bytes'] / 2**30:.3f} -> {st['wire_bytes'] / 2**30:.3f} GiB "
        f"({int(st['quantized_leaves'])}/{int(st['quantized_leaves'] + st['raw_leaves'])} leaves)")

    def drop(tree):
        for leaf in jax.tree.leaves(tree):
            if hasattr(leaf, "delete"):
                leaf.delete()

    results = {"bf16": [], "int8": []}
    for r in range(args.rounds):
        t = time.time()
        p = jax.device_put(host)
        _sync(jax, jnp)
        dt = time.time() - t
        results["bf16"].append(dt)
        log(f"round {r} bf16: {dt:6.1f}s  "
            f"{st['raw_bytes'] / 2**20 / dt:6.1f} MB/s wire")
        drop(p)

        t = time.time()
        w = jax.device_put(wire)
        q = dequantize_wire(w, dtypes)
        _sync(jax, jnp)
        dt = time.time() - t
        results["int8"].append(dt)
        log(f"round {r} int8: {dt:6.1f}s  "
            f"{st['wire_bytes'] / 2**20 / dt:6.1f} MB/s wire "
            f"(payload {st['wire_bytes'] / 2**30:.2f} GiB + device dequant)")
        # spot-check the expansion against the host tree on one big leaf
        if r == 0:
            leaves_h = jax.tree.leaves(host)
            leaves_q = jax.tree.leaves(q)
            i = int(np.argmax([np.asarray(l).size for l in leaves_h]))
            a = np.asarray(leaves_h[i], np.float32)
            b = np.asarray(leaves_q[i], np.float32)
            s = np.max(np.abs(a)) / 127.0
            log(f"  spot-check biggest leaf {a.shape}: max|err| "
                f"{np.max(np.abs(a - b)):.3e} (bound ~{s:.3e})")
        drop(q)
        drop(w)

    b, i8 = np.median(results["bf16"]), np.median(results["int8"])
    print(f"bf16 median {b:.1f}s | int8 median {i8:.1f}s | speedup {b / i8:.2f}x")


if __name__ == "__main__":
    main()
