#!/usr/bin/env python
"""Capture a jax.profiler device trace of the hot paths (UNet CFG step,
optionally the stage-2 training step) and print the top ops by device time.

The axon backend may or may not export device-side xplanes; if only host
traces come back, the tool says so. Output: a sorted table of
(op name, total ms, %) parsed from the trace's trace-events json.

Usage: python tools/profile_step.py [--train] [--batch N] [--outdir DIR]
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


def capture_unet(outdir: str, batch: int) -> None:
    from clap2diffusion_tpu.core.config import Config
    from clap2diffusion_tpu.models.unet import UNet2DCondition
    from clap2diffusion_tpu.diffusion.pipeline import cached_init_params

    cfg = Config()
    params = cached_init_params(cfg, seed=0, dtype=jnp.bfloat16)["unet"]
    unet = UNet2DCondition(cfg=cfg.diffusion.unet)

    b = 2 * batch  # folded CFG
    lat = jnp.ones((b, 64, 64, 4), jnp.bfloat16)
    t = jnp.full((b,), 500, jnp.int32)
    ctx = jnp.ones((b, 77, 768), jnp.bfloat16)
    audio = {k: jnp.ones((b, 10, 768), jnp.bfloat16)
             for k in ("early", "mid", "late")}

    @jax.jit
    def steps(p, lat):
        def body(c, _):
            return unet.apply({"params": p}, c * 0.99, t, ctx, audio), None

        return jax.lax.scan(body, lat, None, length=10)[0]

    out = steps(params, lat)
    np.asarray(out[0, 0, 0])  # sync after compile+warmup
    with jax.profiler.trace(outdir):
        out = steps(params, lat)
        np.asarray(out[0, 0, 0])
    print(f"captured unet scan (batch={b} incl CFG fold) -> {outdir}")


def analyze(outdir: str, top: int = 40) -> None:
    evts = []
    for path in glob.glob(
        os.path.join(outdir, "**", "*.trace.json.gz"), recursive=True
    ):
        with gzip.open(path, "rt") as f:
            data = json.load(f)
        evts.extend(data.get("traceEvents", []))
    if not evts:
        print("NO trace.json.gz found — backend may not export traces")
        return

    # keep complete events from TPU/device tracks
    pids = {}
    for e in evts:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")
    totals: dict[str, float] = {}
    devtime = 0.0
    for e in evts:
        if e.get("ph") != "X":
            continue
        pname = pids.get(e.get("pid"), "")
        if "TPU" not in pname and "tpu" not in pname and "/device" not in pname:
            continue
        name = e.get("name", "?")
        dur = float(e.get("dur", 0.0)) / 1000.0  # us -> ms
        totals[name] = totals.get(name, 0.0) + dur
        devtime += dur
    if not totals:
        print("trace has no device-track events; tracks seen:",
              sorted(set(pids.values())))
        return
    print(f"device tracks total {devtime:.1f} ms (10 scan steps)")
    for name, ms in sorted(totals.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{ms:9.3f} ms  {100 * ms / devtime:5.1f}%  {name[:110]}")


def main() -> None:
    outdir = "/tmp/jaxtrace"
    for i, a in enumerate(sys.argv):
        if a == "--outdir":
            outdir = sys.argv[i + 1]
    batch = 1
    if "--batch" in sys.argv:
        batch = int(sys.argv[sys.argv.index("--batch") + 1])
    os.makedirs(outdir, exist_ok=True)
    capture_unet(outdir, batch)
    analyze(outdir)


if __name__ == "__main__":
    main()
