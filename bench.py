#!/usr/bin/env python
"""Headline benchmark: p50 end-to-end audio+text -> 512x512 image latency at
50-step DDIM with CFG 7.5 and Norm-60, one TPU chip (BASELINE.md config 3).

Baseline: the reference's published ~2 s/image on an unspecified GPU
(reference README.md:73). ``vs_baseline`` = baseline_seconds / our_p50
(>1.0 means faster than the reference).

Prints ONE JSON line on stdout. stderr carries the human-readable
decomposition AND one machine-readable diagnostics JSON line
(``{"diag": "bench", ...}``) so driver artifacts are self-attributing
round-over-round (VERDICT r4 weak #1): every wall number is paired with
the measurement that explains it —

  restore_*        disk -> host decomposition: raw byte read (page-cache /
                   disk state) vs orbax/npz decode on a warm cache
  tunnel_*_mbps    measured tunnel bandwidth AT BENCH TIME (timed fixed-
                   size incompressible transfers, each direction)
  upload_s         host -> TPU over the tunnel (bandwidth-bound, runs in
                   a background thread; int8 wire halves the bytes)
  aot_compile_s    XLA compile of the 50-step program from abstract avals,
                   overlapped with the upload (neither needs the other);
                   writes the persistent compile cache
  warmup_s         first pipe.generate: trace + compile-cache hit + run
  device_p50_s     chained on-device latency (inputs resident, seeds
                   data-dependent on the previous image, one 4-byte final
                   fetch) — the tunnel-independent number
  wall vs device   gap attributed to the per-call transfer bytes at the
                   measured bandwidth

Int8 wire format (C2D_INT8_WIRE, default ON here, opt-in elsewhere):
params ride the tunnel as int8 + per-channel scales (~half the bytes of
bf16 — the TTFI binding constraint) and expand to bf16 on device; drift
is bounded and tested (utils/wire.py, tests/test_wire.py). The quantized
payload is persisted next to the param cache, so later sessions skip BOTH
the fp restore (2x the disk bytes) and the host quantize pass, and the
dequant program AOT-compiles from abstract avals before the timed upload.

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


def _raw_read_dir(path: str) -> tuple:
    """Sequentially read every byte under ``path`` (file or directory).
    Returns (bytes, seconds). Run BEFORE the orbax/npz decode so (a) the
    read measures the actual disk/page-cache state this session and (b)
    the decode that follows runs from a warm cache — splitting the
    'restore' wall time into IO vs deserialization (VERDICT r4 weak #4:
    22.2 s vs 8.8 s across sessions was unattributable)."""
    total, t0 = 0, time.time()
    if os.path.isfile(path):
        files = [path]
    else:
        files = [
            os.path.join(r, f)
            for r, _, fs in os.walk(path)
            for f in sorted(fs)
        ]
    for fp in files:
        with open(fp, "rb") as fh:
            while True:
                b = fh.read(1 << 24)
                if not b:
                    break
                total += len(b)
    return total, time.time() - t0


def _tunnel_probe(jax, mb: int = 24) -> tuple:
    """Measured tunnel bandwidth at bench time: one ``mb``-MiB
    incompressible uint8 array timed host->device and device->host.
    Runs twice (first pass pays the tiny sync-op compile); reports the
    second. Returns (up_MBps, down_MBps)."""
    import jax.numpy as jnp  # noqa: F401

    rng = np.random.default_rng(1)
    x = rng.integers(0, 256, size=mb << 20, dtype=np.uint8)
    sync = jax.jit(lambda a: a[:4])
    up = down = 0.0
    for _ in range(2):
        t0 = time.time()
        d = jax.device_put(x)
        np.asarray(sync(d))  # 4-byte fetch behind the queued upload
        up = mb / (time.time() - t0)
        t0 = time.time()
        y = np.asarray(d)
        down = mb / (time.time() - t0)
        del d, y
    return up, down


def _aot_precompile(pipe, wav, text_ids, num_steps: int = 50):
    """Compile the exact 50-step serving program from abstract avals only —
    no parameter values needed (``pipe.params`` may itself be an aval
    tree), so it runs while the upload thread owns the tunnel's bandwidth.
    The executable lands in the persistent compile cache; the warmup
    call's trace then deserializes instead of compiling.
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


def _device_p50(pipe, wav, text_ids, k: int = 4) -> float:
    """Tunnel-independent per-image latency: inputs device-resident, each
    image's seed derived (tiny jitted op) from the PREVIOUS image so the
    chain is data-dependent end to end — XLA cannot drop or reorder any
    link — and only the final 4-byte seed is fetched. Matches the warmup
    program's avals exactly (same shapes/dtypes/statics), so no new
    compile. Wall p50 minus this is the per-call host+transfer overhead.
    """
    import jax
    import jax.numpy as jnp

    sch = pipe.cfg.diffusion.scheduler
    wav_dev = jax.device_put(wav[None])
    tid = jax.device_put(np.asarray(text_ids, np.int32))
    uid = jax.device_put(np.zeros_like(text_ids, np.int32))
    # % keeps the data dependency non-constant-foldable
    chain = jax.jit(lambda im: jnp.max(im).astype(jnp.int32) % 3)
    f32 = np.float32

    def call(seed):
        return pipe._generate_jit(
            pipe.params, wav_dev, tid, uid, sch.num_inference_steps,
            f32(sch.guidance_scale), "hierarchical", seed, 1,
            f32(pipe.cfg.condition.audio_norm_target), f32(0.5),
            sch.sampler, 0, None, None, None, None, None, f32(0.0),
        )

    img = call(np.int32(0))          # settle any residual trace; then sync
    int(np.asarray(chain(img)))
    t0 = time.time()
    seed = np.int32(1)
    for _ in range(k):
        seed = chain(call(seed))     # all async; device executes in order
    int(np.asarray(seed))            # one 4-byte fetch syncs the chain
    return (time.time() - t0) / k


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

    diag = {"diag": "bench"}
    rng = np.random.default_rng(0)
    # PCM16 input — what a real WAV corpus contains and what load_audio
    # returns for mono 48 kHz 16-bit sources; uploads half the bytes of
    # float32 and is dequantized + peak-normalized on device.
    wav = (rng.normal(size=cfg.clap.frontend.num_samples) * 0.1 * 32767.0).clip(
        -32768, 32767
    ).astype(np.int16)
    text_ids = rng.integers(0, 49_000, size=(1, 77)).astype(np.int32)

    # int8 wire format: ON by default for the bench (numerics drift is
    # bounded + tested, timing is weight-value independent); disable with
    # C2D_INT8_WIRE=0. The library default stays opt-in.
    int8_wire = os.environ.get("C2D_INT8_WIRE", "1") == "1"
    diag["int8_wire"] = int8_wire

    t_session = time.time()
    path = params_cache_path(
        cfg, seed=0, dtype=jnp.bfloat16,
        cache_dir=os.path.join(REPO, ".cache", "params"),
    )
    # v2 packed artifacts are raw binary (.wire.bin); pre-round-5 sessions
    # left npz-container files under .wire.npz — still loadable
    wire_save_path = (path + ".wire.bin") if path else None
    wire_path = wire_save_path
    if path and not os.path.exists(wire_save_path):
        legacy = path + ".wire.npz"
        if os.path.exists(legacy):
            wire_path = legacy

    packed = layout = dq = host_params = None
    if int8_wire and wire_path and os.path.exists(wire_path):
        from clap2diffusion_tpu.utils.wire import (
            dequant_map, load_packed_wire, load_wire_cache, pack_wire,
            packed_avals,
        )

        # wire-cache hit: skip the fp restore (2x the disk bytes) AND the
        # host quantize pass; the pipeline starts from abstract avals and
        # gets real params when the upload thread finishes. v2 caches hold
        # one packed buffer per dtype (few-entry npz read, a handful of
        # tunnel transfers — ~25% faster sustained than the 2,039-leaf
        # tree, see pack_wire)
        nbytes, t_raw = _raw_read_dir(wire_path)
        t0 = time.time()
        try:
            try:
                packed, layout, dq = load_packed_wire(wire_path)
            except ValueError:  # legacy v1 per-leaf artifact: pack on host
                wire_tree, wire_dtypes = load_wire_cache(wire_path)
                packed, layout = pack_wire(wire_tree)
                dq = dequant_map(wire_dtypes)
        except Exception as e:  # unreadable cache: rebuild from the fp path
            log(f"wire cache unreadable ({type(e).__name__}: {e}); "
                "falling back to the fp param cache")
        else:
            diag["restore_bytes"] = nbytes
            diag["restore_raw_read_s"] = round(t_raw, 2)
            diag["restore_decode_s"] = round(time.time() - t0, 2)
            diag["wire_cache_hit"] = True
            log(f"restore wire cache: raw read {nbytes / 2**30:.2f} GiB in "
                f"{t_raw:.1f}s, decode {diag['restore_decode_s']}s")
            pipe = AudioToImagePipeline(cfg,
                                        params=packed_avals(layout, dq))
    if packed is None and path and os.path.exists(path):
        # warm fp param cache: disk -> host, then overlap the tunnel upload
        # (background thread) with the AOT compile (main thread)
        nbytes, t_raw = _raw_read_dir(path)
        diag["restore_bytes"] = nbytes
        diag["restore_raw_read_s"] = round(t_raw, 2)
        t0 = time.time()
        host_params = restore_params_host(path)
        diag["restore_decode_s"] = round(time.time() - t0, 2)
        diag["wire_cache_hit"] = False
        log(f"restore_host: raw read {nbytes / 2**30:.2f} GiB in "
            f"{t_raw:.1f}s, orbax decode (warm cache) "
            f"{diag['restore_decode_s']}s "
            f"(leaf type {type(jax.tree.leaves(host_params)[0]).__name__})")
        pipe = AudioToImagePipeline(cfg, params=host_params)
        if int8_wire:
            from clap2diffusion_tpu.utils.wire import (
                dequant_map, pack_wire, quantize_wire, save_wire_cache,
            )

            t0 = time.time()
            wire_tree, wire_dtypes, wstats = quantize_wire(host_params)
            diag["quantize_s"] = round(time.time() - t0, 2)
            log(f"quantize_wire (host): {diag['quantize_s']}s, "
                f"{wstats['raw_bytes'] / 2**30:.2f} -> "
                f"{wstats['wire_bytes'] / 2**30:.2f} GiB "
                f"({int(wstats['quantized_leaves'])} leaves quantized)")
            t0 = time.time()
            packed, layout = pack_wire(wire_tree)
            dq = dequant_map(wire_dtypes)
            log(f"pack_wire (host): {time.time() - t0:.1f}s "
                f"({sum(b.nbytes for b in packed.values()) / 2**30:.2f} GiB "
                f"in {len(packed)} dtype buffers)")
            if wire_save_path:
                t0 = time.time()
                save_wire_cache(wire_save_path, wire_tree, wire_dtypes,
                                packed_layout=(packed, layout))
                log(f"save wire cache (v2 packed): {time.time() - t0:.1f}s "
                    f"-> {wire_save_path}")
    elif packed is None:
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
        int8_wire = False
        diag["int8_wire"] = False

    if packed is not None or host_params is not None:
        result = {}
        diag["upload_bytes"] = int(
            sum(b.nbytes for b in packed.values()) if int8_wire else sum(
                np.asarray(x).nbytes for x in jax.tree.leaves(host_params)
            )
        )

        def upload():
            try:
                if int8_wire:
                    from clap2diffusion_tpu.utils.wire import (
                        packed_dequant_program,
                    )

                    # compile the unpack+dequant program INSIDE this
                    # thread, timed separately from upload_s (ADVICE r4:
                    # its first-call compile otherwise lands inside the
                    # upload measure) — the main thread's 50-step AOT
                    # lower starts immediately instead of waiting ~8 s
                    # behind this cache-hit. One program slices every
                    # leaf out of the per-dtype buffers and expands the
                    # int8 ones.
                    t = time.time()
                    dequant = packed_dequant_program(layout, dq).lower({
                        dt: jax.ShapeDtypeStruct(buf.shape, buf.dtype)
                        for dt, buf in packed.items()
                    }).compile()
                    result["dequant_compile_s"] = time.time() - t
                t = time.time()
                if int8_wire:
                    # a handful of transfers: the payload rides the tunnel
                    # as one 1-D array per dtype (no per-leaf RPC
                    # overhead), the program expands it to the full tree
                    # on device
                    p = dequant(jax.device_put(packed))
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
            diag["aot_compile_s"] = round(time.time() - t0, 1)
            log(f"aot_compile: {diag['aot_compile_s']}s "
                "(overlapped with upload)")
        except Exception as e:  # non-fatal: warmup compiles the slow way
            log(f"aot_compile FAILED after {time.time() - t0:.1f}s "
                f"(non-fatal): {type(e).__name__}: {e}")
        th.join()
        if "error" in result:
            raise RuntimeError("param upload thread failed") from result["error"]
        pipe.params = result["params"]
        pipe.compute_dtype = jax.tree.leaves(pipe.params["unet"])[0].dtype
        if "dequant_compile_s" in result:
            diag["dequant_compile_s"] = round(result["dequant_compile_s"], 1)
            log(f"unpack+dequant compile (in upload thread): "
                f"{diag['dequant_compile_s']}s")
        diag["upload_s"] = round(result["upload_s"], 1)
        log(f"upload: {diag['upload_s']}s "
            f"({diag['upload_bytes'] / 2**30:.2f} GiB on the wire)")

    # Warmup / first image: trace + compile-cache deserialize + execute
    t0 = time.time()
    img = pipe.generate(waveform=wav, text_ids=text_ids, seed=0)
    diag["warmup_s"] = round(time.time() - t0, 1)
    log(f"warmup (first image): {diag['warmup_s']}s, image {img.shape}")
    diag["ttfi_s"] = round(time.time() - t_session, 1)
    log(f"time-to-first-image (session start -> image): {diag['ttfi_s']}s")

    # Tunnel bandwidth AT BENCH TIME — the attribution for any wall-p50
    # shift between driver sessions (VERDICT r4: 1.179 -> 1.248 was
    # unattributable from the artifact)
    up_mbps, down_mbps = _tunnel_probe(jax)
    diag["tunnel_up_mbps"] = round(up_mbps, 1)
    diag["tunnel_down_mbps"] = round(down_mbps, 1)
    log(f"tunnel probe: up {up_mbps:.1f} MB/s, down {down_mbps:.1f} MB/s")

    times = []
    for i in range(5):
        t0 = time.time()
        img = pipe.generate(waveform=wav, text_ids=text_ids, seed=i)
        times.append(time.time() - t0)
    p50 = float(np.median(times))
    diag["wall_p50_s"] = round(p50, 4)
    diag["times"] = [round(t, 3) for t in times]
    log(f"times: {[f'{t:.3f}' for t in times]}")

    # Device-synced p50 + per-call transfer attribution
    dev_p50 = _device_p50(pipe, wav, text_ids)
    diag["device_p50_s"] = round(dev_p50, 4)
    up_bytes = wav[None].nbytes + 2 * text_ids.nbytes
    down_bytes = img.nbytes
    diag["per_call_up_bytes"] = int(up_bytes)
    diag["per_call_down_bytes"] = int(down_bytes)
    expected = up_bytes / (up_mbps * 2**20) + down_bytes / (down_mbps * 2**20)
    diag["expected_transfer_s"] = round(expected, 3)
    diag["wall_minus_device_s"] = round(p50 - dev_p50, 3)
    log(f"device p50 (chained, tunnel-independent): {dev_p50:.4f}s; "
        f"wall-device gap {p50 - dev_p50:.3f}s vs expected transfer "
        f"{expected:.3f}s ({up_bytes / 2**20:.2f} MB up @ {up_mbps:.1f} + "
        f"{down_bytes / 2**20:.2f} MB down @ {down_mbps:.1f} MB/s)")

    log(json.dumps(diag))
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
