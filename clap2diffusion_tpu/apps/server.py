"""Minimal production HTTP server (stdlib-only) for audio+text -> image.

The reference serves exclusively through gradio (reference app/gradio_app.py,
Dockerfile:55); gradio isn't installable everywhere (not in this image), so
this provides the same serving surface with zero dependencies:

    POST /generate   JSON {audio_b64?: wav bytes, text?: str, steps?: int,
                           cfg?: float, cfg_rescale?: float (0..1, Lin et
                           al. 2023 CFG-rescale), norm?: float, seed?: int,
                           model_type?: str, sampler?: str,
                           negative?: str,
                           init_image_b64?: png/jpg bytes, strength?: float,
                           mask_image_b64?: grayscale png bytes,
                           audio2_b64?: wav bytes, audio_mix?: float,
                           best_of?: int,
                           format?: "png"|"jpeg", quality?: int}
                     -> JSON {image_b64: png/jpeg bytes, info: {...}}
                     init_image_b64 runs SDEdit-style img2img;
                     mask_image_b64 (nonzero = regenerate) turns it into
                     inpainting; audio2_b64 blends two audio sources' CLAP
                     embeddings; best_of > 1 generates N candidates in one
                     batched program, ranks them by CLIPScore against
                     ``text`` on device and returns only the winner
                     (requires converted CLIP vision weights; info carries
                     the per-candidate clip_scores).
    POST /generate_batch
                     JSON {requests: [{audio_b64?, text?, negative?,
                           seed?}, ...],
                           steps?, cfg?, norm?, seed?, model_type?, sampler?}
                     -> JSON {images_b64: [...], info: {...}}
                     One folded device program for the whole group. The
                     scalar knobs (steps/cfg/norm/sampler) are shared; a
                     per-request seed switches that lane to per-lane noise
                     derivation (the image depends only on its own seed).
    GET  /healthz    -> 200 "ok"   (the Docker healthcheck target)
    GET  /metrics    -> JSON {requests, errors, images, latency_s:
                       {p50, p90, max, count}} over a sliding window —
                       the serving observability counters.

Concurrency model: the device is a serial resource, but dispatch is async —
the lock covers only the enqueue, and the host->device upload / image
download of one request overlaps the device compute of its neighbour
(the generate_stream pipelining, BENCH_NOTES.md: 4x batch-8 1.118 -> 1.167
img/s from exactly this overlap). With ``--coalesce-ms N`` the server
additionally micro-batches: concurrent simple /generate requests whose
scalar knobs match are folded into ONE batched device program (padded to
the next power of two; ~30% cheaper per image at batch 8). Launch:

    python -m clap2diffusion_tpu.apps.server --port 7860 --coalesce-ms 15
"""

from __future__ import annotations

import argparse
import base64
import io
import json
import tempfile
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np


class _Pending:
    """One request parked in the coalescer queue."""

    __slots__ = ("key", "wav", "text_ids", "uncond_ids", "seed", "event",
                 "result", "error", "batch")

    def __init__(self, key, wav, text_ids, uncond_ids, seed):
        self.key = key
        self.wav = wav
        self.text_ids = text_ids
        self.uncond_ids = uncond_ids
        self.seed = seed
        self.event = threading.Event()
        self.result = None
        self.error: Optional[Exception] = None
        self.batch = 1


class RequestCoalescer:
    """Dynamic micro-batching for concurrent /generate requests.

    The device program is ~30% cheaper per image at batch 8 than batch 1
    (BENCH_NOTES.md), so under concurrency it pays to fold simultaneous
    requests into ONE batched dispatch. Requests whose scalar knobs
    (steps/cfg/norm/model_type/seed/sampler — baked into the jitted
    program or shared across the batch) match are grouped for up to
    ``window_ms``; the group is padded to the next power of two so the
    jit cache holds at most log2(max_batch)+1 batched programs.

    The reference has no serving batcher (its gradio app is one request
    at a time, reference app/gradio_app.py:52-92); this is the TPU
    production-serving counterpart.

    Determinism: the batched program takes per-lane seeds, so each image's
    noise depends only on its own request's seed — requests with different
    seeds coalesce freely, and identical group compositions reproduce
    bit-identically. Across DIFFERENT group sizes the same request can
    differ by XLA compilation rounding (≤1 uint8 step on isolated pixels,
    measured mean ~1e-4 — distinct batch shapes compile to distinct
    programs). The per-lane noise derivation also differs from the
    non-coalesced scalar-seed path's batch-shaped draw.
    """

    def __init__(self, service: "InferenceService", window_ms: float = 15.0,
                 max_batch: int = 8):
        import queue

        self.service = service
        self.window = max(window_ms, 0.0) / 1000.0
        self.max_batch = max(int(max_batch), 1)
        self._cv = threading.Condition()
        self._queue: list = []
        # dispatch/fetch split: the dispatch worker enqueues the NEXT
        # group's device program while the fetch worker blocks on the
        # previous group's host transfer — under sustained load the 6 MB
        # image download + PNG encodes overlap device compute (the same
        # overlap generate_stream exploits). Depth 2 bounds in-flight work.
        self._fetch_q: "queue.Queue" = queue.Queue(maxsize=2)
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()
        self._fetch_thread = threading.Thread(target=self._fetcher, daemon=True)
        self._fetch_thread.start()

    def submit(self, wav, text_ids, uncond_ids, params: dict):
        # seed is NOT part of the key: the batched program takes per-lane
        # seeds, so requests with different seeds still fold together
        has_audio = wav is not None
        key = (params["num_steps"], params["guidance_scale"],
               params["norm_target"], params["model_type"],
               params["sampler"], params["guidance_rescale"], has_audio)
        p = _Pending(key, wav, text_ids, uncond_ids, params["seed"])
        with self._cv:
            self._queue.append(p)
            self._cv.notify_all()
        p.event.wait()
        if p.error is not None:
            raise p.error
        return p.result, p.batch

    def _worker(self):
        while True:
            with self._cv:
                while not self._queue:
                    self._cv.wait()
                key = self._queue[0].key
                deadline = time.monotonic() + self.window
                while True:
                    same = [p for p in self._queue if p.key == key]
                    if len(same) >= self.max_batch:
                        break
                    remaining = deadline - time.monotonic()
                    if remaining <= 0:
                        break
                    self._cv.wait(timeout=remaining)
                group = same[: self.max_batch]
                for p in group:
                    self._queue.remove(p)
            self._run(group)

    def _run(self, group: list):
        svc = self.service
        try:
            n = len(group)
            # pad to the next power of two: bounded jit-cache growth, and
            # the padded lanes ride the same MXU pass nearly for free
            m = 1 << (n - 1).bit_length()
            pads = m - n
            (steps, cfg, norm, model_type, sampler, rescale,
             has_audio) = group[0].key
            seeds = np.asarray(
                [p.seed for p in group] + [group[-1].seed] * pads, np.int32
            )
            waveform = None
            if has_audio:
                waveform = svc._stack_wavs(
                    [p.wav for p in group] + [group[-1].wav] * pads
                )
            text_ids = np.concatenate(
                [p.text_ids for p in group] + [group[-1].text_ids] * pads
            )
            uncond_ids = np.concatenate(
                [p.uncond_ids for p in group] + [group[-1].uncond_ids] * pads
            )
            with svc._lock:
                imgs_dev = svc.pipe._dispatch_generate(
                    waveform=waveform,
                    text_ids=text_ids,
                    uncond_ids=uncond_ids,
                    batch=m,
                    num_steps=steps,
                    guidance_scale=cfg,
                    norm_target=norm,
                    model_type=model_type,
                    seed=0,
                    seeds=seeds,
                    sampler=sampler,
                    guidance_rescale=rescale,
                )
            # hand the async device result to the fetch worker; this
            # thread immediately returns to forming the next group
            self._fetch_q.put((group, imgs_dev))
        except Exception as e:  # fail the whole group, keep serving
            for p in group:
                p.error = e
                p.event.set()

    def _fetcher(self):
        svc = self.service
        while True:
            group, imgs_dev = self._fetch_q.get()
            try:
                imgs = np.asarray(imgs_dev)  # blocking host transfer
                for i, p in enumerate(group):
                    p.result = imgs[i]
                    p.batch = len(group)
                    p.event.set()
                svc.record_coalesce(len(group))
            except Exception as e:
                for p in group:
                    p.error = e
                    p.event.set()


class InferenceService:
    """Pipeline wrapper with a lock (one generation at a time)."""

    def __init__(self, cfg=None, params=None, coalesce_ms: float = 0.0,
                 coalesce_max_batch: int = 8):
        from clap2diffusion_tpu.core.config import Config
        from clap2diffusion_tpu.diffusion.pipeline import AudioToImagePipeline
        from clap2diffusion_tpu.models.tokenizer import CLIPTokenizer

        self.cfg = cfg or Config()
        self.pipe = AudioToImagePipeline(self.cfg, params=params)
        self.tok = CLIPTokenizer(max_length=self.cfg.diffusion.clip_text.max_length)
        self._lock = threading.Lock()
        # serving counters (guarded by their own lock so metrics reads
        # never contend with the dispatch lock)
        self._mlock = threading.Lock()
        self._requests = 0
        self._errors = 0
        self._images = 0
        self._latencies: list = []  # sliding window, seconds
        self._coalesced_batches = 0
        self._coalesced_images = 0
        self.coalescer: Optional[RequestCoalescer] = (
            RequestCoalescer(self, coalesce_ms, coalesce_max_batch)
            if coalesce_ms > 0 else None
        )

    def record(self, latency_s: float, images: int = 1, error: bool = False):
        with self._mlock:
            self._requests += 1
            if error:
                self._errors += 1
            else:
                self._images += images
                self._latencies.append(latency_s)
                if len(self._latencies) > 512:
                    self._latencies = self._latencies[-512:]

    def record_coalesce(self, group_size: int):
        with self._mlock:
            self._coalesced_batches += 1
            self._coalesced_images += group_size

    def metrics(self) -> dict:
        with self._mlock:
            lats = sorted(self._latencies)
            out = {
                "requests": self._requests,
                "errors": self._errors,
                "images": self._images,
                "coalesce": {
                    "batches": self._coalesced_batches,
                    "images": self._coalesced_images,
                    "mean_batch": round(
                        self._coalesced_images / self._coalesced_batches, 2
                    ) if self._coalesced_batches else 0.0,
                },
                "latency_s": {},
            }
            if lats:
                n = len(lats)
                out["latency_s"] = {
                    "p50": round(lats[n // 2], 4),
                    "p90": round(lats[min(n - 1, int(n * 0.9))], 4),
                    "max": round(lats[-1], 4),
                    "count": n,
                }
            return out

    def _decode_audio(self, req: dict, key: str = "audio_b64"):
        if not req.get(key):
            return None
        raw = base64.b64decode(req[key])
        with tempfile.NamedTemporaryFile(suffix=".wav") as f:
            f.write(raw)
            f.flush()
            return self.pipe.load_audio(f.name)

    def _decode_init_image(self, req: dict, key: str = "init_image_b64",
                           mask: bool = False):
        if not req.get(key):
            return None
        return self.pipe.load_init_image(
            io.BytesIO(base64.b64decode(req[key])), mask=mask
        )

    def _knobs(self, req: dict) -> dict:
        return {
            "num_steps": int(req.get("steps", self.cfg.diffusion.scheduler.num_inference_steps)),
            "guidance_scale": float(req.get("cfg", self.cfg.diffusion.scheduler.guidance_scale)),
            "norm_target": float(req.get("norm", self.cfg.condition.audio_norm_target)),
            "model_type": str(req.get("model_type", "hierarchical")),
            "seed": int(req.get("seed", 0)),
            "sampler": str(req.get("sampler", self.cfg.diffusion.scheduler.sampler)),
            "guidance_rescale": float(req.get("cfg_rescale", 0.0)),
        }

    @staticmethod
    def _img_b64(img: np.ndarray, fmt: str = "png", quality: int = 92) -> str:
        """Encode one image. ``fmt``: 'png' (lossless, default) or 'jpeg'
        (~10x smaller payloads for photographic outputs — a bandwidth knob
        for remote clients)."""
        from PIL import Image

        fmt = fmt.lower()
        if fmt not in ("png", "jpeg", "jpg"):
            raise ValueError(f"unknown image format {fmt!r} (png|jpeg)")
        buf = io.BytesIO()
        if fmt == "png":
            Image.fromarray(np.asarray(img)).save(buf, format="PNG")
        else:
            Image.fromarray(np.asarray(img)).save(
                buf, format="JPEG", quality=int(quality)
            )
        return base64.b64encode(buf.getvalue()).decode()


    def _info(self, params: dict) -> dict:
        return {
            "steps": params["num_steps"],
            "cfg": params["guidance_scale"],
            "norm": params["norm_target"],
            "model_type": params["model_type"],
            "seed": params["seed"],
            "sampler": params["sampler"],
            "cfg_rescale": params["guidance_rescale"],
        }

    @staticmethod
    def _stack_wavs(wavs: list) -> np.ndarray:
        """Stack per-request waveforms into one batch array. PCM16
        fast-path arrays stay int16 only if every source is int16;
        otherwise each int16 source is dequantized host-side
        (x/peak == peak_normalize(x/32768) exactly)."""
        if all(w.dtype == np.int16 for w in wavs):
            return np.stack(wavs)
        return np.stack([
            w.astype(np.float32) / max(float(np.abs(w).max()), 1.0)
            if w.dtype == np.int16 else w
            for w in wavs
        ])

    def generate(self, req: dict) -> dict:
        # ALL host-side decoding (audio, init image, mask — base64 + PIL +
        # resize can be hundreds of ms) happens OUTSIDE the lock; the lock
        # covers only the async enqueue (~10 ms), so while this image's
        # upload/compute/download runs, a concurrent request's dispatch
        # already overlaps it — the generate_stream pipelining.
        wav = self._decode_audio(req)
        params = self._knobs(req)
        best_of = int(req.get("best_of", 1))
        if best_of > 1:
            # best-of-n rerank: one batched candidate program + an on-device
            # CLIPScore argmax select; only the winner crosses the tunnel.
            # Bypasses the coalescer (its per-lane seed slots are taken by
            # the candidates) and the simple-request fold.
            if any(req.get(k) for k in ("init_image_b64", "mask_image_b64")):
                raise ValueError(
                    "best_of is unsupported with init/mask images "
                    "(candidates need per-lane seeds)"
                )
            with self._lock:
                best_dev, scores_dev = self.pipe._dispatch_best_of(
                    best_of,
                    waveform=wav,
                    text_ids=self.tok(req.get("text", "")),
                    uncond_ids=self.tok(str(req.get("negative", ""))),
                    waveform2=self._decode_audio(req, "audio2_b64"),
                    audio_mix=float(req.get("audio_mix", 0.5)),
                    **params,
                )
            img = np.asarray(best_dev)  # blocking fetch OUTSIDE the lock
            scores = [round(float(s), 4) for s in np.asarray(scores_dev)]
            return {
                "image_b64": self._img_b64(img, req.get("format", "png"),
                                           int(req.get("quality", 92))),
                "info": {**self._info(params), "best_of": best_of,
                         "clip_scores": scores},
            }
        if self.coalescer is not None and not any(
            req.get(k) for k in ("init_image_b64", "mask_image_b64",
                                 "audio2_b64")
        ):
            # simple audio+text request: park it in the micro-batcher so
            # concurrent traffic folds into one device program
            img, group = self.coalescer.submit(
                wav,
                self.tok(req.get("text", "")),
                self.tok(str(req.get("negative", ""))),
                params,
            )
            return {
                "image_b64": self._img_b64(img, req.get("format", "png"),
                                           int(req.get("quality", 92))),
                "info": {**self._info(params), "coalesced_batch": group},
            }
        kwargs = dict(
            waveform=wav,
            text_ids=self.tok(req.get("text", "")),
            uncond_ids=self.tok(str(req.get("negative", ""))),
            init_image=self._decode_init_image(req),
            strength=float(req.get("strength", 0.8)),
            mask_image=self._decode_init_image(req, "mask_image_b64", mask=True),
            waveform2=self._decode_audio(req, "audio2_b64"),
            audio_mix=float(req.get("audio_mix", 0.5)),
            **params,
        )
        with self._lock:
            img_dev = self.pipe._dispatch_generate(**kwargs)
        img = np.asarray(img_dev)[0]  # blocking fetch OUTSIDE the lock
        return {
            "image_b64": self._img_b64(img, req.get("format", "png"),
                                       int(req.get("quality", 92))),
            "info": self._info(params),
        }

    def generate_batch(self, req: dict) -> dict:
        """Fold a request group into ONE batched device program (throughput
        mode: per-sample cost drops ~30% at batch 8, BENCH_NOTES.md). The
        scalar knobs (steps/cfg/...) are shared across the group; a
        request may carry its own ``seed`` (per-lane noise derivation —
        that image then depends only on its seed, not on the group)."""
        reqs = req.get("requests") or []
        if not reqs:
            raise ValueError("generate_batch needs a non-empty 'requests' list")
        params = self._knobs(req)
        seeds = None
        if any("seed" in r for r in reqs):
            seeds = np.asarray(
                [int(r.get("seed", params["seed"])) for r in reqs], np.int32
            )
        wavs = [self._decode_audio(r) for r in reqs]
        if any(w is None for w in wavs) and not all(w is None for w in wavs):
            raise ValueError(
                "generate_batch requests must either all carry audio_b64 or none"
            )
        waveform = None if wavs[0] is None else self._stack_wavs(wavs)
        text_ids = np.concatenate([self.tok(r.get("text", "")) for r in reqs])
        uncond_ids = np.concatenate(
            [self.tok(str(r.get("negative", ""))) for r in reqs]
        )
        with self._lock:
            imgs_dev = self.pipe._dispatch_generate(
                waveform=waveform,
                text_ids=text_ids,
                uncond_ids=uncond_ids,
                batch=len(reqs),
                seeds=seeds,
                **params,
            )
        imgs = np.asarray(imgs_dev)
        info = {**self._info(params), "batch": len(reqs)}
        if seeds is not None:
            info["seeds"] = [int(s) for s in seeds]
        return {
            "images_b64": [
                self._img_b64(im, req.get("format", "png"),
                              int(req.get("quality", 92)))
                for im in imgs
            ],
            "info": info,
        }


def make_handler(service: InferenceService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # quiet
            pass

        def _send(self, code: int, payload: bytes, ctype="application/json"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def do_GET(self):
            if self.path in ("/", "/healthz"):
                self._send(200, b"ok", "text/plain")
            elif self.path == "/metrics":
                self._send(200, json.dumps(service.metrics()).encode())
            else:
                self._send(404, b'{"error": "not found"}')

        def do_POST(self):
            routes = {
                "/generate": service.generate,
                "/generate_batch": service.generate_batch,
            }
            fn = routes.get(self.path)
            if fn is None:
                self._send(404, b'{"error": "not found"}')
                return
            t0 = time.perf_counter()
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
                out = fn(req)
                service.record(
                    time.perf_counter() - t0,
                    images=len(out["images_b64"]) if "images_b64" in out else 1,
                )
                self._send(200, json.dumps(out).encode())
            except ValueError as e:  # bad request payloads are the client's
                service.record(time.perf_counter() - t0, error=True)
                self._send(400, json.dumps({"error": str(e)}).encode())
            except Exception as e:  # surface errors as JSON, keep serving
                service.record(time.perf_counter() - t0, error=True)
                self._send(500, json.dumps({"error": str(e)}).encode())

    return Handler


def serve(cfg=None, params=None, host: str = "0.0.0.0", port: int = 7860,
          service: Optional[InferenceService] = None,
          coalesce_ms: float = 0.0,
          coalesce_max_batch: int = 8) -> ThreadingHTTPServer:
    service = service or InferenceService(
        cfg, params, coalesce_ms=coalesce_ms,
        coalesce_max_batch=coalesce_max_batch,
    )
    server = ThreadingHTTPServer((host, port), make_handler(service))
    return server


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=7860)
    ap.add_argument("--config", default=None)
    ap.add_argument("--checkpoint", default=None,
                    help="orbax pipeline checkpoint (save_pipeline output)")
    ap.add_argument("--coalesce-ms", type=float, default=0.0,
                    help="fold concurrent /generate requests with matching "
                         "knobs into one batched device program, waiting up "
                         "to this many ms to form a group (0 = off)")
    ap.add_argument("--coalesce-max-batch", type=int, default=8)
    args = ap.parse_args()

    from clap2diffusion_tpu.core.config import load_config
    from clap2diffusion_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    cfg = load_config(args.config)
    params = None
    if args.checkpoint:
        from clap2diffusion_tpu.diffusion.pipeline import load_pipeline

        params = load_pipeline(cfg, args.checkpoint).params
    server = serve(cfg, params, args.host, args.port,
                   coalesce_ms=args.coalesce_ms,
                   coalesce_max_batch=args.coalesce_max_batch)
    print(f"serving on {args.host}:{args.port}")
    server.serve_forever()
    return 0


if __name__ == "__main__":
    main()
