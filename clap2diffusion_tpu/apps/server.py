"""Minimal production HTTP server (stdlib-only) for audio+text -> image.

The reference serves exclusively through gradio (reference app/gradio_app.py,
Dockerfile:55); gradio isn't installable everywhere (not in this image), so
this provides the same serving surface with zero dependencies:

    POST /generate   JSON {audio_b64?: wav bytes, text?: str, steps?: int,
                           cfg?: float, norm?: float, seed?: int,
                           model_type?: str, sampler?: str,
                           negative?: str}
                     -> JSON {image_b64: png bytes, info: {...}}
    GET  /healthz    -> 200 "ok"   (the Docker healthcheck target)

Requests are served sequentially (the TPU is a serial resource; the jit
cache makes repeat shapes fast). Launch:

    python -m clap2diffusion_tpu.apps.server --port 7860
"""

from __future__ import annotations

import argparse
import base64
import io
import json
import tempfile
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np


class InferenceService:
    """Pipeline wrapper with a lock (one generation at a time)."""

    def __init__(self, cfg=None, params=None):
        from clap2diffusion_tpu.core.config import Config
        from clap2diffusion_tpu.diffusion.pipeline import AudioToImagePipeline
        from clap2diffusion_tpu.models.tokenizer import CLIPTokenizer

        self.cfg = cfg or Config()
        self.pipe = AudioToImagePipeline(self.cfg, params=params)
        self.tok = CLIPTokenizer(max_length=self.cfg.diffusion.clip_text.max_length)
        self._lock = threading.Lock()

    def generate(self, req: dict) -> dict:
        wav = None
        if req.get("audio_b64"):
            raw = base64.b64decode(req["audio_b64"])
            with tempfile.NamedTemporaryFile(suffix=".wav") as f:
                f.write(raw)
                f.flush()
                wav = self.pipe.load_audio(f.name)
        params = {
            "num_steps": int(req.get("steps", self.cfg.diffusion.scheduler.num_inference_steps)),
            "guidance_scale": float(req.get("cfg", self.cfg.diffusion.scheduler.guidance_scale)),
            "norm_target": float(req.get("norm", self.cfg.condition.audio_norm_target)),
            "model_type": str(req.get("model_type", "hierarchical")),
            "seed": int(req.get("seed", 0)),
            "sampler": str(req.get("sampler", self.cfg.diffusion.scheduler.sampler)),
        }
        with self._lock:
            img = self.pipe.generate(
                waveform=wav,
                text_ids=self.tok(req.get("text", "")),
                uncond_ids=self.tok(str(req.get("negative", ""))),
                **params,
            )[0]
        from PIL import Image

        buf = io.BytesIO()
        Image.fromarray(np.asarray(img)).save(buf, format="PNG")
        return {
            "image_b64": base64.b64encode(buf.getvalue()).decode(),
            "info": {
                "steps": params["num_steps"],
                "cfg": params["guidance_scale"],
                "norm": params["norm_target"],
                "model_type": params["model_type"],
                "seed": params["seed"],
                "sampler": params["sampler"],
            },
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
            else:
                self._send(404, b'{"error": "not found"}')

        def do_POST(self):
            if self.path != "/generate":
                self._send(404, b'{"error": "not found"}')
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
                out = service.generate(req)
                self._send(200, json.dumps(out).encode())
            except Exception as e:  # surface errors as JSON, keep serving
                self._send(500, json.dumps({"error": str(e)}).encode())

    return Handler


def serve(cfg=None, params=None, host: str = "0.0.0.0", port: int = 7860,
          service: Optional[InferenceService] = None) -> ThreadingHTTPServer:
    service = service or InferenceService(cfg, params)
    server = ThreadingHTTPServer((host, port), make_handler(service))
    return server


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=7860)
    ap.add_argument("--config", default=None)
    ap.add_argument("--checkpoint", default=None,
                    help="orbax pipeline checkpoint (save_pipeline output)")
    args = ap.parse_args()

    from clap2diffusion_tpu.core.config import load_config
    from clap2diffusion_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    cfg = load_config(args.config)
    params = None
    if args.checkpoint:
        from clap2diffusion_tpu.diffusion.pipeline import load_pipeline

        params = load_pipeline(cfg, args.checkpoint).params
    server = serve(cfg, params, args.host, args.port)
    print(f"serving on {args.host}:{args.port}")
    server.serve_forever()
    return 0


if __name__ == "__main__":
    main()
