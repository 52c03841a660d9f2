"""Frozen end-to-end image golden (VERDICT round-2 missing #4).

One committed tiny-geometry image pins the WHOLE sampler chain — wav ->
log-mel -> CLAP -> hierarchical conditioning -> DDIM scan (CFG) -> VAE
decode -> uint8 — across sessions, so any silent numeric drift from a
future kernel swap (the regression class the opt-in C2D_* kernels make
likely) trips a fast-tier test instead of shipping.

Runs in the FAST tier: it is also the tier's one end-to-end generation
smoke (ADVICE r2: fast CI must exercise generation).

Regenerate INTENTIONALLY after a semantic change:
    python tools/make_image_golden.py
"""

import os

import numpy as np

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "goldens",
                           "pipeline_tiny_image.npz")


def generate_golden_image() -> np.ndarray:
    """The exact generation the golden freezes (shared with the tool)."""
    from clap2diffusion_tpu.diffusion.pipeline import AudioToImagePipeline
    from clap2diffusion_tpu.models.tokenizer import CLIPTokenizer
    from tests.test_pipeline import tiny_config

    cfg = tiny_config()
    pipe = AudioToImagePipeline(cfg, seed=0)
    tok = CLIPTokenizer(max_length=cfg.diffusion.clip_text.max_length)
    wav = (np.sin(np.linspace(0, 440 * np.pi, 24_000)) * 0.3
           + np.cos(np.linspace(0, 97 * np.pi, 24_000)) * 0.1).astype(np.float32)
    return pipe.generate(waveform=wav, text_ids=tok("golden rain"),
                         uncond_ids=tok(""), num_steps=3, seed=11)


def test_frozen_image_golden():
    assert os.path.exists(GOLDEN_PATH), (
        "missing committed golden — run python tools/make_image_golden.py"
    )
    golden = np.load(GOLDEN_PATH)["image"]
    img = generate_golden_image()
    assert img.shape == golden.shape == (1, 64, 64, 3)
    assert img.dtype == np.uint8
    diff = np.abs(img.astype(np.int32) - golden.astype(np.int32))
    # exact on an unchanged stack; the tolerance below only absorbs
    # rounding-level jitter from XLA/jax version bumps. A wrong kernel or
    # schedule produces a DIFFERENT image (mean diff tens of counts).
    frac_off = float((diff > 2).mean())
    assert float(diff.mean()) < 0.5 and frac_off < 0.01, (
        f"pipeline output drifted from the frozen golden: mean|d|={diff.mean():.2f}, "
        f">2-count pixels={frac_off:.1%}. If the change is intentional, "
        "regenerate via tools/make_image_golden.py and commit."
    )
