"""Data preparation: AudioCaps CSV prep + VAE latent precompute.

Covers the reference's ``scripts/prepare_data.py`` (CSV-driven wav
normalize/resample + 80/10/10 split + per-split metadata, reference
prepare_data.py:16-131) and fills its missing piece: the latent dataset
assumes precomputed VAE latents but no encode script exists in the
reference (SURVEY.md 3.5) — ``encode_latents`` encodes image frames to
[4,64,64] latents with our VAE in batched jit steps.

Standardizes on CLAP's 48 kHz (the reference mixes 44.1k/48k; SURVEY 2.10.7).
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

from clap2diffusion_tpu.utils.audio_io import read_audio, resample_poly, write_wav


def process_audio_file(
    in_path: str, out_path: str, target_sr: int = 48_000, duration_s: float = 10.0
) -> bool:
    """Load (wav/flac natively; mp3 etc. via ffmpeg when installed) -> mono
    -> peak-normalize -> resample -> crop/pad -> write wav."""
    try:
        wav, sr = read_audio(in_path)
        if wav.ndim == 2:
            wav = wav.mean(axis=0)
        peak = np.abs(wav).max()
        if peak > 0:
            wav = wav / peak
        if sr != target_sr:
            wav = resample_poly(wav, sr, target_sr)
        n = int(target_sr * duration_s)
        if len(wav) < n:
            wav = np.pad(wav, (0, n - len(wav)))
        write_wav(out_path, wav[:n], target_sr)
        return True
    except Exception:
        return False


# Source containers prepare can ingest, in preference order. The reference
# only globs {id}.wav (prepare_data.py:100) even though librosa would read
# more; with in-repo flac/mp3 decode (+ ffmpeg CLI for the rest) we widen
# the search so an unconverted AudioCaps dump prepares directly.
SOURCE_EXTENSIONS = (".wav", ".flac", ".mp3", ".m4a", ".ogg", ".opus", ".webm")


def find_source(audio_src_dir: str, sid: str) -> Optional[str]:
    """First existing `{sid}{ext}` under audio_src_dir, in SOURCE_EXTENSIONS order."""
    for ext in SOURCE_EXTENSIONS:
        cand = os.path.join(audio_src_dir, f"{sid}{ext}")
        if os.path.exists(cand):
            return cand
    return None


def prepare_audiocaps(
    csv_path: str,
    audio_src_dir: str,
    out_root: str,
    target_sr: int = 48_000,
    seed: int = 42,
    max_samples: Optional[int] = None,
) -> Dict:
    """CSV (youtube_id, caption, ...) -> processed wavs + unified metadata."""
    import csv

    out = Path(out_root)
    (out / "audio").mkdir(parents=True, exist_ok=True)

    rows: List[Dict] = []
    with open(csv_path) as f:
        for row in csv.DictReader(f):
            rows.append(row)
    if max_samples:
        rows = rows[:max_samples]

    samples = []
    for row in rows:
        sid = row.get("youtube_id") or row.get("id") or row.get("audiocap_id")
        caption = row.get("caption", "")
        src = find_source(audio_src_dir, sid)
        dst = str(out / "audio" / f"{sid}.wav")
        if src is not None and process_audio_file(src, dst, target_sr):
            samples.append({"id": sid, "caption": caption})

    rng = np.random.RandomState(seed)
    idx = rng.permutation(len(samples))
    n_train = int(0.8 * len(samples))
    n_val = int(0.1 * len(samples))
    for pos, i in enumerate(idx):
        samples[i]["split"] = (
            "train" if pos < n_train else "val" if pos < n_train + n_val else "test"
        )

    metadata = {"samples": samples}
    with open(out / "metadata_unified.json", "w") as f:
        json.dump(metadata, f, indent=2)
    return metadata


def encode_latents(
    data_root: str,
    frames_dir: Optional[str] = None,
    vae_params=None,
    vae_cfg=None,
    batch_size: int = 8,
    image_size: int = 512,
    seed: int = 0,
) -> int:
    """Encode {id}.png/.jpg frames -> latents/{id}.npy via the VAE.

    Returns number of latents written. With no frames present, nothing
    happens (training then relies on already-present latents).
    """
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from clap2diffusion_tpu.core.config import VAEConfig
    from clap2diffusion_tpu.models.vae import AutoencoderKL

    root = Path(data_root)
    frames = Path(frames_dir) if frames_dir else root / "frames"
    latents_dir = root / "latents"
    latents_dir.mkdir(parents=True, exist_ok=True)
    if not frames.exists():
        return 0

    cfg = vae_cfg or VAEConfig()
    vae = AutoencoderKL(cfg=cfg)
    if vae_params is None:
        vae_params = vae.init(
            jax.random.key(0), jnp.ones((1, 64, 64, 3)), jax.random.key(1)
        )["params"]

    @jax.jit
    def encode(batch_imgs, rng):
        return vae.apply(
            {"params": vae_params}, batch_imgs, rng,
            method=AutoencoderKL.sample_latent,
        )

    paths = sorted(
        p for p in frames.iterdir() if p.suffix.lower() in (".png", ".jpg", ".jpeg")
    )
    written = 0
    rng = jax.random.key(seed)
    for i in range(0, len(paths), batch_size):
        chunk = paths[i : i + batch_size]
        imgs = []
        for p in chunk:
            img = Image.open(p).convert("RGB").resize((image_size, image_size))
            imgs.append(np.asarray(img, np.float32) / 127.5 - 1.0)
        arr = np.stack(imgs)
        if len(chunk) < batch_size:  # pad for a static jit shape
            arr = np.concatenate(
                [arr, np.zeros((batch_size - len(chunk),) + arr.shape[1:], np.float32)]
            )
        rng, sub = jax.random.split(rng)
        lat = np.asarray(encode(jnp.asarray(arr), sub))[: len(chunk)]
        for p, z in zip(chunk, lat):
            np.save(latents_dir / f"{p.stem}.npy", z.transpose(2, 0, 1))  # NCHW file
            written += 1
    return written
