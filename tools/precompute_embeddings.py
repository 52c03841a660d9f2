#!/usr/bin/env python
"""Precompute frozen-tower embeddings for the training set.

The frozen CLAP-audio and CLIP-text towers are identical every epoch;
caching their outputs to ``emb/{id}.npz`` removes them from the training hot
path entirely (the same trick the reference plays with precomputed VAE
latents — reference data/dataset_latent.py). ``run_stage`` picks the cache up
automatically via ``EmbeddingFrontend``.

    python tools/precompute_embeddings.py --data-root data/audiocaps
"""

from __future__ import annotations

import argparse
import sys, os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def precompute(cfg, params, data_root: str, batch_size: int = 16,
               splits=("train", "val", "test")) -> int:
    import jax.numpy as jnp

    from clap2diffusion_tpu.data.latent_dataset import AudioCapsLatentDataset
    from clap2diffusion_tpu.train.trainer import EmbeddingFrontend

    frontend = EmbeddingFrontend(cfg, params)
    out_dir = os.path.join(data_root, "emb")
    os.makedirs(out_dir, exist_ok=True)
    written = 0
    for split in splits:
        try:
            ds = AudioCapsLatentDataset(
                data_root, split=split,
                audio_duration=cfg.data.duration_s,
                sample_rate=cfg.data.sample_rate,
                latent_hw=cfg.data.latent_shape[1],
            )
        except (ValueError, FileNotFoundError):
            continue
        for i in range(0, len(ds.samples), batch_size):
            chunk = ds.samples[i : i + batch_size]
            audio = np.stack([ds._load_audio(s["id"]) for s in chunk])
            captions = [s.get("caption", "") for s in chunk]
            clap = np.asarray(frontend.encode_audio(jnp.asarray(audio)))
            ids = frontend.tokenizer(captions)
            text_ctx, text_emb = frontend.encode_text(jnp.asarray(ids))
            # text_ctx is the bulk of the cache (77x768/sample) and is only
            # ever consumed cast to the bf16 compute dtype — store f16 to
            # halve disk + host->device transfer per training chunk
            text_ctx = np.asarray(text_ctx).astype(np.float16)
            text_emb = np.asarray(text_emb)
            for j, s in enumerate(chunk):
                np.savez(
                    os.path.join(out_dir, f"{s['id']}.npz"),
                    clap=clap[j], text_ctx=text_ctx[j], text_emb=text_emb[j],
                )
                written += 1
    return written


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-root", required=True)
    ap.add_argument("--config", default=None)
    ap.add_argument("--batch-size", type=int, default=16)
    args = ap.parse_args()

    from clap2diffusion_tpu.core.config import load_config
    from clap2diffusion_tpu.diffusion.pipeline import init_params

    cfg = load_config(args.config)
    params = init_params(cfg, seed=cfg.train.seed)
    n = precompute(cfg, params, args.data_root, args.batch_size)
    print(f"wrote {n} embedding files to {args.data_root}/emb")
    return 0


if __name__ == "__main__":
    sys.exit(main())
