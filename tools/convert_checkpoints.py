#!/usr/bin/env python
"""Convert published checkpoints -> one orbax pipeline checkpoint.

Glues every converter together: point it at local copies of the standard
artifacts and it emits a single ``save_pipeline`` checkpoint ready for
``load_pipeline`` / the CLI.

    python tools/convert_checkpoints.py \
        --clap /path/to/clap_model.(pt|bin|safetensors) \
        --sd-unet /path/unet/diffusion_pytorch_model.safetensors \
        --sd-vae /path/vae/diffusion_pytorch_model.safetensors \
        --clip-text /path/text_encoder/model.safetensors \
        --hierarchical /path/hierarchical_v4_final.pth \
        --adapter /path/audio_projector_stage2.pth \
        --out checkpoints/pipeline

Every slot accepts torch ``.pt/.bin/.pth`` (read via torch) or
``.safetensors`` (read torch-free via utils/safetensors_io — the format
diffusers/transformers publish by default today).

Any subset may be given; missing towers keep random init (and are reported).
The reference's published .pth artifacts (reference README.md:76-81) feed
the --hierarchical/--adapter slots.
"""

from __future__ import annotations

import argparse
import sys, os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_sd(path: str):
    if path.endswith(".safetensors"):
        # torch-free: diffusers/transformers ship .safetensors by default
        from clap2diffusion_tpu.utils.safetensors_io import load_safetensors

        return load_safetensors(path)
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return obj


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--clap", help="HF ClapModel state dict (.pt/.bin)")
    ap.add_argument("--sd-unet", help="diffusers UNet state dict")
    ap.add_argument("--sd-vae", help="diffusers VAE state dict")
    ap.add_argument("--clip-text", help="transformers CLIPTextModel state dict")
    ap.add_argument("--hierarchical",
                    help="reference hierarchical encoder .pth (soft V4)")
    ap.add_argument("--adapter", help="reference AudioAdapter .pth")
    ap.add_argument("--clip-vision",
                    help="transformers CLIPVisionModelWithProjection state "
                         "dict (activates CLIPScore + frechet_clip_vision)")
    ap.add_argument("--inception",
                    help="torchvision inception_v3 state dict (activates "
                         "standard FID + real Inception Score)")
    ap.add_argument("--out", required=True, help="output orbax checkpoint dir")
    ap.add_argument("--config", default=None)
    args = ap.parse_args()

    from clap2diffusion_tpu.core.config import load_config
    from clap2diffusion_tpu.diffusion.pipeline import init_params, save_pipeline

    cfg = load_config(args.config)
    params = init_params(cfg, seed=0)
    converted = []

    if args.clap:
        from clap2diffusion_tpu.models.clap.convert import (
            convert_clap_audio,
            convert_clap_text,
        )

        sd = load_sd(args.clap)
        params["clap_audio"] = convert_clap_audio(sd, cfg.clap.audio)
        converted.append("clap_audio")
        # the full HF ClapModel dict also carries the text tower — convert
        # it too so the evaluator's audio_text_alignment is checkpoint-
        # faithful (eval/evaluate.py stamps clap_text_random_init
        # otherwise). Audio-only HTSAT dumps lack these keys; keep
        # accepting them (audio tower converts, text stays random-init).
        if ("text_model.embeddings.word_embeddings.weight" in sd
                or "embeddings.word_embeddings.weight" in sd):
            params["clap_text"] = convert_clap_text(sd, cfg.clap.text)
            converted.append("clap_text")
        else:
            print("note: --clap dict has no text tower keys; clap_text "
                  "left at random init (audio_text_alignment will be "
                  "stamped clap_text_random_init)")
    if args.sd_unet:
        from clap2diffusion_tpu.models.convert import convert_sd_unet

        unet = convert_sd_unet(load_sd(args.sd_unet), cfg.diffusion.unet)
        # keep the (randomly initialized) audio-injection branches
        for k, v in params["unet"].items():
            if k.startswith("audio_inject"):
                unet[k] = v
        params["unet"] = unet
        converted.append("unet")
    if args.sd_vae:
        from clap2diffusion_tpu.models.convert import convert_sd_vae

        params["vae"] = convert_sd_vae(load_sd(args.sd_vae), cfg.diffusion.vae)
        converted.append("vae")
    if args.clip_text:
        from clap2diffusion_tpu.models.convert import convert_clip_text

        params["clip_text"] = convert_clip_text(
            load_sd(args.clip_text), cfg.diffusion.clip_text
        )
        converted.append("clip_text")
    if args.hierarchical:
        from clap2diffusion_tpu.models.condition.convert import (
            convert_hierarchical_encoder,
        )

        sd = load_sd(args.hierarchical)
        # the reference nests model weights under *_state_dict keys
        # (reference train_stage2.py:182-189)
        for key in ("hierarchical_state_dict", "model_state_dict", "state_dict"):
            if isinstance(sd, dict) and key in sd:
                sd = sd[key]
                break
        params["hierarchical"] = convert_hierarchical_encoder(sd)
        converted.append("hierarchical")
    if args.adapter:
        from clap2diffusion_tpu.models.condition.convert import convert_audio_adapter

        sd = load_sd(args.adapter)
        for key in ("adapter_state_dict", "model_state_dict", "state_dict"):
            if isinstance(sd, dict) and key in sd:
                sd = sd[key]
                break
        params["adapter"] = convert_audio_adapter(sd)
        converted.append("adapter")

    if args.clip_vision:
        from clap2diffusion_tpu.models.clip_vision import convert_clip_vision

        sd = load_sd(args.clip_vision)
        params["clip_vision"] = convert_clip_vision(sd, cfg.diffusion.clip_vision)
        converted.append("clip_vision")
        # a full CLIPModel dict also carries the text projection CLIPScore
        # needs (models/clip_vision.py::clip_text_features)
        if "text_projection.weight" in sd:
            import numpy as np

            params["clip_text_projection"] = np.asarray(
                sd["text_projection.weight"].detach().cpu().numpy()
                if hasattr(sd["text_projection.weight"], "detach")
                else sd["text_projection.weight"]
            ).T.astype(np.float32)
            converted.append("clip_text_projection")
    if args.inception:
        from clap2diffusion_tpu.models.inception_v3 import convert_inception_v3

        params["inception_v3"] = convert_inception_v3(load_sd(args.inception))
        converted.append("inception_v3")

    path = save_pipeline(args.out, params)
    missing = sorted(
        {"clap_audio", "clip_text", "hierarchical", "adapter", "unet", "vae"}
        - set(converted)
    )
    print(f"converted: {converted or 'none'}")
    if missing:
        print(f"random init kept for: {missing}")
    print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
