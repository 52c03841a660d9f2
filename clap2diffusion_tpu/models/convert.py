"""Torch -> Flax weight converters for the SD v1.5 stack.

Consumes diffusers-format state dicts (``unet/diffusion_pytorch_model.bin``,
``vae/...``, transformers CLIP text model) — the checkpoints the reference
trains against (reference configs/training_config.yaml:2,
``runwayml/stable-diffusion-v1-5``) — and emits parameter trees for
``UNet2DCondition`` / ``AutoencoderKL`` / ``CLIPTextEncoder``.

Conventions: Dense kernel = weight.T; conv [O,I,kh,kw] -> HWIO; our NHWC
modules consume them directly. CLIP conversion is parity-tested against a
randomly initialized transformers CLIPTextModel (tests/test_sd_convert.py);
UNet/VAE key maps are validated structurally against our init shapes.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from clap2diffusion_tpu.core.config import CLIPTextConfig, UNetConfig, VAEConfig


def _np(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t,
                      dtype=np.float32)


def _dense(sd, prefix):
    out = {"kernel": _np(sd[prefix + ".weight"]).T}
    if prefix + ".bias" in sd:
        out["bias"] = _np(sd[prefix + ".bias"])
    return out


def _conv(sd, prefix):
    return {
        "kernel": _np(sd[prefix + ".weight"]).transpose(2, 3, 1, 0),
        "bias": _np(sd[prefix + ".bias"]),
    }


def _gn(sd, prefix):
    return {"scale": _np(sd[prefix + ".weight"]), "bias": _np(sd[prefix + ".bias"])}


_ln = _gn


def _resnet(sd, p) -> Dict:
    out = {
        "norm1": _gn(sd, p + ".norm1"),
        "conv1": _conv(sd, p + ".conv1"),
        "time_emb_proj": _dense(sd, p + ".time_emb_proj"),
        "norm2": _gn(sd, p + ".norm2"),
        "conv2": _conv(sd, p + ".conv2"),
    }
    if p + ".conv_shortcut.weight" in sd:
        out["conv_shortcut"] = _conv(sd, p + ".conv_shortcut")
    return out


def _attn_qkvo(sd, p) -> Dict:
    return {
        "to_q": {"kernel": _np(sd[p + ".to_q.weight"]).T},
        "to_k": {"kernel": _np(sd[p + ".to_k.weight"]).T},
        "to_v": {"kernel": _np(sd[p + ".to_v.weight"]).T},
        "to_out": _dense(sd, p + ".to_out.0"),
    }


def _transformer2d(sd, p) -> Dict:
    tb = p + ".transformer_blocks.0"
    return {
        "norm": _gn(sd, p + ".norm"),
        "proj_in": _conv(sd, p + ".proj_in"),
        "proj_out": _conv(sd, p + ".proj_out"),
        "block_0": {
            "norm1": _ln(sd, tb + ".norm1"),
            "attn1": _attn_qkvo(sd, tb + ".attn1"),
            "norm2": _ln(sd, tb + ".norm2"),
            "attn2": _attn_qkvo(sd, tb + ".attn2"),
            "norm3": _ln(sd, tb + ".norm3"),
            "ff": {
                "proj_in": _dense(sd, tb + ".ff.net.0.proj"),
                "proj_out": _dense(sd, tb + ".ff.net.2"),
            },
        },
    }


def convert_sd_unet(sd, cfg: UNetConfig | None = None) -> Dict:
    """diffusers UNet2DConditionModel state dict -> UNet2DCondition params.

    Audio-injection branches have no torch counterpart and keep their init
    (gates start at sigmoid(0)=0.5, matching the reference's fresh
    AudioAttnProcessor modules)."""
    cfg = cfg or UNetConfig()
    n_blocks = len(cfg.block_out_channels)
    p: Dict = {
        "conv_in": _conv(sd, "conv_in"),
        "conv_out": _conv(sd, "conv_out"),
        "conv_norm_out": _gn(sd, "conv_norm_out"),
        "time_embedding": {
            "linear_1": _dense(sd, "time_embedding.linear_1"),
            "linear_2": _dense(sd, "time_embedding.linear_2"),
        },
        "mid_resnet_0": _resnet(sd, "mid_block.resnets.0"),
        "mid_resnet_1": _resnet(sd, "mid_block.resnets.1"),
        "mid_attn": _transformer2d(sd, "mid_block.attentions.0"),
    }
    for i in range(n_blocks):
        for j in range(cfg.layers_per_block):
            p[f"down_{i}_resnet_{j}"] = _resnet(sd, f"down_blocks.{i}.resnets.{j}")
            if cfg.cross_attn_blocks[i]:
                p[f"down_{i}_attn_{j}"] = _transformer2d(
                    sd, f"down_blocks.{i}.attentions.{j}"
                )
        if i < n_blocks - 1:
            p[f"down_{i}_downsample"] = {
                "conv": _conv(sd, f"down_blocks.{i}.downsamplers.0.conv")
            }
    for i in range(n_blocks):
        torch_block = i  # diffusers up_blocks are already reversed
        attn = cfg.cross_attn_blocks[n_blocks - 1 - i]
        for j in range(cfg.layers_per_block + 1):
            p[f"up_{i}_resnet_{j}"] = _resnet(sd, f"up_blocks.{torch_block}.resnets.{j}")
            if attn:
                p[f"up_{i}_attn_{j}"] = _transformer2d(
                    sd, f"up_blocks.{torch_block}.attentions.{j}"
                )
        if i < n_blocks - 1:
            p[f"up_{i}_upsample"] = {
                "conv": _conv(sd, f"up_blocks.{torch_block}.upsamplers.0.conv")
            }
    return p


def _vae_resnet(sd, p) -> Dict:
    out = {
        "norm1": _gn(sd, p + ".norm1"),
        "conv1": _conv(sd, p + ".conv1"),
        "norm2": _gn(sd, p + ".norm2"),
        "conv2": _conv(sd, p + ".conv2"),
    }
    if p + ".conv_shortcut.weight" in sd:
        out["conv_shortcut"] = _conv(sd, p + ".conv_shortcut")
    return out


def _vae_attn(sd, p) -> Dict:
    return {
        "group_norm": _gn(sd, p + ".group_norm"),
        "to_q": _dense(sd, p + ".to_q"),
        "to_k": _dense(sd, p + ".to_k"),
        "to_v": _dense(sd, p + ".to_v"),
        "to_out": _dense(sd, p + ".to_out.0"),
    }


def convert_sd_vae(sd, cfg: VAEConfig | None = None) -> Dict:
    cfg = cfg or VAEConfig()
    n = len(cfg.block_out_channels)
    enc: Dict = {
        "conv_in": _conv(sd, "encoder.conv_in"),
        "conv_out": _conv(sd, "encoder.conv_out"),
        "conv_norm_out": _gn(sd, "encoder.conv_norm_out"),
        "mid": {
            "resnet_0": _vae_resnet(sd, "encoder.mid_block.resnets.0"),
            "attn": _vae_attn(sd, "encoder.mid_block.attentions.0"),
            "resnet_1": _vae_resnet(sd, "encoder.mid_block.resnets.1"),
        },
    }
    for i in range(n):
        for j in range(cfg.layers_per_block):
            enc[f"down_{i}_resnet_{j}"] = _vae_resnet(
                sd, f"encoder.down_blocks.{i}.resnets.{j}"
            )
        if i < n - 1:
            enc[f"down_{i}_downsample"] = _conv(
                sd, f"encoder.down_blocks.{i}.downsamplers.0.conv"
            )
    dec: Dict = {
        "conv_in": _conv(sd, "decoder.conv_in"),
        "conv_out": _conv(sd, "decoder.conv_out"),
        "conv_norm_out": _gn(sd, "decoder.conv_norm_out"),
        "mid": {
            "resnet_0": _vae_resnet(sd, "decoder.mid_block.resnets.0"),
            "attn": _vae_attn(sd, "decoder.mid_block.attentions.0"),
            "resnet_1": _vae_resnet(sd, "decoder.mid_block.resnets.1"),
        },
    }
    for i in range(n):
        for j in range(cfg.layers_per_block + 1):
            dec[f"up_{i}_resnet_{j}"] = _vae_resnet(
                sd, f"decoder.up_blocks.{i}.resnets.{j}"
            )
        if i < n - 1:
            dec[f"up_{i}_upsample"] = _conv(
                sd, f"decoder.up_blocks.{i}.upsamplers.0.conv"
            )
    return {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": _conv(sd, "quant_conv"),
        "post_quant_conv": _conv(sd, "post_quant_conv"),
    }


def convert_clip_text(sd, cfg: CLIPTextConfig | None = None) -> Dict:
    """transformers CLIPTextModel state dict -> CLIPTextEncoder params."""
    cfg = cfg or CLIPTextConfig()
    t = "text_model." if any(k.startswith("text_model.") for k in sd) else ""
    p: Dict = {
        "token_embedding": {
            "embedding": _np(sd[t + "embeddings.token_embedding.weight"])
        },
        "position_embedding": _np(sd[t + "embeddings.position_embedding.weight"]),
        "final_layer_norm": _ln(sd, t + "final_layer_norm"),
    }
    for i in range(cfg.num_layers):
        lp = f"{t}encoder.layers.{i}"
        p[f"layer_{i}"] = {
            "layer_norm1": _ln(sd, lp + ".layer_norm1"),
            "layer_norm2": _ln(sd, lp + ".layer_norm2"),
            "self_attn": {
                "q_proj": _dense(sd, lp + ".self_attn.q_proj"),
                "k_proj": _dense(sd, lp + ".self_attn.k_proj"),
                "v_proj": _dense(sd, lp + ".self_attn.v_proj"),
                "out_proj": _dense(sd, lp + ".self_attn.out_proj"),
            },
            "fc1": _dense(sd, lp + ".mlp.fc1"),
            "fc2": _dense(sd, lp + ".mlp.fc2"),
        }
    return p


def convert_clip_full(sd, text_cfg: CLIPTextConfig | None = None):
    """Full CLIPModel state dict -> (text_params, text_projection_kernel,
    vision_params). Use for the real CLIPScore evaluation path."""
    from clap2diffusion_tpu.models.clip_vision import convert_clip_vision

    text = convert_clip_text(sd, text_cfg)
    tproj = None
    if "text_projection.weight" in sd:
        tproj = _np(sd["text_projection.weight"]).T
    vision = convert_clip_vision(sd)
    return text, tproj, vision
