"""Torch -> Flax weight converters for the CLAP towers.

Consumes an HF ``ClapModel`` state_dict (e.g. laion/clap-htsat-unfused, the
reference's default checkpoint — reference models/audio_encoder.py:23) and
emits parameter pytrees for ``ClapAudioTower`` / ``ClapTextTower``.
Conventions: flax Dense kernel = torch weight.T; conv [O,I,kh,kw] -> HWIO.

Tested by random-init parity in tests/test_clap_parity.py (no downloads:
a randomly initialized torch ClapModel at full geometry is converted and
outputs compared to tolerance).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from clap2diffusion_tpu.core.config import CLAPTextConfig, HTSATConfig


def _np(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t,
                      dtype=np.float32)


def _dense(sd, prefix: str) -> Dict[str, np.ndarray]:
    out = {"kernel": _np(sd[prefix + ".weight"]).T}
    if prefix + ".bias" in sd:
        out["bias"] = _np(sd[prefix + ".bias"])
    return out


def _ln(sd, prefix: str) -> Dict[str, np.ndarray]:
    return {"scale": _np(sd[prefix + ".weight"]), "bias": _np(sd[prefix + ".bias"])}


def convert_clap_audio(sd, cfg: HTSATConfig | None = None) -> Dict:
    """HF ClapModel (or ClapAudioModelWithProjection) state_dict -> params."""
    cfg = cfg or HTSATConfig()
    # tolerate either full-model or audio-model prefixes
    if any(k.startswith("audio_model.") for k in sd):
        a = "audio_model.audio_encoder."
        proj = "audio_projection."
    else:
        a = "audio_encoder."
        proj = "audio_projection."

    enc: Dict = {
        "bn_scale": _np(sd[a + "batch_norm.weight"]),
        "bn_bias": _np(sd[a + "batch_norm.bias"]),
        "bn_mean": _np(sd[a + "batch_norm.running_mean"]),
        "bn_var": _np(sd[a + "batch_norm.running_var"]),
        "patch_embed": {
            "kernel": _np(sd[a + "patch_embed.proj.weight"]).transpose(2, 3, 1, 0),
            "bias": _np(sd[a + "patch_embed.proj.bias"]),
        },
        "patch_norm": _ln(sd, a + "patch_embed.norm"),
        "norm": _ln(sd, a + "norm"),
    }
    for s, depth in enumerate(cfg.depths):
        for i in range(depth):
            blk = f"{a}layers.{s}.blocks.{i}."
            enc[f"stage_{s}_layer_{i}"] = {
                "layernorm_before": _ln(sd, blk + "layernorm_before"),
                "layernorm_after": _ln(sd, blk + "layernorm_after"),
                "attention": {
                    "query": _dense(sd, blk + "attention.self.query"),
                    "key": _dense(sd, blk + "attention.self.key"),
                    "value": _dense(sd, blk + "attention.self.value"),
                    "output": _dense(sd, blk + "attention.output.dense"),
                    "relative_position_bias_table": _np(
                        sd[blk + "attention.self.relative_position_bias_table"]
                    ),
                },
                "intermediate": _dense(sd, blk + "intermediate.dense"),
                "mlp_output": _dense(sd, blk + "output.dense"),
            }
        if s < len(cfg.depths) - 1:
            ds = f"{a}layers.{s}.downsample."
            enc[f"stage_{s}_downsample"] = {
                "norm": _ln(sd, ds + "norm"),
                "reduction": {"kernel": _np(sd[ds + "reduction.weight"]).T},
            }

    return {
        "encoder": enc,
        "projection_1": _dense(sd, proj + "linear1"),
        "projection_2": _dense(sd, proj + "linear2"),
    }


def convert_clap_text(sd, cfg: CLAPTextConfig | None = None) -> Dict:
    cfg = cfg or CLAPTextConfig()
    t = "text_model." if any(k.startswith("text_model.") for k in sd) else ""
    emb = t + "embeddings."
    params: Dict = {
        "word_embeddings": {"embedding": _np(sd[emb + "word_embeddings.weight"])},
        "position_embeddings": {
            "embedding": _np(sd[emb + "position_embeddings.weight"])
        },
        "token_type_embeddings": {
            "embedding": _np(sd[emb + "token_type_embeddings.weight"])
        },
        "embed_norm": _ln(sd, emb + "LayerNorm"),
        "pooler": _dense(sd, t + "pooler.dense"),
        "projection_1": _dense(sd, "text_projection.linear1"),
        "projection_2": _dense(sd, "text_projection.linear2"),
    }
    for i in range(cfg.num_layers):
        lp = f"{t}encoder.layer.{i}."
        params[f"layer_{i}"] = {
            "q": _dense(sd, lp + "attention.self.query"),
            "k": _dense(sd, lp + "attention.self.key"),
            "v": _dense(sd, lp + "attention.self.value"),
            "attn_out": _dense(sd, lp + "attention.output.dense"),
            "attn_norm": _ln(sd, lp + "attention.output.LayerNorm"),
            "intermediate": _dense(sd, lp + "intermediate.dense"),
            "out": _dense(sd, lp + "output.dense"),
            "out_norm": _ln(sd, lp + "output.LayerNorm"),
        }
    return params


def convert_clap(sd) -> Tuple[Dict, Dict, Dict]:
    """Full ClapModel state_dict -> (audio_params, text_params, extras)."""
    extras = {}
    for k in ("logit_scale_a", "logit_scale_t"):
        if k in sd:
            extras[k] = float(_np(sd[k]))
    return convert_clap_audio(sd), convert_clap_text(sd), extras
