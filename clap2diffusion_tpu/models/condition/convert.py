"""Reference-checkpoint converters for the conditioning stack.

Maps torch state dicts of the reference's own modules — the published
artifacts ``audio_projector_stage2.pth`` / ``hierarchical_v4_final.pth`` etc.
(reference README.md:76-81, scripts/inference.py:34-71) and any state dict
produced by reference models/hierarchical_audio_v4.py /
models/audio_adapter_v4.py — into this framework's parameter trees.

Numeric parity of converted modules is verified in
tests/test_reference_parity.py by running the actual reference torch code
(read-only import) against our Flax modules on the same random weights.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _np(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t,
                      dtype=np.float32)


def _dense(sd, p):
    out = {"kernel": _np(sd[p + ".weight"]).T}
    if p + ".bias" in sd:
        out["bias"] = _np(sd[p + ".bias"])
    return out


def _ln(sd, p):
    return {"scale": _np(sd[p + ".weight"]), "bias": _np(sd[p + ".bias"])}


def _cross_hierarchy(sd, p) -> Dict:
    """reference CrossHierarchyAttention (hierarchical_audio_v4.py:495-591)."""
    return {
        "input_proj": _dense(sd, p + ".input_proj"),
        "norm1": _ln(sd, p + ".norm1"),
        "qkv": _dense(sd, p + ".qkv"),
        "proj": _dense(sd, p + ".proj"),
        "norm2": _ln(sd, p + ".norm2"),
        "mlp_fc1": _dense(sd, p + ".mlp.0"),
        "mlp_fc2": _dense(sd, p + ".mlp.3"),
        "output_proj": _dense(sd, p + ".output_proj"),
    }


def _projector(sd, p, num_layers: int = 4) -> Dict:
    """reference AudioProjectionTransformer77 (:417-492). torch
    nn.MultiheadAttention packs q/k/v rows in in_proj_weight."""
    out: Dict = {
        "audio_proj": _dense(sd, p + ".audio_proj"),
        "queries": _np(sd[p + ".queries"]),
        "query_pos": _np(sd[p + ".query_pos"]),
        "out_proj": _dense(sd, p + ".out_proj"),
        "out_norm": _ln(sd, p + ".out_norm"),
        "clip_pos_embed": _np(sd[p + ".clip_pos_embed"]),
    }
    for i in range(num_layers):
        bp = f"{p}.blocks.{i}"
        in_w = _np(sd[bp + ".cross_attn.in_proj_weight"])  # [3E, E]
        in_b = _np(sd[bp + ".cross_attn.in_proj_bias"])  # [3E]
        e = in_w.shape[1]
        out[f"block_{i}"] = {
            "ln_q": _ln(sd, bp + ".ln_q"),
            "ln_kv": _ln(sd, bp + ".ln_kv"),
            "q_proj": {"kernel": in_w[:e].T, "bias": in_b[:e]},
            "k_proj": {"kernel": in_w[e : 2 * e].T, "bias": in_b[e : 2 * e]},
            "v_proj": {"kernel": in_w[2 * e :].T, "bias": in_b[2 * e :]},
            "out_proj": _dense(sd, bp + ".cross_attn.out_proj"),
            "ffn_norm": _ln(sd, bp + ".ffn.0"),
            "ffn_fc1": _dense(sd, bp + ".ffn.1"),
            "ffn_fc2": _dense(sd, bp + ".ffn.4"),
        }
    return out


def convert_hierarchical_encoder(sd, num_projector_layers: int = 4) -> Dict:
    """reference ImprovedHierarchicalAudioEncoder state dict
    (hierarchical_audio_v4.py:594-772) -> HierarchicalAudioEncoder params."""
    d = "decomposer"
    params: Dict = {
        "decomposer": {
            "mlp_fc1": _dense(sd, f"{d}.shared_mlp.0"),
            "mlp_norm": _ln(sd, f"{d}.shared_mlp.2"),
            "mlp_fc2": _dense(sd, f"{d}.shared_mlp.4"),
            "token_offsets": _np(sd[f"{d}.token_offsets"]),
            "level_anchors": _np(sd[f"{d}.level_anchors"]),
            "gate_fc1": _dense(sd, f"{d}.gating_head.0"),
            "gate_fc2": _dense(sd, f"{d}.gating_head.2"),
            "cross_hierarchy_attn": _cross_hierarchy(sd, f"{d}.cross_hierarchy_attn"),
            "norm": _ln(sd, f"{d}.norm"),
        },
        "router": {
            "routing_matrix": _np(sd["router.routing_matrix"]),
            "gate_early": _np(sd["router.level_gates.early"]),
            "gate_mid": _np(sd["router.level_gates.mid"]),
            "gate_late": _np(sd["router.level_gates.late"]),
        },
        "projector": _projector(sd, "projector", num_projector_layers),
    }
    if "adaptive_weights.weight_network.0.weight" in sd:
        a = "adaptive_weights.weight_network"
        params["adaptive_weights"] = {
            "fc1": _dense(sd, f"{a}.0"),
            "norm": _ln(sd, f"{a}.2"),
            "fc2": _dense(sd, f"{a}.3"),
        }
    return params


def convert_audio_adapter(sd, num_layers: int = 4) -> Dict:
    """reference AudioAdapter state dict (audio_adapter_v4.py:264-301) ->
    AudioAdapter params."""
    g = "token_generator"
    tg: Dict = {
        "audio_queries": _np(sd[f"{g}.audio_queries"]),
        "pos_embed": _np(sd[f"{g}.pos_embed"]),
        "kv_fc1": _dense(sd, f"{g}.audio_to_kv.0"),
        "kv_fc2": _dense(sd, f"{g}.audio_to_kv.3"),
        "output_proj": _dense(sd, f"{g}.output_proj.0"),
        "output_norm": _ln(sd, f"{g}.output_proj.1"),
    }
    for i in range(num_layers):
        tg[f"ln_{i}"] = _ln(sd, f"{g}.layer_norms.{i}")
        tg[f"self_attn_{i}"] = {
            "to_qkv": {"kernel": _np(sd[f"{g}.self_attn_layers.{i}.to_qkv.weight"]).T},
            "to_out": _dense(sd, f"{g}.self_attn_layers.{i}.to_out.0"),
        }
    return {"token_generator": tg}


def convert_legacy_v4(sd, num_projector_layers: int = 4) -> Dict:
    """reference HierarchicalAudioV4 (rigid) state dict
    (hierarchical_audio_v4.py:885-932) -> HierarchicalAudioV4 params."""
    d = "decomposer"

    def proj(name):
        return {
            f"{name}_fc1": _dense(sd, f"{d}.{name}_proj.0"),
            f"{name}_fc2": _dense(sd, f"{d}.{name}_proj.3"),
        }

    dec: Dict = {}
    for name in ("foreground", "background", "ambience"):
        dec.update(proj(name))
    dec["hierarchy_weights"] = _np(sd[f"{d}.hierarchy_weights"])
    dec["layer_norm"] = _ln(sd, f"{d}.layer_norm")
    dec["cross_hierarchy_attn"] = _cross_hierarchy(sd, f"{d}.cross_hierarchy_attn")
    return {
        "decomposer": dec,
        "projector": _projector(sd, "projector", num_projector_layers),
    }
