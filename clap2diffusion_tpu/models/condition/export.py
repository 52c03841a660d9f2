"""Export trained conditioning weights back to the reference's formats.

The exact inverse of ``models/condition/convert.py``: maps this framework's
parameter trees onto torch-style state-dict names matching the reference's
own modules (reference models/hierarchical_audio_v4.py,
models/audio_adapter_v4.py, models/audio_attention_processor.py), so
weights trained here can be loaded by the reference — or any torch
reimplementation of it — and so the published-artifact naming
(reference README.md:76-81) round-trips both ways.

Output is a flat ``{name: np.ndarray(float32)}`` dict; write it with
``utils/safetensors_io.save_safetensors`` (torch-free) or ``torch.save``
(torch is import-gated at the call site). Round-trip identity — export
then ``convert.convert_*`` reproduces the original tree bit-exactly — is
pinned by tests/test_export.py.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _t(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float32)


def _dense_out(sd: Dict, p: str, d: Dict) -> None:
    sd[p + ".weight"] = _t(d["kernel"]).T
    if "bias" in d:
        sd[p + ".bias"] = _t(d["bias"])


def _ln_out(sd: Dict, p: str, d: Dict) -> None:
    sd[p + ".weight"] = _t(d["scale"])
    sd[p + ".bias"] = _t(d["bias"])


def _cross_hierarchy_out(sd: Dict, p: str, d: Dict) -> None:
    """Inverse of convert._cross_hierarchy (reference
    hierarchical_audio_v4.py:495-591 module layout)."""
    _dense_out(sd, p + ".input_proj", d["input_proj"])
    _ln_out(sd, p + ".norm1", d["norm1"])
    _dense_out(sd, p + ".qkv", d["qkv"])
    _dense_out(sd, p + ".proj", d["proj"])
    _ln_out(sd, p + ".norm2", d["norm2"])
    _dense_out(sd, p + ".mlp.0", d["mlp_fc1"])
    _dense_out(sd, p + ".mlp.3", d["mlp_fc2"])
    _dense_out(sd, p + ".output_proj", d["output_proj"])


def _projector_out(sd: Dict, p: str, d: Dict) -> None:
    """Inverse of convert._projector: re-packs per-block q/k/v kernels into
    torch nn.MultiheadAttention's row-stacked in_proj_weight."""
    _dense_out(sd, p + ".audio_proj", d["audio_proj"])
    sd[p + ".queries"] = _t(d["queries"])
    sd[p + ".query_pos"] = _t(d["query_pos"])
    _dense_out(sd, p + ".out_proj", d["out_proj"])
    _ln_out(sd, p + ".out_norm", d["out_norm"])
    sd[p + ".clip_pos_embed"] = _t(d["clip_pos_embed"])
    for i in range(sum(1 for k in d if k.startswith("block_"))):
        b = d[f"block_{i}"]
        bp = f"{p}.blocks.{i}"
        _ln_out(sd, bp + ".ln_q", b["ln_q"])
        _ln_out(sd, bp + ".ln_kv", b["ln_kv"])
        sd[bp + ".cross_attn.in_proj_weight"] = np.concatenate(
            [_t(b[k]["kernel"]).T for k in ("q_proj", "k_proj", "v_proj")]
        )
        sd[bp + ".cross_attn.in_proj_bias"] = np.concatenate(
            [_t(b[k]["bias"]) for k in ("q_proj", "k_proj", "v_proj")]
        )
        _dense_out(sd, bp + ".cross_attn.out_proj", b["out_proj"])
        _ln_out(sd, bp + ".ffn.0", b["ffn_norm"])
        _dense_out(sd, bp + ".ffn.1", b["ffn_fc1"])
        _dense_out(sd, bp + ".ffn.4", b["ffn_fc2"])


def export_hierarchical_encoder(params: Dict) -> Dict[str, np.ndarray]:
    """HierarchicalAudioEncoder params -> reference
    ImprovedHierarchicalAudioEncoder state dict
    (hierarchical_audio_v4.py:594-772)."""
    sd: Dict[str, np.ndarray] = {}
    dec = params["decomposer"]
    _dense_out(sd, "decomposer.shared_mlp.0", dec["mlp_fc1"])
    _ln_out(sd, "decomposer.shared_mlp.2", dec["mlp_norm"])
    _dense_out(sd, "decomposer.shared_mlp.4", dec["mlp_fc2"])
    sd["decomposer.token_offsets"] = _t(dec["token_offsets"])
    sd["decomposer.level_anchors"] = _t(dec["level_anchors"])
    _dense_out(sd, "decomposer.gating_head.0", dec["gate_fc1"])
    _dense_out(sd, "decomposer.gating_head.2", dec["gate_fc2"])
    _cross_hierarchy_out(sd, "decomposer.cross_hierarchy_attn",
                         dec["cross_hierarchy_attn"])
    _ln_out(sd, "decomposer.norm", dec["norm"])
    r = params["router"]
    sd["router.routing_matrix"] = _t(r["routing_matrix"])
    sd["router.level_gates.early"] = _t(r["gate_early"])
    sd["router.level_gates.mid"] = _t(r["gate_mid"])
    sd["router.level_gates.late"] = _t(r["gate_late"])
    _projector_out(sd, "projector", params["projector"])
    if "adaptive_weights" in params:
        a = params["adaptive_weights"]
        _dense_out(sd, "adaptive_weights.weight_network.0", a["fc1"])
        _ln_out(sd, "adaptive_weights.weight_network.2", a["norm"])
        _dense_out(sd, "adaptive_weights.weight_network.3", a["fc2"])
    return sd


def export_audio_adapter(params: Dict) -> Dict[str, np.ndarray]:
    """AudioAdapter params -> reference AudioAdapter state dict
    (audio_adapter_v4.py:264-301)."""
    sd: Dict[str, np.ndarray] = {}
    tg = params["token_generator"]
    g = "token_generator"
    sd[f"{g}.audio_queries"] = _t(tg["audio_queries"])
    sd[f"{g}.pos_embed"] = _t(tg["pos_embed"])
    _dense_out(sd, f"{g}.audio_to_kv.0", tg["kv_fc1"])
    _dense_out(sd, f"{g}.audio_to_kv.3", tg["kv_fc2"])
    _dense_out(sd, f"{g}.output_proj.0", tg["output_proj"])
    _ln_out(sd, f"{g}.output_proj.1", tg["output_norm"])
    for i in range(sum(1 for k in tg if k.startswith("self_attn_"))):
        _ln_out(sd, f"{g}.layer_norms.{i}", tg[f"ln_{i}"])
        sa = tg[f"self_attn_{i}"]
        sd[f"{g}.self_attn_layers.{i}.to_qkv.weight"] = _t(
            sa["to_qkv"]["kernel"]
        ).T
        _dense_out(sd, f"{g}.self_attn_layers.{i}.to_out.0", sa["to_out"])
    return sd


def export_legacy_v4(params: Dict) -> Dict[str, np.ndarray]:
    """HierarchicalAudioV4 (rigid) params -> reference state dict
    (hierarchical_audio_v4.py:885-932)."""
    sd: Dict[str, np.ndarray] = {}
    dec = params["decomposer"]
    for name in ("foreground", "background", "ambience"):
        _dense_out(sd, f"decomposer.{name}_proj.0", dec[f"{name}_fc1"])
        _dense_out(sd, f"decomposer.{name}_proj.3", dec[f"{name}_fc2"])
    sd["decomposer.hierarchy_weights"] = _t(dec["hierarchy_weights"])
    _ln_out(sd, "decomposer.layer_norm", dec["layer_norm"])
    _cross_hierarchy_out(sd, "decomposer.cross_hierarchy_attn",
                         dec["cross_hierarchy_attn"])
    _projector_out(sd, "projector", params["projector"])
    return sd


def export_injection_processors(unet_params: Dict) -> Dict[str, np.ndarray]:
    """Per-level AudioInjection params -> reference AudioAttnProcessor
    state dicts keyed by level (audio_attention_processor.py:34-41:
    audio_proj = Sequential(Linear, GELU, Dropout, Linear), alpha)."""
    sd: Dict[str, np.ndarray] = {}
    for lvl in ("early", "mid", "late"):
        mod = unet_params.get(f"audio_inject_{lvl}")
        if mod is None:
            continue
        _dense_out(sd, f"{lvl}.audio_proj.0", mod["proj_fc1"])
        _dense_out(sd, f"{lvl}.audio_proj.3", mod["proj_fc2"])
        if "alpha" in mod:  # 'add' (FiLM) mode only
            sd[f"{lvl}.alpha"] = _t(mod["alpha"])
    return sd
