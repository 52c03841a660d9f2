"""Configuration system: one authoritative YAML-backed dataclass tree.

The reference ships ``configs/training_config.yaml`` but no script ever reads
it; each ``main()`` hardcodes its own dict (reference scripts/train_stage1.py:88-94,
train_stage2.py:214-226, train_stage3.py:284-295). Here the YAML *is* the
source of truth and CLI dot-path overrides (``train.stage2.lr=1e-4``) apply on
top.

Defaults mirror the reference's behavioral contract
(reference configs/training_config.yaml, SURVEY.md section 2.9).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple


# ---------------------------------------------------------------------------
# Audio / CLAP
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class AudioFrontendConfig:
    """Waveform -> log-mel frontend, matching HF CLAP's feature extractor.

    (reference models/audio_encoder.py:25-26 uses 48 kHz / 10 s;
    HF ClapFeatureExtractor: 64 mels, hop 480, fft 1024, fmin 0, fmax 14000.)
    """

    sample_rate: int = 48_000
    duration_s: float = 10.0
    n_fft: int = 1024
    hop_length: int = 480
    num_mel_bins: int = 64
    f_min: float = 0.0
    f_max: float = 14_000.0
    # HTSAT consumes a fixed 1024-frame spectrogram image.
    max_frames: int = 1024

    @property
    def num_samples(self) -> int:
        return int(self.sample_rate * self.duration_s)


@dataclass(frozen=True)
class HTSATConfig:
    """HTSAT-tiny Swin audio tower (laion/clap-htsat-unfused geometry).

    Matches transformers ClapAudioConfig defaults so HF checkpoints convert
    one-to-one (verified against transformers 4.57 ClapConfig()).
    """

    spec_size: int = 256
    patch_size: int = 4
    patch_stride: Tuple[int, int] = (4, 4)
    patch_embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (4, 8, 16, 32)
    window_size: int = 8
    mlp_ratio: float = 4.0
    num_mel_bins: int = 64
    hidden_size: int = 768  # patch_embed_dim * 2**(len(depths)-1)
    projection_dim: int = 512
    layer_norm_eps: float = 1e-5
    qkv_bias: bool = True


@dataclass(frozen=True)
class CLAPTextConfig:
    """RoBERTa-style CLAP text tower (laion/clap-htsat-unfused geometry)."""

    vocab_size: int = 50_265
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 514
    type_vocab_size: int = 1
    layer_norm_eps: float = 1e-12
    projection_dim: int = 512
    pad_token_id: int = 1


@dataclass(frozen=True)
class CLAPConfig:
    frontend: AudioFrontendConfig = field(default_factory=AudioFrontendConfig)
    audio: HTSATConfig = field(default_factory=HTSATConfig)
    text: CLAPTextConfig = field(default_factory=CLAPTextConfig)
    embed_dim: int = 512  # (reference models/audio_encoder.py:65)


# ---------------------------------------------------------------------------
# Conditioning stack (the core IP of the reference)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class ConditionConfig:
    """Hierarchical decomposer + router + projector + adapter hyperparams.

    All defaults are the reference's magic numbers (SURVEY.md section 2.9):
    10 hierarchy tokens over 3 levels with a soft 5-3-2 prior
    (reference models/hierarchical_audio_v4.py:96-97,134), 77 output tokens
    (:443), 16 adapter tokens (reference models/audio_adapter_v4.py:25).
    """

    clap_dim: int = 512
    token_dim: int = 768
    num_tokens: int = 10
    num_levels: int = 3
    num_output_tokens: int = 77
    num_adapter_tokens: int = 16
    # Soft prior over levels {foreground, background, ambience}
    # (reference models/hierarchical_audio_v4.py:134)
    level_prior: Tuple[float, float, float] = (0.5, 0.3, 0.2)
    # Cosine-similarity scale in the soft assignment
    # (reference models/hierarchical_audio_v4.py:173)
    similarity_scale: float = 10.0
    # Cross-hierarchy attention bottleneck (reference :515-516)
    hierarchy_bottleneck: int = 192
    hierarchy_heads: int = 4
    # Perceiver 10->77 projector (reference :417-492)
    projector_bottleneck: int = 256
    projector_heads: int = 8
    projector_layers: int = 4
    # 16-token adapter (reference models/audio_adapter_v4.py:13-165)
    adapter_kv_hidden: int = 256
    adapter_self_attn_layers: int = 4
    adapter_heads: int = 8
    # Gate initial values (reference audio_adapter_v4.py:181,
    # audio_attention_processor.py:41, hierarchical_audio_v4.py:310-314)
    cross_attn_gate_init: float = -5.0
    processor_alpha_init: float = 0.0
    router_gate_init: float = 0.0
    # Norm-60 token rescale (reference configs/training_config.yaml:50)
    audio_norm_target: float = 60.0
    # Temperature annealing (reference models/hierarchical_audio_v4.py:29-33)
    temperature_initial: float = 2.0
    temperature_final: float = 0.5
    temperature_floor: float = 0.1
    temperature_warmup_steps: int = 200
    temperature_anneal_steps: int = 5_000
    temperature_schedule: str = "cosine"  # or "linear"


# ---------------------------------------------------------------------------
# Diffusion (SD v1.5 geometry)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class UNetConfig:
    """Stable Diffusion v1.5 UNet geometry.

    down: CrossAttn(320) CrossAttn(640) CrossAttn(1280) Plain(1280); mirrored
    up path; mid has one attention block. Audio cross-attention is a built-in
    gated branch per level (early/mid/late) rather than a patched-in processor
    (cf. reference models/audio_attention_processor.py:175-191 level map).
    """

    in_channels: int = 4
    out_channels: int = 4
    sample_size: int = 64
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    num_attention_heads: int = 8
    cross_attention_dim: int = 768
    norm_num_groups: int = 32
    # Which down blocks carry cross-attention (SD1.5: first three).
    cross_attn_blocks: Tuple[bool, ...] = (True, True, True, False)
    # early/mid/late audio level per block index, reference
    # audio_attention_processor.py:175-191:
    #   down 0-1 -> early; down 2-3 + up 0-1 -> late; mid + up 2-3 -> mid
    down_block_levels: Tuple[str, ...] = ("early", "early", "late", "late")
    up_block_levels: Tuple[str, ...] = ("late", "late", "mid", "mid")
    mid_block_level: str = "mid"
    audio_inject: bool = True
    # audio injection semantics (reference audio_attention_processor.py:92-109)
    injection_mode: str = "add"  # 'add' (FiLM) | 'concat' (KV append, <=4 tok)
    injection_bottleneck: int = 64
    injection_max_concat_tokens: int = 4
    flash_attention: bool = True
    # rematerialize transformer/resnet blocks under autodiff (trades FLOPs
    # for HBM; jax.checkpoint) — used by the stage-2/3 training configs
    remat: bool = False


@dataclass(frozen=True)
class VAEConfig:
    """SD v1.5 AutoencoderKL geometry."""

    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = 0.18215


@dataclass(frozen=True)
class CLIPTextConfig:
    """OpenAI CLIP ViT-L/14 text encoder (SD v1.5 conditioning)."""

    vocab_size: int = 49_408
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_length: int = 77
    layer_norm_eps: float = 1e-5


@dataclass(frozen=True)
class CLIPVisionConfig:
    """OpenAI CLIP ViT-L/14 vision encoder (CLIPScore's image side)."""

    image_size: int = 224
    patch_size: int = 14
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    projection_dim: int = 768
    layer_norm_eps: float = 1e-5


@dataclass(frozen=True)
class SchedulerConfig:
    """DDIM noise schedule, SD v1.5 defaults (scaled-linear betas)."""

    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "scaled_linear"
    prediction_type: str = "epsilon"
    # Inference defaults (reference scripts/inference.py:107-108)
    num_inference_steps: int = 50
    guidance_scale: float = 7.5
    # "ddim" (reference contract) or "dpmpp_2m" (second-order multistep:
    # comparable quality at ~20 steps, i.e. ~2.5x lower latency; an
    # addition beyond the reference surface, diffusion/ddim.py)
    sampler: str = "ddim"


@dataclass(frozen=True)
class DiffusionConfig:
    unet: UNetConfig = field(default_factory=UNetConfig)
    vae: VAEConfig = field(default_factory=VAEConfig)
    clip_text: CLIPTextConfig = field(default_factory=CLIPTextConfig)
    # CLIPScore / frechet_clip_vision feature extractor (eval only)
    clip_vision: CLIPVisionConfig = field(default_factory=CLIPVisionConfig)
    scheduler: SchedulerConfig = field(default_factory=SchedulerConfig)
    image_size: int = 512


# ---------------------------------------------------------------------------
# Data
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class DataConfig:
    data_root: str = "data/audiocaps"
    latents_dir: str = "latents"
    audio_dir: str = "audio"
    metadata_file: str = "metadata_unified.json"
    batch_size: int = 8
    num_workers: int = 4
    prefetch: int = 2
    # standardize on CLAP's 48 kHz (reference mixes 44.1k/48k; SURVEY 2.10.7)
    sample_rate: int = 48_000
    duration_s: float = 10.0
    latent_shape: Tuple[int, int, int] = (4, 64, 64)
    pairing: str = "matching"  # 'matching' | 'shifted' | 'random' | 'balanced'
    seed: int = 42


# ---------------------------------------------------------------------------
# Training stages
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class StageConfig:
    steps: int = 1000
    lr: float = 1e-4
    batch_size: int = 8
    grad_accum: int = 1
    weight_decay: float = 0.01
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    adam_eps: float = 1e-8
    grad_clip: float = 1.0
    warmup_steps: int = 100
    lr_schedule: str = "warmup_cosine"
    min_lr: float = 0.0
    ema_decay: float = 0.9999
    use_ema: bool = False
    log_every: int = 50
    save_every: int = 500
    # periodic validation: every eval_every steps, the stage loss is
    # computed on eval_batches fixed val-split batches and logged with a
    # val_ prefix (0 disables). Honors the reference YAML's eval_interval
    # (reference configs/training_config.yaml:70), which no reference
    # script actually reads.
    eval_every: int = 500
    eval_batches: int = 2
    # steps executed inside ONE jit call (lax.scan over stacked batches);
    # >1 amortizes per-dispatch latency — essential on remote-tunneled TPUs
    steps_per_call: int = 1
    # rank > 0 adds REAL low-rank adapters on the UNet cross-attention
    # kernels in stage 2 (train/lora.py) — the reference's "setup_lora
    # _training" is LoRA in name only (reference train_stage2.py:67-91)
    lora_rank: int = 0
    lora_alpha: float = 16.0
    loss_weights: Dict[str, float] = field(default_factory=dict)


# use_ema defaults ON (decay 0.9999, reference utils/training_utils.py:16)
# so a default-config train -> `infer --ema` works with no extra flags;
# steps_per_call>1 chains steps in one jit dispatch (lax.scan), hiding the
# per-dispatch RPC latency of remote-tunneled TPUs (BENCH_NOTES.md).


def _default_stage1() -> StageConfig:
    # (reference configs/training_config.yaml:11-18, train_stage1.py:87-94)
    return StageConfig(
        steps=3000, lr=1e-4, batch_size=8, grad_accum=2, grad_clip=1.0,
        use_ema=True, steps_per_call=50,
        loss_weights={"mse": 1.0, "infonce": 1.0},
    )


def _default_stage2() -> StageConfig:
    # (reference configs/training_config.yaml:20-29, train_stage2.py:213-226)
    return StageConfig(
        steps=2000, lr=5e-5, batch_size=4, grad_accum=4, grad_clip=1.0,
        use_ema=True, steps_per_call=25,
        loss_weights={"diffusion": 1.0, "orthogonality": 0.1, "entropy": 0.01},
    )


def _default_stage3() -> StageConfig:
    # (reference configs/training_config.yaml:31-40, train_stage3.py:284-295)
    return StageConfig(
        steps=1000, lr=1e-5, batch_size=2, grad_accum=8, grad_clip=0.5,
        lr_schedule="cosine", min_lr=1e-6,
        use_ema=True, steps_per_call=25,
        loss_weights={"diffusion": 2.0, "consistency": 0.5, "alignment": 0.3},
    )


@dataclass(frozen=True)
class TrainConfig:
    stage1: StageConfig = field(default_factory=_default_stage1)
    stage2: StageConfig = field(default_factory=_default_stage2)
    stage3: StageConfig = field(default_factory=_default_stage3)
    infonce_temperature: float = 0.07  # (reference train_stage1.py:53)
    checkpoint_dir: str = "checkpoints"
    log_dir: str = "logs"
    mesh_shape: Dict[str, int] = field(default_factory=lambda: {"data": -1})
    # tensor-parallel axis size for the training mesh (1 = pure DP); wide
    # kernels shard over it per parallel.sharding.param_spec
    model_parallel: int = 1
    seed: int = 42
    param_dtype: str = "float32"
    compute_dtype: str = "bfloat16"


# ---------------------------------------------------------------------------
# Top-level
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Config:
    clap: CLAPConfig = field(default_factory=CLAPConfig)
    condition: ConditionConfig = field(default_factory=ConditionConfig)
    diffusion: DiffusionConfig = field(default_factory=DiffusionConfig)
    data: DataConfig = field(default_factory=DataConfig)
    train: TrainConfig = field(default_factory=TrainConfig)


# ---------------------------------------------------------------------------
# YAML loading + dot-path overrides
# ---------------------------------------------------------------------------


def _from_dict(cls, d: Dict[str, Any]):
    """Recursively build a (frozen) dataclass from a plain dict."""
    if not dataclasses.is_dataclass(cls):
        return d
    kwargs = {}
    fields = {f.name: f for f in dataclasses.fields(cls)}
    for key, value in d.items():
        if key not in fields:
            raise KeyError(f"unknown config key {key!r} for {cls.__name__}")
        f = fields[key]
        ftype = f.type
        if isinstance(value, dict) and dataclasses.is_dataclass(_resolve(ftype)):
            kwargs[key] = _from_dict(_resolve(ftype), value)
        elif isinstance(value, list):
            kwargs[key] = tuple(value) if _is_tuple(ftype) else value
        else:
            kwargs[key] = value
    return cls(**kwargs)


_TYPE_REGISTRY = {
    c.__name__: c
    for c in (
        AudioFrontendConfig, HTSATConfig, CLAPTextConfig, CLAPConfig,
        ConditionConfig, UNetConfig, VAEConfig, CLIPTextConfig, CLIPVisionConfig,
        SchedulerConfig, DiffusionConfig, DataConfig, StageConfig,
        TrainConfig, Config,
    )
}


def _resolve(ftype):
    if isinstance(ftype, str):
        return _TYPE_REGISTRY.get(ftype, ftype)
    return ftype


def _is_tuple(ftype) -> bool:
    name = ftype if isinstance(ftype, str) else str(ftype)
    return "Tuple" in name or "tuple" in name


def to_dict(cfg) -> Dict[str, Any]:
    return dataclasses.asdict(cfg)


def _parse_scalar(s: str) -> Any:
    import yaml

    v = yaml.safe_load(s)
    if isinstance(v, str):
        # YAML 1.1 doesn't recognise "3e-4" as a float; Python does.
        try:
            return int(v)
        except ValueError:
            pass
        try:
            return float(v)
        except ValueError:
            pass
    return v


def apply_overrides(cfg: Config, overrides: List[str]) -> Config:
    """Apply ``a.b.c=value`` overrides onto a frozen Config tree."""
    d = to_dict(cfg)
    for ov in overrides:
        if "=" not in ov:
            raise ValueError(f"override must be key=value, got {ov!r}")
        path, _, raw = ov.partition("=")
        keys = path.strip().split(".")
        node = d
        for k in keys[:-1]:
            node = node[k]
        if keys[-1] not in node:
            raise KeyError(f"unknown config path {path!r}")
        node[keys[-1]] = _parse_scalar(raw)
    return _from_dict(Config, d)


def load_config(path: Optional[str] = None, overrides: Optional[List[str]] = None) -> Config:
    """Load Config from YAML (missing keys keep defaults), then overrides."""
    cfg = Config()
    if path is not None:
        import yaml

        with open(path) as f:
            raw = yaml.safe_load(f) or {}
        merged = _deep_merge(to_dict(cfg), raw)
        cfg = _from_dict(Config, merged)
    if overrides:
        cfg = apply_overrides(cfg, overrides)
    return cfg


def _deep_merge(base: Dict[str, Any], upd: Dict[str, Any]) -> Dict[str, Any]:
    out = dict(base)
    for k, v in upd.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = v
    return out
