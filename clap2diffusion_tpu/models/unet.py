"""Stable Diffusion v1.5 UNet in Flax, TPU-native (NHWC), with built-in
level-routed audio conditioning.

The reference conditions a diffusers UNet by monkey-patching attention
processors at runtime (reference models/audio_attention_processor.py:148-255).
Here the audio branch is part of the architecture: per-level ``AudioInjection``
modules transform the text encoder states once at UNet entry (mathematically
identical to the reference's shared per-level processors, since the transform
depends only on the text states and the level's audio tokens), and each
cross-attention layer reads the conditioned states for its level. The
early/mid/late -> block mapping mirrors reference :175-191 and lives in
``UNetConfig`` (core/config.py).

Geometry matches SD v1.5 (``runwayml/stable-diffusion-v1-5`` unet config):
blocks (320, 640, 1280, 1280), 2 layers/block, 8 heads, cross-attn dim 768,
GEGLU feed-forward, conv 1x1 transformer projections. Weight conversion from
torch checkpoints: models/convert.py.

TPU notes: everything is NHWC so convs map directly onto the MXU; attention
softmax is fp32; UNet self-attention over 64x64=4096 tokens routes to the
Pallas flash kernel when ``cfg.flash_attention`` and shapes allow.
"""

from __future__ import annotations

import math
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from clap2diffusion_tpu.core.config import UNetConfig
from clap2diffusion_tpu.models.condition.inject import AudioInjection
from clap2diffusion_tpu.ops import quant
from clap2diffusion_tpu.ops.attention import mha
from clap2diffusion_tpu.ops.groupnorm import GroupNorm, GroupNormSiLU
from clap2diffusion_tpu.ops.winograd import Conv3x3


def timestep_embedding(timesteps: jax.Array, dim: int, max_period: float = 10_000.0) -> jax.Array:
    """Sinusoidal embeddings, SD convention (flip_sin_to_cos, freq_shift 0)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    # flip_sin_to_cos=True => [cos, sin]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


class TimeEmbedding(nn.Module):
    """320-d sinusoid -> 1280-d MLP."""

    dim: int

    @nn.compact
    def __call__(self, t_emb: jax.Array) -> jax.Array:
        h = nn.Dense(self.dim, name="linear_1")(t_emb)
        h = nn.silu(h)
        return nn.Dense(self.dim, name="linear_2")(h)


class ResnetBlock(nn.Module):
    out_channels: int
    groups: int = 32

    @nn.compact
    def __call__(self, x: jax.Array, temb: jax.Array) -> jax.Array:
        in_ch = x.shape[-1]
        h = GroupNormSiLU(groups=self.groups, epsilon=1e-5, name="norm1")(x)
        h = Conv3x3(self.out_channels, name="conv1")(h)
        t = nn.Dense(self.out_channels, name="time_emb_proj")(nn.silu(temb))
        h = h + t[:, None, None, :]
        h = GroupNormSiLU(groups=self.groups, epsilon=1e-5, name="norm2")(h)
        h = Conv3x3(self.out_channels, name="conv2")(h)
        if in_ch != self.out_channels:
            x = Conv1x1(self.out_channels, name="conv_shortcut")(x)
        return x + h


class _Kernel(nn.Module):
    """Declares a Dense-shaped kernel (same path/init as ``nn.Dense``'s
    ``kernel``) without applying it — lets the fused-QKV path share the
    exact parameter tree of three separate projections."""

    features: int

    @nn.compact
    def __call__(self, in_features: int) -> jax.Array:
        return self.param(
            "kernel", nn.initializers.lecun_normal(), (in_features, self.features)
        )


class _DenseParams(nn.Module):
    """Declares ``nn.Dense``'s exact parameter tree (kernel [K,N] + bias
    [N], same names/inits) without applying it — lets the int8 serving
    path (ops/quant.py) share checkpoints with the default fp path."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (in_features, self.features)
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias
            else None
        )
        return kernel, bias


class Conv1x1(nn.Module):
    """1x1 conv with ``nn.Conv``'s parameter tree; routes through the W8A8
    int8 matmul when ``C2D_INT8=1`` (a 1x1 conv IS a [B*H*W, Cin] @
    [Cin, Cout] matmul — the Transformer2D projections are MXU work worth
    quantizing). The default path is the same ``lax.conv`` call ``nn.Conv``
    makes, so default outputs are unchanged."""

    features: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (1, 1, cin, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        if quant.eligible(cin, self.features):
            b, h, w, _ = x.shape
            y = quant.int8_matmul(
                x.reshape(b * h * w, cin), kernel.reshape(cin, self.features), bias
            )
            return y.reshape(b, h, w, self.features)
        return jax.lax.conv_general_dilated(
            x, kernel.astype(x.dtype), window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + bias.astype(x.dtype)


class CrossAttention(nn.Module):
    """QKV attention; context defaults to the hidden states (self-attn).

    Self-attention computes the three projections as ONE [C, 3C] matmul
    over concatenated kernels (the concat is loop-invariant under the DDIM
    scan, so XLA hoists it) — measured p50 1.257 -> 1.232 s/image on the
    headline bench, outputs bit-identical (test_fused_qkv_parity). The
    parameter tree is identical either way; opt out with C2D_FUSED_QKV=0.
    Cross-attention K/V stay separate Dense calls: the analogous
    [C_ctx, 2C] fusion measured NOT bit-identical (CPU fp32 tiling-order
    drift ~1e-6) and the context-length-77 matmuls are too small for the
    win to justify losing the exactness guarantee.
    """

    query_dim: int
    context_dim: Optional[int] = None
    num_heads: int = 8
    use_flash: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, context: Optional[jax.Array] = None) -> jax.Array:
        ctx = x if context is None else context
        int8 = quant.eligible(x.shape[-1], self.query_dim)
        if context is None and os.environ.get("C2D_FUSED_QKV", "1") != "0":
            in_dim = x.shape[-1]
            w = jnp.concatenate(
                [
                    _Kernel(self.query_dim, name="to_q")(in_dim),
                    _Kernel(self.query_dim, name="to_k")(in_dim),
                    _Kernel(self.query_dim, name="to_v")(in_dim),
                ],
                axis=1,
            )
            qkv = quant.int8_matmul(x, w) if int8 else jnp.dot(x, w)
            q, k, v = jnp.split(qkv, 3, axis=-1)
        elif int8 and context is not None:
            # Cross-attention int8: only Q (over H*W tokens) is MXU work;
            # K/V project the 77-token text context — tiny AND
            # loop-invariant under the DDIM scan (XLA hoists them), so
            # they stay fp.
            wq, _ = _DenseParams(self.query_dim, use_bias=False, name="to_q")(
                x.shape[-1]
            )
            q = quant.int8_matmul(x, wq)
            k = nn.Dense(self.query_dim, use_bias=False, name="to_k")(ctx)
            v = nn.Dense(self.query_dim, use_bias=False, name="to_v")(ctx)
        else:
            q = nn.Dense(self.query_dim, use_bias=False, name="to_q")(x)
            k = nn.Dense(self.query_dim, use_bias=False, name="to_k")(ctx)
            v = nn.Dense(self.query_dim, use_bias=False, name="to_v")(ctx)
        out = mha(q, k, v, self.num_heads, use_flash=self.use_flash)
        if int8:
            wo, bo = _DenseParams(self.query_dim, name="to_out")(out.shape[-1])
            return quant.int8_matmul(out, wo, bo)
        return nn.Dense(self.query_dim, name="to_out")(out)


class GEGLUFeedForward(nn.Module):
    dim: int
    mult: int = 4

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        inner = self.dim * self.mult
        if quant.eligible(self.dim):
            w1, b1 = _DenseParams(inner * 2, name="proj_in")(x.shape[-1])
            h = quant.int8_matmul(x, w1, b1)
            h, gate = jnp.split(h, 2, axis=-1)
            h = h * nn.gelu(gate, approximate=False)
            w2, b2 = _DenseParams(self.dim, name="proj_out")(inner)
            return quant.int8_matmul(h, w2, b2)
        h = nn.Dense(inner * 2, name="proj_in")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        h = h * nn.gelu(gate, approximate=False)
        return nn.Dense(self.dim, name="proj_out")(h)


class BasicTransformerBlock(nn.Module):
    dim: int
    num_heads: int
    context_dim: int
    use_flash: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, context: jax.Array) -> jax.Array:
        x = x + CrossAttention(
            query_dim=self.dim, num_heads=self.num_heads,
            use_flash=self.use_flash, name="attn1",
        )(nn.LayerNorm(epsilon=1e-5, name="norm1")(x))
        x = x + CrossAttention(
            query_dim=self.dim, context_dim=self.context_dim,
            num_heads=self.num_heads, name="attn2",
        )(nn.LayerNorm(epsilon=1e-5, name="norm2")(x), context)
        x = x + GEGLUFeedForward(dim=self.dim, name="ff")(
            nn.LayerNorm(epsilon=1e-5, name="norm3")(x)
        )
        return x


class Transformer2D(nn.Module):
    """Spatial transformer: conv-project, attend over H*W tokens, project back."""

    channels: int
    num_heads: int
    context_dim: int
    groups: int = 32
    use_flash: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, context: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        residual = x
        x = GroupNorm(num_groups=self.groups, epsilon=1e-6, name="norm")(x)
        x = Conv1x1(self.channels, name="proj_in")(x)
        x = x.reshape(b, h * w, c)
        x = BasicTransformerBlock(
            dim=self.channels, num_heads=self.num_heads,
            context_dim=self.context_dim, use_flash=self.use_flash,
            name="block_0",
        )(x, context)
        x = x.reshape(b, h, w, c)
        x = Conv1x1(self.channels, name="proj_out")(x)
        return x + residual


class Downsample(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return nn.Conv(self.channels, (3, 3), strides=2, padding=1, name="conv")(x)


class Upsample(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        # nearest x2 as broadcast+reshape: jax.image.resize lowers to a
        # gather, which the device trace shows costing real time per step;
        # a broadcast keeps it a pure layout op XLA fuses away.
        x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
        x = x.reshape(b, h * 2, w * 2, c)
        return Conv3x3(self.channels, name="conv")(x)


class UNet2DCondition(nn.Module):
    """SD v1.5 UNet with optional audio-conditioned cross-attention.

    ``__call__(sample [B,H,W,4], timesteps [B], encoder_hidden_states
    [B,77,768], audio_routed={'early','mid','late': [B,K,768]} | None)``
    -> epsilon prediction [B,H,W,4].
    """

    cfg: UNetConfig

    @nn.compact
    def __call__(
        self,
        sample: jax.Array,
        timesteps: jax.Array,
        encoder_hidden_states: jax.Array,
        audio_routed: Optional[Dict[str, jax.Array]] = None,
    ) -> jax.Array:
        cfg = self.cfg
        block_ch = cfg.block_out_channels
        temb = timestep_embedding(timesteps, block_ch[0])
        temb = TimeEmbedding(dim=block_ch[0] * 4, name="time_embedding")(
            temb.astype(sample.dtype)
        )

        # Per-level audio-conditioned text states, computed once (see module
        # docstring). Shared per level like the reference's per-level
        # processors (reference models/audio_attention_processor.py:234-246).
        ctx_by_level = {"early": encoder_hidden_states,
                        "mid": encoder_hidden_states,
                        "late": encoder_hidden_states}
        if cfg.audio_inject:
            for lvl in ("early", "mid", "late"):
                tokens = None if audio_routed is None else audio_routed.get(lvl)
                ctx_by_level[lvl] = AudioInjection(
                    audio_dim=cfg.cross_attention_dim,
                    hidden_dim=cfg.cross_attention_dim,
                    bottleneck_dim=cfg.injection_bottleneck,
                    mode=cfg.injection_mode,
                    max_concat_tokens=cfg.injection_max_concat_tokens,
                    name=f"audio_inject_{lvl}",
                )(encoder_hidden_states, tokens)

        ResBlock = nn.remat(ResnetBlock) if cfg.remat else ResnetBlock
        TfBlock = nn.remat(Transformer2D) if cfg.remat else Transformer2D

        h = Conv3x3(block_ch[0], name="conv_in")(sample)
        skips = [h]

        # Down path
        for i, ch in enumerate(block_ch):
            has_attn = cfg.cross_attn_blocks[i]
            ctx = ctx_by_level[cfg.down_block_levels[i]]
            for j in range(cfg.layers_per_block):
                h = ResBlock(
                    out_channels=ch, groups=cfg.norm_num_groups,
                    name=f"down_{i}_resnet_{j}"
                )(h, temb)
                if has_attn:
                    h = TfBlock(
                        channels=ch, num_heads=cfg.num_attention_heads,
                        context_dim=cfg.cross_attention_dim,
                        groups=cfg.norm_num_groups,
                        use_flash=cfg.flash_attention,
                        name=f"down_{i}_attn_{j}",
                    )(h, ctx)
                skips.append(h)
            if i < len(block_ch) - 1:
                h = Downsample(channels=ch, name=f"down_{i}_downsample")(h)
                skips.append(h)

        # Mid
        ctx = ctx_by_level[cfg.mid_block_level]
        h = ResBlock(out_channels=block_ch[-1], groups=cfg.norm_num_groups,
                     name="mid_resnet_0")(h, temb)
        h = TfBlock(
            channels=block_ch[-1], num_heads=cfg.num_attention_heads,
            context_dim=cfg.cross_attention_dim, groups=cfg.norm_num_groups,
            use_flash=cfg.flash_attention, name="mid_attn",
        )(h, ctx)
        h = ResBlock(out_channels=block_ch[-1], groups=cfg.norm_num_groups,
                     name="mid_resnet_1")(h, temb)

        # Up path (reversed channels; one extra resnet per block for skips)
        for i, ch in enumerate(reversed(block_ch)):
            block_idx = len(block_ch) - 1 - i
            has_attn = cfg.cross_attn_blocks[block_idx]
            ctx = ctx_by_level[cfg.up_block_levels[i]]
            for j in range(cfg.layers_per_block + 1):
                skip = skips.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                h = ResBlock(out_channels=ch, groups=cfg.norm_num_groups,
                             name=f"up_{i}_resnet_{j}")(h, temb)
                if has_attn:
                    h = TfBlock(
                        channels=ch, num_heads=cfg.num_attention_heads,
                        context_dim=cfg.cross_attention_dim,
                        groups=cfg.norm_num_groups,
                        use_flash=cfg.flash_attention,
                        name=f"up_{i}_attn_{j}",
                    )(h, ctx)
            if i < len(block_ch) - 1:
                h = Upsample(channels=ch, name=f"up_{i}_upsample")(h)

        h = GroupNormSiLU(groups=cfg.norm_num_groups, epsilon=1e-5,
                          name="conv_norm_out")(h)
        return Conv3x3(cfg.out_channels, name="conv_out")(h)
