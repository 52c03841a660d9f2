"""SD v1.5 AutoencoderKL in Flax (NHWC).

Encode 512x512x3 images -> 64x64x4 latents (x0.18215) and decode back.
Encoding is the precompute path for the latent dataset (the reference assumes
precomputed latents but ships no encode script — reference
data/dataset_latent.py:95,180-192; SURVEY.md 3.5); decoding is the last stage
of inference.

Geometry: block_out_channels (128, 256, 512, 512), 2 layers/block in the
encoder, 3 in the decoder, mid block with single-head attention at 512.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from clap2diffusion_tpu.core.config import VAEConfig
from clap2diffusion_tpu.ops.attention import mha
from clap2diffusion_tpu.ops.groupnorm import GroupNorm, GroupNormSiLU


class VAEResnetBlock(nn.Module):
    out_channels: int
    groups: int = 32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_ch = x.shape[-1]
        h = GroupNormSiLU(groups=self.groups, epsilon=1e-6, name="norm1")(x)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, name="conv1")(h)
        h = GroupNormSiLU(groups=self.groups, epsilon=1e-6, name="norm2")(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, name="conv2")(h)
        if in_ch != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), name="conv_shortcut")(x)
        return x + h


class VAEAttention(nn.Module):
    """Single-head spatial self-attention at the bottleneck."""

    channels: int
    groups: int = 32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        residual = x
        y = GroupNorm(num_groups=self.groups, epsilon=1e-6, name="group_norm")(x)
        y = y.reshape(b, h * w, c)
        q = nn.Dense(c, name="to_q")(y)
        k = nn.Dense(c, name="to_k")(y)
        v = nn.Dense(c, name="to_v")(y)
        # 64x64 latents -> 4096 tokens at 512 dim: flash avoids the 67MB
        # probability matrix in HBM
        y = mha(q, k, v, num_heads=1, use_flash=True)
        y = nn.Dense(c, name="to_out")(y)
        return residual + y.reshape(b, h, w, c)


class VAEMidBlock(nn.Module):
    channels: int
    groups: int = 32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = VAEResnetBlock(out_channels=self.channels, groups=self.groups,
                           name="resnet_0")(x)
        x = VAEAttention(channels=self.channels, groups=self.groups, name="attn")(x)
        return VAEResnetBlock(out_channels=self.channels, groups=self.groups,
                              name="resnet_1")(x)


class VAEEncoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        ch = self.cfg.block_out_channels
        g = self.cfg.norm_num_groups
        h = nn.Conv(ch[0], (3, 3), padding=1, name="conv_in")(x)
        for i, c in enumerate(ch):
            for j in range(self.cfg.layers_per_block):
                h = VAEResnetBlock(out_channels=c, groups=g, name=f"down_{i}_resnet_{j}")(h)
            if i < len(ch) - 1:
                # diffusers uses asymmetric (0,1) padding for the stride-2 conv
                h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = nn.Conv(c, (3, 3), strides=2, padding="VALID",
                            name=f"down_{i}_downsample")(h)
        h = VAEMidBlock(channels=ch[-1], groups=g, name="mid")(h)
        h = GroupNormSiLU(groups=g, epsilon=1e-6, name="conv_norm_out")(h)
        return nn.Conv(2 * self.cfg.latent_channels, (3, 3), padding=1,
                       name="conv_out")(h)


class VAEDecoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        ch = self.cfg.block_out_channels
        g = self.cfg.norm_num_groups
        h = nn.Conv(ch[-1], (3, 3), padding=1, name="conv_in")(z)
        h = VAEMidBlock(channels=ch[-1], groups=g, name="mid")(h)
        for i, c in enumerate(reversed(ch)):
            for j in range(self.cfg.layers_per_block + 1):
                h = VAEResnetBlock(out_channels=c, groups=g, name=f"up_{i}_resnet_{j}")(h)
            if i < len(ch) - 1:
                b, hh, ww, cc = h.shape
                # nearest x2 via broadcast (resize lowers to a slow gather)
                h = jnp.broadcast_to(
                    h[:, :, None, :, None, :], (b, hh, 2, ww, 2, cc)
                ).reshape(b, hh * 2, ww * 2, cc)
                h = nn.Conv(c, (3, 3), padding=1, name=f"up_{i}_upsample")(h)
        h = GroupNormSiLU(groups=g, epsilon=1e-6, name="conv_norm_out")(h)
        return nn.Conv(self.cfg.out_channels, (3, 3), padding=1, name="conv_out")(h)


class AutoencoderKL(nn.Module):
    """Full VAE. ``encode`` returns (mean, logvar); ``decode`` maps z -> image."""

    cfg: VAEConfig

    def setup(self):
        self.encoder = VAEEncoder(cfg=self.cfg)
        self.decoder = VAEDecoder(cfg=self.cfg)
        self.quant_conv = nn.Conv(2 * self.cfg.latent_channels, (1, 1),
                                  name="quant_conv")
        self.post_quant_conv = nn.Conv(self.cfg.latent_channels, (1, 1),
                                       name="post_quant_conv")

    def encode(self, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def decode(self, z: jax.Array) -> jax.Array:
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x: jax.Array, rng: jax.Array) -> jax.Array:
        mean, logvar = self.encode(x)
        z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(
            rng, mean.shape, mean.dtype
        )
        return self.decode(z)

    def sample_latent(self, x: jax.Array, rng: jax.Array) -> jax.Array:
        """Image [-1,1] -> scaled latent (the training-space representation)."""
        mean, logvar = self.encode(x)
        z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(
            rng, mean.shape, mean.dtype
        )
        return z * self.cfg.scaling_factor

    def decode_latent(self, z: jax.Array) -> jax.Array:
        """Scaled latent -> image in [-1,1]."""
        return self.decode(z / self.cfg.scaling_factor)
