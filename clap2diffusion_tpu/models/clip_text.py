"""CLIP ViT-L/14 text encoder (SD v1.5's text conditioning tower) in Flax.

12 layers, width 768, 12 heads, causal mask, quick-GELU, max 77 tokens.
SD consumes the final ``last_hidden_state`` [B,77,768] — the same tensor the
audio paths imitate (reference models/hierarchical_audio_v4.py:417-492
produces "CLIP-compatible" 77x768 tokens).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from clap2diffusion_tpu.core.config import CLIPTextConfig
from clap2diffusion_tpu.ops.attention import mha


def quick_gelu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(1.702 * x)


class CLIPAttention(nn.Module):
    cfg: CLIPTextConfig

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array) -> jax.Array:
        d = self.cfg.hidden_size
        q = nn.Dense(d, name="q_proj")(x)
        k = nn.Dense(d, name="k_proj")(x)
        v = nn.Dense(d, name="v_proj")(x)
        out = mha(q, k, v, self.cfg.num_heads, mask=mask)
        return nn.Dense(d, name="out_proj")(out)


class CLIPEncoderLayer(nn.Module):
    cfg: CLIPTextConfig

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array) -> jax.Array:
        c = self.cfg
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, name="layer_norm1")(x)
        x = x + CLIPAttention(cfg=c, name="self_attn")(h, mask)
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, name="layer_norm2")(x)
        h = nn.Dense(c.intermediate_size, name="fc1")(h)
        h = quick_gelu(h)
        x = x + nn.Dense(c.hidden_size, name="fc2")(h)
        return x


class CLIPTextEncoder(nn.Module):
    """``__call__(input_ids [B,77]) -> last_hidden_state [B,77,768]``."""

    cfg: CLIPTextConfig

    @nn.compact
    def __call__(self, input_ids: jax.Array) -> jax.Array:
        c = self.cfg
        b, s = input_ids.shape
        # out-of-vocab ids wrap instead of hitting jnp.take's NaN fill mode —
        # a no-op at the real 49,408 vocab, and it keeps reduced-vocab
        # configs (tests, distilled deployments) finite and deterministic
        input_ids = input_ids % c.vocab_size
        tok = nn.Embed(c.vocab_size, c.hidden_size, name="token_embedding")(
            input_ids
        )
        pos = self.param(
            "position_embedding",
            nn.initializers.normal(0.01),
            (c.max_length, c.hidden_size),
        )
        x = tok + pos[None, :s, :].astype(tok.dtype)

        causal = jnp.tril(jnp.ones((s, s), dtype=bool))[None, None]
        for i in range(c.num_layers):
            x = CLIPEncoderLayer(cfg=c, name=f"layer_{i}")(x, causal)
        return nn.LayerNorm(epsilon=c.layer_norm_eps, name="final_layer_norm")(x)
