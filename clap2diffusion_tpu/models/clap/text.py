"""CLAP text tower (RoBERTa encoder + pooler + projection) in Flax.

The reference wraps this via transformers (reference
models/audio_encoder.py:212-309, ``CLAPTextEncoder.encode_text`` -> L2
normalized [B,512]). Geometry: laion/clap-htsat-unfused text side — RoBERTa
base (50265 vocab, 514 positions, pad_id 1, 12 layers, 768 wide), CLS pooler
(dense+tanh), 768->512 relu 512 projection, L2 normalize.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from clap2diffusion_tpu.core.config import CLAPTextConfig
from clap2diffusion_tpu.ops.attention import mha


class RobertaLayer(nn.Module):
    cfg: CLAPTextConfig

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[jax.Array]) -> jax.Array:
        c = self.cfg
        q = nn.Dense(c.hidden_size, name="q")(x)
        k = nn.Dense(c.hidden_size, name="k")(x)
        v = nn.Dense(c.hidden_size, name="v")(x)
        attn = mha(q, k, v, c.num_heads, mask=mask)
        attn = nn.Dense(c.hidden_size, name="attn_out")(attn)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="attn_norm")(x + attn)

        h = nn.Dense(c.intermediate_size, name="intermediate")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(c.hidden_size, name="out")(h)
        return nn.LayerNorm(epsilon=c.layer_norm_eps, name="out_norm")(x + h)


class ClapTextTower(nn.Module):
    """``__call__(input_ids [B,S], attention_mask [B,S]) -> [B,512] normalized.``"""

    cfg: CLAPTextConfig

    @nn.compact
    def __call__(
        self, input_ids: jax.Array, attention_mask: Optional[jax.Array] = None
    ) -> jax.Array:
        c = self.cfg
        if attention_mask is None:
            attention_mask = (input_ids != c.pad_token_id).astype(jnp.int32)

        # RoBERTa position ids: cumulative count of non-pad tokens + pad_id
        positions = (
            jnp.cumsum(attention_mask, axis=1) * attention_mask + c.pad_token_id
        )
        # wrap out-of-vocab ids (no-op at full vocab; keeps reduced-vocab
        # configs finite instead of hitting jnp.take's NaN fill mode)
        input_ids = input_ids % c.vocab_size
        tok = nn.Embed(c.vocab_size, c.hidden_size, name="word_embeddings")(input_ids)
        pos = nn.Embed(
            c.max_position_embeddings, c.hidden_size, name="position_embeddings"
        )(positions)
        typ = nn.Embed(c.type_vocab_size, c.hidden_size, name="token_type_embeddings")(
            jnp.zeros_like(input_ids)
        )
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="embed_norm")(tok + pos + typ)

        attn_mask = attention_mask[:, None, None, :].astype(bool)
        for i in range(c.num_layers):
            x = RobertaLayer(cfg=c, name=f"layer_{i}")(x, attn_mask)

        pooled = nn.Dense(c.hidden_size, name="pooler")(x[:, 0])
        pooled = jnp.tanh(pooled)
        h = nn.Dense(c.projection_dim, name="projection_1")(pooled)
        h = nn.relu(h)
        h = nn.Dense(c.projection_dim, name="projection_2")(h)
        h32 = h.astype(jnp.float32)
        return (h32 / jnp.linalg.norm(h32, axis=-1, keepdims=True)).astype(h.dtype)
