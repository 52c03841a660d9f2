"""SonicDiffusion-style audio adapter: CLAP [B,512] -> 16 tokens [B,16,768].

(reference models/audio_adapter_v4.py). 16 learned queries + positional
embeddings; a low-rank MLP (512->256->2*768*16) generates per-token K,V from
the single CLAP vector; one single-head cross-attention (scale = D^-0.5 over
the *full* width, matching the reference :103-108) followed by 4 pre-norm
self-attention layers and a final projection+LayerNorm.

Also provides the standalone gated audio cross-attention layer
(reference :168-261) used as a post-text conditioning block, with its
sigmoid gate initialized to -5.0 (~0.007 influence at init).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from clap2diffusion_tpu.core.config import ConditionConfig
from clap2diffusion_tpu.ops.attention import mha


class AudioSelfAttention(nn.Module):
    """Bias-free QKV self-attention block (reference audio_adapter_v4.py:122-165)."""

    hidden_dim: int
    num_heads: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        qkv = nn.Dense(self.hidden_dim * 3, use_bias=False, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        out = mha(q, k, v, self.num_heads)
        out = nn.Dense(self.hidden_dim, name="to_out")(out)
        return nn.Dropout(self.dropout)(out, deterministic=deterministic)


class AudioTokenGenerator(nn.Module):
    """CLAP vector -> refined audio token sequence.

    (reference models/audio_adapter_v4.py:13-119)
    """

    cfg: ConditionConfig

    @nn.compact
    def __call__(self, audio_embedding: jax.Array, *, deterministic: bool = True):
        c = self.cfg
        b = audio_embedding.shape[0]
        n, d = c.num_adapter_tokens, c.token_dim

        queries = self.param(
            "audio_queries", nn.initializers.xavier_uniform(), (n, d)
        )
        pos = self.param("pos_embed", nn.initializers.normal(1.0), (n, d))
        q = jnp.broadcast_to((queries + pos)[None], (b, n, d)).astype(
            audio_embedding.dtype
        )

        # Low-rank KV head: the parameter-dominant piece (256 -> 2*d*n).
        h = nn.Dense(c.adapter_kv_hidden, name="kv_fc1")(audio_embedding)
        h = nn.gelu(h, approximate=False)
        h = nn.Dropout(0.1)(h, deterministic=deterministic)
        kv = nn.Dense(d * 2 * n, name="kv_fc2")(h)
        kv = kv.reshape(b, n, 2, d)
        k, v = kv[:, :, 0], kv[:, :, 1]

        # Single-head cross-attention with full-width scale (reference :103-108).
        scale = d**-0.5
        scores = jnp.einsum("bnd,bmd->bnm", q, k).astype(jnp.float32) * scale
        attn = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
        tokens = jnp.einsum("bnm,bmd->bnd", attn, v) + q

        for i in range(c.adapter_self_attn_layers):
            residual = tokens
            h = nn.LayerNorm(epsilon=1e-5, name=f"ln_{i}")(tokens)
            h = AudioSelfAttention(
                hidden_dim=d, num_heads=c.adapter_heads, name=f"self_attn_{i}"
            )(h, deterministic=deterministic)
            tokens = h + residual

        tokens = nn.Dense(d, name="output_proj")(tokens)
        return nn.LayerNorm(epsilon=1e-5, name="output_norm")(tokens)


class AudioAdapter(nn.Module):
    """Thin stage-1 wrapper over the token generator (reference :264-301)."""

    cfg: ConditionConfig

    @nn.compact
    def __call__(self, audio_embedding: jax.Array, *, deterministic: bool = True):
        return AudioTokenGenerator(cfg=self.cfg, name="token_generator")(
            audio_embedding, deterministic=deterministic
        )


class GatedAudioCrossAttention(nn.Module):
    """Standalone post-text gated cross-attention (reference :168-261).

    ``out = residual + sigmoid(gate) * attn(LN(x), audio)`` with
    gate init -5.0 so audio influence starts near zero.
    """

    query_dim: int
    context_dim: int = 768
    heads: int = 8
    dim_head: int = 64
    gate_init: float = -5.0

    @nn.compact
    def __call__(
        self,
        hidden_states: jax.Array,
        audio_context: jax.Array,
        mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        inner = self.heads * self.dim_head
        residual = hidden_states
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(hidden_states)
        q = nn.Dense(inner, use_bias=False, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, name="to_k")(audio_context)
        v = nn.Dense(inner, use_bias=False, name="to_v")(audio_context)
        out = mha(q, k, v, self.heads, mask=mask)
        out = nn.Dense(self.query_dim, name="to_out")(out)
        gate = self.param(
            "gate", nn.initializers.constant(self.gate_init), (1,)
        )
        return residual + jax.nn.sigmoid(gate).astype(out.dtype) * out
