"""Level-routed audio injection into UNet cross-attention.

Reimplements the semantics of the reference's runtime-patched attention
processor (reference models/audio_attention_processor.py:13-145) as a
*static* module the UNet composes at construction — TPU/XLA-friendly: no
module-registry mutation, fixed shapes, traceable.

Two modes (reference :92-109):
- ``add``  (FiLM): project audio tokens 768->64->768, mean-pool, add to the
  text embeddings scaled by sigmoid(alpha) (alpha init 0 => gate 0.5).
- ``concat``: project, adaptive-avg-pool to <=4 tokens, concat to the text
  KV sequence.

Level->block mapping lives in the UNet config (core/config.py UNetConfig),
mirroring reference :175-191.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def adaptive_avg_pool_tokens(x: jax.Array, out_len: int) -> jax.Array:
    """torch.adaptive_avg_pool1d over the token axis of [B, T, D].

    Segment i averages input positions [floor(i*T/out), ceil((i+1)*T/out)).
    Static shapes only — T and out_len are Python ints at trace time.
    """
    t = x.shape[1]
    if t <= out_len:
        return x
    import math

    pieces = []
    for i in range(out_len):
        start = math.floor(i * t / out_len)
        end = math.ceil((i + 1) * t / out_len)
        pieces.append(jnp.mean(x[:, start:end, :], axis=1, keepdims=True))
    return jnp.concatenate(pieces, axis=1)


class AudioInjection(nn.Module):
    """Per-level audio conditioning of text encoder states.

    One instance is shared by all cross-attention layers of a level, exactly
    like the reference's one-processor-per-level sharing
    (reference models/audio_attention_processor.py:234-246).
    """

    audio_dim: int = 768
    hidden_dim: int = 768
    bottleneck_dim: int = 64
    mode: str = "add"  # 'add' | 'concat'
    alpha_init: float = 0.0
    max_concat_tokens: int = 4
    dropout: float = 0.1

    @nn.compact
    def __call__(
        self,
        encoder_hidden_states: jax.Array,
        audio_tokens: Optional[jax.Array],
        *,
        deterministic: bool = True,
    ) -> jax.Array:
        if audio_tokens is None:
            return encoder_hidden_states

        h = nn.Dense(self.bottleneck_dim, name="proj_fc1")(
            audio_tokens.astype(encoder_hidden_states.dtype)
        )
        h = nn.gelu(h, approximate=False)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        projected = nn.Dense(self.hidden_dim, name="proj_fc2")(h)

        if self.mode == "add":
            alpha = self.param(
                "alpha", nn.initializers.constant(self.alpha_init), (1,)
            )
            pooled = jnp.mean(projected, axis=1, keepdims=True)
            gate = jax.nn.sigmoid(alpha).astype(encoder_hidden_states.dtype)
            return encoder_hidden_states + gate * pooled
        elif self.mode == "concat":
            projected = adaptive_avg_pool_tokens(projected, self.max_concat_tokens)
            return jnp.concatenate([encoder_hidden_states, projected], axis=1)
        raise ValueError(f"unknown injection mode {self.mode!r}")
