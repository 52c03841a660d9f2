"""Norm-60 token rescaling.

The reference's empirically "discovered optimal normalization": scale audio
tokens so the mean per-token L2 norm equals ``target_norm`` (default 60.0)
(reference scripts/inference.py:92-99, scripts/train_stage3.py:193-200,
configs/training_config.yaml:50). Pure function; differentiable if needed,
though the reference applies it under no_grad.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rescale_to_norm(tokens: jax.Array, target_norm: float = 60.0) -> jax.Array:
    """Rescale [..., T, D] tokens so mean(||token||_2) == target_norm.

    The mean is over every token in the input (batch included), matching the
    reference's scalar ``.mean()`` over the norm tensor.
    """
    raw = jnp.linalg.norm(tokens.astype(jnp.float32), axis=-1).mean()
    scale = jnp.where(raw > 0, target_norm / raw, 1.0)
    return (tokens * scale.astype(tokens.dtype)).astype(tokens.dtype)
