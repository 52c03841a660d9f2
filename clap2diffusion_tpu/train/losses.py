"""Training losses for the three stages, as pure functions.

Stage 1 (reference scripts/train_stage1.py:44-64): MSE(mean-pooled audio
tokens, text embedding) + InfoNCE at T=0.07 with in-batch negatives.

Stage 2 (reference scripts/train_stage2.py:106-134): diffusion MSE
+ 0.1 * orthogonality + 0.01 * entropy. The reference's UNet call is a
``randn`` stub (:153-157) and its noising is a placeholder linear-alpha ramp
(:147-151); here the UNet is really in the loop and noising uses the actual
DDPM schedule.

Stage 3 (reference scripts/train_stage3.py:154-241): 2.0 * diffusion
+ 0.5 * consistency (adjacent-level smoothness) + 0.3 * alignment (cosine to
text). The reference's consistency indexes a non-existent [B,L,N,D] tensor
(SURVEY.md 2.10); the intended semantics — smooth transitions between
adjacent level representations — is implemented over the routed
early/mid/late token means.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import optax


def stage1_losses(
    audio_tokens: jax.Array,  # [B, N, D]
    text_emb: jax.Array,  # [B, D]
    temperature: float = 0.07,
) -> Dict[str, jax.Array]:
    pooled = audio_tokens.mean(axis=1).astype(jnp.float32)
    text = text_emb.astype(jnp.float32)
    mse = jnp.mean((pooled - text) ** 2)

    a_n = pooled / (jnp.linalg.norm(pooled, axis=-1, keepdims=True) + 1e-8)
    t_n = text / (jnp.linalg.norm(text, axis=-1, keepdims=True) + 1e-8)
    logits = (a_n @ t_n.T) / temperature  # [B, B]
    labels = jnp.arange(logits.shape[0])
    infonce = optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()
    return {"mse": mse, "infonce": infonce, "total": mse + infonce}


def diffusion_mse(predicted_noise: jax.Array, noise: jax.Array) -> jax.Array:
    return jnp.mean(
        (predicted_noise.astype(jnp.float32) - noise.astype(jnp.float32)) ** 2
    )


def consistency_loss(routed: Dict[str, jax.Array]) -> jax.Array:
    """Adjacent-level smoothness over (early, mid, late) pooled tokens."""
    order = ["early", "mid", "late"]
    means = [routed[k].mean(axis=1).astype(jnp.float32) for k in order]
    total = 0.0
    for a, b in zip(means[:-1], means[1:]):
        total = total + jnp.linalg.norm(a - b, axis=-1).mean()
    return total / (len(means) - 1)


def alignment_loss(audio_tokens: jax.Array, text_emb: jax.Array) -> jax.Array:
    """1 - cosine(mean-pooled audio tokens, text embedding), batch-mean."""
    pooled = audio_tokens.mean(axis=1).astype(jnp.float32)
    text = text_emb.astype(jnp.float32)
    a_n = pooled / (jnp.linalg.norm(pooled, axis=-1, keepdims=True) + 1e-8)
    t_n = text / (jnp.linalg.norm(text, axis=-1, keepdims=True) + 1e-8)
    return (1.0 - (a_n * t_n).sum(axis=-1)).mean()


def weighted_total(losses: Dict[str, jax.Array], weights: Dict[str, float]) -> jax.Array:
    total = 0.0
    for name, w in weights.items():
        if name in losses:
            total = total + w * losses[name]
    return total
