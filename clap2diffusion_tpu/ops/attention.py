"""Attention primitives: one functional core used by every model in the repo.

XLA path: einsum attention with fp32 softmax (numerically matches the
reference's fp32 torch attention when run in fp32). The Pallas flash-attention
kernel in ``ops/flash_attention.py`` takes over for long sequences (UNet
self-attention over 64x64=4096 latent positions) on TPU; tiny sequences
(10/16/77 tokens) stay on the XLA path where flash tiling cannot win.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp


def split_heads(x: jax.Array, num_heads: int) -> jax.Array:
    """[B, S, H*Dh] -> [B, H, S, Dh]."""
    b, s, d = x.shape
    return x.reshape(b, s, num_heads, d // num_heads).transpose(0, 2, 1, 3)


def merge_heads(x: jax.Array) -> jax.Array:
    """[B, H, S, Dh] -> [B, S, H*Dh]."""
    b, h, s, dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, s, h * dh)


def dot_product_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    scale: Optional[float] = None,
    mask: Optional[jax.Array] = None,
    use_flash: bool = False,
) -> jax.Array:
    """Multi-head attention over [B, H, S, Dh] tensors.

    Softmax runs in float32 regardless of input dtype (bf16-safe), output is
    cast back to the input dtype. ``use_flash`` routes to the Pallas kernel
    when the sequence is long enough to benefit.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5

    if use_flash and _flash_eligible(q, k, mask):
        from clap2diffusion_tpu.ops.flash_attention import flash_attention_wrapper

        return flash_attention_wrapper(q, k, v, scale=float(scale))

    dtype = q.dtype
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * scale
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(dtype), v)
    return out


def _flash_eligible(q: jax.Array, k: jax.Array, mask) -> bool:
    """Flash kernel needs TPU, no mask, and long enough sequences to tile."""
    if mask is not None:
        return False
    if q.shape[-2] < 256 or k.shape[-2] < 128:
        return False
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    return True


def mha(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    num_heads: int,
    *,
    scale: Optional[float] = None,
    mask: Optional[jax.Array] = None,
    use_flash: bool = False,
) -> jax.Array:
    """Attention over [B, S, D] projections, splitting/merging heads.

    With ``C2D_PACKED_FLASH=1`` and the head-packed Pallas kernel applicable
    (small head dim, long self-attention, TPU), the [B, H, S, Dh] transposes
    are skipped entirely: heads stay as contiguous feature blocks of the
    projection layout. Off by default: the full-pipeline A/B on v5e measured
    per-head faster end-to-end (1.328 s vs 1.352 s p50) despite the packed
    kernel's better standalone MXU utilization.
    """
    d = q.shape[-1] // num_heads
    if (
        use_flash
        and mask is None
        and 128 // d >= 2
        and num_heads >= 2
        and q.shape[1] >= 1024
        and q.shape[1] == k.shape[1]
        # aligned lane slices only (segmented softmax; ADVICE r2)
        and q.shape[1] % 128 == 0
        and jax.default_backend() in ("tpu", "axon")
        and os.environ.get("C2D_PACKED_FLASH") == "1"
    ):
        from clap2diffusion_tpu.ops.flash_attention import packed_flash_nhd

        return packed_flash_nhd(
            q, k, v, num_heads, min(128 // d, num_heads),
            float(d**-0.5 if scale is None else scale),
        )
    out = dot_product_attention(
        split_heads(q, num_heads),
        split_heads(k, num_heads),
        split_heads(v, num_heads),
        scale=scale,
        mask=mask,
        use_flash=use_flash,
    )
    return merge_heads(out)
