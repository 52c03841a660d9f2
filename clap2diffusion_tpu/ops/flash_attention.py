"""Pallas TPU flash attention (forward) for the UNet's long self-attention.

The hot attention in this framework is UNet self-attention over 64x64 = 4096
latent positions (SURVEY.md section 7 "the win is in UNet self-attn @64^2").
This kernel tiles queries over the grid, keeps K/V resident in VMEM (at SD
sizes K+V is ~1-3 MB per batch*head — far under the ~16 MB VMEM budget), and
never materializes the [S, S] probability matrix in HBM: logits, softmax and
the PV matmul all fuse in VMEM, with fp32 accumulation on the MXU.

Head dims (40/80/160 for SD v1.5) are zero-padded to the 128-lane boundary
inside the wrapper; padding columns contribute nothing to logits or outputs.

Backward currently runs the XLA einsum path via custom_vjp (numerically
identical, recompute-based); a Pallas backward kernel is the planned next
optimization.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 256


def _pad_to(x: jax.Array, size: int, axis: int) -> jax.Array:
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    q = q_ref[0]  # [Bq, Dp]
    k = k_ref[0]  # [S, Dp]
    v = v_ref[0]
    logits = (
        jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        * scale
    )  # [Bq, S]
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    # normalize AFTER the PV matmul: a [Bq, D] scale instead of a [Bq, S]
    # divide (S/D ~ 32x fewer VPU divisions at SD shapes)
    pv = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    o_ref[0] = (pv / denom).astype(o_ref.dtype)


def _flash_fwd(q: jax.Array, k: jax.Array, v: jax.Array, scale: float) -> jax.Array:
    b, h, sq, d = q.shape
    sk = k.shape[2]
    dp = int(np.ceil(d / 128) * 128)
    block_q = min(DEFAULT_BLOCK_Q, sq)

    qm = _pad_to(q.reshape(b * h, sq, d), dp, 2)
    km = _pad_to(k.reshape(b * h, sk, d), dp, 2)
    vm = _pad_to(v.reshape(b * h, sk, d), dp, 2)

    grid = (b * h, pl.cdiv(sq, block_q))
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((b * h, sq, dp), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, dp), lambda bh, i: (bh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk, dp), lambda bh, i: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk, dp), lambda bh, i: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, dp), lambda bh, i: (bh, i, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * h * sq * sk * dp,
            bytes_accessed=(b * h * (sq + 2 * sk) * dp) * q.dtype.itemsize,
            transcendentals=b * h * sq * sk,
        ),
    )(qm, km, vm)
    return out[:, :, :d].reshape(b, h, sq, d)


def _xla_attention(q, k, v, scale):
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, *, scale: float):
    """Flash backward: recompute the q-block's softmax against full K/V in
    VMEM; accumulate dK/dV across the q-block grid dimension (their output
    tile index is constant over that dimension, so the buffer persists)."""
    iq = pl.program_id(1)

    q = q_ref[0].astype(jnp.float32)  # [Bq, Dp]
    k = k_ref[0].astype(jnp.float32)  # [S, Dp]
    v = v_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)  # [Bq, Dp]

    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [Bq, S]
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)

    # dV += P^T dO ; dP = dO V^T ; dS = P * (dP - rowsum(dO * O))
    o = jnp.dot(p, v, preferred_element_type=jnp.float32)
    dv_blk = jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [S, Dp]
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [Bq, S]
    delta = jnp.sum(do * o, axis=-1, keepdims=True)
    ds = p * (dp - delta) * scale
    dq_ref[0] = jnp.dot(ds, k, preferred_element_type=jnp.float32).astype(
        dq_ref.dtype
    )
    dk_blk = jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [S, Dp]

    @pl.when(iq == 0)
    def _():
        dk_ref[0] = dk_blk.astype(dk_ref.dtype)
        dv_ref[0] = dv_blk.astype(dv_ref.dtype)

    @pl.when(iq > 0)
    def _():
        dk_ref[0] = dk_ref[0] + dk_blk.astype(dk_ref.dtype)
        dv_ref[0] = dv_ref[0] + dv_blk.astype(dv_ref.dtype)


def _flash_bwd(q, k, v, do, scale: float):
    b, h, sq, d = q.shape
    sk = k.shape[2]
    dp = int(np.ceil(d / 128) * 128)
    block_q = min(DEFAULT_BLOCK_Q, sq)

    qm = _pad_to(q.reshape(b * h, sq, d), dp, 2)
    km = _pad_to(k.reshape(b * h, sk, d), dp, 2)
    vm = _pad_to(v.reshape(b * h, sk, d), dp, 2)
    dom = _pad_to(do.reshape(b * h, sq, d), dp, 2)

    # dK/dV accumulate in fp32 regardless of input dtype.
    grid = (b * h, pl.cdiv(sq, block_q))
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale),
        out_shape=(
            jax.ShapeDtypeStruct((b * h, sq, dp), q.dtype),
            jax.ShapeDtypeStruct((b * h, sk, dp), jnp.float32),
            jax.ShapeDtypeStruct((b * h, sk, dp), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, dp), lambda bh, i: (bh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk, dp), lambda bh, i: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk, dp), lambda bh, i: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, dp), lambda bh, i: (bh, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, dp), lambda bh, i: (bh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk, dp), lambda bh, i: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk, dp), lambda bh, i: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
    )(qm, km, vm, dom)

    def unpad(x, s):
        return x[:, :, :d].reshape(b, h, s, d)

    return (
        unpad(dq, sq),
        unpad(dk, sk).astype(k.dtype),
        unpad(dv, sk).astype(v.dtype),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array, scale: float) -> jax.Array:
    """Attention over [B, H, S, D] with fp32 softmax, flash forward+backward."""
    return _flash_fwd(q, k, v, scale)


def _vjp_fwd(q, k, v, scale):
    return _flash_fwd(q, k, v, scale), (q, k, v)


def _vjp_bwd(scale, residuals, g):
    q, k, v = residuals
    return _flash_bwd(q, k, v, g, scale)


flash_attention.defvjp(_vjp_fwd, _vjp_bwd)


def flash_attention_wrapper(q, k, v, *, scale: float | None = None):
    if scale is None:
        scale = q.shape[-1] ** -0.5
    return flash_attention(q, k, v, float(scale))
