"""Pallas TPU flash attention (forward) for the UNet's long self-attention.

The hot attention in this framework is UNet self-attention over 64x64 = 4096
latent positions (SURVEY.md section 7 "the win is in UNet self-attn @64^2").
This kernel tiles queries over the grid, keeps K/V resident in VMEM (at SD
sizes K+V is ~1-3 MB per batch*head — far under the ~16 MB VMEM budget), and
never materializes the [S, S] probability matrix in HBM: logits, softmax and
the PV matmul all fuse in VMEM, with fp32 accumulation on the MXU.

Head dims (40/80/160 for SD v1.5) are zero-padded to the 128-lane boundary
inside the wrapper; padding columns contribute nothing to logits or outputs.

Backward is a recompute-based Pallas kernel too (``_bwd_kernel``): per
query block it rebuilds the softmax probabilities in VMEM and accumulates
dQ/dK/dV with fp32 accumulators. Flash fwd+bwd together measure 1.93x on
stage-2 training throughput vs the all-XLA attention path
(BENCH_NOTES.md).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _default_block_q() -> int:
    """Parsed lazily per call (ADVICE r2: an import-time parse made a
    malformed C2D_FLASH_BLOCK_Q poison every attention import, and
    post-import changes were ignored). block_q in {128,256,512} measured
    within noise on v5e (BENCH_NOTES.md), so the fallback is safe."""
    try:
        return int(os.environ.get("C2D_FLASH_BLOCK_Q", "256"))
    except ValueError:
        return 256


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


def _flash_fwd(q: jax.Array, k: jax.Array, v: jax.Array, scale: float,
               force_pad: bool = False) -> jax.Array:
    b, h, sq, d = q.shape
    sk = k.shape[2]
    pack = 128 // d
    if (
        pack >= 2
        and h >= 2
        and sq >= 1024
        and sq == sk
        # the segmented softmax slices lanes per head; S must stay on the
        # 128-lane grid or Mosaic hits unaligned-slice relayouts (ADVICE r2)
        and sq % 128 == 0
        and os.environ.get("C2D_PACKED_FLASH") == "1"
    ):
        return _packed_flash_fwd(q, k, v, scale, min(pack, h))
    return _flash_fwd_perhead(q, k, v, scale, force_pad=force_pad)


def _kernel_width(d: int) -> int:
    """Feature width the kernel operates at.

    DEFAULT: the raw head dim — Mosaic pads MXU tiles internally, so the
    explicit host-side zero-pad to the 128-lane boundary only added 3 pad
    + 1 slice HBM round-trips per attention call (the 'pads + data
    formatting' share the batch-16 trace flagged). Measured round 3 on
    v5e: batch-8 1.07 -> 1.12 img/s, p50 1.268 -> 1.258 s, outputs
    bit-identical (BENCH_NOTES.md). C2D_FLASH_NOPAD=0 restores the
    explicit-pad entry layout."""
    if os.environ.get("C2D_FLASH_NOPAD", "1") != "1":
        return int(np.ceil(d / 128) * 128)
    return d


def _flash_fwd_perhead(q: jax.Array, k: jax.Array, v: jax.Array,
                       scale: float, force_pad: bool = False) -> jax.Array:
    b, h, sq, d = q.shape
    sk = k.shape[2]
    dp = int(np.ceil(d / 128) * 128) if force_pad else _kernel_width(d)
    block_q = min(_default_block_q(), sq)

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
        # fp32 training at batch>=4 needs ~17MB scoped (K/V resident +
        # [block_q, S] probs + double buffering) vs the 16MB default;
        # v5e/v5p have 128MB physical VMEM.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(qm, km, vm)
    return out[:, :, :d].reshape(b, h, sq, d)


def _xla_attention(q, k, v, scale):
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


# -- head-packed forward (small head dims) -----------------------------------
#
# The MXU contracts 128 deep; a d=40 head uses 40/128 of that on Q.K^T and
# 40/128 of the output lanes on P.V — a 3.2x tax on the UNet's hottest
# attention (8 heads of 40 at 4096 tokens, SD v1.5 level 0). Packing
# pack=3 heads per kernel instance fixes both ends: queries concatenate on
# the feature axis ([Bq, 120]) and K/V become block-diagonal over
# (head-feature, head-sequence) so one [Bq,120] x [120, 3S] matmul computes
# all three heads' logits with zero cross-head terms, and one
# [Bq, 3S] x [3S, 120] matmul their outputs. Softmax is segmented per head
# via a [Bq, 3, S] view. Ghost heads (H not divisible by pack) are zero
# K/V/Q: their softmax is uniform, their PV is zero, and they are sliced
# away on unpack.


def _packed_fwd_kernel(q_ref, kbd_ref, vbd_ref, o_ref, *, scale: float,
                       pack: int, sk: int, d: int):
    q = q_ref[0]  # [Bq, Dpad] (pack*d useful lanes, then zero padding)
    kbd = kbd_ref[0]  # [pack*S, Dpad] block-diagonal
    vbd = vbd_ref[0]
    logits = (
        jax.lax.dot_general(
            q, kbd, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        * scale
    )  # [Bq, pack*S]
    # Segmented softmax via ALIGNED lane slices (S is a multiple of 128), not
    # a [Bq, pack, S] reshape — Mosaic implements lane-dim shape casts as
    # slow relayouts, measured 3x the whole kernel's budget. Normalization
    # happens before the PV matmul because the per-head denominators cannot
    # be mapped onto the packed d-lane output blocks without such a cast.
    parts = []
    for i in range(pack):
        seg = jax.lax.slice_in_dim(logits, i * sk, (i + 1) * sk, axis=1)
        m = jnp.max(seg, axis=-1, keepdims=True)
        p = jnp.exp(seg - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        parts.append(p * pl.reciprocal(denom, approx=False))
    pn = jnp.concatenate(parts, axis=-1)  # [Bq, pack*S]
    pv = jnp.dot(
        pn.astype(vbd.dtype), vbd, preferred_element_type=jnp.float32
    )  # [Bq, Dpad]
    o_ref[0] = pv.astype(o_ref.dtype)


def _packed_flash_fwd(q: jax.Array, k: jax.Array, v: jax.Array, scale: float,
                      pack: int) -> jax.Array:
    """Forward attention with ``pack`` heads fused per kernel instance.

    Requires pack*d <= 128. [B, H, S, D] -> [B, H, S, D].
    """
    b, h, sq, d = q.shape
    sk = k.shape[2]
    groups = -(-h // pack)
    hp = groups * pack
    dp = pack * d  # packed feature width; padded to 128 below if needed

    def pad_heads(x):
        if hp == h:
            return x
        return jnp.pad(x, ((0, 0), (0, hp - h), (0, 0), (0, 0)))

    qg = pad_heads(q).reshape(b, groups, pack, sq, d)
    kg = pad_heads(k).reshape(b, groups, pack, sk, d)
    vg = pad_heads(v).reshape(b, groups, pack, sk, d)

    # queries: concat pack heads on the feature axis -> [b*g, sq, pack*d]
    qp = qg.transpose(0, 1, 3, 2, 4).reshape(b * groups, sq, dp)

    # K/V: block-diagonal [b*g, pack*sk, pack*d]; head i occupies rows
    # [i*sk:(i+1)*sk] and cols [i*d:(i+1)*d]
    def blockdiag(x):  # x: [b, g, pack, sk, d]
        parts = [
            jnp.pad(x[:, :, i], ((0, 0), (0, 0), (0, 0), (i * d, dp - (i + 1) * d)))
            for i in range(pack)
        ]
        return jnp.concatenate(parts, axis=2).reshape(b * groups, pack * sk, dp)

    kbd = blockdiag(kg)
    vbd = blockdiag(vg)

    dpad = int(np.ceil(dp / 128) * 128)
    qp = _pad_to(qp, dpad, 2)
    kbd = _pad_to(kbd, dpad, 2)
    vbd = _pad_to(vbd, dpad, 2)

    block_q = min(128, sq)
    grid = (b * groups, pl.cdiv(sq, block_q))
    out = pl.pallas_call(
        functools.partial(_packed_fwd_kernel, scale=scale, pack=pack, sk=sk, d=d),
        out_shape=jax.ShapeDtypeStruct((b * groups, sq, dpad), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, dpad), lambda bg, i: (bg, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, pack * sk, dpad), lambda bg, i: (bg, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, pack * sk, dpad), lambda bg, i: (bg, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, dpad), lambda bg, i: (bg, i, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * groups * sq * pack * sk * dpad,
            bytes_accessed=(b * groups * (sq + 4 * pack * sk) * dpad)
            * q.dtype.itemsize,
            transcendentals=b * groups * sq * pack * sk,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(qp, kbd, vbd)

    # unpack: [b*g, sq, pack*d] -> [b, h, sq, d]
    out = out[:, :, :dp].reshape(b, groups, sq, pack, d)
    out = out.transpose(0, 1, 3, 2, 4).reshape(b, hp, sq, d)
    return out[:, :h]


# -- transpose-free packed attention on [B, S, H*D] --------------------------
#
# In the projection layout [B, S, H*D] the heads are already contiguous
# feature blocks — exactly the packed-query layout the kernel wants. Entering
# attention without ever materializing [B, H, S, D] avoids two minor-dim-40
# relayouts per tensor (split_heads + merge_heads), which measure as a large
# share of the 4096-token transformer block on TPU.


def _nhd_packed_inputs(q, k, v, h: int, pack: int):
    b, s, hd = q.shape
    d = hd // h
    groups = -(-h // pack)
    dp = pack * d
    dpad = int(np.ceil(dp / 128) * 128)

    def group_slices(x):
        """[B, S, H*D] -> [B*G, S, dpad]: each group's pack*d lanes, padded."""
        outs = []
        for g in range(groups):
            lo = g * dp
            hi = min((g + 1) * dp, hd)
            sl = jax.lax.slice_in_dim(x, lo, hi, axis=2)
            outs.append(_pad_to(sl, dpad, 2))
        return jnp.concatenate([o[:, None] for o in outs], axis=1).reshape(
            b * groups, s, dpad
        )

    def blockdiag(x):
        """[B, S, H*D] -> [B*G, pack*S, dpad] block-diagonal K/V."""
        gouts = []
        for g in range(groups):
            parts = []
            for i in range(pack):
                hidx = g * pack + i
                if hidx < h:
                    sl = jax.lax.slice_in_dim(x, hidx * d, (hidx + 1) * d, axis=2)
                else:
                    sl = jnp.zeros((b, s, d), x.dtype)
                parts.append(
                    jnp.pad(sl, ((0, 0), (0, 0), (i * d, dpad - (i + 1) * d)))
                )
            gouts.append(jnp.concatenate(parts, axis=1))  # [B, pack*S, dpad]
        return jnp.concatenate([o[:, None] for o in gouts], axis=1).reshape(
            b * groups, pack * s, dpad
        )

    return group_slices(q), blockdiag(k), blockdiag(v), groups, d, dp, dpad


def _packed_flash_nhd_fwd(q, k, v, h: int, pack: int, scale: float):
    b, s, hd = q.shape
    qp, kbd, vbd, groups, d, dp, dpad = _nhd_packed_inputs(q, k, v, h, pack)

    block_q = min(128, s)
    grid = (b * groups, pl.cdiv(s, block_q))
    out = pl.pallas_call(
        functools.partial(_packed_fwd_kernel, scale=scale, pack=pack, sk=s, d=d),
        out_shape=jax.ShapeDtypeStruct((b * groups, s, dpad), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, dpad), lambda bg, i: (bg, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, pack * s, dpad), lambda bg, i: (bg, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, pack * s, dpad), lambda bg, i: (bg, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, dpad), lambda bg, i: (bg, i, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * groups * s * pack * s * dpad,
            bytes_accessed=(b * groups * (s + 4 * pack * s) * dpad)
            * q.dtype.itemsize,
            transcendentals=b * groups * s * pack * s,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(qp, kbd, vbd)

    # [B*G, S, dpad] -> [B, S, H*D]: concat each group's useful lanes
    out = out.reshape(b, groups, s, dpad)
    parts = []
    for g in range(groups):
        useful = min(dp, hd - g * dp)
        parts.append(jax.lax.slice_in_dim(out[:, g], 0, useful, axis=2))
    return jnp.concatenate(parts, axis=-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def packed_flash_nhd(q, k, v, h: int, pack: int, scale: float):
    """Self-attention on [B, S, H*D] tensors without head transposes.

    Forward runs the head-packed Pallas kernel; backward recomputes through
    the per-head flash backward kernel (numerically identical attention).
    """
    return _packed_flash_nhd_fwd(q, k, v, h, pack, scale)


def _nhd_vjp_fwd(q, k, v, h, pack, scale):
    return _packed_flash_nhd_fwd(q, k, v, h, pack, scale), (q, k, v)


def _nhd_vjp_bwd(h, pack, scale, residuals, g):
    q, k, v = residuals
    b, s, hd = q.shape
    d = hd // h

    def to_bhsd(x):
        return x.reshape(b, s, h, d).transpose(0, 2, 1, 3)

    def to_nhd(x):
        return x.transpose(0, 2, 1, 3).reshape(b, s, hd)

    dq, dk, dv = _flash_bwd(
        to_bhsd(q), to_bhsd(k), to_bhsd(v), to_bhsd(g), scale
    )
    return to_nhd(dq), to_nhd(dk), to_nhd(dv)


packed_flash_nhd.defvjp(_nhd_vjp_fwd, _nhd_vjp_bwd)


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
    # The backward ALWAYS uses the explicit 128-lane pad: with the raw
    # head dim the two dk/dv accumulating stores on a 40-lane minor axis
    # sent Mosaic into a pathological compile (>45 min, round-3 A/B killed
    # by timeout), while the padded bwd compiles in minutes and measured
    # 9.39 steps/s on stage 2. The no-pad entry (_kernel_width) is a
    # forward-path win only.
    dp = int(np.ceil(d / 128) * 128)
    block_q = min(_default_block_q(), sq)

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
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
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
    # Differentiated (training) path: FORCE the padded entry. The no-pad
    # forward feeding the padded backward measured 17-25% slower end to
    # end (stage2 9.39 -> 7.80, stage3 16.06 -> 12.00 steps/s — layout
    # churn between the dense-40 fwd outputs/residuals and the 128-lane
    # bwd), so inference-only gets the no-pad win (_kernel_width).
    return _flash_fwd(q, k, v, scale, force_pad=True), (q, k, v)


def _vjp_bwd(scale, residuals, g):
    q, k, v = residuals
    return _flash_bwd(q, k, v, g, scale)


flash_attention.defvjp(_vjp_fwd, _vjp_bwd)


def flash_attention_wrapper(q, k, v, *, scale: float | None = None):
    if scale is None:
        scale = q.shape[-1] ** -0.5
    return flash_attention(q, k, v, float(scale))
