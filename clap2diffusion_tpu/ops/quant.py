"""Opt-in W8A8 int8 serving path (``C2D_INT8=1``) for the UNet's MXU work.

MEASURED RESULT (v5e, same-session 10-step UNet CFG step traces): this
LOSES end-to-end — bf16 20.4 ms/step, int8 matmuls-only 25.1 ms (+23%),
int8 matmuls+convs 46.5 ms (2.3x); full-pipeline p50 2.68 s vs 1.23 s.
The isolated MXU wins (240 vs 139 TF/s on a 4096-square matmul chain,
138 vs 112 TOP/s on the b16 64x64x320 conv) do not survive composition:
each quantized site pays a serial absmax reduce + round/clip/cast pass
and an int32->fp dequant epilogue, which at SD widths cost more than the
int8 MXU saves on a step already at ~76% of the bf16 roofline. Kept as
the documented experiment per repo convention (cf. ops/winograd.py);
full A/B in BENCH_NOTES.md. The recipe, for the record:

- **Weights**: symmetric per-output-channel scales, quantized from the fp
  parameters *at trace time*. Under the DDIM ``lax.scan`` the weight-quant
  ops are loop-invariant, so XLA hoists them out of the 50-step loop — the
  parameter tree is unchanged (same trick as the fused-QKV concat,
  models/unet.py).
- **Activations**: symmetric per-tensor dynamic scale (absmax/127) computed
  inline. UNet conv/matmul inputs sit right after GroupNorm/LayerNorm+SiLU,
  so their range is well-conditioned for a per-tensor scale.
- **Accumulation** in int32 (``preferred_element_type``), dequantized by
  ``sx * sw[o]`` into the compute dtype, bias added after.

SERVE-ONLY: ``jnp.round``'s gradient is zero, so a backward pass through
this path silently kills weight gradients. ``train.trainer.run_stage``
refuses to start with ``C2D_INT8=1`` (tests/test_quant.py pins that).

This is NOT the reference's behavior (the reference serves fp16/fp32
torch; reference README.md:73) — it is an additional serving mode beyond
the parity surface, off by default; the frozen image golden pins the
default path. Expected drift: cosine similarity >0.99 on the epsilon
prediction per step (tests/test_quant.py measures it end-to-end).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def enabled() -> bool:
    """True when the user opted into int8 serving (``C2D_INT8=1``)."""
    return os.environ.get("C2D_INT8") == "1"


# Narrow layers stay fp: below this width the matmul is not MXU-bound (no
# int8 win) and the narrow layers (conv_in 4->320, conv_out ->4, epsilon
# head) are the drift-sensitive ones. Tests monkeypatch this to exercise
# the int8 path at tiny CI geometry.
INT8_MIN_WIDTH = 128


def eligible(*widths: int) -> bool:
    """True when every feature width is wide enough for the int8 path."""
    return enabled() and min(widths) >= INT8_MIN_WIDTH


def conv_eligible(*widths: int) -> bool:
    """Gate for 3x3 convolutions; ``C2D_INT8_CONV=0`` keeps them fp while
    the matmuls quantize (the A/B knob that isolated the conv path's
    regression — see BENCH_NOTES.md)."""
    return eligible(*widths) and os.environ.get("C2D_INT8_CONV", "1") != "0"


def _per_channel_scale(w: jax.Array, axis: Tuple[int, ...]) -> jax.Array:
    """Symmetric absmax scale over ``axis`` (the non-output axes), fp32."""
    s = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=axis)
    return jnp.maximum(s / 127.0, 1e-8)


def quantize_weight(w: jax.Array, out_axis: int) -> Tuple[jax.Array, jax.Array]:
    """fp weight -> (int8 weight, per-output-channel fp32 scale).

    ``out_axis`` is the output-feature axis (kept un-reduced). Called at
    trace time from fp params; loop-invariant under sampler scans.
    """
    reduce_axes = tuple(i for i in range(w.ndim) if i != out_axis)
    scale = _per_channel_scale(w, reduce_axes)
    shape = [1] * w.ndim
    shape[out_axis] = -1
    wi = jnp.round(w.astype(jnp.float32) / scale.reshape(shape))
    return jnp.clip(wi, -127, 127).astype(jnp.int8), scale


def quantize_dynamic(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Activation -> (int8 tensor, scalar fp32 scale), symmetric per-tensor."""
    scale = jnp.maximum(
        jnp.max(jnp.abs(x.astype(jnp.float32))) / 127.0, 1e-8
    )
    xi = jnp.round(x.astype(jnp.float32) / scale)
    return jnp.clip(xi, -127, 127).astype(jnp.int8), scale


def int8_conv(
    x: jax.Array,
    kernel: jax.Array,
    bias: Optional[jax.Array],
    *,
    strides: Tuple[int, int] = (1, 1),
    padding: str = "SAME",
) -> jax.Array:
    """W8A8 NHWC/HWIO convolution; returns x.dtype.

    ``kernel``/``bias`` are the fp parameters — quantization happens here,
    at trace time for the weights, inline for the activations.
    """
    dtype = x.dtype
    ki, sw = quantize_weight(kernel, out_axis=3)
    xi, sx = quantize_dynamic(x)
    y = jax.lax.conv_general_dilated(
        xi, ki, window_strides=strides, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * (sx * sw)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(dtype)


def int8_matmul(
    x: jax.Array,
    w: jax.Array,
    bias: Optional[jax.Array] = None,
) -> jax.Array:
    """W8A8 ``x @ w`` over the last axis of x; returns x.dtype.

    ``w`` is the fp [K, N] kernel (quantized per column at trace time).
    """
    dtype = x.dtype
    wi, sw = quantize_weight(w, out_axis=1)
    xi, sx = quantize_dynamic(x)
    y = jax.lax.dot_general(
        xi, wi, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * (sx * sw)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(dtype)
