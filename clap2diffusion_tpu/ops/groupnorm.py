"""Fused GroupNorm + SiLU Pallas kernel.

Every UNet/VAE resnet block starts with GroupNorm -> SiLU (-> conv); fusing
norm+activation into one VMEM pass removes two HBM round-trips per block —
SD v1.5 has ~60 such blocks per UNet step, x100 UNet calls per 50-step CFG
image (SURVEY.md section 7: "fused GroupNorm+conv(+SiLU)").

Kernel strategy: grid over batch; the [H*W, C] slab lives in VMEM; per-group
statistics are computed channel-wise (a [C] sum over the spatial axis, then a
tiny per-group combine), so reductions stay on the natural TPU layout
instead of a badly-tiled [HW, G, C/G] reshape. Slabs bigger than the VMEM
budget fall back to the XLA implementation (VAE's 512x512 layers), which XLA
fuses adequately at that arithmetic intensity.

Forward-only fusion: under autodiff the custom_vjp recomputes with the XLA
path (numerically identical).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

VMEM_BUDGET_BYTES = 6 * 1024 * 1024


def _kernel(x_ref, scale_ref, bias_ref, o_ref, *, groups: int, eps: float):
    x = x_ref[0].astype(jnp.float32)  # [HW, C]
    hw, c = x.shape
    cg = c // groups

    # Per-group stats via mask matmuls (Mosaic-friendly: no 1-D reshapes).
    # mask[c, g] = 1 if channel c belongs to group g; a trace-time constant.
    cols = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0) // cg
    grp = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
    mask = (cols == grp).astype(jnp.float32)  # [C, G]

    s1 = jnp.sum(x, axis=0, keepdims=True)  # [1, C]
    s2 = jnp.sum(x * x, axis=0, keepdims=True)
    g1 = jnp.dot(s1, mask, preferred_element_type=jnp.float32)  # [1, G]
    g2 = jnp.dot(s2, mask, preferred_element_type=jnp.float32)
    count = hw * cg
    mean_g = g1 / count
    var_g = g2 / count - mean_g * mean_g
    inv_g = jax.lax.rsqrt(var_g + eps)

    # broadcast back to channels: [1, G] @ [G, C]
    mean_c = jnp.dot(mean_g, mask.T, preferred_element_type=jnp.float32)
    inv_c = jnp.dot(inv_g, mask.T, preferred_element_type=jnp.float32)
    y = (x - mean_c) * inv_c
    y = y * scale_ref[:].astype(jnp.float32)[None, :] + bias_ref[:].astype(
        jnp.float32
    )[None, :]
    y = y * jax.nn.sigmoid(y)  # SiLU
    o_ref[0] = y.astype(o_ref.dtype)


def _xla_group_norm(x, scale, bias, groups, eps, silu):
    """Reshape-free GroupNorm (+optional SiLU) over NHWC.

    The naive formulation reshapes the big activation to
    [B, HW, G, C/G] — with SD's C/G = 10 that splits the 128-lane channel
    dim into a badly tiled 5-D layout, and the profile shows the resulting
    relayouts/converts costing ~15% of a UNet step ('data formatting').
    Instead: per-channel spatial sums on the native [B,H,W,C] tiling (a
    sublane reduction), a tiny [B,C]->[B,G] combine, then ONE fused
    elementwise pass ``x * a + b`` with the affine folded per channel.
    Statistics accumulate in float32 regardless of input dtype.
    """
    b, h, w, c = x.shape
    cg = c // groups
    # Stats in f32 over the (possibly bf16) input. XLA CSEs the casts and
    # chooses to materialize one f32 copy feeding the two reduces and the
    # final elementwise (~0.6 ms/UNet-step in the trace); formulations that
    # cast per-consumer trace to the identical jaxpr, so that copy is the
    # compiler's call, not ours.
    xf = x.astype(jnp.float32)
    s1 = jnp.sum(xf, axis=(1, 2))  # [B, C]
    s2 = jnp.sum(jnp.square(xf), axis=(1, 2))
    g1 = jnp.sum(s1.reshape(b, groups, cg), axis=-1)  # [B, G]
    g2 = jnp.sum(s2.reshape(b, groups, cg), axis=-1)
    n = h * w * cg
    mean = g1 / n
    # one-pass variance can go (slightly) negative via cancellation when
    # |mean| >> std; clamp before rsqrt or eps may not save it from NaN
    var = jnp.maximum(g2 / n - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    # fold (x - mean) * inv * scale + bias into x * a + b per channel
    inv_c = jnp.repeat(inv, cg, axis=1)  # [B, C]
    mean_c = jnp.repeat(mean, cg, axis=1)
    a = inv_c * scale.astype(jnp.float32)[None, :]
    off = bias.astype(jnp.float32)[None, :] - mean_c * a
    y = xf * a[:, None, None, :] + off[:, None, None, :]
    if silu:
        y = y * jax.nn.sigmoid(y)
    return y.astype(x.dtype)


def _xla_group_norm_silu(x, scale, bias, groups, eps):
    return _xla_group_norm(x, scale, bias, groups, eps, silu=True)


def _pallas_group_norm_silu(x, scale, bias, groups: int, eps: float):
    b, h, w, c = x.shape
    xf = x.reshape(b, h * w, c)
    out = pl.pallas_call(
        functools.partial(_kernel, groups=groups, eps=eps),
        out_shape=jax.ShapeDtypeStruct(xf.shape, x.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h * w, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h * w, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )(xf, scale, bias)
    return out.reshape(b, h, w, c)


def _eligible(x, groups: int) -> bool:
    # Measured on v5e: the standalone GN+SiLU kernel LOSES to XLA's own
    # norm+activation+conv fusion on the 50-step DDIM path (1.55s vs 1.30s
    # p50/image) — per-call launch overhead x ~12k calls dominates. Keep the
    # kernel opt-in (C2D_FUSED_GN=1) pending a conv-fused variant.
    import os

    if os.environ.get("C2D_FUSED_GN") != "1":
        return False
    b, h, w, c = x.shape
    if c % groups or c % 128:
        return False
    if (h * w) % 8:
        return False
    # input + output + fp32 working copy
    if (h * w) * c * (x.dtype.itemsize * 2 + 4) > VMEM_BUDGET_BYTES:
        return False
    return jax.default_backend() in ("tpu", "axon")


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def group_norm_silu(x, scale, bias, groups: int = 32, eps: float = 1e-5):
    """Fused GroupNorm+SiLU over NHWC. Pallas on TPU when the slab fits
    VMEM; XLA otherwise."""
    if _eligible(x, groups):
        return _pallas_group_norm_silu(x, scale, bias, groups, eps)
    return _xla_group_norm_silu(x, scale, bias, groups, eps)


def _fwd(x, scale, bias, groups, eps):
    return group_norm_silu(x, scale, bias, groups, eps), (x, scale, bias)


def _bwd(groups, eps, res, g):
    x, scale, bias = res
    _, vjp = jax.vjp(
        lambda x, s, b: _xla_group_norm_silu(x, s, b, groups, eps), x, scale, bias
    )
    return vjp(g)


group_norm_silu.defvjp(_fwd, _bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def group_norm(x, scale, bias, groups: int = 32, eps: float = 1e-5):
    """Plain GroupNorm over NHWC (no activation), reshape-free math."""
    return _xla_group_norm(x, scale, bias, groups, eps, silu=False)


def _gn_fwd(x, scale, bias, groups, eps):
    return group_norm(x, scale, bias, groups, eps), (x, scale, bias)


def _gn_bwd(groups, eps, res, g):
    x, scale, bias = res
    _, vjp = jax.vjp(
        lambda x, s, b: _xla_group_norm(x, s, b, groups, eps, silu=False),
        x, scale, bias,
    )
    return vjp(g)


group_norm.defvjp(_gn_fwd, _gn_bwd)


def make_group_norm_module():
    """Drop-in for flax nn.GroupNorm over NHWC (same param names/shapes),
    using the reshape-free statistics path."""
    from flax import linen as nn

    class GroupNorm(nn.Module):
        num_groups: int = 32
        epsilon: float = 1e-5

        @nn.compact
        def __call__(self, x):
            c = x.shape[-1]
            scale = self.param("scale", nn.initializers.ones, (c,))
            bias = self.param("bias", nn.initializers.zeros, (c,))
            return group_norm(
                x, scale.astype(x.dtype), bias.astype(x.dtype),
                self.num_groups, self.epsilon,
            )

    return GroupNorm


def make_group_norm_silu_module():
    """flax Module wrapper with nn.GroupNorm's param names (scale/bias), so
    checkpoints and converters are layout-identical to nn.GroupNorm."""
    from flax import linen as nn

    class GroupNormSiLU(nn.Module):
        groups: int = 32
        epsilon: float = 1e-5

        @nn.compact
        def __call__(self, x):
            c = x.shape[-1]
            scale = self.param("scale", nn.initializers.ones, (c,))
            bias = self.param("bias", nn.initializers.zeros, (c,))
            return group_norm_silu(
                x, scale.astype(x.dtype), bias.astype(x.dtype),
                self.groups, self.epsilon,
            )

    return GroupNormSiLU


GroupNormSiLU = make_group_norm_silu_module()
GroupNorm = make_group_norm_module()
