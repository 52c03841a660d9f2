"""HTSAT (Swin-transformer audio tower) of CLAP, in Flax — TPU-native.

The reference consumes this through HF transformers
(reference models/audio_encoder.py:164-176, ``ClapModel.get_audio_features``);
there is no reference source to mirror, so this is written from the HTSAT /
HF-CLAP architecture spec (laion/clap-htsat-unfused geometry, verified
against transformers 4.57 ``modeling_clap.py``) with a weight converter in
``convert.py`` and random-init parity tests in tests/test_clap_parity.py.

Pipeline: log-mel [B,T,64] -> per-mel-bin batchnorm (inference stats) ->
reshape-to-image 256x256 (bicubic time-interp 1001->1024, align_corners, then
the HTSAT 4-way frequency stacking) -> 4x4 patch embed (96) -> 4 Swin stages
(depths 2,2,6,2 / heads 4,8,16,32 / window 8, shifted on odd layers, relative
position bias) with patch merging -> LN -> mean pool -> 512-d projection MLP
-> L2 normalize.

TPU notes: window partition/shift are pure reshape/transpose/roll (XLA fuses
them); the shifted-window attention masks and the bicubic interpolation
matrix are static numpy constants; all attention runs through the shared
fp32-softmax primitive in ops/attention.py.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from clap2diffusion_tpu.core.config import HTSATConfig


# ---------------------------------------------------------------------------
# Static (trace-time) helpers
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def relative_position_index(window: int) -> np.ndarray:
    """Swin relative position index [w*w, w*w] into the (2w-1)^2 bias table."""
    coords = np.stack(np.meshgrid(np.arange(window), np.arange(window), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # [2, ww, ww]
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += window - 1
    rel[:, :, 1] += window - 1
    rel[:, :, 0] *= 2 * window - 1
    return rel.sum(-1)


@functools.lru_cache(maxsize=None)
def shifted_window_mask(height: int, width: int, window: int, shift: int) -> np.ndarray:
    """Additive attention mask [num_windows, w*w, w*w] for SW-MSA (0 / -100)."""
    img = np.zeros((height, width), dtype=np.int32)
    cnt = 0
    for hs in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
        for ws in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
            img[hs, ws] = cnt
            cnt += 1
    win = (
        img.reshape(height // window, window, width // window, window)
        .transpose(0, 2, 1, 3)
        .reshape(-1, window * window)
    )
    diff = win[:, None, :] - win[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


@functools.lru_cache(maxsize=None)
def bicubic_resize_matrix(in_len: int, out_len: int, a: float = -0.75) -> np.ndarray:
    """Dense [out_len, in_len] matrix for 1-D bicubic resize with
    align_corners=True (torch F.interpolate semantics, Keys kernel a=-0.75)."""

    def kernel(x: np.ndarray) -> np.ndarray:
        x = np.abs(x)
        w = np.where(
            x <= 1.0,
            (a + 2) * x**3 - (a + 3) * x**2 + 1,
            np.where(x < 2.0, a * x**3 - 5 * a * x**2 + 8 * a * x - 4 * a, 0.0),
        )
        return w

    mat = np.zeros((out_len, in_len), dtype=np.float64)
    if out_len == 1:
        mat[0, 0] = 1.0
        return mat.astype(np.float32)
    scale = (in_len - 1) / (out_len - 1)
    for i in range(out_len):
        x = i * scale
        base = int(np.floor(x))
        for tap in range(-1, 3):
            j = base + tap
            w = kernel(x - j)
            jc = min(max(j, 0), in_len - 1)  # clamp at edges
            mat[i, jc] += w
    return mat.astype(np.float32)


# ---------------------------------------------------------------------------
# Modules
# ---------------------------------------------------------------------------


class WindowAttention(nn.Module):
    """W-MSA with relative position bias (separate q/k/v like HF)."""

    dim: int
    num_heads: int
    window: int

    @nn.compact
    def __call__(self, x: jax.Array, mask: np.ndarray | None) -> jax.Array:
        # x: [num_windows*B, w*w, C]
        nwb, ww, c = x.shape
        head_dim = self.dim // self.num_heads
        q = nn.Dense(self.dim, name="query")(x)
        k = nn.Dense(self.dim, name="key")(x)
        v = nn.Dense(self.dim, name="value")(x)

        def heads(t):
            return t.reshape(nwb, ww, self.num_heads, head_dim).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32)
        logits = logits / np.sqrt(head_dim)

        table = self.param(
            "relative_position_bias_table",
            nn.initializers.zeros,
            ((2 * self.window - 1) ** 2, self.num_heads),
        )
        idx = relative_position_index(self.window).reshape(-1)
        bias = table[idx].reshape(ww, ww, self.num_heads).transpose(2, 0, 1)
        logits = logits + bias[None].astype(jnp.float32)

        if mask is not None:
            nw = mask.shape[0]
            m = jnp.asarray(mask)[None, :, None]  # [1, nW, 1, ww, ww]
            logits = logits.reshape(nwb // nw, nw, self.num_heads, ww, ww) + m
            logits = logits.reshape(nwb, self.num_heads, ww, ww)

        probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        out = out.transpose(0, 2, 1, 3).reshape(nwb, ww, self.dim)
        return nn.Dense(self.dim, name="output")(out)


class SwinLayer(nn.Module):
    dim: int
    num_heads: int
    resolution: Tuple[int, int]
    window: int
    shift: int
    mlp_ratio: float = 4.0
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h_res, w_res = self.resolution
        window, shift = self.window, self.shift
        if min(self.resolution) <= window:
            window = min(self.resolution)
            shift = 0
        b, seq, c = x.shape

        shortcut = x
        x = nn.LayerNorm(epsilon=self.eps, name="layernorm_before")(x)
        x = x.reshape(b, h_res, w_res, c)
        if shift > 0:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
        # window partition: [B, H/w, w, W/w, w, C] -> [B*nW, w*w, C]
        x = x.reshape(b, h_res // window, window, w_res // window, window, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window * window, c)

        mask = (
            shifted_window_mask(h_res, w_res, window, shift) if shift > 0 else None
        )
        x = WindowAttention(
            dim=self.dim, num_heads=self.num_heads, window=window, name="attention"
        )(x, mask)

        # window reverse
        x = x.reshape(b, h_res // window, w_res // window, window, window, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h_res, w_res, c)
        if shift > 0:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))
        x = shortcut + x.reshape(b, seq, c)

        y = nn.LayerNorm(epsilon=self.eps, name="layernorm_after")(x)
        y = nn.Dense(int(self.dim * self.mlp_ratio), name="intermediate")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, name="mlp_output")(y)
        return x + y


class PatchMerging(nn.Module):
    dim: int
    resolution: Tuple[int, int]
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h_res, w_res = self.resolution
        b, seq, c = x.shape
        x = x.reshape(b, h_res, w_res, c)
        x = jnp.concatenate(
            [x[:, 0::2, 0::2], x[:, 1::2, 0::2], x[:, 0::2, 1::2], x[:, 1::2, 1::2]],
            axis=-1,
        ).reshape(b, (h_res // 2) * (w_res // 2), 4 * c)
        x = nn.LayerNorm(epsilon=self.eps, name="norm")(x)
        return nn.Dense(2 * self.dim, use_bias=False, name="reduction")(x)


class HTSATEncoder(nn.Module):
    """log-mel [B, T, F] -> pooled hidden [B, 768]."""

    cfg: HTSATConfig
    max_frames: int = 1024

    @nn.compact
    def __call__(self, log_mel: jax.Array) -> jax.Array:
        c = self.cfg
        b, t, f = log_mel.shape
        freq_ratio = c.spec_size // c.num_mel_bins  # 4

        # Per-mel-bin batchnorm, inference statistics (HF applies BatchNorm2d
        # over the mel axis before reshaping).
        bn_scale = self.param("bn_scale", nn.initializers.ones, (f,))
        bn_bias = self.param("bn_bias", nn.initializers.zeros, (f,))
        bn_mean = self.param("bn_mean", nn.initializers.zeros, (f,))
        bn_var = self.param("bn_var", nn.initializers.ones, (f,))
        x = (log_mel - bn_mean) * jax.lax.rsqrt(bn_var + 1e-5) * bn_scale + bn_bias

        # reshape_mel2img: time 1001 -> 1024 bicubic (align_corners), then
        # stack freq_ratio time-quarters along the mel axis -> 256x256 image.
        spec_width = c.spec_size * freq_ratio  # 1024
        if t != spec_width:
            interp = jnp.asarray(bicubic_resize_matrix(t, spec_width))
            x = jnp.einsum("ot,btf->bof", interp, x)
        # [B, 1024, 64] -> [B, 4, 256, 64] -> [B, 4, 64, 256] -> [B, 256, 256]
        x = x.reshape(b, freq_ratio, spec_width // freq_ratio, f)
        x = x.transpose(0, 1, 3, 2)
        x = x.reshape(b, freq_ratio * f, spec_width // freq_ratio)

        # Patch embed 4x4/4 (NHWC), flatten, LN.
        img = x[..., None]  # [B, 256, 256, 1]
        h = nn.Conv(
            c.patch_embed_dim,
            (c.patch_size, c.patch_size),
            strides=c.patch_stride,
            padding="VALID",
            name="patch_embed",
        )(img)
        grid = (c.spec_size // c.patch_stride[0], c.spec_size // c.patch_stride[1])
        h = h.reshape(b, grid[0] * grid[1], c.patch_embed_dim)
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, name="patch_norm")(h)

        res = grid
        dim = c.patch_embed_dim
        for stage, (depth, heads) in enumerate(zip(c.depths, c.num_heads)):
            for i in range(depth):
                h = SwinLayer(
                    dim=dim,
                    num_heads=heads,
                    resolution=res,
                    window=c.window_size,
                    shift=0 if i % 2 == 0 else c.window_size // 2,
                    mlp_ratio=c.mlp_ratio,
                    eps=c.layer_norm_eps,
                    name=f"stage_{stage}_layer_{i}",
                )(h)
            if stage < len(c.depths) - 1:
                h = PatchMerging(
                    dim=dim, resolution=res, eps=c.layer_norm_eps,
                    name=f"stage_{stage}_downsample",
                )(h)
                res = (res[0] // 2, res[1] // 2)
                dim *= 2

        h = nn.LayerNorm(epsilon=c.layer_norm_eps, name="norm")(h)
        # HF's freq-bin regroup + AdaptiveAvgPool1d(1) is a permutation
        # followed by a global mean -> identical to a plain token mean.
        return jnp.mean(h, axis=1)


class ClapAudioTower(nn.Module):
    """Full audio side: HTSAT + 2-layer projection + L2 normalize -> [B,512]."""

    cfg: HTSATConfig

    @nn.compact
    def __call__(self, log_mel: jax.Array) -> jax.Array:
        pooled = HTSATEncoder(cfg=self.cfg, name="encoder")(log_mel)
        h = nn.Dense(self.cfg.projection_dim, name="projection_1")(pooled)
        h = nn.relu(h)
        h = nn.Dense(self.cfg.projection_dim, name="projection_2")(h)
        h32 = h.astype(jnp.float32)
        return (h32 / jnp.linalg.norm(h32, axis=-1, keepdims=True)).astype(h.dtype)
