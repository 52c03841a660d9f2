"""CLIP ViT-L/14 vision encoder in Flax — the image side of CLIPScore.

The reference's evaluator claims a CLIP score but returns random numbers
(reference scripts/evaluate.py:32-40); with this tower (+ the text tower in
clip_text.py) the metric is real once OpenAI CLIP weights are converted.

Geometry: patch 14, image 224, width 1024, 24 layers, 16 heads, quick-GELU,
class token, pre/post layernorm, 1024 -> 768 visual projection.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from clap2diffusion_tpu.core.config import CLIPVisionConfig
from clap2diffusion_tpu.models.clip_text import quick_gelu
from clap2diffusion_tpu.ops.attention import mha

# OpenAI CLIP preprocessing constants
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


class CLIPVisionLayer(nn.Module):
    cfg: CLIPVisionConfig

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = self.cfg
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, name="layer_norm1")(x)
        q = nn.Dense(c.hidden_size, name="q_proj")(h)
        k = nn.Dense(c.hidden_size, name="k_proj")(h)
        v = nn.Dense(c.hidden_size, name="v_proj")(h)
        attn = mha(q, k, v, c.num_heads)
        x = x + nn.Dense(c.hidden_size, name="out_proj")(attn)
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, name="layer_norm2")(x)
        h = nn.Dense(c.intermediate_size, name="fc1")(h)
        h = quick_gelu(h)
        return x + nn.Dense(c.hidden_size, name="fc2")(h)


class CLIPVisionEncoder(nn.Module):
    """``__call__(pixels [B,224,224,3] CLIP-normalized) -> features [B,768]``
    (L2-normalized image features, CLIPModel.get_image_features semantics)."""

    cfg: CLIPVisionConfig

    @nn.compact
    def __call__(self, pixels: jax.Array) -> jax.Array:
        c = self.cfg
        b = pixels.shape[0]
        n_patches = (c.image_size // c.patch_size) ** 2

        patches = nn.Conv(
            c.hidden_size,
            (c.patch_size, c.patch_size),
            strides=c.patch_size,
            padding="VALID",
            use_bias=False,
            name="patch_embedding",
        )(pixels)
        patches = patches.reshape(b, n_patches, c.hidden_size)

        cls = self.param(
            "class_embedding", nn.initializers.normal(0.02), (c.hidden_size,)
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls[None, None], (b, 1, c.hidden_size)).astype(
                patches.dtype), patches],
            axis=1,
        )
        pos = self.param(
            "position_embedding",
            nn.initializers.normal(0.02),
            (n_patches + 1, c.hidden_size),
        )
        x = x + pos[None].astype(x.dtype)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="pre_layrnorm")(x)

        for i in range(c.num_layers):
            x = CLIPVisionLayer(cfg=c, name=f"layer_{i}")(x)

        pooled = nn.LayerNorm(epsilon=c.layer_norm_eps, name="post_layernorm")(
            x[:, 0]
        )
        feats = nn.Dense(c.projection_dim, use_bias=False,
                         name="visual_projection")(pooled)
        f32 = feats.astype(jnp.float32)
        return (f32 / jnp.linalg.norm(f32, axis=-1, keepdims=True)).astype(
            feats.dtype
        )


def preprocess_images_device(images: jax.Array, image_size: int = 224) -> jax.Array:
    """uint8 [B,H,W,3] -> CLIP-normalized float32 [B,224,224,3] (bilinear
    resize + center crop + mean/std). Pure-jnp so it can live INSIDE a
    jitted program (the best-of-n reranker scores candidates on device and
    fetches only the winner); shapes are static under trace."""
    import jax.image

    x = images.astype(jnp.float32) / 255.0
    b, h, w, _ = x.shape
    scale = image_size / min(h, w)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    x = jax.image.resize(x, (b, nh, nw, 3), method="bilinear")
    top, left = (nh - image_size) // 2, (nw - image_size) // 2
    x = x[:, top : top + image_size, left : left + image_size, :]
    return (x - CLIP_MEAN) / CLIP_STD


def preprocess_images(images: np.ndarray, image_size: int = 224) -> np.ndarray:
    """Host wrapper over ``preprocess_images_device`` (same numerics)."""
    return np.asarray(preprocess_images_device(jnp.asarray(images), image_size))


def convert_clip_vision(sd, cfg: CLIPVisionConfig | None = None):
    """transformers CLIPVisionModel(+projection) state dict -> params."""
    cfg = cfg or CLIPVisionConfig()

    def _np(t):
        return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t,
                          np.float32)

    def dense(p):
        out = {"kernel": _np(sd[p + ".weight"]).T}
        if p + ".bias" in sd:
            out["bias"] = _np(sd[p + ".bias"])
        return out

    def ln(p):
        return {"scale": _np(sd[p + ".weight"]), "bias": _np(sd[p + ".bias"])}

    v = "vision_model." if any(k.startswith("vision_model.") for k in sd) else ""
    params = {
        "class_embedding": _np(sd[v + "embeddings.class_embedding"]),
        "position_embedding": _np(sd[v + "embeddings.position_embedding.weight"]),
        "patch_embedding": {
            "kernel": _np(sd[v + "embeddings.patch_embedding.weight"]).transpose(
                2, 3, 1, 0
            )
        },
        "pre_layrnorm": ln(v + "pre_layrnorm"),
        "post_layernorm": ln(v + "post_layernorm"),
    }
    if "visual_projection.weight" in sd:
        params["visual_projection"] = {"kernel": _np(sd["visual_projection.weight"]).T}
    for i in range(cfg.num_layers):
        lp = f"{v}encoder.layers.{i}"
        params[f"layer_{i}"] = {
            "layer_norm1": ln(lp + ".layer_norm1"),
            "layer_norm2": ln(lp + ".layer_norm2"),
            "q_proj": dense(lp + ".self_attn.q_proj"),
            "k_proj": dense(lp + ".self_attn.k_proj"),
            "v_proj": dense(lp + ".self_attn.v_proj"),
            "out_proj": dense(lp + ".self_attn.out_proj"),
            "fc1": dense(lp + ".mlp.fc1"),
            "fc2": dense(lp + ".mlp.fc2"),
        }
    return params


def clip_text_features(hidden, input_ids, text_projection_kernel, eot_id=49_407):
    """CLIPModel.get_text_features semantics: take the first-EOT token's
    hidden state, apply the text projection, L2-normalize.

    hidden: [B, 77, 768] (CLIPTextEncoder output); text_projection_kernel:
    [768, 768] (converted via models/convert.py when present in the
    checkpoint)."""
    import jax.numpy as jnp

    idx = jnp.argmax((input_ids == eot_id).astype(jnp.int32), axis=-1)
    pooled = hidden[jnp.arange(hidden.shape[0]), idx]
    feats = (pooled @ text_projection_kernel).astype(jnp.float32)
    return feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
