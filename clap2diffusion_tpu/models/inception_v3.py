"""InceptionV3 (pool3, 2048-d) in Flax — the standard-FID feature extractor.

The reference's evaluator declares a ``fid_score`` metric but stubs it with
random numbers (reference scripts/evaluate.py:24-40). Standard FID is the
Frechet distance over InceptionV3 pool3 features (2048-d); this module is
the missing extractor so ``eval/metrics.py::frechet_distance`` (already
exact) produces real FID once weights are supplied.

Geometry is torchvision ``inception_v3`` (aux head excluded): stem of 5
conv+BN blocks with two 3x3/2 max-pools, then Mixed_5b..5d (InceptionA),
Mixed_6a (B), Mixed_6b..6e (C), Mixed_7a (D), Mixed_7b..7c (E), global
average pool -> [B, 2048] pool3 features, plus the 1000-way fc head (used
for a real Inception Score when weights are present).

Conversion: ``convert_inception_v3`` ingests a torchvision
``inception_v3(weights=...)`` state dict (the same module naming pytorch-fid
uses — weights are interchangeable between the two variants below).

Two pooling variants (``variant=``):

- ``"torchvision"`` (default): stock torchvision semantics —
  count_include_pad=True average pools everywhere. Pair with torchvision
  ImageNet weights for self-consistent FID numbers.
- ``"pytorch_fid"``: the TF-port semantics pytorch-fid patches in
  (``FIDInceptionA/C/E_1``: count_include_pad=False average pools in the
  pool branches; ``FIDInceptionE_2`` i.e. Mixed_7c: a 3x3/1 MAX pool
  instead of the average pool). Pair with pytorch-fid's TF-ported weights
  to reproduce **literature-comparable FID** — published FID numbers use
  this variant (Heusel et al.'s TF graph), not torchvision's.

BatchNorm is inference-only (this tower is never trained) and stored as
plain params (bn_scale/bn_bias/bn_mean/bn_var), applied in fp32 with
torchvision's eps=1e-3.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

BN_EPS = 1e-3
POOL3_DIM = 2048
NUM_CLASSES = 1000


def _pad(p):
    if isinstance(p, int):
        return ((p, p), (p, p))
    a, b = p
    return ((a, a), (b, b))


class ConvBN(nn.Module):
    """torchvision ``BasicConv2d``: bias-free conv + BatchNorm(eps=1e-3) + ReLU."""

    features: int
    kernel: tuple
    stride: int = 1
    padding: tuple | int = 0

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Conv(
            self.features,
            self.kernel,
            strides=(self.stride, self.stride),
            padding=_pad(self.padding),
            use_bias=False,
            name="conv",
        )(x)
        scale = self.param("bn_scale", nn.initializers.ones, (self.features,))
        bias = self.param("bn_bias", nn.initializers.zeros, (self.features,))
        mean = self.param("bn_mean", nn.initializers.zeros, (self.features,))
        var = self.param("bn_var", nn.initializers.ones, (self.features,))
        xf = x.astype(jnp.float32)
        y = (xf - mean) * jax.lax.rsqrt(var + BN_EPS) * scale + bias
        return nn.relu(y).astype(x.dtype)


VARIANTS = ("torchvision", "pytorch_fid")


def _avg_pool3(x, variant: str = "torchvision"):
    """The 3x3/1/pad-1 pool-branch pool. ``pytorch_fid`` excludes the zero
    padding from the average (count_include_pad=False) — pytorch-fid's
    FIDInceptionA/C/E_1 patch, which the TF-ported FID weights assume."""
    return nn.avg_pool(
        x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)),
        count_include_pad=(variant != "pytorch_fid"),
    )


class InceptionA(nn.Module):
    pool_features: int
    variant: str = "torchvision"

    @nn.compact
    def __call__(self, x):
        b1 = ConvBN(64, (1, 1), name="branch1x1")(x)
        b5 = ConvBN(48, (1, 1), name="branch5x5_1")(x)
        b5 = ConvBN(64, (5, 5), padding=2, name="branch5x5_2")(b5)
        b3 = ConvBN(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = ConvBN(96, (3, 3), padding=1, name="branch3x3dbl_2")(b3)
        b3 = ConvBN(96, (3, 3), padding=1, name="branch3x3dbl_3")(b3)
        bp = ConvBN(self.pool_features, (1, 1), name="branch_pool")(
            _avg_pool3(x, self.variant)
        )
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = ConvBN(384, (3, 3), stride=2, name="branch3x3")(x)
        bd = ConvBN(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = ConvBN(96, (3, 3), padding=1, name="branch3x3dbl_2")(bd)
        bd = ConvBN(96, (3, 3), stride=2, name="branch3x3dbl_3")(bd)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int
    variant: str = "torchvision"

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = ConvBN(192, (1, 1), name="branch1x1")(x)
        b7 = ConvBN(c7, (1, 1), name="branch7x7_1")(x)
        b7 = ConvBN(c7, (1, 7), padding=(0, 3), name="branch7x7_2")(b7)
        b7 = ConvBN(192, (7, 1), padding=(3, 0), name="branch7x7_3")(b7)
        bd = ConvBN(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = ConvBN(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_2")(bd)
        bd = ConvBN(c7, (1, 7), padding=(0, 3), name="branch7x7dbl_3")(bd)
        bd = ConvBN(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_4")(bd)
        bd = ConvBN(192, (1, 7), padding=(0, 3), name="branch7x7dbl_5")(bd)
        bp = ConvBN(192, (1, 1), name="branch_pool")(
            _avg_pool3(x, self.variant)
        )
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = ConvBN(192, (1, 1), name="branch3x3_1")(x)
        b3 = ConvBN(320, (3, 3), stride=2, name="branch3x3_2")(b3)
        b7 = ConvBN(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = ConvBN(192, (1, 7), padding=(0, 3), name="branch7x7x3_2")(b7)
        b7 = ConvBN(192, (7, 1), padding=(3, 0), name="branch7x7x3_3")(b7)
        b7 = ConvBN(192, (3, 3), stride=2, name="branch7x7x3_4")(b7)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    variant: str = "torchvision"
    pool_max: bool = False  # Mixed_7c in the pytorch_fid variant

    @nn.compact
    def __call__(self, x):
        b1 = ConvBN(320, (1, 1), name="branch1x1")(x)
        b3 = ConvBN(384, (1, 1), name="branch3x3_1")(x)
        b3 = jnp.concatenate(
            [
                ConvBN(384, (1, 3), padding=(0, 1), name="branch3x3_2a")(b3),
                ConvBN(384, (3, 1), padding=(1, 0), name="branch3x3_2b")(b3),
            ],
            axis=-1,
        )
        bd = ConvBN(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = ConvBN(384, (3, 3), padding=1, name="branch3x3dbl_2")(bd)
        bd = jnp.concatenate(
            [
                ConvBN(384, (1, 3), padding=(0, 1), name="branch3x3dbl_3a")(bd),
                ConvBN(384, (3, 1), padding=(1, 0), name="branch3x3dbl_3b")(bd),
            ],
            axis=-1,
        )
        if self.pool_max:
            # pytorch-fid FIDInceptionE_2: the TF graph uses a MAX pool in
            # Mixed_7c's pool branch where torchvision averages
            pooled = nn.max_pool(x, (3, 3), strides=(1, 1),
                                 padding=((1, 1), (1, 1)))
        else:
            pooled = _avg_pool3(x, self.variant)
        bp = ConvBN(192, (1, 1), name="branch_pool")(pooled)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3(nn.Module):
    """``__call__(pixels [B,H,W,3] in [-1,1]) -> {"pool3": [B,2048],
    "logits": [B,1000]}``.

    H=W=299 for standard FID; any H,W >= 75 works (global average pool).
    Set ``transform_input=True`` to reproduce torchvision's
    ``transform_input`` channel renormalization (maps [-1,1] inputs from
    the 0.5/0.5 convention onto ImageNet mean/std).

    ``variant="pytorch_fid"`` switches the pool-branch pooling to the
    TF-port semantics published FID numbers assume (module docstring);
    weights convert identically for both variants.
    """

    transform_input: bool = False
    variant: str = "torchvision"

    @nn.compact
    def __call__(self, x: jax.Array) -> dict:
        if self.variant not in VARIANTS:
            raise ValueError(
                f"unknown InceptionV3 variant {self.variant!r}; "
                f"expected one of {VARIANTS}"
            )
        if self.transform_input:
            ch0 = x[..., 0:1] * (0.229 / 0.5) + (0.485 - 0.5) / 0.5
            ch1 = x[..., 1:2] * (0.224 / 0.5) + (0.456 - 0.5) / 0.5
            ch2 = x[..., 2:3] * (0.225 / 0.5) + (0.406 - 0.5) / 0.5
            x = jnp.concatenate([ch0, ch1, ch2], axis=-1)
        x = ConvBN(32, (3, 3), stride=2, name="Conv2d_1a_3x3")(x)
        x = ConvBN(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = ConvBN(64, (3, 3), padding=1, name="Conv2d_2b_3x3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = ConvBN(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = ConvBN(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        v = self.variant
        x = InceptionA(pool_features=32, variant=v, name="Mixed_5b")(x)
        x = InceptionA(pool_features=64, variant=v, name="Mixed_5c")(x)
        x = InceptionA(pool_features=64, variant=v, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(channels_7x7=128, variant=v, name="Mixed_6b")(x)
        x = InceptionC(channels_7x7=160, variant=v, name="Mixed_6c")(x)
        x = InceptionC(channels_7x7=160, variant=v, name="Mixed_6d")(x)
        x = InceptionC(channels_7x7=192, variant=v, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE(variant=v, name="Mixed_7b")(x)
        x = InceptionE(variant=v, pool_max=(v == "pytorch_fid"),
                       name="Mixed_7c")(x)
        pool3 = jnp.mean(x, axis=(1, 2)).astype(jnp.float32)
        logits = nn.Dense(NUM_CLASSES, name="fc")(pool3)
        return {"pool3": pool3, "logits": logits}


def preprocess_images_inception(images: np.ndarray, image_size: int = 299) -> np.ndarray:
    """uint8 [B,H,W,3] -> float32 [B,299,299,3] in [-1,1].

    Bilinear resize (half-pixel centers == torch ``interpolate(...,
    align_corners=False)``, the pytorch-fid ``resize_input`` convention)
    then maps [0,1] -> [-1,1] (the ``normalize_input`` convention).
    """
    x = jnp.asarray(images, jnp.float32) / 255.0
    b, h, w, _ = x.shape
    if (h, w) != (image_size, image_size):
        x = jax.image.resize(x, (b, image_size, image_size, 3), method="bilinear")
    return np.asarray(x * 2.0 - 1.0)


def convert_inception_v3(sd) -> dict:
    """torchvision ``inception_v3`` state dict -> Flax params (strict).

    Every ``*.conv.weight`` defines a ConvBN at the same dotted path; the
    aux head (``AuxLogits.*``) and BN bookkeeping (``num_batches_tracked``)
    are skipped; everything else must be consumed or a ValueError names the
    leftovers (catches geometry drift / wrong checkpoints loudly).
    """

    def _np(t):
        return np.asarray(
            t.detach().cpu().numpy() if hasattr(t, "detach") else t, np.float32
        )

    sd = {k[len("module.") :] if k.startswith("module.") else k: v for k, v in sd.items()}
    consumed = set()
    params: dict = {}

    def put(path: str, leaf: dict) -> None:
        node = params
        for seg in path.split(".")[:-1]:
            node = node.setdefault(seg, {})
        node[path.split(".")[-1]] = leaf

    for key in list(sd):
        if not key.endswith(".conv.weight") or key.startswith("AuxLogits."):
            continue
        prefix = key[: -len(".conv.weight")]
        leaf = {
            "conv": {"kernel": _np(sd[key]).transpose(2, 3, 1, 0)},
            "bn_scale": _np(sd[prefix + ".bn.weight"]),
            "bn_bias": _np(sd[prefix + ".bn.bias"]),
            "bn_mean": _np(sd[prefix + ".bn.running_mean"]),
            "bn_var": _np(sd[prefix + ".bn.running_var"]),
        }
        put(prefix, leaf)
        consumed |= {
            key,
            prefix + ".bn.weight",
            prefix + ".bn.bias",
            prefix + ".bn.running_mean",
            prefix + ".bn.running_var",
        }

    if "fc.weight" in sd:
        params["fc"] = {"kernel": _np(sd["fc.weight"]).T, "bias": _np(sd["fc.bias"])}
        consumed |= {"fc.weight", "fc.bias"}
    else:
        # FID only needs pool3; keep the head at zero so apply() still runs.
        params["fc"] = {
            "kernel": np.zeros((POOL3_DIM, NUM_CLASSES), np.float32),
            "bias": np.zeros((NUM_CLASSES,), np.float32),
        }

    leftovers = [
        k
        for k in sd
        if k not in consumed
        and not k.startswith("AuxLogits.")
        and not k.endswith("num_batches_tracked")
    ]
    if leftovers:
        raise ValueError(f"unconsumed InceptionV3 keys: {sorted(leftovers)[:8]}...")
    return params
