"""Opt-in int8 *wire format* for the host->device parameter upload
(``C2D_INT8_WIRE=1``).

On a tunneled TPU (this repo's axon bench host) the session cold start is
bound by uploading ~1.7 GiB of bf16 parameters over a ~10-25 MB/s tunnel
(BENCH_NOTES.md "Session cold start"). This module halves the bytes ON THE
WIRE only: large weight leaves are quantized on the host to int8 with
per-output-channel float32 scales, uploaded, and dequantized back to the
compute dtype on device by one tiny jitted program. Compute and HBM layout
after arrival are *identical* to the default path (bf16 everywhere); only
the transferred representation changes.

This is NOT ``ops/quant.py`` (the measured-and-rejected W8A8 serving path):
no activation ever sees int8 here, and the MXU math is untouched. The cost
is a one-time weight rounding error bounded per element by ``s/2`` where
``s = absmax/127`` per output channel (symmetric round-to-nearest over
[-127, 127]), i.e. <=0.4% of each channel's largest element. The frozen
image golden pins the default path; this mode is opt-in because the
rounding is a (small, tested) numerics change.

Eligibility: floating-point leaves with ``ndim >= 2`` and
``size >= min_size`` (default 64 Ki elements). Biases, norm scales and
other small/1-D leaves ride the wire untouched — they are a rounding
error of the byte count and disproportionately numerics-sensitive.

No reference counterpart: the reference loads torch weights from local
disk (reference scripts/inference.py:21-60); a remote-accelerator wire
format is a TPU-serving concern the reference never has.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Leaves smaller than this (elements) ride the wire in their native dtype.
MIN_WIRE_QUANT_SIZE = 1 << 16

_Q_KEYS = frozenset({"q8", "s"})


def _is_q8(leaf: Any) -> bool:
    # keys alone could collide with a genuine parameter subtree named
    # {'q8','s'}; require the payload dtypes too (int8 values, float
    # scales) so a real param subtree is never mis-expanded
    return (
        isinstance(leaf, dict)
        and set(leaf.keys()) == _Q_KEYS
        and getattr(leaf["q8"], "dtype", None) == np.int8
        and jnp.issubdtype(getattr(leaf["s"], "dtype", np.int8), jnp.floating)
    )


def quantize_wire(
    host_params: Any, min_size: int = MIN_WIRE_QUANT_SIZE
) -> Tuple[Any, Any, Dict[str, float]]:
    """Host-side: replace eligible leaves with ``{"q8", "s"}`` payload dicts
    (int8 values + per-last-axis float32 scales). Returns
    ``(wire_tree, dtypes, stats)``: ``wire_tree`` holds only arrays (safe
    for ``jax.device_put``), ``dtypes`` is a parallel tree of original
    dtype names for quantized leaves (None elsewhere), ``stats`` reports
    wire bytes before/after and leaf counts."""
    raw_bytes = 0
    wire_bytes = 0
    n_q = 0
    n_raw = 0

    def q(x: Any) -> Any:
        nonlocal raw_bytes, wire_bytes, n_q, n_raw
        x = np.asarray(x)
        raw_bytes += x.nbytes
        if (
            x.ndim < 2
            or x.size < min_size
            or not jnp.issubdtype(x.dtype, jnp.floating)
        ):
            n_raw += 1
            wire_bytes += x.nbytes
            return x
        f = x.astype(np.float32)
        # per-output-channel: one scale per index of the LAST axis (Dense
        # kernels are [in, out], conv kernels HWIO — out is last either way)
        s = np.max(np.abs(f), axis=tuple(range(f.ndim - 1))) / 127.0
        s = np.maximum(s, np.finfo(np.float32).tiny).astype(np.float32)
        q8 = np.clip(np.rint(f / s), -127, 127).astype(np.int8)
        n_q += 1
        wire_bytes += q8.nbytes + s.nbytes
        return {"q8": q8, "s": s}

    wire = jax.tree.map(q, host_params)
    dtypes = jax.tree.map(
        lambda w, x: str(np.asarray(x).dtype) if _is_q8(w) else None,
        wire,
        host_params,
        is_leaf=_is_q8,
    )
    return wire, dtypes, {
        "raw_bytes": float(raw_bytes),
        "wire_bytes": float(wire_bytes),
        "quantized_leaves": float(n_q),
        "raw_leaves": float(n_raw),
    }


def dequant_program(dtypes: Any):
    """The jitted wire->params expansion for a given dtype tree. Exposed so
    callers can AOT-compile it from abstract wire avals (``wire_sds``)
    before any timed upload — the first dequant call otherwise pays the
    elementwise program's compile inside the measurement."""

    def run(w):
        return jax.tree.map(
            lambda leaf, dt: (
                (leaf["q8"].astype(jnp.float32) * leaf["s"]).astype(jnp.dtype(dt))
                if dt is not None
                else leaf
            ),
            w,
            dtypes,
            is_leaf=_is_q8,
        )

    return jax.jit(run)


def dequantize_wire(wire_tree: Any, dtypes: Any) -> Any:
    """Expand a ``quantize_wire`` payload (host or device) back to the
    original parameter tree. One jitted elementwise program; raw leaves
    pass through unchanged."""
    return dequant_program(dtypes)(wire_tree)


def wire_sds(wire_tree: Any) -> Any:
    """Abstract (shape, dtype) tree of the wire payload ITSELF — the
    argument avals for lowering ``dequant_program`` without values."""
    return jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype
                                       if not hasattr(x, "dtype") else x.dtype),
        wire_tree,
    )


def wire_avals(wire_tree: Any, dtypes: Any) -> Any:
    """Abstract (shape, dtype) tree of the EXPANDED parameters a wire
    payload will dequantize to — lets AOT compilation start from a wire
    cache without ever materializing the fp tree on host."""
    return jax.tree.map(
        lambda leaf, dt: (
            jax.ShapeDtypeStruct(leaf["q8"].shape, np.dtype(dt))
            if dt is not None
            else jax.ShapeDtypeStruct(np.shape(leaf), np.asarray(leaf).dtype)
        ),
        wire_tree,
        dtypes,
        is_leaf=_is_q8,
    )


def _flatten(tree: Any):
    flat = {}

    def rec(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                assert "/" not in str(k), f"param name {k!r} contains '/'"
                rec(prefix + (str(k),), v)
        else:
            flat["/".join(prefix)] = np.asarray(node)

    rec((), tree)
    return flat


def _unflatten(flat: Dict[str, np.ndarray]) -> Any:
    tree: Dict[str, Any] = {}
    for key, v in flat.items():
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


# npz key for the embedded metadata record; '/' cannot collide with a
# flattened parameter path ('/' is the separator, bare '' is impossible)
_META_KEY = "__wire_meta__"


def save_wire_cache(path: str, wire_tree: Any, dtypes: Any) -> None:
    """Persist a quantized wire payload to ``path`` (one .npz), so later
    sessions skip both the fp restore (2x the disk bytes) and the host-side
    quantization pass. The dtype metadata is embedded IN the npz (as a
    uint8 JSON record) so the artifact is a single file and the tmp+rename
    write is genuinely atomic — a sidecar would need two renames and could
    be left stale by a crash between them."""
    import json

    flat = _flatten(wire_tree)
    assert _META_KEY not in flat, f"param path collides with {_META_KEY!r}"
    meta = {
        # npz drops non-native dtype names (bf16 comes back as raw V2):
        # record every leaf's dtype for a view-cast on load
        "leaf_dtypes": {k: str(v.dtype) for k, v in flat.items()},
        # dequant targets: the original dtype of each quantized leaf
        "dequant_dtypes": {
            "/".join(kp): dt
            for kp, dt in _flatten_dtypes(dtypes).items()
            if dt is not None
        },
    }
    flat[_META_KEY] = np.frombuffer(
        json.dumps(meta).encode("utf-8"), dtype=np.uint8
    )
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **flat)
    os.replace(tmp, path)


def _flatten_dtypes(dtypes: Any) -> Dict[tuple, Any]:
    flat: Dict[tuple, Any] = {}

    def rec(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                rec(prefix + (str(k),), v)
        else:
            flat[prefix] = node

    rec((), dtypes)
    return flat


def load_wire_cache(path: str) -> Tuple[Any, Any]:
    """Inverse of ``save_wire_cache``: returns ``(wire_tree, dtypes)``
    ready for ``jax.device_put`` + ``dequantize_wire``."""
    import json

    data = np.load(path)
    meta = json.loads(bytes(data[_META_KEY]).decode("utf-8"))
    missing = (set(meta["leaf_dtypes"]) | {_META_KEY}) ^ set(data.files)
    if missing:
        raise ValueError(f"wire cache {path}: key mismatch vs metadata: "
                         f"{sorted(missing)[:5]}...")
    flat = {}
    for k in data.files:
        if k == _META_KEY:
            continue
        v = data[k]
        want = meta["leaf_dtypes"][k]
        if str(v.dtype) != want:
            v = v.view(np.dtype(want))
        flat[k] = v
    wire = _unflatten(flat)
    flat_d = meta["dequant_dtypes"]

    def fill(prefix, node):
        out = {}
        for k, v in node.items():
            key = prefix + (str(k),)
            if _is_q8(v):
                out[k] = flat_d["/".join(key)]
            elif isinstance(v, dict):
                out[k] = fill(key, v)
            else:
                out[k] = None
        return out

    return wire, fill((), wire)


def upload_params(host_params: Any, int8_wire: bool = False) -> Any:
    """host numpy tree -> device tree. With ``int8_wire`` the transfer rides
    the int8 payload (~2x fewer tunnel bytes) and is expanded on device;
    otherwise a plain ``jax.device_put``. Either way the returned tree has
    the original dtypes/shapes."""
    if not int8_wire:
        return jax.device_put(host_params)
    wire, dtypes, _ = quantize_wire(host_params)
    return dequantize_wire(jax.device_put(wire), dtypes)
