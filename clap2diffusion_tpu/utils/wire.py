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
# v2 packed artifact: raw binary container (see save_wire_cache)
_WIRE_MAGIC = b"C2DWIRE2"
# group buffers start on page-sized boundaries so the read-only memmaps
# and the upload stream stay aligned
_WIRE_ALIGN = 4096


def pack_wire(wire_tree: Any) -> Tuple[Dict[str, np.ndarray], list]:
    """Flatten a wire tree into ONE contiguous 1-D buffer PER DTYPE plus a
    layout ``[(key, dtype_str, shape, offset_elems), ...]`` (offsets are
    element indices into that dtype's buffer). A handful of buffers means a
    handful of host->device transfers: measured on the axon tunnel, the
    2,039-leaf tree upload pays ~25% in per-transfer RPC overhead (101.2 s
    vs 78.1 s for the same 1.04 GiB as a single array, sustained ~10.6 vs
    13.7 MB/s), and the few-entry npz read restores in ~1 s where the
    per-leaf decode took 5-15 s.

    Grouping is by dtype — NOT one uint8 buffer with device-side bitcasts
    — because a bitcast needs the bytes reshaped to ``[n, itemsize]`` and
    TPU tiled layouts pad the minor axis to 128 lanes: the Mosaic/XLA
    compiler rejected the uint8 formulation with a 35.8 GB allocation (32x
    blowup of the 1.04 GiB payload). Same-dtype 1-D slices + reshapes
    carry no such tax."""
    flat = _flatten(wire_tree)
    layout = []
    sizes: Dict[str, int] = {}
    for k in sorted(flat):
        v = flat[k]
        dt = str(v.dtype)
        off = sizes.get(dt, 0)
        layout.append((k, dt, list(v.shape), off))
        sizes[dt] = off + v.size
    groups = {dt: np.empty(n, _np_dtype(dt)) for dt, n in sizes.items()}
    for (k, dt, _, off) in layout:
        v = flat[k]
        groups[dt][off:off + v.size] = np.ascontiguousarray(v).ravel()
    return groups, layout


def _np_dtype(name: str) -> np.dtype:
    return np.dtype(name)  # ml_dtypes registers 'bfloat16' with numpy


def packed_views(groups: Dict[str, np.ndarray], layout: list) -> Any:
    """Rebuild the wire tree as ZERO-COPY host views into the group
    buffers."""
    flat = {
        k: groups[dt][off:off + int(np.prod(shape, dtype=np.int64))]
        .reshape(shape)
        for k, dt, shape, off in layout
    }
    return _unflatten(flat)


def packed_avals(layout: list, dequant_dtypes: Dict[str, str]) -> Any:
    """Abstract (shape, dtype) tree of the EXPANDED parameters a packed
    payload will unpack+dequantize to — lets AOT compilation start from a
    v2 wire cache without materializing anything."""
    flat = {}
    for k, dt, shape, _ in layout:
        if k.endswith("/q8") and k[:-3] in dequant_dtypes:
            flat[k[:-3]] = jax.ShapeDtypeStruct(
                tuple(shape), _np_dtype(dequant_dtypes[k[:-3]]))
        elif k.endswith("/s") and k[:-2] in dequant_dtypes:
            continue
        else:
            flat[k] = jax.ShapeDtypeStruct(tuple(shape), _np_dtype(dt))
    return _unflatten(flat)


def packed_dequant_program(layout: list, dequant_dtypes: Dict[str, str]):
    """The jitted packed-buffers -> parameter-tree expansion: per leaf a
    static 1-D ``lax.slice`` + reshape out of its dtype's buffer (same
    dtype throughout — no bitcasts, no layout tax; see ``pack_wire``),
    fused with the int8 dequant for quantized leaves — upload and
    expansion are one device program, and the donated buffers are freed
    on exit."""
    from jax import lax

    def run(groups):
        flat = {}
        for k, dt, shape, off in layout:
            n = int(np.prod(shape, dtype=np.int64))
            seg = lax.slice(groups[dt], (off,), (off + n,))
            flat[k] = seg.reshape(shape)
        out = {}
        for k, arr in flat.items():
            if k.endswith("/q8") and k[:-3] in dequant_dtypes:
                base = k[:-3]
                out[base] = (arr.astype(jnp.float32) * flat[base + "/s"]
                             ).astype(_np_dtype(dequant_dtypes[base]))
            elif k.endswith("/s") and k[:-2] in dequant_dtypes:
                continue
            else:
                out[k] = arr
        return _unflatten(out)

    return jax.jit(run, donate_argnums=0)


def dequant_map(dtypes: Any) -> Dict[str, str]:
    """Flatten a ``quantize_wire`` dtype tree to the ``{path: dtype_str}``
    mapping the packed-format APIs consume."""
    return {
        "/".join(kp): dt
        for kp, dt in _flatten_dtypes(dtypes).items()
        if dt is not None
    }


def save_wire_cache(path: str, wire_tree: Any, dtypes: Any,
                    packed_layout: Tuple[np.ndarray, list] | None = None) -> None:
    """Persist a quantized wire payload to ``path`` (one .npz, v2 packed
    format: a single contiguous buffer + JSON layout), so later sessions
    skip the fp restore (2x the disk bytes), the host quantize pass, AND
    the per-leaf decode/transfer overhead (see ``pack_wire``). The
    metadata is embedded IN the npz (as a uint8 JSON record) so the
    artifact is a single file and the tmp+rename write is genuinely
    atomic. ``packed_layout`` accepts a precomputed ``pack_wire`` result so
    a caller that also uploads the payload packs only once.

    The container is a raw binary (magic + JSON header + 4 KiB-aligned
    group buffers), NOT an npz: np.load's zipfile path CRC32-scans every
    byte, which cost 16 s on the 1.04 GiB payload — the memory-mapped raw
    layout loads in milliseconds and the upload then streams straight from
    the page cache."""
    import json

    groups, layout = packed_layout if packed_layout else pack_wire(wire_tree)
    rel = {}
    off = 0
    for dt in sorted(groups):
        off = -off % _WIRE_ALIGN + off
        rel[dt] = off
        off += groups[dt].nbytes
    header = json.dumps({
        "version": 2,
        "layout": layout,
        # {dtype: [element_count, byte_offset relative to data_start]}
        "groups": {dt: [int(groups[dt].size), rel[dt]] for dt in groups},
        "dequant_dtypes": dequant_map(dtypes),
    }).encode("utf-8")
    data_start = 16 + len(header)
    data_start += -data_start % _WIRE_ALIGN
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(_WIRE_MAGIC)
        f.write(np.uint64(len(header)).tobytes())
        f.write(header)
        for dt in sorted(groups):
            f.seek(data_start + rel[dt])
            f.write(np.ascontiguousarray(groups[dt]).view(np.uint8).data)
    os.replace(tmp, path)


def load_packed_wire(path: str) -> Tuple[Dict[str, np.ndarray], list,
                                         Dict[str, str]]:
    """Fast path for a v2 wire cache: returns ``(groups, layout,
    dequant_dtypes)`` with the group buffers MEMORY-MAPPED read-only from
    the artifact (no copy, no checksum scan) — feed ``groups`` to one
    ``jax.device_put`` and run ``packed_dequant_program(layout,
    dequant_dtypes)`` on it. Raises ``ValueError`` for a v1 (npz
    per-leaf) artifact."""
    import json

    size = os.path.getsize(path)
    with open(path, "rb") as f:
        magic = f.read(8)
        if magic != _WIRE_MAGIC:
            raise ValueError(f"wire cache {path}: not a v2 packed artifact")
        (hlen,) = np.frombuffer(f.read(8), np.uint64)
        header = json.loads(f.read(int(hlen)).decode("utf-8"))
    if header.get("version") != 2:
        raise ValueError(f"wire cache {path}: unsupported version "
                         f"{header.get('version')}")
    data_start = 16 + int(hlen)
    data_start += -data_start % _WIRE_ALIGN
    groups = {}
    for dt, (n, rel) in header["groups"].items():
        end = data_start + rel + n * _np_dtype(dt).itemsize
        if end > size:
            raise ValueError(f"wire cache {path}: group {dt} truncated "
                             f"(file ends at {size} < {end} bytes)")
        groups[dt] = np.memmap(path, dtype=_np_dtype(dt), mode="r",
                               offset=data_start + rel, shape=(n,))
    layout = [(k, dt, shape, off) for k, dt, shape, off in header["layout"]]
    for _, dt, shape, off in layout:
        n = off + int(np.prod(shape, dtype=np.int64))
        if dt not in groups or groups[dt].size < n:
            raise ValueError(f"wire cache {path}: group {dt} truncated "
                             f"({groups[dt].size if dt in groups else 0} "
                             f"< {n} elements)")
    return groups, layout, dict(header["dequant_dtypes"])


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
    ready for ``jax.device_put`` + ``dequantize_wire``. Reads both the v2
    packed format (leaves are zero-copy views into the memory-mapped
    group buffers) and the legacy v1 npz per-leaf format."""
    import json

    with open(path, "rb") as f:
        magic = f.read(8)
    if magic == _WIRE_MAGIC:
        groups, layout, flat_d = load_packed_wire(path)
        wire = packed_views(groups, layout)
    else:
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
    the int8 payload (~2x fewer tunnel bytes) packed into one contiguous
    buffer per dtype (a handful of transfers instead of ~2,000 — see
    ``pack_wire``) and is expanded on device; otherwise a plain
    ``jax.device_put``. Either way the returned tree has the original
    dtypes/shapes."""
    if not int8_wire:
        return jax.device_put(host_params)
    wire, dtypes, _ = quantize_wire(host_params)
    groups, layout = pack_wire(wire)
    return packed_dequant_program(layout, dequant_map(dtypes))(
        jax.device_put(groups))
