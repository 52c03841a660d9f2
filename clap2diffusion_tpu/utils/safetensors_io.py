"""Zero-dependency safetensors read/write (numpy only).

Published SD v1.5 / CLIP / CLAP weights ship as ``.safetensors`` today
(diffusers switched its default from ``.bin``), so the converter tooling
must ingest them without the ``safetensors`` package (not baked into this
image) and without torch in the loop.

Format (https://github.com/huggingface/safetensors — stable, versionless):
an 8-byte little-endian u64 header length, a JSON header mapping tensor
name -> {"dtype", "shape", "data_offsets": [begin, end]} (offsets relative
to the byte buffer that follows, tensors little-endian, C-contiguous), plus
an optional "__metadata__" string map.

bf16 is handled via ``ml_dtypes`` (a JAX dependency, always present here).
"""

from __future__ import annotations

import json
import struct
from typing import Dict, Optional

import ml_dtypes
import numpy as np

_DTYPES = {
    "F64": np.dtype("<f8"),
    "F32": np.dtype("<f4"),
    "F16": np.dtype("<f2"),
    "BF16": np.dtype(ml_dtypes.bfloat16),
    "I64": np.dtype("<i8"),
    "I32": np.dtype("<i4"),
    "I16": np.dtype("<i2"),
    "I8": np.dtype("i1"),
    "U8": np.dtype("u1"),
    "BOOL": np.dtype("bool"),
}
_NAMES = {v: k for k, v in _DTYPES.items()}


def load_safetensors(path: str) -> Dict[str, np.ndarray]:
    """Read every tensor into a {name: np.ndarray} state dict."""
    with open(path, "rb") as f:
        (hlen,) = struct.unpack("<Q", f.read(8))
        header = json.loads(f.read(hlen))
        buf = f.read()
    out: Dict[str, np.ndarray] = {}
    for name, spec in header.items():
        if name == "__metadata__":
            continue
        dtype = _DTYPES[spec["dtype"]]
        begin, end = spec["data_offsets"]
        arr = np.frombuffer(buf[begin:end], dtype=dtype)
        out[name] = arr.reshape(spec["shape"])
    return out


def save_safetensors(
    path: str,
    tensors: Dict[str, np.ndarray],
    metadata: Optional[Dict[str, str]] = None,
) -> str:
    """Write a {name: array} dict in safetensors layout (round-trips through
    ``load_safetensors`` and the upstream readers)."""
    header: Dict[str, object] = {}
    if metadata:
        header["__metadata__"] = dict(metadata)
    chunks = []
    offset = 0
    for name, arr in tensors.items():
        a = np.ascontiguousarray(arr)
        if a.dtype not in _NAMES:
            raise ValueError(f"unsupported dtype for safetensors: {a.dtype}")
        raw = a.tobytes()
        header[name] = {
            "dtype": _NAMES[a.dtype],
            "shape": list(a.shape),
            "data_offsets": [offset, offset + len(raw)],
        }
        chunks.append(raw)
        offset += len(raw)
    hjson = json.dumps(header, separators=(",", ":")).encode()
    pad = (-len(hjson)) % 8  # upstream aligns the buffer to 8 bytes
    hjson += b" " * pad
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(hjson)))
        f.write(hjson)
        for raw in chunks:
            f.write(raw)
    return path
