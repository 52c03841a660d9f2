"""Zero-dependency safetensors IO (fast tier).

Published SD v1.5 / CLIP weights ship as .safetensors; the converter
tooling reads them torch-free through utils/safetensors_io. These tests
pin the binary layout (round-trip, dtype table incl. bf16, metadata,
8-byte header padding) and, when the upstream ``safetensors`` package is
importable, byte-level compatibility with it.
"""

import json
import struct

import ml_dtypes
import numpy as np
import pytest

from clap2diffusion_tpu.utils.safetensors_io import (
    load_safetensors,
    save_safetensors,
)


def _sample_tensors():
    rng = np.random.default_rng(0)
    return {
        "dense.weight": rng.normal(size=(4, 3)).astype(np.float32),
        "emb": rng.normal(size=(2, 5)).astype(np.float16),
        "bf": rng.normal(size=(3, 3)).astype(ml_dtypes.bfloat16),
        "ids": np.arange(6, dtype=np.int64).reshape(2, 3),
        "mask": np.array([True, False, True]),
        "scalarish": np.array(1.5, np.float32),  # 0-d tensor
    }


def test_roundtrip_all_dtypes(tmp_path):
    tensors = _sample_tensors()
    p = str(tmp_path / "w.safetensors")
    save_safetensors(p, tensors, metadata={"format": "np"})
    out = load_safetensors(p)
    assert set(out) == set(tensors)
    for k, v in tensors.items():
        assert out[k].dtype == v.dtype
        np.testing.assert_array_equal(out[k], np.asarray(v))


def test_header_layout(tmp_path):
    """Header length is 8-byte aligned and the JSON matches the spec
    (dtype/shape/data_offsets per tensor, contiguous buffer)."""
    p = str(tmp_path / "w.safetensors")
    save_safetensors(p, {"a": np.zeros((2, 2), np.float32)})
    with open(p, "rb") as f:
        (hlen,) = struct.unpack("<Q", f.read(8))
        assert hlen % 8 == 0
        header = json.loads(f.read(hlen))
        buf = f.read()
    assert header["a"]["dtype"] == "F32"
    assert header["a"]["shape"] == [2, 2]
    assert header["a"]["data_offsets"] == [0, 16]
    assert len(buf) == 16


def test_unsupported_dtype_raises(tmp_path):
    with pytest.raises(ValueError, match="unsupported dtype"):
        save_safetensors(
            str(tmp_path / "x.safetensors"),
            {"c": np.zeros(2, np.complex64)},
        )


def test_upstream_compat(tmp_path):
    """Byte-level compatibility with the reference implementation, when
    the safetensors package happens to be importable."""
    st = pytest.importorskip("safetensors.numpy")
    tensors = {
        k: v for k, v in _sample_tensors().items() if v.dtype != ml_dtypes.bfloat16
    }
    ours = str(tmp_path / "ours.safetensors")
    save_safetensors(ours, tensors)
    theirs = st.load_file(ours)  # they read ours
    for k, v in tensors.items():
        np.testing.assert_array_equal(theirs[k], np.asarray(v))
    up = str(tmp_path / "up.safetensors")
    st.save_file(tensors, up)  # we read theirs
    mine = load_safetensors(up)
    for k, v in tensors.items():
        np.testing.assert_array_equal(mine[k], np.asarray(v))


def test_convert_tool_reads_safetensors(tmp_path):
    """tools/convert_checkpoints.load_sd dispatches on the extension and
    feeds converters plain numpy (their _np handles non-torch leaves)."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "convert_checkpoints",
        os.path.join(os.path.dirname(os.path.dirname(__file__)),
                     "tools", "convert_checkpoints.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    p = str(tmp_path / "sd.safetensors")
    save_safetensors(p, {"w": np.ones((2, 2), np.float32)})
    sd = mod.load_sd(p)
    assert isinstance(sd["w"], np.ndarray)
    np.testing.assert_array_equal(sd["w"], np.ones((2, 2), np.float32))


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
