"""Deterministic synthetic state dicts for frozen-golden parity tests.

Values are a pure function of (parameter name, seed tag) via SHA-256 —
identical whether materialized into a torch module (tools/make_goldens.py,
tests/test_checkpoint_ingestion.py) or regenerated torch-free from the
committed shape manifest (tests/goldens/condition_shapes.json). This is what
lets the committed .npz goldens prove checkpoint-conversion parity in an
image without torch installed.
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Dict

import numpy as np

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "goldens")


def _rng_for(tag: str, name: str) -> np.random.Generator:
    digest = hashlib.sha256(f"{tag}:{name}".encode()).digest()
    return np.random.default_rng(np.frombuffer(digest[:16], dtype=np.uint64))


def synth_value(tag: str, name: str, shape) -> np.ndarray:
    """Deterministic fill: small-normal weights; LayerNorm-ish scales near 1."""
    rng = _rng_for(tag, name)
    base = np.asarray(rng.standard_normal(shape), dtype=np.float32)
    leaf = name.rsplit(".", 1)[-1]
    if leaf == "weight" and len(shape) == 1:  # norm scale
        return np.asarray(1.0 + 0.05 * base, dtype=np.float32)
    return np.asarray(0.05 * base, dtype=np.float32)


def synth_state_dict(tag: str, shapes: Dict[str, list]) -> Dict[str, np.ndarray]:
    return {k: synth_value(tag, k, tuple(v)) for k, v in sorted(shapes.items())}


def load_shapes(name: str) -> Dict[str, list]:
    with open(os.path.join(GOLDEN_DIR, name)) as f:
        return json.load(f)


def synth_input(tag: str, shape) -> np.ndarray:
    return _rng_for(tag, "input").standard_normal(shape).astype(np.float32)
