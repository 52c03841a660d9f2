"""Frozen-golden checkpoint ingestion (VERDICT round-1 missing #1).

Two layers of evidence, both against the COMMITTED goldens in
tests/goldens/ (generated once by tools/make_goldens.py from the
reference's own torch modules, then frozen):

1. Torch-free: regenerate the deterministic state dicts from the committed
   shape manifest, convert, and require our Flax modules to reproduce the
   reference outputs. This holds in an image without torch — the parity
   evidence no longer evaporates with the torch dependency.
2. Torch-gated: write a real ``.pth`` in the reference's exact nested save
   format (reference scripts/train_stage2.py:182-189 — ``step`` /
   ``hierarchical_state_dict`` / ``adapter_state_dict`` /
   ``optimizer_state_dict`` / ``config``), ingest it through
   ``load_torch_checkpoint``, and require identical outputs. This covers the
   reference's checkpoint-name/format drift defect (SURVEY.md 2.10.4).
"""

import numpy as np
import pytest

from clap2diffusion_tpu.core.config import ConditionConfig
from clap2diffusion_tpu.models.condition import AudioAdapter, HierarchicalAudioEncoder
from clap2diffusion_tpu.models.condition.convert import (
    convert_audio_adapter,
    convert_hierarchical_encoder,
)

from golden_utils import GOLDEN_DIR, load_shapes, synth_state_dict

import os

GOLDENS = np.load(os.path.join(GOLDEN_DIR, "condition_goldens.npz"))
CFG = ConditionConfig()


def _run_ours(hier_sd, adapter_sd):
    import jax.numpy as jnp

    x = jnp.asarray(GOLDENS["x"])
    temp = float(GOLDENS["temperature"])
    hier = HierarchicalAudioEncoder(cfg=CFG)
    t77, info = hier.apply(
        {"params": convert_hierarchical_encoder(hier_sd)}, x, temp, return_all=True
    )
    adapter = AudioAdapter(cfg=CFG)
    t16 = adapter.apply({"params": convert_audio_adapter(adapter_sd)}, x)
    return np.asarray(t77), np.asarray(info["assignments"]), np.asarray(t16)


def _assert_matches_goldens(t77, assignments, t16):
    np.testing.assert_allclose(t77, GOLDENS["tokens77"], atol=3e-4)
    np.testing.assert_allclose(assignments, GOLDENS["assignments"], atol=3e-4)
    np.testing.assert_allclose(t16, GOLDENS["tokens16"], atol=3e-4)


def test_frozen_goldens_torch_free():
    """Committed goldens reproduce without torch in the environment."""
    shapes = load_shapes("condition_shapes.json")
    hier_sd = synth_state_dict("hier", shapes["hierarchical"])
    adapter_sd = synth_state_dict("adapter", shapes["adapter"])
    _assert_matches_goldens(*_run_ours(hier_sd, adapter_sd))


def test_pth_ingestion_reference_save_format(tmp_path):
    """A real .pth in the reference's nested format round-trips through
    load_torch_checkpoint into converted params with identical outputs."""
    torch = pytest.importorskip("torch")
    from clap2diffusion_tpu.train.checkpoint import load_torch_checkpoint

    shapes = load_shapes("condition_shapes.json")
    hier_sd = {
        k: torch.from_numpy(v)
        for k, v in synth_state_dict("hier", shapes["hierarchical"]).items()
    }
    adapter_sd = {
        k: torch.from_numpy(v)
        for k, v in synth_state_dict("adapter", shapes["adapter"]).items()
    }
    path = str(tmp_path / "audio_projector_stage2.pth")
    # the reference's own nested save format (train_stage2.py:182-189)
    torch.save(
        {
            "step": 2000,
            "hierarchical_state_dict": hier_sd,
            "adapter_state_dict": adapter_sd,
            "optimizer_state_dict": {},
            "config": {"stage": 2},
        },
        path,
    )

    ckpt = load_torch_checkpoint(path)
    assert ckpt["step"] == 2000
    assert all(
        isinstance(v, np.ndarray) for v in ckpt["hierarchical_state_dict"].values()
    )
    _assert_matches_goldens(
        *_run_ours(ckpt["hierarchical_state_dict"], ckpt["adapter_state_dict"])
    )
