#!/usr/bin/env python
"""Generate the frozen conversion goldens (run once; artifacts committed).

Instantiates the REFERENCE's own torch modules (read-only import from
/root/reference), fills them with deterministic numpy values
(tests/golden_utils.py), records their outputs, and writes:

  tests/goldens/condition_shapes.json   - state-dict shape manifests
  tests/goldens/condition_goldens.npz   - inputs + reference outputs (fp32)

tests/test_checkpoint_ingestion.py then verifies, torch-free, that our
converters + Flax modules reproduce these outputs, and (torch-gated) that a
real .pth written in the reference's nested save format
(reference scripts/train_stage2.py:182-189) ingests identically.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))
sys.path.insert(0, "/root/reference")

import torch  # noqa: E402

from golden_utils import GOLDEN_DIR, synth_input, synth_state_dict  # noqa: E402


def fill(module: torch.nn.Module, tag: str):
    sd = module.state_dict()
    shapes = {k: list(v.shape) for k, v in sd.items()}
    values = synth_state_dict(tag, shapes)
    module.load_state_dict(
        {k: torch.from_numpy(values[k]).to(sd[k].dtype) for k in sd}, strict=True
    )
    return shapes


def main():
    from models import audio_adapter_v4, hierarchical_audio_v4

    os.makedirs(GOLDEN_DIR, exist_ok=True)

    hier = hierarchical_audio_v4.ImprovedHierarchicalAudioEncoder(
        use_adaptive_weights=True, use_soft_decomposition=True
    ).eval()
    adapter = audio_adapter_v4.AudioAdapter().eval()
    shapes = {
        "hierarchical": fill(hier, "hier"),
        "adapter": fill(adapter, "adapter"),
    }
    hier.decomposer.set_temperature(1.3)

    x = synth_input("cond", (4, 512))
    with torch.no_grad():
        tokens77, info = hier(torch.from_numpy(x), return_all=True)
        tokens16 = adapter(torch.from_numpy(x))

    with open(os.path.join(GOLDEN_DIR, "condition_shapes.json"), "w") as f:
        json.dump(shapes, f, indent=1, sort_keys=True)
    np.savez_compressed(
        os.path.join(GOLDEN_DIR, "condition_goldens.npz"),
        x=x,
        tokens77=tokens77.numpy().astype(np.float32),
        tokens16=tokens16.numpy().astype(np.float32),
        assignments=info["assignments"].numpy().astype(np.float32),
        temperature=np.float32(1.3),
    )
    print("wrote", GOLDEN_DIR)
    print("tokens77", tokens77.shape, "tokens16", tokens16.shape)


if __name__ == "__main__":
    main()
