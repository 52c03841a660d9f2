"""Orbax checkpointing of (params, opt_state, step, ema).

Replaces the reference's torch.save/torch.load stage-chained .pth files
(reference scripts/train_stage2.py:180-190, utils/training_utils.py:233-283)
with async-capable orbax checkpoints; ``load_torch_checkpoint`` additionally
converts the reference's published .pth artifacts
(reference README.md:76-81) into our parameter trees for parity runs.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import jax
import numpy as np


def save_checkpoint(ckpt_dir: str, state, name: str = "state") -> str:
    import orbax.checkpoint as ocp

    path = os.path.join(os.path.abspath(ckpt_dir), name)
    ckptr = ocp.StandardCheckpointer()
    payload = {
        "params": state.params,
        "opt_state": state.opt_state,
        "step": state.step,
    }
    if state.ema_params is not None:
        payload["ema_params"] = state.ema_params
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    return path


def restore_checkpoint(ckpt_dir: str, abstract_state, name: str = "state"):
    import orbax.checkpoint as ocp

    path = os.path.join(os.path.abspath(ckpt_dir), name)
    ckptr = ocp.StandardCheckpointer()
    payload = {
        "params": abstract_state.params,
        "opt_state": abstract_state.opt_state,
        "step": abstract_state.step,
    }
    if abstract_state.ema_params is not None:
        payload["ema_params"] = abstract_state.ema_params
    restored = ckptr.restore(path, payload)
    return abstract_state.replace(
        params=restored["params"],
        opt_state=restored["opt_state"],
        step=restored["step"],
        ema_params=restored.get("ema_params", abstract_state.ema_params),
    )


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    """Load a reference .pth file into plain numpy (weights_only semantics,
    matching reference scripts/inference.py:48)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    return jax.tree.map(
        lambda x: np.asarray(x.numpy()) if hasattr(x, "numpy") else x, obj
    )
