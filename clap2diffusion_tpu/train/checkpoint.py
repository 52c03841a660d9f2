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


def restore_raw(ckpt_dir: str, name: str = "state") -> Dict[str, Any]:
    """Restore a checkpoint without an abstract pytree — shapes/dtypes come
    from the checkpoint's own metadata. This is the serving-side reader: it
    does not need the optimizer structure that produced the state.

    Leaves come back as HOST numpy: the default device restore would push
    the full fp32 training state (~4 GB) through the TPU tunnel just so a
    merge can pull it straight back — measured at 10+ tunnel-minutes per
    restore in the full-budget lifecycle run. Consumers (merge/export/
    serve) device_put exactly what they keep."""
    import orbax.checkpoint as ocp

    path = os.path.join(os.path.abspath(ckpt_dir), name)
    ckptr = ocp.PyTreeCheckpointer()
    try:
        meta = ckptr.metadata(path).item_metadata
        restore_args = jax.tree.map(
            lambda _: ocp.RestoreArgs(restore_type=np.ndarray),
            dict(meta) if hasattr(meta, "keys") else meta,
        )
        return ckptr.restore(path, restore_args=restore_args)
    finally:
        ckptr.close()


def merge_stage_params(
    pipeline_params: Dict[str, Any],
    payload: Dict[str, Any],
    stage: int,
    use_ema: bool = False,
    dtype=None,
) -> Dict[str, Any]:
    """Fold a trained stage's weights — optionally the EMA shadow weights —
    into a full pipeline parameter tree for eval/serving.

    This is the consumer of ``TrainState.ema_params`` (the reference's EMA
    apply semantics, reference utils/training_utils.py:22-41: evaluate and
    serve the shadow weights, keep training the live ones). The shadow is a
    flat {dotted-path: array} dict covering only the stage's TRAINABLE
    leaves (train/stages.py::TrainState); frozen leaves come from the live
    params. Stage 1 trains the bare adapter subtree; stages 2/3 train dicts
    of named towers that merge by key.
    """
    if use_ema:
        ema = payload.get("ema_params")
        if ema is None:
            raise ValueError(
                "checkpoint carries no ema_params — train with "
                "train.stageN.use_ema=true to produce an EMA shadow"
            )
        # rebuild nested dicts (tree.map reconstructs every level, so the
        # in-place overlay below cannot alias the caller's tree)
        src = jax.tree.map(lambda x: x, payload["params"])
        for key, val in ema.items():
            node = src
            parts = key.split(".")
            for part in parts[:-1]:
                node = node[part]
            node[parts[-1]] = val
    else:
        src = payload["params"]
    if dtype is not None:
        src = jax.tree.map(lambda x: np.asarray(x).astype(dtype), src)
    if stage == 1:
        return {**pipeline_params, "adapter": src}
    if "lora" in src:
        # stage 2 trained with real LoRA adapters (train/lora.py): fold
        # them into the UNet kernels for serving, drop the adapter tree
        from clap2diffusion_tpu.train.lora import merge_lora

        src = dict(src)
        src["unet"] = merge_lora(src["unet"], src.pop("lora"))
    return {**pipeline_params, **src}


def stage_from_name(name: str) -> int:
    """Parse the stage number out of a checkpoint name like
    ``stage2_final`` / ``stage3_step500`` (the names run_stage writes)."""
    import re

    m = re.search(r"stage(\d)", name)
    if not m:
        raise ValueError(
            f"cannot infer training stage from checkpoint name {name!r}; "
            "expected a run_stage artifact like 'stage2_final'"
        )
    return int(m.group(1))


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    """Load a reference .pth file into plain numpy (weights_only semantics,
    matching reference scripts/inference.py:48)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    return jax.tree.map(
        lambda x: np.asarray(x.numpy()) if hasattr(x, "numpy") else x, obj
    )
