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


def _deep_overlay(base, over):
    """Recursively overlay ``over`` onto ``base`` (dicts merge by key,
    everything else is replaced). Restoring a pruned checkpoint rebuilds
    the full tree by overlaying the saved (trainable) leaves onto the
    caller's base values for the frozen ones."""
    if isinstance(over, dict) and isinstance(base, dict):
        out = dict(base)
        for k, v in over.items():
            out[k] = _deep_overlay(base[k], v) if k in base else v
        return out
    return over


def prune_frozen_unet(params, trainable):
    """Drop the frozen UNet body from a stage's parameter tree before
    saving. The ~3.4 GB fp32 SD UNet dominates stage-2/3 checkpoints but
    never changes (LoRA deltas and injection processors are separate
    leaves); measured in the full-budget lifecycle, serializing it cost
    ~140-215 s of device->host tunnel transfer per in-loop best-save.
    Keeps: every leaf ``trainable`` selects, plus all ``audio_inject``
    processors (tiny, and the reference's ``unet_adapter_state_dict``
    export section reads them from any stage's artifact — reference
    scripts/train_stage2.py:182-189). Frozen leaves are reconstructed at
    restore by overlay onto the caller's base tree (the stage-chain merge
    architecture already guarantees the base is reproducible).

    No-op when ``trainable`` is None or the tree has no ``unet`` subtree
    (stage 1 trains the bare, fully-trainable adapter tree)."""
    if trainable is None or not isinstance(params, dict) or "unet" not in params:
        return params

    def keep(path) -> bool:
        return trainable(path) or "audio_inject" in "/".join(path)

    def walk(node, path):
        if not isinstance(node, dict):
            return node if keep(path) else None
        out = {}
        for k, v in node.items():
            sub = walk(v, path + (k,))
            if sub is not None and (not isinstance(sub, dict) or sub):
                out[k] = sub
        return out

    pruned = dict(params)
    unet = walk(params["unet"], ("unet",))
    if unet:
        pruned["unet"] = unet
    else:
        del pruned["unet"]
    return pruned


def save_checkpoint(ckpt_dir: str, state, name: str = "state",
                    trainable=None) -> str:
    """``trainable`` (a path-tuple predicate, the one the stage's step fn
    exposes) enables trainable-only saves: the frozen UNet body is pruned
    (see ``prune_frozen_unet``), shrinking stage-2/3 checkpoints from
    ~4 GB to the trained towers."""
    import orbax.checkpoint as ocp

    path = os.path.join(os.path.abspath(ckpt_dir), name)
    ckptr = ocp.StandardCheckpointer()
    payload = {
        "params": prune_frozen_unet(state.params, trainable),
        "opt_state": state.opt_state,
        "step": state.step,
    }
    if state.ema_params is not None:
        payload["ema_params"] = state.ema_params
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    return path


def restore_checkpoint(ckpt_dir: str, abstract_state, name: str = "state",
                       trainable=None):
    """Restore into ``abstract_state``'s structure. With ``trainable``
    given, the checkpoint is expected in pruned form (same predicate the
    save used) and frozen UNet leaves keep ``abstract_state``'s values;
    full (legacy) checkpoints restore unchanged — the pruned attempt
    falls back transparently."""
    import orbax.checkpoint as ocp

    path = os.path.join(os.path.abspath(ckpt_dir), name)
    ckptr = ocp.StandardCheckpointer()

    def attempt(params_abstract):
        payload = {
            "params": params_abstract,
            "opt_state": abstract_state.opt_state,
            "step": abstract_state.step,
        }
        if abstract_state.ema_params is not None:
            payload["ema_params"] = abstract_state.ema_params
        return ckptr.restore(path, payload)

    pruned_abstract = prune_frozen_unet(abstract_state.params, trainable)
    try:
        restored = attempt(pruned_abstract)
    except Exception:
        if pruned_abstract is abstract_state.params:
            raise  # nothing was pruned — a real failure
        restored = attempt(abstract_state.params)  # legacy full checkpoint
    return abstract_state.replace(
        params=_deep_overlay(abstract_state.params, restored["params"]),
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
    src = dict(src)
    lora = src.pop("lora", None)
    # deep overlay, not dict replacement: a pruned checkpoint's unet tree
    # carries only the trained leaves — the frozen body comes from the
    # base pipeline tree (full payloads overlay to the identical result)
    merged = dict(pipeline_params)
    for k, v in src.items():
        base = merged.get(k)
        merged[k] = (_deep_overlay(base, v)
                     if isinstance(base, dict) and isinstance(v, dict) else v)
    if lora is not None:
        # stage 2 trained with real LoRA adapters (train/lora.py): fold
        # them into the UNet kernels for serving. With no base kernels to
        # fold into (the export path's bare tree + a pruned checkpoint),
        # the fold is skipped — the reference artifact format carries only
        # the injection processors, not the UNet body
        # (reference scripts/train_stage2.py:182-189)
        unet = merged.get("unet")
        if unet is not None and _lora_targets_present(unet, lora):
            from clap2diffusion_tpu.train.lora import merge_lora

            merged["unet"] = merge_lora(unet, lora)
    return merged


def _lora_targets_present(unet_params: Dict[str, Any], lora: Dict[str, Any]) -> bool:
    for key in lora:
        if key == "alpha":
            continue
        node = unet_params
        for part in key.split("/"):
            if not isinstance(node, dict) or part not in node:
                return False
            node = node[part]
    return True


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
