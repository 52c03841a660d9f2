"""Real LoRA adapters for the UNet's cross-attention projections.

The reference's stage-2 "setup_lora_training" is LoRA in name only — it
freezes/unfreezes full modules and contains no low-rank adapters
(reference train_stage2.py:67-91; SURVEY.md section 2.3). This implements
the real thing, TPU-style: adapters live in their OWN parameter tree and
are folded into the frozen UNet kernels at trace time —
``W' = W + (alpha/rank) * A @ B`` — so

- the UNet module and its checkpoints are untouched (zero-init B makes the
  fold an exact identity at init, pinned by tests);
- under ``jit`` the fold is loop-invariant across ``steps_per_call``
  scans, so XLA hoists one merged kernel per chunk instead of paying the
  low-rank matmul per step;
- gradients flow through the fold to (A, B) only — the base kernels are
  masked out by the stage optimizer like every other frozen leaf.

Targets: the text/audio cross-attention (attn2) q/k/v/out kernels, the
standard SD LoRA surface. Enable with ``train.stage2.lora_rank=8`` (and
optionally ``lora_alpha``); serve via the normal ``--stage-checkpoint``
path — ``merge_stage_params`` folds the adapters into the UNet weights.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def target_paths(unet_params: Dict[str, Any]) -> List[Tuple[str, ...]]:
    """Kernel leaves under cross-attention (attn2) modules, sorted."""
    out = []

    def walk(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, path + (k,))
        elif "attn2" in path and path[-1] == "kernel":
            out.append(path)

    walk(unet_params, ())
    return sorted(out)


def _key(path: Tuple[str, ...]) -> str:
    return "/".join(path)


def init_lora(
    unet_params: Dict[str, Any],
    rank: int,
    rng: jax.Array,
    alpha: float = 16.0,
) -> Dict[str, Any]:
    """Build the adapter tree: per target kernel [in, out] an ``a`` [in, r]
    (normal, std 1/sqrt(in)) and a zero ``b`` [r, out] — delta starts at
    exactly zero. ``alpha`` rides along as a frozen leaf so serving needs
    no training config to fold the adapters."""
    paths = target_paths(unet_params)
    if not paths:
        raise ValueError("no attn2 kernels found to adapt")
    keys = jax.random.split(rng, len(paths))
    tree: Dict[str, Any] = {"alpha": np.float32(alpha)}
    for path, k in zip(paths, keys):
        leaf = unet_params
        for p in path:
            leaf = leaf[p]
        cin, cout = leaf.shape
        tree[_key(path)] = {
            "a": jax.random.normal(k, (cin, rank), jnp.float32) / np.sqrt(cin),
            "b": jnp.zeros((rank, cout), jnp.float32),
        }
    return tree


def merge_lora(unet_params: Dict[str, Any], lora: Dict[str, Any]) -> Dict[str, Any]:
    """Fold adapters into a COPY of the UNet tree:
    ``W' = W + (alpha/rank) * A @ B``. Exact identity while B == 0."""
    merged = jax.tree.map(lambda x: x, unet_params)
    alpha = jnp.asarray(lora["alpha"], jnp.float32)
    for key, ab in lora.items():
        if key == "alpha":
            continue
        path = tuple(key.split("/"))
        node = merged
        for p in path[:-1]:
            node = node[p]
        w = node[path[-1]]
        a = ab["a"].astype(jnp.float32)
        b = ab["b"].astype(jnp.float32)
        delta = (alpha / a.shape[-1]) * (a @ b)
        node[path[-1]] = (w.astype(jnp.float32) + delta).astype(w.dtype)
    return merged


def lora_trainable(path: Tuple[str, ...]) -> bool:
    """Trainable-leaf predicate for the adapter tree: a/b matrices only
    (``alpha`` stays frozen)."""
    return "lora" in path and path[-1] in ("a", "b")
