"""Optimizer stack: warmup-cosine LR, AdamW, global-norm clipping, gradient
accumulation, selective freezing, EMA, and an adaptive loss balancer.

Rebuilds the reference's training utilities as optax transforms:
- WarmupCosineScheduler (reference utils/training_utils.py:99-171)
- GradientClipping incl. adaptive mode (reference :48-96)
- EMA shadow params (reference :12-45)
- LossBalancer (reference :174-230)
- grad accumulation, configured but never implemented in the reference
  (reference configs/training_config.yaml:16,28,38) — real here via
  ``optax.MultiSteps``.
- stage-wise freezing (reference train_stage2.py:67-91, train_stage3.py:92-117)
  via ``optax.masked`` over parameter paths — optimizer state (adam moments
  AND the grad-accumulation buffer) exists only for trainable leaves.
"""

from __future__ import annotations

from typing import Callable, Dict, Iterable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from clap2diffusion_tpu.core.config import StageConfig


def lr_schedule(cfg: StageConfig) -> optax.Schedule:
    if cfg.lr_schedule == "warmup_cosine":
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=cfg.lr,
            warmup_steps=max(cfg.warmup_steps, 1),
            decay_steps=max(cfg.steps, cfg.warmup_steps + 1),
            end_value=cfg.min_lr,
        )
    if cfg.lr_schedule == "cosine":
        return optax.cosine_decay_schedule(
            init_value=cfg.lr,
            decay_steps=max(cfg.steps, 1),
            alpha=cfg.min_lr / cfg.lr if cfg.lr > 0 else 0.0,
        )
    if cfg.lr_schedule == "constant":
        return optax.constant_schedule(cfg.lr)
    raise ValueError(f"unknown lr schedule {cfg.lr_schedule!r}")


def make_optimizer(
    cfg: StageConfig,
    trainable: Optional[Callable[[tuple], bool]] = None,
    params=None,
) -> optax.GradientTransformation:
    """AdamW + clip + schedule (+ accumulation, + freezing mask).

    ``trainable(path_tuple) -> bool`` freezes everything it rejects: frozen
    leaves get zero updates, so torch's requires_grad=False semantics hold
    (reference train_stage2.py:67-91).
    """
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.adamw(
            learning_rate=lr_schedule(cfg),
            b1=cfg.adam_b1,
            b2=cfg.adam_b2,
            eps=cfg.adam_eps,
            weight_decay=cfg.weight_decay,
        ),
    )
    if trainable is not None:
        if params is None:
            raise ValueError("freezing mask needs example params")
        labels = _path_labels(params, trainable)
        train_mask = jax.tree.map(lambda l: l == "train", labels)
        freeze_mask = jax.tree.map(lambda l: l == "freeze", labels)
        # accumulation INSIDE the trainable mask: MultiSteps outside the
        # mask would hold an acc_grads buffer for EVERY leaf — in stages
        # 2/3 that is ~3.4 GB of fp32 zeros accumulated for the frozen
        # UNet body, pure HBM/checkpoint waste (measured as the OOM margin
        # of the full-budget lifecycle run). optax.masked builds state
        # (accumulator + adam moments) only for trainable leaves; frozen
        # leaves carry no optimizer state and get their updates zeroed.
        if cfg.grad_accum > 1:
            tx = optax.MultiSteps(tx, every_k_schedule=cfg.grad_accum)
        return optax.chain(
            optax.masked(tx, train_mask),
            optax.masked(optax.set_to_zero(), freeze_mask),
        )
    if cfg.grad_accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.grad_accum)
    return tx


def _path_labels(params, trainable: Callable[[tuple], bool]):
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def label_tree(tree):
        return jax.tree_util.tree_map_with_path(
            lambda path, _: "train" if trainable(_path_strings(path)) else "freeze",
            tree,
        )

    return label_tree(params)


def _path_strings(path) -> tuple:
    out = []
    for p in path:
        if hasattr(p, "key"):
            out.append(str(p.key))
        elif hasattr(p, "idx"):
            out.append(str(p.idx))
        else:
            out.append(str(p))
    return tuple(out)


def path_matcher(*substrings: str) -> Callable[[tuple], bool]:
    """trainable-predicate: any path segment containing any substring."""

    def match(path: tuple) -> bool:
        joined = "/".join(path)
        return any(s in joined for s in substrings)

    return match


# ---------------------------------------------------------------------------
# EMA (reference utils/training_utils.py:12-45)
# ---------------------------------------------------------------------------


def ema_init(params):
    # owns its buffers (jnp.copy): donated train steps may not alias
    return jax.tree.map(jnp.copy, params)


def ema_update(ema_params, new_params, decay: float = 0.9999):
    return jax.tree.map(
        lambda e, p: decay * e + (1.0 - decay) * p, ema_params, new_params
    )


# ---------------------------------------------------------------------------
# Loss balancer (reference utils/training_utils.py:174-230): inverse-magnitude
# reweighting, refreshed every `update_every` steps from running magnitudes.
# Host-side state (it only feeds scalar weights into the jitted step).
# ---------------------------------------------------------------------------


class LossBalancer:
    def __init__(self, loss_names: Iterable[str], update_every: int = 100):
        self.names = list(loss_names)
        self.update_every = update_every
        self.history: Dict[str, list] = {n: [] for n in self.names}
        self.weights: Dict[str, float] = {n: 1.0 for n in self.names}
        self._step = 0

    def update(self, losses: Dict[str, float]) -> Dict[str, float]:
        self._step += 1
        for n in self.names:
            if n in losses:
                self.history[n].append(float(losses[n]))
                self.history[n] = self.history[n][-self.update_every:]
        if self._step % self.update_every == 0:
            mags = {
                n: (sum(h) / len(h) if h else 1.0) for n, h in self.history.items()
            }
            total = sum(abs(m) for m in mags.values()) + 1e-8
            k = len(self.names)
            self.weights = {
                n: total / (k * (abs(m) + 1e-8)) for n, m in mags.items()
            }
        return dict(self.weights)


# ---------------------------------------------------------------------------
# Adaptive gradient clipping (reference utils/training_utils.py:48-96):
# clip threshold = mean + 2*std of the last `history` gradient norms, once
# enough history accumulates; plain max_norm before that.
# ---------------------------------------------------------------------------


class AdaptiveClipState(NamedTuple):
    norms: jax.Array  # [history] ring buffer
    count: jax.Array  # total updates seen


def adaptive_clip_by_global_norm(
    max_norm: float, history: int = 100, min_samples: int = 10
) -> optax.GradientTransformation:
    def init_fn(params):
        del params
        return AdaptiveClipState(
            norms=jnp.zeros((history,), jnp.float32),
            count=jnp.zeros((), jnp.int32),
        )

    def update_fn(updates, state, params=None):
        del params
        g_norm = optax.global_norm(updates)
        n_valid = jnp.minimum(state.count, history)
        mask = (
            jax.lax.broadcasted_iota(jnp.int32, (history, 1), 0).squeeze(-1)
            < n_valid
        )
        mean = jnp.sum(jnp.where(mask, state.norms, 0.0)) / jnp.maximum(n_valid, 1)
        var = jnp.sum(jnp.where(mask, (state.norms - mean) ** 2, 0.0)) / jnp.maximum(
            n_valid, 1
        )
        adaptive = mean + 2.0 * jnp.sqrt(var)
        threshold = jnp.where(state.count >= min_samples, adaptive, max_norm)
        threshold = jnp.maximum(threshold, 1e-6)

        scale = jnp.minimum(1.0, threshold / (g_norm + 1e-6))
        updates = jax.tree.map(lambda u: u * scale.astype(u.dtype), updates)
        new_norms = state.norms.at[state.count % history].set(
            g_norm.astype(jnp.float32)
        )
        return updates, AdaptiveClipState(norms=new_norms, count=state.count + 1)

    return optax.GradientTransformation(init_fn, update_fn)
