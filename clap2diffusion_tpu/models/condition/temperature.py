"""Temperature annealing as a pure function of step.

The reference mutates a buffer on the decomposer via a scheduler object
(reference models/hierarchical_audio_v4.py:20-76). TPU-native design: the
temperature is a jit-traceable function of the step, passed into apply — no
mutable state, so the whole train step stays a pure function.

Semantics match the reference exactly: hold at T_max for ``warmup_steps``,
cosine (or linear) anneal to T_min by ``total_steps``, floor at 0.1
(reference :54-76 and set_temperature floor :152).
"""

from __future__ import annotations

import jax.numpy as jnp

from clap2diffusion_tpu.core.config import ConditionConfig

TEMPERATURE_FLOOR = 0.1


def temperature_at_step(
    step,
    t_max: float = 2.0,
    t_min: float = 0.5,
    total_steps: int = 5000,
    warmup_steps: int = 200,
    mode: str = "cosine",
):
    """Temperature for a (possibly traced) integer step. Returns f32 scalar."""
    step = jnp.asarray(step, dtype=jnp.float32)
    if total_steps <= warmup_steps:
        return jnp.maximum(jnp.asarray(t_min, jnp.float32), TEMPERATURE_FLOOR)
    progress = jnp.clip(
        (step - warmup_steps) / (total_steps - warmup_steps), 0.0, 1.0
    )
    if mode == "cosine":
        t = t_min + (t_max - t_min) * 0.5 * (1.0 + jnp.cos(jnp.pi * progress))
    elif mode == "linear":
        t = t_max - (t_max - t_min) * progress
    else:
        raise ValueError(f"unknown annealing mode {mode!r}")
    t = jnp.where(step < warmup_steps, t_max, t)
    t = jnp.where(step >= total_steps, t_min, t)
    return jnp.maximum(t, TEMPERATURE_FLOOR)


def temperature_from_config(step, cfg: ConditionConfig):
    return temperature_at_step(
        step,
        t_max=cfg.temperature_initial,
        t_min=cfg.temperature_final,
        total_steps=cfg.temperature_anneal_steps,
        warmup_steps=cfg.temperature_warmup_steps,
        mode=cfg.temperature_schedule,
    )
