"""Stage 1/2/3 training: pure jit-compiled update steps over a device mesh.

Rebuilds the reference trainers with the stubs made real:
- Stage 1 (reference scripts/train_stage1.py): AudioAdapter only;
  MSE + InfoNCE against text embeddings. The reference's data loop is a
  placeholder (:98-99); here batches come from the real latent dataset.
- Stage 2 (reference scripts/train_stage2.py): hierarchical encoder + UNet
  audio-injection params, frozen UNet body; diffusion MSE with the REAL UNet
  in the loop (the reference returns randn at :153-157) + 0.1 ortho
  + 0.01 entropy; temperature annealing actually wired (the reference's local
  scheduler is a no-op, :209-211).
- Stage 3 (reference scripts/train_stage3.py): only the projector output
  layers and adapter output projection train (:92-117); Norm-60 applied
  in-loop (:142,193-200); 2.0 diffusion + 0.5 consistency + 0.3 alignment.

Every step is a pure function (state, batch, rng) -> (state, metrics),
jit-compiled with the batch sharded over the mesh's data axis (gradients
reduce via XLA-inserted psum over ICI).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from clap2diffusion_tpu.core.config import Config
from clap2diffusion_tpu.diffusion.ddim import NoiseSchedule
from clap2diffusion_tpu.models.condition import (
    AudioAdapter,
    HierarchicalAudioEncoder,
    temperature_from_config,
)
from clap2diffusion_tpu.models.unet import UNet2DCondition
from clap2diffusion_tpu.ops.token_norm import rescale_to_norm
from clap2diffusion_tpu.train import losses as L
from clap2diffusion_tpu.train.optim import (
    _path_strings,
    make_optimizer,
    path_matcher,
)


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jax.Array
    # EMA shadow of the TRAINABLE leaves only, as a flat {dotted-path: array}
    # dict. Shadowing the frozen ~860M-param UNet body to track ~40M
    # trainables would burn an extra 3.4 GB of HBM per stage for leaves
    # that never change; frozen leaves are re-read from ``params`` at merge
    # time (train/checkpoint.py::merge_stage_params).
    ema_params: Any = None

    @classmethod
    def create(cls, params, tx: optax.GradientTransformation, use_ema=False,
               trainable=None):
        return cls(
            params=params,
            opt_state=tx.init(params),
            step=jnp.zeros((), jnp.int32),
            # jnp.copy, not identity: the shadow must own its buffers —
            # the jitted steps donate the whole state, and donating the
            # same buffer twice (params + aliased ema) is a runtime error
            ema_params=_ema_init(params, trainable) if use_ema else None,
        )


def ema_path_key(path) -> str:
    return ".".join(_path_strings(path))


def _ema_init(params, trainable):
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    return {
        ema_path_key(p): jnp.copy(x)
        for p, x in flat
        if trainable is None or trainable(_path_strings(p))
    }


def _apply_updates(state: TrainState, tx, grads, ema_decay: Optional[float]):
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    ema = state.ema_params
    if ema is not None and ema_decay is not None:
        flat = {
            ema_path_key(p): x
            for p, x in jax.tree_util.tree_flatten_with_path(params)[0]
        }
        ema = {
            k: ema_decay * e + (1 - ema_decay) * flat[k] for k, e in ema.items()
        }
    return state.replace(
        params=params, opt_state=opt_state, step=state.step + 1, ema_params=ema
    )


# ---------------------------------------------------------------------------
# Stage 1
# ---------------------------------------------------------------------------


def make_stage1_step(cfg: Config) -> Tuple[Callable, optax.GradientTransformation, AudioAdapter]:
    """Train the 16-token AudioAdapter on (clap, text_emb) pairs."""
    adapter = AudioAdapter(cfg=cfg.condition)
    scfg = cfg.train.stage1

    def init_tx(params):
        return make_optimizer(scfg)

    def step(state: TrainState, batch: Dict, rng: jax.Array, tx):
        def loss_fn(params):
            tokens = adapter.apply(
                {"params": params}, batch["clap"],
                deterministic=False, rngs={"dropout": rng},
            )
            losses = L.stage1_losses(
                tokens, batch["text_emb"], cfg.train.infonce_temperature
            )
            return losses["total"], losses

        (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        new_state = _apply_updates(
            state, tx, grads, scfg.ema_decay if scfg.use_ema else None
        )
        return new_state, {k: v for k, v in losses.items()}

    return step, init_tx, adapter


# ---------------------------------------------------------------------------
# Stage 2 / Stage 3 share the UNet-in-the-loop diffusion objective
# ---------------------------------------------------------------------------


def _sample_noising(schedule: NoiseSchedule, latents, rng):
    rng_t, rng_n = jax.random.split(rng)
    b = latents.shape[0]
    t = jax.random.randint(rng_t, (b,), 0, schedule.num_train_timesteps)
    noise = jax.random.normal(rng_n, latents.shape, latents.dtype)
    noisy = schedule.add_noise(latents, noise, t)
    return noisy, noise, t


def _stop_frozen(params, trainable):
    """``stop_gradient`` on every leaf the stage does not train.

    The optimizer mask (optax.multi_transform) already zeroes frozen
    *updates*, but autodiff still pays for the frozen weight-gradients —
    in stage 2/3 that is dW for the whole ~860M-param frozen UNet body,
    roughly a third of the step's FLOPs. Stopping gradients at the leaves
    lets XLA drop those dW contractions entirely while activation
    gradients (needed to reach the trainable injection/projector params)
    still flow.
    """
    return jax.tree_util.tree_map_with_path(
        lambda path, x: x if trainable(_path_strings(path))
        else jax.lax.stop_gradient(x),
        params,
    )


def _compute_cast(cfg: Config):
    """Mixed-precision policy for the UNet-in-the-loop stages.

    Master params and the optimizer state stay float32; the UNet forward
    (and thus its backward) runs in ``cfg.train.compute_dtype`` — bf16 by
    default, the MXU's native high-throughput dtype. ``astype``'s vjp casts
    gradients back to float32, so the update path is unchanged. Losses are
    computed in float32.
    """
    cdt = jnp.dtype(cfg.train.compute_dtype)

    def cast(tree):
        # f32 master params AND f16 cached embeddings (the precompute tool
        # stores text_ctx as f16) both land in the compute dtype
        return jax.tree.map(
            lambda x: x.astype(cdt)
            if hasattr(x, "dtype") and x.dtype in (jnp.float32, jnp.float16)
            else x,
            tree,
        )

    return cast


def make_stage2_step(cfg: Config):
    """Joint hierarchical-encoder + UNet-injection training.

    params = {'hierarchical': ..., 'unet': ...}; trainable: decomposer +
    projector (reference train_stage2.py:67-91) and the audio-injection
    branch (the reference creates its processors fresh in this stage).
    """
    hier = HierarchicalAudioEncoder(cfg=cfg.condition)
    unet = UNet2DCondition(cfg=cfg.diffusion.unet)
    schedule = NoiseSchedule.create(cfg.diffusion.scheduler)
    scfg = cfg.train.stage2
    base_trainable = path_matcher("decomposer", "projector", "audio_inject")
    if scfg.lora_rank > 0:
        from clap2diffusion_tpu.train.lora import lora_trainable, merge_lora

        def trainable(path: tuple) -> bool:
            return base_trainable(path) or lora_trainable(path)
    else:
        trainable = base_trainable
    cast = _compute_cast(cfg)

    def init_tx(params):
        return make_optimizer(scfg, trainable=trainable, params=params)

    def step(state: TrainState, batch: Dict, rng: jax.Array, tx):
        temperature = temperature_from_config(state.step, cfg.condition)
        rng_d, rng_noise = jax.random.split(rng)

        def loss_fn(params):
            params = _stop_frozen(params, trainable)
            _, info = hier.apply(
                {"params": params["hierarchical"]},
                batch["clap"], temperature, return_all=True,
                deterministic=False, rngs={"dropout": rng_d},
            )
            noisy, noise, t = _sample_noising(schedule, batch["latent"], rng_noise)
            unet_params = cast(params["unet"])
            if scfg.lora_rank > 0:
                # fold the adapters at trace time: loop-invariant under the
                # steps_per_call scan, gradients reach only (A, B)
                unet_params = merge_lora(unet_params, params["lora"])
            eps = unet.apply(
                {"params": unet_params}, cast(noisy), t,
                cast(batch["text_ctx"]), cast(info["routed"]),
            )
            losses = {
                "diffusion": L.diffusion_mse(eps.astype(jnp.float32), noise),
                "orthogonality": info["losses"]["orthogonality"],
                "entropy": info["losses"]["entropy"],
                "prior": info["losses"]["prior"],
            }
            total = L.weighted_total(losses, scfg.loss_weights)
            losses["total"] = total
            losses["temperature"] = temperature
            return total, losses

        (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        new_state = _apply_updates(
            state, tx, grads, scfg.ema_decay if scfg.use_ema else None
        )
        return new_state, losses

    step.trainable = trainable  # EMA shadows only these leaves
    return step, init_tx, (hier, unet)


def make_stage3_step(cfg: Config):
    """Selective output-layer fine-tune with Norm-60 in the loop.

    params = {'hierarchical', 'adapter', 'unet'}; trainable: projector
    out_proj/out_norm + adapter output_proj (reference train_stage3.py:92-117).
    """
    hier = HierarchicalAudioEncoder(cfg=cfg.condition)
    adapter = AudioAdapter(cfg=cfg.condition)
    unet = UNet2DCondition(cfg=cfg.diffusion.unet)
    schedule = NoiseSchedule.create(cfg.diffusion.scheduler)
    scfg = cfg.train.stage3
    norm_target = cfg.condition.audio_norm_target
    cast = _compute_cast(cfg)

    def trainable(path: tuple) -> bool:
        joined = "/".join(path)
        return (
            ("projector" in joined and ("out_proj" in joined or "out_norm" in joined))
            or ("output_proj" in joined)
        )

    def init_tx(params):
        return make_optimizer(scfg, trainable=trainable, params=params)

    def step(state: TrainState, batch: Dict, rng: jax.Array, tx):
        rng_d, rng_noise = jax.random.split(rng)

        def loss_fn(params):
            params = _stop_frozen(params, trainable)
            adapter_tokens = adapter.apply(
                {"params": params["adapter"]}, batch["clap"]
            )
            adapter_tokens = rescale_to_norm(adapter_tokens, norm_target)

            _, info = hier.apply(
                {"params": params["hierarchical"]},
                batch["clap"], cfg.condition.temperature_final, return_all=True,
                deterministic=False, rngs={"dropout": rng_d},
            )
            routed = {
                k: rescale_to_norm(v, norm_target) for k, v in info["routed"].items()
            }
            noisy, noise, t = _sample_noising(schedule, batch["latent"], rng_noise)
            eps = unet.apply(
                {"params": cast(params["unet"])}, cast(noisy), t,
                cast(batch["text_ctx"]), cast(routed)
            )
            losses = {
                "diffusion": L.diffusion_mse(eps.astype(jnp.float32), noise),
                "consistency": L.consistency_loss(info["routed"]),
                "alignment": L.alignment_loss(adapter_tokens, batch["text_emb"]),
            }
            total = L.weighted_total(losses, scfg.loss_weights)
            losses["total"] = total
            return total, losses

        (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        new_state = _apply_updates(
            state, tx, grads, scfg.ema_decay if scfg.use_ema else None
        )
        return new_state, losses

    step.trainable = trainable  # EMA shadows only these leaves
    return step, init_tx, (hier, adapter, unet)
