"""Noise schedule + DDIM sampler with CFG as a single ``lax.scan``.

The reference intends (but stubs) a 50-step DDIM loop with CFG 7.5
(reference scripts/inference.py:153-166, :107-108). TPU-native design: the
whole denoising loop is one ``lax.scan`` over timesteps inside ``jit`` — one
compilation, no host round-trips; the conditional/unconditional UNet passes
are batched into a single forward (batch 2B) so the MXU sees one large
matmul stream.

Schedule: SD v1.5 scaled-linear betas (0.00085 -> 0.012, 1000 steps),
leading-spaced inference timesteps with steps_offset 1, eta=0,
epsilon-prediction.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import jax
import jax.numpy as jnp

from clap2diffusion_tpu.core.config import SchedulerConfig


@dataclass(frozen=True)
class NoiseSchedule:
    alphas_cumprod: jax.Array  # [T]
    num_train_timesteps: int

    @classmethod
    def create(cls, cfg: SchedulerConfig) -> "NoiseSchedule":
        t = cfg.num_train_timesteps
        if cfg.beta_schedule == "scaled_linear":
            betas = (
                jnp.linspace(cfg.beta_start**0.5, cfg.beta_end**0.5, t,
                             dtype=jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32)
                ** 2
            )
        elif cfg.beta_schedule == "linear":
            betas = jnp.linspace(cfg.beta_start, cfg.beta_end, t, dtype=jnp.float32)
        else:
            raise ValueError(f"unknown beta schedule {cfg.beta_schedule!r}")
        alphas_cumprod = jnp.cumprod(1.0 - betas).astype(jnp.float32)
        return cls(alphas_cumprod=alphas_cumprod, num_train_timesteps=t)

    def add_noise(self, x0: jax.Array, noise: jax.Array, t: jax.Array) -> jax.Array:
        """Forward diffusion q(x_t | x_0). ``t`` is integer [B]."""
        a = self.alphas_cumprod[t]
        shape = (-1,) + (1,) * (x0.ndim - 1)
        sqrt_a = jnp.sqrt(a).reshape(shape).astype(x0.dtype)
        sqrt_1ma = jnp.sqrt(1.0 - a).reshape(shape).astype(x0.dtype)
        return sqrt_a * x0 + sqrt_1ma * noise


def ddim_timesteps(num_inference_steps: int, num_train_timesteps: int = 1000,
                   steps_offset: int = 1) -> jax.Array:
    """Leading-spaced DDIM timesteps, descending (SD v1.5 convention)."""
    step = num_train_timesteps // num_inference_steps
    t = (jnp.arange(num_inference_steps) * step + steps_offset)
    return t[::-1].astype(jnp.int32)


def ddim_step(
    schedule: NoiseSchedule,
    latents: jax.Array,
    eps: jax.Array,
    t: jax.Array,
    t_prev: jax.Array,
) -> jax.Array:
    """One deterministic DDIM update (eta=0, epsilon prediction).

    ``t_prev < 0`` means the final step; alpha_prev then falls back to
    alphas_cumprod[0] (set_alpha_to_one=False, SD v1.5 scheduler config).
    """
    a_t = schedule.alphas_cumprod[t]
    a_prev = jnp.where(
        t_prev >= 0,
        schedule.alphas_cumprod[jnp.maximum(t_prev, 0)],
        schedule.alphas_cumprod[0],
    )
    lat32 = latents.astype(jnp.float32)
    eps32 = eps.astype(jnp.float32)
    x0 = (lat32 - jnp.sqrt(1.0 - a_t) * eps32) / jnp.sqrt(a_t)
    dir_xt = jnp.sqrt(1.0 - a_prev) * eps32
    return (jnp.sqrt(a_prev) * x0 + dir_xt).astype(latents.dtype)


def img2img_timesteps(
    num_inference_steps: int,
    strength: float,
    num_train_timesteps: int = 1000,
) -> jax.Array:
    """Tail slice of the DDIM grid for SDEdit-style img2img.

    ``strength`` in (0, 1]: fraction of the schedule actually denoised. The
    init latent is noised to the first returned timestep; ``strength=1.0``
    returns the full grid (pure generation dynamics from a noised init).
    Matches the diffusers img2img convention (run the last
    ``round(steps*strength)`` timesteps).
    """
    if not 0.0 < strength <= 1.0:
        raise ValueError(f"strength must be in (0, 1], got {strength}")
    ts = ddim_timesteps(num_inference_steps, num_train_timesteps)
    k = min(num_inference_steps, max(1, round(num_inference_steps * strength)))
    return ts[num_inference_steps - k:]


def ddim_sample(
    eps_fn: Callable[[jax.Array, jax.Array], jax.Array],
    schedule: NoiseSchedule,
    latents: jax.Array,
    num_inference_steps: int = 50,
    timesteps: jax.Array | None = None,
    blend_fn: Callable[[jax.Array, jax.Array], jax.Array] | None = None,
    rng: jax.Array | None = None,
) -> jax.Array:
    """Run the full DDIM loop as one lax.scan.

    ``eps_fn(latents, t)`` predicts epsilon (CFG folding happens inside it —
    see ``cfg_eps_fn``). ``timesteps`` overrides the grid (descending; used
    by img2img to run only the tail of the schedule). ``blend_fn(lat,
    t_prev)`` post-processes each update (inpainting re-imposes the known
    region there); it stays inside the one scan, so the hook is free when
    unused. ``rng`` is part of the uniform SAMPLERS signature; this sampler
    is deterministic and ignores it.
    """
    del rng  # deterministic ODE sampler
    ts = (
        ddim_timesteps(num_inference_steps, schedule.num_train_timesteps)
        if timesteps is None
        else timesteps
    )
    ts_prev = jnp.concatenate([ts[1:], jnp.array([-1], jnp.int32)])

    def body(lat, tt):
        t, t_prev = tt
        eps = eps_fn(lat, t)
        lat = ddim_step(schedule, lat, eps, t, t_prev)
        if blend_fn is not None:
            lat = blend_fn(lat, t_prev)
        return lat, None

    final, _ = jax.lax.scan(body, latents, (ts, ts_prev))
    return final


def dpmpp_2m_sample(
    eps_fn: Callable[[jax.Array, jax.Array], jax.Array],
    schedule: NoiseSchedule,
    latents: jax.Array,
    num_inference_steps: int = 20,
    timesteps: jax.Array | None = None,
    blend_fn: Callable[[jax.Array, jax.Array], jax.Array] | None = None,
    rng: jax.Array | None = None,
) -> jax.Array:
    """DPM-Solver++(2M): deterministic second-order multistep sampler.

    Beyond the reference's surface (its intended sampler is 50-step DDIM);
    offered because a second-order solver reaches comparable sample quality
    in ~20 steps — ~2.5x lower latency at the same UNet cost per step.
    Follows the data-prediction multistep formulation (Lu et al. 2022,
    "DPM-Solver++"), first-order on the first step, one ``lax.scan`` like
    ``ddim_sample``. Same leading-spaced timestep grid as DDIM so the two
    samplers differ only in the update rule. ``rng`` is ignored
    (deterministic sampler; uniform SAMPLERS signature).
    """
    del rng
    ts = (
        ddim_timesteps(num_inference_steps, schedule.num_train_timesteps)
        if timesteps is None
        else timesteps
    )
    ts_prev = jnp.concatenate([ts[1:], jnp.array([-1], jnp.int32)])

    def coeffs(t, t_is_final):
        a = jnp.where(t_is_final, schedule.alphas_cumprod[0],
                      schedule.alphas_cumprod[jnp.maximum(t, 0)])
        alpha = jnp.sqrt(a)
        sigma = jnp.sqrt(jnp.maximum(1.0 - a, 1e-12))
        return alpha, sigma, jnp.log(alpha) - jnp.log(sigma)

    def body(carry, tt):
        lat, prev_x0, prev_lam, first = carry
        t, t_prev = tt
        alpha_t, sigma_t, lam_t = coeffs(t, False)
        alpha_n, sigma_n, lam_n = coeffs(t_prev, t_prev < 0)

        eps = eps_fn(lat, t).astype(jnp.float32)
        lat32 = lat.astype(jnp.float32)
        x0 = (lat32 - sigma_t * eps) / alpha_t
        if blend_fn is not None:
            # keep the x0 HISTORY consistent with the blended trajectory:
            # in the known region the true x0 IS the init latent, and
            # blend_fn(x, t_prev=-1) is exactly the x0-space blend (its
            # ``known`` term degenerates to x0_init there). Without this
            # the 2M slope mixes x0 estimates from two different
            # trajectories and seams at the mask edge.
            x0 = blend_fn(x0, jnp.int32(-1)).astype(jnp.float32)

        h = lam_n - lam_t
        h_prev = lam_t - prev_lam
        r = jnp.where(first, 1.0, h_prev / h)  # h_prev = 0 on the first step
        # 2M combination; first step falls back to first-order (D = x0)
        d = jnp.where(
            first, x0, (1.0 + 1.0 / (2.0 * r)) * x0 - (1.0 / (2.0 * r)) * prev_x0
        )
        new_lat = (sigma_n / sigma_t) * lat32 - alpha_n * (jnp.exp(-h) - 1.0) * d
        new_lat = new_lat.astype(lat.dtype)
        if blend_fn is not None:
            new_lat = blend_fn(new_lat, t_prev)
        return (new_lat, x0, lam_t, jnp.zeros((), bool)), None

    lam0 = coeffs(ts[0], False)[2]
    carry0 = (latents, jnp.zeros_like(latents, jnp.float32), lam0,
              jnp.ones((), bool))
    (final, _, _, _), _ = jax.lax.scan(body, carry0, (ts, ts_prev))
    return final


def karras_timesteps(
    num_inference_steps: int,
    schedule: NoiseSchedule,
    rho: float = 7.0,
):
    """Karras sigma spacing (rho=7, Karras et al. 2022 "Elucidating...")
    mapped onto the discrete training grid.

    Computed in numpy at TRACE time — the schedule's ``alphas_cumprod`` is
    always a concrete array (built at pipeline/step-maker init, never
    inside jit), so the grid folds into the compiled program as a
    constant. Returns strictly-decreasing int32 timesteps: equal-log-sigma
    collisions at low step counts are pushed down one timestep because a
    repeated t would make the 2M update's h = 0 (division by zero in r).
    """
    import numpy as np

    a = np.asarray(schedule.alphas_cumprod, np.float64)
    sig = np.sqrt((1.0 - a) / a)  # EDM sigma per train timestep (ascending)
    smin, smax = sig[0], sig[-1]
    ramp = np.linspace(0.0, 1.0, num_inference_steps)
    sigmas = (
        smax ** (1.0 / rho) + ramp * (smin ** (1.0 / rho) - smax ** (1.0 / rho))
    ) ** rho  # descending
    t = np.abs(np.log(sig)[None, :] - np.log(sigmas)[:, None]).argmin(axis=1)
    # resolve collisions upward from the bottom (the dense low-noise end
    # can map several sigmas to t=0; bumping earlier entries up keeps the
    # grid strictly decreasing without leaving the [0, T) range)
    t = t.astype(np.int64)
    for i in range(len(t) - 2, -1, -1):
        if t[i] <= t[i + 1]:
            t[i] = t[i + 1] + 1
    if t[0] >= len(sig):
        raise ValueError(
            f"num_inference_steps={num_inference_steps} exceeds the "
            f"{len(sig)}-step training grid"
        )
    return jnp.asarray(t, jnp.int32)


def dpmpp_2m_karras_sample(
    eps_fn: Callable[[jax.Array, jax.Array], jax.Array],
    schedule: NoiseSchedule,
    latents: jax.Array,
    num_inference_steps: int = 20,
    timesteps: jax.Array | None = None,
    blend_fn: Callable[[jax.Array, jax.Array], jax.Array] | None = None,
    rng: jax.Array | None = None,
) -> jax.Array:
    """DPM-Solver++(2M) on the Karras sigma grid — the standard low-step
    pairing (concentrates steps at low noise where detail forms). When an
    explicit ``timesteps`` grid is passed (img2img tail slices), it wins
    and this reduces to plain ``dpmpp_2m``. ``rng`` is ignored
    (deterministic sampler; uniform SAMPLERS signature)."""
    if timesteps is None:
        timesteps = karras_timesteps(num_inference_steps, schedule)
    return dpmpp_2m_sample(eps_fn, schedule, latents, num_inference_steps,
                           timesteps, blend_fn)


def euler_ancestral_sample(
    eps_fn: Callable[[jax.Array, jax.Array], jax.Array],
    schedule: NoiseSchedule,
    latents: jax.Array,
    num_inference_steps: int = 50,
    timesteps: jax.Array | None = None,
    blend_fn: Callable[[jax.Array, jax.Array], jax.Array] | None = None,
    rng: jax.Array | None = None,
) -> jax.Array:
    """Euler-ancestral: stochastic first-order sampler (``euler_a``).

    Beyond the reference surface (its intended sampler is deterministic
    50-step DDIM, reference scripts/inference.py:153-166). On the
    variance-preserving grid this is exactly DDIM with eta=1 — the
    discrete-time counterpart of k-diffusion's ``sample_euler_ancestral``:
    each update jumps to a *lower* intermediate noise level deterministically
    and re-adds the variance gap as fresh noise. Stochasticity decorrelates
    error accumulation, giving the softer, more varied textures users pick
    ancestral samplers for.

    A deterministic Euler sampler is deliberately NOT registered: in epsilon
    parameterization on this grid, Euler's update is algebraically identical
    to DDIM's, so it would be a second name for the same program.

    ``rng``: a PRNG key (shape ``()``) or a per-lane key array (shape
    ``[B]``, matching ``latents.shape[0]``) — the per-lane form keeps each
    image's noise a function of its own seed, preserving the request
    coalescer's batch-composition-independence contract. Per-step keys are
    derived via ``fold_in(rng, step_index)``; no key state crosses the scan
    carry. The final step (``t_prev < 0``) adds no noise, so the output is a
    clean sample.
    """
    if rng is None:
        raise ValueError("euler_a is stochastic: pass rng= a jax.random key")
    if not jnp.issubdtype(rng.dtype, jax.dtypes.prng_key):
        # legacy uint32 PRNGKey ([2] scalar / [B,2] batch): wrap to a typed
        # key so the per-lane detection below (ndim) reads key COUNT, not
        # raw key words
        rng = jax.random.wrap_key_data(jnp.asarray(rng, jnp.uint32))
    ts = (
        ddim_timesteps(num_inference_steps, schedule.num_train_timesteps)
        if timesteps is None
        else timesteps
    )
    ts_prev = jnp.concatenate([ts[1:], jnp.array([-1], jnp.int32)])
    idx = jnp.arange(ts.shape[0], dtype=jnp.int32)
    per_lane = rng.ndim == 1
    if per_lane and rng.shape[0] != latents.shape[0]:
        raise ValueError(
            f"per-lane rng has {rng.shape[0]} keys for batch {latents.shape[0]}"
        )

    def draw(i, shape):
        if per_lane:
            return jax.vmap(
                lambda k: jax.random.normal(jax.random.fold_in(k, i), shape[1:])
            )(rng)
        return jax.random.normal(jax.random.fold_in(rng, i), shape)

    def body(lat, tti):
        t, t_prev, i = tti
        eps = eps_fn(lat, t).astype(jnp.float32)
        lat32 = lat.astype(jnp.float32)
        a_t = schedule.alphas_cumprod[t]
        a_prev = jnp.where(
            t_prev >= 0,
            schedule.alphas_cumprod[jnp.maximum(t_prev, 0)],
            schedule.alphas_cumprod[0],
        )
        x0 = (lat32 - jnp.sqrt(1.0 - a_t) * eps) / jnp.sqrt(a_t)
        # eta=1 posterior std (Song et al. 2020 DDIM eq. 16); algebraically
        # <= sqrt(1 - a_prev), clamped only against fp rounding
        var = (1.0 - a_prev) / (1.0 - a_t) * (1.0 - a_t / a_prev)
        sigma = jnp.where(t_prev >= 0, jnp.sqrt(jnp.maximum(var, 0.0)), 0.0)
        dir_xt = jnp.sqrt(jnp.maximum(1.0 - a_prev - sigma**2, 0.0)) * eps
        z = draw(i, lat.shape)
        new = jnp.sqrt(a_prev) * x0 + dir_xt + sigma * z
        new = new.astype(lat.dtype)
        if blend_fn is not None:
            new = blend_fn(new, t_prev)
        return new, None

    final, _ = jax.lax.scan(body, latents, (ts, ts_prev, idx))
    return final


SAMPLERS = {
    "ddim": ddim_sample,
    "dpmpp_2m": dpmpp_2m_sample,
    "dpmpp_2m_karras": dpmpp_2m_karras_sample,
    "euler_a": euler_ancestral_sample,
}


def cfg_eps_fn(
    unet_apply: Callable,
    context_cond,
    context_uncond,
    guidance_scale: float,
    audio_cond=None,
    audio_uncond=None,
    guidance_rescale: float = 0.0,
):
    """Build an eps_fn folding classifier-free guidance into ONE batched
    UNet forward: [uncond; cond] along the batch axis.

    ``guidance_rescale`` in [0, 1] applies the CFG-rescale fix from Lin et
    al. 2023 ("Common Diffusion Noise Schedules and Sample Steps are
    Flawed" eq. 15-16): rescale the guided prediction's per-sample std
    toward the conditional prediction's to counter CFG over-exposure at
    high guidance scales. It may be a traced scalar — one compiled program
    serves every value, and 0.0 (default) is bit-exact to plain CFG
    (w*rescaled + (1-w)*guided with w=0 reduces to guided exactly in
    IEEE arithmetic), so the frozen image golden is unaffected.
    """

    def tree_cat(a, b):
        if a is None and b is None:
            return None
        return jax.tree.map(lambda x, y: jnp.concatenate([x, y], axis=0), a, b)

    ctx = tree_cat(context_uncond, context_cond)
    audio = tree_cat(audio_uncond, audio_cond)

    def eps_fn(latents: jax.Array, t: jax.Array) -> jax.Array:
        b = latents.shape[0]
        lat2 = jnp.concatenate([latents, latents], axis=0)
        t2 = jnp.full((2 * b,), t, jnp.int32)
        eps2 = unet_apply(lat2, t2, ctx, audio)
        eps_u, eps_c = eps2[:b], eps2[b:]
        guided = eps_u + guidance_scale * (eps_c - eps_u)
        g32 = guided.astype(jnp.float32)
        c32 = eps_c.astype(jnp.float32)
        axes = tuple(range(1, guided.ndim))
        std_c = jnp.std(c32, axis=axes, keepdims=True)
        std_g = jnp.maximum(jnp.std(g32, axis=axes, keepdims=True), 1e-8)
        rescaled = g32 * (std_c / std_g)
        w = jnp.float32(guidance_rescale)
        out = w * rescaled + (1.0 - w) * g32
        return out.astype(guided.dtype)

    return eps_fn
