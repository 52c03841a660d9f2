"""UNet / VAE / CLIP-text / DDIM tests.

Forward passes run at tiny geometry (CPU CI); the full SD v1.5 geometry is
validated by abstract param-count parity against the known torch checkpoints
(UNet 859,520,964; AutoencoderKL 83,653,863; CLIP text 123,060,480) via
eval_shape — no memory allocated.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clap2diffusion_tpu.core.config import (
    CLIPTextConfig,
    SchedulerConfig,
    UNetConfig,
    VAEConfig,
)
from clap2diffusion_tpu.diffusion.ddim import (
    NoiseSchedule,
    cfg_eps_fn,
    ddim_sample,
    ddim_step,
    ddim_timesteps,
)
from clap2diffusion_tpu.models.clip_text import CLIPTextEncoder
from clap2diffusion_tpu.models.unet import UNet2DCondition
from clap2diffusion_tpu.models.vae import AutoencoderKL

TINY_UNET = UNetConfig(
    block_out_channels=(32, 64, 64, 64),
    layers_per_block=2,
    num_attention_heads=4,
    cross_attention_dim=64,
    norm_num_groups=8,
    sample_size=16,
    flash_attention=False,
)
TINY_VAE = VAEConfig(block_out_channels=(16, 32, 32, 32), norm_num_groups=8)


def n_params_abstract(model, *args, method=None):
    shapes = jax.eval_shape(
        model.init if method is None else lambda r, *a: model.init(r, *a, method=method),
        jax.random.key(0),
        *args,
    )
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(shapes))


@pytest.mark.slow
def test_tiny_unet_forward_with_audio():
    model = UNet2DCondition(cfg=TINY_UNET)
    sample = jnp.ones((2, 16, 16, 4))
    t = jnp.array([10, 500])
    ctx = jnp.ones((2, 77, 64))
    audio = {lvl: jnp.ones((2, 10, 64)) for lvl in ("early", "mid", "late")}
    v = model.init(jax.random.key(0), sample, t, ctx, audio)
    out = model.apply(v, sample, t, ctx, audio)
    assert out.shape == (2, 16, 16, 4)
    assert np.isfinite(np.asarray(out)).all()
    # no-audio path shares the same params (injection modules always exist)
    out2 = model.apply(v, sample, t, ctx, None)
    assert out2.shape == (2, 16, 16, 4)
    # audio changes the prediction
    assert float(jnp.abs(out - out2).max()) > 0


def test_fused_qkv_parity(monkeypatch):
    """The fused self-attention QKV path (one [C,3C] matmul over concatenated
    kernels) must share the exact parameter tree of the three-Dense path and
    produce bit-identical outputs — it is a pure compile-time rewrite."""
    model = UNet2DCondition(cfg=TINY_UNET)
    sample = jnp.ones((1, 16, 16, 4))
    t = jnp.array([10])
    ctx = jnp.ones((1, 77, 64))

    monkeypatch.setenv("C2D_FUSED_QKV", "0")
    v_sep = model.init(jax.random.key(0), sample, t, ctx, None)
    out_sep = model.apply(v_sep, sample, t, ctx, None)

    monkeypatch.setenv("C2D_FUSED_QKV", "1")
    v_fused = model.init(jax.random.key(0), sample, t, ctx, None)
    assert jax.tree.structure(v_sep) == jax.tree.structure(v_fused)
    for a, b in zip(jax.tree.leaves(v_sep), jax.tree.leaves(v_fused)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    out_fused = model.apply(v_sep, sample, t, ctx, None)
    np.testing.assert_array_equal(np.asarray(out_sep), np.asarray(out_fused))


def test_full_unet_param_parity_sd15():
    cfg = UNetConfig(audio_inject=False)
    model = UNet2DCondition(cfg=cfg)
    n = n_params_abstract(
        model,
        jnp.ones((1, 64, 64, 4)),
        jnp.ones((1,), jnp.int32),
        jnp.ones((1, 77, 768)),
    )
    assert n == 859_520_964  # diffusers runwayml/stable-diffusion-v1-5 UNet


def test_full_vae_param_parity_sd15():
    model = AutoencoderKL(cfg=VAEConfig())
    n = n_params_abstract(
        model, jnp.ones((1, 64, 64, 3)), jax.random.key(1)
    )
    assert n == 83_653_863  # diffusers AutoencoderKL (SD v1.5)


def test_full_clip_text_param_parity():
    model = CLIPTextEncoder(cfg=CLIPTextConfig())
    n = n_params_abstract(model, jnp.ones((1, 77), jnp.int32))
    assert n == 123_060_480  # openai/clip-vit-large-patch14 text tower


@pytest.mark.slow
def test_tiny_vae_roundtrip_shapes():
    model = AutoencoderKL(cfg=TINY_VAE)
    x = jnp.ones((1, 32, 32, 3))
    v = model.init(jax.random.key(0), x, jax.random.key(1))
    mean, logvar = model.apply(v, x, method=AutoencoderKL.encode)
    assert mean.shape == (1, 4, 4, 4)
    z = model.apply(v, x, jax.random.key(2), method=AutoencoderKL.sample_latent)
    img = model.apply(v, z, method=AutoencoderKL.decode_latent)
    assert img.shape == (1, 32, 32, 3)


def test_clip_text_forward_tiny():
    cfg = CLIPTextConfig(vocab_size=1000, hidden_size=64, num_layers=2,
                         num_heads=4, intermediate_size=128)
    model = CLIPTextEncoder(cfg=cfg)
    ids = jnp.array([[1, 2, 3, 4] * 19 + [0]])
    v = model.init(jax.random.key(0), ids)
    out = model.apply(v, ids)
    assert out.shape == (1, 77, 64)
    # causal: token 0's embedding must not depend on later tokens
    ids2 = ids.at[0, -1].set(99)
    out2 = model.apply(v, ids2)
    np.testing.assert_allclose(np.asarray(out[0, 0]), np.asarray(out2[0, 0]),
                               atol=1e-5)


def test_schedule_matches_sd15_reference_values():
    s = NoiseSchedule.create(SchedulerConfig())
    # known SD v1.5 endpoints of the scaled-linear cumulative product
    assert float(s.alphas_cumprod[0]) == pytest.approx(1 - 0.00085, rel=1e-5)
    assert 0.004 < float(s.alphas_cumprod[-1]) < 0.006
    # monotone decreasing in (0, 1]
    a = np.asarray(s.alphas_cumprod)
    assert (np.diff(a) < 0).all() and a.min() > 0 and a.max() <= 1.0


def test_ddim_timesteps_leading_offset():
    ts = np.asarray(ddim_timesteps(50))
    assert ts[0] == 981 and ts[-1] == 1
    assert len(ts) == 50 and (np.diff(ts) == -20).all()


def test_ddim_perfect_eps_recovers_x0():
    """If eps_fn returns the exact noise, DDIM must walk back to ~x0."""
    s = NoiseSchedule.create(SchedulerConfig())
    key = jax.random.key(0)
    x0 = jax.random.normal(key, (1, 8, 8, 4)) * 0.5
    noise = jax.random.normal(jax.random.key(1), x0.shape)
    t_start = jnp.array([981])
    xt = s.add_noise(x0, noise, t_start)
    final = ddim_sample(lambda lat, t: noise, s, xt, num_inference_steps=50)
    # with exact eps, x0_pred stays exactly x0 at every step, and the final
    # state is sqrt(a_0) x0 + sqrt(1-a_0) eps (set_alpha_to_one=False)
    a0 = s.alphas_cumprod[0]
    expected = jnp.sqrt(a0) * x0 + jnp.sqrt(1 - a0) * noise
    np.testing.assert_allclose(np.asarray(final), np.asarray(expected), atol=1e-4)
    # and that is ~x0 up to the small residual noise floor
    assert float(jnp.abs(final - x0).mean()) < 0.05


def test_dpmpp_2m_perfect_eps_recovers_x0():
    """Same invariant as DDIM: with exact eps, every x0 prediction equals
    x0, the 2M combination D == x0, and the final state lands on
    sqrt(a_0) x0 + sqrt(1-a_0) eps — the solver stays on the diffusion
    path for a linear model regardless of order."""
    from clap2diffusion_tpu.diffusion.ddim import dpmpp_2m_sample

    s = NoiseSchedule.create(SchedulerConfig())
    x0 = jax.random.normal(jax.random.key(0), (1, 8, 8, 4)) * 0.5
    noise = jax.random.normal(jax.random.key(1), x0.shape)
    t0 = ddim_timesteps(20)[0]  # the 20-step grid starts at t=951, not 981
    xt = s.add_noise(x0, noise, jnp.array([t0]))
    final = dpmpp_2m_sample(lambda lat, t: noise, s, xt, num_inference_steps=20)
    a0 = s.alphas_cumprod[0]
    expected = jnp.sqrt(a0) * x0 + jnp.sqrt(1 - a0) * noise
    np.testing.assert_allclose(np.asarray(final), np.asarray(expected), atol=1e-4)


def test_dpmpp_2m_converges_to_ddim_with_step_count():
    """Both integrate the same probability-flow ODE, so on the SAME
    timestep grid their gap must shrink as the grid refines (it is
    dominated by DDIM's first-order discretization error, ~1/N).
    Measured: 0.18 @ N=20, 0.060 @ N=100, 0.013 @ N=500."""
    from clap2diffusion_tpu.diffusion.ddim import dpmpp_2m_sample

    s = NoiseSchedule.create(SchedulerConfig())
    w = jax.random.normal(jax.random.key(2), (4, 4)) * 0.1

    def eps_fn(lat, t):
        return jnp.tanh(lat @ w)  # smooth, bounded, latent-dependent

    xt = jax.random.normal(jax.random.key(3), (1, 8, 8, 4))
    gaps = []
    for n in (20, 100, 500):
        gap = float(jnp.abs(
            ddim_sample(eps_fn, s, xt, num_inference_steps=n)
            - dpmpp_2m_sample(eps_fn, s, xt, num_inference_steps=n)
        ).mean())
        gaps.append(gap)
    assert gaps[0] > gaps[1] > gaps[2], gaps
    # ~1/N decay: 25x more steps must shrink the gap by well over 4x
    assert gaps[2] < gaps[0] / 4.0, gaps
    # and the solvers genuinely differ at coarse settings (different order)
    assert gaps[0] > 0.05, gaps


def test_karras_timesteps_grid():
    """Karras rho-7 grid: strictly decreasing, in range, and denser at the
    low-noise end than the leading-spaced DDIM grid."""
    from clap2diffusion_tpu.diffusion.ddim import karras_timesteps

    s = NoiseSchedule.create(SchedulerConfig())
    for n in (5, 20, 50):
        t = np.asarray(karras_timesteps(n, s))
        assert t.shape == (n,)
        assert (np.diff(t) < 0).all(), t  # strictly decreasing
        assert t[0] <= 999 and t[-1] >= 0
    t = np.asarray(karras_timesteps(20, s))
    # rho-7 concentrates steps at low sigma: the last gap is much smaller
    # than the first (the uniform DDIM grid has them equal)
    assert abs(t[-1] - t[-2]) * 4 < abs(t[0] - t[1]), t
    assert t[0] > 900 and t[-1] < 20, t  # spans the schedule


def test_dpmpp_2m_karras_perfect_eps_recovers_x0():
    """The solver invariant holds on the Karras grid too: exact eps keeps
    every x0 prediction at x0 and the final state on the diffusion path."""
    from clap2diffusion_tpu.diffusion.ddim import (
        dpmpp_2m_karras_sample,
        karras_timesteps,
    )

    s = NoiseSchedule.create(SchedulerConfig())
    x0 = jax.random.normal(jax.random.key(0), (1, 8, 8, 4)) * 0.5
    noise = jax.random.normal(jax.random.key(1), x0.shape)
    t0 = karras_timesteps(20, s)[0]
    xt = s.add_noise(x0, noise, jnp.array([t0]))
    final = dpmpp_2m_karras_sample(
        lambda lat, t: noise, s, xt, num_inference_steps=20
    )
    a0 = s.alphas_cumprod[0]
    expected = jnp.sqrt(a0) * x0 + jnp.sqrt(1 - a0) * noise
    np.testing.assert_allclose(np.asarray(final), np.asarray(expected),
                               atol=1e-4)


def test_euler_a_single_step_is_ddim_and_rng_free():
    """The final step (t_prev < 0) adds no noise, so a 1-step euler_a run is
    exactly the 1-step DDIM update and independent of the rng."""
    from clap2diffusion_tpu.diffusion.ddim import euler_ancestral_sample

    s = NoiseSchedule.create(SchedulerConfig())
    xt = jax.random.normal(jax.random.key(0), (1, 8, 8, 4))
    eps_fn = lambda lat, t: lat * 0.1
    ddim = ddim_sample(eps_fn, s, xt, num_inference_steps=1)
    outs = [
        euler_ancestral_sample(eps_fn, s, xt, num_inference_steps=1,
                               rng=jax.random.key(k))
        for k in (1, 2)
    ]
    # rng-free: bitwise identical across keys
    np.testing.assert_array_equal(np.asarray(outs[0]), np.asarray(outs[1]))
    # equals the DDIM update up to XLA fusion rounding (the dead +sigma*z
    # term changes the fusion grouping by ~1 ulp)
    np.testing.assert_allclose(np.asarray(outs[0]), np.asarray(ddim),
                               atol=1e-6)


def test_euler_a_determinism_and_rng_sensitivity():
    from clap2diffusion_tpu.diffusion.ddim import euler_ancestral_sample

    s = NoiseSchedule.create(SchedulerConfig())
    w = jax.random.normal(jax.random.key(2), (4, 4)) * 0.1
    eps_fn = lambda lat, t: jnp.tanh(lat @ w)
    xt = jax.random.normal(jax.random.key(3), (1, 8, 8, 4))
    a = euler_ancestral_sample(eps_fn, s, xt, num_inference_steps=8,
                               rng=jax.random.key(7))
    b = euler_ancestral_sample(eps_fn, s, xt, num_inference_steps=8,
                               rng=jax.random.key(7))
    c = euler_ancestral_sample(eps_fn, s, xt, num_inference_steps=8,
                               rng=jax.random.key(8))
    d = ddim_sample(eps_fn, s, xt, num_inference_steps=8)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert float(jnp.abs(a - c).mean()) > 1e-3  # stochastic in the rng
    assert float(jnp.abs(a - d).mean()) > 1e-3  # differs from the ODE path
    assert np.isfinite(np.asarray(a)).all()
    # the injected noise is bounded by the schedule: the stochastic sample
    # stays at the deterministic trajectory's scale, not a random walk
    # (the toy eps_fn doesn't denoise, so both trajectories amplify the
    # latent equally — compare relative, not absolute, scale)
    assert float(jnp.abs(a).mean()) < 2.0 * float(jnp.abs(d).mean())
    with pytest.raises(ValueError, match="stochastic"):
        euler_ancestral_sample(eps_fn, s, xt, num_inference_steps=8)


def test_euler_a_per_lane_keys_are_batch_independent():
    """With a [B] key array, lane i's output is a function of key i alone —
    the same batch-composition-independence contract as per-lane init
    latents (the server coalescer relies on it)."""
    from clap2diffusion_tpu.diffusion.ddim import euler_ancestral_sample

    s = NoiseSchedule.create(SchedulerConfig())
    w = jax.random.normal(jax.random.key(2), (4, 4)) * 0.1
    eps_fn = lambda lat, t: jnp.tanh(lat @ w)  # lane-independent model
    xt = jax.random.normal(jax.random.key(3), (2, 8, 8, 4))
    keys = jax.random.split(jax.random.key(11), 2)
    both = euler_ancestral_sample(eps_fn, s, xt, num_inference_steps=6,
                                  rng=keys)
    for i in range(2):
        solo = euler_ancestral_sample(eps_fn, s, xt[i:i + 1],
                                      num_inference_steps=6,
                                      rng=keys[i:i + 1])
        np.testing.assert_allclose(np.asarray(both[i:i + 1]),
                                   np.asarray(solo), atol=1e-5)
    # mismatched key count fails loudly
    with pytest.raises(ValueError, match="per-lane rng"):
        euler_ancestral_sample(eps_fn, s, xt, num_inference_steps=6,
                               rng=keys[:1])


def test_euler_a_accepts_legacy_prngkey():
    """A legacy uint32 PRNGKey (shape [2]) must be read as ONE key, not two
    per-lane keys — it wraps to a typed key and matches jax.random.key."""
    from clap2diffusion_tpu.diffusion.ddim import euler_ancestral_sample

    s = NoiseSchedule.create(SchedulerConfig())
    eps_fn = lambda lat, t: lat * 0.1
    xt = jax.random.normal(jax.random.key(0), (2, 8, 8, 4))
    legacy = euler_ancestral_sample(eps_fn, s, xt, num_inference_steps=4,
                                    rng=jax.random.PRNGKey(7))
    typed = euler_ancestral_sample(eps_fn, s, xt, num_inference_steps=4,
                                   rng=jax.random.key(7))
    np.testing.assert_array_equal(np.asarray(legacy), np.asarray(typed))
    # batched legacy keys [B, 2] wrap to B per-lane keys
    legacy_b = jax.vmap(jax.random.PRNGKey)(jnp.arange(2))
    typed_b = jax.vmap(jax.random.key)(jnp.arange(2))
    a = euler_ancestral_sample(eps_fn, s, xt, num_inference_steps=4,
                               rng=legacy_b)
    b = euler_ancestral_sample(eps_fn, s, xt, num_inference_steps=4,
                               rng=typed_b)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_cfg_folding():
    """guidance 1.0 == pure conditional; uncond==cond collapses guidance."""
    calls = {}

    def unet_apply(lat, t, ctx, audio):
        calls["batch"] = lat.shape[0]
        # pseudo-UNet: eps depends linearly on context mean
        return lat * 0 + jnp.mean(ctx) + 0 * lat

    ctx_c = jnp.ones((1, 4, 8)) * 2.0
    ctx_u = jnp.ones((1, 4, 8)) * 1.0
    fn = cfg_eps_fn(unet_apply, ctx_c, ctx_u, guidance_scale=7.5)
    lat = jnp.zeros((1, 2, 2, 4))
    eps = fn(lat, jnp.array(10))
    assert calls["batch"] == 2  # one folded forward
    # eps = u + 7.5 (c - u) with c=2, u=1 -> 8.5... but mean(ctx) is shared
    # since tree_cat merges: mean([1,2])=1.5 for both halves -> eps==1.5
    # Verify with distinguishable apply instead:
    def unet_apply2(lat, t, ctx, audio):
        half = ctx.shape[0] // 2
        per = jnp.mean(ctx, axis=(1, 2))
        return lat + per[:, None, None, None]

    fn2 = cfg_eps_fn(unet_apply2, ctx_c, ctx_u, guidance_scale=7.5)
    eps2 = fn2(lat, jnp.array(10))
    assert float(eps2[0, 0, 0, 0]) == pytest.approx(1.0 + 7.5 * (2.0 - 1.0))


@pytest.mark.slow
def test_unet_concat_injection_mode():
    """'concat' injection (KV append, reference
    audio_attention_processor.py:99-109) end-to-end through the UNet."""
    import dataclasses

    cfg = dataclasses.replace(TINY_UNET, injection_mode="concat",
                              injection_bottleneck=8)
    model = UNet2DCondition(cfg=cfg)
    sample = jnp.ones((1, 16, 16, 4))
    t = jnp.array([10])
    ctx = jnp.ones((1, 7, 64))
    audio = {lvl: jnp.ones((1, 10, 64)) for lvl in ("early", "mid", "late")}
    v = model.init(jax.random.key(0), sample, t, ctx, audio)
    out = model.apply(v, sample, t, ctx, audio)
    assert out.shape == (1, 16, 16, 4)
    assert np.isfinite(np.asarray(out)).all()
    # with no audio, concat mode degrades to plain text context
    out2 = model.apply(v, sample, t, ctx, None)
    assert float(jnp.abs(out - out2).max()) > 0
