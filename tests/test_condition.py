"""Condition-stack tests: shapes, param-count parity with the reference
(measured in SURVEY.md section 2.1), temperature schedule values, losses,
Norm-60, and injection semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clap2diffusion_tpu.core.config import ConditionConfig
from clap2diffusion_tpu.models.condition import (
    AudioAdapter,
    AudioInjection,
    GatedAudioCrossAttention,
    HierarchicalAudioEncoder,
    HierarchicalAudioV4,
    temperature_at_step,
)
from clap2diffusion_tpu.models.condition.inject import adaptive_avg_pool_tokens
from clap2diffusion_tpu.ops.token_norm import rescale_to_norm

CFG = ConditionConfig()


def n_params(tree):
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))


@pytest.fixture(scope="module")
def encoder_vars():
    model = HierarchicalAudioEncoder(cfg=CFG)
    v = model.init(jax.random.key(0), jnp.ones((2, 512)), 2.0)
    return model, v


@pytest.mark.slow
def test_encoder_shapes_and_param_parity(encoder_vars):
    model, v = encoder_vars
    audio = jax.random.normal(jax.random.key(1), (4, 512))
    tokens77, info = model.apply(v, audio, 2.0, return_all=True)
    assert tokens77.shape == (4, 77, 768)
    assert info["tokens_10"].shape == (4, 10, 768)
    assert info["assignments"].shape == (4, 10, 3)
    assert set(info["routed"].keys()) == {"early", "mid", "late"}
    assert info["routed"]["early"].shape == (4, 10, 768)
    assert info["hierarchy_weights"].shape == (4, 3)
    # assignments are a distribution over levels
    np.testing.assert_allclose(
        np.sum(np.asarray(info["assignments"]), axis=-1), 1.0, atol=1e-5
    )
    # Exact parameter parity with reference measurements (SURVEY.md 2.1):
    p = v["params"]
    assert n_params(p["decomposer"]) == 1_232_843
    assert n_params(p["adaptive_weights"]) == 3_111
    assert n_params(p["router"]) == 12
    assert n_params(p["projector"]) == 2_604_800
    assert n_params(p) == 3_840_766


@pytest.mark.slow
def test_legacy_v4_param_parity():
    model = HierarchicalAudioV4(cfg=CFG)
    v = model.init(jax.random.key(0), jnp.ones((1, 512)))
    assert n_params(v["params"]) == 12_843_395  # SURVEY.md 2.1 measured
    out, inter = model.apply(v, jnp.ones((2, 512)), return_intermediate=True)
    assert out.shape == (2, 77, 768)
    assert inter["tokens10"].shape == (2, 10, 768)


def test_adapter_param_parity_and_shape():
    model = AudioAdapter(cfg=CFG)
    v = model.init(jax.random.key(0), jnp.ones((1, 512)))
    assert n_params(v["params"]) == 16_510_464  # SURVEY.md 2.1 measured
    out = model.apply(v, jax.random.normal(jax.random.key(2), (3, 512)))
    assert out.shape == (3, 16, 768)


def test_temperature_schedule_reference_semantics():
    # warmup hold at T_max (reference hierarchical_audio_v4.py:56-58)
    assert float(temperature_at_step(0)) == pytest.approx(2.0)
    assert float(temperature_at_step(199)) == pytest.approx(2.0)
    # end: T_min
    assert float(temperature_at_step(5000)) == pytest.approx(0.5)
    assert float(temperature_at_step(99999)) == pytest.approx(0.5)
    # midpoint of cosine: (T_max+T_min)/2
    mid = (200 + 5000) // 2
    assert float(temperature_at_step(mid)) == pytest.approx(1.25, abs=1e-3)
    # linear mode
    assert float(
        temperature_at_step(2600, mode="linear")
    ) == pytest.approx(2.0 - 1.5 * 0.5, abs=1e-3)
    # floor at 0.1 (reference :152)
    assert float(temperature_at_step(9999, t_min=0.01)) == pytest.approx(0.1)


def test_losses_behave():
    model = HierarchicalAudioEncoder(cfg=CFG)
    v = model.init(jax.random.key(0), jnp.ones((2, 512)), 2.0)
    _, info = model.apply(
        v, jax.random.normal(jax.random.key(3), (4, 512)), 2.0, return_all=True
    )
    losses = info["losses"]
    assert set(losses) == {"entropy", "orthogonality", "prior"}
    # entropy of a 3-way distribution is in [0, log 3]
    assert 0.0 <= float(losses["entropy"]) <= np.log(3) + 1e-5
    assert float(losses["orthogonality"]) >= 0.0
    assert float(losses["prior"]) >= -1e-6


def test_norm60():
    x = jax.random.normal(jax.random.key(0), (2, 77, 768)) * 3.0
    y = rescale_to_norm(x, 60.0)
    mean_norm = float(jnp.linalg.norm(y, axis=-1).mean())
    assert mean_norm == pytest.approx(60.0, rel=1e-4)
    # zero input passes through unscaled
    z = rescale_to_norm(jnp.zeros((1, 4, 8)), 60.0)
    assert float(jnp.abs(z).max()) == 0.0


def test_adaptive_pool_matches_torch():
    import torch

    x = np.random.default_rng(0).normal(size=(2, 10, 16)).astype(np.float32)
    ours = np.asarray(adaptive_avg_pool_tokens(jnp.asarray(x), 4))
    theirs = (
        torch.nn.functional.adaptive_avg_pool1d(
            torch.from_numpy(x).transpose(1, 2), 4
        )
        .transpose(1, 2)
        .numpy()
    )
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_injection_add_mode_gate_half_at_init():
    inj = AudioInjection(mode="add")
    ehs = jnp.zeros((2, 77, 768))
    audio = jnp.ones((2, 10, 768))
    v = inj.init(jax.random.key(0), ehs, audio)
    out = inj.apply(v, ehs, audio)
    # alpha init 0 => sigmoid = 0.5; output = 0.5 * pooled projection
    pooled = out[:, 0]
    assert out.shape == (2, 77, 768)
    # every position gets the same broadcasted addition
    np.testing.assert_allclose(np.asarray(out[:, 1]), np.asarray(pooled), atol=1e-6)
    # None audio is identity
    np.testing.assert_allclose(np.asarray(inj.apply(v, ehs, None)), 0.0)


def test_injection_concat_mode():
    inj = AudioInjection(mode="concat")
    ehs = jnp.zeros((2, 77, 768))
    audio = jnp.ones((2, 10, 768))
    v = inj.init(jax.random.key(0), ehs, audio)
    out = inj.apply(v, ehs, audio)
    assert out.shape == (2, 77 + 4, 768)


def test_gated_cross_attention_near_identity_at_init():
    m = GatedAudioCrossAttention(query_dim=320)
    x = jax.random.normal(jax.random.key(0), (2, 64, 320))
    ctx = jax.random.normal(jax.random.key(1), (2, 16, 768))
    v = m.init(jax.random.key(2), x, ctx)
    out = m.apply(v, x, ctx)
    # gate = sigmoid(-5) ~ 0.0067 -> output barely deviates from residual
    rel = float(jnp.abs(out - x).max() / (jnp.abs(x).max()))
    assert rel < 0.05


def test_encoder_deterministic_same_seed(encoder_vars):
    model, v = encoder_vars
    audio = jax.random.normal(jax.random.key(7), (2, 512))
    a = model.apply(v, audio, 1.0)
    b = model.apply(v, audio, 1.0)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
