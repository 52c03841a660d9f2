"""W8A8 int8 serving path (ops/quant.py, C2D_INT8=1).

Pins: quantization math vs fp references, parameter-tree invariance (int8
mode must load the same checkpoints as the fp path), end-to-end epsilon
drift bounds at tiny geometry, and the serve-only guard in run_stage.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clap2diffusion_tpu.ops import quant


def _cos(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))


def test_int8_matmul_tracks_fp():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(64, 256)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(256, 128)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.normal(size=(128,)) * 0.1, jnp.float32)
    got = quant.int8_matmul(x, w, b)
    want = x @ w + b
    assert got.dtype == want.dtype
    assert _cos(got, want) > 0.999
    # per-element: 8-bit symmetric quant of both operands over K=256
    err = np.abs(np.asarray(got - want))
    assert err.max() < 0.15 * float(jnp.abs(want).max())


def test_int8_conv_tracks_fp():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 32)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(3, 3, 32, 16)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.normal(size=(16,)) * 0.1, jnp.float32)
    got = quant.int8_conv(x, k, b)
    want = jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + b
    assert got.shape == want.shape
    assert _cos(got, want) > 0.999


def test_quantize_weight_per_channel():
    rng = np.random.default_rng(2)
    # one output channel 100x larger: per-channel scales must keep the
    # small channels at full 8-bit resolution
    w = rng.normal(size=(64, 8)).astype(np.float32) * 0.01
    w[:, 3] *= 100.0
    wi, s = quant.quantize_weight(jnp.asarray(w), out_axis=1)
    assert wi.dtype == jnp.int8 and s.shape == (8,)
    back = np.asarray(wi, np.float32) * np.asarray(s)[None, :]
    for c in range(8):
        assert _cos(back[:, c], w[:, c]) > 0.999


@pytest.fixture
def int8_env(monkeypatch):
    monkeypatch.setenv("C2D_INT8", "1")
    monkeypatch.setattr(quant, "INT8_MIN_WIDTH", 8)


def _tiny_unet_io():
    from tests.test_diffusion_models import TINY_UNET
    from clap2diffusion_tpu.models.unet import UNet2DCondition

    model = UNet2DCondition(cfg=TINY_UNET)
    sample = jnp.asarray(
        np.random.default_rng(3).normal(size=(2, 16, 16, 4)), jnp.float32
    )
    t = jnp.array([10, 500])
    ctx = jnp.asarray(
        np.random.default_rng(4).normal(size=(2, 77, 64)), jnp.float32
    )
    audio = {
        lvl: jnp.asarray(
            np.random.default_rng(5).normal(size=(2, 10, 64)), jnp.float32
        )
        for lvl in ("early", "mid", "late")
    }
    return model, (sample, t, ctx, audio)


@pytest.mark.slow  # losing-experiment path (opt-in only; BENCH_NOTES int8 A/B)
def test_param_tree_identical_and_drift_bounded(int8_env, monkeypatch):
    """int8 mode must share checkpoints with the fp path (same tree, same
    init values), and its epsilon prediction must track fp closely."""
    model, args = _tiny_unet_io()
    v_int8 = model.init(jax.random.key(0), *args)
    out_int8 = model.apply(v_int8, *args)

    monkeypatch.setenv("C2D_INT8", "0")
    v_fp = model.init(jax.random.key(0), *args)
    out_fp = model.apply(v_fp, *args)

    # identical trees AND identical values: the env var only changes math,
    # never parameters
    chex_paths = jax.tree_util.tree_structure(v_fp)
    assert jax.tree_util.tree_structure(v_int8) == chex_paths
    for a, b in zip(jax.tree.leaves(v_fp), jax.tree.leaves(v_int8)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    assert out_int8.shape == out_fp.shape
    assert _cos(out_int8, out_fp) > 0.99


@pytest.mark.slow  # losing-experiment path (opt-in only; BENCH_NOTES int8 A/B)
def test_int8_checkpoint_cross_load(int8_env, monkeypatch):
    """Params initialized under fp mode apply cleanly under int8 mode."""
    model, args = _tiny_unet_io()
    monkeypatch.setenv("C2D_INT8", "0")
    v = model.init(jax.random.key(1), *args)
    monkeypatch.setenv("C2D_INT8", "1")
    out = model.apply(v, *args)
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_run_stage_refuses_int8(int8_env, tmp_path):
    from clap2diffusion_tpu.core.config import Config
    from clap2diffusion_tpu.train.trainer import run_stage

    with pytest.raises(RuntimeError, match="serve-only"):
        run_stage(Config(), 1, {}, data_root=str(tmp_path), max_steps=1)


def test_disabled_by_default(monkeypatch):
    monkeypatch.delenv("C2D_INT8", raising=False)
    assert not quant.enabled()
    assert not quant.eligible(4096, 4096)
