"""ops tests: flash attention parity vs XLA reference (interpreter mode on
CPU), mha head plumbing, and gradient correctness of the custom VJP."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clap2diffusion_tpu.ops.attention import dot_product_attention, mha
from clap2diffusion_tpu.ops import flash_attention as fa


def _xla_ref(q, k, v, scale):
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * scale
    p = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


@pytest.mark.parametrize("d", [40, 64, 128, 160])
def test_flash_forward_matches_xla_interpret(monkeypatch, d):
    # run the Pallas kernel in interpreter mode on CPU
    import jax.experimental.pallas as pl

    orig = pl.pallas_call

    def interp(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(fa.pl, "pallas_call", interp)

    q = jax.random.normal(jax.random.key(0), (2, 3, 256, d))
    k = jax.random.normal(jax.random.key(1), (2, 3, 384, d))
    v = jax.random.normal(jax.random.key(2), (2, 3, 384, d))
    scale = d**-0.5
    ours = fa._flash_fwd(q, k, v, scale)
    ref = _xla_ref(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("h,d", [(8, 40), (5, 40), (8, 64), (4, 32)])
@pytest.mark.slow
def test_packed_flash_matches_xla_interpret(monkeypatch, h, d):
    """Head-packed forward (block-diagonal K/V, segmented softmax) vs XLA,
    including ghost-head remainders (h=5 with pack=3)."""
    import jax.experimental.pallas as pl

    orig = pl.pallas_call

    def interp(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(fa.pl, "pallas_call", interp)

    q = jax.random.normal(jax.random.key(0), (2, h, 512, d))
    k = jax.random.normal(jax.random.key(1), (2, h, 512, d))
    v = jax.random.normal(jax.random.key(2), (2, h, 512, d))
    scale = d**-0.5
    ours = fa._packed_flash_fwd(q, k, v, scale, min(128 // d, h))
    ref = _xla_ref(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-5)


def test_flash_vjp_matches_xla_grad(monkeypatch):
    import jax.experimental.pallas as pl

    orig = pl.pallas_call

    def interp(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(fa.pl, "pallas_call", interp)

    q = jax.random.normal(jax.random.key(0), (1, 2, 256, 64))
    k = jax.random.normal(jax.random.key(1), (1, 2, 256, 64))
    v = jax.random.normal(jax.random.key(2), (1, 2, 256, 64))
    scale = 0.125

    g_ours = jax.grad(lambda q: fa.flash_attention(q, k, v, scale).sum())(q)
    g_ref = jax.grad(lambda q: _xla_ref(q, k, v, scale).sum())(q)
    np.testing.assert_allclose(np.asarray(g_ours), np.asarray(g_ref), atol=2e-5)


def test_mha_matches_naive():
    b, s, h, dh = 2, 16, 4, 8
    d = h * dh
    q = jax.random.normal(jax.random.key(0), (b, s, d))
    k = jax.random.normal(jax.random.key(1), (b, s, d))
    v = jax.random.normal(jax.random.key(2), (b, s, d))
    out = mha(q, k, v, h)
    # naive per-head reference
    qh = q.reshape(b, s, h, dh).transpose(0, 2, 1, 3)
    kh = k.reshape(b, s, h, dh).transpose(0, 2, 1, 3)
    vh = v.reshape(b, s, h, dh).transpose(0, 2, 1, 3)
    ref = _xla_ref(qh, kh, vh, dh**-0.5).transpose(0, 2, 1, 3).reshape(b, s, d)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_attention_mask():
    q = jnp.ones((1, 1, 2, 4))
    k = jnp.ones((1, 1, 3, 4))
    v = jnp.arange(12, dtype=jnp.float32).reshape(1, 1, 3, 4)
    mask = jnp.array([[[[True, True, False], [True, True, False]]]])
    out = dot_product_attention(q, k, v, mask=mask)
    # masked third token excluded -> average of first two value rows
    expected = (v[0, 0, 0] + v[0, 0, 1]) / 2
    np.testing.assert_allclose(np.asarray(out[0, 0, 0]), np.asarray(expected),
                               atol=1e-5)


@pytest.mark.slow  # losing-experiment kernel (opt-in only; VERDICT r2 next #9)
def test_group_norm_silu_matches_flax(monkeypatch):
    """Pallas GN+SiLU (interpreter mode) vs flax GroupNorm + silu."""
    from flax import linen as nn

    from clap2diffusion_tpu.ops import groupnorm as gn

    import jax.experimental.pallas as pl

    orig = pl.pallas_call

    def interp(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(gn.pl, "pallas_call", interp)
    monkeypatch.setattr(gn, "_eligible", lambda x, groups: True)

    x = jax.random.normal(jax.random.key(0), (2, 8, 8, 128)) * 2 + 0.5
    scale = jax.random.normal(jax.random.key(1), (128,)) * 0.1 + 1.0
    bias = jax.random.normal(jax.random.key(2), (128,)) * 0.1

    ours = gn.group_norm_silu(x, scale, bias, groups=32)
    m = nn.GroupNorm(num_groups=32, epsilon=1e-5)
    ref = m.apply({"params": {"scale": scale, "bias": bias}}, x)
    ref = ref * jax.nn.sigmoid(ref)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-5)


@pytest.mark.slow  # losing-experiment kernel (opt-in only; VERDICT r2 next #9)
def test_winograd_conv3x3_matches_direct():
    """Winograd F(2x2,3x3) vs lax direct conv: f32 exact-ish, plus grads
    (autodiff through the transform graph) and the plain-GroupNorm module."""
    from clap2diffusion_tpu.ops.winograd import conv3x3_winograd, eligible

    rng = np.random.default_rng(0)
    for shape, co in [((2, 8, 8, 16), 24), ((1, 10, 6, 8), 8)]:
        x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(3, 3, shape[-1], co)).astype(np.float32))
        b = jnp.asarray(rng.normal(size=(co,)).astype(np.float32))
        ref = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        ) + b
        got = conv3x3_winograd(x, w, b)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)
    # gradients flow through the transform graph
    gw = jax.grad(lambda w: conv3x3_winograd(x, w, b).sum())(w)
    gr = jax.grad(lambda w: (jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + b).sum())(w)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gr), rtol=1e-3,
                               atol=1e-3)
    assert eligible((1, 64, 64, 320), (3, 3, 320, 320), (1, 1), "SAME")
    assert not eligible((1, 64, 64, 320), (3, 3, 320, 320), (2, 2), "SAME")
    assert not eligible((1, 63, 64, 320), (3, 3, 320, 320), (1, 1), "SAME")


@pytest.mark.slow  # losing-experiment kernel (opt-in only; VERDICT r2 next #9)
def test_winograd_pallas_matches_direct(monkeypatch):
    """VMEM-resident Winograd kernel (interpreter mode) vs direct conv."""
    import jax.experimental.pallas as pl

    import clap2diffusion_tpu.ops.winograd_pallas as wp

    orig = pl.pallas_call

    def interp(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(wp.pl, "pallas_call", interp)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 16)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 16, 24)).astype(np.float32) * 0.2)
    b = jnp.asarray(rng.normal(size=(24,)).astype(np.float32))
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + b
    got = wp.conv3x3_winograd_pallas(x, w, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4,
                               atol=2e-4)


def test_group_norm_module_matches_flax():
    from flax import linen as nn

    from clap2diffusion_tpu.ops.groupnorm import GroupNorm

    x = jax.random.normal(jax.random.key(0), (2, 8, 8, 64)) * 2 + 0.5
    scale = jax.random.normal(jax.random.key(1), (64,)) * 0.1 + 1.0
    bias = jax.random.normal(jax.random.key(2), (64,)) * 0.1
    ours = GroupNorm(num_groups=8, epsilon=1e-6).apply(
        {"params": {"scale": scale, "bias": bias}}, x)
    ref = nn.GroupNorm(num_groups=8, epsilon=1e-6).apply(
        {"params": {"scale": scale, "bias": bias}}, x)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-5)


@pytest.mark.slow  # losing-experiment kernel (opt-in only; VERDICT r2 next #9)
def test_group_norm_silu_grad_matches_xla(monkeypatch):
    from clap2diffusion_tpu.ops import groupnorm as gn

    x = jax.random.normal(jax.random.key(0), (1, 4, 4, 64))
    scale = jnp.ones((64,))
    bias = jnp.zeros((64,))
    g_fused = jax.grad(lambda x: gn.group_norm_silu(x, scale, bias, 8).sum())(x)
    g_ref = jax.grad(lambda x: gn._xla_group_norm_silu(x, scale, bias, 8, 1e-5).sum())(x)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref), atol=2e-5)


def test_flash_full_vjp_matches_xla_all_inputs(monkeypatch):
    """Pallas flash backward kernel (interpreter mode) vs XLA autodiff for
    dq, dk, dv, including non-128-aligned head dim and multiple q blocks."""
    import jax.experimental.pallas as pl

    orig = pl.pallas_call

    def interp(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(fa.pl, "pallas_call", interp)
    monkeypatch.setenv("C2D_FLASH_BLOCK_Q", "128")  # force 4 q-blocks

    q = jax.random.normal(jax.random.key(0), (1, 2, 512, 40))
    k = jax.random.normal(jax.random.key(1), (1, 2, 384, 40))
    v = jax.random.normal(jax.random.key(2), (1, 2, 384, 40))
    g = jax.random.normal(jax.random.key(3), (1, 2, 512, 40))
    scale = 40**-0.5

    def loss_flash(q, k, v):
        return (fa.flash_attention(q, k, v, scale) * g).sum()

    def loss_ref(q, k, v):
        return (fa._xla_attention(q, k, v, scale) * g).sum()

    gq, gk, gv = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    rq, rk, rv = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(np.asarray(gq), np.asarray(rq), atol=5e-5)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(rk), atol=5e-5)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(rv), atol=5e-5)
