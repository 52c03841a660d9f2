"""Module-level numeric parity against the REFERENCE'S OWN torch code.

The reference's models/hierarchical_audio_v4.py and models/audio_adapter_v4.py
are importable here (torch + einops are installed; read-only import, nothing
is copied). We instantiate the reference modules with random weights, convert
their state dicts via models/condition/convert.py, and require our Flax
modules to reproduce tokens/assignments/routing/losses to fp32 tolerance —
the golden-tensor strategy SURVEY.md section 4 calls for, with the reference
itself generating the goldens. This also proves the reference's published
.pth checkpoints load correctly.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/reference")

import jax
import jax.numpy as jnp

from clap2diffusion_tpu.core.config import ConditionConfig
from clap2diffusion_tpu.models.condition import (
    AudioAdapter,
    HierarchicalAudioEncoder,
    HierarchicalAudioV4,
)
from clap2diffusion_tpu.models.condition.convert import (
    convert_audio_adapter,
    convert_hierarchical_encoder,
    convert_legacy_v4,
)

CFG = ConditionConfig()


@pytest.fixture(scope="module")
def ref_modules():
    from models import audio_adapter_v4, hierarchical_audio_v4

    return hierarchical_audio_v4, audio_adapter_v4


def test_hierarchical_encoder_full_parity(ref_modules):
    hier_mod, _ = ref_modules
    torch.manual_seed(0)
    ref = hier_mod.ImprovedHierarchicalAudioEncoder(
        use_adaptive_weights=True, use_soft_decomposition=True
    ).eval()
    ref.decomposer.set_temperature(1.3)

    x = torch.randn(4, 512)
    with torch.no_grad():
        tokens77_ref, info_ref = ref(x, return_all=True)

    params = convert_hierarchical_encoder(ref.state_dict())
    ours = HierarchicalAudioEncoder(cfg=CFG)
    tokens77, info = ours.apply(
        {"params": params}, jnp.asarray(x.numpy()), 1.3, return_all=True
    )

    np.testing.assert_allclose(
        np.asarray(info["tokens_10"]), info_ref["tokens_10"].numpy(), atol=3e-4
    )
    np.testing.assert_allclose(
        np.asarray(info["assignments"]), info_ref["assignments"].numpy(), atol=3e-4
    )
    np.testing.assert_allclose(
        np.asarray(info["hierarchy_weights"]),
        info_ref["hierarchy_weights"].numpy(), atol=3e-4,
    )
    for lvl in ("early", "mid", "late"):
        np.testing.assert_allclose(
            np.asarray(info["routed"][lvl]), info_ref["routed"][lvl].numpy(),
            atol=3e-4,
        )
    np.testing.assert_allclose(
        np.asarray(tokens77), tokens77_ref.numpy(), atol=3e-4
    )
    # regularizer losses match the reference's compute_losses
    for k in ("entropy", "orthogonality", "prior"):
        assert float(info["losses"][k]) == pytest.approx(
            float(info_ref["losses"][k]), abs=3e-4
        ), k


def test_temperature_sweep_matches_reference_scheduler(ref_modules):
    hier_mod, _ = ref_modules
    from clap2diffusion_tpu.models.condition import temperature_at_step

    ref_dec = hier_mod.SoftHierarchicalDecomposition()
    sched = hier_mod.TemperatureScheduler(
        ref_dec, T_max=2.0, T_min=0.5, total_steps=5000, warmup_steps=200,
        mode="cosine",
    )
    for step in (0, 100, 200, 1000, 2600, 4999, 5000, 7000):
        sched.step(step)
        ref_t = float(ref_dec.temperature)
        ours_t = float(temperature_at_step(step))
        assert ours_t == pytest.approx(ref_t, abs=1e-5), step


def test_audio_adapter_full_parity(ref_modules):
    _, adapter_mod = ref_modules
    torch.manual_seed(1)
    ref = adapter_mod.AudioAdapter().eval()
    x = torch.randn(3, 512)
    with torch.no_grad():
        tokens_ref = ref(x)

    params = convert_audio_adapter(ref.state_dict())
    ours = AudioAdapter(cfg=CFG)
    tokens = ours.apply({"params": params}, jnp.asarray(x.numpy()))
    assert tokens.shape == tuple(tokens_ref.shape) == (3, 16, 768)
    np.testing.assert_allclose(np.asarray(tokens), tokens_ref.numpy(), atol=3e-4)


def test_legacy_v4_full_parity(ref_modules):
    hier_mod, _ = ref_modules
    torch.manual_seed(2)
    ref = hier_mod.HierarchicalAudioV4().eval()
    x = torch.randn(2, 512)
    with torch.no_grad():
        t77_ref, inter_ref = ref(x, return_intermediate=True)

    params = convert_legacy_v4(ref.state_dict())
    ours = HierarchicalAudioV4(cfg=CFG)
    t77, inter = ours.apply(
        {"params": params}, jnp.asarray(x.numpy()), return_intermediate=True
    )
    np.testing.assert_allclose(
        np.asarray(inter["tokens10"]), inter_ref["tokens10"].numpy(), atol=3e-4
    )
    np.testing.assert_allclose(np.asarray(t77), t77_ref.numpy(), atol=3e-4)


def test_gated_cross_attention_parity(ref_modules):
    _, adapter_mod = ref_modules
    torch.manual_seed(3)
    ref = adapter_mod.AudioCrossAttention(query_dim=320).eval()
    x = torch.randn(2, 64, 320)
    ctx = torch.randn(2, 16, 768)
    with torch.no_grad():
        out_ref = ref(x, ctx)

    sd = ref.state_dict()
    from clap2diffusion_tpu.models.condition import GatedAudioCrossAttention

    def dense_nb(p):
        return {"kernel": np.asarray(sd[p + ".weight"].numpy()).T}

    params = {
        "norm": {"scale": np.asarray(sd["norm.weight"].numpy()),
                 "bias": np.asarray(sd["norm.bias"].numpy())},
        "to_q": dense_nb("to_q"),
        "to_k": dense_nb("to_k"),
        "to_v": dense_nb("to_v"),
        "to_out": {"kernel": np.asarray(sd["to_out.0.weight"].numpy()).T,
                   "bias": np.asarray(sd["to_out.0.bias"].numpy())},
        "gate": np.asarray(sd["gate"].numpy()).reshape(1),
    }
    ours = GatedAudioCrossAttention(query_dim=320)
    out = ours.apply(
        {"params": params}, jnp.asarray(x.numpy()), jnp.asarray(ctx.numpy())
    )
    np.testing.assert_allclose(np.asarray(out), out_ref.numpy(), atol=3e-4)
