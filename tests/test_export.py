"""Reference-format weight export: round-trip identity with the converters.

export.py is the inverse of convert.py — exporting a parameter tree to the
reference's torch state-dict names and converting it back must reproduce
the tree bit-exactly. This is the interop contract: weights trained here
load into the reference's own modules (reference
models/hierarchical_audio_v4.py, models/audio_adapter_v4.py,
models/audio_attention_processor.py) and vice versa.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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
from clap2diffusion_tpu.models.condition.export import (
    export_audio_adapter,
    export_hierarchical_encoder,
    export_injection_processors,
    export_legacy_v4,
)
from clap2diffusion_tpu.models.condition.inject import AudioInjection

CFG = ConditionConfig()


def assert_tree_equal(a, b):
    fa, ta = jax.tree_util.tree_flatten_with_path(a)
    fb, tb = jax.tree_util.tree_flatten_with_path(b)
    assert [jax.tree_util.keystr(p) for p, _ in fa] == [
        jax.tree_util.keystr(p) for p, _ in fb
    ]
    for (pa, xa), (_, xb) in zip(fa, fb):
        np.testing.assert_array_equal(
            np.asarray(xa, np.float32), np.asarray(xb, np.float32),
            err_msg=jax.tree_util.keystr(pa),
        )


def test_hierarchical_export_roundtrip():
    params = HierarchicalAudioEncoder(cfg=CFG).init(
        jax.random.key(0), jnp.ones((2, 512)), 2.0
    )["params"]
    sd = export_hierarchical_encoder(params)
    assert all(isinstance(v, np.ndarray) and v.dtype == np.float32
               for v in sd.values())
    # torch-convention shapes: Linear weight is [out, in]
    assert sd["decomposer.shared_mlp.0.weight"].shape[1] == 512
    assert_tree_equal(convert_hierarchical_encoder(sd), params)


def test_audio_adapter_export_roundtrip():
    params = AudioAdapter(cfg=CFG).init(
        jax.random.key(1), jnp.ones((1, 512))
    )["params"]
    sd = export_audio_adapter(params)
    # the 256 -> 2*768*16 KV head, reference audio_adapter_v4.py:37-42
    assert sd["token_generator.audio_to_kv.3.weight"].shape == (24_576, 256)
    assert_tree_equal(convert_audio_adapter(sd), params)


def test_legacy_v4_export_roundtrip():
    params = HierarchicalAudioV4(cfg=CFG).init(
        jax.random.key(2), jnp.ones((1, 512))
    )["params"]
    sd = export_legacy_v4(params)
    assert "decomposer.hierarchy_weights" in sd
    assert_tree_equal(convert_legacy_v4(sd), params)


def _injection_tree():
    out = {}
    for i, lvl in enumerate(("early", "mid", "late")):
        v = AudioInjection().init(
            jax.random.key(10 + i),
            jnp.ones((1, 77, 768)), jnp.ones((1, 10, 768)),
        )
        out[f"audio_inject_{lvl}"] = v["params"]
    return out


def test_injection_export_names_and_values():
    tree = _injection_tree()
    sd = export_injection_processors(tree)
    for lvl in ("early", "mid", "late"):
        # reference AudioAttnProcessor layout: Sequential(Linear, GELU,
        # Dropout, Linear) + alpha (audio_attention_processor.py:34-41)
        w0 = sd[f"{lvl}.audio_proj.0.weight"]
        assert w0.shape == (64, 768)
        np.testing.assert_array_equal(
            w0, np.asarray(tree[f"audio_inject_{lvl}"]["proj_fc1"]["kernel"]).T
        )
        assert sd[f"{lvl}.audio_proj.3.weight"].shape == (768, 64)
        assert sd[f"{lvl}.alpha"].shape == (1,)


@pytest.mark.slow
def test_export_cli_roundtrip(tmp_path):
    """CLI: orbax stage checkpoint -> .safetensors and .pth, both loadable
    and bit-identical through the converters."""
    from types import SimpleNamespace

    from clap2diffusion_tpu.apps.main import main
    from clap2diffusion_tpu.train.checkpoint import (
        load_torch_checkpoint,
        save_checkpoint,
    )
    from clap2diffusion_tpu.utils.safetensors_io import load_safetensors

    hp = HierarchicalAudioEncoder(cfg=CFG).init(
        jax.random.key(3), jnp.ones((1, 512)), 2.0
    )["params"]
    state = SimpleNamespace(
        params={"hierarchical": hp, "unet": _injection_tree()},
        opt_state={"count": np.zeros((), np.int32)},
        step=np.int32(7),
        ema_params=None,
    )
    save_checkpoint(str(tmp_path), state, name="stage2_final")
    ckpt = str(tmp_path / "stage2_final")

    out_st = str(tmp_path / "export.safetensors")
    assert main(["export", "--stage-checkpoint", ckpt, "--out", out_st]) == 0
    flat = load_safetensors(out_st)
    hier = {k[len("hierarchical."):]: v for k, v in flat.items()
            if k.startswith("hierarchical.")}
    assert_tree_equal(convert_hierarchical_encoder(hier), hp)
    assert "unet_adapter.early.alpha" in flat

    out_pth = str(tmp_path / "export.pth")
    assert main(["export", "--stage-checkpoint", ckpt, "--out", out_pth]) == 0
    obj = load_torch_checkpoint(out_pth)
    assert int(obj["step"]) == 7
    assert_tree_equal(
        convert_hierarchical_encoder(obj["hierarchical_state_dict"]), hp
    )
    assert "early.audio_proj.3.bias" in obj["unet_adapter_state_dict"]
