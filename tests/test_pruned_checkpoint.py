"""Trainable-only stage checkpoints (frozen-UNet-body pruning).

Stage-2/3 train states carry the frozen ~3.4 GB fp32 SD UNet body because
the loss needs it, but the checkpoint does not: the body never changes and
the stage-chain merge re-reads it from the base tree. The full-budget
lifecycle measured each in-loop best-save at ~140-215 s — almost entirely
device->host transfer + serialization of those frozen leaves. These tests
pin the pruned save/restore/merge semantics (train/checkpoint.py):

- the saved tree keeps every trainable leaf plus the audio_inject
  processors (the reference's ``unet_adapter_state_dict`` export section,
  reference scripts/train_stage2.py:182-189) and drops the frozen body;
- restore overlays the saved leaves onto the caller's base values;
- merge_stage_params produces the SAME serving tree from a pruned payload
  (over a full base) as from a full payload, including the LoRA fold;
- legacy full checkpoints restore unchanged through the same entry point.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from clap2diffusion_tpu.train.checkpoint import (
    merge_stage_params,
    prune_frozen_unet,
    restore_checkpoint,
    restore_raw,
    save_checkpoint,
)
from clap2diffusion_tpu.train.stages import TrainState


def _trainable(path):
    joined = "/".join(path)
    return "projector" in joined or "audio_inject" in joined or (
        "lora" in joined and path[-1] in ("a", "b"))


def _stage2_like_params(rng=0):
    r = np.random.default_rng(rng)
    f = lambda *s: r.normal(size=s).astype(np.float32)  # noqa: E731
    return {
        "hierarchical": {
            "decomposer": {"mlp_fc1": {"kernel": f(4, 4)}},
            "projector": {"out_proj": {"kernel": f(4, 4), "bias": f(4)}},
        },
        "unet": {
            "down_0": {"attn2": {"to_q": {"kernel": f(4, 4)}}},
            "audio_inject_early": {"fc1": {"kernel": f(4, 2)}},
        },
        "lora": {
            "alpha": np.float32(16.0),
            "down_0/attn2/to_q/kernel": {"a": f(4, 2), "b": f(2, 4)},
        },
    }


def test_prune_keeps_trainable_and_inject_drops_body():
    params = _stage2_like_params()
    pruned = prune_frozen_unet(params, _trainable)
    # frozen UNet body gone, injection processors kept
    assert "down_0" not in pruned["unet"]
    assert "audio_inject_early" in pruned["unet"]
    # non-unet towers untouched (same structure, same objects)
    assert pruned["hierarchical"] is params["hierarchical"]
    assert pruned["lora"] is params["lora"]
    # no trainable -> no pruning; no unet -> no pruning
    assert prune_frozen_unet(params, None) is params
    adapter_only = {"token_generator": {"kernel": np.ones(3, np.float32)}}
    assert prune_frozen_unet(adapter_only, _trainable) is adapter_only


def test_prune_drops_unet_key_when_nothing_kept():
    params = {"unet": {"down_0": {"kernel": np.ones(2, np.float32)}}}
    pruned = prune_frozen_unet(params, lambda p: False)
    assert "unet" not in pruned


def test_pruned_save_restore_roundtrip(tmp_path):
    params = _stage2_like_params()
    tx = optax.sgd(0.1)
    state = TrainState.create(params, tx).replace(
        step=jnp.asarray(5, jnp.int32))
    save_checkpoint(str(tmp_path), state, name="stage2_final",
                    trainable=_trainable)

    # on disk: frozen body absent, trained towers present
    payload = restore_raw(str(tmp_path), "stage2_final")
    assert "down_0" not in payload["params"]["unet"]
    assert "audio_inject_early" in payload["params"]["unet"]
    assert "projector" in payload["params"]["hierarchical"]

    # restore: trainable leaves come from the checkpoint, frozen leaves
    # keep the abstract (base) values — the stage-chain contract
    zero = jax.tree.map(jnp.zeros_like, state)
    restored = restore_checkpoint(str(tmp_path), zero, name="stage2_final",
                                  trainable=_trainable)
    assert int(restored.step) == 5
    np.testing.assert_array_equal(
        np.asarray(restored.params["hierarchical"]["projector"]["out_proj"]["kernel"]),
        params["hierarchical"]["projector"]["out_proj"]["kernel"])
    np.testing.assert_array_equal(
        np.asarray(restored.params["unet"]["audio_inject_early"]["fc1"]["kernel"]),
        params["unet"]["audio_inject_early"]["fc1"]["kernel"])
    np.testing.assert_array_equal(
        np.asarray(restored.params["unet"]["down_0"]["attn2"]["to_q"]["kernel"]),
        np.zeros((4, 4), np.float32))
    # tree structure is the full stage structure (training can continue)
    assert (jax.tree_util.tree_structure(restored.params)
            == jax.tree_util.tree_structure(state.params))


def test_legacy_full_checkpoint_restores_through_pruned_entry(tmp_path):
    params = _stage2_like_params()
    state = TrainState.create(params, optax.sgd(0.1)).replace(
        step=jnp.asarray(3, jnp.int32))
    save_checkpoint(str(tmp_path), state, name="stage2_final")  # full, legacy
    zero = jax.tree.map(jnp.zeros_like, state)
    restored = restore_checkpoint(str(tmp_path), zero, name="stage2_final",
                                  trainable=_trainable)
    # every leaf (frozen body included) comes from the checkpoint
    np.testing.assert_array_equal(
        np.asarray(restored.params["unet"]["down_0"]["attn2"]["to_q"]["kernel"]),
        params["unet"]["down_0"]["attn2"]["to_q"]["kernel"])
    assert int(restored.step) == 3


def test_merge_pruned_equals_merge_full():
    params = _stage2_like_params(rng=1)
    base = _stage2_like_params(rng=1)  # the reproducible stage-chain base
    del base["lora"]
    full_payload = {"params": params, "step": np.int32(9)}
    pruned_payload = {"params": prune_frozen_unet(params, _trainable),
                      "step": np.int32(9)}
    m_full = merge_stage_params(base, full_payload, 2)
    m_pruned = merge_stage_params(base, pruned_payload, 2)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        m_full, m_pruned)
    # the LoRA fold actually happened (kernel differs from the base)
    assert np.abs(
        np.asarray(m_pruned["unet"]["down_0"]["attn2"]["to_q"]["kernel"])
        - base["unet"]["down_0"]["attn2"]["to_q"]["kernel"]).max() > 0
    assert "lora" not in m_pruned


def test_merge_pruned_bare_base_skips_lora_fold():
    """The export path merges over an EMPTY base: with a pruned payload
    there are no UNet kernels to fold LoRA into — the merge must not
    raise, and the injection processors must survive for the
    unet_adapter_state_dict export section."""
    params = _stage2_like_params()
    payload = {"params": prune_frozen_unet(params, _trainable),
               "step": np.int32(9)}
    merged = merge_stage_params({}, payload, 2)
    assert "audio_inject_early" in merged["unet"]
    assert "down_0" not in merged["unet"]
    assert "lora" not in merged


def test_merge_full_base_missing_tower_passthrough():
    """A payload tower absent from the base (export path's bare tree)
    passes through whole."""
    params = _stage2_like_params()
    del params["lora"]
    payload = {"params": params, "step": np.int32(1)}
    merged = merge_stage_params({}, payload, 2)
    assert merged["hierarchical"] is not None
    np.testing.assert_array_equal(
        np.asarray(merged["unet"]["down_0"]["attn2"]["to_q"]["kernel"]),
        params["unet"]["down_0"]["attn2"]["to_q"]["kernel"])


@pytest.mark.slow
def test_ema_merge_from_pruned_payload(tmp_path):
    """EMA leaves (trainables only) overlay correctly out of a pruned
    checkpoint."""
    params = _stage2_like_params()
    state = TrainState.create(params, optax.sgd(0.1), use_ema=True,
                              trainable=_trainable)
    # perturb one EMA leaf so use_ema=True is distinguishable
    key = "hierarchical.projector.out_proj.kernel"
    assert key in state.ema_params
    ema = dict(state.ema_params)
    ema[key] = ema[key] + 1.0
    state = state.replace(ema_params=ema)
    save_checkpoint(str(tmp_path), state, name="stage2_final",
                    trainable=_trainable)
    payload = restore_raw(str(tmp_path), "stage2_final")
    base = _stage2_like_params()
    del base["lora"]
    live = merge_stage_params(base, payload, 2, use_ema=False)
    shadow = merge_stage_params(base, payload, 2, use_ema=True)
    d = np.abs(
        np.asarray(shadow["hierarchical"]["projector"]["out_proj"]["kernel"])
        - np.asarray(live["hierarchical"]["projector"]["out_proj"]["kernel"]))
    np.testing.assert_allclose(d, 1.0, rtol=1e-6)
