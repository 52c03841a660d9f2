"""Real LoRA adapters (train/lora.py) — the reference's stage-2 "LoRA" is
name-only (reference train_stage2.py:67-91); here rank>0 adds actual
low-rank deltas on the UNet cross-attention kernels, folded at trace time.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clap2diffusion_tpu.train.lora import (
    init_lora,
    lora_trainable,
    merge_lora,
    target_paths,
)
from tests.test_pipeline import tiny_config


@pytest.fixture(scope="module")
def tiny():
    from clap2diffusion_tpu.diffusion.pipeline import init_params

    cfg = tiny_config()
    return cfg, init_params(cfg, seed=0)


def test_targets_are_cross_attention_kernels(tiny):
    _, params = tiny
    paths = target_paths(params["unet"])
    assert paths, "no targets found"
    assert all("attn2" in p and p[-1] == "kernel" for p in paths)
    # q, k, v, out per cross-attention block
    names = {p[-2] for p in paths}
    assert names == {"to_q", "to_k", "to_v", "to_out"}


def test_zero_init_merge_is_identity(tiny):
    _, params = tiny
    lora = init_lora(params["unet"], rank=4, rng=jax.random.key(0))
    merged = merge_lora(params["unet"], lora)
    for a, b in zip(jax.tree.leaves(params["unet"]), jax.tree.leaves(merged)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_merge_applies_scaled_delta(tiny):
    _, params = tiny
    lora = init_lora(params["unet"], rank=4, rng=jax.random.key(1), alpha=8.0)
    key = next(k for k in lora if k != "alpha")
    lora[key] = dict(lora[key], b=jnp.ones_like(lora[key]["b"]))
    merged = merge_lora(params["unet"], lora)
    node_orig, node_new = params["unet"], merged
    for p in key.split("/"):
        node_orig, node_new = node_orig[p], node_new[p]
    want = np.asarray(node_orig) + (8.0 / 4.0) * np.asarray(
        lora[key]["a"] @ lora[key]["b"]
    )
    np.testing.assert_allclose(np.asarray(node_new), want, atol=1e-5)


def test_trainable_predicate():
    assert lora_trainable(("lora", "x/attn2/to_q/kernel", "a"))
    assert lora_trainable(("lora", "x/attn2/to_q/kernel", "b"))
    assert not lora_trainable(("lora", "alpha"))
    assert not lora_trainable(("unet", "x/attn2/to_q/kernel"))


@pytest.mark.slow
def test_stage2_lora_trains_only_adapters_and_serves(tmp_path, tiny):
    """End-to-end: rank>0 stage-2 run moves LoRA a/b (and the usual
    trainables) while the UNet attn2 kernels stay frozen; the saved
    checkpoint folds into serving params via merge_stage_params."""
    from clap2diffusion_tpu.core.config import apply_overrides
    from clap2diffusion_tpu.data.fixtures import make_fixture_dataset
    from clap2diffusion_tpu.train.checkpoint import merge_stage_params, restore_raw
    from clap2diffusion_tpu.train.trainer import run_stage

    cfg, params = tiny
    cfg = apply_overrides(cfg, [
        "train.stage2.grad_accum=1", "train.stage2.batch_size=2",
        "train.stage2.log_every=1", "train.stage2.lora_rank=4",
        "train.stage2.lr=1e-2", "train.stage2.warmup_steps=0",
        "data.duration_s=0.5",
    ])
    root = str(tmp_path / "ds")
    make_fixture_dataset(root, n_train=4, n_val=1, n_test=1, duration_s=0.5,
                         latent_hw=cfg.diffusion.image_size // 8)
    state = run_stage(cfg, 2, params, data_root=root, max_steps=2,
                      checkpoint_dir=str(tmp_path / "ckpt"),
                      log_dir=str(tmp_path / "logs"))
    assert int(state.step) == 2
    assert "lora" in state.params

    # at least one adapter b moved off zero (gradients reached the deltas)
    bs = [np.asarray(v["b"]) for k, v in state.params["lora"].items()
          if k != "alpha"]
    assert any(np.abs(b).max() > 0 for b in bs)

    # UNet attn2 kernels stayed frozen
    for path in target_paths(params["unet"]):
        before, after = params["unet"], state.params["unet"]
        for p in path:
            before, after = before[p], after[p]
        np.testing.assert_array_equal(np.asarray(before), np.asarray(after))

    # serving: checkpoint folds via merge_stage_params, pipeline runs
    payload = restore_raw(str(tmp_path / "ckpt"), "stage2_final")
    # the on-disk artifact is trainable-only: the frozen UNet body is
    # pruned at save (train/checkpoint.py::prune_frozen_unet), leaving
    # only the injection processors under 'unet'
    assert all(k.startswith("audio_inject") for k in payload["params"]["unet"])
    assert "lora" in payload["params"]
    serving = merge_stage_params(params, payload, stage=2)
    assert "lora" not in serving
    from clap2diffusion_tpu.diffusion.pipeline import AudioToImagePipeline

    pipe = AudioToImagePipeline(cfg, params=serving)
    img = pipe.generate(
        waveform=np.random.default_rng(0).normal(size=24_000).astype(np.float32),
        num_steps=2, seed=1,
    )
    assert img.shape == (1, 64, 64, 3)


def test_merge_stage_params_folds_lora_from_ema(tiny):
    """Serving the EMA shadow of a LoRA run: the dotted-key overlay must
    reach the slash-keyed adapter leaves, and the fold must consume the
    overlaid values (not the live ones)."""
    from clap2diffusion_tpu.train.checkpoint import merge_stage_params

    cfg, params = tiny
    lora = init_lora(params["unet"], rank=2, rng=jax.random.key(3), alpha=2.0)
    key = next(k for k in lora if k != "alpha")
    stage_src = {"hierarchical": params["hierarchical"],
                 "unet": params["unet"], "lora": lora}
    # EMA shadow sets one adapter's b to ones; live b stays zero
    shadow_b = np.ones_like(np.asarray(lora[key]["b"]))
    payload = {"params": stage_src,
               "ema_params": {f"lora.{key}.b": shadow_b}}
    serving = merge_stage_params(params, payload, stage=2, use_ema=True)
    assert "lora" not in serving
    node_new, node_old = serving["unet"], params["unet"]
    for p in key.split("/"):
        node_new, node_old = node_new[p], node_old[p]
    want = np.asarray(node_old) + (2.0 / 2.0) * np.asarray(
        lora[key]["a"] @ jnp.asarray(shadow_b)
    )
    np.testing.assert_allclose(np.asarray(node_new), want, atol=1e-5)
    # the LIVE payload's adapter must be untouched (no aliasing)
    assert float(np.abs(np.asarray(lora[key]["b"])).max()) == 0.0
