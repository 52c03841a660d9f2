"""EMA shadow weights are consumable (VERDICT round-1 missing #5).

Round 1 maintained ``TrainState.ema_params`` but nothing ever read them.
These tests cover the full consumer path: train with use_ema -> checkpoint
carries the shadow -> ``restore_raw``/``merge_stage_params`` fold either the
live or the EMA weights into a pipeline tree -> the CLI serves them
(``infer --stage-checkpoint ... --ema``). Mirrors the reference's EMA
apply/restore semantics (reference utils/training_utils.py:22-41).
"""

import json

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from clap2diffusion_tpu.core.config import apply_overrides
from clap2diffusion_tpu.data.fixtures import make_fixture_dataset
from clap2diffusion_tpu.diffusion.pipeline import init_params
from clap2diffusion_tpu.train.checkpoint import (
    merge_stage_params,
    restore_raw,
    stage_from_name,
)
from clap2diffusion_tpu.train.trainer import run_stage

from tests.test_pipeline import tiny_config


@pytest.fixture(scope="module")
def ema_checkpoint(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("ema")
    cfg = tiny_config()
    cfg = apply_overrides(cfg, [
        "train.stage1.grad_accum=1", "train.stage1.batch_size=2",
        "train.stage1.use_ema=true", "train.stage1.ema_decay=0.5",
        "train.stage1.lr=1e-3", "train.stage1.warmup_steps=0",
        "train.stage1.lr_schedule=constant", "data.duration_s=0.5",
    ])
    params = init_params(cfg, seed=0)
    root = str(tmp / "ds")
    make_fixture_dataset(root, n_train=4, n_val=1, n_test=1, duration_s=0.5,
                         latent_hw=cfg.diffusion.image_size // 8)
    ckpt = str(tmp / "ckpt")
    state = run_stage(cfg, 1, params, data_root=root, max_steps=4,
                      checkpoint_dir=ckpt, log_dir=str(tmp / "logs"))
    return cfg, params, ckpt, state


def _flat(tree):
    """{dotted-path: np.array} view of a nested params tree — the same key
    convention TrainState's EMA dict uses (stages.py::ema_path_key)."""
    import jax

    from clap2diffusion_tpu.train.stages import ema_path_key

    return {
        ema_path_key(p): np.asarray(x)
        for p, x in jax.tree_util.tree_flatten_with_path(tree)[0]
    }


def _maxdiff(a, b):
    fa, fb = _flat(a), _flat(b)
    assert set(fa) == set(fb)
    return max(float(np.abs(fa[k] - fb[k]).max()) for k in fa)


def test_checkpoint_carries_distinct_ema(ema_checkpoint):
    cfg, params, ckpt, state = ema_checkpoint
    payload = restore_raw(ckpt, "stage1_final")
    assert payload["ema_params"] is not None
    assert int(payload["step"]) == 4
    # training stayed finite and the live weights moved; the shadow lags
    assert all(
        np.isfinite(np.asarray(x)).all() for x in __import__("jax").tree.leaves(payload["params"])
    )
    # stage 1 trains every adapter leaf, so the shadow covers the full tree
    live, ema = _flat(payload["params"]), dict(payload["ema_params"])
    assert set(ema) == set(live)
    assert max(float(np.abs(np.asarray(ema[k]) - live[k]).max()) for k in ema) > 1e-6
    # shadow in the checkpoint matches the in-memory TrainState shadow
    assert _maxdiff(payload["ema_params"], state.ema_params) < 1e-7


def test_merge_stage_params_selects_tree(ema_checkpoint):
    cfg, params, ckpt, _ = ema_checkpoint
    payload = restore_raw(ckpt, "stage1_final")
    live = merge_stage_params(params, payload, 1, use_ema=False)
    ema = merge_stage_params(params, payload, 1, use_ema=True)
    assert _maxdiff(live["adapter"], payload["params"]) < 1e-7
    assert _maxdiff(_flat(ema["adapter"]), payload["ema_params"]) < 1e-7
    assert _maxdiff(live["adapter"], ema["adapter"]) > 1e-6
    # untouched towers pass through
    assert live["unet"] is params["unet"] and ema["vae"] is params["vae"]


def test_partial_ema_overlays_trainable_leaves_only(ema_checkpoint):
    """Stage-2/3 shadows cover only trainable leaves; merge must take
    frozen leaves from the live params (the memory-safe EMA design)."""
    cfg, params, ckpt, _ = ema_checkpoint
    payload = dict(restore_raw(ckpt, "stage1_final"))
    full = dict(payload["ema_params"])
    # simulate a selective stage: keep only half the shadow entries
    keep = sorted(full)[: len(full) // 2]
    payload["ema_params"] = {k: full[k] for k in keep}
    merged = merge_stage_params(params, payload, 1, use_ema=True)
    flat_merged = _flat(merged["adapter"])
    flat_live = _flat(payload["params"])
    for k in flat_merged:
        src = np.asarray(full[k]) if k in keep else flat_live[k]
        np.testing.assert_array_equal(flat_merged[k], src)


def test_merge_requires_ema_when_absent(ema_checkpoint):
    cfg, params, ckpt, _ = ema_checkpoint
    payload = dict(restore_raw(ckpt, "stage1_final"))
    payload.pop("ema_params")
    with pytest.raises(ValueError, match="no ema_params"):
        merge_stage_params(params, payload, 1, use_ema=True)


def test_stage_from_name():
    assert stage_from_name("stage1_final") == 1
    assert stage_from_name("stage3_step500") == 3
    with pytest.raises(ValueError):
        stage_from_name("final")


def test_cli_infer_with_ema(ema_checkpoint, tmp_path):
    """infer --stage-checkpoint --ema serves the shadow weights end-to-end."""
    import yaml

    from clap2diffusion_tpu.apps.main import main
    from clap2diffusion_tpu.core.config import to_dict
    from clap2diffusion_tpu.utils.audio_io import write_wav

    cfg, params, ckpt, _ = ema_checkpoint
    cfg_path = tmp_path / "tiny.yaml"
    cfg_path.write_text(yaml.safe_dump(json.loads(json.dumps(to_dict(cfg)))))
    wav_path = tmp_path / "in.wav"
    write_wav(str(wav_path),
              np.sin(np.linspace(0, 440 * np.pi, 24_000)).astype(np.float32) * 0.5,
              48_000)
    out = tmp_path / "img.png"
    rc = main([
        "infer", "--audio", str(wav_path), "--text", "rain",
        "--output", str(out), "--steps", "2", "--config", str(cfg_path),
        "--stage-checkpoint", f"{ckpt}/stage1_final", "--ema",
        "--model-type", "audio_tokens",
    ])
    assert rc == 0 and out.exists()
