"""InceptionV3 pool3 tower: structure, converter strictness, FID wiring.

The geometry spec below is written out independently (torch-format
(out,in,kh,kw) shapes following torchvision's inception_v3 module
definitions) so the converter/model pair is checked against a second,
hand-derived source of truth — the same pattern the CLIP towers use.
Reference contract: scripts/evaluate.py:24-30 declares fid_score.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clap2diffusion_tpu.models.inception_v3 import (
    InceptionV3,
    convert_inception_v3,
    preprocess_images_inception,
)


def _a(block, cin, pool):
    return {
        f"{block}.branch1x1": (64, cin, 1, 1),
        f"{block}.branch5x5_1": (48, cin, 1, 1),
        f"{block}.branch5x5_2": (64, 48, 5, 5),
        f"{block}.branch3x3dbl_1": (64, cin, 1, 1),
        f"{block}.branch3x3dbl_2": (96, 64, 3, 3),
        f"{block}.branch3x3dbl_3": (96, 96, 3, 3),
        f"{block}.branch_pool": (pool, cin, 1, 1),
    }


def _b(block, cin):
    return {
        f"{block}.branch3x3": (384, cin, 3, 3),
        f"{block}.branch3x3dbl_1": (64, cin, 1, 1),
        f"{block}.branch3x3dbl_2": (96, 64, 3, 3),
        f"{block}.branch3x3dbl_3": (96, 96, 3, 3),
    }


def _c(block, cin, c7):
    return {
        f"{block}.branch1x1": (192, cin, 1, 1),
        f"{block}.branch7x7_1": (c7, cin, 1, 1),
        f"{block}.branch7x7_2": (c7, c7, 1, 7),
        f"{block}.branch7x7_3": (192, c7, 7, 1),
        f"{block}.branch7x7dbl_1": (c7, cin, 1, 1),
        f"{block}.branch7x7dbl_2": (c7, c7, 7, 1),
        f"{block}.branch7x7dbl_3": (c7, c7, 1, 7),
        f"{block}.branch7x7dbl_4": (c7, c7, 7, 1),
        f"{block}.branch7x7dbl_5": (192, c7, 1, 7),
        f"{block}.branch_pool": (192, cin, 1, 1),
    }


def _d(block, cin):
    return {
        f"{block}.branch3x3_1": (192, cin, 1, 1),
        f"{block}.branch3x3_2": (320, 192, 3, 3),
        f"{block}.branch7x7x3_1": (192, cin, 1, 1),
        f"{block}.branch7x7x3_2": (192, 192, 1, 7),
        f"{block}.branch7x7x3_3": (192, 192, 7, 1),
        f"{block}.branch7x7x3_4": (192, 192, 3, 3),
    }


def _e(block, cin):
    return {
        f"{block}.branch1x1": (320, cin, 1, 1),
        f"{block}.branch3x3_1": (384, cin, 1, 1),
        f"{block}.branch3x3_2a": (384, 384, 1, 3),
        f"{block}.branch3x3_2b": (384, 384, 3, 1),
        f"{block}.branch3x3dbl_1": (448, cin, 1, 1),
        f"{block}.branch3x3dbl_2": (384, 448, 3, 3),
        f"{block}.branch3x3dbl_3a": (384, 384, 1, 3),
        f"{block}.branch3x3dbl_3b": (384, 384, 3, 1),
        f"{block}.branch_pool": (192, cin, 1, 1),
    }


def torchvision_convbn_spec():
    """{torch module path: conv weight shape} for every BasicConv2d."""
    spec = {
        "Conv2d_1a_3x3": (32, 3, 3, 3),
        "Conv2d_2a_3x3": (32, 32, 3, 3),
        "Conv2d_2b_3x3": (64, 32, 3, 3),
        "Conv2d_3b_1x1": (80, 64, 1, 1),
        "Conv2d_4a_3x3": (192, 80, 3, 3),
    }
    spec.update(_a("Mixed_5b", 192, 32))   # -> 256
    spec.update(_a("Mixed_5c", 256, 64))   # -> 288
    spec.update(_a("Mixed_5d", 288, 64))   # -> 288
    spec.update(_b("Mixed_6a", 288))       # -> 768
    spec.update(_c("Mixed_6b", 768, 128))
    spec.update(_c("Mixed_6c", 768, 160))
    spec.update(_c("Mixed_6d", 768, 160))
    spec.update(_c("Mixed_6e", 768, 192))
    spec.update(_d("Mixed_7a", 768))       # -> 1280
    spec.update(_e("Mixed_7b", 1280))      # -> 2048
    spec.update(_e("Mixed_7c", 2048))      # -> 2048
    return spec


def synthetic_torch_state_dict(seed=0):
    rng = np.random.default_rng(seed)
    sd = {}
    for path, (co, ci, kh, kw) in torchvision_convbn_spec().items():
        sd[f"{path}.conv.weight"] = rng.normal(0, 0.05, (co, ci, kh, kw)).astype(np.float32)
        sd[f"{path}.bn.weight"] = rng.uniform(0.5, 1.5, co).astype(np.float32)
        sd[f"{path}.bn.bias"] = rng.normal(0, 0.1, co).astype(np.float32)
        sd[f"{path}.bn.running_mean"] = rng.normal(0, 0.1, co).astype(np.float32)
        sd[f"{path}.bn.running_var"] = rng.uniform(0.5, 2.0, co).astype(np.float32)
        sd[f"{path}.bn.num_batches_tracked"] = np.asarray(100)
    sd["fc.weight"] = rng.normal(0, 0.01, (1000, 2048)).astype(np.float32)
    sd["fc.bias"] = np.zeros(1000, np.float32)
    # aux head must be skipped, not rejected
    sd["AuxLogits.conv0.conv.weight"] = np.zeros((128, 768, 1, 1), np.float32)
    return sd


def test_converted_tree_matches_flax_init_exactly():
    """Bidirectional structural parity: converter(synthetic torchvision sd)
    and Flax init produce identical param trees (names + shapes)."""
    model = InceptionV3()
    init = jax.eval_shape(
        lambda: model.init(jax.random.key(0), jnp.zeros((1, 75, 75, 3)))
    )["params"]
    conv = convert_inception_v3(synthetic_torch_state_dict())
    init_shapes = jax.tree.map(lambda x: tuple(x.shape), init)
    conv_shapes = jax.tree.map(lambda x: tuple(x.shape), conv)
    assert init_shapes == conv_shapes


def test_converter_rejects_unknown_keys():
    sd = synthetic_torch_state_dict()
    sd["Mixed_9z.branch1x1.conv.weight"] = np.zeros((8, 8, 1, 1), np.float32)
    sd["Mixed_9z.branch1x1.bn.weight"] = np.zeros(8, np.float32)
    sd["Mixed_9z.branch1x1.bn.bias"] = np.zeros(8, np.float32)
    sd["Mixed_9z.branch1x1.bn.running_mean"] = np.zeros(8, np.float32)
    sd["Mixed_9z.branch1x1.bn.running_var"] = np.ones(8, np.float32)
    # the bogus block converts cleanly but leaves an unknown leftover
    sd["totally.unknown.weight"] = np.zeros(3, np.float32)
    with pytest.raises(ValueError, match="unconsumed"):
        convert_inception_v3(sd)


def test_forward_pool3_and_logits_tiny_input():
    """75x75 is the minimum valid input; pool3 is 2048-d regardless of H,W."""
    model = InceptionV3()
    params = convert_inception_v3(synthetic_torch_state_dict())
    out = jax.jit(lambda p, x: model.apply({"params": p}, x))(
        params, jnp.asarray(np.random.default_rng(1).uniform(-1, 1, (2, 75, 75, 3)), jnp.float32)
    )
    assert out["pool3"].shape == (2, 2048)
    assert out["logits"].shape == (2, 1000)
    assert np.isfinite(np.asarray(out["pool3"])).all()
    # two distinct inputs -> distinct features
    assert np.abs(np.asarray(out["pool3"][0] - out["pool3"][1])).max() > 0


def test_avg_pool_variant_semantics():
    """The exact op-level contract of the two variants: on an all-ones map,
    count_include_pad=True (torchvision) averages zeros into the border
    (corner = 4/9), count_include_pad=False (pytorch_fid) renormalizes by
    the true window size (exactly 1 everywhere)."""
    from clap2diffusion_tpu.models.inception_v3 import _avg_pool3

    x = jnp.ones((1, 5, 5, 1), jnp.float32)
    tv = np.asarray(_avg_pool3(x, "torchvision"))[0, :, :, 0]
    pf = np.asarray(_avg_pool3(x, "pytorch_fid"))[0, :, :, 0]
    assert tv[0, 0] == pytest.approx(4 / 9)
    assert tv[0, 2] == pytest.approx(6 / 9)
    assert tv[2, 2] == pytest.approx(1.0)
    np.testing.assert_allclose(pf, 1.0)


def test_variant_matrix_same_weights_different_pooling():
    """Both variants run the SAME converted weights; the pytorch_fid
    pooling patches (count_include_pad=False in A/C/E pool branches, max
    pool in Mixed_7c) must change the features — and the variant must be
    stamped at the module level, with unknown names rejected loudly."""
    params = convert_inception_v3(synthetic_torch_state_dict())
    x = jnp.asarray(
        np.random.default_rng(5).uniform(-1, 1, (1, 75, 75, 3)), jnp.float32
    )
    out_tv = jax.jit(
        lambda p, x: InceptionV3(variant="torchvision").apply({"params": p}, x)
    )(params, x)
    out_pf = jax.jit(
        lambda p, x: InceptionV3(variant="pytorch_fid").apply({"params": p}, x)
    )(params, x)
    assert out_tv["pool3"].shape == out_pf["pool3"].shape == (1, 2048)
    assert np.isfinite(np.asarray(out_pf["pool3"])).all()
    assert np.abs(np.asarray(out_tv["pool3"] - out_pf["pool3"])).max() > 1e-4
    with pytest.raises(ValueError, match="unknown InceptionV3 variant"):
        InceptionV3(variant="tf2").apply({"params": params}, x)


def test_convbn_matches_manual_batchnorm_math():
    """y = relu((conv(x) - mean) / sqrt(var + 1e-3) * scale + bias)."""
    from clap2diffusion_tpu.models.inception_v3 import ConvBN

    rng = np.random.default_rng(3)
    x = rng.normal(size=(1, 5, 5, 2)).astype(np.float32)
    m = ConvBN(3, (1, 1))
    p = m.init(jax.random.key(0), jnp.asarray(x))["params"]
    p = jax.tree.map(lambda a: jnp.asarray(rng.normal(0, 1, a.shape), jnp.float32), p)
    p["bn_var"] = jnp.abs(p["bn_var"]) + 0.5
    y = np.asarray(m.apply({"params": p}, jnp.asarray(x)))
    k = np.asarray(p["conv"]["kernel"])[0, 0]  # [cin, cout] for 1x1
    conv = x @ k
    ref = (conv - np.asarray(p["bn_mean"])) / np.sqrt(np.asarray(p["bn_var"]) + 1e-3)
    ref = np.maximum(ref * np.asarray(p["bn_scale"]) + np.asarray(p["bn_bias"]), 0)
    np.testing.assert_allclose(y, ref, rtol=2e-5, atol=2e-5)


def test_preprocess_range_and_shape():
    imgs = np.random.default_rng(0).integers(0, 255, (3, 64, 48, 3), dtype=np.uint8)
    out = preprocess_images_inception(imgs, image_size=75)
    assert out.shape == (3, 75, 75, 3)
    assert out.min() >= -1.0 - 1e-6 and out.max() <= 1.0 + 1e-6
    # already-sized input skips the resize
    imgs2 = np.random.default_rng(0).integers(0, 255, (2, 75, 75, 3), dtype=np.uint8)
    out2 = preprocess_images_inception(imgs2, image_size=75)
    np.testing.assert_allclose(out2, imgs2.astype(np.float32) / 255.0 * 2 - 1)


def test_transform_input_channel_rescale():
    model_t = InceptionV3(transform_input=True)
    model_f = InceptionV3(transform_input=False)
    params = convert_inception_v3(synthetic_torch_state_dict())
    x = jnp.asarray(np.random.default_rng(2).uniform(-1, 1, (1, 75, 75, 3)), jnp.float32)
    a = np.asarray(model_t.apply({"params": params}, x)["pool3"])
    b = np.asarray(model_f.apply({"params": params}, x)["pool3"])
    assert np.abs(a - b).max() > 0  # the rescale must actually apply


@pytest.mark.slow
@pytest.mark.parametrize("fid_variant", ["torchvision", "pytorch_fid"])
def test_run_evaluation_emits_standard_fid(tmp_path, monkeypatch, fid_variant):
    """Evaluator reports ``fid`` + real ``inception_score`` when
    InceptionV3 weights are present (VERDICT round-2 next #1), stamps
    tokenizer_fallback provenance (weak #4), and stamps which pooling
    variant produced fid/kid (r3 next #3)."""
    from PIL import Image

    from clap2diffusion_tpu.data.fixtures import make_fixture_dataset
    from clap2diffusion_tpu.diffusion.pipeline import init_params
    from clap2diffusion_tpu.eval.evaluate import run_evaluation
    import clap2diffusion_tpu.models.inception_v3 as IV3
    from tests.test_pipeline import tiny_config

    # keep the CPU cost tiny: run the real tower at its 75px minimum
    monkeypatch.setattr(
        IV3, "preprocess_images_inception",
        lambda imgs, image_size=75: preprocess_images_inception(imgs, 75),
    )

    cfg = tiny_config()
    root = str(tmp_path / "ds")
    meta = make_fixture_dataset(root, n_train=1, n_val=1, n_test=3,
                                duration_s=0.5, latent_hw=8)
    frames = tmp_path / "ds" / "frames"
    frames.mkdir(exist_ok=True)
    rng = np.random.default_rng(7)
    for s in meta["samples"]:
        Image.fromarray(
            rng.integers(0, 255, size=(64, 64, 3), dtype=np.uint8)
        ).save(frames / f"{s['id']}.png")

    params = dict(init_params(cfg, seed=0))
    params["inception_v3"] = convert_inception_v3(synthetic_torch_state_dict())

    res = run_evaluation(cfg, data_root=root, max_samples=3, num_steps=2,
                         seed=42, params=params, fid_variant=fid_variant)
    assert "fid" in res["summary"] and np.isfinite(res["summary"]["fid"])
    assert res["summary"]["fid"] > 0
    assert res["summary"]["fid_variant"] == fid_variant
    # KID rides the same pool3 features (unbiased small-N companion to FID);
    # random generated vs random reference frames -> clearly positive
    assert "kid" in res["summary"]
    assert np.isfinite(res["summary"]["kid"]["mean"])
    assert "inception_score" in res["summary"]
    assert res["summary"]["inception_score"]["mean"] >= 1.0
    # no CLIP vision weights -> no clip-vision metrics, and honest naming
    assert "frechet_clip_vision" not in res["summary"]
    assert res["tokenizer_fallback"] is True
