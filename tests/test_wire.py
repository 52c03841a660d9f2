"""int8 wire format for the parameter upload (utils/wire.py).

Pins: (a) the per-channel round-trip error bound, (b) small/1-D/integer
leaves ride the wire bit-exact, (c) dtypes and shapes survive the round
trip, (d) the byte accounting halves the wire for an all-big-weights tree,
(e) at tiny pipeline geometry the end-to-end image drift from wire
quantization is bounded (slow tier).

No reference counterpart (the reference loads local torch weights,
reference scripts/inference.py:21-60); this is the TPU-serving cold-start
path of BENCH_NOTES.md "Session cold start".
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clap2diffusion_tpu.utils.wire import (
    dequant_program,
    dequantize_wire,
    load_wire_cache,
    quantize_wire,
    save_wire_cache,
    upload_params,
    wire_avals,
    wire_sds,
)


def _tree(seed: int = 0):
    rng = np.random.default_rng(seed)
    return {
        "dense": {"kernel": rng.normal(size=(256, 512)).astype(np.float32) * 0.2,
                  "bias": rng.normal(size=(512,)).astype(np.float32)},
        "conv": {"kernel": rng.normal(size=(3, 3, 96, 128)).astype(
            jnp.bfloat16)},
        "small": rng.normal(size=(8, 8)).astype(np.float32),
        "ids": np.arange(70_000, dtype=np.int32).reshape(700, 100),
    }


def test_roundtrip_error_bound_and_raw_passthrough():
    params = _tree()
    wire, dtypes, stats = quantize_wire(params, min_size=1 << 16)
    out = jax.tree.map(np.asarray, dequantize_wire(wire, dtypes))

    # eligible: dense/kernel (131k f32) and conv/kernel (110k bf16)
    assert stats["quantized_leaves"] == 2
    assert stats["raw_leaves"] == 3

    x = params["dense"]["kernel"]
    s = np.max(np.abs(x), axis=0) / 127.0
    err = np.abs(out["dense"]["kernel"] - x)
    assert np.all(err <= s[None, :] / 2 + 1e-7), "per-channel bound violated"

    # bf16 leaf: quantize bound s/2 plus the bf16 cast's half-ulp, which at
    # the channel max (|q*s| <= 127s) is <= 127s * 2^-8 ~= s/2 -> total <= s
    xc = np.asarray(params["conv"]["kernel"], np.float32)
    sc = np.max(np.abs(xc), axis=(0, 1, 2)) / 127.0
    errc = np.abs(np.asarray(out["conv"]["kernel"], np.float32) - xc)
    assert np.all(errc <= sc + 1e-6)

    # ineligible leaves: bit-exact, never quantized
    np.testing.assert_array_equal(out["dense"]["bias"], params["dense"]["bias"])
    np.testing.assert_array_equal(out["small"], params["small"])
    np.testing.assert_array_equal(out["ids"], params["ids"])

    # dtype/shape preservation
    same = jax.tree.map(
        lambda a, b: (np.asarray(a).dtype, np.asarray(a).shape)
        == (np.asarray(b).dtype, np.asarray(b).shape),
        params, out,
    )
    assert all(jax.tree.leaves(same))


def test_wire_bytes_shrink():
    params = _tree()
    _, _, stats = quantize_wire(params, min_size=1 << 16)
    big = (256 * 512) * 4 + (3 * 3 * 96 * 128) * 2
    saved = stats["raw_bytes"] - stats["wire_bytes"]
    # f32 leaf shrinks 4x, bf16 leaf 2x (minus the float32 scales)
    expect = (256 * 512) * 3 + (3 * 3 * 96 * 128) * 1 - (512 + 128) * 4
    assert saved == expect, (stats, big)


def test_upload_params_matches_dequant_and_default_is_exact():
    params = _tree(1)
    exact = upload_params(params, int8_wire=False)
    same = jax.tree.map(
        lambda a, b: np.array_equal(np.asarray(a), np.asarray(b)), exact, params
    )
    assert all(jax.tree.leaves(same))

    via_upload = upload_params(params, int8_wire=True)
    wire, dtypes, _ = quantize_wire(params)
    direct = dequantize_wire(jax.device_put(wire), dtypes)
    same = jax.tree.map(
        lambda a, b: np.array_equal(np.asarray(a), np.asarray(b)),
        via_upload, direct,
    )
    assert all(jax.tree.leaves(same))


def test_wire_cache_roundtrip(tmp_path):
    """Single-artifact persistence: save -> load -> dequantize equals the
    in-memory wire path bit-exactly, including a bf16 leaf (npz stores bf16
    as raw V2 — the embedded metadata must view-cast it back)."""
    params = _tree(2)
    wire, dtypes, _ = quantize_wire(params, min_size=1 << 16)
    path = str(tmp_path / "params.wire.npz")
    save_wire_cache(path, wire, dtypes)
    assert (tmp_path / "params.wire.npz").exists()
    assert not (tmp_path / "params.wire.npz.json").exists()  # one artifact

    wire2, dtypes2 = load_wire_cache(path)
    assert dtypes2 == jax.tree.map(lambda d: d, dtypes)
    same = jax.tree.map(
        lambda a, b: np.array_equal(np.asarray(a), np.asarray(b))
        and np.asarray(a).dtype == np.asarray(b).dtype,
        wire, wire2,
    )
    assert all(jax.tree.leaves(same))

    out = jax.tree.map(np.asarray, dequantize_wire(wire2, dtypes2))
    ref = jax.tree.map(np.asarray, dequantize_wire(wire, dtypes))
    same = jax.tree.map(np.array_equal, ref, out)
    assert all(jax.tree.leaves(same))
    # bf16 dtype restored exactly
    assert out["conv"]["kernel"].dtype == jnp.bfloat16


def test_wire_cache_corruption_detected(tmp_path):
    """Corrupt artifacts must raise, not view-cast garbage: a clobbered
    magic (unknown container) and a v1 npz whose keys disagree with the
    embedded metadata (stale partial write) both fail loudly."""
    import json

    from clap2diffusion_tpu.utils.wire import _META_KEY, _flatten, dequant_map

    params = {"a": np.ones((300, 300), np.float32)}
    wire, dtypes, _ = quantize_wire(params, min_size=1)
    path = str(tmp_path / "params.wire.npz")
    save_wire_cache(path, wire, dtypes)
    raw = bytearray(open(path, "rb").read())
    raw[:8] = b"XXXXXXXX"
    open(path, "wb").write(bytes(raw))
    with pytest.raises(Exception):  # unknown container (np.load rejects it)
        load_wire_cache(path)

    # v1 npz with a key the metadata doesn't know
    flat = _flatten(wire)
    meta = {"leaf_dtypes": {k: str(v.dtype) for k, v in flat.items()},
            "dequant_dtypes": dequant_map(dtypes)}
    flat[_META_KEY] = np.frombuffer(
        json.dumps(meta).encode("utf-8"), dtype=np.uint8)
    flat["extra/q8"] = np.zeros(3, np.int8)
    v1 = str(tmp_path / "v1.wire.npz")
    with open(v1, "wb") as f:
        np.savez(f, **flat)
    with pytest.raises(ValueError, match="key mismatch"):
        load_wire_cache(v1)


def test_genuine_q8_named_subtree_not_mistaken():
    """A real parameter subtree that happens to be named {'q8','s'} (but
    holds float tensors) must ride the wire untouched, not be mis-expanded
    as a quantized payload (ADVICE r4)."""
    rng = np.random.default_rng(3)
    params = {
        "layer": {"q8": rng.normal(size=(300, 300)).astype(np.float32),
                  "s": rng.normal(size=(300,)).astype(np.float32)}
    }
    wire, dtypes, stats = quantize_wire(params, min_size=1)
    # the q8-named float leaf itself IS eligible and gets quantized as a
    # normal leaf (wrapped in its own payload dict) — the point is that
    # dequantize restores the original tree structure and values
    out = jax.tree.map(np.asarray, dequantize_wire(wire, dtypes))
    assert set(out["layer"].keys()) == {"q8", "s"}
    assert out["layer"]["q8"].shape == (300, 300)
    assert out["layer"]["s"].shape == (300,)
    x = params["layer"]["q8"]
    s = np.max(np.abs(x), axis=0) / 127.0
    assert np.all(np.abs(out["layer"]["q8"] - x) <= s[None, :] / 2 + 1e-7)


def test_wire_avals_and_aot_dequant():
    """wire_avals describes the EXPANDED tree; dequant_program lowers and
    compiles from wire_sds (abstract wire avals) with no values — the AOT
    path bench.py uses to overlap compile with the upload."""
    params = _tree(4)
    wire, dtypes, _ = quantize_wire(params, min_size=1 << 16)
    avals = wire_avals(wire, dtypes)
    expect = jax.tree.map(
        lambda x: (np.shape(x), np.asarray(x).dtype), params)
    got = jax.tree.map(lambda a: (a.shape, np.dtype(a.dtype)), avals)
    assert jax.tree.leaves(expect) == jax.tree.leaves(got)
    assert jax.tree.structure(expect) == jax.tree.structure(got)

    compiled = dequant_program(dtypes).lower(wire_sds(wire)).compile()
    out = jax.tree.map(np.asarray, compiled(wire))
    ref = jax.tree.map(np.asarray, dequantize_wire(wire, dtypes))
    same = jax.tree.map(np.array_equal, ref, out)
    assert all(jax.tree.leaves(same))


def test_zero_and_tiny_channels_are_safe():
    x = np.zeros((300, 300), np.float32)
    x[:, 0] = 1e-30  # denormal-scale channel
    wire, dtypes, stats = quantize_wire({"k": x}, min_size=1)
    out = np.asarray(dequantize_wire(wire, dtypes)["k"])
    assert np.all(np.isfinite(out))
    assert np.all(out[:, 1:] == 0.0)


def test_packed_wire_matches_per_leaf_path():
    """v2 packed format: ONE contiguous 1-D buffer PER DTYPE + layout
    (dtype grouping, not byte-packing — a uint8 bitcast formulation needs
    [n, itemsize] reshapes whose 128-lane minor-axis padding blew the
    payload up 32x in the TPU compiler). The fused unpack+dequant program
    must reproduce the per-leaf dequant bit-exactly (incl. a bf16 leaf and
    an int32 raw leaf), packed_views must be zero-copy-equal to the wire
    tree, and packed_avals must describe the expanded tree. Motivation: on
    the axon tunnel the 2,039-leaf tree upload pays ~25% per-transfer RPC
    overhead vs one buffer (measured 101.2 vs 78.1 s for the same
    1.04 GiB)."""
    from clap2diffusion_tpu.utils.wire import (
        dequant_map, pack_wire, packed_avals, packed_dequant_program,
        packed_views,
    )

    params = _tree(5)
    wire, dtypes, _ = quantize_wire(params, min_size=1 << 16)
    ref = jax.tree.map(np.asarray, dequantize_wire(wire, dtypes))

    groups, layout = pack_wire(wire)
    # one 1-D buffer per dtype, sized exactly to its leaves
    assert all(buf.ndim == 1 and str(buf.dtype) == dt
               for dt, buf in groups.items())
    leaf_bytes = sum(np.asarray(x).nbytes for x in jax.tree.leaves(wire))
    assert sum(b.nbytes for b in groups.values()) == leaf_bytes

    views = packed_views(groups, layout)
    same = jax.tree.map(
        lambda a, b: np.array_equal(np.asarray(a), np.asarray(b))
        and np.asarray(a).dtype == np.asarray(b).dtype, views, wire)
    assert all(jax.tree.leaves(same))

    dq = dequant_map(dtypes)
    avals = packed_avals(layout, dq)
    expect = jax.tree.map(lambda x: (np.shape(x), np.asarray(x).dtype), ref)
    got = jax.tree.map(lambda a: (a.shape, np.dtype(a.dtype)), avals)
    assert jax.tree.leaves(expect) == jax.tree.leaves(got)
    assert jax.tree.structure(expect) == jax.tree.structure(got)

    # AOT path: lower from the abstract buffer avals, run on the values
    compiled = packed_dequant_program(layout, dq).lower({
        dt: jax.ShapeDtypeStruct(buf.shape, buf.dtype)
        for dt, buf in groups.items()
    }).compile()
    out = jax.tree.map(np.asarray, compiled(groups))
    same = jax.tree.map(np.array_equal, ref, out)
    assert all(jax.tree.leaves(same))


def test_packed_cache_roundtrip_and_v1_compat(tmp_path):
    """save_wire_cache writes v2 (single buffer); load_packed_wire reads
    it back bit-exactly, and load_wire_cache still reads BOTH formats —
    a legacy v1 (per-leaf) artifact keeps loading after the format bump."""
    import json

    from clap2diffusion_tpu.utils.wire import (
        _META_KEY, dequant_map, load_packed_wire, pack_wire,
    )

    params = _tree(6)
    wire, dtypes, _ = quantize_wire(params, min_size=1 << 16)
    path = str(tmp_path / "v2.wire.npz")
    save_wire_cache(path, wire, dtypes)

    groups, layout, dq = load_packed_wire(path)
    ref_groups, ref_layout = pack_wire(wire)
    assert set(groups) == set(ref_groups)
    for dt in groups:
        assert np.array_equal(groups[dt], ref_groups[dt])
        assert groups[dt].dtype == ref_groups[dt].dtype  # bf16 view-cast
    assert layout == ref_layout
    assert dq == dequant_map(dtypes)

    # write a v1-format artifact by hand (what pre-round-5 sessions left
    # on disk) and load it through the same entry point
    from clap2diffusion_tpu.utils.wire import _flatten

    flat = _flatten(wire)
    meta = {
        "leaf_dtypes": {k: str(v.dtype) for k, v in flat.items()},
        "dequant_dtypes": dq,
    }
    flat[_META_KEY] = np.frombuffer(
        json.dumps(meta).encode("utf-8"), dtype=np.uint8)
    v1 = str(tmp_path / "v1.wire.npz")
    with open(v1, "wb") as f:
        np.savez(f, **flat)
    wire1, dtypes1 = load_wire_cache(v1)
    same = jax.tree.map(
        lambda a, b: np.array_equal(np.asarray(a), np.asarray(b)),
        wire1, wire)
    assert all(jax.tree.leaves(same))
    assert dtypes1 == jax.tree.map(lambda d: d, dtypes)


def test_packed_cache_truncation_detected(tmp_path):
    """A v2 artifact cut short (crash mid-write of a non-atomic copy,
    partial download) must raise, not memory-map garbage."""
    params = {"a": np.ones((300, 300), np.float32)}
    wire, dtypes, _ = quantize_wire(params, min_size=1)
    path = str(tmp_path / "params.wire.npz")
    save_wire_cache(path, wire, dtypes)
    full = open(path, "rb").read()
    open(path, "wb").write(full[:len(full) - 4096])
    with pytest.raises(ValueError, match="truncated"):
        load_wire_cache(path)


@pytest.mark.slow
def test_tiny_pipeline_image_drift_bounded(tmp_path, monkeypatch):
    from tests.test_pipeline import tiny_config
    from clap2diffusion_tpu.diffusion.pipeline import (
        AudioToImagePipeline,
        load_pipeline,
        save_pipeline,
    )

    cfg = tiny_config()
    pipe = AudioToImagePipeline(cfg, seed=0)
    host = jax.tree.map(np.asarray, pipe.params)
    wav = (np.random.default_rng(0).normal(
        size=cfg.clap.frontend.num_samples) * 0.1).astype(np.float32)
    ids = np.ones((1, 7), np.int32)

    ref = pipe.generate(waveform=wav, text_ids=ids, seed=0)
    pipe.params = upload_params(host, int8_wire=True)
    q = pipe.generate(waveform=wav, text_ids=ids, seed=0)

    assert q.shape == ref.shape and q.dtype == ref.dtype
    drift = np.abs(q.astype(np.int32) - ref.astype(np.int32))
    # <=0.4%-per-weight rounding through a 3-step tiny pipeline: images
    # must stay visually identical (uint8 scale)
    assert float(drift.mean()) < 8.0, float(drift.mean())

    # load_pipeline honors C2D_INT8_WIRE=1: the restored tree must equal
    # the wire round-trip of the saved params exactly
    path = str(tmp_path / "pipe_ckpt")
    save_pipeline(path, host)
    monkeypatch.setenv("C2D_INT8_WIRE", "1")
    loaded = load_pipeline(cfg, path)
    same = jax.tree.map(
        lambda a, b: np.array_equal(np.asarray(a), np.asarray(b)),
        loaded.params,
        upload_params(host, int8_wire=True),
    )
    assert all(jax.tree.leaves(same))
