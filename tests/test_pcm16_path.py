"""PCM16 upload path (fast tier).

Serving latency on the tunneled backend is partly host->device transfer
(BENCH_NOTES.md: the float32 waveform upload is a measurable slice of
p50), so mono 16-bit PCM WAV sources stay int16 end-to-end: load_audio
returns raw int16 samples, ``generate`` uploads half the bytes, and the
device dequantizes + peak-normalizes inside the one jitted program.
These tests pin (a) the reader fast path, (b) the pipeline equivalence
int16 vs float32 — the two entries must produce the same image.
"""

import numpy as np
import pytest

from clap2diffusion_tpu.utils.audio_io import (
    peak_normalize,
    read_wav_pcm16,
    write_wav,
)


_PIPE = {}


def _pipe():
    """One shared tiny pipeline: each instance pays its own jit compiles,
    ~15-20 s apiece in the fast tier (same pattern as test_apps_eval's
    sampler_rig)."""
    if not _PIPE:
        from clap2diffusion_tpu.diffusion.pipeline import AudioToImagePipeline
        from tests.test_pipeline import tiny_config

        _PIPE["pipe"] = AudioToImagePipeline(tiny_config(), seed=0)
    return _PIPE["pipe"]


def _sine(n=24_000, sr=48_000):
    t = np.arange(n) / sr
    return (0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)


def test_read_wav_pcm16_roundtrip(tmp_path):
    x = _sine()
    p = str(tmp_path / "mono.wav")
    write_wav(p, x, 48_000)
    out = read_wav_pcm16(p)
    assert out is not None
    pcm, sr = out
    assert pcm.dtype == np.int16 and sr == 48_000
    expected = (np.clip(x, -1, 1) * 32767.0).astype(np.int16)
    np.testing.assert_array_equal(pcm, expected)


def test_read_wav_pcm16_rejects_stereo(tmp_path):
    x = np.stack([_sine(), -_sine()])  # [channels, samples]
    p = str(tmp_path / "stereo.wav")
    write_wav(p, x, 48_000)
    assert read_wav_pcm16(p) is None


def test_load_audio_returns_int16_for_pcm16_sources(tmp_path):
    pipe = _pipe()
    cfg = pipe.cfg
    p = str(tmp_path / "in.wav")
    write_wav(p, _sine(n=30_000), 48_000)  # longer than the 0.5 s target
    wav = pipe.load_audio(p)
    assert wav.dtype == np.int16
    assert wav.shape == (cfg.clap.frontend.num_samples,)
    # a non-target-rate source falls back to the float32 resample path
    write_wav(p, _sine(), 44_100)
    assert pipe.load_audio(p).dtype == np.float32


def test_load_audio_louder_tail_takes_float_path(tmp_path):
    """The int16 fast path normalizes on-device AFTER the host crop, so it
    is only exact when the crop window keeps the global peak. A file whose
    loudest sample lies beyond the crop must fall back to the float path
    (full-file peak_normalize, then crop — the reference's order)."""
    pipe = _pipe()
    cfg = pipe.cfg
    n = cfg.clap.frontend.num_samples
    x = np.full(2 * n, 0.1, np.float32)
    x[-1] = 0.9  # global peak beyond the crop window
    p = str(tmp_path / "tail.wav")
    write_wav(p, x, cfg.clap.frontend.sample_rate)
    wav = pipe.load_audio(p)
    assert wav.dtype == np.float32
    # quiet head scaled by the GLOBAL peak: stays ~0.1/0.9, not 1.0
    assert abs(float(np.max(np.abs(wav))) - 0.1 / 0.9) < 1e-3


def test_encode_audio_accepts_int16():
    """encode_audio is documented as load_audio's consumer, so it must
    dequantize the PCM16 fast path's int16 output the same way the
    generate program does."""
    pipe = _pipe()
    rng = np.random.default_rng(7)
    n = pipe.cfg.clap.frontend.num_samples
    pcm = (rng.normal(size=(1, n)) * 8000).clip(-32768, 32767).astype(np.int16)
    e_i16 = np.asarray(pipe.encode_audio(pcm))
    e_f32 = np.asarray(
        pipe.encode_audio(peak_normalize(pcm.astype(np.float32) / 32768.0))
    )
    np.testing.assert_allclose(e_i16, e_f32, atol=1e-5)


def test_read_wav_pcm16_malformed_returns_none(tmp_path):
    """Contract: anything unreadable returns None (caller falls back to the
    full decoder) — including short fmt chunks and odd-length data."""
    import struct

    short_fmt = str(tmp_path / "short_fmt.wav")
    with open(short_fmt, "wb") as f:
        payload = struct.pack("<HHI", 1, 1, 48_000)  # 8 bytes, needs 16
        f.write(b"RIFF" + struct.pack("<I", 4 + 8 + len(payload)) + b"WAVE")
        f.write(b"fmt " + struct.pack("<I", len(payload)) + payload)
    assert read_wav_pcm16(short_fmt) is None

    odd_data = str(tmp_path / "odd_data.wav")
    fmt = struct.pack("<HHIIHH", 1, 1, 48_000, 96_000, 2, 16)
    with open(odd_data, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 40) + b"WAVE")
        f.write(b"fmt " + struct.pack("<I", 16) + fmt)
        f.write(b"data" + struct.pack("<I", 3) + b"\x01\x02\x03")
    assert read_wav_pcm16(odd_data) is None


def test_generate_int16_matches_float32():
    from clap2diffusion_tpu.models.tokenizer import CLIPTokenizer

    pipe = _pipe()
    cfg = pipe.cfg
    tok = CLIPTokenizer(max_length=cfg.diffusion.clip_text.max_length)

    rng = np.random.default_rng(3)
    pcm = (rng.normal(size=cfg.clap.frontend.num_samples) * 8000).clip(
        -32768, 32767
    ).astype(np.int16)
    kw = dict(text_ids=tok("a test sound"), uncond_ids=tok(""),
              num_steps=2, seed=5)
    img_i16 = pipe.generate(waveform=pcm, **kw)
    img_f32 = pipe.generate(
        waveform=peak_normalize(pcm.astype(np.float32) / 32768.0), **kw
    )
    assert img_i16.dtype == np.uint8 and img_i16.shape == img_f32.shape
    # device dequant+normalize vs host peak_normalize differ only by the
    # host eps (1e-9 relative) — identical after uint8 rounding, up to
    # rare one-count boundary flips.
    diff = np.abs(img_i16.astype(np.int32) - img_f32.astype(np.int32))
    assert float(diff.mean()) < 0.05 and int(diff.max()) <= 1


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
