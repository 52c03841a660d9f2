"""Native C++ audio loader vs the numpy reference path.

Builds native/libc2d_audio.so if a toolchain is available; all assertions
also hold for the numpy fallback, so the suite passes either way.
"""

import os
import subprocess

import numpy as np
import pytest

from clap2diffusion_tpu.utils import native_audio
from clap2diffusion_tpu.utils.audio_io import resample_poly, write_wav

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module", autouse=True)
def build_native():
    if not os.path.exists(os.path.join(REPO, "native", "libc2d_audio.so")):
        try:
            subprocess.run(["make", "-C", os.path.join(REPO, "native")],
                           check=True, capture_output=True, timeout=120)
        except Exception:
            pass  # fallback path still tested
    # reset cached handle so the fresh build is picked up
    native_audio._LIB_CHECKED = False
    native_audio._LIB = None


@pytest.mark.slow
def test_resampler_preserves_amplitude_and_frequency():
    sr_in, sr_out = 44_100, 48_000
    t = np.arange(sr_in) / sr_in
    x = (0.7 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    y = resample_poly(x, sr_in, sr_out)
    assert abs(float(np.abs(y[1000:-1000]).max()) - 0.7) < 0.01
    zc = int(np.sum(np.diff(np.sign(y[: sr_out // 2])) != 0)) // 2
    assert abs(zc - 220) <= 2  # 440 Hz -> 220 cycles in 0.5 s


@pytest.mark.slow
def test_native_matches_numpy(tmp_path):
    sr_in, sr_out = 44_100, 48_000
    t = np.arange(sr_in) / sr_in
    x = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    p = str(tmp_path / "a.wav")
    write_wav(p, x, sr_in)

    out = native_audio.load_audio(p, sr_out, sr_out)
    ref = resample_poly(x, sr_in, sr_out)
    ref = np.pad(ref, (0, max(0, sr_out - len(ref))))[:sr_out]
    # 16-bit quantization in the wav + separate fp paths
    assert np.abs(out - ref).max() < 5e-3
    assert out.shape == (sr_out,)


def test_native_batch_and_fallback(tmp_path):
    p = str(tmp_path / "a.wav")
    write_wav(p, np.ones(4800, np.float32) * 0.25, 48_000)
    batch, statuses = native_audio.load_audio_batch(
        [p, p, str(tmp_path / "missing.wav")], 48_000, 9600, num_threads=2
    )
    assert batch.shape == (3, 9600)
    # missing file -> zeros (status 1 when native lib present, zeros either way)
    assert float(np.abs(batch[2]).max()) == 0.0
    assert float(batch[0, :4800].mean()) == pytest.approx(0.25, abs=1e-3)
    assert float(np.abs(batch[0, 4800:]).max()) == 0.0  # zero-padded tail


def _flac_roundtrip(tmp_path, kind, channels=1, stereo_mode=None,
                    partition_order=0, n=10_000):
    from tests.flac_fixture import write_flac

    rng = np.random.default_rng(5)
    t = np.arange(n) / 48_000
    x = 0.4 * np.sin(2 * np.pi * 440 * t) + 0.05 * rng.normal(size=n)
    x16 = np.clip(x * 32767, -32768, 32767).astype(np.int16)
    if channels == 2:
        x16 = np.stack([x16, (x16 // 2).astype(np.int16)])
    p = str(tmp_path / f"{kind}{channels}{stereo_mode}{partition_order}.flac")
    write_flac(p, x16, 48_000, kind=kind, stereo_mode=stereo_mode,
               partition_order=partition_order)
    out = native_audio.decode_audio(p)
    assert out is not None, "native lib with FLAC support required"
    mono, sr = out
    assert sr == 48_000
    ref = x16.astype(np.float32).mean(axis=0) / 32768.0 if channels == 2 \
        else x16.astype(np.float32) / 32768.0
    assert mono.shape == ref.shape
    np.testing.assert_allclose(mono, ref, atol=1e-6)


def test_flac_decode_verbatim(tmp_path):
    """Non-WAV round-trip (VERDICT r2 next #6): fixture-encoded FLAC ->
    native decoder -> bit-exact int16 recovery."""
    if not native_audio.native_available():
        pytest.skip("native lib not built")
    _flac_roundtrip(tmp_path, "verbatim")


def test_flac_decode_fixed_rice(tmp_path):
    """FIXED order-1 subframes with Rice residuals (the predictive path)."""
    if not native_audio.native_available():
        pytest.skip("native lib not built")
    _flac_roundtrip(tmp_path, "fixed1")


def test_flac_decode_lpc(tmp_path):
    """LPC subframes (the path real encoders actually emit): quantized
    order-2 predictor, 12-bit coefficients, shift 10."""
    if not native_audio.native_available():
        pytest.skip("native lib not built")
    _flac_roundtrip(tmp_path, "lpc2")


def test_flac_decode_rice_partitions_and_escape(tmp_path):
    """Partitioned residuals (order 2 -> 4 partitions per frame) and an
    escape-to-raw partition (a +-20k-step random walk makes the ideal
    Rice parameter saturate)."""
    if not native_audio.native_available():
        pytest.skip("native lib not built")
    from tests.flac_fixture import write_flac

    _flac_roundtrip(tmp_path, "fixed1", partition_order=2)
    _flac_roundtrip(tmp_path, "lpc2", partition_order=1)

    rng = np.random.default_rng(9)
    walk = np.cumsum(rng.integers(-20_000, 20_000, size=6000))
    x16 = (walk % 50_000 - 25_000).clip(-32_768, 32_767).astype(np.int16)
    p = str(tmp_path / "escape.flac")
    write_flac(p, x16, 48_000, kind="fixed1")
    mono, sr = native_audio.decode_audio(p)
    np.testing.assert_allclose(mono, x16.astype(np.float32) / 32768.0,
                               atol=1e-6)


def test_flac_decode_stereo_decorrelation_modes(tmp_path):
    """left/side, right/side and mid/side joint-stereo frames, side channel
    at bps+1 — every reconstruction branch of the decoder."""
    if not native_audio.native_available():
        pytest.skip("native lib not built")
    for mode in ("left_side", "right_side", "mid_side"):
        _flac_roundtrip(tmp_path, "verbatim", channels=2, stereo_mode=mode)
        _flac_roundtrip(tmp_path, "fixed1", channels=2, stereo_mode=mode)


def test_flac_decode_stereo_and_constant(tmp_path):
    if not native_audio.native_available():
        pytest.skip("native lib not built")
    _flac_roundtrip(tmp_path, "verbatim", channels=2)
    # constant (silence) blocks
    from tests.flac_fixture import write_flac

    p = str(tmp_path / "silence.flac")
    write_flac(p, np.full(6000, 123, np.int16), 48_000)
    mono, sr = native_audio.decode_audio(p)
    assert sr == 48_000 and mono.shape == (6000,)
    np.testing.assert_allclose(mono, 123 / 32768.0, atol=1e-7)


def test_flac_through_load_audio_and_prepare(tmp_path):
    """The dataset/prepare surfaces accept .flac: c2d_load_audio sniffs the
    container, and process_audio_file writes a 48k wav from a flac source
    (reference prepare accepts any librosa-readable media,
    scripts/prepare_data.py:16-31)."""
    if not native_audio.native_available():
        pytest.skip("native lib not built")
    from tests.flac_fixture import write_flac

    from clap2diffusion_tpu.data.prepare import process_audio_file
    from clap2diffusion_tpu.utils.audio_io import read_audio, read_wav

    n = 44_100
    x = (0.5 * np.sin(2 * np.pi * 440 * np.arange(n) / 44_100))
    x16 = np.clip(x * 32767, -32768, 32767).astype(np.int16)
    src = str(tmp_path / "clip.flac")
    write_flac(src, x16, 44_100, kind="fixed1")

    # dataset-style load: resample to 48k and pad to 2 s
    out = native_audio.load_audio(src, 48_000, 96_000)
    assert out.shape == (96_000,)
    assert float(np.abs(out[:48_000]).max()) == pytest.approx(0.5, abs=0.01)
    assert float(np.abs(out[50_000:]).max()) == 0.0

    # read_audio dispatch
    mono, sr = read_audio(src)
    assert sr == 44_100 and len(mono) == n

    # prepare CLI building block
    dst = str(tmp_path / "clip.wav")
    assert process_audio_file(src, dst, target_sr=48_000, duration_s=1.0)
    wav, sr = read_wav(dst)
    assert sr == 48_000 and wav.shape == (48_000,)
    assert float(np.abs(wav).max()) == pytest.approx(1.0, abs=0.01)  # peak-norm


def test_prepare_audiocaps_finds_non_wav_sources(tmp_path):
    """prepare_audiocaps discovers {id}.flac when no {id}.wav exists
    (the reference only globs .wav, prepare_data.py:100; with in-repo
    multi-format decode the search is widened via SOURCE_EXTENSIONS)."""
    if not native_audio.native_available():
        pytest.skip("native lib not built")
    from tests.flac_fixture import write_flac

    from clap2diffusion_tpu.data.prepare import find_source, prepare_audiocaps

    src_dir = tmp_path / "src"
    src_dir.mkdir()
    x16 = np.clip(
        0.5 * np.sin(2 * np.pi * 440 * np.arange(24_000) / 24_000) * 32767,
        -32768, 32767,
    ).astype(np.int16)
    write_flac(str(src_dir / "vid_a.flac"), x16, 24_000, kind="fixed1")
    assert find_source(str(src_dir), "vid_a").endswith("vid_a.flac")
    assert find_source(str(src_dir), "vid_missing") is None

    csv_path = tmp_path / "audiocaps.csv"
    csv_path.write_text(
        "youtube_id,caption,start_time\nvid_a,a tone plays,0\nvid_b,absent,0\n"
    )
    out_root = tmp_path / "out"
    meta = prepare_audiocaps(str(csv_path), str(src_dir), str(out_root))
    ids = [s["id"] for s in meta["samples"]]
    assert ids == ["vid_a"]  # vid_b has no source in any container
    from clap2diffusion_tpu.utils.audio_io import read_wav

    wav, sr = read_wav(str(out_root / "audio" / "vid_a.wav"))
    assert sr == 48_000 and wav.shape == (480_000,)  # 10 s @ 48 kHz


def test_mp3_decode_via_system_codec(tmp_path):
    """MP3 round-trip: lame-encoded fixture (system libmp3lame via ctypes)
    -> native loader's libmpg123 backend (dlopen). Lossy codec, so the
    check is signal-level: recovered 440 Hz sine must correlate > 0.99
    with the source after aligning the codec delay."""
    if not native_audio.native_available():
        pytest.skip("native lib not built")
    from tests.mp3_fixture import write_mp3

    sr = 44_100
    t = np.arange(sr) / sr
    x = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    p = str(tmp_path / "tone.mp3")
    if not write_mp3(p, x, sr):
        pytest.skip("libmp3lame not available to build the fixture")

    out = native_audio.decode_audio(p)
    assert out is not None, "libmpg123 backend unavailable"
    mono, got_sr = out
    assert got_sr == sr
    # length is advisory for a lossy container (lame pads frames +
    # writes a Xing/LAME info frame) — within ~0.7 s of the source
    assert abs(len(mono) - len(x)) < 30_000
    # align via cross-correlation of a window, then check similarity
    w = 8192
    seg = mono[: len(x)]
    corr = np.correlate(seg[: 4 * w], x[:w], mode="valid")
    off = int(np.argmax(np.abs(corr)))
    a = seg[off : off + 2 * w]
    b = x[: 2 * w]
    cos = float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9))
    # |cos|: a pure periodic tone has phase-ambiguous alignment peaks
    assert abs(cos) > 0.99, f"cosine {cos} at offset {off}"
    # amplitude preserved
    assert abs(float(np.abs(a).max()) - 0.5) < 0.05

    # full read_audio dispatch reaches the same decode
    from clap2diffusion_tpu.utils.audio_io import read_audio

    mono2, sr2 = read_audio(p)
    assert sr2 == sr and len(mono2) == len(mono)

    # dataset-style load: resample+pad via the batch API
    out = native_audio.load_audio(p, 48_000, 96_000)
    assert out.shape == (96_000,)
    assert float(np.abs(out[:40_000]).max()) > 0.3


def test_read_audio_ffmpeg_fallback(tmp_path, monkeypatch):
    """Unsupported containers route through the ffmpeg CLI when present
    (fake ffmpeg on PATH) and raise a clear error when absent."""
    from clap2diffusion_tpu.utils.audio_io import read_audio

    # an "mp3" (really any non-RIFF/fLaC magic)
    fake_src = tmp_path / "clip.mp3"
    fake_src.write_bytes(b"ID3\x04" + b"\x00" * 64)
    real_path = os.environ.get("PATH", "")

    # no ffmpeg -> loud unsupported-container error
    monkeypatch.setenv("PATH", str(tmp_path / "nobin"))
    with pytest.raises(ValueError, match="unsupported audio container"):
        read_audio(str(fake_src))

    # fake ffmpeg that "decodes" by writing a known wav to the output path
    ref = (0.25 * np.sin(np.linspace(0, 20 * np.pi, 4800))).astype(np.float32)
    ref_wav = tmp_path / "decoded.wav"
    write_wav(str(ref_wav), ref, 48_000)
    bindir = tmp_path / "bin"
    bindir.mkdir()
    ffmpeg = bindir / "ffmpeg"
    # argv: -v error -y -i <src> -f wav <dst>  ->  dst is the last arg
    ffmpeg.write_text(f"#!/bin/sh\nfor last; do :; done\ncp {ref_wav} \"$last\"\n")
    ffmpeg.chmod(0o755)
    monkeypatch.setenv("PATH", f"{bindir}:{real_path}")
    wav, sr = read_audio(str(fake_src))
    assert sr == 48_000
    np.testing.assert_allclose(wav, ref, atol=1e-4)  # 16-bit wav quantization


def test_native_pcm_variants(tmp_path):
    """24-bit PCM decode through the native reader (when built)."""
    if not native_audio.native_available():
        pytest.skip("native lib not built")
    import struct
    import wave

    x = (np.sin(np.linspace(0, 40 * np.pi, 1000)) * 0.5).astype(np.float64)
    ints = (x * (1 << 23)).astype(np.int32)
    raw = b"".join(struct.pack("<i", v)[:3] for v in ints)
    p = str(tmp_path / "p24.wav")
    with wave.open(p, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(3)
        w.setframerate(48_000)
        w.writeframes(raw)
    out = native_audio.load_audio(p, 48_000, 1000)
    np.testing.assert_allclose(out, x, atol=2e-6)


def test_malformed_inputs_fail_cleanly(tmp_path):
    """Corrupt/truncated/garbage media must zero-fallback (load_audio) or
    raise ValueError (decode_audio) — never crash the process. The C ABI
    wraps decode in a noexcept try/catch, and the parsers bound every
    read; this exercises those guards with every container magic."""
    from tests.flac_fixture import write_flac

    rng = np.random.default_rng(0)
    n = 2_000
    x = (np.sin(np.linspace(0, 80 * np.pi, n)) * 0.5).astype(np.float32)

    wav_p = tmp_path / "ok.wav"
    flac_p = tmp_path / "ok.flac"
    write_wav(str(wav_p), x, 48_000)
    write_flac(str(flac_p), x, 48_000, kind="fixed")
    wav_bytes = wav_p.read_bytes()
    flac_bytes = flac_p.read_bytes()

    corpus = {
        "empty": b"",
        "short": b"RI",
        "noise": rng.bytes(4096),
        "riff_garbage": b"RIFF" + rng.bytes(512),
        "riff_wave_garbage": b"RIFF\x00\x10\x00\x00WAVE" + rng.bytes(512),
        # data chunk header LIES about its size (fread comes up short)
        "wav_size_lie": wav_bytes[:40] + b"\xf0\xff\xff\x0f" + wav_bytes[44:],
        "flac_garbage": b"fLaC" + rng.bytes(512),
        "id3_garbage": b"ID3" + rng.bytes(512),
        "mp3_sync_garbage": b"\xff\xe3" + rng.bytes(512),
    }
    for frac in (0.1, 0.5, 0.9):
        corpus[f"wav_trunc_{frac}"] = wav_bytes[: int(len(wav_bytes) * frac)]
        corpus[f"flac_trunc_{frac}"] = flac_bytes[: int(len(flac_bytes) * frac)]
    # bit flips inside the FLAC frame section (after the 42-byte header)
    for i, off in enumerate((50, 90, 130)):
        b = bytearray(flac_bytes)
        b[min(off, len(b) - 1)] ^= 0xFF
        corpus[f"flac_flip_{i}"] = bytes(b)

    for name, blob in corpus.items():
        p = tmp_path / f"{name}.bin"
        p.write_bytes(blob)
        out = native_audio.load_audio(str(p), 48_000, 1_000)
        assert out.shape == (1_000,) and np.isfinite(out).all(), name
        if native_audio.native_available():
            # decode_audio raises on anything undecodable; partial FLAC
            # truncations may legitimately return the frames before the cut
            try:
                dec, sr = native_audio.decode_audio(str(p))
                assert np.isfinite(dec).all() and sr > 0, name
            except ValueError:
                pass
    # the batch path reports per-file fallback statuses without crashing
    paths = [str(tmp_path / f"{k}.bin") for k in corpus] + [str(wav_p)]
    out, statuses = native_audio.load_audio_batch(paths, 48_000, 1_000)
    assert out.shape == (len(paths), 1_000) and np.isfinite(out).all()
    assert statuses[-1] == 0  # the genuine wav decodes
