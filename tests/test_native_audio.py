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
