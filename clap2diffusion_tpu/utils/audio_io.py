"""Audio IO without librosa/torchaudio: WAV + FLAC decode + resampling.

The reference leans on librosa/torchaudio for decode+resample (reference
models/audio_encoder.py:87-131, data/dataset.py:208-210,
scripts/prepare_data.py:16-31) and accepts whatever they read — AudioCaps
source media is not guaranteed WAV. ``read_wav`` handles PCM 8/16/24/32-bit
and IEEE-float WAVs in pure numpy; ``read_audio`` sniffs the container and
additionally decodes FLAC through the native C++ decoder
(native/flac_decoder.h, built via ``make -C native``) with a documented
ffmpeg-CLI fallback for anything else (mp3/ogg/m4a). ``resample_poly`` is a
windowed-sinc polyphase resampler (kaiser window), the same algorithm
family scipy.signal.resample_poly uses.
"""

from __future__ import annotations

import math
import struct
import wave
from fractions import Fraction
from typing import Tuple

import numpy as np


def read_wav(path: str) -> Tuple[np.ndarray, int]:
    """Read a WAV file -> (float32 array [channels, samples] or [samples], sr)."""
    with open(path, "rb") as f:
        header = f.read(12)
        if header[:4] != b"RIFF" or header[8:12] != b"WAVE":
            raise ValueError(f"{path}: not a RIFF/WAVE file")
        fmt = None
        data = None
        while True:
            chunk = f.read(8)
            if len(chunk) < 8:
                break
            cid, size = chunk[:4], struct.unpack("<I", chunk[4:])[0]
            payload = f.read(size + (size & 1))[:size]
            if cid == b"fmt ":
                fmt = struct.unpack("<HHIIHH", payload[:16])
            elif cid == b"data":
                data = payload
        if fmt is None or data is None:
            raise ValueError(f"{path}: missing fmt/data chunk")
    audio_format, channels, sr, _, _, bits = fmt
    if audio_format == 3:  # IEEE float
        dtype = np.float32 if bits == 32 else np.float64
        x = np.frombuffer(data, dtype=dtype).astype(np.float32)
    elif audio_format in (1, 0xFFFE):  # PCM (or extensible, assume PCM)
        if bits == 16:
            x = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0
        elif bits == 32:
            x = np.frombuffer(data, dtype="<i4").astype(np.float32) / 2147483648.0
        elif bits == 8:
            x = (np.frombuffer(data, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
        elif bits == 24:
            raw = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
            vals = (
                raw[:, 0].astype(np.int32)
                | (raw[:, 1].astype(np.int32) << 8)
                | (raw[:, 2].astype(np.int32) << 16)
            )
            vals = np.where(vals >= 1 << 23, vals - (1 << 24), vals)
            x = vals.astype(np.float32) / float(1 << 23)
        else:
            raise ValueError(f"{path}: unsupported PCM bit depth {bits}")
    else:
        raise ValueError(f"{path}: unsupported WAV format code {audio_format}")
    if channels > 1:
        x = x.reshape(-1, channels).T
    return x, sr


def read_wav_pcm16(path: str) -> Tuple[np.ndarray, int] | None:
    """Raw-PCM16 fast path: mono 16-bit PCM WAV -> (int16 [samples], sr).

    Returns ``None`` for anything that needs conversion (other formats,
    bit depths, or multi-channel). Keeping the samples int16 lets the
    serving path upload half the bytes of float32 and dequantize on
    device — lossless for PCM16 sources, which is what AudioCaps-style
    corpora (and our own ``prepare`` output) contain.
    """
    try:
        with open(path, "rb") as f:
            header = f.read(12)
            if header[:4] != b"RIFF" or header[8:12] != b"WAVE":
                return None
            fmt = None
            data = None
            while True:
                chunk = f.read(8)
                if len(chunk) < 8:
                    break
                cid, size = chunk[:4], struct.unpack("<I", chunk[4:])[0]
                payload = f.read(size + (size & 1))[:size]
                if cid == b"fmt ":
                    fmt = struct.unpack("<HHIIHH", payload[:16])
                elif cid == b"data":
                    data = payload
    except (OSError, struct.error):
        # struct.error: fmt chunk shorter than 16 bytes — "not a readable
        # PCM16 WAV", which this fast path reports as None (the caller
        # then goes through the full read_audio decode instead).
        return None
    if fmt is None or data is None or len(data) % 2:
        return None
    audio_format, channels, sr, _, _, bits = fmt
    if audio_format not in (1, 0xFFFE) or bits != 16 or channels != 1:
        return None
    return np.frombuffer(data, dtype="<i2"), sr


def read_audio(path: str) -> Tuple[np.ndarray, int]:
    """Container-sniffing decode -> (float32 samples, sr).

    WAV decodes in-process (``read_wav``; [channels, samples] for stereo).
    FLAC decodes through the native loader (mono-averaged [samples]) —
    requires ``make -C native``. MP3 decodes through the native loader's
    libmpg123 backend (system codec via dlopen) when available. Anything
    else (ogg/m4a/...) falls back to the ffmpeg CLI when present,
    mirroring the reference's librosa-reads-anything surface
    (reference scripts/prepare_data.py:16-31).
    """
    with open(path, "rb") as f:
        magic = f.read(4)
    if magic == b"RIFF":
        return read_wav(path)
    is_mp3 = magic[:3] == b"ID3" or (
        len(magic) >= 2 and magic[0] == 0xFF and (magic[1] & 0xE0) == 0xE0
    )
    if magic == b"fLaC" or is_mp3:
        from clap2diffusion_tpu.utils.native_audio import decode_audio

        try:
            out = decode_audio(path)  # in-repo FLAC / libmpg123 mp3
        except ValueError:
            if magic == b"fLaC":
                raise  # corrupt FLAC stream: fail loudly, not via ffmpeg
            out = None
        if out is not None:
            return out
        # native lib not built (or no system mp3 codec) -> same ffmpeg
        # CLI fallback every other container gets
    return _read_via_ffmpeg(path, magic)


def _read_via_ffmpeg(path: str, magic: bytes) -> Tuple[np.ndarray, int]:
    import shutil
    import subprocess
    import tempfile

    ffmpeg = shutil.which("ffmpeg")
    if ffmpeg is None:
        raise ValueError(
            f"{path}: unsupported audio container (magic {magic!r}). "
            "WAV and FLAC decode natively; for mp3/ogg/m4a install ffmpeg "
            "(the prepare CLI then converts through it automatically)."
        )
    with tempfile.NamedTemporaryFile(suffix=".wav") as tmp:
        subprocess.run(
            [ffmpeg, "-v", "error", "-y", "-i", path, "-f", "wav", tmp.name],
            check=True,
        )
        return read_wav(tmp.name)


def write_wav(path: str, x: np.ndarray, sr: int) -> None:
    """Write float32 [-1,1] mono/stereo -> 16-bit PCM WAV."""
    x = np.asarray(x, dtype=np.float32)
    if x.ndim == 2:
        x = x.T  # [samples, channels]
        channels = x.shape[1]
    else:
        channels = 1
    pcm = np.clip(x, -1.0, 1.0)
    pcm = (pcm * 32767.0).astype("<i2")
    with wave.open(path, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())


def _kaiser_sinc_filter(num_zeros: int, per_phase: int, cutoff: float, beta: float = 8.555) -> np.ndarray:
    """Lowpass prototype sampled at integer positions of the upsampled grid
    (scipy resample_poly convention): h[n] = fc*sinc(fc*n), kaiser-windowed,
    with fc normalized so the passband edge sits at min(pi/up, pi/down)."""
    half = num_zeros * per_phase
    n = np.arange(-half, half + 1, dtype=np.float64)
    h = cutoff * np.sinc(cutoff * n)
    h *= np.kaiser(len(h), beta)
    return h


def resample_poly(x: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    """Polyphase resampling of 1-D float audio (windowed-sinc, kaiser beta 8.555)."""
    if orig_sr == target_sr:
        return np.asarray(x, dtype=np.float32)
    frac = Fraction(target_sr, orig_sr)
    up, down = frac.numerator, frac.denominator
    x = np.asarray(x, dtype=np.float64)

    cutoff = min(1.0 / up, 1.0 / down)
    h = _kaiser_sinc_filter(num_zeros=16, per_phase=max(up, down), cutoff=cutoff)
    h = h * up

    # upsample by zero-stuffing, filter, downsample
    n_up = len(x) * up
    xu = np.zeros(n_up, dtype=np.float64)
    xu[::up] = x
    y = np.convolve(xu, h, mode="full")
    delay = (len(h) - 1) // 2
    y = y[delay : delay + n_up : down]
    out_len = int(math.ceil(len(x) * up / down))
    return y[:out_len].astype(np.float32)


def peak_normalize(x: np.ndarray, eps: float = 1e-9) -> np.ndarray:
    """Peak-normalize like the reference's inference path
    (reference scripts/inference.py:73-83)."""
    peak = np.abs(x).max()
    return (x / (peak + eps)).astype(np.float32) if peak > 0 else x.astype(np.float32)
