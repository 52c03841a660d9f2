"""ctypes bindings for the native C++ audio loader (native/audio_loader.cpp).

Provides threaded WAV decode + polyphase resample + pad/crop as one call per
batch; falls back transparently to the pure-numpy path in audio_io.py when
the shared library hasn't been built (``make -C native``).
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_LIB_CHECKED = False


def _find_lib() -> Optional[str]:
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    candidates = [
        os.environ.get("C2D_AUDIO_LIB", ""),
        os.path.join(here, "native", "libc2d_audio.so"),
    ]
    for c in candidates:
        if c and os.path.exists(c):
            return c
    return None


def load_library() -> Optional[ctypes.CDLL]:
    global _LIB, _LIB_CHECKED
    if _LIB_CHECKED:
        return _LIB
    _LIB_CHECKED = True
    path = _find_lib()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.c2d_abi_version.restype = ctypes.c_int
        if lib.c2d_abi_version() not in (1, 2, 3):
            return None
        lib.c2d_load_audio.restype = ctypes.c_int
        lib.c2d_load_audio.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.c2d_load_audio_batch.restype = ctypes.c_int
        lib.c2d_load_audio_batch.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int),
        ]
        if lib.c2d_abi_version() >= 2:
            lib.c2d_decode_audio.restype = ctypes.c_longlong
            lib.c2d_decode_audio.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
                ctypes.c_longlong, ctypes.POINTER(ctypes.c_int),
            ]
        if lib.c2d_abi_version() >= 3:
            lib.c2d_decode_audio_alloc.restype = ctypes.c_longlong
            lib.c2d_decode_audio_alloc.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
                ctypes.POINTER(ctypes.c_int),
            ]
            lib.c2d_free.restype = None
            lib.c2d_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def native_available() -> bool:
    return load_library() is not None


def decode_audio(path: str):
    """Decode WAV/FLAC/MP3 at native sample rate -> (mono float32 [n], sr),
    or None when the library isn't available. Uses the single-pass alloc
    API (v3); the v2 two-pass protocol is the compatibility fallback."""
    lib = load_library()
    if lib is None or lib.c2d_abi_version() < 2:
        return None
    sr = ctypes.c_int(0)
    if lib.c2d_abi_version() >= 3:
        buf = ctypes.POINTER(ctypes.c_float)()
        n = lib.c2d_decode_audio_alloc(path.encode(), ctypes.byref(buf),
                                       ctypes.byref(sr))
        if n < 0:
            raise ValueError(f"{path}: native audio decode failed")
        try:
            out = np.ctypeslib.as_array(buf, shape=(int(n),)).copy()
        finally:
            lib.c2d_free(buf)
        return out, int(sr.value)
    n = lib.c2d_decode_audio(path.encode(), None, 0, ctypes.byref(sr))
    if n < 0:
        raise ValueError(f"{path}: native audio decode failed")
    out = np.zeros(int(n), np.float32)
    n2 = lib.c2d_decode_audio(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        int(n), ctypes.byref(sr),
    )
    if n2 != n:  # file changed / IO error between the passes
        raise ValueError(f"{path}: native audio decode failed on fill pass")
    return out, int(sr.value)


def load_audio(path: str, target_sr: int, target_len: int,
               peak_norm: bool = False) -> np.ndarray:
    """Decode+resample+pad one file -> float32 [target_len]."""
    lib = load_library()
    if lib is None:
        return _fallback_one(path, target_sr, target_len, peak_norm)
    out = np.zeros(target_len, np.float32)
    lib.c2d_load_audio(
        path.encode(), target_sr, target_len, int(peak_norm),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out


def load_audio_batch(paths: List[str], target_sr: int, target_len: int,
                     peak_norm: bool = False,
                     num_threads: int = 8) -> Tuple[np.ndarray, np.ndarray]:
    """Threaded batch decode -> (float32 [n, target_len], statuses [n])."""
    lib = load_library()
    n = len(paths)
    if lib is None:
        out = np.stack(
            [_fallback_one(p, target_sr, target_len, peak_norm) for p in paths]
        ) if n else np.zeros((0, target_len), np.float32)
        return out, np.zeros(n, np.int32)
    out = np.zeros((n, target_len), np.float32)
    statuses = np.zeros(n, np.int32)
    lib.c2d_load_audio_batch(
        "\n".join(paths).encode(), n, target_sr, target_len, int(peak_norm),
        num_threads,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        statuses.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    return out, statuses


def _fallback_one(path: str, target_sr: int, target_len: int,
                  peak_norm: bool) -> np.ndarray:
    from clap2diffusion_tpu.utils.audio_io import peak_normalize, read_wav, resample_poly

    try:
        wav, sr = read_wav(path)
        if wav.ndim == 2:
            wav = wav.mean(axis=0)
        if peak_norm:
            wav = peak_normalize(wav)
        if sr != target_sr:
            wav = resample_poly(wav, sr, target_sr)
        if len(wav) < target_len:
            wav = np.pad(wav, (0, target_len - len(wav)))
        return wav[:target_len].astype(np.float32)
    except Exception:
        return np.zeros(target_len, np.float32)
