"""MP3 test-fixture encoder via the system libmp3lame (ctypes).

The native loader decodes mp3 through the system libmpg123; encoding the
fixture with a DIFFERENT system codec (lame) makes the round-trip a real
cross-implementation check. Returns None when libmp3lame is unavailable
(tests then skip).
"""

from __future__ import annotations

import ctypes

import numpy as np


def _load_lame():
    for name in ("libmp3lame.so.0", "libmp3lame.so"):
        try:
            return ctypes.CDLL(name)
        except OSError:
            continue
    return None


def encode_mp3(samples: np.ndarray, sr: int, bitrate_kbps: int = 128) -> bytes | None:
    """float32 mono [-1,1] [n] -> mp3 bytes, or None if lame is missing."""
    lame = _load_lame()
    if lame is None:
        return None
    lame.lame_init.restype = ctypes.c_void_p
    gfp = ctypes.c_void_p(lame.lame_init())
    try:
        lame.lame_set_in_samplerate(gfp, ctypes.c_int(sr))
        lame.lame_set_num_channels(gfp, 1)
        lame.lame_set_mode(gfp, 3)  # MONO
        lame.lame_set_brate(gfp, ctypes.c_int(bitrate_kbps))
        if lame.lame_init_params(gfp) < 0:
            return None

        pcm = np.clip(np.asarray(samples, np.float32) * 32767, -32768, 32767).astype(
            np.int16
        )
        n = len(pcm)
        out = (ctypes.c_ubyte * (n + n // 4 + 7200))()
        wrote = lame.lame_encode_buffer(
            gfp,
            pcm.ctypes.data_as(ctypes.POINTER(ctypes.c_short)),
            None,
            ctypes.c_int(n),
            out,
            ctypes.c_int(len(out)),
        )
        if wrote < 0:
            return None
        data = bytes(out[:wrote])
        wrote = lame.lame_encode_flush(gfp, out, ctypes.c_int(len(out)))
        if wrote > 0:
            data += bytes(out[:wrote])
        return data
    finally:
        lame.lame_close(gfp)


def write_mp3(path: str, samples: np.ndarray, sr: int) -> bool:
    data = encode_mp3(samples, sr)
    if data is None:
        return False
    with open(path, "wb") as f:
        f.write(data)
    return True
