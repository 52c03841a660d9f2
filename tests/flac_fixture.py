"""Minimal FLAC *encoder* used only to build test fixtures.

Produces spec-compliant FLAC streams (real CRC-8/CRC-16, STREAMINFO,
UTF-8 frame numbers) from int16 PCM, exercising several decoder paths:
CONSTANT and VERBATIM subframes, FIXED order-1 subframes with
Rice-coded residuals, mono and independent-stereo channel layouts.
The native decoder (native/flac_decoder.h) is the system under test;
this encoder is the independent second implementation of the format.
"""

from __future__ import annotations

import numpy as np

BLOCKSIZE = 4096


class BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.cur = 0
        self.nbits = 0

    def write(self, value: int, nbits: int) -> None:
        for i in reversed(range(nbits)):
            self.cur = (self.cur << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.buf.append(self.cur)
                self.cur = 0
                self.nbits = 0

    def write_signed(self, value: int, nbits: int) -> None:
        self.write(value & ((1 << nbits) - 1), nbits)

    def pad_to_byte(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


def crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


def _utf8_number(bw: BitWriter, n: int) -> None:
    if n < 0x80:
        bw.write(n, 8)
    elif n < 0x800:
        bw.write(0xC0 | (n >> 6), 8)
        bw.write(0x80 | (n & 0x3F), 8)
    else:
        bw.write(0xE0 | (n >> 12), 8)
        bw.write(0x80 | ((n >> 6) & 0x3F), 8)
        bw.write(0x80 | (n & 0x3F), 8)


def _rice_write(bw: BitWriter, residuals: np.ndarray, param: int) -> None:
    for r in residuals:
        r = int(r)
        zz = (r << 1) if r >= 0 else (-(r << 1) - 1)
        q = zz >> param
        bw.write(0, q)  # q zero bits
        bw.write(1, 1)
        bw.write(zz & ((1 << param) - 1), param)


def _subframe(bw: BitWriter, ch: np.ndarray, kind: str) -> None:
    if kind == "constant":
        bw.write(0, 1)
        bw.write(0b000000, 6)
        bw.write(0, 1)  # no wasted bits
        bw.write_signed(int(ch[0]), 16)
    elif kind == "verbatim":
        bw.write(0, 1)
        bw.write(0b000001, 6)
        bw.write(0, 1)
        for s in ch:
            bw.write_signed(int(s), 16)
    elif kind == "fixed1":
        bw.write(0, 1)
        bw.write(0b001001, 6)  # FIXED, order 1
        bw.write(0, 1)
        bw.write_signed(int(ch[0]), 16)  # warmup
        res = np.diff(ch.astype(np.int64))
        # single Rice partition, param sized to the residual magnitude
        mean_abs = max(1.0, float(np.abs(res).mean()))
        param = min(14, max(0, int(np.ceil(np.log2(mean_abs))) + 1))
        bw.write(0, 2)       # residual method: Rice 4-bit
        bw.write(0, 4)       # partition order 0
        bw.write(param, 4)
        _rice_write(bw, res, param)
    else:
        raise ValueError(kind)


def encode_flac(samples: np.ndarray, sr: int, kind: str = "verbatim") -> bytes:
    """int16 samples [n] or [channels, n] -> FLAC stream bytes."""
    x = np.asarray(samples, np.int16)
    if x.ndim == 1:
        x = x[None]
    channels, n = x.shape
    assert 1 <= channels <= 8

    out = bytearray(b"fLaC")
    si = BitWriter()
    si.write(BLOCKSIZE, 16)
    si.write(BLOCKSIZE, 16)
    si.write(0, 24)  # min framesize unknown
    si.write(0, 24)
    si.write(sr, 20)
    si.write(channels - 1, 3)
    si.write(16 - 1, 5)
    si.write(n, 36)
    for _ in range(16):
        si.write(0, 8)  # md5 unknown
    body = si.bytes()
    out += bytes([0x80, 0, 0, len(body)]) + body  # last-block STREAMINFO

    for fi, start in enumerate(range(0, n, BLOCKSIZE)):
        block = x[:, start : start + BLOCKSIZE]
        bs = block.shape[1]
        hdr = BitWriter()
        hdr.write(0b11111111111110, 14)
        hdr.write(0, 1)  # reserved
        hdr.write(0, 1)  # fixed blocking strategy
        hdr.write(0b0111, 4)  # blocksize: 16-bit field below
        hdr.write(0, 4)  # sample rate: from STREAMINFO
        hdr.write(channels - 1, 4)  # independent channels
        hdr.write(0b100, 3)  # 16-bit samples
        hdr.write(0, 1)  # reserved
        _utf8_number(hdr, fi)
        hdr.write(bs - 1, 16)
        hdr.pad_to_byte()
        header_bytes = hdr.bytes()

        fw = BitWriter()
        for b in header_bytes:
            fw.write(b, 8)
        fw.write(crc8(header_bytes), 8)
        for c in range(channels):
            ch = block[c]
            k = "constant" if (ch == ch[0]).all() else kind
            _subframe(fw, ch, k)
        fw.pad_to_byte()
        frame_bytes = fw.bytes()
        out += frame_bytes + crc16(frame_bytes).to_bytes(2, "big")
    return bytes(out)


def write_flac(path: str, samples: np.ndarray, sr: int,
               kind: str = "verbatim") -> None:
    with open(path, "wb") as f:
        f.write(encode_flac(samples, sr, kind))
