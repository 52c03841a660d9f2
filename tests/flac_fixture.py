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


def _rice_param_for(res: np.ndarray) -> int:
    mean_abs = max(1.0, float(np.abs(res).mean()))
    return min(14, max(0, int(np.ceil(np.log2(mean_abs))) + 1))


def _write_residual(bw: BitWriter, res: np.ndarray, blocksize: int,
                    order: int, partition_order: int = 0) -> None:
    """Rice-coded residual with 2^partition_order partitions; a partition
    whose ideal param exceeds 14 escapes to raw fixed-width samples."""
    parts = 1 << partition_order
    assert blocksize % parts == 0
    psize = blocksize // parts
    bw.write(0, 2)  # method: Rice, 4-bit params
    bw.write(partition_order, 4)
    idx = 0
    for p in range(parts):
        count = psize - (order if p == 0 else 0)
        seg = res[idx : idx + count]
        idx += count
        param = _rice_param_for(seg)
        max_abs = int(np.abs(seg).max()) if len(seg) else 0
        raw_bits = max(1, max_abs.bit_length() + 1)
        if param >= 14 and raw_bits <= 31:
            bw.write(15, 4)  # escape
            bw.write(raw_bits, 5)
            for r in seg:
                bw.write_signed(int(r), raw_bits)
        else:
            bw.write(param, 4)
            _rice_write(bw, seg, param)
    assert idx == len(res)


# order-2 LPC used by the "lpc2" fixture kind: y[i] ~ 1.5*y[i-1] - 0.6*y[i-2]
LPC2_SHIFT = 10
LPC2_COEFS = (int(1.5 * (1 << LPC2_SHIFT)), int(-0.6 * (1 << LPC2_SHIFT)))
LPC2_PRECISION = 12  # bits per quantized coefficient


def _subframe(bw: BitWriter, ch: np.ndarray, kind: str, bps: int = 16,
              partition_order: int = 0) -> None:
    n = len(ch)
    if kind == "constant":
        bw.write(0, 1)
        bw.write(0b000000, 6)
        bw.write(0, 1)  # no wasted bits
        bw.write_signed(int(ch[0]), bps)
    elif kind == "verbatim":
        bw.write(0, 1)
        bw.write(0b000001, 6)
        bw.write(0, 1)
        for s in ch:
            bw.write_signed(int(s), bps)
    elif kind == "fixed1":
        bw.write(0, 1)
        bw.write(0b001001, 6)  # FIXED, order 1
        bw.write(0, 1)
        bw.write_signed(int(ch[0]), bps)  # warmup
        res = np.diff(ch.astype(np.int64))
        _write_residual(bw, res, n, order=1, partition_order=partition_order)
    elif kind == "lpc2":
        order = 2
        bw.write(0, 1)
        bw.write(0b100000 | (order - 1), 6)  # LPC, order 2
        bw.write(0, 1)
        x = ch.astype(np.int64)
        for i in range(order):
            bw.write_signed(int(x[i]), bps)  # warmup
        bw.write(LPC2_PRECISION - 1, 4)
        bw.write_signed(LPC2_SHIFT, 5)
        for c in LPC2_COEFS:
            bw.write_signed(c, LPC2_PRECISION)
        c1, c2 = LPC2_COEFS
        pred = (c1 * x[1:-1] + c2 * x[:-2]) >> LPC2_SHIFT
        res = x[2:] - pred
        _write_residual(bw, res, n, order=order,
                        partition_order=partition_order)
    else:
        raise ValueError(kind)


STEREO_MODES = {None: None, "left_side": 8, "right_side": 9, "mid_side": 10}


def encode_flac(samples: np.ndarray, sr: int, kind: str = "verbatim",
                stereo_mode: str | None = None,
                partition_order: int = 0) -> bytes:
    """int16 samples [n] or [channels, n] -> FLAC stream bytes.

    ``stereo_mode``: None (independent) or left_side/right_side/mid_side
    (channels must be 2; the side channel is coded with bps+1 bits per
    the spec). ``partition_order``: Rice partition order per subframe
    (falls back per-frame when the tail block is not divisible).
    """
    x = np.asarray(samples, np.int16)
    if x.ndim == 1:
        x = x[None]
    channels, n = x.shape
    assert 1 <= channels <= 8
    assert stereo_mode in STEREO_MODES
    if stereo_mode is not None:
        assert channels == 2

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

    chan_code = STEREO_MODES[stereo_mode]
    if chan_code is None:
        chan_code = channels - 1

    for fi, start in enumerate(range(0, n, BLOCKSIZE)):
        block = x[:, start : start + BLOCKSIZE].astype(np.int64)
        bs = block.shape[1]
        hdr = BitWriter()
        hdr.write(0b11111111111110, 14)
        hdr.write(0, 1)  # reserved
        hdr.write(0, 1)  # fixed blocking strategy
        hdr.write(0b0111, 4)  # blocksize: 16-bit field below
        hdr.write(0, 4)  # sample rate: from STREAMINFO
        hdr.write(chan_code, 4)
        hdr.write(0b100, 3)  # 16-bit samples
        hdr.write(0, 1)  # reserved
        _utf8_number(hdr, fi)
        hdr.write(bs - 1, 16)
        hdr.pad_to_byte()
        header_bytes = hdr.bytes()

        # per-frame channel transform + per-channel bit depths
        if stereo_mode is None:
            coded = [(block[c], 16) for c in range(channels)]
        else:
            left, right = block[0], block[1]
            side = left - right  # 17-bit range
            if stereo_mode == "left_side":
                coded = [(left, 16), (side, 17)]
            elif stereo_mode == "right_side":
                coded = [(side, 17), (right, 16)]
            else:  # mid_side
                mid = (left + right) >> 1
                coded = [(mid, 16), (side, 17)]

        # partition order must divide the (possibly short) tail block and
        # leave the first partition non-empty after warmup
        po = partition_order
        while po > 0 and (bs % (1 << po) != 0 or (bs >> po) <= 2):
            po -= 1

        fw = BitWriter()
        for b in header_bytes:
            fw.write(b, 8)
        fw.write(crc8(header_bytes), 8)
        for ch, bps in coded:
            k = "constant" if (ch == ch[0]).all() else kind
            _subframe(fw, ch, k, bps=bps, partition_order=po)
        fw.pad_to_byte()
        frame_bytes = fw.bytes()
        out += frame_bytes + crc16(frame_bytes).to_bytes(2, "big")
    return bytes(out)


def write_flac(path: str, samples: np.ndarray, sr: int,
               kind: str = "verbatim", stereo_mode: str | None = None,
               partition_order: int = 0) -> None:
    with open(path, "wb") as f:
        f.write(encode_flac(samples, sr, kind, stereo_mode=stereo_mode,
                            partition_order=partition_order))
