// Minimal native FLAC decoder (header-only, no external dependencies).
//
// The reference's data prep accepts anything librosa/torchaudio reads
// (reference models/audio_encoder.py:87-131, scripts/prepare_data.py:16-31);
// AudioCaps source media is not guaranteed WAV. This decoder covers the
// FLAC stream format so non-WAV corpora can be prepared natively:
//   - STREAMINFO metadata parse (other metadata blocks skipped)
//   - frame headers: all blocksize/sample-rate/sample-size codes, UTF-8
//     coded frame/sample numbers, fixed + variable blocking strategies
//   - subframes: CONSTANT, VERBATIM, FIXED (orders 0-4), LPC (orders
//     1-32), wasted-bits shift
//   - residuals: Rice / Rice2 partitions incl. escape-to-raw partitions
//   - stereo decorrelation: left/side, right/side, mid/side
// CRCs are parsed but not verified (decode is best-effort; a corrupt
// frame aborts the stream and returns what was decoded so far).
//
// Output is mono-averaged float32 in [-1, 1], like the WAV path.

#pragma once

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

namespace c2d_flac {

struct BitReader {
  const uint8_t* data = nullptr;
  size_t size = 0;     // bytes
  size_t bitpos = 0;   // absolute bit position
  bool ok = true;

  bool eof() const { return bitpos >= size * 8; }

  inline uint32_t bit() {
    size_t byte = bitpos >> 3;
    if (byte >= size) {
      ok = false;
      return 0;
    }
    uint32_t v = (data[byte] >> (7 - (bitpos & 7))) & 1u;
    ++bitpos;
    return v;
  }

  uint64_t bits64(int n) {
    uint64_t v = 0;
    for (int i = 0; i < n; ++i) v = (v << 1) | bit();
    return v;
  }

  uint32_t bits(int n) { return static_cast<uint32_t>(bits64(n)); }

  int64_t sbits(int n) {
    if (n == 0) return 0;
    uint64_t v = bits64(n);
    if (v >> (n - 1)) v |= ~((1ULL << n) - 1);  // sign-extend
    return static_cast<int64_t>(v);
  }

  uint32_t unary() {
    uint32_t q = 0;
    while (ok && bit() == 0) {
      if (++q > 1u << 24) {  // corrupt-stream guard
        ok = false;
        break;
      }
    }
    return q;
  }

  void align_byte() { bitpos = (bitpos + 7) & ~size_t(7); }
};

struct StreamInfo {
  uint32_t sample_rate = 0;
  uint32_t channels = 0;
  uint32_t bits_per_sample = 0;
  uint64_t total_samples = 0;  // 0 = unknown
};

// UTF-8-style coded number (frame/sample index; up to 36 bits).
inline uint64_t read_coded_number(BitReader& br) {
  uint32_t b0 = br.bits(8);
  int extra = 0;
  uint64_t v = 0;
  if ((b0 & 0x80) == 0) {
    return b0;
  } else if ((b0 & 0xE0) == 0xC0) {
    extra = 1;
    v = b0 & 0x1F;
  } else if ((b0 & 0xF0) == 0xE0) {
    extra = 2;
    v = b0 & 0x0F;
  } else if ((b0 & 0xF8) == 0xF0) {
    extra = 3;
    v = b0 & 0x07;
  } else if ((b0 & 0xFC) == 0xF8) {
    extra = 4;
    v = b0 & 0x03;
  } else if ((b0 & 0xFE) == 0xFC) {
    extra = 5;
    v = b0 & 0x01;
  } else if (b0 == 0xFE) {
    extra = 6;
    v = 0;
  } else {
    br.ok = false;
    return 0;
  }
  for (int i = 0; i < extra; ++i) v = (v << 6) | (br.bits(8) & 0x3F);
  return v;
}

inline bool read_residual(BitReader& br, uint32_t blocksize, uint32_t order,
                          int64_t* out /* blocksize entries; warmup skipped */) {
  uint32_t method = br.bits(2);
  if (method > 1) return false;
  int pbits = method == 0 ? 4 : 5;
  uint32_t escape = method == 0 ? 15u : 31u;
  uint32_t po = br.bits(4);
  uint32_t parts = 1u << po;
  if ((blocksize % parts) != 0) return false;
  uint32_t psize = blocksize >> po;
  // first partition holds psize - order samples; it must not underflow
  if (psize <= order) return false;
  size_t idx = order;
  for (uint32_t p = 0; p < parts; ++p) {
    uint32_t count = psize - (p == 0 ? order : 0);
    uint32_t param = br.bits(pbits);
    if (param == escape) {
      uint32_t raw = br.bits(5);
      for (uint32_t i = 0; i < count; ++i) out[idx++] = br.sbits(raw);
    } else {
      for (uint32_t i = 0; i < count; ++i) {
        uint32_t q = br.unary();
        uint32_t r = br.bits(param);
        uint64_t zz = (static_cast<uint64_t>(q) << param) | r;
        out[idx++] = static_cast<int64_t>(zz >> 1) ^ -static_cast<int64_t>(zz & 1);
      }
    }
    if (!br.ok) return false;
  }
  return idx == blocksize;
}

inline bool decode_subframe(BitReader& br, uint32_t blocksize, int bps,
                            std::vector<int64_t>& out) {
  out.assign(blocksize, 0);
  if (br.bits(1) != 0) return false;  // zero-padding bit
  uint32_t type = br.bits(6);
  uint32_t wasted = 0;
  if (br.bits(1)) wasted = br.unary() + 1;
  int ebps = bps - static_cast<int>(wasted);
  if (ebps <= 0 || ebps > 33) return false;

  if (type == 0) {  // CONSTANT
    int64_t v = br.sbits(ebps);
    for (auto& s : out) s = v;
  } else if (type == 1) {  // VERBATIM
    for (auto& s : out) s = br.sbits(ebps);
  } else if ((type & 0x38) == 0x08 && (type & 0x07) <= 4) {  // FIXED
    uint32_t order = type & 0x07;
    if (order > blocksize) return false;
    for (uint32_t i = 0; i < order; ++i) out[i] = br.sbits(ebps);
    if (!read_residual(br, blocksize, order, out.data())) return false;
    for (uint32_t i = order; i < blocksize; ++i) {
      int64_t p = 0;
      switch (order) {
        case 0: p = 0; break;
        case 1: p = out[i - 1]; break;
        case 2: p = 2 * out[i - 1] - out[i - 2]; break;
        case 3: p = 3 * out[i - 1] - 3 * out[i - 2] + out[i - 3]; break;
        case 4:
          p = 4 * out[i - 1] - 6 * out[i - 2] + 4 * out[i - 3] - out[i - 4];
          break;
      }
      out[i] += p;
    }
  } else if (type & 0x20) {  // LPC
    uint32_t order = (type & 0x1F) + 1;
    if (order > blocksize) return false;
    for (uint32_t i = 0; i < order; ++i) out[i] = br.sbits(ebps);
    uint32_t prec = br.bits(4);
    if (prec == 15) return false;
    prec += 1;
    int64_t shift = br.sbits(5);
    if (shift < 0) return false;
    std::vector<int64_t> coef(order);
    for (auto& c : coef) c = br.sbits(prec);
    if (!read_residual(br, blocksize, order, out.data())) return false;
    for (uint32_t i = order; i < blocksize; ++i) {
      int64_t acc = 0;
      for (uint32_t j = 0; j < order; ++j) acc += coef[j] * out[i - 1 - j];
      out[i] += acc >> shift;
    }
  } else {
    return false;  // reserved subframe type
  }
  if (wasted) {
    for (auto& s : out) s <<= wasted;
  }
  return br.ok;
}

// Decode an entire FLAC stream held in memory. Returns false only if the
// stream is not FLAC / has no STREAMINFO; frame-level corruption stops the
// decode but keeps prior frames.
inline bool decode_stream(const uint8_t* bytes, size_t size, StreamInfo* info,
                          std::vector<float>* mono) {
  if (size < 42 || memcmp(bytes, "fLaC", 4) != 0) return false;
  BitReader br{bytes, size, 32};

  // metadata blocks
  bool have_si = false;
  for (;;) {
    uint32_t last = br.bits(1);
    uint32_t type = br.bits(7);
    uint32_t len = br.bits(24);
    if (!br.ok) return false;
    if (type == 0 && len >= 34) {  // STREAMINFO
      br.bits(16);  // min blocksize
      br.bits(16);  // max blocksize
      br.bits(24);  // min framesize
      br.bits(24);  // max framesize
      info->sample_rate = br.bits(20);
      info->channels = br.bits(3) + 1;
      info->bits_per_sample = br.bits(5) + 1;
      info->total_samples = br.bits64(36);
      br.bits64(64);  // md5 hi
      br.bits64(64);  // md5 lo
      for (uint32_t i = 34; i < len; ++i) br.bits(8);
      have_si = true;
    } else {
      for (uint32_t i = 0; i < len; ++i) br.bits(8);
    }
    if (last || !br.ok) break;
  }
  if (!have_si || !br.ok || info->sample_rate == 0) return false;

  uint32_t nch_stream = info->channels;
  std::vector<std::vector<int64_t>> chans(nch_stream);
  float scale = 1.0f / static_cast<float>(1u << (info->bits_per_sample - 1));
  mono->clear();
  if (info->total_samples) {
    // reserve() is only a hint — clamp it so a fuzzed 36-bit STREAMINFO
    // total (up to 2^36-1 -> a 256 GB reserve -> std::length_error
    // aborting the host process) cannot outrun what the file could
    // plausibly hold (compressed bytes bound decoded samples except for
    // constant frames, which push_back growth absorbs).
    uint64_t plausible = static_cast<uint64_t>(size) * 8 /
                             (info->bits_per_sample ? info->bits_per_sample : 16) +
                         (1u << 16);
    mono->reserve(static_cast<size_t>(
        std::min<uint64_t>(info->total_samples, plausible)));
  }

  while (br.ok && !br.eof()) {
    size_t frame_start = br.bitpos;
    uint32_t sync = br.bits(14);
    if (!br.ok) break;
    if (sync != 0x3FFE) break;  // trailing junk / desync: stop cleanly
    br.bits(1);                 // reserved
    br.bits(1);                 // blocking strategy (coded number covers both)
    uint32_t bs_code = br.bits(4);
    uint32_t sr_code = br.bits(4);
    uint32_t chan_code = br.bits(4);
    uint32_t ss_code = br.bits(3);
    br.bits(1);  // reserved
    read_coded_number(br);

    uint32_t blocksize = 0;
    if (bs_code == 1) blocksize = 192;
    else if (bs_code >= 2 && bs_code <= 5) blocksize = 576u << (bs_code - 2);
    else if (bs_code == 6) blocksize = br.bits(8) + 1;
    else if (bs_code == 7) blocksize = br.bits(16) + 1;
    else if (bs_code >= 8) blocksize = 256u << (bs_code - 8);
    else break;  // 0 reserved

    if (sr_code == 12) br.bits(8);
    else if (sr_code == 13 || sr_code == 14) br.bits(16);
    else if (sr_code == 15) break;

    int bps;
    switch (ss_code) {
      case 0: bps = static_cast<int>(info->bits_per_sample); break;
      case 1: bps = 8; break;
      case 2: bps = 12; break;
      case 4: bps = 16; break;
      case 5: bps = 20; break;
      case 6: bps = 24; break;
      case 7: bps = 32; break;
      default: bps = 0;
    }
    if (bps == 0) break;
    br.bits(8);  // header CRC-8 (unverified)

    uint32_t nch;
    int mode = 0;  // 0 independent, 1 L/S, 2 R/S, 3 M/S
    if (chan_code < 8) {
      nch = chan_code + 1;
    } else if (chan_code <= 10) {
      nch = 2;
      mode = static_cast<int>(chan_code) - 7;
    } else {
      break;
    }
    if (nch != nch_stream) break;

    bool frame_ok = true;
    for (uint32_t c = 0; c < nch && frame_ok; ++c) {
      int cbps = bps;
      if ((mode == 1 && c == 1) || (mode == 2 && c == 0) ||
          (mode == 3 && c == 1))
        cbps += 1;  // side channel carries one extra bit
      frame_ok = decode_subframe(br, blocksize, cbps, chans[c]);
    }
    if (!frame_ok || !br.ok) {
      br.bitpos = frame_start;  // keep everything before the bad frame
      break;
    }
    br.align_byte();
    br.bits(16);  // frame CRC-16 (unverified)

    // stereo decorrelation
    if (mode == 1) {  // left/side: right = left - side
      for (uint32_t i = 0; i < blocksize; ++i)
        chans[1][i] = chans[0][i] - chans[1][i];
    } else if (mode == 2) {  // right/side: left = side + right
      for (uint32_t i = 0; i < blocksize; ++i)
        chans[0][i] = chans[0][i] + chans[1][i];
    } else if (mode == 3) {  // mid/side
      for (uint32_t i = 0; i < blocksize; ++i) {
        int64_t side = chans[1][i];
        int64_t mid = (chans[0][i] << 1) | (side & 1);
        chans[0][i] = (mid + side) >> 1;
        chans[1][i] = (mid - side) >> 1;
      }
    }

    for (uint32_t i = 0; i < blocksize; ++i) {
      int64_t acc = 0;
      for (uint32_t c = 0; c < nch; ++c) acc += chans[c][i];
      mono->push_back(static_cast<float>(acc) * scale /
                      static_cast<float>(nch));
    }
    if (info->total_samples && mono->size() >= info->total_samples) break;
    // Hard decode cap: CONSTANT frames legitimately expand far beyond the
    // compressed byte count (silence), but a crafted stream of back-to-back
    // max-blocksize constant frames could grow the buffers toward an
    // OOM-kill before bad_alloc fires. 2^28 samples (~93 min mono @48 kHz)
    // is far beyond any real corpus item; stop cleanly there.
    if (mono->size() > (size_t(1) << 28)) break;
  }
  if (info->total_samples && mono->size() > info->total_samples)
    mono->resize(static_cast<size_t>(info->total_samples));
  return !mono->empty();
}

}  // namespace c2d_flac
