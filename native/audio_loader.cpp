// Native audio loader: WAV decode + polyphase resample + threaded batching.
//
// The reference's data pipeline leans on librosa/torchaudio C extensions for
// decode/resample (reference models/audio_encoder.py:87-131,
// data/dataset.py:208-210); this is the TPU-framework equivalent: a small
// C++ library driving the host-side hot path so Python never touches sample
// loops. Exposed as a C ABI consumed via ctypes
// (clap2diffusion_tpu/utils/native_audio.py), with a pure-numpy fallback.
//
// Build: make -C native   (g++ -O3 -shared, no external dependencies)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <numeric>
#include <string>
#include <thread>
#include <vector>

#include <dlfcn.h>

#include "flac_decoder.h"

namespace {

struct Wav {
  std::vector<float> samples;  // mono-averaged
  int sample_rate = 0;
};

bool read_u32(FILE* f, uint32_t* v) { return fread(v, 4, 1, f) == 1; }

// Minimal RIFF/WAVE reader: PCM 8/16/24/32-bit and IEEE float32/64.
bool load_wav(const char* path, Wav* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  char hdr[12];
  if (fread(hdr, 1, 12, f) != 12 || memcmp(hdr, "RIFF", 4) ||
      memcmp(hdr + 8, "WAVE", 4)) {
    fclose(f);
    return false;
  }
  uint16_t fmt = 0, channels = 0, bits = 0;
  uint32_t sr = 0;
  std::vector<uint8_t> data;
  char cid[4];
  uint32_t size;
  while (fread(cid, 1, 4, f) == 4 && read_u32(f, &size)) {
    long next = ftell(f) + size + (size & 1);
    if (!memcmp(cid, "fmt ", 4)) {
      uint16_t block_align, tmp16;
      uint32_t byte_rate;
      fread(&fmt, 2, 1, f);
      fread(&channels, 2, 1, f);
      fread(&sr, 4, 1, f);
      fread(&byte_rate, 4, 1, f);
      fread(&block_align, 2, 1, f);
      fread(&bits, 2, 1, f);
      (void)tmp16;
    } else if (!memcmp(cid, "data", 4)) {
      data.resize(size);
      if (fread(data.data(), 1, size, f) != size) {
        fclose(f);
        return false;
      }
    }
    if (fseek(f, next, SEEK_SET) != 0) break;
  }
  fclose(f);
  if (!sr || !channels || data.empty()) return false;

  size_t frames = 0;
  std::vector<float> interleaved;
  if (fmt == 3 && bits == 32) {
    frames = data.size() / 4 / channels;
    interleaved.assign(reinterpret_cast<float*>(data.data()),
                       reinterpret_cast<float*>(data.data()) + frames * channels);
  } else if (fmt == 1 || fmt == 0xFFFE) {
    if (bits == 16) {
      frames = data.size() / 2 / channels;
      auto* p = reinterpret_cast<int16_t*>(data.data());
      interleaved.resize(frames * channels);
      for (size_t i = 0; i < interleaved.size(); ++i)
        interleaved[i] = p[i] / 32768.f;
    } else if (bits == 32) {
      frames = data.size() / 4 / channels;
      auto* p = reinterpret_cast<int32_t*>(data.data());
      interleaved.resize(frames * channels);
      for (size_t i = 0; i < interleaved.size(); ++i)
        interleaved[i] = static_cast<float>(p[i] / 2147483648.0);
    } else if (bits == 24) {
      frames = data.size() / 3 / channels;
      interleaved.resize(frames * channels);
      for (size_t i = 0; i < interleaved.size(); ++i) {
        int32_t v = data[3 * i] | (data[3 * i + 1] << 8) | (data[3 * i + 2] << 16);
        if (v >= (1 << 23)) v -= (1 << 24);
        interleaved[i] = v / 8388608.f;
      }
    } else if (bits == 8) {
      frames = data.size() / channels;
      interleaved.resize(frames * channels);
      for (size_t i = 0; i < interleaved.size(); ++i)
        interleaved[i] = (data[i] - 128) / 128.f;
    } else {
      return false;
    }
  } else {
    return false;
  }

  out->sample_rate = static_cast<int>(sr);
  out->samples.resize(frames);
  if (channels == 1) {
    out->samples = std::move(interleaved);
  } else {
    for (size_t i = 0; i < frames; ++i) {
      float acc = 0.f;
      for (int c = 0; c < channels; ++c) acc += interleaved[i * channels + c];
      out->samples[i] = acc / channels;
    }
  }
  return true;
}

double bessel_i0(double x) {
  double sum = 1.0, term = 1.0;
  for (int k = 1; k < 32; ++k) {
    term *= (x / (2.0 * k)) * (x / (2.0 * k));
    sum += term;
    if (term < 1e-16 * sum) break;
  }
  return sum;
}

uint64_t gcd_u(uint64_t a, uint64_t b) { return b ? gcd_u(b, a % b) : a; }

// Windowed-sinc polyphase resampler (kaiser beta 8.555), mirroring the
// Python fallback in utils/audio_io.py.
std::vector<float> resample(const std::vector<float>& x, int sr_in, int sr_out) {
  if (sr_in == sr_out) return x;
  uint64_t g = gcd_u(sr_in, sr_out);
  int up = static_cast<int>(sr_out / g), down = static_cast<int>(sr_in / g);
  int per_phase = std::max(up, down);
  const int num_zeros = 16;
  int half = num_zeros * per_phase;
  double cutoff = 1.0 / std::max(up, down);
  double beta = 8.555;
  std::vector<double> h(2 * half + 1);
  double i0b = bessel_i0(beta);
  for (int i = 0; i <= 2 * half; ++i) {
    // taps at integer positions of the upsampled grid (scipy convention)
    double t = static_cast<double>(i - half);
    double sinc = (t == 0.0) ? 1.0 : std::sin(M_PI * cutoff * t) / (M_PI * cutoff * t);
    double w = (2.0 * i) / (2.0 * half) - 1.0;  // np.kaiser window position
    double kais = bessel_i0(beta * std::sqrt(std::max(0.0, 1.0 - w * w))) / i0b;
    h[i] = cutoff * sinc * kais * up;
  }
  size_t n_out = static_cast<size_t>(
      std::ceil(static_cast<double>(x.size()) * up / down));
  std::vector<float> y(n_out, 0.f);
  // polyphase: out[m] = sum_k h[phase + k*up] * x[base - k]
  for (size_t m = 0; m < n_out; ++m) {
    int64_t pos = static_cast<int64_t>(m) * down;  // index in upsampled grid
    int64_t center = pos;                          // filter centered at pos
    double acc = 0.0;
    // taps where (center + half - j) % up == 0
    int64_t j_lo = center - half, j_hi = center + half;
    int64_t first = j_lo + ((up - (j_lo % up) % up) % up);
    for (int64_t j = first; j <= j_hi; j += up) {
      int64_t xi = j / up;
      if (xi < 0 || xi >= static_cast<int64_t>(x.size())) continue;
      acc += h[j - j_lo] * x[xi];
    }
    y[m] = static_cast<float>(acc);
  }
  return y;
}

// FLAC decode via native/flac_decoder.h (mono-averaged, like the WAV path).
bool load_flac(const char* path, Wav* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  fseek(f, 0, SEEK_END);
  long n = ftell(f);
  fseek(f, 0, SEEK_SET);
  if (n <= 0) {
    fclose(f);
    return false;
  }
  std::vector<uint8_t> bytes(static_cast<size_t>(n));
  size_t got = fread(bytes.data(), 1, bytes.size(), f);
  fclose(f);
  if (got != bytes.size()) return false;
  c2d_flac::StreamInfo si;
  if (!c2d_flac::decode_stream(bytes.data(), bytes.size(), &si, &out->samples))
    return false;
  out->sample_rate = static_cast<int>(si.sample_rate);
  return true;
}

// MP3 decode through the system codec (libmpg123), loaded lazily with
// dlopen so the library stays dependency-free when mp3 support is not
// needed. Mirrors how the reference reaches mp3 via librosa -> audioread
// -> system decoders (reference scripts/prepare_data.py:16-31).
struct Mpg123Api {
  void* lib = nullptr;
  int (*init)() = nullptr;
  void* (*make)(const char*, int*) = nullptr;
  int (*open)(void*, const char*) = nullptr;
  int (*getformat)(void*, long*, int*, int*) = nullptr;
  int (*format_none)(void*) = nullptr;
  int (*format)(void*, long, int, int) = nullptr;
  int (*read)(void*, unsigned char*, size_t, size_t*) = nullptr;
  int (*close)(void*) = nullptr;
  void (*del)(void*) = nullptr;
  bool ok = false;
};

const Mpg123Api& mpg123_api() {
  static Mpg123Api api = [] {
    Mpg123Api a;
    a.lib = dlopen("libmpg123.so.0", RTLD_NOW | RTLD_LOCAL);
    if (!a.lib) a.lib = dlopen("libmpg123.so", RTLD_NOW | RTLD_LOCAL);
    if (!a.lib) return a;
    a.init = reinterpret_cast<int (*)()>(dlsym(a.lib, "mpg123_init"));
    a.make = reinterpret_cast<void* (*)(const char*, int*)>(
        dlsym(a.lib, "mpg123_new"));
    a.open = reinterpret_cast<int (*)(void*, const char*)>(
        dlsym(a.lib, "mpg123_open"));
    a.getformat = reinterpret_cast<int (*)(void*, long*, int*, int*)>(
        dlsym(a.lib, "mpg123_getformat"));
    a.format_none =
        reinterpret_cast<int (*)(void*)>(dlsym(a.lib, "mpg123_format_none"));
    a.format = reinterpret_cast<int (*)(void*, long, int, int)>(
        dlsym(a.lib, "mpg123_format"));
    a.read = reinterpret_cast<int (*)(void*, unsigned char*, size_t, size_t*)>(
        dlsym(a.lib, "mpg123_read"));
    a.close = reinterpret_cast<int (*)(void*)>(dlsym(a.lib, "mpg123_close"));
    a.del = reinterpret_cast<void (*)(void*)>(dlsym(a.lib, "mpg123_delete"));
    a.ok = a.init && a.make && a.open && a.getformat && a.format_none &&
           a.format && a.read && a.close && a.del && a.init() == 0;
    return a;
  }();
  return api;
}

// mpg123's default (and guaranteed) output encoding: 16-bit signed.
constexpr int kMpg123EncSigned16 = 0xD0;
constexpr int kMpg123Done = -12;
constexpr int kMpg123NewFormat = -11;

bool load_mp3(const char* path, Wav* out) {
  const Mpg123Api& m = mpg123_api();
  if (!m.ok) return false;
  int err = 0;
  void* h = m.make(nullptr, &err);
  if (!h) return false;
  bool good = false;
  long rate = 0;
  int channels = 0, enc = 0;
  if (m.open(h, path) == 0 && m.getformat(h, &rate, &channels, &enc) == 0 &&
      rate > 0 && channels > 0) {
    // pin s16 at the stream's own rate/channels so the byte layout is
    // unambiguous across libmpg123 builds
    m.format_none(h);
    if (m.format(h, rate, channels, kMpg123EncSigned16) == 0) {
      std::vector<int16_t> interleaved;
      std::vector<unsigned char> buf(1 << 16);
      for (;;) {
        size_t done = 0;
        int rc = m.read(h, buf.data(), buf.size(), &done);
        if (done) {
          const int16_t* p = reinterpret_cast<const int16_t*>(buf.data());
          interleaved.insert(interleaved.end(), p, p + done / 2);
        }
        if (rc == kMpg123Done) {
          good = !interleaved.empty();
          break;
        }
        if (rc == kMpg123NewFormat) {
          if (m.getformat(h, &rate, &channels, &enc) != 0) break;
          continue;
        }
        if (rc != 0) break;
      }
      if (good) {
        size_t frames = interleaved.size() / channels;
        out->sample_rate = static_cast<int>(rate);
        out->samples.resize(frames);
        for (size_t i = 0; i < frames; ++i) {
          float acc = 0.f;
          for (int c = 0; c < channels; ++c)
            acc += interleaved[i * channels + c] / 32768.f;
          out->samples[i] = acc / channels;
        }
      }
    }
    m.close(h);
  }
  m.del(h);
  return good;
}

bool looks_like_mp3(const unsigned char m4[4]) {
  if (!memcmp(m4, "ID3", 3)) return true;  // ID3v2-tagged stream
  return m4[0] == 0xFF && (m4[1] & 0xE0) == 0xE0;  // bare frame sync
}

// Container sniffing by magic bytes (extension-agnostic, like libsndfile).
bool load_any(const char* path, Wav* out) {
  unsigned char magic[4] = {0};
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  size_t got = fread(magic, 1, 4, f);
  fclose(f);
  if (got != 4) return false;
  if (!memcmp(magic, "fLaC", 4)) return load_flac(path, out);
  if (!memcmp(magic, "RIFF", 4)) return load_wav(path, out);
  if (looks_like_mp3(magic)) return load_mp3(path, out);
  return load_wav(path, out);
}

// load_any that can never throw across the C ABI (a bad_alloc or
// length_error from a corrupt stream must fail the FILE, not the process).
bool load_any_noexcept(const char* path, Wav* out) noexcept {
  try {
    return load_any(path, out);
  } catch (...) {
    return false;
  }
}

void prepare_one(const char* path, int target_sr, int target_len, float peak_norm,
                 float* out, int* status) {
  Wav wav;
  if (!load_any_noexcept(path, &wav)) {
    std::fill(out, out + target_len, 0.f);
    *status = 1;  // zero-fallback, mirroring the reference's dataset behavior
    return;
  }
  std::vector<float> x = std::move(wav.samples);
  if (peak_norm > 0.f) {
    float peak = 0.f;
    for (float v : x) peak = std::max(peak, std::fabs(v));
    if (peak > 0.f)
      for (float& v : x) v /= peak;
  }
  if (wav.sample_rate != target_sr) x = resample(x, wav.sample_rate, target_sr);
  int n = static_cast<int>(std::min<size_t>(x.size(), target_len));
  std::copy(x.begin(), x.begin() + n, out);
  std::fill(out + n, out + target_len, 0.f);
  *status = 0;
}

}  // namespace

extern "C" {

// Decode+resample+pad one file into out[target_len]. Returns 0 on success,
// 1 on zero-fallback.
int c2d_load_audio(const char* path, int target_sr, int target_len,
                   int peak_norm, float* out) {
  int status = 0;
  prepare_one(path, target_sr, target_len, peak_norm ? 1.f : 0.f, out, &status);
  return status;
}

// Threaded batch: paths are '\n'-joined. out is [n, target_len] row-major.
// statuses[i] = 0 ok / 1 fallback. Returns number of fallbacks.
int c2d_load_audio_batch(const char* joined_paths, int n, int target_sr,
                         int target_len, int peak_norm, int num_threads,
                         float* out, int* statuses) {
  std::vector<std::string> paths;
  {
    const char* p = joined_paths;
    for (int i = 0; i < n; ++i) {
      const char* e = strchr(p, '\n');
      if (!e) e = p + strlen(p);
      paths.emplace_back(p, e - p);
      p = (*e) ? e + 1 : e;
    }
  }
  int threads = std::max(1, std::min(num_threads, n));
  std::vector<std::thread> pool;
  for (int t = 0; t < threads; ++t) {
    pool.emplace_back([&, t]() {
      for (int i = t; i < n; i += threads) {
        prepare_one(paths[i].c_str(), target_sr, target_len,
                    peak_norm ? 1.f : 0.f, out + static_cast<size_t>(i) * target_len,
                    statuses + i);
      }
    });
  }
  for (auto& th : pool) th.join();
  return std::accumulate(statuses, statuses + n, 0);
}

// Decode one file (WAV/FLAC/MP3, sniffed by magic) at its NATIVE sample
// rate, mono-averaged float32. Writes up to `cap` samples into `out`,
// stores the sample rate in *sr, and returns the TOTAL decoded length
// (callers size a buffer with cap=0 then call again), or -1 on decode
// failure. Prefer c2d_decode_audio_alloc — it decodes once, not twice.
long long c2d_decode_audio(const char* path, float* out, long long cap,
                           int* sr) {
  Wav wav;
  if (!load_any_noexcept(path, &wav)) return -1;
  *sr = wav.sample_rate;
  long long n = static_cast<long long>(wav.samples.size());
  long long w = std::min(n, std::max<long long>(cap, 0));
  if (out && w > 0) std::copy(wav.samples.begin(), wav.samples.begin() + w, out);
  return n;
}

// Single-pass variant: decodes once into a malloc'd buffer the caller
// releases with c2d_free. Returns the sample count, or -1 on failure.
long long c2d_decode_audio_alloc(const char* path, float** out, int* sr) {
  Wav wav;
  if (!load_any_noexcept(path, &wav)) return -1;
  float* buf = static_cast<float*>(malloc(wav.samples.size() * sizeof(float)));
  if (!buf) return -1;
  std::copy(wav.samples.begin(), wav.samples.end(), buf);
  *out = buf;
  *sr = wav.sample_rate;
  return static_cast<long long>(wav.samples.size());
}

void c2d_free(float* p) { free(p); }

// Version tag for ABI sanity checks from Python. 2 = FLAC decode +
// c2d_decode_audio; 3 = mp3 backend + c2d_decode_audio_alloc/c2d_free.
int c2d_abi_version() { return 3; }

}  // extern "C"
