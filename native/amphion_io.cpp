// amphion_io: native data-loading core (WAV decode + polyphase resample +
// batched segment assembly) exposed over a C ABI for ctypes.
//
// The reference delegates audio IO to libsndfile/librosa (C libraries
// under Python); this is the equivalent native component for the TPU
// framework's data path (reference entry: `utils/audio.py` load front
// door). Single-pass decode -> mono float32 -> Kaiser-windowed-sinc
// polyphase resampling, matching scipy.signal.resample_poly semantics
// closely enough for feature parity (tolerance-tested in
// tests/test_native_io.py).
//
// Build: make -C native   (produces libamphion_io.so)

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cmath>
#include <vector>
#include <thread>
#include <atomic>
#include <algorithm>
#include <map>
#include <mutex>

namespace {

struct WavData {
  std::vector<float> samples;  // mono
  int sample_rate = 0;
};

// ---------------------------------------------------------------------------
// WAV parsing (RIFF PCM 8/16/24/32-bit + IEEE float32/64)
// ---------------------------------------------------------------------------

bool read_wav(const char* path, WavData* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  char riff[4], wave[4];
  uint32_t riff_size;
  if (std::fread(riff, 1, 4, f) != 4 || std::memcmp(riff, "RIFF", 4) ||
      std::fread(&riff_size, 4, 1, f) != 1 ||
      std::fread(wave, 1, 4, f) != 4 || std::memcmp(wave, "WAVE", 4)) {
    std::fclose(f);
    return false;
  }
  uint16_t format = 0, channels = 0, bits = 0;
  uint32_t sample_rate = 0;
  bool got_fmt = false;
  while (true) {
    char id[4];
    uint32_t size;
    if (std::fread(id, 1, 4, f) != 4 || std::fread(&size, 4, 1, f) != 1) break;
    if (!std::memcmp(id, "fmt ", 4)) {
      uint8_t buf[40];
      uint32_t n = std::min<uint32_t>(size, sizeof(buf));
      if (std::fread(buf, 1, n, f) != n) break;
      if (size > n) std::fseek(f, size - n, SEEK_CUR);
      format = buf[0] | (buf[1] << 8);
      channels = buf[2] | (buf[3] << 8);
      std::memcpy(&sample_rate, buf + 4, 4);
      bits = buf[14] | (buf[15] << 8);
      if (format == 0xFFFE && size >= 40)  // WAVE_FORMAT_EXTENSIBLE
        format = buf[24] | (buf[25] << 8);
      got_fmt = true;
    } else if (!std::memcmp(id, "data", 4)) {
      if (!got_fmt || channels == 0) break;
      std::vector<uint8_t> raw(size);
      size_t got = std::fread(raw.data(), 1, size, f);
      raw.resize(got);
      std::fclose(f);
      const size_t bytes_per = bits / 8;
      if (bytes_per == 0) return false;
      const size_t frames = raw.size() / (bytes_per * channels);
      out->samples.resize(frames);
      out->sample_rate = static_cast<int>(sample_rate);
      const float inv16 = 1.0f / 32768.0f;
      const float inv24 = 1.0f / 8388608.0f;
      const float inv32 = 1.0f / 2147483648.0f;
      // fast paths for the common layouts (vectorizable tight loops)
      if (format != 3 && bits == 16 && channels == 1) {
        const int16_t* src = reinterpret_cast<const int16_t*>(raw.data());
        for (size_t i = 0; i < frames; ++i)
          out->samples[i] = src[i] * inv16;
        return true;
      }
      if (format != 3 && bits == 16 && channels == 2) {
        const int16_t* src = reinterpret_cast<const int16_t*>(raw.data());
        for (size_t i = 0; i < frames; ++i)
          out->samples[i] =
              (src[2 * i] + src[2 * i + 1]) * (0.5f * inv16);
        return true;
      }
      if (format == 3 && bits == 32 && channels == 1) {
        std::memcpy(out->samples.data(), raw.data(), frames * 4);
        return true;
      }
      for (size_t i = 0; i < frames; ++i) {
        float acc = 0.0f;
        for (int c = 0; c < channels; ++c) {
          const uint8_t* p = raw.data() + (i * channels + c) * bytes_per;
          float v = 0.0f;
          if (format == 3) {  // IEEE float
            if (bits == 32) {
              float s;
              std::memcpy(&s, p, 4);
              v = s;
            } else if (bits == 64) {
              double s;
              std::memcpy(&s, p, 8);
              v = static_cast<float>(s);
            }
          } else {  // PCM
            if (bits == 16) {
              int16_t s;
              std::memcpy(&s, p, 2);
              v = s * inv16;
            } else if (bits == 24) {
              int32_t s = (p[0] << 8) | (p[1] << 16) | (p[2] << 24);
              v = (s >> 8) * inv24;
            } else if (bits == 32) {
              int32_t s;
              std::memcpy(&s, p, 4);
              v = s * inv32;
            } else if (bits == 8) {
              v = (static_cast<int>(p[0]) - 128) / 128.0f;
            }
          }
          acc += v;
        }
        out->samples[i] = acc / channels;
      }
      return true;
    } else {
      std::fseek(f, size + (size & 1), SEEK_CUR);
    }
  }
  std::fclose(f);
  return false;
}

// ---------------------------------------------------------------------------
// Kaiser-windowed-sinc polyphase resampler (resample_poly semantics:
// upsample by L, FIR low-pass at min(pi/L, pi/M), downsample by M;
// default half-window 10 taps per zero crossing, beta 5.0 — scipy's
// kaiser_best-ish quality at kaiser_fast cost)
// ---------------------------------------------------------------------------

double bessel_i0(double x) {
  double sum = 1.0, term = 1.0;
  for (int k = 1; k < 32; ++k) {
    term *= (x / (2.0 * k)) * (x / (2.0 * k));
    sum += term;
    if (term < 1e-16 * sum) break;
  }
  return sum;
}

uint64_t gcd_u64(uint64_t a, uint64_t b) { return b ? gcd_u64(b, a % b) : a; }

// FIR design cache: the kernel depends only on (up, down); batch loads hit
// the same rate pair for every file.
struct FirCache {
  std::mutex mu;
  std::map<std::pair<int, int>, std::vector<double>> filters;
};
FirCache& fir_cache() {
  static FirCache c;
  return c;
}

const std::vector<double>& design_fir(int up, int down) {
  auto& cache = fir_cache();
  std::lock_guard<std::mutex> lock(cache.mu);
  auto key = std::make_pair(up, down);
  auto it = cache.filters.find(key);
  if (it != cache.filters.end()) return it->second;
  // cutoff at min(1/up, 1/down) of Nyquist, 10 taps per crossing,
  // Kaiser beta 5.0 (scipy resample_poly default window)
  const int max_rate = std::max(up, down);
  const double f_c = 1.0 / max_rate;  // normalized (1 = Nyquist)
  const int half_len = 10 * max_rate;  // scipy default
  const int n_taps = 2 * half_len + 1;
  const double beta = 5.0;
  std::vector<double> h(n_taps);
  const double i0b = bessel_i0(beta);
  for (int i = 0; i < n_taps; ++i) {
    const double m = i - half_len;
    const double t = m * M_PI * f_c;
    const double sinc = (m == 0) ? 1.0 : std::sin(t) / t;
    const double r = 2.0 * i / (n_taps - 1) - 1.0;
    const double win = bessel_i0(beta * std::sqrt(std::max(0.0, 1.0 - r * r))) / i0b;
    h[i] = f_c * sinc * win * up;
  }
  return cache.filters.emplace(key, std::move(h)).first->second;
}

std::vector<float> resample_f32(const std::vector<float>& x, int orig_sr,
                                int target_sr) {
  if (orig_sr == target_sr || x.empty()) return x;
  const uint64_t g = gcd_u64(orig_sr, target_sr);
  const int up = static_cast<int>(target_sr / g);
  const int down = static_cast<int>(orig_sr / g);
  const std::vector<double>& h = design_fir(up, down);
  const int half_len = (static_cast<int>(h.size()) - 1) / 2;
  const size_t n_in = x.size();
  const size_t n_out = (n_in * static_cast<uint64_t>(up) + down - 1) / down;
  std::vector<float> y(n_out, 0.0f);
  // polyphase: y[j] = sum_k h[j*down - k*up + half_len] * x[k]  (zero-phase:
  // scipy compensates the group delay by centering the filter)
  for (size_t j = 0; j < n_out; ++j) {
    const int64_t t0 = static_cast<int64_t>(j) * down;  // position in up-domain
    double acc = 0.0;
    // x[k] contributes via tap index t0 - k*up + half_len
    int64_t k_lo = (t0 - half_len + up - 1) / up;   // ceil
    int64_t k_hi = (t0 + half_len) / up;            // floor
    k_lo = std::max<int64_t>(k_lo, 0);
    k_hi = std::min<int64_t>(k_hi, static_cast<int64_t>(n_in) - 1);
    for (int64_t k = k_lo; k <= k_hi; ++k) {
      acc += h[t0 - k * up + half_len] * x[k];
    }
    y[j] = static_cast<float>(acc);
  }
  return y;
}

}  // namespace

extern "C" {

// Parse only the header. Returns 0 on success.
int amphion_wav_info(const char* path, int* sample_rate, int64_t* n_samples) {
  WavData w;  // full decode is cheap relative to IO; keep the API simple
  if (!read_wav(path, &w)) return -1;
  *sample_rate = w.sample_rate;
  *n_samples = static_cast<int64_t>(w.samples.size());
  return 0;
}

// Decode + optional resample into caller buffer (float32, mono).
// target_sr <= 0 keeps the native rate. Returns samples written, or -1.
int64_t amphion_wav_load(const char* path, int target_sr, float* out,
                         int64_t max_len, int* out_sr) {
  WavData w;
  if (!read_wav(path, &w)) return -1;
  std::vector<float>* src = &w.samples;
  std::vector<float> res;
  int sr = w.sample_rate;
  if (target_sr > 0 && target_sr != w.sample_rate) {
    res = resample_f32(w.samples, w.sample_rate, target_sr);
    src = &res;
    sr = target_sr;
  }
  const int64_t n = std::min<int64_t>(src->size(), max_len);
  std::memcpy(out, src->data(), n * sizeof(float));
  if (out_sr) *out_sr = sr;
  return n;
}

// Batched segment loader: for each path decode (+resample), copy
// segment_len samples starting at starts[i] (zero-padded past the end)
// into out[i]. Parallel across files. Returns count of failures.
int amphion_batch_segments(const char** paths, int n, int target_sr,
                           const int64_t* starts, int64_t segment_len,
                           float* out, int n_threads) {
  std::atomic<int> failures{0};
  std::atomic<int> next{0};
  auto worker = [&]() {
    for (int i = next.fetch_add(1); i < n; i = next.fetch_add(1)) {
      float* dst = out + static_cast<int64_t>(i) * segment_len;
      std::memset(dst, 0, segment_len * sizeof(float));
      WavData w;
      if (!read_wav(paths[i], &w)) {
        failures.fetch_add(1);
        continue;
      }
      std::vector<float>* src = &w.samples;
      std::vector<float> res;
      if (target_sr > 0 && target_sr != w.sample_rate) {
        res = resample_f32(w.samples, w.sample_rate, target_sr);
        src = &res;
      }
      const int64_t n_src = static_cast<int64_t>(src->size());
      const int64_t s = std::min<int64_t>(std::max<int64_t>(starts[i], 0),
                                          n_src);
      const int64_t n_copy = std::min<int64_t>(segment_len, n_src - s);
      if (n_copy > 0)
        std::memcpy(dst, src->data() + s, n_copy * sizeof(float));
    }
  };
  const int nt = std::max(1, std::min(n_threads, n));
  std::vector<std::thread> threads;
  threads.reserve(nt);
  for (int t = 0; t < nt; ++t) threads.emplace_back(worker);
  for (auto& th : threads) th.join();
  return failures.load();
}

}  // extern "C"
