// meraudio: native audio frontend for mertools_tpu.
//
// Replaces the reference's ffmpeg invocation for audio demux/resample
// (MERBench/toolkit/utils/functions.py:269-277 runs `ffmpeg ... -ar 16000
// -ac 1`) for the WAV path: RIFF/WAVE parsing (PCM 16/24/32-bit and IEEE
// float), mono mixdown, and a polyphase windowed-sinc resampler to 16 kHz.
// Exposed as a C ABI consumed from Python via ctypes
// (mertools_tpu/io/wav.py), with a numpy/scipy fallback when the shared
// library is absent.
//
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cmath>
#include <vector>
#include <algorithm>

namespace {

struct WavInfo {
  uint16_t format = 0;       // 1 = PCM, 3 = IEEE float
  uint16_t channels = 0;
  uint32_t sample_rate = 0;
  uint16_t bits = 0;
  const uint8_t* data = nullptr;
  size_t data_bytes = 0;
};

bool parse_wav(const uint8_t* buf, size_t n, WavInfo* info) {
  if (n < 44 || memcmp(buf, "RIFF", 4) != 0 || memcmp(buf + 8, "WAVE", 4) != 0)
    return false;
  size_t pos = 12;
  bool have_fmt = false;
  while (pos + 8 <= n) {
    const char* id = reinterpret_cast<const char*>(buf + pos);
    uint32_t sz;
    memcpy(&sz, buf + pos + 4, 4);
    pos += 8;
    if (pos + sz > n) sz = static_cast<uint32_t>(n - pos);
    if (memcmp(id, "fmt ", 4) == 0 && sz >= 16) {
      memcpy(&info->format, buf + pos, 2);
      memcpy(&info->channels, buf + pos + 2, 2);
      memcpy(&info->sample_rate, buf + pos + 4, 4);
      memcpy(&info->bits, buf + pos + 14, 2);
      if (info->format == 0xFFFE && sz >= 40) {  // WAVE_FORMAT_EXTENSIBLE
        uint16_t sub;
        memcpy(&sub, buf + pos + 24, 2);
        info->format = sub;
      }
      have_fmt = true;
    } else if (memcmp(id, "data", 4) == 0) {
      info->data = buf + pos;
      info->data_bytes = sz;
    }
    pos += sz + (sz & 1);  // chunks are word-aligned
  }
  return have_fmt && info->data != nullptr && info->channels > 0;
}

// decode interleaved samples -> mono float32 (mean over channels)
std::vector<float> decode_mono(const WavInfo& w) {
  const size_t bytes_per = w.bits / 8;
  const size_t frames = w.data_bytes / (bytes_per * w.channels);
  std::vector<float> out(frames);
  const uint8_t* p = w.data;
  const float inv_ch = 1.0f / static_cast<float>(w.channels);
  for (size_t f = 0; f < frames; ++f) {
    float acc = 0.0f;
    for (unsigned c = 0; c < w.channels; ++c) {
      const uint8_t* s = p + (f * w.channels + c) * bytes_per;
      float v = 0.0f;
      if (w.format == 3 && w.bits == 32) {
        float fv;
        memcpy(&fv, s, 4);
        v = fv;
      } else if (w.format == 3 && w.bits == 64) {
        double dv;
        memcpy(&dv, s, 8);
        v = static_cast<float>(dv);
      } else if (w.bits == 16) {
        int16_t iv;
        memcpy(&iv, s, 2);
        v = iv / 32768.0f;
      } else if (w.bits == 24) {
        int32_t iv = (s[0] << 8) | (s[1] << 16) | (s[2] << 24);
        v = (iv >> 8) / 8388608.0f;
      } else if (w.bits == 32) {
        int32_t iv;
        memcpy(&iv, s, 4);
        v = iv / 2147483648.0f;
      } else if (w.bits == 8) {
        v = (s[0] - 128) / 128.0f;
      }
      acc += v;
    }
    out[f] = acc * inv_ch;
  }
  return out;
}

double bessel_i0(double x) {
  // series expansion; converges fast for the beta range we use
  double sum = 1.0, term = 1.0;
  for (int k = 1; k < 64; ++k) {
    term *= (x / (2.0 * k)) * (x / (2.0 * k));
    sum += term;
    if (term < 1e-16 * sum) break;
  }
  return sum;
}

uint64_t gcd_u64(uint64_t a, uint64_t b) { return b == 0 ? a : gcd_u64(b, a % b); }

// polyphase rational resampler with a Kaiser-windowed sinc prototype
std::vector<float> resample(const std::vector<float>& in, int sr_in, int sr_out) {
  if (sr_in == sr_out || in.empty()) return in;
  const uint64_t g = gcd_u64(sr_in, sr_out);
  const int64_t L = sr_out / g, M = sr_in / g;
  const double cutoff = 0.5 * std::min(1.0, static_cast<double>(L) / M);
  const int taps_per_phase = 32;
  const int64_t half = static_cast<int64_t>(taps_per_phase) * L / 2;
  const double beta = 8.6;  // ~90 dB stopband
  const double i0b = bessel_i0(beta);

  // prototype low-pass h[n], length 2*half+1, gain L
  std::vector<double> h(2 * half + 1);
  for (int64_t i = -half; i <= half; ++i) {
    const double t = static_cast<double>(i) / L;
    const double x = 2.0 * cutoff * t;
    const double sinc = (i == 0) ? 2.0 * cutoff
                                 : std::sin(M_PI * x) / (M_PI * t);
    const double w = static_cast<double>(i) / half;
    const double kaiser = bessel_i0(beta * std::sqrt(std::max(0.0, 1.0 - w * w))) / i0b;
    h[i + half] = sinc * kaiser;
  }

  const int64_t n_in = static_cast<int64_t>(in.size());
  const int64_t n_out = (n_in * L + M - 1) / M;
  std::vector<float> out(n_out);
  for (int64_t j = 0; j < n_out; ++j) {
    // output j corresponds to input time j*M/L
    const int64_t num = j * M;
    const int64_t n0 = num / L;          // integer input index
    const int64_t phase = num % L;       // fractional phase in [0, L)
    double acc = 0.0;
    // h index for input sample n0 - k is (k*L + phase) offset from center
    for (int64_t k = -taps_per_phase / 2; k <= taps_per_phase / 2; ++k) {
      const int64_t n_idx = n0 - k;
      if (n_idx < 0 || n_idx >= n_in) continue;
      const int64_t h_idx = half + k * L + phase;
      if (h_idx < 0 || h_idx > 2 * half) continue;
      acc += static_cast<double>(in[n_idx]) * h[h_idx];
    }
    out[j] = static_cast<float>(acc);
  }
  return out;
}

}  // namespace

extern "C" {

// Read a WAV file -> mono float32. Caller frees with mer_free.
// Returns 0 on success, negative error codes otherwise.
int mer_read_wav(const char* path, float** out, int64_t* n_samples,
                 int* sample_rate) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  fseek(f, 0, SEEK_END);
  long sz = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> buf(sz);
  if (fread(buf.data(), 1, sz, f) != static_cast<size_t>(sz)) {
    fclose(f);
    return -2;
  }
  fclose(f);

  WavInfo info;
  if (!parse_wav(buf.data(), buf.size(), &info)) return -3;
  std::vector<float> mono = decode_mono(info);
  float* mem = static_cast<float*>(malloc(mono.size() * sizeof(float)));
  if (!mem) return -4;
  memcpy(mem, mono.data(), mono.size() * sizeof(float));
  *out = mem;
  *n_samples = static_cast<int64_t>(mono.size());
  *sample_rate = static_cast<int>(info.sample_rate);
  return 0;
}

// Resample mono float32. Caller frees with mer_free.
int mer_resample(const float* in, int64_t n_in, int sr_in, int sr_out,
                 float** out, int64_t* n_out) {
  if (n_in < 0 || sr_in <= 0 || sr_out <= 0) return -1;
  std::vector<float> v(in, in + n_in);
  std::vector<float> r = resample(v, sr_in, sr_out);
  float* mem = static_cast<float*>(malloc(r.size() * sizeof(float)));
  if (!mem) return -4;
  memcpy(mem, r.data(), r.size() * sizeof(float));
  *out = mem;
  *n_out = static_cast<int64_t>(r.size());
  return 0;
}

void mer_free(float* p) { free(p); }

}  // extern "C"
