// Native host feature extractor for describealign-tpu.
//
// Computes the reference's 5 feature streams at 210 fps (semantics of
// describealign.py:545-593: smoothed log energy, zero-crossing rate, 3
// cascaded frequency-band log energies) directly from int16 PCM on the
// host CPU. This exists for the link-aware fast path: the 210fps feature
// matrices are ~40x smaller than the raw PCM, so when the host<->device
// link is the bottleneck it is far cheaper to extract features host-side
// and upload ~12 MB of f32 features than ~250 MB of PCM.
//
// Numerics: PCM values are first rounded to the float16 grid (the
// reference stores PCM as float16), then all accumulation is float32,
// mirroring the numpy/JAX implementations within normal f32 tolerance.
// Plain loops + -O3 -march=native: every hot loop is contiguous and
// auto-vectorizes.

#include <cstdint>
#include <cstring>
#include <cmath>
#include <vector>

namespace {

// round-to-nearest-even float32 -> float16 -> float32 (portable bit math)
inline float f16_grid(float x) {
  uint32_t bits;
  std::memcpy(&bits, &x, 4);
  uint32_t sign = bits & 0x80000000u;
  uint32_t absb = bits & 0x7fffffffu;
  float out;
  if (absb >= 0x47800000u) {                       // overflow -> inf (or nan)
    uint32_t res = (absb > 0x7f800000u) ? (absb | 0x400000u)  // keep nan
                                        : 0x7f800000u;
    res |= sign;
    std::memcpy(&out, &res, 4);
    return out;
  }
  if (absb < 0x38800000u) {                        // subnormal f16 range
    // scale into integer units of 2^-24 and round to nearest even
    float a = std::fabs(x) * 16777216.0f;          // 2^24
    float ri = std::nearbyintf(a);                 // nearest, ties to even
    out = ri / 16777216.0f;
    return sign ? -out : out;
  }
  // normal range: keep 10 mantissa bits, round to nearest even
  uint32_t mant_shift = 13;
  uint32_t lsb = 1u << mant_shift;
  uint32_t rounded = absb + ((lsb >> 1) - 1) + ((absb >> mant_shift) & 1);
  rounded &= ~(lsb - 1);
  rounded |= sign;
  std::memcpy(&out, &rounded, 4);
  return out;
}

// scipy.signal.windows.hann(n+2)[1:-1], normalized to sum 1 (f32 like the
// reference's hann_taps); cosine computed in double like scipy.
std::vector<float> hann_taps(int n_plus_2) {
  int n = n_plus_2 - 2;
  std::vector<float> w(static_cast<size_t>(n));
  for (int i = 0; i < n; ++i) {
    double v = 0.5 - 0.5 * std::cos(2.0 * M_PI * (i + 1) / (n_plus_2 - 1));
    w[static_cast<size_t>(i)] = static_cast<float>(v);
  }
  float s = 0.f;
  for (float v : w) s += v;
  for (float& v : w) v /= s;
  return w;
}

// np.convolve(x, taps, mode='same'): zero-padded, center (t-1)/2.
// Tap-major shift-and-add: each tap contributes one contiguous
// vectorizable pass, so the compiler's auto-vectorizer gets clean loops.
void conv_same(const float* x, int64_t n, const std::vector<float>& taps,
               float* out) {
  int t = static_cast<int>(taps.size());
  int c = (t - 1) / 2;
  for (int64_t i = 0; i < n; ++i) out[i] = 0.f;
  for (int m = 0; m < t; ++m) {
    float w = taps[static_cast<size_t>(m)];
    int64_t lo = (m - c > 0) ? (m - c) : 0;           // i + c - m >= 0
    int64_t hi = (n + m - c < n) ? (n + m - c) : n;   // i + c - m <= n-1
    const float* xs = x + (c - m);
    for (int64_t i = lo; i < hi; ++i) out[i] += w * xs[i];
  }
}

// polyphase hann lowpass + decimate (reference downsample_blur, 568-573):
// out[j] = sum_i conv_same(x[i::ds], taps(ds*blur+2)[i::ds])[j]
// x is trimmed to a multiple of ds; out has n/ds elements.
std::vector<float> downsample_blur(const float* x, int64_t n, int ds,
                                   int blur) {
  int64_t m = n - (n % ds);
  int64_t no = m / ds;
  std::vector<float> out(static_cast<size_t>(no), 0.f);
  std::vector<float> taps = hann_taps(ds * blur + 2);
  std::vector<float> phase(static_cast<size_t>(no));
  std::vector<float> ptaps;
  std::vector<float> conv(static_cast<size_t>(no));
  for (int i = 0; i < ds; ++i) {
    // deinterleave phase i (contiguous for the vectorized conv)
    for (int64_t j = 0; j < no; ++j) phase[static_cast<size_t>(j)] = x[i + ds * j];
    ptaps.clear();
    for (size_t k = static_cast<size_t>(i); k < taps.size();
         k += static_cast<size_t>(ds))
      ptaps.push_back(taps[k]);
    conv_same(phase.data(), no, ptaps, conv.data());
    for (int64_t j = 0; j < no; ++j) out[static_cast<size_t>(j)] += conv[static_cast<size_t>(j)];
  }
  return out;
}

inline float log_comp(float x) { return std::log10(1.f + x) / 2.f; }

}  // namespace

extern "C" {

// Extract all 5 feature streams from int16 PCM.
//   pcm:      (channels, samples) int16, row-major
//   out:      (5, out_stride) float32, caller-zeroed
//   out_lens: per-stream frame counts (5)
// Returns 0 on success.
int extract_features_i16(const int16_t* pcm, int64_t channels,
                         int64_t samples, float* out, int64_t out_stride,
                         int64_t* out_lens) {
  if (channels < 1 || samples < 210) return 1;

  // --- f16-grid PCM (per channel) and channel mean ------------------------
  // int16 -> f16 via a 64K lookup table (exact round-to-nearest-even)
  static float lut[65536];
  static bool lut_init = false;
  if (!lut_init) {
    for (int v = -32768; v < 32768; ++v)
      lut[static_cast<uint16_t>(static_cast<int16_t>(v))] =
          f16_grid(static_cast<float>(v));
    lut_init = true;
  }

  // --- f16-grid squares, shared by energy and (mono) bands -----------------
  // sq[i] = sum_c f16(pcm[c,i])^2; mono[i] = f16(pcm[0,i]) for channels==1
  std::vector<float> mono(channels == 1 ? static_cast<size_t>(samples) : 0);
  std::vector<float> sq(static_cast<size_t>(samples));
  if (channels == 1) {
    const int16_t* p = pcm;
    for (int64_t i = 0; i < samples; ++i) {
      float v = lut[static_cast<uint16_t>(p[i])];
      mono[static_cast<size_t>(i)] = v;
      sq[static_cast<size_t>(i)] = v * v;
    }
  } else {
    for (int64_t i = 0; i < samples; ++i) {
      float v = lut[static_cast<uint16_t>(pcm[i])];
      sq[static_cast<size_t>(i)] = v * v;
    }
    for (int64_t c = 1; c < channels; ++c) {
      const int16_t* p = pcm + c * samples;
      for (int64_t i = 0; i < samples; ++i) {
        float v = lut[static_cast<uint16_t>(p[i])];
        sq[static_cast<size_t>(i)] += v * v;
      }
    }
  }

  // --- energy (reference 545-555) -----------------------------------------
  {
    int64_t n = samples - samples % 105;
    int64_t ne = n / 105;
    std::vector<float> energy(static_cast<size_t>(ne));
    float inv = 1.f / (105.f * static_cast<float>(channels));
    for (int64_t b = 0; b < ne; ++b) {
      const float* p = sq.data() + b * 105;
      float s = 0.f;
      for (int k = 0; k < 105; ++k) s += p[k];
      energy[static_cast<size_t>(b)] = s * inv;
    }
    std::vector<float> smooth(static_cast<size_t>(ne));
    conv_same(energy.data(), ne, hann_taps(15), smooth.data());
    int64_t no = (ne + 1) / 2;
    for (int64_t i = 0; i < no; ++i)
      out[i] = log_comp(smooth[static_cast<size_t>(2 * i)]);
    out_lens[0] = no;
  }

  // --- zero crossings (reference 557-566) ----------------------------------
  {
    int64_t n = samples - samples % 210;
    int64_t nz = n / 210;
    std::vector<float> counts(static_cast<size_t>(nz), 0.f);
    for (int64_t c = 0; c < channels; ++c) {
      const int16_t* p = pcm + c * samples;
      bool prev = false;  // np.diff(..., prepend=False)
      for (int64_t b = 0; b < nz; ++b) {
        int cnt = 0;
        const int16_t* q = p + b * 210;
        for (int k = 0; k < 210; ++k) {
          bool s = q[k] < 0;
          cnt += (s != prev);
          prev = s;
        }
        counts[static_cast<size_t>(b)] += static_cast<float>(cnt);
      }
    }
    if (channels == 1)
      for (float& v : counts) v *= 2.f;
    conv_same(counts.data(), nz, hann_taps(15),
              out + out_stride);
    out_lens[1] = nz;
  }

  // --- freq bands (reference 568-593) --------------------------------------
  {
    int64_t n = samples - samples % 210;
    std::vector<float> arr(static_cast<size_t>(n));
    if (channels == 1) {
      std::memcpy(arr.data(), mono.data(), static_cast<size_t>(n) * 4);
    } else {
      // numpy float16 mean over channels: f16 pairwise sum, then /channels
      // (exact for the power-of-two channel counts in practice)
      for (int64_t i = 0; i < n; ++i) {
        float s = lut[static_cast<uint16_t>(pcm[i])];
        for (int64_t c = 1; c < channels; ++c)
          s = f16_grid(s + lut[static_cast<uint16_t>(pcm[c * samples + i])]);
        arr[static_cast<size_t>(i)] =
            f16_grid(s / static_cast<float>(channels));
      }
    }

    const int downsamples[3] = {5, 7, 6};
    int64_t decimation = 1;
    std::vector<float> cur = std::move(arr);
    for (int stage = 0; stage < 3; ++stage) {
      int ds = downsamples[stage];
      int64_t m = static_cast<int64_t>(cur.size());
      m -= m % ds;
      int64_t nb = m / ds;
      std::vector<float> bottom;
      if (stage < 2) bottom = downsample_blur(cur.data(), m, ds, 3);
      decimation *= ds;
      std::vector<float> band_energy(static_cast<size_t>(nb), 0.f);
      if (stage < 2) {
        for (int i = 0; i < ds; ++i)
          for (int64_t j = 0; j < nb; ++j) {
            float d = cur[static_cast<size_t>(j * ds + i)]
                      - bottom[static_cast<size_t>(j)];
            band_energy[static_cast<size_t>(j)] += d * d;
          }
      } else {
        for (int i = 0; i < ds; ++i)
          for (int64_t j = 0; j < nb; ++j) {
            float d = cur[static_cast<size_t>(j * ds + i)];
            band_energy[static_cast<size_t>(j)] += d * d;
          }
      }
      std::vector<float> band = downsample_blur(
          band_energy.data(), nb, static_cast<int>(210 / decimation), 15);
      float* dst = out + (2 + stage) * out_stride;
      for (size_t j = 0; j < band.size(); ++j)
        dst[j] = log_comp(band[j] / 210.f);
      out_lens[2 + stage] = static_cast<int64_t>(band.size());
      cur = std::move(bottom);
    }
  }
  return 0;
}

}  // extern "C"
