// Native audio front-end: WAV decode, polyphase resampling, Kaldi-style
// log-mel fbank. C ABI for ctypes.
//
// TPU-native replacement for the reference's native audio dependency surface
// (SURVEY §2.2): librosa/soxr resampling (reference dataset.py:143-145) and
// the torchaudio Kaldi fbank behind the AST AutoProcessor (dataset.py:146-149).
// The fbank numerics mirror synergy_tpu/data/audio.py (same framing, DC
// offset removal, preemphasis 0.97, periodic=False Hann, 512-pt rFFT, power
// spectrum, 128 Kaldi-mel filters 20Hz..8kHz, log floor 1.1921e-7, pad to
// 1024 frames, (x - mean)/(2*std) normalization); parity is asserted in
// tests/test_runtime.py.
//
// Build: g++ -O3 -std=c++17 -fPIC -shared audio_frontend.cpp -o libaudiofe.so

#include <algorithm>
#include <cmath>
#include <complex>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <map>
#include <memory>
#include <mutex>
#include <numeric>
#include <vector>

namespace {

constexpr int kSampleRate = 16000;
constexpr int kFrameLen = 400;
constexpr int kHop = 160;
constexpr int kFft = 512;
constexpr int kMel = 128;
constexpr int kMaxFrames = 1024;
constexpr double kPreemph = 0.97;
constexpr double kMelFloor = 1.192092955078125e-07;
constexpr double kMean = -4.2677393;
constexpr double kStd = 4.5689974;
constexpr int kVocFft = 2048;
constexpr int kVocHop = 512;

double hz_to_mel(double f) { return 1127.0 * std::log(1.0 + f / 700.0); }

struct Frontend {
  std::vector<double> window;             // 400
  std::vector<double> mel;                // 257 x 128 (dense, for reference)
  // sparse mel: per frequency bin, the short run of nonzero filters
  std::vector<int> mel_start;             // 257
  std::vector<std::vector<double>> mel_vals;  // 257 x run_len
  std::vector<std::complex<double>> tw;   // FFT twiddles
  std::vector<int> bitrev;
  // phase-vocoder tables (n_fft = 2048)
  std::vector<std::complex<double>> tw2048;
  std::vector<int> bitrev2048;
  std::vector<double> window2048;         // numpy.hanning(2048)

  // resampler polyphase banks, cached per (sr_in, sr_out): the Kaiser
  // filter design (8k+ bessel evaluations at 22.05k->16k) used to be redone
  // on EVERY call, and the flat-filter inner loop strode through h by `up`.
  // bank.phase[q] holds the contiguous taps h[q], h[q+up], ... so each
  // output sample is one contiguous dot against the input window.
  struct ResampleBank {
    int up, down, half, taps;
    // float taps (designed in double): the inner dot runs float x float so
    // the compiler can vectorize; output rounding dominates either way
    std::vector<std::vector<float>> phase;      // up x ceil(taps/up)
    std::vector<std::vector<float>> phase_rev;  // reversed: forward-walk dot
  };
  std::mutex bank_mu;
  std::map<uint64_t, std::shared_ptr<ResampleBank>> banks;

  Frontend() {
    window.resize(kFrameLen);
    for (int i = 0; i < kFrameLen; ++i) {
      window[i] = 0.5 - 0.5 * std::cos(2.0 * M_PI * i / (kFrameLen - 1));
    }
    // Kaldi mel filters, triangularized in mel space, norm=None
    int bins = kFft / 2 + 1;
    mel.assign(bins * kMel, 0.0);
    double mel_min = hz_to_mel(20.0);
    double mel_max = hz_to_mel(kSampleRate / 2.0);
    std::vector<double> pts(kMel + 2);
    for (int i = 0; i < kMel + 2; ++i) {
      pts[i] = mel_min + (mel_max - mel_min) * i / (kMel + 1);
    }
    double bin_width = double(kSampleRate) / kFft;
    mel_start.resize(bins);
    mel_vals.resize(bins);
    for (int b = 0; b < bins; ++b) {
      double m = hz_to_mel(bin_width * b);
      int first = -1, last = -1;
      for (int j = 0; j < kMel; ++j) {
        double lo = pts[j], c = pts[j + 1], hi = pts[j + 2];
        double up = (m - lo) / (c - lo);
        double down = (hi - m) / (hi - c);
        double v = std::max(0.0, std::min(up, down));
        mel[b * kMel + j] = v;
        if (v > 0.0) {
          if (first < 0) first = j;
          last = j;
        }
      }
      mel_start[b] = first < 0 ? 0 : first;
      if (first >= 0) {
        mel_vals[b].assign(mel.begin() + b * kMel + first,
                           mel.begin() + b * kMel + last + 1);
      }
    }
    // iterative radix-2 FFT tables for kFft
    bitrev.resize(kFft);
    int log2n = 9;
    for (int i = 0; i < kFft; ++i) {
      int r = 0;
      for (int j = 0; j < log2n; ++j) r |= ((i >> j) & 1) << (log2n - 1 - j);
      bitrev[i] = r;
    }
    tw.resize(kFft / 2);
    for (int i = 0; i < kFft / 2; ++i) {
      tw[i] = std::polar(1.0, -2.0 * M_PI * i / kFft);
    }
    // 2048-pt tables for the phase vocoder
    bitrev2048.resize(kVocFft);
    for (int i = 0; i < kVocFft; ++i) {
      int r = 0;
      for (int j = 0; j < 11; ++j) r |= ((i >> j) & 1) << (10 - j);
      bitrev2048[i] = r;
    }
    tw2048.resize(kVocFft / 2);
    for (int i = 0; i < kVocFft / 2; ++i) {
      tw2048[i] = std::polar(1.0, -2.0 * M_PI * i / kVocFft);
    }
    window2048.resize(kVocFft);
    for (int i = 0; i < kVocFft; ++i) {
      window2048[i] = 0.5 - 0.5 * std::cos(2.0 * M_PI * i / (kVocFft - 1));
    }
  }

  void fft2048(std::complex<double>* a) const {
    for (int i = 0; i < kVocFft; ++i) {
      int r = bitrev2048[i];
      if (i < r) std::swap(a[i], a[r]);
    }
    for (int len = 2; len <= kVocFft; len <<= 1) {
      int half = len >> 1;
      int step = kVocFft / len;
      for (int i = 0; i < kVocFft; i += len) {
        for (int j = 0; j < half; ++j) {
          auto u = a[i + j];
          auto v = a[i + j + half] * tw2048[j * step];
          a[i + j] = u + v;
          a[i + j + half] = u - v;
        }
      }
    }
  }

  void fft512(std::complex<double>* a) const {
    for (int i = 0; i < kFft; ++i) {
      int r = bitrev[i];
      if (i < r) std::swap(a[i], a[r]);
    }
    for (int len = 2; len <= kFft; len <<= 1) {
      int half = len >> 1;
      int step = kFft / len;
      for (int i = 0; i < kFft; i += len) {
        for (int j = 0; j < half; ++j) {
          auto u = a[i + j];
          auto v = a[i + j + half] * tw[j * step];
          a[i + j] = u + v;
          a[i + j + half] = u - v;
        }
      }
    }
  }
};

Frontend* as_fe(void* h) { return static_cast<Frontend*>(h); }

}  // namespace

extern "C" {

void* af_create() { return new Frontend(); }
void af_destroy(void* h) { delete as_fe(h); }

// Mono float32 samples from a PCM/float WAV. Returns sample count (clipped to
// max_samples) or -1 on error; *sr_out receives the sample rate.
int32_t af_read_wav(const char* path, float* out, int32_t max_samples,
                    int32_t* sr_out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  auto rd_u32 = [&](uint32_t* v) { return std::fread(v, 4, 1, f) == 1; };
  auto rd_u16 = [&](uint16_t* v) { return std::fread(v, 2, 1, f) == 1; };
  uint32_t riff, size, wave;
  if (!rd_u32(&riff) || !rd_u32(&size) || !rd_u32(&wave) ||
      riff != 0x46464952u || wave != 0x45564157u) {
    std::fclose(f);
    return -1;
  }
  uint16_t fmt_code = 0, channels = 0, bits = 0;
  uint32_t sr = 0;
  int32_t n_out = -1;
  while (true) {
    uint32_t tag, chunk_size;
    if (!rd_u32(&tag) || !rd_u32(&chunk_size)) break;
    if (tag == 0x20746d66u) {  // "fmt "
      uint16_t block_align;
      uint32_t byte_rate;
      rd_u16(&fmt_code);
      rd_u16(&channels);
      rd_u32(&sr);
      rd_u32(&byte_rate);
      rd_u16(&block_align);
      rd_u16(&bits);
      std::fseek(f, chunk_size - 16, SEEK_CUR);
    } else if (tag == 0x61746164u) {  // "data"
      int bytes_per = bits / 8;
      if (!channels || !bytes_per) break;
      int32_t n_frames = chunk_size / (bytes_per * channels);
      std::vector<uint8_t> raw(chunk_size);
      if (std::fread(raw.data(), 1, chunk_size, f) != chunk_size) break;
      n_out = std::min(n_frames, max_samples);
      for (int32_t i = 0; i < n_out; ++i) {
        double acc = 0.0;
        for (int c = 0; c < channels; ++c) {
          const uint8_t* p = raw.data() + (size_t(i) * channels + c) * bytes_per;
          double v = 0.0;
          if (fmt_code == 3 && bits == 32) {  // IEEE float
            float fv;
            std::memcpy(&fv, p, 4);
            v = fv;
          } else if (bits == 16) {
            int16_t s;
            std::memcpy(&s, p, 2);
            v = s / 32768.0;
          } else if (bits == 32) {
            int32_t s;
            std::memcpy(&s, p, 4);
            v = s / 2147483648.0;
          } else if (bits == 8) {
            v = (p[0] - 128) / 128.0;
          }
          acc += v;
        }
        out[i] = static_cast<float>(acc / channels);
      }
      break;
    } else {
      std::fseek(f, chunk_size + (chunk_size & 1), SEEK_CUR);
    }
  }
  std::fclose(f);
  if (sr_out) *sr_out = static_cast<int32_t>(sr);
  return n_out;
}

// Polyphase resampling with a Kaiser-windowed sinc low-pass (soxr/librosa
// equivalent quality). Returns output length (<= max_out). The filter bank
// is designed once per (sr_in, sr_out) and cached on the Frontend handle.
int32_t af_resample(void* h_, const float* in, int32_t n_in, int32_t sr_in,
                    int32_t sr_out, float* out, int32_t max_out) {
  if (sr_in == sr_out) {
    int32_t n = std::min(n_in, max_out);
    std::memcpy(out, in, n * sizeof(float));
    return n;
  }
  Frontend* fe = as_fe(h_);
  std::shared_ptr<Frontend::ResampleBank> bank;
  const uint64_t key = (uint64_t(uint32_t(sr_in)) << 32) | uint32_t(sr_out);
  {
    std::lock_guard<std::mutex> lock(fe->bank_mu);
    auto it = fe->banks.find(key);
    if (it != fe->banks.end()) bank = it->second;
  }
  if (!bank) {
    bank = std::make_shared<Frontend::ResampleBank>();
    int32_t g = std::gcd(sr_in, sr_out);
    int32_t up = sr_out / g, down = sr_in / g;
    // scipy.signal.resample_poly filter design: half length 10*max(up,down),
    // cutoff 1/max at the upsampled Nyquist, Kaiser beta 5.0, unity DC gain
    int32_t half = 10 * std::max(up, down);
    double cutoff = 0.5 / std::max(up, down);
    double beta = 5.0;
    auto bessel_i0 = [](double x) {
      double s = 1.0, t = 1.0;
      for (int k = 1; k < 32; ++k) {
        t *= (x / (2.0 * k)) * (x / (2.0 * k));
        s += t;
        if (t < 1e-16 * s) break;
      }
      return s;
    };
    int32_t taps = 2 * half + 1;
    std::vector<double> h(taps);
    double i0b = bessel_i0(beta);
    double sum = 0.0;
    for (int32_t i = 0; i < taps; ++i) {
      double t = i - half;
      double sinc = (t == 0.0) ? 2.0 * cutoff
                               : std::sin(2.0 * M_PI * cutoff * t) / (M_PI * t);
      double w = bessel_i0(beta * std::sqrt(std::max(
                     0.0, 1.0 - (t / half) * (t / half)))) / i0b;
      h[i] = sinc * w;
      sum += h[i];
    }
    for (double& v : h) v *= up / sum;  // firwin scale=True, then *up
    bank->up = up;
    bank->down = down;
    bank->half = half;
    bank->taps = taps;
    bank->phase.resize(up);
    bank->phase_rev.resize(up);
    for (int32_t q = 0; q < up; ++q) {
      for (int32_t t = q; t < taps; t += up) {
        bank->phase[q].push_back(static_cast<float>(h[t]));
      }
      bank->phase_rev[q].assign(bank->phase[q].rbegin(),
                                bank->phase[q].rend());
    }
    std::lock_guard<std::mutex> lock(fe->bank_mu);
    fe->banks.emplace(key, bank);
  }
  const int32_t up = bank->up, down = bank->down, half = bank->half;
  int64_t n_out64 = (int64_t(n_in) * up + down - 1) / down;
  int32_t n_out = static_cast<int32_t>(std::min<int64_t>(n_out64, max_out));
  for (int32_t o = 0; o < n_out; ++o) {
    // output o sits at pos = o*down on the up-sampled grid; its taps are the
    // contiguous subfilter phase[q], hitting inputs k_top, k_top-1, ...
    const int64_t pos = int64_t(o) * down;
    const int32_t q = static_cast<int32_t>((pos + half) % up);
    const int64_t k_top = (pos + half - q) / up;
    const std::vector<float>& ph = bank->phase[q];
    const int64_t len = int64_t(ph.size());
    const int64_t j_lo = std::max<int64_t>(0, k_top - (n_in - 1));
    const int64_t j_hi = std::min<int64_t>(len - 1, k_top);
    float acc = 0.0f;
    if (j_lo == 0 && j_hi == len - 1) {
      // bulk case: both operands walk forward contiguously
      const float* src = in + k_top - (len - 1);
      const float* pr = bank->phase_rev[q].data();
      for (int64_t j = 0; j < len; ++j) acc += src[j] * pr[j];
    } else {
      const float* src = in + k_top;
      for (int64_t j = j_lo; j <= j_hi; ++j) acc += src[-j] * ph[j];
    }
    out[o] = acc;
  }
  return n_out;
}

// Waveform -> (max_frames, 128) normalized log-mel fbank.
void af_fbank(void* h, const float* wave, int32_t n, float* out,
              int32_t max_frames, int32_t normalize) {
  Frontend* fe = as_fe(h);
  int32_t nf = (n >= kFrameLen) ? 1 + (n - kFrameLen) / kHop : 0;
  nf = std::min(nf, max_frames);
  std::vector<std::complex<double>> buf(kFft);
  std::vector<double> frame(kFrameLen);
  for (int32_t t = 0; t < nf; ++t) {
    const float* src = wave + int64_t(t) * kHop;
    double mean = 0.0;
    for (int i = 0; i < kFrameLen; ++i) mean += src[i];
    mean /= kFrameLen;
    for (int i = 0; i < kFrameLen; ++i) frame[i] = src[i] - mean;
    for (int i = kFrameLen - 1; i >= 1; --i) {
      frame[i] -= kPreemph * frame[i - 1];
    }
    frame[0] *= 1.0 - kPreemph;
    for (int i = 0; i < kFrameLen; ++i) {
      buf[i] = frame[i] * fe->window[i];
    }
    std::fill(buf.begin() + kFrameLen, buf.end(), 0.0);
    fe->fft512(buf.data());
    float* row = out + int64_t(t) * kMel;
    double acc[kMel] = {0.0};
    for (int b = 0; b <= kFft / 2; ++b) {
      const auto& vals = fe->mel_vals[b];
      if (vals.empty()) continue;
      double p = std::norm(buf[b]);
      double* dst = acc + fe->mel_start[b];
      for (size_t j = 0; j < vals.size(); ++j) dst[j] += p * vals[j];
    }
    for (int j = 0; j < kMel; ++j) {
      row[j] = static_cast<float>(std::log(std::max(acc[j], kMelFloor)));
    }
  }
  for (int32_t t = nf; t < max_frames; ++t) {
    std::memset(out + int64_t(t) * kMel, 0, kMel * sizeof(float));
  }
  if (normalize) {
    int64_t total = int64_t(max_frames) * kMel;
    for (int64_t i = 0; i < total; ++i) {
      out[i] = static_cast<float>((out[i] - kMean) / (2.0 * kStd));
    }
  }
}

// Phase-vocoder time stretch (n_fft=2048, hop=512): the same algorithm as
// synergy_tpu/data/audio.py stretch_data (STFT -> magnitude interpolation +
// phase accumulation -> overlap-add iSTFT), in double internally. Real
// frames are packed in PAIRS into one complex FFT (z = x1 + i*x2) both
// directions, halving FFT work. Returns the output sample count, or -1 when
// n_in < one FFT frame / rate <= 0 / max_out too small (the Python wrapper
// maps -1 to None and callers keep the input, like the numpy path).
int32_t af_stretch(void* h, const float* in, int32_t n_in, double rate,
                   float* out, int32_t max_out) {
  Frontend* fe = as_fe(h);
  if (n_in < kVocFft || rate <= 0.0) return -1;
  const int bins = kVocFft / 2 + 1;
  const int n_frames = 1 + (n_in - kVocFft) / kVocHop;
  const double* w = fe->window2048.data();

  // forward STFT: complex spectrum + magnitude per (frame, bin), frames
  // paired per FFT. No angles are ever taken: the synthesis phase
  // accumulator lives as a unit rotor updated by normalized cross-frame
  // products (below), so atan2/sincos disappear from the whole call.
  std::vector<double> mag(size_t(n_frames) * bins);
  std::vector<std::complex<double>> X(size_t(n_frames) * bins);
  std::vector<std::complex<double>> z(kVocFft);
  for (int t0 = 0; t0 < n_frames; t0 += 2) {
    const float* s1 = in + int64_t(t0) * kVocHop;
    const bool pair = (t0 + 1) < n_frames;
    const float* s2 = pair ? in + int64_t(t0 + 1) * kVocHop : nullptr;
    for (int i = 0; i < kVocFft; ++i) {
      z[i] = {s1[i] * w[i], pair ? s2[i] * w[i] : 0.0};
    }
    fe->fft2048(z.data());
    for (int b = 0; b < bins; ++b) {
      // unpack: X1[b] = (Z[b] + conj(Z[-b]))/2, X2[b] = (Z[b]-conj(Z[-b]))/2i
      std::complex<double> zb = z[b];
      std::complex<double> zc = std::conj(z[(kVocFft - b) & (kVocFft - 1)]);
      std::complex<double> x1 = 0.5 * (zb + zc);
      X[size_t(t0) * bins + b] = x1;
      mag[size_t(t0) * bins + b] = std::abs(x1);
      if (pair) {
        std::complex<double> x2 =
            std::complex<double>(0.0, -0.5) * (zb - zc);
        X[size_t(t0 + 1) * bins + b] = x2;
        mag[size_t(t0 + 1) * bins + b] = std::abs(x2);
      }
    }
  }

  const int n_steps = static_cast<int>(std::ceil(n_frames / rate));
  const int64_t out_len64 = kVocFft + int64_t(kVocHop) * (n_steps - 1);
  if (out_len64 > max_out) return -1;
  const int64_t out_len = out_len64;

  // Phase accumulator as a UNIT ROTOR per bin. The classic update is
  //   phase += phi + wrap(angle(X1) - angle(X0) - phi)
  // and only exp(i*phase) is ever consumed, so modulo 2*pi the increment is
  // exactly angle(X1) - angle(X0): the rotor update is the normalized
  // cross-frame product R *= X1*conj(X0)/|X1*conj(X0)| — no atan2, no
  // sincos anywhere. (Exception: an exactly-zero bin leaves R unchanged
  // where numpy's angle(0)=0 convention would rotate; measure-zero for
  // windowed real audio.) Rotor magnitude drift over hundreds of unit
  // multiplies is ~1e-13 in double — far below output precision.
  std::vector<std::complex<double>> rotor(bins);
  for (int b = 0; b < bins; ++b) {
    const double m0 = mag[b];
    rotor[b] = m0 > 0.0 ? X[b] / m0 : std::complex<double>(1.0, 0.0);
  }
  std::vector<double> acc(out_len, 0.0);
  std::vector<double> norm(out_len, 0.0);
  std::vector<std::complex<double>> spec1(bins), spec2(bins);
  auto synth_spec = [&](int step, std::complex<double>* spec) {
    const double pos = step * rate;
    const int i0 = static_cast<int>(pos);
    const int i1 = std::min(i0 + 1, n_frames - 1);
    const double frac = pos - i0;
    const double* m0 = mag.data() + size_t(i0) * bins;
    const double* m1 = mag.data() + size_t(i1) * bins;
    const std::complex<double>* x0 = X.data() + size_t(i0) * bins;
    const std::complex<double>* x1 = X.data() + size_t(i1) * bins;
    for (int b = 0; b < bins; ++b) {
      const double m = (1.0 - frac) * m0[b] + frac * m1[b];
      spec[b] = m * rotor[b];  // emit BEFORE advancing
      const std::complex<double> d = x1[b] * std::conj(x0[b]);
      const double nd = std::abs(d);
      if (nd > 0.0) rotor[b] *= d / nd;
    }
    // numpy irfft ignores the imaginary parts of the DC and Nyquist bins;
    // the packed transform would otherwise leak them into the other frame
    spec[0] = spec[0].real();
    spec[bins - 1] = spec[bins - 1].real();
  };
  for (int t0 = 0; t0 < n_steps; t0 += 2) {
    const bool pair = (t0 + 1) < n_steps;
    synth_spec(t0, spec1.data());
    if (pair) synth_spec(t0 + 1, spec2.data());
    // pack two real inverse FFTs: Z = S1full + i*S2full, irfft via
    // ifft(Z) = conj(fft(conj(Z))) / N; x1 = Re, x2 = Im
    for (int b = 0; b < bins; ++b) {
      std::complex<double> s2v = pair ? spec2[b] : 0.0;
      z[b] = std::conj(spec1[b] + std::complex<double>(0.0, 1.0) * s2v);
      if (b != 0 && b != kVocFft / 2) {
        z[kVocFft - b] = std::conj(
            std::conj(spec1[b]) + std::complex<double>(0.0, 1.0) *
                                      std::conj(s2v));
      }
    }
    fe->fft2048(z.data());
    // ifft(Z) = conj(fft(conj(Z)))/N: x1 = Re(y)/N, x2 = -Im(y)/N
    for (int pi = 0; pi < (pair ? 2 : 1); ++pi) {
      double* dst = acc.data() + int64_t(t0 + pi) * kVocHop;
      double* nrm = norm.data() + int64_t(t0 + pi) * kVocHop;
      for (int i = 0; i < kVocFft; ++i) {
        const double xi = (pi == 0 ? z[i].real() : -z[i].imag()) / kVocFft;
        dst[i] += xi * w[i];
        nrm[i] += w[i] * w[i];
      }
    }
  }
  for (int64_t i = 0; i < out_len; ++i) {
    out[i] = static_cast<float>(acc[i] / std::max(norm[i], 1e-8));
  }
  return static_cast<int32_t>(out_len);
}

}  // extern "C"
