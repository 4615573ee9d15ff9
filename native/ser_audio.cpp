// ser_audio: native audio data-loader for the TPU SER framework.
//
// The reference's audio frontend is native code via wheels (librosa/numba
// JIT decode+resample, torch C++ tensors — SURVEY.md §2.9). This is the
// framework's own native equivalent: PCM WAV decode (8/16/24/32-bit int,
// 32-bit float), mono mixdown, windowed-sinc polyphase resampling to a
// target rate, optional zero-mean/unit-variance normalization, and a
// std::thread batch loader — exposed through a plain C ABI consumed from
// Python via ctypes (interspeech_ser_tpu/utils/native_audio.py).
//
// Build: make -C native   (produces libser_audio.so)

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <atomic>
#include <thread>
#include <vector>

namespace {

struct Wav {
  std::vector<float> samples;  // mono, [-1, 1]
  int sample_rate = 0;
};

uint32_t rd_u32(const uint8_t* p) {
  return (uint32_t)p[0] | ((uint32_t)p[1] << 8) | ((uint32_t)p[2] << 16) |
         ((uint32_t)p[3] << 24);
}
uint16_t rd_u16(const uint8_t* p) {
  return (uint16_t)p[0] | ((uint16_t)p[1] << 8);
}

bool decode_wav(const char* path, Wav* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> buf((size_t)size);
  if (fread(buf.data(), 1, (size_t)size, f) != (size_t)size) {
    fclose(f);
    return false;
  }
  fclose(f);
  if (size < 44 || memcmp(buf.data(), "RIFF", 4) || memcmp(buf.data() + 8, "WAVE", 4))
    return false;

  uint16_t fmt = 0, channels = 0, bits = 0;
  uint32_t rate = 0;
  const uint8_t* data = nullptr;
  uint32_t data_len = 0;

  size_t pos = 12;
  while (pos + 8 <= (size_t)size) {
    const uint8_t* chunk = buf.data() + pos;
    uint32_t len = rd_u32(chunk + 4);
    if (!memcmp(chunk, "fmt ", 4) && len >= 16) {
      fmt = rd_u16(chunk + 8);
      channels = rd_u16(chunk + 10);
      rate = rd_u32(chunk + 12);
      bits = rd_u16(chunk + 22);
    } else if (!memcmp(chunk, "data", 4)) {
      data = chunk + 8;
      data_len = len;
      if (pos + 8 + data_len > (size_t)size) data_len = (uint32_t)(size - pos - 8);
    }
    pos += 8 + len + (len & 1);
  }
  if (!data || !channels || !rate) return false;
  // fmt 1 = PCM int, 3 = IEEE float, 0xFFFE = extensible (assume PCM layout)
  if (fmt != 1 && fmt != 3 && fmt != 0xFFFE) return false;

  size_t bytes_per = bits / 8;
  size_t n_frames = data_len / (bytes_per * channels);
  out->samples.resize(n_frames);
  out->sample_rate = (int)rate;

  for (size_t i = 0; i < n_frames; i++) {
    double acc = 0.0;
    for (int c = 0; c < channels; c++) {
      const uint8_t* s = data + (i * channels + c) * bytes_per;
      double v = 0.0;
      if (fmt == 3 && bits == 32) {
        float fv;
        memcpy(&fv, s, 4);
        v = fv;
      } else if (bits == 16) {
        int16_t iv = (int16_t)((uint16_t)s[0] | ((uint16_t)s[1] << 8));
        v = iv / 32768.0;
      } else if (bits == 32) {
        int32_t iv = (int32_t)rd_u32(s);
        v = iv / 2147483648.0;
      } else if (bits == 24) {
        int32_t iv = (int32_t)((uint32_t)s[0] << 8 | (uint32_t)s[1] << 16 |
                               (uint32_t)s[2] << 24) >> 8;
        v = iv / 8388608.0;
      } else if (bits == 8) {
        v = ((int)s[0] - 128) / 128.0;
      } else {
        return false;
      }
      acc += v;
    }
    out->samples[i] = (float)(acc / channels);
  }
  return true;
}

// windowed-sinc polyphase resampler (Hann window, 32 taps per phase)
void resample(const std::vector<float>& in, int sr_in, int sr_out,
              std::vector<float>* out) {
  if (sr_in == sr_out) {
    *out = in;
    return;
  }
  const double ratio = (double)sr_out / sr_in;
  // ceil(n * sr_out / sr_in): scipy.signal.resample_poly's output length —
  // the python fallback and the header-only batch planner
  // (extract/streaming.py:planned_wav_len) both rely on this convention.
  const size_t n_out =
      (size_t)(((unsigned long long)in.size() * (unsigned long long)sr_out +
                (unsigned long long)sr_in - 1) /
               (unsigned long long)sr_in);
  const int half_taps = 16;
  const double cutoff = ratio < 1.0 ? ratio : 1.0;  // anti-alias when downsampling
  out->resize(n_out);
  for (size_t j = 0; j < n_out; j++) {
    const double t = j / ratio;  // position in input samples
    const long center = (long)floor(t);
    double acc = 0.0, wsum = 0.0;
    for (long k = center - half_taps + 1; k <= center + half_taps; k++) {
      if (k < 0 || k >= (long)in.size()) continue;
      const double x = (t - k) * cutoff;
      const double sinc = x == 0.0 ? 1.0 : sin(M_PI * x) / (M_PI * x);
      const double w = 0.5 + 0.5 * cos(M_PI * (t - k) / half_taps);  // Hann
      const double tap = cutoff * sinc * w;
      acc += in[(size_t)k] * tap;
      wsum += tap;
    }
    // unity-gain normalization keeps boundaries and DC level correct
    (*out)[j] = (float)(wsum != 0.0 ? acc / wsum : 0.0);
  }
}

void normalize(std::vector<float>* x) {
  if (x->empty()) return;
  double sum = 0.0, sq = 0.0;
  for (float v : *x) {
    sum += v;
    sq += (double)v * v;
  }
  const double mean = sum / x->size();
  const double var = sq / x->size() - mean * mean;
  const double inv = 1.0 / sqrt(var + 1e-7);
  for (auto& v : *x) v = (float)((v - mean) * inv);
}

}  // namespace

extern "C" {

// Decode+resample one wav. Returns number of samples (≥0) or -1 on error;
// *out is malloc'd (caller frees via ser_audio_free). *sr_out receives the
// original sample rate.
long ser_audio_load(const char* path, int target_sr, int do_normalize,
                    float** out, int* sr_orig) {
  Wav wav;
  if (!decode_wav(path, &wav)) return -1;
  if (sr_orig) *sr_orig = wav.sample_rate;
  std::vector<float> res;
  resample(wav.samples, wav.sample_rate, target_sr, &res);
  if (do_normalize) normalize(&res);
  float* buf = (float*)malloc(res.size() * sizeof(float));
  if (!buf) return -1;
  memcpy(buf, res.data(), res.size() * sizeof(float));
  *out = buf;
  return (long)res.size();
}

void ser_audio_free(float* p) { free(p); }

// Threaded batch loader: n paths → per-file buffers/lengths (-1 = failed).
void ser_audio_load_batch(const char** paths, int n, int target_sr,
                          int do_normalize, int num_threads, float** outs,
                          long* lengths) {
  if (num_threads < 1) num_threads = 1;
  std::vector<std::thread> workers;
  std::atomic_long next{0};
  auto work = [&]() {
    for (;;) {
      long i = next.fetch_add(1);
      if (i >= n) return;
      int sr;
      lengths[i] = ser_audio_load(paths[i], target_sr, do_normalize, &outs[i], &sr);
    }
  };
  for (int t = 0; t < num_threads; t++) workers.emplace_back(work);
  for (auto& w : workers) w.join();
}

}  // extern "C"
