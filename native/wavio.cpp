// Native WAV reader: the host-side audio IO shim.
//
// Role-equivalent to torchaudio's C++ load path used by the reference
// (my_affectgpt/models/ImageBind/data.py:136 torchaudio.load). Parses
// RIFF/WAVE containers (PCM 8/16/24/32 and IEEE float32), converts to
// interleaved float32 in [-1, 1]. Resampling happens on-device
// (affectgpt_tpu/ops/audio.py), so this stays a thin demuxer.
//
// C ABI for ctypes:
//   int wavio_read(const char* path, float** out, int* channels,
//                  long long* frames, int* rate);   // 0 = ok
//   void wavio_free(float* buf);

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

struct FmtChunk {
  uint16_t audio_format = 0;
  uint16_t channels = 0;
  uint32_t sample_rate = 0;
  uint16_t bits = 0;
};

bool read_exact(FILE* f, void* dst, size_t n) {
  return std::fread(dst, 1, n, f) == n;
}

}  // namespace

extern "C" {

int wavio_read(const char* path, float** out, int* channels,
               long long* frames, int* rate) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return 1;

  char riff[4], wave[4];
  uint32_t riff_size;
  if (!read_exact(f, riff, 4) || !read_exact(f, &riff_size, 4) ||
      !read_exact(f, wave, 4) || std::memcmp(riff, "RIFF", 4) != 0 ||
      std::memcmp(wave, "WAVE", 4) != 0) {
    std::fclose(f);
    return 2;
  }

  FmtChunk fmt;
  std::vector<uint8_t> data;
  bool have_fmt = false, have_data = false;

  while (!have_data || !have_fmt) {
    char id[4];
    uint32_t size;
    if (!read_exact(f, id, 4) || !read_exact(f, &size, 4)) break;
    if (std::memcmp(id, "fmt ", 4) == 0) {
      uint8_t buf[16];
      if (size < 16 || !read_exact(f, buf, 16)) break;
      std::memcpy(&fmt.audio_format, buf + 0, 2);
      std::memcpy(&fmt.channels, buf + 2, 2);
      std::memcpy(&fmt.sample_rate, buf + 4, 4);
      std::memcpy(&fmt.bits, buf + 14, 2);
      if (size > 16) std::fseek(f, size - 16, SEEK_CUR);
      have_fmt = true;
    } else if (std::memcmp(id, "data", 4) == 0) {
      data.resize(size);
      if (!read_exact(f, data.data(), size)) break;
      have_data = true;
    } else {
      std::fseek(f, size + (size & 1), SEEK_CUR);
    }
  }
  std::fclose(f);
  if (!have_fmt || !have_data || fmt.channels == 0) return 3;

  const bool is_float = fmt.audio_format == 3;
  const bool is_pcm = fmt.audio_format == 1 || fmt.audio_format == 0xFFFE;
  if (!is_float && !is_pcm) return 4;

  const size_t bytes_per_sample = fmt.bits / 8;
  if (bytes_per_sample == 0) return 4;
  const size_t total = data.size() / bytes_per_sample;
  const long long n_frames = static_cast<long long>(total / fmt.channels);
  const size_t n = static_cast<size_t>(n_frames) * fmt.channels;

  float* buf = static_cast<float*>(std::malloc(n * sizeof(float)));
  if (!buf) return 5;

  const uint8_t* src = data.data();
  if (is_float && fmt.bits == 32) {
    std::memcpy(buf, src, n * sizeof(float));
  } else if (is_pcm && fmt.bits == 16) {
    const int16_t* s = reinterpret_cast<const int16_t*>(src);
    for (size_t i = 0; i < n; ++i) buf[i] = s[i] / 32768.0f;
  } else if (is_pcm && fmt.bits == 32) {
    const int32_t* s = reinterpret_cast<const int32_t*>(src);
    for (size_t i = 0; i < n; ++i) buf[i] = s[i] / 2147483648.0f;
  } else if (is_pcm && fmt.bits == 24) {
    for (size_t i = 0; i < n; ++i) {
      int32_t v = src[3 * i] | (src[3 * i + 1] << 8) | (src[3 * i + 2] << 16);
      if (v >= (1 << 23)) v -= (1 << 24);
      buf[i] = v / 8388608.0f;
    }
  } else if (is_pcm && fmt.bits == 8) {
    for (size_t i = 0; i < n; ++i) buf[i] = (src[i] - 128) / 128.0f;
  } else {
    std::free(buf);
    return 4;
  }

  *out = buf;
  *channels = fmt.channels;
  *frames = n_frames;
  *rate = static_cast<int>(fmt.sample_rate);
  return 0;
}

void wavio_free(float* buf) { std::free(buf); }

}  // extern "C"
