// whisper_host — native host-side runtime for the TPU framework.
//
// TPU-native equivalent of the reference's C++ host layer: the WAV readers
// (reference whisper.tflite/wav_util.cpp:18-129), the VAD / silence CLI cores
// (reference app/vad.cpp:5-49, app/silent_detection.cpp:6-69), and — the part
// that matters for TPU feeding — a multithreaded batch loader that decodes
// and pads N files into one contiguous [N, 480000] float32 host buffer ready
// for a single host→device transfer (replacing the reference's per-utterance
// memcpy into the interpreter arena, whisper.cpp:293,313-323).
//
// Pure C ABI (loaded via ctypes from whisper_tpu/native). No dependencies
// beyond libc/libpthread. Numeric contracts mirror whisper_tpu/audio/wav.py
// and vad.py exactly (which in turn document their reference lineage):
//   * PCM16 → float /32767; stereo PCM16 sum/(2*32767) (or the reference's
//     /INT32_MAX quirk when requested — wav_util.cpp:122-126);
//   * PCM32/float32 downmix averages in double then casts;
//   * RMS energies accumulate in double, stored float32;
//   * silence threshold compares 20*log10f(rms) against threshold_db.

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

#define WH_API extern "C" __attribute__((visibility("default")))

namespace {

constexpr float kInt16Max = 32767.0f;
constexpr double kInt32Max = 2147483647.0;

void set_err(char* err, int err_len, const std::string& msg) {
  if (err && err_len > 0) {
    std::snprintf(err, static_cast<size_t>(err_len), "%s", msg.c_str());
  }
}

bool read_file(const char* path, std::vector<uint8_t>& data, std::string& msg) {
  FILE* f = std::fopen(path, "rb");
  if (!f) {
    msg = std::string(path) + ": cannot open";
    return false;
  }
  std::fseek(f, 0, SEEK_END);
  long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (size < 0) {
    std::fclose(f);
    msg = std::string(path) + ": cannot stat";
    return false;
  }
  data.resize(static_cast<size_t>(size));
  size_t got = size ? std::fread(data.data(), 1, data.size(), f) : 0;
  std::fclose(f);
  if (got != data.size()) {
    msg = std::string(path) + ": short read";
    return false;
  }
  return true;
}

uint16_t rd16(const uint8_t* p) { return static_cast<uint16_t>(p[0] | p[1] << 8); }
uint32_t rd32(const uint8_t* p) {
  return static_cast<uint32_t>(p[0]) | static_cast<uint32_t>(p[1]) << 8 |
         static_cast<uint32_t>(p[2]) << 16 | static_cast<uint32_t>(p[3]) << 24;
}

struct Chunk {
  size_t off = 0;
  uint32_t size = 0;
  bool found = false;
};

// RIFF chunk walk — the chunk-aware counterpart of the reference's fixed
// 44-byte header assumption (wav_util.cpp:18-40).
bool parse_riff(const std::vector<uint8_t>& d, Chunk& fmt, Chunk& dat,
                std::string& msg) {
  if (d.size() < 12 || std::memcmp(d.data(), "RIFF", 4) != 0 ||
      std::memcmp(d.data() + 8, "WAVE", 4) != 0) {
    msg = "not a RIFF/WAVE file";
    return false;
  }
  size_t off = 12;
  while (off + 8 <= d.size()) {
    const uint8_t* p = d.data() + off;
    uint32_t size = rd32(p + 4);
    if (std::memcmp(p, "fmt ", 4) == 0) fmt = {off + 8, size, true};
    if (std::memcmp(p, "data", 4) == 0) dat = {off + 8, size, true};
    off += 8 + size + (size & 1);  // word-aligned
  }
  if (!fmt.found || !dat.found) {
    msg = "missing fmt/data chunk";
    return false;
  }
  return true;
}

int decode_wav(const std::vector<uint8_t>& d, int expected_rate, int quirks,
               std::vector<float>& out, std::string& msg) {
  Chunk fmt, dat;
  if (!parse_riff(d, fmt, dat, msg)) return -1;
  if (fmt.size < 16 || dat.off + dat.size > d.size()) {
    msg = "truncated fmt/data chunk";
    return -1;
  }
  const uint8_t* fp = d.data() + fmt.off;
  uint16_t audio_format = rd16(fp);
  uint16_t channels = rd16(fp + 2);
  uint32_t sample_rate = rd32(fp + 4);
  uint16_t bits = rd16(fp + 14);
  if (expected_rate > 0 && sample_rate != static_cast<uint32_t>(expected_rate)) {
    msg = "sample rate " + std::to_string(sample_rate) + ", expected " +
          std::to_string(expected_rate);
    return -1;
  }
  if (channels != 1 && channels != 2) {
    msg = "must be mono or stereo, got " + std::to_string(channels);
    return -1;
  }
  const uint8_t* raw = d.data() + dat.off;

  if (audio_format == 1 && bits == 16) {
    size_t n = dat.size / 2;
    if (channels == 2) {
      size_t pairs = n / 2;
      out.resize(pairs);
      for (size_t i = 0; i < pairs; ++i) {
        int16_t l, r;
        std::memcpy(&l, raw + 4 * i, 2);
        std::memcpy(&r, raw + 4 * i + 2, 2);
        float sum = static_cast<float>(l) + static_cast<float>(r);
        out[i] = quirks ? static_cast<float>(sum / kInt32Max)  // wav_util.cpp:122-126
                        : sum / (2.0f * kInt16Max);
      }
    } else {
      out.resize(n);
      for (size_t i = 0; i < n; ++i) {
        int16_t v;
        std::memcpy(&v, raw + 2 * i, 2);
        out[i] = static_cast<float>(v) / kInt16Max;
      }
    }
    return 0;
  }

  // 32-bit paths: convert in double (matches numpy f64 intermediate).
  std::vector<double> wide;
  if (audio_format == 1 && bits == 32) {
    size_t n = dat.size / 4;
    wide.resize(n);
    for (size_t i = 0; i < n; ++i) {
      int32_t v;
      std::memcpy(&v, raw + 4 * i, 4);
      wide[i] = static_cast<double>(v) / kInt32Max;
    }
  } else if (audio_format == 3 && bits == 32) {
    size_t n = dat.size / 4;
    wide.resize(n);
    for (size_t i = 0; i < n; ++i) {
      float v;
      std::memcpy(&v, raw + 4 * i, 4);
      wide[i] = static_cast<double>(v);
    }
  } else {
    msg = "unsupported format=" + std::to_string(audio_format) +
          " bits=" + std::to_string(bits);
    return -1;
  }
  if (channels == 2) {
    size_t pairs = wide.size() / 2;
    out.resize(pairs);
    for (size_t i = 0; i < pairs; ++i) {
      out[i] = static_cast<float>((wide[2 * i] + wide[2 * i + 1]) / 2.0);
    }
  } else {
    out.resize(wide.size());
    for (size_t i = 0; i < wide.size(); ++i) out[i] = static_cast<float>(wide[i]);
  }
  return 0;
}

float* copy_out(const std::vector<float>& v, int64_t* out_n) {
  float* buf = static_cast<float*>(::operator new[](v.size() * sizeof(float)));
  std::memcpy(buf, v.data(), v.size() * sizeof(float));
  *out_n = static_cast<int64_t>(v.size());
  return buf;
}

}  // namespace

WH_API void wh_free(float* p) { ::operator delete[](p); }

WH_API int wh_version() { return 1; }

// Chunk-aware WAV reader (mirrors audio/wav.py read_wav). On success returns
// 0 and sets *out (caller frees with wh_free) and *out_n.
WH_API int wh_wav_read(const char* path, int expected_rate, int quirks,
                       float** out, int64_t* out_n, char* err, int err_len) {
  std::vector<uint8_t> data;
  std::string msg;
  if (!read_file(path, data, msg)) {
    set_err(err, err_len, msg);
    return -1;
  }
  std::vector<float> samples;
  if (decode_wav(data, expected_rate, quirks, samples, msg) != 0) {
    set_err(err, err_len, std::string(path) + ": " + msg);
    return -1;
  }
  *out = copy_out(samples, out_n);
  return 0;
}

// Fixed-44-byte-header reader (reference wav_read_legacy, wav_util.cpp:18-87):
// sample count = data_size/block_align; PCM16 → /32767; float32 passthrough.
WH_API int wh_wav_read_legacy(const char* path, float** out, int64_t* out_n,
                              char* err, int err_len) {
  std::vector<uint8_t> d;
  std::string msg;
  if (!read_file(path, d, msg)) {
    set_err(err, err_len, msg);
    return -1;
  }
  if (d.size() < 44 || std::memcmp(d.data(), "RIFF", 4) != 0 ||
      std::memcmp(d.data() + 8, "WAVE", 4) != 0 ||
      std::memcmp(d.data() + 12, "fmt ", 4) != 0) {
    set_err(err, err_len, std::string(path) + ": not a valid WAV file");
    return -1;
  }
  uint16_t audio_format = rd16(d.data() + 20);
  uint16_t block_align = rd16(d.data() + 32);
  uint32_t wav_size = rd32(d.data() + 40);
  if (block_align == 0) {
    set_err(err, err_len, std::string(path) + ": zero block align");
    return -1;
  }
  size_t num_samples = wav_size / block_align;
  std::vector<float> samples(num_samples, 0.0f);
  const uint8_t* raw = d.data() + 44;
  size_t avail = d.size() - 44;
  if (audio_format == 1) {
    size_t n = std::min(num_samples, avail / 2);
    for (size_t i = 0; i < n; ++i) {
      int16_t v;
      std::memcpy(&v, raw + 2 * i, 2);
      samples[i] = static_cast<float>(v) / kInt16Max;
    }
  } else {
    size_t n = std::min(num_samples, avail / 4);
    std::memcpy(samples.data(), raw, n * 4);
  }
  *out = copy_out(samples, out_n);
  return 0;
}

// Raw float32 PCM (input format of app/vad.cpp / app/silent_detection.cpp).
WH_API int wh_pcm_read_f32(const char* path, float** out, int64_t* out_n,
                           char* err, int err_len) {
  std::vector<uint8_t> d;
  std::string msg;
  if (!read_file(path, d, msg)) {
    set_err(err, err_len, msg);
    return -1;
  }
  std::vector<float> samples(d.size() / 4);
  std::memcpy(samples.data(), d.data(), samples.size() * 4);
  *out = copy_out(samples, out_n);
  return 0;
}

// Per-frame RMS energies over non-overlapping frames (trailing partial frame
// dropped — vad.cpp:25 full-buffer-only fread). energies must hold n/frame.
WH_API int64_t wh_frame_energies(const float* x, int64_t n, int64_t frame,
                                 float* energies) {
  if (frame <= 0) return 0;
  int64_t n_frames = n / frame;
  for (int64_t i = 0; i < n_frames; ++i) {
    double acc = 0.0;
    const float* p = x + i * frame;
    for (int64_t j = 0; j < frame; ++j) {
      acc += static_cast<double>(p[j]) * static_cast<double>(p[j]);
    }
    energies[i] = static_cast<float>(std::sqrt(acc / static_cast<double>(frame)));
  }
  return n_frames;
}

// Energy VAD (vad.cpp:37-41: energy > threshold). mask must hold n/frame.
WH_API int64_t wh_energy_vad(const float* x, int64_t n, int64_t frame,
                             float threshold, uint8_t* mask) {
  if (frame <= 0) return 0;
  int64_t n_frames = n / frame;
  std::vector<float> e(static_cast<size_t>(n_frames));
  wh_frame_energies(x, n, frame, e.data());
  for (int64_t i = 0; i < n_frames; ++i) mask[i] = e[i] > threshold ? 1 : 0;
  return n_frames;
}

// Silence removal (silent_detection.cpp:49-62: keep frames with
// 20*log10(rms) >= threshold_db). out must hold (n/frame)*frame floats;
// returns the number of samples written.
WH_API int64_t wh_remove_silence(const float* x, int64_t n, int64_t frame,
                                 float threshold_db, float* out) {
  if (frame <= 0) return 0;
  int64_t n_frames = n / frame;
  int64_t written = 0;
  for (int64_t i = 0; i < n_frames; ++i) {
    double acc = 0.0;
    const float* p = x + i * frame;
    for (int64_t j = 0; j < frame; ++j) {
      acc += static_cast<double>(p[j]) * static_cast<double>(p[j]);
    }
    float rms = static_cast<float>(std::sqrt(acc / static_cast<double>(frame)));
    float db = 20.0f * std::log10(rms);  // rms==0 → -inf → dropped
    if (db >= threshold_db) {
      std::memcpy(out + written, p, static_cast<size_t>(frame) * 4);
      written += frame;
    }
  }
  return written;
}

// Multithreaded batch loader: decode + pad/trim n_paths files into the
// caller's contiguous [n_paths, max_len] float32 buffer (zero-filled padding
// — the resize-to-480000 contract, whisper.cpp:687,698). legacy != 0 routes
// through the 44-byte reader. Returns 0, or the number of failures with the
// first failure's message in err.
WH_API int wh_load_batch(const char** paths, int n_paths, float* out,
                         int64_t max_len, int expected_rate, int legacy,
                         int n_threads, char* err, int err_len) {
  if (n_threads <= 0) {
    n_threads = static_cast<int>(std::thread::hardware_concurrency());
    if (n_threads <= 0) n_threads = 1;
  }
  if (n_threads > n_paths) n_threads = n_paths > 0 ? n_paths : 1;
  std::vector<std::string> errors(static_cast<size_t>(n_paths));
  std::vector<std::thread> workers;
  for (int t = 0; t < n_threads; ++t) {
    workers.emplace_back([&, t]() {
      for (int i = t; i < n_paths; i += n_threads) {
        std::vector<uint8_t> data;
        std::vector<float> samples;
        std::string msg;
        bool ok = read_file(paths[i], data, msg);
        if (ok) {
          if (legacy) {
            // route through the public legacy entry for identical semantics
            float* buf = nullptr;
            int64_t nn = 0;
            char e2[256] = {0};
            if (wh_wav_read_legacy(paths[i], &buf, &nn, e2, sizeof(e2)) == 0) {
              samples.assign(buf, buf + nn);
              wh_free(buf);
            } else {
              ok = false;
              msg = e2;
            }
          } else {
            ok = decode_wav(data, expected_rate, /*quirks=*/0, samples, msg) == 0;
          }
        }
        float* row = out + static_cast<int64_t>(i) * max_len;
        if (!ok) {
          // read_file/wh_wav_read_legacy messages already carry the path;
          // decode_wav ones do not.
          errors[static_cast<size_t>(i)] =
              msg.compare(0, std::strlen(paths[i]), paths[i]) == 0
                  ? msg
                  : std::string(paths[i]) + ": " + msg;
          std::memset(row, 0, static_cast<size_t>(max_len) * 4);
          continue;
        }
        int64_t n = std::min<int64_t>(static_cast<int64_t>(samples.size()), max_len);
        std::memcpy(row, samples.data(), static_cast<size_t>(n) * 4);
        std::memset(row + n, 0, static_cast<size_t>(max_len - n) * 4);
      }
    });
  }
  for (auto& w : workers) w.join();
  int failures = 0;
  for (const auto& e : errors) {
    if (!e.empty()) {
      if (failures == 0) set_err(err, err_len, e);
      ++failures;
    }
  }
  return failures;
}
