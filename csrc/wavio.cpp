// Native WAV reader for the host-side data pipeline.
//
// TPU-native replacement for the reference's torchaudio (sox/ffmpeg) decode
// path (reference: src/audiofakedetect/data_loader.py:174, 336-340):
//   * wav_info        == torchaudio.info   (header scan; the dataset index
//                        build calls this for every file — the reference's
//                        "45 minutes" scan — so it must be cheap)
//   * wav_read_f32    == torchaudio.load(frame_offset, num_frames)
//   * wav_read_batch_f32 reads a whole training batch of frames with a
//     thread pool into one contiguous buffer, which Python then ships to
//     the device in a single transfer.  This replaces torch DataLoader
//     worker processes.
//
// Supports RIFF/WAVE with PCM 8/16/24/32-bit and IEEE float32/64, any
// channel count (frames are returned for channel 0; the corpora are mono).
//
// Build: make -C csrc   (produces libwavio.so, loaded via ctypes)

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct WavFmt {
  uint16_t format = 0;  // 1 = PCM, 3 = IEEE float, 0xFFFE = extensible
  uint16_t channels = 0;
  uint32_t sample_rate = 0;
  uint16_t bits = 0;
  int64_t data_offset = 0;  // byte offset of sample data
  int64_t data_bytes = 0;
};

bool parse_header(FILE* f, WavFmt* fmt) {
  char id[4];
  uint32_t sz;
  if (fread(id, 1, 4, f) != 4 || memcmp(id, "RIFF", 4) != 0) return false;
  if (fread(&sz, 4, 1, f) != 1) return false;
  if (fread(id, 1, 4, f) != 4 || memcmp(id, "WAVE", 4) != 0) return false;
  bool have_fmt = false;
  while (fread(id, 1, 4, f) == 4 && fread(&sz, 4, 1, f) == 1) {
    if (memcmp(id, "fmt ", 4) == 0) {
      uint8_t buf[40];
      uint32_t n = sz < sizeof(buf) ? sz : (uint32_t)sizeof(buf);
      if (n < 16) return false;  // a fmt chunk shorter than the base
      // PCM layout would leave format/channels/rate/bits reading
      // uninitialized stack bytes
      if (fread(buf, 1, n, f) != n) return false;
      if (sz > n && fseek(f, sz - n, SEEK_CUR) != 0) return false;
      memcpy(&fmt->format, buf + 0, 2);
      memcpy(&fmt->channels, buf + 2, 2);
      memcpy(&fmt->sample_rate, buf + 4, 4);
      memcpy(&fmt->bits, buf + 14, 2);
      if (fmt->format == 0xFFFE && sz >= 40) {
        // WAVE_FORMAT_EXTENSIBLE: true format is the first 2 bytes of the
        // SubFormat GUID at offset 24.
        memcpy(&fmt->format, buf + 24, 2);
      }
      have_fmt = true;
    } else if (memcmp(id, "data", 4) == 0) {
      fmt->data_offset = ftell(f);
      fmt->data_bytes = sz;
      // Keep scanning only if fmt not seen yet (data usually comes last).
      if (have_fmt) return true;
      if (fseek(f, sz + (sz & 1), SEEK_CUR) != 0) return false;
    } else {
      if (fseek(f, sz + (sz & 1), SEEK_CUR) != 0) return false;
    }
  }
  return have_fmt && fmt->data_offset > 0;
}

// Formats/widths the decoder handles; everything else must be REJECTED at
// the header stage (a-law/mu-law/ADPCM decoded through the PCM switch
// would train on silent garbage, and sub-byte widths zero frame_bytes).
inline bool supported_format(uint16_t format, uint16_t bits) {
  if (format == 3) return bits == 32 || bits == 64;
  if (format == 1) return bits == 8 || bits == 16 || bits == 24 || bits == 32;
  return false;
}

inline float decode_sample(const uint8_t* p, uint16_t format, uint16_t bits) {
  if (format == 3) {  // IEEE float (32/64-bit only; enforced at header)
    if (bits == 32) {
      float v;
      memcpy(&v, p, 4);
      return v;
    }
    double v;
    memcpy(&v, p, 8);
    return (float)v;
  }
  switch (bits) {
    case 8:  // unsigned
      return ((int)p[0] - 128) / 128.0f;
    case 16: {
      int16_t v;
      memcpy(&v, p, 2);
      return v / 32768.0f;
    }
    case 24: {
      int32_t v = (int32_t)((uint32_t)p[0] | ((uint32_t)p[1] << 8) |
                            ((uint32_t)p[2] << 16));
      if (v & 0x800000) v |= 0xFF000000;
      return v / 8388608.0f;
    }
    case 32: {
      int32_t v;
      memcpy(&v, p, 4);
      return v / 2147483648.0f;
    }
  }
  return 0.0f;
}

int read_frames(const char* path, int64_t frame_offset, int64_t num_frames,
                float* out, int64_t* frames_read, int* sample_rate) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  WavFmt fmt;
  if (!parse_header(f, &fmt) || fmt.channels == 0 ||
      !supported_format(fmt.format, fmt.bits)) {
    fclose(f);
    return -2;
  }
  const int bytes_per_sample = fmt.bits / 8;
  const int frame_bytes = bytes_per_sample * fmt.channels;
  const int64_t total_frames = fmt.data_bytes / frame_bytes;
  if (sample_rate) *sample_rate = (int)fmt.sample_rate;
  if (frame_offset < 0) frame_offset = 0;
  if (frame_offset > total_frames) frame_offset = total_frames;
  int64_t n = num_frames < 0 ? total_frames - frame_offset : num_frames;
  if (frame_offset + n > total_frames) n = total_frames - frame_offset;
  if (fseek(f, fmt.data_offset + frame_offset * frame_bytes, SEEK_SET) != 0) {
    fclose(f);
    return -3;
  }
  std::vector<uint8_t> buf((size_t)(n * frame_bytes));
  size_t got = fread(buf.data(), 1, buf.size(), f);
  fclose(f);
  int64_t frames = (int64_t)(got / frame_bytes);
  for (int64_t i = 0; i < frames; ++i) {
    out[i] = decode_sample(buf.data() + i * frame_bytes, fmt.format, fmt.bits);
  }
  if (frames_read) *frames_read = frames;
  return 0;
}

}  // namespace

extern "C" {

// Header scan: returns 0 on success.
int wav_info(const char* path, int* sample_rate, int64_t* num_frames,
             int* channels, int* bits) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  WavFmt fmt;
  bool ok = parse_header(f, &fmt);
  fclose(f);
  if (!ok || fmt.channels == 0 || !supported_format(fmt.format, fmt.bits))
    return -2;
  if (sample_rate) *sample_rate = (int)fmt.sample_rate;
  if (channels) *channels = fmt.channels;
  if (bits) *bits = fmt.bits;
  if (num_frames)
    *num_frames = fmt.data_bytes / ((fmt.bits / 8) * fmt.channels);
  return 0;
}

// Read `num_frames` (channel 0) starting at `frame_offset`; shorter reads
// zero-pad.  Returns 0 on success.
int wav_read_f32(const char* path, int64_t frame_offset, int64_t num_frames,
                 float* out, int64_t* frames_read, int* sample_rate) {
  int64_t fr = 0;
  int rc = read_frames(path, frame_offset, num_frames, out, &fr, sample_rate);
  if (rc == 0 && num_frames > fr) {
    memset(out + fr, 0, (size_t)(num_frames - fr) * sizeof(float));
  }
  if (frames_read) *frames_read = fr;
  return rc;
}

// Threaded batch read: n items, each `num_frames[i]` frames from
// `paths[i]` at `frame_offsets[i]`, written to out + i * stride.
// Returns the number of failed items (0 == all good); failures zero-fill.
int wav_read_batch_f32(const char** paths, const int64_t* frame_offsets,
                       const int64_t* num_frames, const int* sample_rates_out,
                       int n, float* out, int64_t stride, int num_threads) {
  (void)sample_rates_out;
  if (num_threads < 1) num_threads = 1;
  std::vector<int> failures(num_threads, 0);
  std::vector<std::thread> threads;
  threads.reserve(num_threads);
  for (int t = 0; t < num_threads; ++t) {
    threads.emplace_back([&, t]() {
      for (int i = t; i < n; i += num_threads) {
        float* dst = out + (int64_t)i * stride;
        // clamp to the row stride (a caller-supplied count must never
        // write past the batch row) and reject negatives before the
        // size_t casts below
        int64_t want = num_frames[i];
        if (want < 0 || want > stride) want = want < 0 ? 0 : stride;
        if (want == 0) {
          failures[t]++;
          continue;
        }
        int64_t fr = 0;
        int rc = read_frames(paths[i], frame_offsets[i], want, dst, &fr,
                             nullptr);
        if (rc != 0) {
          memset(dst, 0, (size_t)want * sizeof(float));
          failures[t]++;
        } else if (want > fr) {
          memset(dst + fr, 0, (size_t)(want - fr) * sizeof(float));
        }
      }
    });
  }
  for (auto& th : threads) th.join();
  int total = 0;
  for (int v : failures) total += v;
  return total;
}

}  // extern "C"
