// Native FLAC subset decoder for the host-side data pipeline.
//
// The ASVspoof corpora ship as FLAC (reference: scripts/prepare_asvspoof.py,
// file_type="flac"); the reference decodes them through torchaudio's
// sox/ffmpeg backend.  This is a from-scratch C++17 decoder covering the
// FLAC subset those corpora use: 16-bit mono/stereo streams with constant /
// verbatim / fixed / LPC subframes and Rice-coded residuals.
//
// Exposed C API mirrors wavio.cpp: flac_info / flac_read_f32 (frame-offset
// reads return channel 0 as normalized float32).
//
// Build: make -C csrc (part of libwavio.so's sibling libflacdec.so).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

namespace {

struct BitReader {
  const uint8_t* data;
  size_t size;
  size_t byte = 0;
  int bit = 0;  // bits consumed in current byte (0..7)

  bool eof() const { return byte >= size; }

  int read_bit() {
    if (byte >= size) return -1;
    int v = (data[byte] >> (7 - bit)) & 1;
    if (++bit == 8) {
      bit = 0;
      ++byte;
    }
    return v;
  }

  // read up to 32 bits, MSB first; returns -1 on EOF via ok flag
  uint32_t read_bits(int n, bool* ok) {
    uint32_t v = 0;
    for (int i = 0; i < n; ++i) {
      int b = read_bit();
      if (b < 0) {
        *ok = false;
        return 0;
      }
      v = (v << 1) | (uint32_t)b;
    }
    return v;
  }

  int64_t read_signed(int n, bool* ok) {
    uint32_t v = read_bits(n, ok);
    if (!*ok || n == 0) return 0;
    if (v & (1u << (n - 1))) return (int64_t)v - (1ll << n);
    return (int64_t)v;
  }

  int read_unary(bool* ok) {
    int q = 0;
    while (true) {
      int b = read_bit();
      if (b < 0) {
        *ok = false;
        return 0;
      }
      if (b) return q;
      ++q;
    }
  }

  void align() {
    if (bit) {
      bit = 0;
      ++byte;
    }
  }
};

struct StreamInfo {
  uint32_t sample_rate = 0;
  int channels = 0;
  int bits = 0;
  uint64_t total_samples = 0;
  size_t audio_offset = 0;  // first frame byte offset
};

bool parse_streaminfo(const uint8_t* d, size_t n, StreamInfo* si) {
  if (n < 4 || memcmp(d, "fLaC", 4) != 0) return false;
  size_t p = 4;
  while (p + 4 <= n) {
    uint8_t hdr = d[p];
    uint32_t len = ((uint32_t)d[p + 1] << 16) | ((uint32_t)d[p + 2] << 8) |
                   d[p + 3];
    int type = hdr & 0x7F;
    bool last = hdr & 0x80;
    p += 4;
    if (type == 0 && len >= 34) {
      if (p + 34 > n) return false;  // truncated STREAMINFO: the 34-byte
      // body read below must stay inside the buffer
      const uint8_t* s = d + p;
      si->sample_rate = ((uint32_t)s[10] << 12) | ((uint32_t)s[11] << 4) |
                        (s[12] >> 4);
      si->channels = ((s[12] >> 1) & 0x7) + 1;
      si->bits = (((s[12] & 1) << 4) | (s[13] >> 4)) + 1;
      si->total_samples = ((uint64_t)(s[13] & 0xF) << 32) |
                          ((uint64_t)s[14] << 24) | ((uint64_t)s[15] << 16) |
                          ((uint64_t)s[16] << 8) | s[17];
    }
    p += len;
    if (last) break;
  }
  si->audio_offset = p;
  return si->sample_rate != 0;
}

// UTF-8-style coded number used for frame/sample index
int64_t read_utf8(BitReader* br, bool* ok) {
  uint32_t b0 = br->read_bits(8, ok);
  if (!*ok) return -1;
  int extra;
  uint64_t v;
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
    *ok = false;
    return -1;
  }
  for (int i = 0; i < extra; ++i) {
    uint32_t b = br->read_bits(8, ok);
    if (!*ok || (b & 0xC0) != 0x80) {
      *ok = false;
      return -1;
    }
    v = (v << 6) | (b & 0x3F);
  }
  return (int64_t)v;
}

const int kBlockSizes[16] = {0,    192,  576,   1152,  2304, 4608, -1, -2,
                             256,  512,  1024,  2048,  4096, 8192, 16384,
                             32768};

bool decode_residual(BitReader* br, int order, int block_size,
                     std::vector<int64_t>* res) {
  bool ok = true;
  uint32_t method = br->read_bits(2, &ok);
  if (!ok || method > 1) return false;
  int plen = method == 0 ? 4 : 5;
  uint32_t part_order = br->read_bits(4, &ok);
  if (!ok) return false;
  int parts = 1 << part_order;
  int samples_per_part = block_size >> part_order;
  if (samples_per_part == 0) return false;
  // the partition order must divide the block exactly, or the residual
  // vector comes out short and the predictor loops read past its end
  if (samples_per_part * parts != block_size) return false;
  res->clear();
  for (int p = 0; p < parts; ++p) {
    int count = samples_per_part - (p == 0 ? order : 0);
    if (count < 0) return false;
    uint32_t rice = br->read_bits(plen, &ok);
    if (!ok) return false;
    if (rice == (uint32_t)((1 << plen) - 1)) {
      // escape: raw n-bit residuals
      uint32_t nbits = br->read_bits(5, &ok);
      if (!ok) return false;
      for (int i = 0; i < count; ++i) {
        res->push_back(br->read_signed(nbits, &ok));
        if (!ok) return false;
      }
    } else {
      for (int i = 0; i < count; ++i) {
        int q = br->read_unary(&ok);
        if (!ok) return false;
        uint32_t r = rice ? br->read_bits(rice, &ok) : 0;
        if (!ok) return false;
        uint64_t u = ((uint64_t)q << rice) | r;
        res->push_back((u & 1) ? -(int64_t)(u >> 1) - 1 : (int64_t)(u >> 1));
      }
    }
  }
  return true;
}

bool decode_subframe(BitReader* br, int block_size, int bps,
                     std::vector<int64_t>* out) {
  bool ok = true;
  if (br->read_bit() != 0) return false;  // mandatory zero bit
  uint32_t type = br->read_bits(6, &ok);
  if (!ok) return false;
  int wasted = 0;
  if (br->read_bit() == 1) {
    wasted = 1 + br->read_unary(&ok);
    if (!ok) return false;
    bps -= wasted;
    // a corrupt wasted-bits count would drive bps <= 0 (negative shifts
    // in read_signed are UB) or the final s <<= wasted past 63 bits
    if (bps <= 0 || wasted >= 63) return false;
  }
  out->assign(block_size, 0);
  if (type == 0) {  // constant
    int64_t v = br->read_signed(bps, &ok);
    if (!ok) return false;
    for (auto& s : *out) s = v;
  } else if (type == 1) {  // verbatim
    for (int i = 0; i < block_size; ++i) {
      (*out)[i] = br->read_signed(bps, &ok);
      if (!ok) return false;
    }
  } else if (type >= 8 && type <= 12) {  // fixed
    int order = type - 8;
    for (int i = 0; i < order; ++i) {
      (*out)[i] = br->read_signed(bps, &ok);
      if (!ok) return false;
    }
    std::vector<int64_t> res;
    if (!decode_residual(br, order, block_size, &res)) return false;
    for (int i = order; i < block_size; ++i) {
      int64_t r = res[i - order];
      int64_t* s = out->data() + i;
      switch (order) {
        case 0:
          *s = r;
          break;
        case 1:
          *s = r + s[-1];
          break;
        case 2:
          *s = r + 2 * s[-1] - s[-2];
          break;
        case 3:
          *s = r + 3 * s[-1] - 3 * s[-2] + s[-3];
          break;
        case 4:
          *s = r + 4 * s[-1] - 6 * s[-2] + 4 * s[-3] - s[-4];
          break;
      }
    }
  } else if (type >= 32) {  // LPC
    int order = (int)type - 31;
    for (int i = 0; i < order; ++i) {
      (*out)[i] = br->read_signed(bps, &ok);
      if (!ok) return false;
    }
    uint32_t prec = br->read_bits(4, &ok) + 1;
    if (!ok || prec == 16) return false;
    int shift = (int)br->read_signed(5, &ok);
    if (!ok || shift < 0) return false;
    std::vector<int64_t> coef(order);
    for (int i = 0; i < order; ++i) {
      coef[i] = br->read_signed(prec, &ok);
      if (!ok) return false;
    }
    std::vector<int64_t> res;
    if (!decode_residual(br, order, block_size, &res)) return false;
    for (int i = order; i < block_size; ++i) {
      int64_t pred = 0;
      for (int j = 0; j < order; ++j) pred += coef[j] * (*out)[i - 1 - j];
      (*out)[i] = res[i - order] + (pred >> shift);
    }
  } else {
    return false;
  }
  if (wasted) {
    for (auto& s : *out) s <<= wasted;
  }
  return true;
}

// Decode one frame starting at br; append channel-0 samples to out.
// Returns decoded block size or -1.
int decode_frame(BitReader* br, const StreamInfo& si,
                 std::vector<float>* out) {
  bool ok = true;
  // resync: find 0xFF 0xF8.. sync code on byte boundary
  br->align();
  while (br->byte + 2 <= br->size &&
         !(br->data[br->byte] == 0xFF && (br->data[br->byte + 1] & 0xFC) == 0xF8)) {
    ++br->byte;
  }
  if (br->byte + 4 >= br->size) return -1;
  br->read_bits(14, &ok);  // sync
  br->read_bit();          // reserved
  br->read_bit();          // blocking strategy
  uint32_t bs_code = br->read_bits(4, &ok);
  uint32_t sr_code = br->read_bits(4, &ok);
  uint32_t ch_code = br->read_bits(4, &ok);
  uint32_t ss_code = br->read_bits(3, &ok);
  br->read_bit();  // reserved
  if (!ok) return -1;
  if (read_utf8(br, &ok) < 0) return -1;
  int block_size;
  if (bs_code == 6) {
    block_size = (int)br->read_bits(8, &ok) + 1;
  } else if (bs_code == 7) {
    block_size = (int)br->read_bits(16, &ok) + 1;
  } else {
    block_size = kBlockSizes[bs_code];
    if (block_size <= 0) return -1;
  }
  if (sr_code == 12) br->read_bits(8, &ok);
  if (sr_code == 13 || sr_code == 14) br->read_bits(16, &ok);
  br->read_bits(8, &ok);  // CRC-8 (unchecked)
  if (!ok) return -1;

  int bps = si.bits;
  (void)ss_code;
  int channels = si.channels;
  int assignment = (int)ch_code;
  std::vector<std::vector<int64_t>> chans;
  if (assignment < 8) {
    channels = assignment + 1;
    chans.resize(channels);
    for (int c = 0; c < channels; ++c) {
      if (!decode_subframe(br, block_size, bps, &chans[c])) return -1;
    }
  } else {
    chans.resize(2);
    int bps0 = bps, bps1 = bps;
    if (assignment == 8) bps1 += 1;       // left/side
    else if (assignment == 9) bps0 += 1;  // side/right
    else if (assignment == 10) bps1 += 1; // mid/side
    else return -1;
    if (!decode_subframe(br, block_size, bps0, &chans[0])) return -1;
    if (!decode_subframe(br, block_size, bps1, &chans[1])) return -1;
    if (assignment == 8) {  // left, side -> right = left - side
      for (int i = 0; i < block_size; ++i) chans[1][i] = chans[0][i] - chans[1][i];
    } else if (assignment == 9) {  // side, right -> left = right + side
      for (int i = 0; i < block_size; ++i) {
        int64_t side = chans[0][i];
        chans[0][i] = chans[1][i] + side;
      }
    } else {  // mid, side
      for (int i = 0; i < block_size; ++i) {
        int64_t mid = chans[0][i];
        int64_t side = chans[1][i];
        mid = (mid << 1) | (side & 1);
        chans[0][i] = (mid + side) >> 1;
        chans[1][i] = (mid - side) >> 1;
      }
    }
  }
  br->align();
  br->read_bits(16, &ok);  // CRC-16 (unchecked)

  float scale = 1.0f / (float)(1u << (si.bits - 1));
  for (int i = 0; i < block_size; ++i) {
    out->push_back((float)chans[0][i] * scale);
  }
  return block_size;
}

bool load_file(const char* path, std::vector<uint8_t>* buf) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  if (fseek(f, 0, SEEK_END) != 0) {
    fclose(f);
    return false;
  }
  long n = ftell(f);
  if (n < 0) {  // non-seekable/special file: (size_t)-1 resize would throw
    // std::bad_alloc through the extern "C" boundary and kill the caller
    fclose(f);
    return false;
  }
  fseek(f, 0, SEEK_SET);
  buf->resize((size_t)n);
  bool ok = fread(buf->data(), 1, (size_t)n, f) == (size_t)n;
  fclose(f);
  return ok;
}

}  // namespace

extern "C" {

int flac_info(const char* path, int* sample_rate, int64_t* num_frames,
              int* channels, int* bits) {
  std::vector<uint8_t> buf;
  if (!load_file(path, &buf)) return -1;
  StreamInfo si;
  if (!parse_streaminfo(buf.data(), buf.size(), &si)) return -2;
  if (sample_rate) *sample_rate = (int)si.sample_rate;
  if (num_frames) *num_frames = (int64_t)si.total_samples;
  if (channels) *channels = si.channels;
  if (bits) *bits = si.bits;
  return 0;
}

// Decode and return `num_frames` channel-0 samples starting at
// `frame_offset` (zero-pads a short tail).  Whole-file decode then slice —
// FLAC frames are variable-size so true seeking needs a seektable; the
// corpora's clips are short (seconds), so this stays cheap.
int flac_read_f32(const char* path, int64_t frame_offset, int64_t num_frames,
                  float* out_buf, int64_t* frames_read, int* sample_rate) {
  std::vector<uint8_t> buf;
  if (!load_file(path, &buf)) return -1;
  StreamInfo si;
  if (!parse_streaminfo(buf.data(), buf.size(), &si)) return -2;
  if (sample_rate) *sample_rate = (int)si.sample_rate;

  BitReader br{buf.data(), buf.size()};
  br.byte = si.audio_offset;
  std::vector<float> samples;
  // STREAMINFO total_samples == 0 legally means "unknown" (streaming
  // encoders): decode until the frames run out instead of stopping at 0
  const bool unknown_total = si.total_samples == 0;
  int64_t want_end = num_frames < 0
                         ? (unknown_total ? INT64_MAX
                                          : (int64_t)si.total_samples)
                         : frame_offset + num_frames;
  while ((int64_t)samples.size() < want_end) {
    if (decode_frame(&br, si, &samples) < 0) break;
  }
  int64_t n = num_frames < 0 ? (int64_t)samples.size() - frame_offset
                             : num_frames;
  int64_t copied = 0;
  for (int64_t i = 0; i < n; ++i) {
    int64_t src = frame_offset + i;
    if (src < (int64_t)samples.size()) {
      out_buf[i] = samples[(size_t)src];
      ++copied;
    } else {
      out_buf[i] = 0.0f;
    }
  }
  if (frames_read) *frames_read = copied;
  return 0;
}

}  // extern "C"
