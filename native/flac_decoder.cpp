// Native FLAC decoder for the audio_llama_tpu data pipeline.
//
// Role: the host-side audio-decode hot path. The reference relies on
// torchaudio.load's C++ decoders (reference src/dataset.py:105); this image
// ships no torchaudio/soundfile/ffmpeg, and LibriSpeech is FLAC, so we carry
// our own decoder. Exposed through a minimal C ABI consumed via ctypes
// (audio_llama_tpu/data/audio_io.py) — no pybind11 dependency.
//
// Scope: full FLAC bitstream decode — constant/verbatim/fixed/LPC subframes,
// rice/rice2 residuals (incl. escape partitions), wasted bits, all four
// stereo decorrelation modes, UTF-8 frame numbers, 4-32 bit sample depths.
// CRC checking is skipped (decode speed; inputs are trusted local corpora).
//
// Build: g++ -O3 -shared -fPIC -o libflacdec.so flac_decoder.cpp

#include <cstddef>
#include <cstdint>
#include <cstring>

namespace {

struct BitReader {
  const uint8_t* p;
  const uint8_t* end;
  uint64_t cache = 0;  // right-aligned valid bits
  int ncache = 0;
  bool err = false;

  BitReader(const uint8_t* data, size_t size) : p(data), end(data + size) {}

  inline void fill() {
    while (ncache <= 56 && p < end) {
      cache = (cache << 8) | *p++;
      ncache += 8;
    }
  }

  // n in [0, 56]
  inline uint64_t read(int n) {
    if (n == 0) return 0;
    fill();
    if (ncache < n) {
      err = true;
      ncache = 0;
      return 0;
    }
    uint64_t v = (cache >> (ncache - n)) & ((n == 64) ? ~0ull : ((1ull << n) - 1));
    ncache -= n;
    return v;
  }

  inline int64_t read_signed(int n) {
    uint64_t v = read(n);
    // sign-extend
    if (n == 0) return 0;
    uint64_t sign = 1ull << (n - 1);
    return (int64_t)((v ^ sign)) - (int64_t)sign;
  }

  inline uint32_t read_unary() {
    uint32_t q = 0;
    for (;;) {
      fill();
      if (ncache == 0) {
        err = true;
        return q;
      }
      // scan the cached bits for the first 1
      while (ncache > 0) {
        uint64_t bit = (cache >> (ncache - 1)) & 1;
        ncache--;
        if (bit) return q;
        q++;
      }
    }
  }

  inline void align() { ncache -= ncache % 8; }

  // absolute byte position of next unread byte (after aligning)
  inline size_t pos() const { return (size_t)(p - (end - (end - p))); }
};

struct StreamInfo {
  uint32_t sample_rate = 0;
  uint32_t channels = 0;
  uint32_t bps = 0;
  uint64_t total_samples = 0;
};

inline uint32_t be24(const uint8_t* p) {
  return ((uint32_t)p[0] << 16) | ((uint32_t)p[1] << 8) | p[2];
}

// Parse the metadata section. Returns offset of the first audio frame, or 0
// on error. Fills StreamInfo.
size_t parse_metadata(const uint8_t* data, size_t size, StreamInfo* si) {
  if (size < 4 + 4 + 34 || memcmp(data, "fLaC", 4) != 0) return 0;
  size_t off = 4;
  bool last = false;
  bool have_streaminfo = false;
  while (!last) {
    if (off + 4 > size) return 0;
    uint8_t hdr = data[off];
    last = hdr & 0x80;
    uint8_t type = hdr & 0x7f;
    uint32_t len = be24(data + off + 1);
    off += 4;
    if (off + len > size) return 0;
    if (type == 0) {  // STREAMINFO
      const uint8_t* b = data + off;
      if (len < 34) return 0;
      si->sample_rate = ((uint32_t)b[10] << 12) | ((uint32_t)b[11] << 4) | (b[12] >> 4);
      si->channels = ((b[12] >> 1) & 0x7) + 1;
      si->bps = (((b[12] & 1) << 4) | (b[13] >> 4)) + 1;
      si->total_samples = (((uint64_t)(b[13] & 0xf)) << 32) | ((uint64_t)b[14] << 24) |
                          ((uint64_t)b[15] << 16) | ((uint64_t)b[16] << 8) | b[17];
      have_streaminfo = true;
    }
    off += len;
  }
  if (!have_streaminfo || si->sample_rate == 0) return 0;
  return off;
}

// Skip a UTF-8-style coded number (frame or sample index), up to 7 bytes.
bool skip_utf8(BitReader& br) {
  uint64_t b0 = br.read(8);
  if (br.err) return false;
  int extra = 0;
  if (b0 < 0x80) extra = 0;
  else if ((b0 & 0xE0) == 0xC0) extra = 1;
  else if ((b0 & 0xF0) == 0xE0) extra = 2;
  else if ((b0 & 0xF8) == 0xF0) extra = 3;
  else if ((b0 & 0xFC) == 0xF8) extra = 4;
  else if ((b0 & 0xFE) == 0xFC) extra = 5;
  else if (b0 == 0xFE) extra = 6;
  else return false;
  for (int i = 0; i < extra; i++) {
    uint64_t b = br.read(8);
    if (br.err || (b & 0xC0) != 0x80) return false;
  }
  return true;
}

constexpr int kMaxOrder = 32;
constexpr int kMaxBlock = 65535;

// Decode the residual section into samples[order..blocksize).
bool decode_residual(BitReader& br, int64_t* samples, uint32_t blocksize,
                     uint32_t order) {
  uint32_t method = (uint32_t)br.read(2);
  if (method > 1) return false;
  int pbits = method == 0 ? 4 : 5;
  uint32_t escape = method == 0 ? 0xF : 0x1F;
  uint32_t porder = (uint32_t)br.read(4);
  uint32_t nparts = 1u << porder;
  if ((blocksize >> porder) == 0) return false;
  uint32_t idx = order;
  for (uint32_t part = 0; part < nparts; part++) {
    uint32_t n = blocksize >> porder;
    if (part == 0) {
      if (n < order) return false;
      n -= order;
    }
    uint32_t param = (uint32_t)br.read(pbits);
    if (param == escape) {
      uint32_t raw = (uint32_t)br.read(5);
      for (uint32_t i = 0; i < n; i++) samples[idx++] = raw ? br.read_signed(raw) : 0;
    } else {
      for (uint32_t i = 0; i < n; i++) {
        uint32_t q = br.read_unary();
        uint64_t r = br.read(param);
        uint64_t u = ((uint64_t)q << param) | r;
        samples[idx++] = (int64_t)(u >> 1) ^ -(int64_t)(u & 1);
      }
    }
    if (br.err) return false;
  }
  return idx == blocksize;
}

bool decode_subframe(BitReader& br, int64_t* out, uint32_t blocksize, int bps) {
  if (br.read(1) != 0) return false;  // zero pad bit
  uint32_t type = (uint32_t)br.read(6);
  int wasted = 0;
  if (br.read(1)) wasted = (int)br.read_unary() + 1;
  if (br.err) return false;
  bps -= wasted;
  if (bps <= 0 || bps > 33) return false;

  if (type == 0) {  // CONSTANT
    int64_t v = br.read_signed(bps);
    for (uint32_t i = 0; i < blocksize; i++) out[i] = v;
  } else if (type == 1) {  // VERBATIM
    for (uint32_t i = 0; i < blocksize; i++) out[i] = br.read_signed(bps);
  } else if (type >= 8 && type <= 12) {  // FIXED, order 0-4
    uint32_t order = type - 8;
    if (order > blocksize) return false;
    for (uint32_t i = 0; i < order; i++) out[i] = br.read_signed(bps);
    if (!decode_residual(br, out, blocksize, order)) return false;
    switch (order) {
      case 0:
        break;
      case 1:
        for (uint32_t i = 1; i < blocksize; i++) out[i] += out[i - 1];
        break;
      case 2:
        for (uint32_t i = 2; i < blocksize; i++)
          out[i] += 2 * out[i - 1] - out[i - 2];
        break;
      case 3:
        for (uint32_t i = 3; i < blocksize; i++)
          out[i] += 3 * out[i - 1] - 3 * out[i - 2] + out[i - 3];
        break;
      case 4:
        for (uint32_t i = 4; i < blocksize; i++)
          out[i] += 4 * out[i - 1] - 6 * out[i - 2] + 4 * out[i - 3] - out[i - 4];
        break;
    }
  } else if (type >= 32) {  // LPC, order 1-32
    uint32_t order = type - 31;
    if (order > blocksize || order > kMaxOrder) return false;
    for (uint32_t i = 0; i < order; i++) out[i] = br.read_signed(bps);
    uint32_t prec = (uint32_t)br.read(4);
    if (prec == 0xF) return false;
    prec += 1;
    int shift = (int)br.read_signed(5);
    if (shift < 0) return false;
    int64_t coef[kMaxOrder];
    for (uint32_t i = 0; i < order; i++) coef[i] = br.read_signed(prec);
    if (!decode_residual(br, out, blocksize, order)) return false;
    for (uint32_t i = order; i < blocksize; i++) {
      int64_t acc = 0;
      for (uint32_t j = 0; j < order; j++) acc += coef[j] * out[i - 1 - j];
      out[i] += acc >> shift;
    }
  } else {
    return false;  // reserved
  }
  if (br.err) return false;
  if (wasted) {
    for (uint32_t i = 0; i < blocksize; i++) out[i] <<= wasted;
  }
  return true;
}

}  // namespace

extern "C" {

typedef struct {
  uint32_t sample_rate;
  uint32_t channels;
  uint32_t bits_per_sample;
  uint64_t total_samples;
} FlacInfo;

// Parse headers only. Returns 0 on success, negative on malformed input.
int flac_probe(const uint8_t* data, size_t size, FlacInfo* info) {
  StreamInfo si;
  size_t off = parse_metadata(data, size, &si);
  if (off == 0) return -1;
  info->sample_rate = si.sample_rate;
  info->channels = si.channels;
  info->bits_per_sample = si.bps;
  info->total_samples = si.total_samples;
  return 0;
}

// Decode the whole stream into `out` (int32, interleaved, capacity
// max_frames * channels). Returns frames decoded (samples per channel), or
// negative error.
int64_t flac_decode(const uint8_t* data, size_t size, int32_t* out,
                    uint64_t max_frames) {
  StreamInfo si;
  size_t off = parse_metadata(data, size, &si);
  if (off == 0) return -1;
  if (si.channels == 0 || si.channels > 8) return -2;

  static thread_local int64_t chan_buf[8][kMaxBlock];

  BitReader br(data + off, size - off);
  uint64_t frames_done = 0;

  while (frames_done < max_frames) {
    br.fill();
    if (br.ncache < 16 && br.p >= br.end) break;  // clean EOF
    // frame header
    uint64_t sync = br.read(14);
    if (br.err) break;
    if (sync != 0x3FFE) return -3;
    br.read(1);  // reserved
    br.read(1);  // blocking strategy
    uint32_t bs_code = (uint32_t)br.read(4);
    uint32_t sr_code = (uint32_t)br.read(4);
    uint32_t ch_code = (uint32_t)br.read(4);
    uint32_t ss_code = (uint32_t)br.read(3);
    br.read(1);  // reserved
    if (!skip_utf8(br)) return -4;

    uint32_t blocksize;
    switch (bs_code) {
      case 0: return -5;
      case 1: blocksize = 192; break;
      case 6: blocksize = (uint32_t)br.read(8) + 1; break;
      case 7: blocksize = (uint32_t)br.read(16) + 1; break;
      default:
        blocksize = (bs_code <= 5) ? (576u << (bs_code - 2))
                                   : (256u << (bs_code - 8));
    }
    if (blocksize > kMaxBlock) return -6;

    // sample-rate code: only codes 12-14 carry inline payloads to consume.
    if (sr_code == 12) br.read(8);
    else if (sr_code == 13 || sr_code == 14) br.read(16);

    uint32_t nch;
    int side = -1;  // 0: left/side, 1: right/side, 2: mid/side
    if (ch_code < 8) {
      nch = ch_code + 1;
    } else if (ch_code <= 10) {
      nch = 2;
      side = (int)(ch_code - 8);
    } else {
      return -7;
    }
    if (nch != si.channels) return -8;

    int bps;
    switch (ss_code) {
      case 0: bps = (int)si.bps; break;
      case 1: bps = 8; break;
      case 2: bps = 12; break;
      case 4: bps = 16; break;
      case 5: bps = 20; break;
      case 6: bps = 24; break;
      case 7: bps = 32; break;
      default: return -9;
    }
    br.read(8);  // header CRC-8 (unchecked)
    if (br.err) return -10;

    for (uint32_t c = 0; c < nch; c++) {
      int ch_bps = bps;
      // The side channel carries one extra bit.
      if ((side == 0 && c == 1) || (side == 1 && c == 0) || (side == 2 && c == 1))
        ch_bps += 1;
      if (!decode_subframe(br, chan_buf[c], blocksize, ch_bps)) return -11;
    }
    br.align();
    br.read(16);  // frame CRC-16 (unchecked)
    if (br.err) return -12;

    // stereo decorrelation
    if (side == 0) {  // left/side: right = left - side
      for (uint32_t i = 0; i < blocksize; i++)
        chan_buf[1][i] = chan_buf[0][i] - chan_buf[1][i];
    } else if (side == 1) {  // right/side: left = right + side
      for (uint32_t i = 0; i < blocksize; i++) {
        int64_t s = chan_buf[0][i];
        chan_buf[0][i] = chan_buf[1][i] + s;
      }
    } else if (side == 2) {  // mid/side
      for (uint32_t i = 0; i < blocksize; i++) {
        int64_t mid = chan_buf[0][i];
        int64_t s = chan_buf[1][i];
        mid = (mid << 1) | (s & 1);
        chan_buf[0][i] = (mid + s) >> 1;
        chan_buf[1][i] = (mid - s) >> 1;
      }
    }

    uint32_t take = blocksize;
    if (frames_done + take > max_frames) take = (uint32_t)(max_frames - frames_done);
    for (uint32_t i = 0; i < take; i++)
      for (uint32_t c = 0; c < nch; c++)
        out[(frames_done + i) * nch + c] = (int32_t)chan_buf[c][i];
    frames_done += take;
    if (take < blocksize) break;  // caller buffer full
  }
  return (int64_t)frames_done;
}

}  // extern "C"
