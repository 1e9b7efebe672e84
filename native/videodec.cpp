// In-tree video decoder: AVI (RIFF) demux + baseline JPEG (MJPEG) decode,
// plus uncompressed BGR24 AVI. Zero external dependencies.
//
// Replaces the reference's decord/OpenCV C++ decode path
// (my_affectgpt/processors/video_processor.py:194-296) for the framework's
// host-side media ingest: Python asks for N sampled frame indices and only
// those frames are entropy-decoded (decord decodes on demand too; the
// ffmpeg-pipe fallback decodes the whole clip).
//
// C ABI (ctypes):
//   videodec_probe(path, &n_frames, &width, &height)      -> 0 on success
//   videodec_read(path, indices, n, out_rgb)               -> 0 on success
//     out_rgb: caller-allocated n*height*width*3 bytes, RGB24 row-major.
//
// Scope: AVI containers with MJPG/raw streams (the formats a TPU pod's
// ingest tier can transcode to without licenses). Other codecs return
// nonzero and Python falls through to its gated backends.

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// File loading

static bool read_file(const char* path, std::vector<uint8_t>& out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long size = std::ftell(f);
  if (size <= 0) { std::fclose(f); return false; }
  std::fseek(f, 0, SEEK_SET);
  out.resize(static_cast<size_t>(size));
  size_t got = std::fread(out.data(), 1, out.size(), f);
  std::fclose(f);
  return got == out.size();
}

static uint32_t rd32(const uint8_t* p) {
  return p[0] | (p[1] << 8) | (p[2] << 16) | (uint32_t(p[3]) << 24);
}
static uint16_t rd16be(const uint8_t* p) { return uint16_t((p[0] << 8) | p[1]); }

// ---------------------------------------------------------------------------
// AVI demux

struct AviIndexEntry { size_t offset; size_t size; };

struct AviInfo {
  int width = 0, height = 0;
  uint32_t compression = 0;  // 0 = raw BGR, 'MJPG'/'mjpg'/'jpeg' = JPEG
  int bit_count = 24;
  std::vector<AviIndexEntry> frames;
};

static bool fourcc_is(const uint8_t* p, const char* s) {
  return std::memcmp(p, s, 4) == 0;
}

// Scan all RIFF chunks; record the video stream's geometry/codec from
// hdrl/strl headers and its frame chunks ('##dc'/'##db') from movi lists.
static bool parse_avi(const std::vector<uint8_t>& buf, AviInfo& info) {
  if (buf.size() < 12 || !fourcc_is(buf.data(), "RIFF") ||
      !fourcc_is(buf.data() + 8, "AVI "))
    return false;

  int stream_counter = 0, video_stream = -1;
  bool next_strf_is_video = false;

  // iterative chunk walk with an explicit stack of (pos, end)
  struct Span { size_t pos, end; };
  std::vector<Span> stack;
  stack.push_back({12, buf.size()});

  char want0 = '0', want1 = '0';  // video stream id digits, set once known

  while (!stack.empty()) {
    Span& top = stack.back();
    if (top.pos + 8 > top.end) { stack.pop_back(); continue; }
    const uint8_t* hdr = buf.data() + top.pos;
    uint32_t size = rd32(hdr + 4);
    size_t body = top.pos + 8;
    size_t next = body + size + (size & 1);
    if (body + size > buf.size()) break;  // truncated file: stop cleanly
    top.pos = next;

    if (fourcc_is(hdr, "LIST")) {
      // descend into hdrl / strl / movi (and odml etc. harmlessly)
      stack.push_back({body + 4, body + size});
      continue;
    }
    if (fourcc_is(hdr, "avih")) {
      if (size >= 40) {
        info.width = int(rd32(buf.data() + body + 32));
        info.height = int(rd32(buf.data() + body + 36));
      }
    } else if (fourcc_is(hdr, "strh")) {
      // a zero-size strh at EOF passes the body+size bound check but has
      // no fourcc to read — guard before the 4-byte read
      next_strf_is_video = size >= 4 && fourcc_is(buf.data() + body, "vids");
      if (next_strf_is_video && video_stream < 0) {
        video_stream = stream_counter;
        want0 = char('0' + video_stream / 10);
        want1 = char('0' + video_stream % 10);
      }
      stream_counter++;
    } else if (fourcc_is(hdr, "strf")) {
      if (next_strf_is_video && size >= 20) {
        // BITMAPINFOHEADER
        info.width = int(rd32(buf.data() + body + 4));
        int h = int(rd32(buf.data() + body + 8));
        info.height = h < 0 ? -h : h;
        info.bit_count = buf[body + 14] | (buf[body + 15] << 8);
        info.compression = rd32(buf.data() + body + 16);
        next_strf_is_video = false;
      }
    } else if (video_stream >= 0 && hdr[0] == want0 && hdr[1] == want1 &&
               hdr[2] == 'd' && (hdr[3] == 'c' || hdr[3] == 'b')) {
      if (size > 0) info.frames.push_back({body, size});
    }
  }
  return info.width > 0 && info.height > 0 && !info.frames.empty();
}

// ---------------------------------------------------------------------------
// Baseline JPEG decoder

static const int kZigzag[64] = {
    0,  1,  8,  16, 9,  2,  3,  10, 17, 24, 32, 25, 18, 11, 4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6,  7,  14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63};

struct HuffTable {
  // canonical decode tables (ITU T.81 F.2.2.3)
  int mincode[17];
  int maxcode[18];
  int valptr[17];
  uint8_t values[256];
  bool valid = false;

  void build(const uint8_t counts[16], const uint8_t* vals, int nvals) {
    std::memcpy(values, vals, size_t(nvals));
    int code = 0, k = 0;
    for (int len = 1; len <= 16; len++) {
      valptr[len] = k;
      mincode[len] = code;
      code += counts[len - 1];
      k += counts[len - 1];
      maxcode[len] = code - 1;
      if (counts[len - 1] == 0) maxcode[len] = -1;
      code <<= 1;
    }
    maxcode[17] = 0x7fffffff;
    valid = true;
  }
};

// JPEG Annex K default tables — MJPEG streams may omit DHT.
static const uint8_t kDcLumCounts[16] = {0,1,5,1,1,1,1,1,1,0,0,0,0,0,0,0};
static const uint8_t kDcLumVals[12] = {0,1,2,3,4,5,6,7,8,9,10,11};
static const uint8_t kDcChrCounts[16] = {0,3,1,1,1,1,1,1,1,1,1,0,0,0,0,0};
static const uint8_t kDcChrVals[12] = {0,1,2,3,4,5,6,7,8,9,10,11};
static const uint8_t kAcLumCounts[16] = {0,2,1,3,3,2,4,3,5,5,4,4,0,0,1,0x7d};
static const uint8_t kAcLumVals[162] = {
    0x01,0x02,0x03,0x00,0x04,0x11,0x05,0x12,0x21,0x31,0x41,0x06,0x13,0x51,0x61,
    0x07,0x22,0x71,0x14,0x32,0x81,0x91,0xa1,0x08,0x23,0x42,0xb1,0xc1,0x15,0x52,
    0xd1,0xf0,0x24,0x33,0x62,0x72,0x82,0x09,0x0a,0x16,0x17,0x18,0x19,0x1a,0x25,
    0x26,0x27,0x28,0x29,0x2a,0x34,0x35,0x36,0x37,0x38,0x39,0x3a,0x43,0x44,0x45,
    0x46,0x47,0x48,0x49,0x4a,0x53,0x54,0x55,0x56,0x57,0x58,0x59,0x5a,0x63,0x64,
    0x65,0x66,0x67,0x68,0x69,0x6a,0x73,0x74,0x75,0x76,0x77,0x78,0x79,0x7a,0x83,
    0x84,0x85,0x86,0x87,0x88,0x89,0x8a,0x92,0x93,0x94,0x95,0x96,0x97,0x98,0x99,
    0x9a,0xa2,0xa3,0xa4,0xa5,0xa6,0xa7,0xa8,0xa9,0xaa,0xb2,0xb3,0xb4,0xb5,0xb6,
    0xb7,0xb8,0xb9,0xba,0xc2,0xc3,0xc4,0xc5,0xc6,0xc7,0xc8,0xc9,0xca,0xd2,0xd3,
    0xd4,0xd5,0xd6,0xd7,0xd8,0xd9,0xda,0xe1,0xe2,0xe3,0xe4,0xe5,0xe6,0xe7,0xe8,
    0xe9,0xea,0xf1,0xf2,0xf3,0xf4,0xf5,0xf6,0xf7,0xf8,0xf9,0xfa};
static const uint8_t kAcChrCounts[16] = {0,2,1,2,4,4,3,4,7,5,4,4,0,1,2,0x77};
static const uint8_t kAcChrVals[162] = {
    0x00,0x01,0x02,0x03,0x11,0x04,0x05,0x21,0x31,0x06,0x12,0x41,0x51,0x07,0x61,
    0x71,0x13,0x22,0x32,0x81,0x08,0x14,0x42,0x91,0xa1,0xb1,0xc1,0x09,0x23,0x33,
    0x52,0xf0,0x15,0x62,0x72,0xd1,0x0a,0x16,0x24,0x34,0xe1,0x25,0xf1,0x17,0x18,
    0x19,0x1a,0x26,0x27,0x28,0x29,0x2a,0x35,0x36,0x37,0x38,0x39,0x3a,0x43,0x44,
    0x45,0x46,0x47,0x48,0x49,0x4a,0x53,0x54,0x55,0x56,0x57,0x58,0x59,0x5a,0x63,
    0x64,0x65,0x66,0x67,0x68,0x69,0x6a,0x73,0x74,0x75,0x76,0x77,0x78,0x79,0x7a,
    0x82,0x83,0x84,0x85,0x86,0x87,0x88,0x89,0x8a,0x92,0x93,0x94,0x95,0x96,0x97,
    0x98,0x99,0x9a,0xa2,0xa3,0xa4,0xa5,0xa6,0xa7,0xa8,0xa9,0xaa,0xb2,0xb3,0xb4,
    0xb5,0xb6,0xb7,0xb8,0xb9,0xba,0xc2,0xc3,0xc4,0xc5,0xc6,0xc7,0xc8,0xc9,0xca,
    0xd2,0xd3,0xd4,0xd5,0xd6,0xd7,0xd8,0xd9,0xda,0xe2,0xe3,0xe4,0xe5,0xe6,0xe7,
    0xe8,0xe9,0xea,0xf2,0xf3,0xf4,0xf5,0xf6,0xf7,0xf8,0xf9,0xfa};

struct BitReader {
  const uint8_t* data;
  size_t size, pos = 0;
  uint32_t bits = 0;
  int nbits = 0;
  bool marker_hit = false;

  explicit BitReader(const uint8_t* d, size_t n) : data(d), size(n) {}

  void refill() {
    while (nbits <= 24) {
      if (pos >= size) { bits |= 0; nbits += 8; continue; }  // pad with zeros
      uint8_t b = data[pos];
      if (b == 0xFF) {
        if (pos + 1 < size && data[pos + 1] == 0x00) {
          pos += 2;  // stuffed byte
        } else {
          // real marker: stop consuming; pad with zeros
          marker_hit = true;
          nbits += 8;
          continue;
        }
      } else {
        pos += 1;
      }
      bits |= uint32_t(b) << (24 - nbits);
      nbits += 8;
    }
  }

  int get_bit() {
    if (nbits < 1) refill();
    int r = int(bits >> 31);
    bits <<= 1;
    nbits -= 1;
    return r;
  }

  int get_bits(int n) {
    int r = 0;
    for (int i = 0; i < n; i++) r = (r << 1) | get_bit();
    return r;
  }

  // align to byte boundary and skip an RST marker if present
  bool sync_restart() {
    bits = 0; nbits = 0; marker_hit = false;
    while (pos + 1 < size) {
      if (data[pos] == 0xFF && data[pos + 1] >= 0xD0 && data[pos + 1] <= 0xD7) {
        pos += 2;
        return true;
      }
      pos++;
    }
    return false;
  }
};

static int huff_decode(BitReader& br, const HuffTable& h) {
  int code = br.get_bit();
  for (int len = 1; len <= 16; len++) {
    if (h.maxcode[len] >= 0 && code <= h.maxcode[len])
      return h.values[h.valptr[len] + code - h.mincode[len]];
    code = (code << 1) | br.get_bit();
  }
  return -1;
}

static int receive_extend(BitReader& br, int s) {
  if (s == 0) return 0;
  int v = br.get_bits(s);
  if (v < (1 << (s - 1))) v += (int(-1) << s) + 1;
  return v;
}

// separable float IDCT (T.81 A.3.3); host decode is not the hot path —
// pixels go to the TPU for all resize/normalize work (ops/image.py).
static void idct8x8(const int coef[64], const uint16_t quant[64], uint8_t* out,
                    int out_stride) {
  static float cs[8][8];
  static bool init = false;
  if (!init) {
    for (int x = 0; x < 8; x++)
      for (int u = 0; u < 8; u++)
        cs[x][u] = float((u == 0 ? 0.353553390593f : 0.5f) *
                         std::cos((2 * x + 1) * u * 3.14159265358979323846 / 16.0));
    init = true;
  }
  float tmp[64];
  // rows: dequantize + 1-D IDCT over u
  for (int y = 0; y < 8; y++) {
    for (int x = 0; x < 8; x++) {
      float acc = 0.f;
      for (int u = 0; u < 8; u++)
        acc += cs[x][u] * float(coef[y * 8 + u] * quant[y * 8 + u]);
      tmp[y * 8 + x] = acc;
    }
  }
  for (int x = 0; x < 8; x++) {
    for (int y = 0; y < 8; y++) {
      float acc = 0.f;
      for (int v = 0; v < 8; v++) acc += cs[y][v] * tmp[v * 8 + x];
      int px = int(std::lround(acc)) + 128;
      out[y * out_stride + x] = uint8_t(px < 0 ? 0 : (px > 255 ? 255 : px));
    }
  }
}

struct JpegComponent {
  int id = 0, h = 1, v = 1, tq = 0, td = 0, ta = 0;
  std::vector<uint8_t> plane;  // h_blocks*8 x v_blocks*8
  int plane_w = 0, plane_h = 0;
  int dc_pred = 0;
};

struct JpegDecoder {
  uint16_t quant[4][64] = {};
  HuffTable dc[4], ac[4];
  JpegComponent comp[3];
  int ncomp = 0, width = 0, height = 0;
  int restart_interval = 0;
  // coefficient-capture mode (device-side decode): entropy decode only,
  // dequantized/iDCT'd on the TPU (ops/jpeg.py). Blocks land per
  // component, row-major over the component's padded block grid, 64
  // NATURAL-order (de-zigzagged) int16 coefficients each.
  int16_t* coef_sink = nullptr;
  bool headers_only = false;  // stop at SOS (geometry probe)
  int mcux = 0, mcuy = 0;

  bool decode(const uint8_t* data, size_t size, std::vector<uint8_t>& rgb);
  bool decode_scan(const uint8_t* data, size_t size, size_t& pos);
  // total coefficient blocks per frame across components (padded grids)
  size_t total_blocks() const {
    int hmax = 1, vmax = 1;
    for (int c = 0; c < ncomp; c++) {
      hmax = comp[c].h > hmax ? comp[c].h : hmax;
      vmax = comp[c].v > vmax ? comp[c].v : vmax;
    }
    size_t mx = (size_t(width) + 8 * hmax - 1) / (8 * hmax);
    size_t my = (size_t(height) + 8 * vmax - 1) / (8 * vmax);
    size_t n = 0;
    for (int c = 0; c < ncomp; c++) n += mx * comp[c].h * my * comp[c].v;
    return n;
  }
};

bool JpegDecoder::decode_scan(const uint8_t* data, size_t size, size_t& pos) {
  // SOS header
  if (pos + 2 > size) return false;
  uint16_t len = rd16be(data + pos);
  size_t hdr = pos + 2;
  int ns = data[hdr];
  if (ns != ncomp) { /* allow 1-comp scans only when ncomp==1 */ if (!(ns == 1 && ncomp == 1)) return false; }
  for (int i = 0; i < ns; i++) {
    int cid = data[hdr + 1 + 2 * i];
    int tables = data[hdr + 2 + 2 * i];
    for (int c = 0; c < ncomp; c++)
      if (comp[c].id == cid) {
        comp[c].td = tables >> 4;
        comp[c].ta = tables & 15;
      }
  }
  pos += len;  // entropy data begins here

  int hmax = 1, vmax = 1;
  for (int c = 0; c < ncomp; c++) {
    hmax = comp[c].h > hmax ? comp[c].h : hmax;
    vmax = comp[c].v > vmax ? comp[c].v : vmax;
  }
  mcux = (width + 8 * hmax - 1) / (8 * hmax);
  mcuy = (height + 8 * vmax - 1) / (8 * vmax);
  size_t comp_base[3] = {0, 0, 0};
  for (int c = 0; c < ncomp; c++) {
    comp[c].plane_w = mcux * comp[c].h * 8;
    comp[c].plane_h = mcuy * comp[c].v * 8;
    if (coef_sink == nullptr)
      comp[c].plane.assign(size_t(comp[c].plane_w) * comp[c].plane_h, 128);
    comp[c].dc_pred = 0;
    if (c + 1 < ncomp)
      comp_base[c + 1] = comp_base[c] +
          size_t(mcux) * comp[c].h * size_t(mcuy) * comp[c].v;
  }

  BitReader br(data + pos, size - pos);
  int coef[64];
  int mcu_count = 0;
  for (int my = 0; my < mcuy; my++) {
    for (int mx = 0; mx < mcux; mx++) {
      if (restart_interval && mcu_count && mcu_count % restart_interval == 0) {
        if (!br.sync_restart()) return false;
        for (int c = 0; c < ncomp; c++) comp[c].dc_pred = 0;
      }
      mcu_count++;
      for (int c = 0; c < ncomp; c++) {
        JpegComponent& co = comp[c];
        const HuffTable& hdc = dc[co.td];
        const HuffTable& hac = ac[co.ta];
        if (!hdc.valid || !hac.valid) return false;
        for (int by = 0; by < co.v; by++) {
          for (int bx = 0; bx < co.h; bx++) {
            std::memset(coef, 0, sizeof(coef));
            int t = huff_decode(br, hdc);
            if (t < 0) return false;
            co.dc_pred += receive_extend(br, t);
            coef[0] = co.dc_pred;
            for (int k = 1; k < 64;) {
              int rs = huff_decode(br, hac);
              if (rs < 0) return false;
              int r = rs >> 4, s = rs & 15;
              if (s == 0) {
                if (r != 15) break;
                k += 16;
              } else {
                k += r;
                if (k > 63) return false;
                coef[kZigzag[k]] = receive_extend(br, s);
                k++;
              }
            }
            if (coef_sink) {
              size_t row = size_t(my) * co.v + by;
              size_t col = size_t(mx) * co.h + bx;
              int16_t* dst = coef_sink +
                  (comp_base[c] + row * (size_t(mcux) * co.h) + col) * 64;
              for (int i = 0; i < 64; i++) {
                int v2 = coef[i];
                dst[i] = int16_t(v2 < -32768 ? -32768 : (v2 > 32767 ? 32767 : v2));
              }
            } else {
              int px = (mx * co.h + bx) * 8, py = (my * co.v + by) * 8;
              idct8x8(coef, quant[co.tq],
                      co.plane.data() + size_t(py) * co.plane_w + px, co.plane_w);
            }
          }
        }
      }
    }
  }
  pos += br.pos;
  return true;
}

bool JpegDecoder::decode(const uint8_t* data, size_t size,
                         std::vector<uint8_t>& rgb) {
  if (size < 4 || data[0] != 0xFF || data[1] != 0xD8) return false;  // SOI
  size_t pos = 2;
  bool have_sof = false, done_scan = false;
  while (pos + 4 <= size && !done_scan) {
    if (data[pos] != 0xFF) { pos++; continue; }
    uint8_t marker = data[pos + 1];
    pos += 2;
    if (marker == 0xD8 || (marker >= 0xD0 && marker <= 0xD7)) continue;
    if (marker == 0xD9) break;  // EOI
    if (pos + 2 > size) return false;
    uint16_t len = rd16be(data + pos);
    if (pos + len > size) return false;

    switch (marker) {
      case 0xDB: {  // DQT
        size_t p = pos + 2, end = pos + len;
        while (p < end) {
          int pq = data[p] >> 4, tq = data[p] & 15;
          p++;
          if (tq > 3) return false;
          for (int i = 0; i < 64; i++) {
            int v = pq ? rd16be(data + p + 2 * i) : data[p + i];
            quant[tq][kZigzag[i]] = uint16_t(v);
          }
          p += pq ? 128 : 64;
        }
        break;
      }
      case 0xC4: {  // DHT
        size_t p = pos + 2, end = pos + len;
        while (p + 17 <= end) {
          int tc = data[p] >> 4, th = data[p] & 15;
          p++;
          if (th > 3) return false;
          uint8_t counts[16];
          int total = 0;
          for (int i = 0; i < 16; i++) { counts[i] = data[p + i]; total += counts[i]; }
          p += 16;
          if (total > 256 || p + size_t(total) > end) return false;
          (tc == 0 ? this->dc[th] : this->ac[th]).build(counts, data + p, total);
          p += size_t(total);
        }
        break;
      }
      case 0xC0: case 0xC1: {  // SOF0/1 baseline
        size_t p = pos + 2;
        height = rd16be(data + p + 1);
        width = rd16be(data + p + 3);
        ncomp = data[p + 5];
        if (ncomp != 1 && ncomp != 3) return false;
        for (int c = 0; c < ncomp; c++) {
          comp[c].id = data[p + 6 + 3 * c];
          comp[c].h = data[p + 7 + 3 * c] >> 4;
          comp[c].v = data[p + 7 + 3 * c] & 15;
          comp[c].tq = data[p + 8 + 3 * c];
          if (comp[c].h < 1 || comp[c].h > 4 || comp[c].v < 1 || comp[c].v > 4)
            return false;
        }
        have_sof = true;
        break;
      }
      case 0xC2: return false;  // progressive unsupported (baseline only)
      case 0xDD:  // DRI
        restart_interval = rd16be(data + pos + 2);
        break;
      case 0xDA: {  // SOS
        if (!have_sof) return false;
        if (headers_only) return true;  // geometry probe: stop pre-scan
        // MJPEG may omit DHT: install Annex K defaults for missing tables
        if (!dc[0].valid) dc[0].build(kDcLumCounts, kDcLumVals, 12);
        if (!ac[0].valid) ac[0].build(kAcLumCounts, kAcLumVals, 162);
        if (ncomp == 3) {
          if (!dc[1].valid) dc[1].build(kDcChrCounts, kDcChrVals, 12);
          if (!ac[1].valid) ac[1].build(kAcChrCounts, kAcChrVals, 162);
        }
        if (!decode_scan(data, size, pos)) return false;
        done_scan = true;
        continue;
      }
      default:
        break;  // APPn/COM: skip
    }
    pos += len;
  }
  if (!done_scan) return false;
  if (coef_sink) return true;  // capture mode: pixels are made on-device

  // upsample + color convert
  rgb.resize(size_t(width) * height * 3);
  int hmax = 1, vmax = 1;
  for (int c = 0; c < ncomp; c++) {
    hmax = comp[c].h > hmax ? comp[c].h : hmax;
    vmax = comp[c].v > vmax ? comp[c].v : vmax;
  }
  for (int y = 0; y < height; y++) {
    for (int x = 0; x < width; x++) {
      uint8_t* px = rgb.data() + (size_t(y) * width + x) * 3;
      if (ncomp == 1) {
        uint8_t g = comp[0].plane[size_t(y) * comp[0].plane_w + x];
        px[0] = px[1] = px[2] = g;
        continue;
      }
      // center-aligned bilinear upsampling (matches libjpeg's "fancy"
      // triangle filter for the common 2x factors; identity at 1x)
      auto sample = [&](const JpegComponent& co) -> float {
        if (co.h == hmax && co.v == vmax)
          return float(co.plane[size_t(y) * co.plane_w + x]);
        int sub_w = (width * co.h + hmax - 1) / hmax;
        int sub_h = (height * co.v + vmax - 1) / vmax;
        float fx = (x + 0.5f) * co.h / hmax - 0.5f;
        float fy = (y + 0.5f) * co.v / vmax - 0.5f;
        int x0 = int(std::floor(fx)), y0 = int(std::floor(fy));
        float ax = fx - x0, ay = fy - y0;
        auto at = [&](int yy, int xx) -> float {
          xx = xx < 0 ? 0 : (xx >= sub_w ? sub_w - 1 : xx);
          yy = yy < 0 ? 0 : (yy >= sub_h ? sub_h - 1 : yy);
          return float(co.plane[size_t(yy) * co.plane_w + xx]);
        };
        return (1 - ay) * ((1 - ax) * at(y0, x0) + ax * at(y0, x0 + 1)) +
               ay * ((1 - ax) * at(y0 + 1, x0) + ax * at(y0 + 1, x0 + 1));
      };
      float Y = sample(comp[0]);
      float Cb = sample(comp[1]) - 128.f;
      float Cr = sample(comp[2]) - 128.f;
      int r = int(std::lround(Y + 1.402f * Cr));
      int g = int(std::lround(Y - 0.344136f * Cb - 0.714136f * Cr));
      int b = int(std::lround(Y + 1.772f * Cb));
      px[0] = uint8_t(r < 0 ? 0 : (r > 255 ? 255 : r));
      px[1] = uint8_t(g < 0 ? 0 : (g > 255 ? 255 : g));
      px[2] = uint8_t(b < 0 ? 0 : (b > 255 ? 255 : b));
    }
  }
  return true;
}

// ---------------------------------------------------------------------------
// Frame extraction

static bool is_mjpeg(uint32_t fourcc) {
  char s[5] = {char(fourcc & 0xFF), char((fourcc >> 8) & 0xFF),
               char((fourcc >> 16) & 0xFF), char((fourcc >> 24) & 0xFF), 0};
  for (char* c = s; *c; c++) if (*c >= 'a' && *c <= 'z') *c = char(*c - 32);
  return std::strcmp(s, "MJPG") == 0 || std::strcmp(s, "JPEG") == 0 ||
         std::strcmp(s, "DMB1") == 0 || std::strcmp(s, "AVI1") == 0;
}

static bool decode_frame(const std::vector<uint8_t>& buf, const AviInfo& info,
                         const AviIndexEntry& e, int width, int height,
                         uint8_t* out) {
  if (is_mjpeg(info.compression)) {
    JpegDecoder dec;
    std::vector<uint8_t> rgb;
    if (!dec.decode(buf.data() + e.offset, e.size, rgb)) return false;
    if (dec.width != width || dec.height != height) return false;
    std::memcpy(out, rgb.data(), rgb.size());
    return true;
  }
  if (info.compression == 0 && info.bit_count == 24) {
    // raw BGR24, rows padded to 4 bytes, bottom-up
    size_t row_bytes = (size_t(width) * 3 + 3) & ~size_t(3);
    if (e.size < row_bytes * size_t(height)) return false;
    for (int y = 0; y < height; y++) {
      const uint8_t* src = buf.data() + e.offset + row_bytes * size_t(height - 1 - y);
      uint8_t* dst = out + size_t(y) * width * 3;
      for (int x = 0; x < width; x++) {
        dst[x * 3 + 0] = src[x * 3 + 2];
        dst[x * 3 + 1] = src[x * 3 + 1];
        dst[x * 3 + 2] = src[x * 3 + 0];
      }
    }
    return true;
  }
  return false;  // unsupported codec
}

}  // namespace

extern "C" {

int videodec_probe(const char* path, int* n_frames, int* width, int* height) {
  std::vector<uint8_t> buf;
  if (!read_file(path, buf)) return 1;
  AviInfo info;
  if (!parse_avi(buf, info)) return 2;
  if (!is_mjpeg(info.compression) &&
      !(info.compression == 0 && info.bit_count == 24))
    return 3;  // codec unsupported — caller should fall back
  *n_frames = int(info.frames.size());
  *width = info.width;
  *height = info.height;
  return 0;
}

int videodec_read(const char* path, const int* indices, int n,
                  unsigned char* out) {
  std::vector<uint8_t> buf;
  if (!read_file(path, buf)) return 1;
  AviInfo info;
  if (!parse_avi(buf, info)) return 2;
  size_t frame_bytes = size_t(info.width) * info.height * 3;
  for (int i = 0; i < n; i++) {
    int idx = indices[i];
    if (idx < 0 || size_t(idx) >= info.frames.size()) return 4;
    if (!decode_frame(buf, info, info.frames[size_t(idx)], info.width,
                      info.height, out + size_t(i) * frame_bytes))
      return 5;
  }
  return 0;
}

// --- device-side JPEG decode split -----------------------------------------
// The host does the inherently-serial entropy decode only; dequantization,
// iDCT, chroma upsampling and color conversion run on the TPU
// (affectgpt_tpu/ops/jpeg.py). Coefficients are per component, row-major
// over the component's padded block grid, 64 natural-order int16 each.

// Probe frame 0's JPEG geometry. sampling: h0,v0,h1,v1,h2,v2 (0 for absent
// components). Returns 0 on success; nonzero → caller uses the pixel path.
int videodec_probe_coeffs(const char* path, int* n_frames, int* width,
                          int* height, int* ncomp, int* sampling,
                          int* blocks_per_frame) {
  std::vector<uint8_t> buf;
  if (!read_file(path, buf)) return 1;
  AviInfo info;
  if (!parse_avi(buf, info)) return 2;
  if (!is_mjpeg(info.compression)) return 3;  // coeff split is JPEG-only
  JpegDecoder dec;
  dec.headers_only = true;
  std::vector<uint8_t> unused;
  const AviIndexEntry& e = info.frames[0];
  if (!dec.decode(buf.data() + e.offset, e.size, unused)) return 5;
  *n_frames = int(info.frames.size());
  *width = dec.width;
  *height = dec.height;
  *ncomp = dec.ncomp;
  for (int c = 0; c < 3; c++) {
    sampling[2 * c] = c < dec.ncomp ? dec.comp[c].h : 0;
    sampling[2 * c + 1] = c < dec.ncomp ? dec.comp[c].v : 0;
  }
  *blocks_per_frame = int(dec.total_blocks());
  return 0;
}

// Entropy-decode the requested frames into out_coef
// [n, blocks_per_frame, 64] int16 and write the per-component dequant
// tables (natural order) into out_quant [ncomp, 64]. The caller sized
// out_coef from videodec_probe_coeffs (stream frame 0), so EVERY frame's
// headers are validated against frame 0's geometry BEFORE any
// coefficients are written (a mixed-geometry frame must not overrun the
// caller's buffer), and per-frame quantization tables must match frame
// 0's (a variable-quality stream would otherwise be silently dequantized
// with the wrong tables on device). Returns: 6 = geometry mismatch,
// 7 = quant-table mismatch — Python falls back to the host pixel path.
int videodec_read_coeffs(const char* path, const int* indices, int n,
                         int16_t* out_coef, uint16_t* out_quant) {
  std::vector<uint8_t> buf;
  if (!read_file(path, buf)) return 1;
  AviInfo info;
  if (!parse_avi(buf, info)) return 2;
  if (!is_mjpeg(info.compression)) return 3;
  std::vector<uint8_t> unused;
  // reference geometry + tables: stream frame 0 (what probe_coeffs saw)
  JpegDecoder ref;
  ref.headers_only = true;
  const AviIndexEntry& e0 = info.frames[0];
  if (!ref.decode(buf.data() + e0.offset, e0.size, unused)) return 5;
  size_t blocks = ref.total_blocks();
  for (int c = 0; c < ref.ncomp; c++)
    std::memcpy(out_quant + size_t(c) * 64, ref.quant[ref.comp[c].tq],
                64 * sizeof(uint16_t));
  for (int i = 0; i < n; i++) {
    int idx = indices[i];
    if (idx < 0 || size_t(idx) >= info.frames.size()) return 4;
    const AviIndexEntry& e = info.frames[size_t(idx)];
    // headers-only pre-pass: geometry/table validation before the sink
    // decode may write anything
    JpegDecoder hdr;
    hdr.headers_only = true;
    if (!hdr.decode(buf.data() + e.offset, e.size, unused)) return 5;
    if (hdr.width != ref.width || hdr.height != ref.height ||
        hdr.ncomp != ref.ncomp)
      return 6;
    for (int c = 0; c < hdr.ncomp; c++) {
      if (hdr.comp[c].h != ref.comp[c].h || hdr.comp[c].v != ref.comp[c].v)
        return 6;
      if (std::memcmp(hdr.quant[hdr.comp[c].tq], ref.quant[ref.comp[c].tq],
                      64 * sizeof(uint16_t)) != 0)
        return 7;
    }
    JpegDecoder dec;
    dec.coef_sink = out_coef + size_t(i) * blocks * 64;
    std::memset(dec.coef_sink, 0, blocks * 64 * sizeof(int16_t));
    if (!dec.decode(buf.data() + e.offset, e.size, unused)) return 5;
  }
  return 0;
}

}  // extern "C"
