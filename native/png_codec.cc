// Native PNG codec for raytracegr_jl_tpu — the framework's image I/O runtime.
//
// The reference does PNG output through Julia's Images/ImageIO stack
// (/root/reference/src/RayTraceGR.jl:566-575). Here the codec is a small
// self-contained C++ library (zlib for DEFLATE) exposed through a C ABI and
// loaded from Python with ctypes (no pybind11 in this image). Scope: 8-bit
// RGB, the only format the renderer and the reference goldens use.
//
// Build: g++ -O2 -shared -fPIC png_codec.cc -o libpngcodec.so -lz

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

#include <zlib.h>

namespace {

const uint8_t kSig[8] = {0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n'};

uint32_t crc_of(const uint8_t* type, const uint8_t* data, size_t len) {
  uLong c = crc32(0L, Z_NULL, 0);
  c = crc32(c, type, 4);
  if (len) c = crc32(c, data, len);
  return static_cast<uint32_t>(c);
}

void put_u32(std::vector<uint8_t>& out, uint32_t v) {
  out.push_back((v >> 24) & 0xff);
  out.push_back((v >> 16) & 0xff);
  out.push_back((v >> 8) & 0xff);
  out.push_back(v & 0xff);
}

uint32_t get_u32(const uint8_t* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
         (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

void put_chunk(std::vector<uint8_t>& out, const char* type,
               const uint8_t* data, size_t len) {
  put_u32(out, static_cast<uint32_t>(len));
  const uint8_t* t = reinterpret_cast<const uint8_t*>(type);
  out.insert(out.end(), t, t + 4);
  if (len) out.insert(out.end(), data, data + len);
  put_u32(out, crc_of(t, data, len));
}

// Paeth predictor (PNG spec 9.4).
inline int paeth(int a, int b, int c) {
  int p = a + b - c, pa = abs(p - a), pb = abs(p - b), pc = abs(p - c);
  if (pa <= pb && pa <= pc) return a;
  if (pb <= pc) return b;
  return c;
}

}  // namespace

extern "C" {

// Encode 8-bit RGB (row-major, h rows of w*3 bytes) to PNG.
// Returns malloc'd buffer in *out (caller frees via rtgr_free); length in
// *out_len. Returns 0 on success.
int rtgr_png_encode(const uint8_t* rgb, int w, int h, uint8_t** out,
                    size_t* out_len) {
  if (!rgb || w <= 0 || h <= 0 || !out || !out_len) return 1;
  const size_t stride = static_cast<size_t>(w) * 3;

  // Filter: per-row adaptive (none vs. sub vs. up), minimum-sum heuristic.
  std::vector<uint8_t> raw;
  raw.reserve((stride + 1) * h);
  std::vector<uint8_t> none(stride), sub(stride), up(stride);
  for (int y = 0; y < h; ++y) {
    const uint8_t* row = rgb + y * stride;
    const uint8_t* prev = y ? rgb + (y - 1) * stride : nullptr;
    long s_none = 0, s_sub = 0, s_up = 0;
    for (size_t i = 0; i < stride; ++i) {
      uint8_t a = i >= 3 ? row[i - 3] : 0;
      uint8_t b = prev ? prev[i] : 0;
      none[i] = row[i];
      sub[i] = row[i] - a;
      up[i] = row[i] - b;
      s_none += abs(static_cast<int8_t>(none[i]));
      s_sub += abs(static_cast<int8_t>(sub[i]));
      s_up += abs(static_cast<int8_t>(up[i]));
    }
    if (s_sub <= s_none && s_sub <= s_up) {
      raw.push_back(1);
      raw.insert(raw.end(), sub.begin(), sub.end());
    } else if (s_up <= s_none) {
      raw.push_back(2);
      raw.insert(raw.end(), up.begin(), up.end());
    } else {
      raw.push_back(0);
      raw.insert(raw.end(), none.begin(), none.end());
    }
  }

  uLongf comp_cap = compressBound(raw.size());
  std::vector<uint8_t> comp(comp_cap);
  if (compress2(comp.data(), &comp_cap, raw.data(), raw.size(), 9) != Z_OK)
    return 2;

  std::vector<uint8_t> png;
  png.insert(png.end(), kSig, kSig + 8);
  uint8_t ihdr[13];
  ihdr[0] = (w >> 24) & 0xff; ihdr[1] = (w >> 16) & 0xff;
  ihdr[2] = (w >> 8) & 0xff;  ihdr[3] = w & 0xff;
  ihdr[4] = (h >> 24) & 0xff; ihdr[5] = (h >> 16) & 0xff;
  ihdr[6] = (h >> 8) & 0xff;  ihdr[7] = h & 0xff;
  ihdr[8] = 8;   // bit depth
  ihdr[9] = 2;   // color type RGB
  ihdr[10] = 0; ihdr[11] = 0; ihdr[12] = 0;
  put_chunk(png, "IHDR", ihdr, 13);
  put_chunk(png, "IDAT", comp.data(), comp_cap);
  put_chunk(png, "IEND", nullptr, 0);

  *out = static_cast<uint8_t*>(malloc(png.size()));
  if (!*out) return 3;
  memcpy(*out, png.data(), png.size());
  *out_len = png.size();
  return 0;
}

// Decode an 8-bit RGB or RGBA PNG into RGB. Returns malloc'd w*h*3 buffer.
// Grayscale/palette/interlaced are out of scope (unused by the goldens).
int rtgr_png_decode(const uint8_t* png, size_t len, uint8_t** out, int* w_out,
                    int* h_out) {
  if (!png || len < 45 || memcmp(png, kSig, 8) != 0) return 1;
  size_t pos = 8;
  int w = 0, h = 0, channels = 0;
  std::vector<uint8_t> idat;
  while (pos + 12 <= len) {
    uint32_t clen = get_u32(png + pos);
    const uint8_t* type = png + pos + 4;
    const uint8_t* data = png + pos + 8;
    if (pos + 12 + clen > len) return 2;
    if (!memcmp(type, "IHDR", 4)) {
      if (clen != 13) return 2;
      w = get_u32(data);
      h = get_u32(data + 4);
      int depth = data[8], color = data[9], interlace = data[12];
      if (depth != 8 || interlace != 0) return 3;
      if (color == 2) channels = 3;
      else if (color == 6) channels = 4;
      else return 3;
    } else if (!memcmp(type, "IDAT", 4)) {
      idat.insert(idat.end(), data, data + clen);
    } else if (!memcmp(type, "IEND", 4)) {
      break;
    }
    pos += 12 + clen;
  }
  if (w <= 0 || h <= 0 || idat.empty()) return 2;

  const size_t stride = static_cast<size_t>(w) * channels;
  std::vector<uint8_t> raw((stride + 1) * h);
  uLongf raw_len = raw.size();
  if (uncompress(raw.data(), &raw_len, idat.data(), idat.size()) != Z_OK ||
      raw_len != raw.size())
    return 4;

  // Un-filter in place into `img`.
  std::vector<uint8_t> img(stride * h);
  const int bpp = channels;
  for (int y = 0; y < h; ++y) {
    uint8_t filter = raw[y * (stride + 1)];
    const uint8_t* src = raw.data() + y * (stride + 1) + 1;
    uint8_t* dst = img.data() + y * stride;
    const uint8_t* prior = y ? img.data() + (y - 1) * stride : nullptr;
    for (size_t i = 0; i < stride; ++i) {
      int a = i >= static_cast<size_t>(bpp) ? dst[i - bpp] : 0;
      int b = prior ? prior[i] : 0;
      int c = (prior && i >= static_cast<size_t>(bpp)) ? prior[i - bpp] : 0;
      int v = src[i];
      switch (filter) {
        case 0: break;
        case 1: v += a; break;
        case 2: v += b; break;
        case 3: v += (a + b) / 2; break;
        case 4: v += paeth(a, b, c); break;
        default: return 5;
      }
      dst[i] = static_cast<uint8_t>(v);
    }
  }

  *out = static_cast<uint8_t*>(malloc(static_cast<size_t>(w) * h * 3));
  if (!*out) return 6;
  if (channels == 3) {
    memcpy(*out, img.data(), img.size());
  } else {
    for (size_t p = 0; p < static_cast<size_t>(w) * h; ++p)
      memcpy(*out + p * 3, img.data() + p * 4, 3);
  }
  *w_out = w;
  *h_out = h;
  return 0;
}

void rtgr_free(uint8_t* p) { free(p); }

}  // extern "C"
