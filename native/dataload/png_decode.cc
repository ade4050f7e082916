// Native PNG decoder for the data pipeline (SURVEY.md §3 C9/C10: the
// reference decodes its paired stereo/temporal images and 16-bit ground
// truth through OpenCV's C++ imdecode; this is the owned TPU-framework
// equivalent — a dependency-light C++ decoder for exactly the formats the
// datasets use, exposed to Python over ctypes (cerberusnet_tpu/data/
// native_io.py) and run inside the DataLoader's decode thread pool, which
// parallelizes because ctypes drops the GIL).
//
// Supported (everything KITTI-2015 / Cityscapes ship):
//   * bit depth 8 or 16 (16-bit samples are big-endian per the PNG spec)
//   * color types 0 (gray), 2 (RGB), 4 (gray+alpha), 6 (RGBA)
//   * all five scanline filters (None/Sub/Up/Average/Paeth)
//   * non-interlaced only (interlace=1 returns an error -> caller falls
//     back to OpenCV)
// Palette images (color type 3) are not used by either dataset and return
// an error code.
//
// API (C, ctypes-friendly):
//   cnt_png_decode(path, &data, &h, &w, &channels, &bitdepth) -> 0 on
//     success; data is malloc'd row-major (h, w, channels), uint8 or
//     native-endian uint16, freed with cnt_png_free.
//   cnt_png_error(code) -> static string for diagnostics.
//
// Build: make -C native/dataload  (g++ + zlib only).

#include <zlib.h>

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

enum ErrorCode {
  OK = 0,
  ERR_OPEN = 1,
  ERR_SIGNATURE = 2,
  ERR_TRUNCATED = 3,
  ERR_UNSUPPORTED_COLOR = 4,
  ERR_UNSUPPORTED_DEPTH = 5,
  ERR_INTERLACED = 6,
  ERR_INFLATE = 7,
  ERR_BAD_FILTER = 8,
  ERR_NO_IHDR = 9,
  ERR_ALLOC = 10,
};

uint32_t be32(const uint8_t* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
         (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

int paeth(int a, int b, int c) {
  int p = a + b - c;
  int pa = std::abs(p - a), pb = std::abs(p - b), pc = std::abs(p - c);
  if (pa <= pb && pa <= pc) return a;
  if (pb <= pc) return b;
  return c;
}

// Undo the per-scanline filters in place over the raw inflated stream
// (each row: 1 filter byte + rowbytes of data). Writes the defiltered
// rows contiguously into `out`.
int defilter(const uint8_t* raw, size_t raw_size, uint32_t height,
             size_t rowbytes, size_t bpp, uint8_t* out) {
  if (raw_size < height * (rowbytes + 1)) return ERR_TRUNCATED;
  const uint8_t* prev = nullptr;
  for (uint32_t y = 0; y < height; ++y) {
    uint8_t filter = raw[y * (rowbytes + 1)];
    const uint8_t* src = raw + y * (rowbytes + 1) + 1;
    uint8_t* dst = out + y * rowbytes;
    switch (filter) {
      case 0:  // None
        std::memcpy(dst, src, rowbytes);
        break;
      case 1:  // Sub
        for (size_t x = 0; x < rowbytes; ++x)
          dst[x] = src[x] + (x >= bpp ? dst[x - bpp] : 0);
        break;
      case 2:  // Up
        for (size_t x = 0; x < rowbytes; ++x)
          dst[x] = src[x] + (prev ? prev[x] : 0);
        break;
      case 3:  // Average
        for (size_t x = 0; x < rowbytes; ++x) {
          int a = x >= bpp ? dst[x - bpp] : 0;
          int b = prev ? prev[x] : 0;
          dst[x] = src[x] + uint8_t((a + b) >> 1);
        }
        break;
      case 4:  // Paeth
        for (size_t x = 0; x < rowbytes; ++x) {
          int a = x >= bpp ? dst[x - bpp] : 0;
          int b = prev ? prev[x] : 0;
          int c = (prev && x >= bpp) ? prev[x - bpp] : 0;
          dst[x] = src[x] + uint8_t(paeth(a, b, c));
        }
        break;
      default:
        return ERR_BAD_FILTER;
    }
    prev = dst;
  }
  return OK;
}

}  // namespace

extern "C" {

const char* cnt_png_error(int code) {
  switch (code) {
    case OK: return "ok";
    case ERR_OPEN: return "cannot open file";
    case ERR_SIGNATURE: return "not a PNG (bad signature)";
    case ERR_TRUNCATED: return "truncated stream";
    case ERR_UNSUPPORTED_COLOR: return "unsupported color type (palette?)";
    case ERR_UNSUPPORTED_DEPTH: return "unsupported bit depth";
    case ERR_INTERLACED: return "interlaced PNG unsupported";
    case ERR_INFLATE: return "zlib inflate failed";
    case ERR_BAD_FILTER: return "bad scanline filter";
    case ERR_NO_IHDR: return "missing IHDR";
    case ERR_ALLOC: return "allocation failed";
    default: return "unknown error";
  }
}

void cnt_png_free(void* p) { std::free(p); }

int cnt_png_decode(const char* path, void** data_out, uint32_t* height_out,
                   uint32_t* width_out, uint32_t* channels_out,
                   uint32_t* bitdepth_out) {
  *data_out = nullptr;
  std::FILE* f = std::fopen(path, "rb");
  if (!f) return ERR_OPEN;
  std::fseek(f, 0, SEEK_END);
  long fsize = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> buf(fsize > 0 ? size_t(fsize) : 0);
  if (fsize <= 8 || std::fread(buf.data(), 1, buf.size(), f) != buf.size()) {
    std::fclose(f);
    return ERR_TRUNCATED;
  }
  std::fclose(f);

  static const uint8_t sig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
  if (std::memcmp(buf.data(), sig, 8) != 0) return ERR_SIGNATURE;

  uint32_t width = 0, height = 0, bitdepth = 0, colortype = 0;
  bool have_ihdr = false;
  std::vector<uint8_t> idat;
  size_t pos = 8;
  while (pos + 8 <= buf.size()) {
    uint32_t len = be32(&buf[pos]);
    if (pos + 12 + size_t(len) > buf.size()) return ERR_TRUNCATED;
    const uint8_t* type = &buf[pos + 4];
    const uint8_t* payload = &buf[pos + 8];
    if (!std::memcmp(type, "IHDR", 4)) {
      if (len < 13) return ERR_TRUNCATED;
      width = be32(payload);
      height = be32(payload + 4);
      bitdepth = payload[8];
      colortype = payload[9];
      if (payload[12] != 0) return ERR_INTERLACED;
      have_ihdr = true;
    } else if (!std::memcmp(type, "IDAT", 4)) {
      idat.insert(idat.end(), payload, payload + len);
    } else if (!std::memcmp(type, "IEND", 4)) {
      break;
    }
    pos += 12 + len;  // len + type + payload + crc (crc not verified)
  }
  if (!have_ihdr || width == 0 || height == 0) return ERR_NO_IHDR;
  if (bitdepth != 8 && bitdepth != 16) return ERR_UNSUPPORTED_DEPTH;

  uint32_t channels;
  switch (colortype) {
    case 0: channels = 1; break;  // gray
    case 2: channels = 3; break;  // RGB
    case 4: channels = 2; break;  // gray + alpha
    case 6: channels = 4; break;  // RGBA
    default: return ERR_UNSUPPORTED_COLOR;
  }

  size_t bytes_per_sample = bitdepth / 8;
  size_t bpp = channels * bytes_per_sample;         // filter unit
  size_t rowbytes = size_t(width) * bpp;
  size_t raw_size = (rowbytes + 1) * size_t(height);

  std::vector<uint8_t> raw(raw_size);
  uLongf dest_len = raw_size;
  int zrc = uncompress(raw.data(), &dest_len, idat.data(), idat.size());
  if (zrc != Z_OK || dest_len < raw_size) return ERR_INFLATE;

  uint8_t* out = static_cast<uint8_t*>(std::malloc(rowbytes * height));
  if (!out) return ERR_ALLOC;
  int rc = defilter(raw.data(), raw_size, height, rowbytes, bpp, out);
  if (rc != OK) {
    std::free(out);
    return rc;
  }

  if (bitdepth == 16) {
    // PNG 16-bit samples are big-endian; flip to native little-endian.
    for (size_t i = 0; i + 1 < rowbytes * height; i += 2) {
      uint8_t t = out[i];
      out[i] = out[i + 1];
      out[i + 1] = t;
    }
  }

  *data_out = out;
  *height_out = height;
  *width_out = width;
  *channels_out = channels;
  *bitdepth_out = bitdepth;
  return OK;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Model-input preparation: decode + normalize + cast, the C++ twin of
// cerberusnet_tpu.data.encodings.preprocess_image (identical f32 arithmetic
// and op order) feeding the fixed-shape exported graph. Used by the PJRT
// runner's --pngs serving mode and bit-exactness-tested from Python over
// ctypes (tests/test_native_decode.py).
// ---------------------------------------------------------------------------

namespace {

constexpr float kImagenetMean[3] = {0.485f, 0.456f, 0.406f};
constexpr float kImagenetStd[3] = {0.229f, 0.224f, 0.225f};

uint16_t f32_to_bf16_rne(float v) {
  uint32_t bits;
  std::memcpy(&bits, &v, 4);
  bits += 0x7FFFu + ((bits >> 16) & 1u);  // round to nearest even
  return static_cast<uint16_t>(bits >> 16);
}

}  // namespace

extern "C" {

// Decode an 8-bit PNG at `path` (must be exactly want_h x want_w; gray
// replicates to 3 channels, alpha is stripped), normalize to
// (x/255 - imagenet_mean)/std in f32, and write the (1, H, W, 3) tensor to
// `out` as float32 (dtype_code 0) or bfloat16 (dtype_code 1, round to
// nearest even). `out` must hold want_h*want_w*3 elements. Returns 0 or a
// cnt_png_error code; ERR_UNSUPPORTED_DEPTH doubles as the wrong-size /
// wrong-depth signal with details unavailable at this ABI.
int cnt_png_to_input(const char* path, uint32_t want_h, uint32_t want_w,
                     int dtype_code, void* out) {
  void* data = nullptr;
  uint32_t h, w, ch, depth;
  int rc = cnt_png_decode(path, &data, &h, &w, &ch, &depth);
  if (rc != OK) return rc;
  if (depth != 8 || h != want_h || w != want_w) {
    cnt_png_free(data);
    return ERR_UNSUPPORTED_DEPTH;
  }
  const uint8_t* px = static_cast<const uint8_t*>(data);
  size_t n = size_t(h) * w;
  float* out_f32 = static_cast<float*>(out);
  uint16_t* out_bf16 = static_cast<uint16_t*>(out);
  for (size_t i = 0; i < n; ++i) {
    for (int c = 0; c < 3; ++c) {
      // gray (ch=1) replicates; alpha channels (ch=2/4) are stripped
      uint8_t u = ch == 1 ? px[i] : ch == 2 ? px[i * 2] : px[i * ch + c];
      float v = (float(u) / 255.0f - kImagenetMean[c]) / kImagenetStd[c];
      if (dtype_code == 0) {
        out_f32[i * 3 + c] = v;
      } else {
        out_bf16[i * 3 + c] = f32_to_bf16_rne(v);
      }
    }
  }
  cnt_png_free(data);
  return OK;
}

}  // extern "C"
