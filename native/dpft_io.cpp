// Native data-loader tier: fast PNG decode + resize for the host pipeline.
//
// The reference has no native code (its loader is imageio+cv2 per frame);
// here the hot host-side path — 8-bit RGB and 16-bit depth PNG decoding
// with the dataset's bilinear/nearest resizes — is C++ (libpng), exposed
// through a C ABI consumed via ctypes.  Calls release the GIL (ctypes),
// so the Python-side thread pool scales decoding across cores.
//
// Build: make -C native   (produces native/libdpft_io.so)

#include <png.h>

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

struct Image {
  std::vector<uint8_t> data;  // raw rows, row-major
  uint32_t width = 0;
  uint32_t height = 0;
  int channels = 0;
  int bit_depth = 0;
};

// Decode a PNG into 8-bit RGB or keep 16-bit grayscale (depth) intact.
bool decode_png(const char* path, bool want_rgb8, Image* out) {
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return false;
  png_byte header[8];
  if (std::fread(header, 1, 8, fp) != 8 || png_sig_cmp(header, 0, 8)) {
    std::fclose(fp);
    return false;
  }
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return false;
  }
  png_init_io(png, fp);
  png_set_sig_bytes(png, 8);
  png_read_info(png, info);

  int color = png_get_color_type(png, info);
  int depth = png_get_bit_depth(png, info);

  if (want_rgb8) {
    if (depth == 16) png_set_strip_16(png);
    if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
    if (color == PNG_COLOR_TYPE_GRAY || color == PNG_COLOR_TYPE_GRAY_ALPHA)
      png_set_gray_to_rgb(png);
    if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
    png_set_strip_alpha(png);
  } else {
    // 16-bit depth maps: libpng hands big-endian; swap to host order
    if (depth == 16) png_set_swap(png);
  }
  png_read_update_info(png, info);

  out->width = png_get_image_width(png, info);
  out->height = png_get_image_height(png, info);
  out->channels = png_get_channels(png, info);
  out->bit_depth = png_get_bit_depth(png, info);
  size_t rowbytes = png_get_rowbytes(png, info);
  out->data.resize(rowbytes * out->height);
  std::vector<png_bytep> rows(out->height);
  for (uint32_t y = 0; y < out->height; ++y)
    rows[y] = out->data.data() + y * rowbytes;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  std::fclose(fp);
  return true;
}

}  // namespace

extern "C" {

// Query dimensions after an eventual resize by `scale`.
// Returns 0 on success; fills out_h/out_w of the RESIZED image.
int dpft_png_dims(const char* path, float scale, int* out_h, int* out_w) {
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return 1;
  png_byte header[8];
  if (std::fread(header, 1, 8, fp) != 8 || png_sig_cmp(header, 0, 8)) {
    std::fclose(fp);
    return 1;
  }
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return 1;
  }
  png_init_io(png, fp);
  png_set_sig_bytes(png, 8);
  png_read_info(png, info);
  int H = png_get_image_height(png, info);
  int W = png_get_image_width(png, info);
  png_destroy_read_struct(&png, &info, nullptr);
  std::fclose(fp);
  *out_h = (int)std::lround(H * scale);
  *out_w = (int)std::lround(W * scale);
  return 0;
}

// Decode an RGB PNG -> float32 CHW in [0,1], bilinearly resized by `scale`
// (PIL-style half-pixel-center sampling). `out` must hold 3*out_h*out_w.
int dpft_decode_rgb(const char* path, float scale, float* out, int out_h,
                    int out_w) {
  Image img;
  if (!decode_png(path, /*want_rgb8=*/true, &img) || img.channels < 3)
    return 1;
  const int H = img.height, W = img.width;
  const uint8_t* src = img.data.data();
  const float inv255 = 1.0f / 255.0f;
  const float sy = (float)H / out_h;
  const float sx = (float)W / out_w;
  for (int y = 0; y < out_h; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = (int)std::floor(fy);
    float wy = fy - y0;
    int y0c = y0 < 0 ? 0 : (y0 >= H ? H - 1 : y0);
    int y1c = y0 + 1 < 0 ? 0 : (y0 + 1 >= H ? H - 1 : y0 + 1);
    for (int x = 0; x < out_w; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      int x0 = (int)std::floor(fx);
      float wx = fx - x0;
      int x0c = x0 < 0 ? 0 : (x0 >= W ? W - 1 : x0);
      int x1c = x0 + 1 < 0 ? 0 : (x0 + 1 >= W ? W - 1 : x0 + 1);
      for (int c = 0; c < 3; ++c) {
        float v00 = src[(y0c * W + x0c) * img.channels + c];
        float v01 = src[(y0c * W + x1c) * img.channels + c];
        float v10 = src[(y1c * W + x0c) * img.channels + c];
        float v11 = src[(y1c * W + x1c) * img.channels + c];
        float v = v00 * (1 - wx) * (1 - wy) + v01 * wx * (1 - wy) +
                  v10 * (1 - wx) * wy + v11 * wx * wy;
        out[(c * out_h + y) * out_w + x] = v * inv255;
      }
    }
  }
  return 0;
}

// Decode a 16-bit depth PNG -> float32 [out_h, out_w] in meters
// (value/depth_scale), nearest-neighbor resized, clipped to
// [clip_min, clip_max] when clip_max > 0.
int dpft_decode_depth16(const char* path, float scale, float depth_scale,
                        float clip_min, float clip_max, float* out, int out_h,
                        int out_w) {
  Image img;
  if (!decode_png(path, /*want_rgb8=*/false, &img)) return 1;
  if (img.channels != 1) return 2;
  const int H = img.height, W = img.width;
  const float inv = 1.0f / depth_scale;
  const float sy = (float)H / out_h;
  const float sx = (float)W / out_w;
  const bool is16 = img.bit_depth == 16;
  const uint16_t* src16 = reinterpret_cast<const uint16_t*>(img.data.data());
  const uint8_t* src8 = img.data.data();
  for (int y = 0; y < out_h; ++y) {
    // cv2 INTER_NEAREST convention: src = floor(dst * scale), no offset
    int yy = (int)(y * sy);
    if (yy >= H) yy = H - 1;
    for (int x = 0; x < out_w; ++x) {
      int xx = (int)(x * sx);
      if (xx >= W) xx = W - 1;
      float v = (is16 ? (float)src16[yy * W + xx] : (float)src8[yy * W + xx]) * inv;
      if (clip_max > 0) {
        if (v < clip_min) v = clip_min;
        if (v > clip_max) v = clip_max;
      }
      out[y * out_w + x] = v;
    }
  }
  return 0;
}

}  // extern "C"
