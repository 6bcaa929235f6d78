// Native data-loader: threaded JPEG/PNG decode + bilinear resize.
//
// TPU-native equivalent of the reference's torch DataLoader worker fleet
// (SURVEY.md hard part 6: keeping 64-way DP fed with 1024^2 jpeg decode).
// One shared library, C ABI, consumed from Python via ctypes
// (sigman_release_tpu/data/native_loader.py). No pybind11 dependency.
//
// API (all return 0 on success, negative error codes otherwise):
//   slr_decode_file(path, out_f32, target_h, target_w, channels)
//       decode one image file into HWC float32 in [0,1], bilinear-resized.
//   slr_decode_batch(paths, n, out_f32, target_h, target_w, channels, n_threads)
//       decode n files concurrently into a contiguous [n, H, W, C] buffer.

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <csetjmp>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>

namespace {

struct Image {
  std::vector<uint8_t> pixels;  // HWC uint8
  int h = 0, w = 0, c = 0;
};

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jump;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jump, 1);
}

bool decode_jpeg(const uint8_t* data, size_t len, Image* out) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_error_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  out->w = cinfo.output_width;
  out->h = cinfo.output_height;
  out->c = 3;
  out->pixels.resize(size_t(out->h) * out->w * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->pixels.data() + size_t(cinfo.output_scanline) * out->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

struct PngReadCtx {
  const uint8_t* data;
  size_t len;
  size_t pos;
};

void png_read_fn(png_structp png, png_bytep out, png_size_t n) {
  auto* ctx = static_cast<PngReadCtx*>(png_get_io_ptr(png));
  if (ctx->pos + n > ctx->len) {
    png_error(png, "png: read past end");
  }
  std::memcpy(out, ctx->data + ctx->pos, n);
  ctx->pos += n;
}

bool decode_png(const uint8_t* data, size_t len, Image* out) {
  if (len < 8 || png_sig_cmp(data, 0, 8)) return false;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return false;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return false;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return false;
  }
  PngReadCtx ctx{data, len, 0};
  png_set_read_fn(png, &ctx, png_read_fn);
  png_read_info(png, info);

  png_set_strip_16(png);
  png_set_palette_to_rgb(png);
  png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  png_read_update_info(png, info);

  out->w = png_get_image_width(png, info);
  out->h = png_get_image_height(png, info);
  out->c = png_get_channels(png, info);
  out->pixels.resize(size_t(out->h) * out->w * out->c);
  std::vector<png_bytep> rows(out->h);
  for (int y = 0; y < out->h; ++y)
    rows[y] = out->pixels.data() + size_t(y) * out->w * out->c;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

bool decode_any(const uint8_t* data, size_t len, Image* out) {
  if (len >= 3 && data[0] == 0xFF && data[1] == 0xD8) {
    return decode_jpeg(data, len, out);
  }
  return decode_png(data, len, out);
}

// bilinear resize HWC uint8 -> HWC float32 in [0,1] with `channels` outputs
// (missing channels broadcast from the last available one; extra dropped)
void resize_to(const Image& img, float* out, int th, int tw, int channels) {
  const float sx = float(img.w) / tw;
  const float sy = float(img.h) / th;
  for (int y = 0; y < th; ++y) {
    // align_corners=False convention (matches the reference's cv2/torch path)
    float fy = (y + 0.5f) * sy - 0.5f;
    if (fy < 0) fy = 0;
    if (fy > img.h - 1) fy = float(img.h - 1);
    int y0 = int(fy);
    int y1 = y0 + 1 < img.h ? y0 + 1 : y0;
    float wy = fy - y0;
    for (int x = 0; x < tw; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      if (fx < 0) fx = 0;
      if (fx > img.w - 1) fx = float(img.w - 1);
      int x0 = int(fx);
      int x1 = x0 + 1 < img.w ? x0 + 1 : x0;
      float wx = fx - x0;
      for (int ch = 0; ch < channels; ++ch) {
        int c = ch < img.c ? ch : img.c - 1;
        auto at = [&](int yy, int xx) {
          return float(img.pixels[(size_t(yy) * img.w + xx) * img.c + c]);
        };
        float v = at(y0, x0) * (1 - wx) * (1 - wy) + at(y0, x1) * wx * (1 - wy) +
                  at(y1, x0) * (1 - wx) * wy + at(y1, x1) * wx * wy;
        out[(size_t(y) * tw + x) * channels + ch] = v / 255.0f;
      }
    }
  }
}

int decode_one(const char* path, float* out, int th, int tw, int channels) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::fseek(f, 0, SEEK_END);
  long len = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> buf(len > 0 ? size_t(len) : 0);
  if (len <= 0 || std::fread(buf.data(), 1, len, f) != size_t(len)) {
    std::fclose(f);
    return -2;
  }
  std::fclose(f);
  Image img;
  if (!decode_any(buf.data(), buf.size(), &img)) return -3;
  resize_to(img, out, th, tw, channels);
  return 0;
}

}  // namespace

extern "C" {

int slr_decode_file(const char* path, float* out, int target_h, int target_w,
                    int channels) {
  return decode_one(path, out, target_h, target_w, channels);
}

int slr_decode_batch(const char** paths, int n, float* out, int target_h,
                     int target_w, int channels, int n_threads) {
  if (n_threads < 1) n_threads = 1;
  std::atomic<int> next{0};
  std::atomic<int> errors{0};
  const size_t stride = size_t(target_h) * target_w * channels;
  auto worker = [&]() {
    while (true) {
      int i = next.fetch_add(1);
      if (i >= n) break;
      int rc = decode_one(paths[i], out + stride * i, target_h, target_w,
                          channels);
      if (rc != 0) {
        // failed item -> zero image (reference's try/except fallback,
        // dataloader_VAE.py:98-108) and count the error
        std::memset(out + stride * i, 0, stride * sizeof(float));
        errors.fetch_add(1);
      }
    }
  };
  std::vector<std::thread> pool;
  int nt = n_threads < n ? n_threads : n;
  pool.reserve(nt);
  for (int t = 0; t < nt; ++t) pool.emplace_back(worker);
  for (auto& t : pool) t.join();
  return -errors.load();
}

}  // extern "C"
