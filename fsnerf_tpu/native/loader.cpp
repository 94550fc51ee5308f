// Native data-loading runtime: multithreaded PNG/JPEG decode to float32.
//
// TPU-native counterpart of the reference's host-side data pipeline — the
// torch DataLoader C++ worker pool (reference splitter.py:126-131,
// num_workers=8) and imageio decode loops (blender.py:242, splitter.py:331).
// Decoding a Blender scene (100-400 PNGs at 800x800 RGBA) dominates startup;
// this library decodes with a std::thread pool and writes straight into a
// caller-provided float32 tensor (normalized 1/255), which then feeds the
// device-resident ray pool in one host->HBM transfer.
//
// Exposed C ABI (consumed via ctypes in fsnerf_tpu/native/__init__.py):
//   fsnerf_probe_image(path, &h, &w, &c)           -> 0 on success
//   fsnerf_decode_images(paths, n, out, h, w, c, n_threads) -> 0 on success
//
// Build: make -C fsnerf_tpu/native   (g++ -O2 -shared, links libpng/libjpeg)

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>
#include <csetjmp>

namespace {

struct Image {
  int h = 0, w = 0, c = 0;
  std::vector<uint8_t> data;  // h * w * c
};

bool has_suffix(const std::string& s, const char* suf) {
  std::string l;
  l.resize(s.size());
  for (size_t i = 0; i < s.size(); ++i) l[i] = std::tolower(s[i]);
  std::string t(suf);
  return l.size() >= t.size() && l.compare(l.size() - t.size(), t.size(), t) == 0;
}

// ---------------------------- PNG ----------------------------

bool decode_png(const char* path, Image* out) {
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return false;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) { std::fclose(fp); return false; }
  png_infop info = png_create_info_struct(png);
  if (!info) { png_destroy_read_struct(&png, nullptr, nullptr); std::fclose(fp); return false; }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return false;
  }
  png_init_io(png, fp);
  png_read_info(png, info);

  png_uint_32 w = png_get_image_width(png, info);
  png_uint_32 h = png_get_image_height(png, info);
  int bit_depth = png_get_bit_depth(png, info);
  int color_type = png_get_color_type(png, info);

  // normalize to 8-bit RGB or RGBA
  if (bit_depth == 16) png_set_strip_16(png);
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color_type == PNG_COLOR_TYPE_GRAY ||
      color_type == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  png_read_update_info(png, info);

  int channels = png_get_channels(png, info);
  out->h = static_cast<int>(h);
  out->w = static_cast<int>(w);
  out->c = channels;
  out->data.resize(size_t(h) * w * channels);
  std::vector<png_bytep> rows(h);
  size_t stride = size_t(w) * channels;
  for (png_uint_32 r = 0; r < h; ++r) rows[r] = out->data.data() + r * stride;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  std::fclose(fp);
  return true;
}

// ---------------------------- JPEG ----------------------------

struct JpegErr {
  jpeg_error_mgr mgr;
  std::jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErr*>(cinfo->err);
  std::longjmp(err->jb, 1);
}

bool decode_jpeg(const char* path, Image* out) {
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return false;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(fp);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, fp);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);

  out->h = cinfo.output_height;
  out->w = cinfo.output_width;
  out->c = cinfo.output_components;  // 3
  out->data.resize(size_t(out->h) * out->w * out->c);
  size_t stride = size_t(out->w) * out->c;
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = out->data.data() + cinfo.output_scanline * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  std::fclose(fp);
  return true;
}

bool decode_any(const char* path, Image* out) {
  std::string p(path);
  if (has_suffix(p, ".png")) return decode_png(path, out);
  if (has_suffix(p, ".jpg") || has_suffix(p, ".jpeg"))
    return decode_jpeg(path, out);
  // sniff magic bytes
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return false;
  unsigned char magic[4] = {0};
  size_t got = std::fread(magic, 1, 4, fp);
  std::fclose(fp);
  if (got >= 4 && magic[0] == 0x89 && magic[1] == 'P') return decode_png(path, out);
  if (got >= 2 && magic[0] == 0xFF && magic[1] == 0xD8) return decode_jpeg(path, out);
  return false;
}

}  // namespace

extern "C" {

// Reads one image header+pixels to learn (h, w, c). Returns 0 on success.
int fsnerf_probe_image(const char* path, int* h, int* w, int* c) {
  Image img;
  if (!decode_any(path, &img)) return 1;
  *h = img.h;
  *w = img.w;
  *c = img.c;
  return 0;
}

// Decodes n images into out[n, h, w, c] float32 (1/255-normalized) with a
// thread pool. Images whose channel count differs from `c` are expanded
// (gray->rgb handled in-decoder; rgb->rgba fills alpha=1; rgba->rgb drops
// alpha). Size mismatches fail. Returns 0 on success, else 1-based index of
// the first failing image.
int fsnerf_decode_images(const char** paths, int n, float* out, int h, int w,
                         int c, int n_threads) {
  if (n_threads <= 0) n_threads = std::thread::hardware_concurrency();
  if (n_threads <= 0) n_threads = 1;
  std::atomic<int> next(0);
  std::atomic<int> fail(0);
  const size_t frame = size_t(h) * w * c;
  constexpr float kInv255 = 1.0f / 255.0f;

  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n || fail.load()) return;
      Image img;
      if (!decode_any(paths[i], &img) || img.h != h || img.w != w) {
        int expected = 0;
        fail.compare_exchange_strong(expected, i + 1);
        return;
      }
      float* dst = out + size_t(i) * frame;
      const uint8_t* src = img.data.data();
      const size_t npix = size_t(h) * w;
      if (img.c == c) {
        for (size_t k = 0; k < npix * c; ++k) dst[k] = src[k] * kInv255;
      } else if (img.c == 3 && c == 4) {
        for (size_t p = 0; p < npix; ++p) {
          dst[p * 4 + 0] = src[p * 3 + 0] * kInv255;
          dst[p * 4 + 1] = src[p * 3 + 1] * kInv255;
          dst[p * 4 + 2] = src[p * 3 + 2] * kInv255;
          dst[p * 4 + 3] = 1.0f;
        }
      } else if (img.c == 4 && c == 3) {
        for (size_t p = 0; p < npix; ++p) {
          dst[p * 3 + 0] = src[p * 4 + 0] * kInv255;
          dst[p * 3 + 1] = src[p * 4 + 1] * kInv255;
          dst[p * 3 + 2] = src[p * 4 + 2] * kInv255;
        }
      } else {
        int expected = 0;
        fail.compare_exchange_strong(expected, i + 1);
        return;
      }
    }
  };

  std::vector<std::thread> pool;
  int tcount = std::min(n_threads, n);
  pool.reserve(tcount);
  for (int t = 0; t < tcount; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return fail.load();
}

}  // extern "C"
