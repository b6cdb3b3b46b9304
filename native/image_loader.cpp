// Native batched image loader: multithreaded PNG/JPEG decode + bilinear
// resize into a caller-owned (N, size, size, 3) uint8 buffer.
//
// TPU-native replacement for the reference's PIL-per-image dataset loop
// (reference src/datasets.py:313-373 CelebA/ImageDataset: Image.open ->
// convert("RGB") -> resize): decoding 30k 1024px JPEGs through Python/PIL is
// minutes of single-threaded work that this does in seconds across cores.
// Exposed through ctypes (utils/native_images.py); PIL remains the fallback.
//
// Build: make -C native  (links -lpng -ljpeg -lz)

#include <png.h>

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <csetjmp>
#include <thread>
#include <vector>

#include <jpeglib.h>

namespace {

struct Image {
  std::vector<uint8_t> rgb;  // H*W*3
  int w = 0, h = 0;
};

bool decode_png(FILE* f, Image* out) {
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
  png_init_io(png, f);
  png_read_info(png, info);
  png_uint_32 w, h;
  int bit_depth, color_type;
  png_get_IHDR(png, info, &w, &h, &bit_depth, &color_type, nullptr, nullptr,
               nullptr);
  // Normalize every layout to 8-bit RGB.
  if (bit_depth == 16) png_set_strip_16(png);
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color_type == PNG_COLOR_TYPE_GRAY ||
      color_type == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  if (color_type & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
  png_read_update_info(png, info);

  out->w = static_cast<int>(w);
  out->h = static_cast<int>(h);
  out->rgb.resize(static_cast<size_t>(w) * h * 3);
  std::vector<png_bytep> rows(h);
  for (png_uint_32 y = 0; y < h; ++y)
    rows[y] = out->rgb.data() + static_cast<size_t>(y) * w * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  longjmp(reinterpret_cast<JpegErr*>(cinfo->err)->jb, 1);
}

bool decode_jpeg(FILE* f, Image* out) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  out->w = cinfo.output_width;
  out->h = cinfo.output_height;
  out->rgb.resize(static_cast<size_t>(out->w) * out->h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row =
        out->rgb.data() + static_cast<size_t>(cinfo.output_scanline) * out->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

bool decode_file(const char* path, Image* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  unsigned char magic[4] = {0};
  size_t got = fread(magic, 1, 4, f);
  rewind(f);
  bool ok = false;
  if (got == 4 && magic[0] == 0x89 && magic[1] == 'P')
    ok = decode_png(f, out);
  else if (got >= 2 && magic[0] == 0xFF && magic[1] == 0xD8)
    ok = decode_jpeg(f, out);
  fclose(f);
  return ok;
}

// Separable triangle-filter resampling with support scaled to the
// downsampling ratio — PIL's BILINEAR (antialiased) convention, which
// jax.image.resize "bilinear" also follows, so native- and PIL-loaded
// datasets agree.
struct Taps {
  std::vector<int> lo;       // first source index per output coord
  std::vector<int> count;    // taps per output coord
  std::vector<float> w;      // weights, count[i] entries starting at off[i]
  std::vector<int> off;
};

Taps make_taps(int in_size, int out_size) {
  Taps t;
  const double scale = static_cast<double>(in_size) / out_size;
  const double fscale = scale < 1.0 ? 1.0 : scale;
  const double support = fscale;  // triangle filter: support 1 * fscale
  t.lo.resize(out_size);
  t.count.resize(out_size);
  t.off.resize(out_size);
  for (int i = 0; i < out_size; ++i) {
    double center = (i + 0.5) * scale;
    int lo = static_cast<int>(center - support + 0.5);
    int hi = static_cast<int>(center + support + 0.5);
    if (lo < 0) lo = 0;
    if (hi > in_size) hi = in_size;
    t.lo[i] = lo;
    t.count[i] = hi - lo;
    t.off[i] = static_cast<int>(t.w.size());
    double total = 0.0;
    for (int j = lo; j < hi; ++j) {
      double x = (j + 0.5 - center) / fscale;
      double wj = x < 0 ? 1.0 + x : 1.0 - x;  // triangle
      if (wj < 0) wj = 0;
      t.w.push_back(static_cast<float>(wj));
      total += wj;
    }
    if (total > 0)
      for (int j = 0; j < t.count[i]; ++j)
        t.w[t.off[i] + j] /= static_cast<float>(total);
  }
  return t;
}

void resize_bilinear(const Image& src, int size, uint8_t* dst) {
  if (src.w == size && src.h == size) {
    std::memcpy(dst, src.rgb.data(), static_cast<size_t>(size) * size * 3);
    return;
  }
  Taps tx = make_taps(src.w, size);
  Taps ty = make_taps(src.h, size);
  // Horizontal pass: (h, w, 3) -> (h, size, 3) float.
  std::vector<float> mid(static_cast<size_t>(src.h) * size * 3);
  for (int y = 0; y < src.h; ++y) {
    const uint8_t* row = src.rgb.data() + static_cast<size_t>(y) * src.w * 3;
    float* orow = mid.data() + static_cast<size_t>(y) * size * 3;
    for (int x = 0; x < size; ++x) {
      float acc[3] = {0, 0, 0};
      for (int k = 0; k < tx.count[x]; ++k) {
        float w = tx.w[tx.off[x] + k];
        const uint8_t* p = row + (tx.lo[x] + k) * 3;
        acc[0] += w * p[0];
        acc[1] += w * p[1];
        acc[2] += w * p[2];
      }
      orow[x * 3 + 0] = acc[0];
      orow[x * 3 + 1] = acc[1];
      orow[x * 3 + 2] = acc[2];
    }
  }
  // Vertical pass: (h, size, 3) -> (size, size, 3) uint8.
  for (int y = 0; y < size; ++y) {
    uint8_t* orow = dst + static_cast<size_t>(y) * size * 3;
    for (int x = 0; x < size; ++x) {
      float acc[3] = {0, 0, 0};
      for (int k = 0; k < ty.count[y]; ++k) {
        float w = ty.w[ty.off[y] + k];
        const float* p =
            mid.data() + (static_cast<size_t>(ty.lo[y] + k) * size + x) * 3;
        acc[0] += w * p[0];
        acc[1] += w * p[1];
        acc[2] += w * p[2];
      }
      for (int c = 0; c < 3; ++c) {
        float v = acc[c] + 0.5f;
        orow[x * 3 + c] =
            static_cast<uint8_t>(v < 0 ? 0 : (v > 255 ? 255 : v));
      }
    }
  }
}

}  // namespace

extern "C" {

// Decode `n` image files into out (n, size, size, 3) uint8. Returns 0 on
// success or (1-based) index of the first file that failed to decode.
int64_t load_images(const char** paths, int64_t n, int32_t size, uint8_t* out,
                    int32_t n_threads) {
  if (n_threads <= 0) n_threads = std::thread::hardware_concurrency();
  if (n_threads <= 0) n_threads = 1;
  std::atomic<int64_t> next(0);
  std::atomic<int64_t> failed(0);  // 0 = ok, else 1-based index
  const size_t stride = static_cast<size_t>(size) * size * 3;

  auto worker = [&]() {
    Image img;
    for (;;) {
      int64_t i = next.fetch_add(1);
      if (i >= n || failed.load() != 0) return;
      if (!decode_file(paths[i], &img)) {
        int64_t expected = 0;
        failed.compare_exchange_strong(expected, i + 1);
        return;
      }
      resize_bilinear(img, size, out + static_cast<size_t>(i) * stride);
    }
  };

  std::vector<std::thread> pool;
  int64_t nt = n_threads < n ? n_threads : n;
  for (int64_t t = 0; t < nt; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return failed.load();
}

}  // extern "C"
