// Native frame-staging pipeline: JPEG decode → shortest-side resize →
// center crop → RGB uint8, multithreaded across a batch.
//
// This is the host-side hot loop of ingestion (the reference does it in
// Python: PIL decode + torchvision transforms one image at a time inside
// the batch-32 GPU loop, Backend/services/embedding_service.py:461-505).
// Staged output feeds the device in one contiguous uint8 batch; the
// mean/std normalisation runs fused on-device (evr_tpu.ops.preprocess).
//
// Resize semantics: PIL-equivalent bicubic (Catmull-Rom a=-0.5), separable
// two-pass with antialias support scaling on downscale and a uint8
// intermediate buffer between the horizontal and vertical passes — the same
// structure as Pillow's Resample.c, so the staged pixels match the PIL
// golden-parity path (`ops.preprocess.load_image_host`) to within one gray
// level and retrieval ranks agree across the two staging paths
// (tests/test_native.py).

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Decode a JPEG file into an RGB buffer. Returns true on success.
bool decode_jpeg(const char* path, std::vector<uint8_t>* pixels, int* width,
                 int* height) {
  FILE* infile = std::fopen(path, "rb");
  if (!infile) return false;

  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(infile);
    return false;
  }

  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, infile);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);

  *width = cinfo.output_width;
  *height = cinfo.output_height;
  const int row_stride = cinfo.output_width * cinfo.output_components;
  pixels->resize(static_cast<size_t>(row_stride) * cinfo.output_height);

  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = pixels->data() +
                   static_cast<size_t>(cinfo.output_scanline) * row_stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  std::fclose(infile);
  return true;
}

// Catmull-Rom bicubic kernel (a = -0.5), support 2.0 — Pillow's BICUBIC.
inline double bicubic_kernel(double x) {
  constexpr double a = -0.5;
  x = std::abs(x);
  if (x < 1.0) return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0;
  if (x < 2.0) return (((x - 5.0) * x + 8.0) * x - 4.0) * a;
  return 0.0;
}

// Precomputed filter taps for one output axis, PIL Resample.c semantics:
// filterscale = max(in/out, 1) gives antialiasing on downscale; weights are
// normalised per output pixel.
struct FilterTaps {
  std::vector<int> bounds;      // per out pixel: first source index
  std::vector<int> counts;      // per out pixel: number of taps
  std::vector<double> weights;  // taps, ksize per out pixel
  int ksize = 0;
};

FilterTaps compute_taps(int in_size, int out_size) {
  FilterTaps taps;
  const double scale = static_cast<double>(in_size) / out_size;
  const double filterscale = std::max(scale, 1.0);
  const double support = 2.0 * filterscale;  // bicubic support
  taps.ksize = static_cast<int>(std::ceil(support)) * 2 + 1;
  taps.bounds.resize(out_size);
  taps.counts.resize(out_size);
  taps.weights.assign(static_cast<size_t>(out_size) * taps.ksize, 0.0);

  for (int xx = 0; xx < out_size; ++xx) {
    const double center = (xx + 0.5) * scale;
    int xmin = static_cast<int>(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = static_cast<int>(center + support + 0.5);
    if (xmax > in_size) xmax = in_size;
    double* k = taps.weights.data() + static_cast<size_t>(xx) * taps.ksize;
    double ww = 0.0;
    for (int x = xmin; x < xmax; ++x) {
      const double w = bicubic_kernel((x - center + 0.5) / filterscale);
      k[x - xmin] = w;
      ww += w;
    }
    if (ww != 0.0) {
      for (int x = 0; x < xmax - xmin; ++x) k[x] /= ww;
    }
    taps.bounds[xx] = xmin;
    taps.counts[xx] = xmax - xmin;
  }
  return taps;
}

inline uint8_t clip8(double v) {
  return static_cast<uint8_t>(std::clamp(std::lround(v), 0L, 255L));
}

// Separable PIL-style bicubic resize, RGB uint8. Horizontal pass into a
// uint8 intermediate (matching Pillow's two-pass structure and its
// per-pass rounding), then vertical.
void resize_rgb(const uint8_t* src, int sw, int sh, uint8_t* dst, int dw,
                int dh) {
  const FilterTaps hx = compute_taps(sw, dw);
  const FilterTaps vy = compute_taps(sh, dh);

  std::vector<uint8_t> tmp(static_cast<size_t>(dw) * sh * 3);
  for (int y = 0; y < sh; ++y) {
    const uint8_t* row = src + static_cast<size_t>(y) * sw * 3;
    uint8_t* out_row = tmp.data() + static_cast<size_t>(y) * dw * 3;
    for (int x = 0; x < dw; ++x) {
      const double* k = hx.weights.data() + static_cast<size_t>(x) * hx.ksize;
      const int x0 = hx.bounds[x];
      double acc[3] = {0.0, 0.0, 0.0};
      for (int t = 0; t < hx.counts[x]; ++t) {
        const uint8_t* p = row + (static_cast<size_t>(x0) + t) * 3;
        acc[0] += p[0] * k[t];
        acc[1] += p[1] * k[t];
        acc[2] += p[2] * k[t];
      }
      out_row[x * 3] = clip8(acc[0]);
      out_row[x * 3 + 1] = clip8(acc[1]);
      out_row[x * 3 + 2] = clip8(acc[2]);
    }
  }

  for (int y = 0; y < dh; ++y) {
    const double* k = vy.weights.data() + static_cast<size_t>(y) * vy.ksize;
    const int y0 = vy.bounds[y];
    uint8_t* out_row = dst + static_cast<size_t>(y) * dw * 3;
    for (int x = 0; x < dw; ++x) {
      double acc[3] = {0.0, 0.0, 0.0};
      for (int t = 0; t < vy.counts[y]; ++t) {
        const uint8_t* p =
            tmp.data() + ((static_cast<size_t>(y0) + t) * dw + x) * 3;
        acc[0] += p[0] * k[t];
        acc[1] += p[1] * k[t];
        acc[2] += p[2] * k[t];
      }
      out_row[x * 3] = clip8(acc[0]);
      out_row[x * 3 + 1] = clip8(acc[1]);
      out_row[x * 3 + 2] = clip8(acc[2]);
    }
  }
}

// Full staging of one file into out[target*target*3]. Returns 0 on success.
int stage_one(const char* path, uint8_t* out, int target) {
  std::vector<uint8_t> pixels;
  int w = 0, h = 0;
  if (!decode_jpeg(path, &pixels, &w, &h)) return 1;
  if (w <= 0 || h <= 0) return 2;

  const double scale = static_cast<double>(target) / std::min(w, h);
  const int rw = std::max(target, static_cast<int>(std::lround(w * scale)));
  const int rh = std::max(target, static_cast<int>(std::lround(h * scale)));

  std::vector<uint8_t> resized(static_cast<size_t>(rw) * rh * 3);
  resize_rgb(pixels.data(), w, h, resized.data(), rw, rh);

  const int left = (rw - target) / 2;
  const int top = (rh - target) / 2;
  for (int y = 0; y < target; ++y) {
    std::memcpy(out + static_cast<size_t>(y) * target * 3,
                resized.data() + ((static_cast<size_t>(top + y) * rw) + left) * 3,
                static_cast<size_t>(target) * 3);
  }
  return 0;
}

}  // namespace

extern "C" {

// Stage one image; returns 0 on success.
int evr_stage_image(const char* path, uint8_t* out, int target) {
  return stage_one(path, out, target);
}

// Stage a batch of n images into out[n][target][target][3] with a thread
// pool. status[i] receives the per-image return code. Returns the number of
// failures.
int evr_stage_batch(const char** paths, int n, uint8_t* out, int target,
                    int n_threads, int* status) {
  if (n_threads < 1) n_threads = 1;
  std::atomic<int> next(0);
  std::atomic<int> failures(0);
  const size_t stride = static_cast<size_t>(target) * target * 3;

  auto worker = [&]() {
    while (true) {
      const int i = next.fetch_add(1);
      if (i >= n) break;
      const int rc = stage_one(paths[i], out + stride * i, target);
      status[i] = rc;
      if (rc != 0) failures.fetch_add(1);
    }
  };

  std::vector<std::thread> threads;
  const int workers = std::min(n_threads, n);
  threads.reserve(workers);
  for (int t = 0; t < workers; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return failures.load();
}

}  // extern "C"
