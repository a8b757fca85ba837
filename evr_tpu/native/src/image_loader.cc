// Native frame-staging pipeline: JPEG decode → shortest-side resize →
// center crop → RGB uint8, multithreaded across a batch.
//
// This is the host-side hot loop of ingestion (the reference does it in
// Python: PIL decode + torchvision transforms one image at a time inside
// the batch-32 GPU loop, Backend/services/embedding_service.py:461-505).
// Staged output feeds the device in one contiguous uint8 batch; the
// mean/std normalisation runs fused on-device (evr_tpu.ops.preprocess).
//
// Resize semantics: box-filter area averaging on downscale (matches
// antialiased bicubic closely for photographic frames and cv2.INTER_AREA
// exactly in spirit), bilinear on upscale.

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

// Area-average (downscale) or bilinear (upscale) resize, RGB uint8.
void resize_rgb(const uint8_t* src, int sw, int sh, uint8_t* dst, int dw,
                int dh) {
  const double sx = static_cast<double>(sw) / dw;
  const double sy = static_cast<double>(sh) / dh;
  const bool down = sx >= 1.0 && sy >= 1.0;

  if (down) {
    for (int y = 0; y < dh; ++y) {
      const int y0 = static_cast<int>(y * sy);
      int y1 = static_cast<int>((y + 1) * sy);
      y1 = std::min(std::max(y1, y0 + 1), sh);
      for (int x = 0; x < dw; ++x) {
        const int x0 = static_cast<int>(x * sx);
        int x1 = static_cast<int>((x + 1) * sx);
        x1 = std::min(std::max(x1, x0 + 1), sw);
        int acc[3] = {0, 0, 0};
        const int count = (y1 - y0) * (x1 - x0);
        for (int yy = y0; yy < y1; ++yy) {
          const uint8_t* row = src + (static_cast<size_t>(yy) * sw + x0) * 3;
          for (int xx = 0; xx < x1 - x0; ++xx) {
            acc[0] += row[xx * 3];
            acc[1] += row[xx * 3 + 1];
            acc[2] += row[xx * 3 + 2];
          }
        }
        uint8_t* out = dst + (static_cast<size_t>(y) * dw + x) * 3;
        out[0] = static_cast<uint8_t>(acc[0] / count);
        out[1] = static_cast<uint8_t>(acc[1] / count);
        out[2] = static_cast<uint8_t>(acc[2] / count);
      }
    }
  } else {
    for (int y = 0; y < dh; ++y) {
      const double fy = (y + 0.5) * sy - 0.5;
      const int y0 = std::clamp(static_cast<int>(std::floor(fy)), 0, sh - 1);
      const int y1 = std::min(y0 + 1, sh - 1);
      const double wy = fy - y0;
      for (int x = 0; x < dw; ++x) {
        const double fx = (x + 0.5) * sx - 0.5;
        const int x0 = std::clamp(static_cast<int>(std::floor(fx)), 0, sw - 1);
        const int x1 = std::min(x0 + 1, sw - 1);
        const double wx = fx - x0;
        uint8_t* out = dst + (static_cast<size_t>(y) * dw + x) * 3;
        for (int c = 0; c < 3; ++c) {
          const double v00 = src[(static_cast<size_t>(y0) * sw + x0) * 3 + c];
          const double v01 = src[(static_cast<size_t>(y0) * sw + x1) * 3 + c];
          const double v10 = src[(static_cast<size_t>(y1) * sw + x0) * 3 + c];
          const double v11 = src[(static_cast<size_t>(y1) * sw + x1) * 3 + c];
          out[c] = static_cast<uint8_t>(
              std::lround((1 - wy) * ((1 - wx) * v00 + wx * v01) +
                          wy * ((1 - wx) * v10 + wx * v11)));
        }
      }
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
