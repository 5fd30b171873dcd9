// fastloader: multithreaded JPEG batch decoder for the data plane.
//
// TPU-native replacement for the reference's per-sample cv2.imread in
// torch DataLoader worker *processes* (reference dataset.py:38-61,
// train_advanced_v4.py:608-622): one C thread pool decodes a whole batch of
// JPEGs straight into a caller-owned contiguous uint8 (N, H, W, 3) buffer
// using libjpeg, resizing (bilinear) to the fixed native size when needed.
// No Python objects, no GIL, no IPC — the Python side passes a path array
// via ctypes and gets a per-image status vector back so it can route
// failures through its fallback policy (black/random image, cv2 retry for
// non-JPEG formats).
//
// Build: g++ -O3 -march=native -shared -fPIC -o libfastloader.so \
//            fastloader.cpp -ljpeg -lpthread

#include <atomic>
#include <cstddef>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <csetjmp>
#include <thread>
#include <vector>

// jpeglib.h requires stdio/stddef types to be declared before inclusion
#include <jpeglib.h>

namespace {

struct ErrMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void err_exit(j_common_ptr cinfo) {
  ErrMgr* err = reinterpret_cast<ErrMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Bilinear resize (half-pixel centers, channel-interleaved RGB), matching
// cv2.resize INTER_LINEAR in the interior.
void resize_bilinear(const uint8_t* src, int sh, int sw, uint8_t* dst, int dh,
                     int dw) {
  const float sy = static_cast<float>(sh) / dh;
  const float sx = static_cast<float>(sw) / dw;
  for (int y = 0; y < dh; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    if (fy < 0) fy = 0;
    if (fy > sh - 1) fy = static_cast<float>(sh - 1);
    const int y0 = static_cast<int>(fy);
    const int y1 = y0 + 1 < sh ? y0 + 1 : sh - 1;
    const float wy = fy - y0;
    for (int x = 0; x < dw; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      if (fx < 0) fx = 0;
      if (fx > sw - 1) fx = static_cast<float>(sw - 1);
      const int x0 = static_cast<int>(fx);
      const int x1 = x0 + 1 < sw ? x0 + 1 : sw - 1;
      const float wx = fx - x0;
      const uint8_t* p00 = src + (static_cast<size_t>(y0) * sw + x0) * 3;
      const uint8_t* p01 = src + (static_cast<size_t>(y0) * sw + x1) * 3;
      const uint8_t* p10 = src + (static_cast<size_t>(y1) * sw + x0) * 3;
      const uint8_t* p11 = src + (static_cast<size_t>(y1) * sw + x1) * 3;
      uint8_t* out = dst + (static_cast<size_t>(y) * dw + x) * 3;
      for (int c = 0; c < 3; ++c) {
        const float top = p00[c] * (1 - wx) + p01[c] * wx;
        const float bot = p10[c] * (1 - wx) + p11[c] * wx;
        out[c] = static_cast<uint8_t>(top * (1 - wy) + bot * wy + 0.5f);
      }
    }
  }
}

// Decode one JPEG file to RGB uint8 at exactly (H, W). Returns false on any
// decode error (caller applies fallback policy).
bool decode_one(const char* path, uint8_t* out, int H, int W,
                std::vector<uint8_t>* scratch) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  jpeg_decompress_struct cinfo;
  ErrMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = err_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return false;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  const int h = cinfo.output_height;
  const int w = cinfo.output_width;
  if (h <= 0 || w <= 0 || cinfo.output_components != 3) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return false;
  }
  const bool direct = (h == H && w == W);
  uint8_t* target;
  if (direct) {
    target = out;
  } else {
    scratch->resize(static_cast<size_t>(h) * w * 3);
    target = scratch->data();
  }
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = target + static_cast<size_t>(cinfo.output_scanline) * w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  std::fclose(f);
  if (!direct) resize_bilinear(target, h, w, out, H, W);
  return true;
}

}  // namespace

extern "C" {

// paths[i] == nullptr marks a missing file. status[i]: 1 decoded, 0 failed.
// Returns the number of failures. Failed slots are left zero-filled (the
// Python layer decides between black-image and random-image fallback).
int fastloader_decode_batch(const char** paths, int n, uint8_t* out, int H,
                            int W, int n_threads, uint8_t* status) {
  std::atomic<int> next(0);
  std::atomic<int> failed(0);
  const size_t stride = static_cast<size_t>(H) * W * 3;
  auto worker = [&]() {
    std::vector<uint8_t> scratch;
    int i;
    while ((i = next.fetch_add(1)) < n) {
      uint8_t* dst = out + stride * i;
      const bool ok = paths[i] && decode_one(paths[i], dst, H, W, &scratch);
      status[i] = ok ? 1 : 0;
      if (!ok) {
        std::memset(dst, 0, stride);
        failed.fetch_add(1);
      }
    }
  };
  if (n_threads < 1) n_threads = 1;
  std::vector<std::thread> threads;
  threads.reserve(n_threads);
  for (int t = 0; t < n_threads; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return failed.load();
}

int fastloader_version() { return 1; }

}  // extern "C"
