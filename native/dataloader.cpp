// Native data loader for lvio_fusion_tpu.
//
// TPU-native equivalent of the I/O work the reference delegates to ROS
// (rosbag playback + cv_bridge image decode, lvio_fusion_node.cpp:47-96)
// and PCL cloud intake: KITTI velodyne .bin parsing, libpng grayscale
// decode, and a std::thread fan-out for batch prefetch. Exposed via a
// plain C ABI consumed from Python with ctypes (no pybind11 dependency).
//
// Build: make -C native   (produces libdataloader.so)

#include <atomic>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <png.h>
#include <thread>
#include <vector>

extern "C" {

// Read a KITTI velodyne scan (x, y, z, intensity float32 records).
// Writes up to max_points * 4 floats into out; returns the point count
// (clamped), or -1 on error.
int lvio_load_velodyne(const char *path, float *out, int max_points) {
  FILE *f = fopen(path, "rb");
  if (!f) return -1;
  size_t n = fread(out, sizeof(float) * 4, (size_t)max_points, f);
  // drain the rest to get a faithful count? not needed: clamp is fine
  fclose(f);
  return (int)n;
}

// Decode an 8/16-bit grayscale (or RGB -> gray) PNG into out (row-major
// uint8, capacity max_h * max_w). Returns 0 on success and stores the
// dimensions; -1 on error.
int lvio_load_png_gray(const char *path, unsigned char *out, int max_h,
                       int max_w, int *out_h, int *out_w) {
  FILE *f = fopen(path, "rb");
  if (!f) return -1;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) { fclose(f); return -1; }
  png_infop info = png_create_info_struct(png);
  if (!info) { png_destroy_read_struct(&png, nullptr, nullptr); fclose(f); return -1; }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(f);
    return -1;
  }
  png_init_io(png, f);
  png_read_info(png, info);

  png_uint_32 w = png_get_image_width(png, info);
  png_uint_32 h = png_get_image_height(png, info);
  int color = png_get_color_type(png, info);
  int depth = png_get_bit_depth(png, info);
  if ((int)h > max_h || (int)w > max_w) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(f);
    return -1;
  }
  if (depth == 16) png_set_strip_16(png);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (color & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
  if (color == PNG_COLOR_TYPE_RGB || color == PNG_COLOR_TYPE_PALETTE ||
      color == PNG_COLOR_TYPE_RGB_ALPHA)
    png_set_rgb_to_gray_fixed(png, 1, -1, -1);
  png_read_update_info(png, info);

  // the caller's buffer is (max_h, max_w) row-major: stride is max_w
  std::vector<png_bytep> rows(h);
  for (png_uint_32 r = 0; r < h; ++r) rows[r] = out + (size_t)r * max_w;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(f);
  *out_h = (int)h;
  *out_w = (int)w;
  return 0;
}

// Threaded batch velodyne load: n scans in parallel. counts[i] receives
// the per-scan point count (-1 on error). Stride between scans in `out`
// is max_points * 4 floats.
void lvio_load_velodyne_batch(const char **paths, int n, float *out,
                              int max_points, int *counts) {
  int hw = (int)std::thread::hardware_concurrency();
  int workers = hw > 1 ? (hw < 8 ? hw : 8) : 1;
  std::vector<std::thread> pool;
  std::atomic_int next{0};
  // simple work-stealing loop
  auto work = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) break;
      counts[i] = lvio_load_velodyne(paths[i], out + (size_t)i * max_points * 4,
                                     max_points);
    }
  };
  for (int t = 0; t < workers; ++t) pool.emplace_back(work);
  for (auto &th : pool) th.join();
}

// Threaded batch grayscale PNG decode. Stride: max_h * max_w bytes.
void lvio_load_png_gray_batch(const char **paths, int n, unsigned char *out,
                              int max_h, int max_w, int *hs, int *ws,
                              int *status) {
  int hw = (int)std::thread::hardware_concurrency();
  int workers = hw > 1 ? (hw < 8 ? hw : 8) : 1;
  std::vector<std::thread> pool;
  std::atomic_int next{0};
  auto work = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) break;
      status[i] = lvio_load_png_gray(paths[i],
                                     out + (size_t)i * max_h * max_w,
                                     max_h, max_w, hs + i, ws + i);
    }
  };
  for (int t = 0; t < workers; ++t) pool.emplace_back(work);
  for (auto &th : pool) th.join();
}

}  // extern "C"
