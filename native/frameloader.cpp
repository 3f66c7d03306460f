// Threaded prefetching frame loader for dataset playback.
//
// Role of the reference's C++ dataset drivers' image loop
// (/root/reference/Examples/Monocular/mono_euroc.cc LoadImages + the
// per-frame cv::imread in main): decode grayscale PNG/JPEG/PGM frames on a
// worker-thread pool into a bounded in-order queue so the Python tracking
// loop never stalls on host-side image IO. Exposed as a C API consumed via
// ctypes (orb_slam3_tpu/utils/frameloader.py).
//
// Build: see native/build.sh (g++ -O3 -shared, links libpng + libjpeg).

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <map>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>

namespace {

struct Frame {
  std::vector<uint8_t> pixels;  // grayscale
  int width = 0;
  int height = 0;
  bool ok = false;
};

bool decode_png(const char* path, Frame* out) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return false;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return false;
  }
  png_init_io(png, fp);
  png_read_info(png, info);
  png_uint_32 w = png_get_image_width(png, info);
  png_uint_32 h = png_get_image_height(png, info);
  int color = png_get_color_type(png, info);
  int depth = png_get_bit_depth(png, info);
  if (depth == 16) png_set_strip_16(png);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_RGB || color == PNG_COLOR_TYPE_RGB_ALPHA ||
      color == PNG_COLOR_TYPE_PALETTE)
    png_set_rgb_to_gray_fixed(png, 1, -1, -1);
  if (color & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
  png_read_update_info(png, info);
  out->width = (int)w;
  out->height = (int)h;
  out->pixels.resize((size_t)w * h);
  std::vector<png_bytep> rows(h);
  for (png_uint_32 y = 0; y < h; ++y)
    rows[y] = out->pixels.data() + (size_t)y * w;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(fp);
  out->ok = true;
  return true;
}

bool decode_jpeg(const char* path, Frame* out) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return false;
  jpeg_decompress_struct cinfo;
  jpeg_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, fp);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    fclose(fp);
    return false;
  }
  cinfo.out_color_space = JCS_GRAYSCALE;
  jpeg_start_decompress(&cinfo);
  out->width = cinfo.output_width;
  out->height = cinfo.output_height;
  out->pixels.resize((size_t)out->width * out->height);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->pixels.data() + (size_t)cinfo.output_scanline * out->width;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(fp);
  out->ok = true;
  return true;
}

bool decode_pgm(const char* path, Frame* out) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return false;
  char magic[3] = {0};
  int w, h, maxv;
  if (fscanf(fp, "%2s %d %d %d", magic, &w, &h, &maxv) != 4 ||
      strcmp(magic, "P5") != 0) {
    fclose(fp);
    return false;
  }
  fgetc(fp);  // single whitespace after header
  out->width = w;
  out->height = h;
  out->pixels.resize((size_t)w * h);
  size_t got = fread(out->pixels.data(), 1, (size_t)w * h, fp);
  fclose(fp);
  out->ok = got == (size_t)w * h;
  return out->ok;
}

bool decode_any(const std::string& path, Frame* out) {
  size_t dot = path.find_last_of('.');
  std::string ext = dot == std::string::npos ? "" : path.substr(dot + 1);
  for (auto& c : ext) c = (char)tolower(c);
  if (ext == "png") return decode_png(path.c_str(), out);
  if (ext == "jpg" || ext == "jpeg") return decode_jpeg(path.c_str(), out);
  if (ext == "pgm") return decode_pgm(path.c_str(), out);
  // try png then jpeg
  return decode_png(path.c_str(), out) || decode_jpeg(path.c_str(), out);
}

struct Loader {
  std::vector<std::string> paths;
  std::map<size_t, Frame> ready;     // decoded frames by index (in-order pop)
  size_t next_submit = 0;            // next index a worker should take
  size_t next_pop = 0;               // next index the consumer wants
  size_t queue_depth = 8;
  std::mutex mu;
  std::condition_variable cv_worker, cv_consumer;
  std::vector<std::thread> workers;
  std::atomic<bool> stop{false};

  void worker_loop() {
    while (true) {
      size_t idx;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_worker.wait(lk, [&] {
          return stop.load() ||
                 (next_submit < paths.size() &&
                  next_submit < next_pop + queue_depth);
        });
        if (stop.load()) return;
        idx = next_submit++;
      }
      Frame f;
      decode_any(paths[idx], &f);
      {
        std::lock_guard<std::mutex> lk(mu);
        ready[idx] = std::move(f);
      }
      cv_consumer.notify_all();
    }
  }
};

}  // namespace

extern "C" {

void* frameloader_create(const char** paths, int n, int n_threads,
                         int queue_depth) {
  auto* L = new Loader();
  L->paths.assign(paths, paths + n);
  L->queue_depth = queue_depth > 0 ? (size_t)queue_depth : 8;
  int nt = n_threads > 0 ? n_threads : 2;
  for (int i = 0; i < nt; ++i)
    L->workers.emplace_back([L] { L->worker_loop(); });
  return L;
}

// Blocking in-order pop. Returns 0 on success, -1 on decode failure,
// -2 when exhausted. Caller provides a buffer of cap bytes; width/height out.
int frameloader_next(void* handle, uint8_t* buf, long cap, int* width,
                     int* height) {
  auto* L = (Loader*)handle;
  std::unique_lock<std::mutex> lk(L->mu);
  if (L->next_pop >= L->paths.size()) return -2;
  size_t want = L->next_pop;
  L->cv_worker.notify_all();
  L->cv_consumer.wait(lk, [&] { return L->ready.count(want) > 0; });
  Frame f = std::move(L->ready[want]);
  L->ready.erase(want);
  L->next_pop++;
  L->cv_worker.notify_all();
  if (!f.ok) return -1;
  long need = (long)f.width * f.height;
  if (need > cap) return -1;
  memcpy(buf, f.pixels.data(), (size_t)need);
  *width = f.width;
  *height = f.height;
  return 0;
}

void frameloader_destroy(void* handle) {
  auto* L = (Loader*)handle;
  {
    std::lock_guard<std::mutex> lk(L->mu);
    L->stop.store(true);
  }
  L->cv_worker.notify_all();
  for (auto& t : L->workers) t.join();
  delete L;
}

}  // extern "C"
