// Native frame loader: threaded prefetching JPEG/PNG decode for the SLAM
// data pipeline.
//
// TPU-native equivalent of the reference's native IO stack: the C++ `lycon`
// image loader (utils/dataset.py:9,261) plus the implicit OS readahead the
// reference relied on. A pool of worker threads decodes frames ahead of the
// consumer into a bounded in-memory window, so the frontend's per-frame
// dataset[idx] never blocks on disk or on libjpeg for sequentially consumed
// streams — decode overlaps with TPU compute.
//
// C ABI (consumed via ctypes from monogs_tpu/data/native_loader.py):
//   void* fl_create(const char** color, const char** depth, int n,
//                   int n_threads, int window);
//   int   fl_frame_size(void*, int idx, int* w, int* h, int* dw, int* dh);
//   int   fl_get(void*, int idx, unsigned char* rgb, unsigned short* depth);
//   void  fl_destroy(void*);
//
// fl_get returns 0 on success; frames are decoded on demand if not already
// prefetched, and requesting frame i schedules decodes of (i+1 .. i+window).

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <map>
#include <memory>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>
#include <csetjmp>

namespace {

struct Image8 {
  int w = 0, h = 0, c = 0;
  std::vector<uint8_t> data;  // HWC
};

struct Image16 {
  int w = 0, h = 0;
  std::vector<uint16_t> data;  // HW
};

struct JpegErr {
  jpeg_error_mgr pub;
  jmp_buf jmp;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jmp, 1);
}

bool decode_jpeg(const std::string& path, Image8* out) {
  FILE* f = fopen(path.c_str(), "rb");
  if (!f) return false;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jmp)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  out->w = cinfo.output_width;
  out->h = cinfo.output_height;
  out->c = 3;
  out->data.resize(size_t(out->w) * out->h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->data.data() + size_t(cinfo.output_scanline) * out->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return true;
}

// PNG decode: 8-bit RGB(A)/gray -> Image8 (RGB), 16-bit gray -> Image16.
bool decode_png(const std::string& path, Image8* rgb, Image16* depth16) {
  FILE* f = fopen(path.c_str(), "rb");
  if (!f) return false;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) { fclose(f); return false; }
  png_infop info = png_create_info_struct(png);
  if (!info || setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(f);
    return false;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  int w = png_get_image_width(png, info);
  int h = png_get_image_height(png, info);
  int depth = png_get_bit_depth(png, info);
  int color = png_get_color_type(png, info);

  if (depth == 16 && depth16 != nullptr) {
    // 16-bit grayscale depth map (TUM/Replica depth PNGs), big-endian in file
    png_set_swap(png);
    depth16->w = w;
    depth16->h = h;
    depth16->data.resize(size_t(w) * h);
    std::vector<png_bytep> rows(h);
    for (int y = 0; y < h; y++)
      rows[y] = reinterpret_cast<png_bytep>(depth16->data.data() + size_t(y) * w);
    png_read_image(png, rows.data());
  } else if (rgb != nullptr) {
    if (depth == 16) png_set_strip_16(png);
    if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
    if (color == PNG_COLOR_TYPE_GRAY || color == PNG_COLOR_TYPE_GRAY_ALPHA)
      png_set_gray_to_rgb(png);
    if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
    png_set_strip_alpha(png);
    png_read_update_info(png, info);
    rgb->w = w;
    rgb->h = h;
    rgb->c = 3;
    rgb->data.resize(size_t(w) * h * 3);
    std::vector<png_bytep> rows(h);
    for (int y = 0; y < h; y++)
      rows[y] = rgb->data.data() + size_t(y) * w * 3;
    png_read_image(png, rows.data());
  } else {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(f);
    return false;
  }
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(f);
  return true;
}

bool ends_with(const std::string& s, const char* suf) {
  size_t n = strlen(suf);
  if (s.size() < n) return false;
  std::string tail = s.substr(s.size() - n);
  for (auto& ch : tail) ch = tolower(ch);
  return tail == suf;
}

struct Frame {
  Image8 rgb;
  Image16 depth;
  bool ok = false;
};

class Loader {
 public:
  Loader(std::vector<std::string> color, std::vector<std::string> depth,
         int n_threads, int window)
      : color_(std::move(color)), depth_(std::move(depth)),
        window_(window < 1 ? 1 : window), stop_(false) {
    int nt = n_threads < 1 ? 1 : n_threads;
    for (int i = 0; i < nt; i++)
      workers_.emplace_back([this] { worker(); });
  }

  ~Loader() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& t : workers_) t.join();
  }

  std::shared_ptr<Frame> get(int idx) {
    schedule_window(idx);
    std::unique_lock<std::mutex> lk(mu_);
    done_cv_.wait(lk, [&] { return cache_.count(idx) > 0; });
    auto frame = cache_[idx];
    // evict frames behind the cursor
    for (auto it = cache_.begin(); it != cache_.end();)
      it = (it->first < idx) ? cache_.erase(it) : ++it;
    return frame;
  }

 private:
  void schedule_window(int idx) {
    std::lock_guard<std::mutex> lk(mu_);
    for (int i = idx; i < idx + window_ && i < (int)color_.size(); i++) {
      if (!cache_.count(i) && !pending_.count(i)) {
        pending_.insert({i, true});
        queue_.push_back(i);
      }
    }
    cv_.notify_all();
  }

  void worker() {
    for (;;) {
      int idx;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_.wait(lk, [&] { return stop_ || !queue_.empty(); });
        if (stop_) return;
        idx = queue_.front();
        queue_.pop_front();
      }
      auto frame = std::make_shared<Frame>();
      const std::string& cp = color_[idx];
      bool ok;
      if (ends_with(cp, ".jpg") || ends_with(cp, ".jpeg"))
        ok = decode_jpeg(cp, &frame->rgb);
      else
        ok = decode_png(cp, &frame->rgb, nullptr);
      if (ok && idx < (int)depth_.size() && !depth_[idx].empty())
        ok = decode_png(depth_[idx], nullptr, &frame->depth);
      frame->ok = ok;
      {
        std::lock_guard<std::mutex> lk(mu_);
        cache_[idx] = frame;
        pending_.erase(idx);
      }
      done_cv_.notify_all();
    }
  }

  std::vector<std::string> color_, depth_;
  int window_;
  bool stop_;
  std::mutex mu_;
  std::condition_variable cv_, done_cv_;
  std::deque<int> queue_;
  std::map<int, std::shared_ptr<Frame>> cache_;
  std::map<int, bool> pending_;
  std::vector<std::thread> workers_;
};

}  // namespace

extern "C" {

void* fl_create(const char** color, const char** depth, int n, int n_threads,
                int window) {
  std::vector<std::string> c(n), d;
  for (int i = 0; i < n; i++) c[i] = color[i];
  if (depth != nullptr) {
    d.resize(n);
    for (int i = 0; i < n; i++) d[i] = depth[i] ? depth[i] : "";
  }
  return new Loader(std::move(c), std::move(d), n_threads, window);
}

int fl_frame_size(void* h, int idx, int* w, int* ht, int* dw, int* dh) {
  auto frame = static_cast<Loader*>(h)->get(idx);
  if (!frame->ok) return -1;
  *w = frame->rgb.w;
  *ht = frame->rgb.h;
  *dw = frame->depth.w;
  *dh = frame->depth.h;
  return 0;
}

int fl_get(void* h, int idx, unsigned char* rgb, unsigned short* depth) {
  auto frame = static_cast<Loader*>(h)->get(idx);
  if (!frame->ok) return -1;
  if (rgb) memcpy(rgb, frame->rgb.data.data(), frame->rgb.data.size());
  if (depth && !frame->depth.data.empty())
    memcpy(depth, frame->depth.data.data(),
           frame->depth.data.size() * sizeof(uint16_t));
  return 0;
}

void fl_destroy(void* h) { delete static_cast<Loader*>(h); }

}  // extern "C"
