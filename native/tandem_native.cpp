// tandem_native: host-side runtime kernels for the TPU-native TANDEM stack.
//
// Native equivalents of the reference's C++ data path (tandem/src/util/
// Undistort.cpp remap loops, HessianBlocks makeImages pyramid+gradients, and
// the IndexThreadReduce worker pool, IndexThreadReduce.h:38-76): image
// undistortion remap with photometric LUT, pyramid/gradient construction,
// and a std::thread parallel-for. Exposed via a C ABI for ctypes.
//
// Build: g++ -O3 -march=native -shared -fPIC -std=c++17 -pthread
//        tandem_native.cpp -o libtandem_native.so

#include <algorithm>
#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <functional>
#include <mutex>
#include <thread>
#include <vector>

namespace {

// ----------------------------------------------------------------------
// Thread pool: fixed workers, map over index ranges (IndexThreadReduce).
class ThreadPool {
 public:
  explicit ThreadPool(int n) : stop_(false), active_(0) {
    for (int i = 0; i < n; i++)
      workers_.emplace_back([this] { WorkerLoop(); });
  }
  ~ThreadPool() {
    {
      std::unique_lock<std::mutex> lk(m_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& t : workers_) t.join();
  }

  // Blocks until fn(lo, hi) has been applied over [0, total) in chunks.
  // Concurrent external callers serialize on submit_m_: the pipeline calls
  // into the native kernels from the reader, tracking and backend threads
  // simultaneously, and the dispatch state (next_/total_/chunk_/fn_) is
  // one set of slots (race found by scripts/tsan_check.sh, fixed here;
  // the reference's IndexThreadReduce has one instance per owner thread
  // instead — IndexThreadReduce.h:38).
  void ParallelFor(int total, int chunk,
                   const std::function<void(int, int)>& fn) {
    if (total <= 0) return;
    std::lock_guard<std::mutex> submit_lock(submit_m_);
    next_.store(0);
    total_ = total;
    chunk_ = std::max(chunk, 1);
    fn_ = &fn;
    {
      std::unique_lock<std::mutex> lk(m_);
      pending_ = (int)workers_.size();
      generation_++;
    }
    cv_.notify_all();
    // Main thread participates too.
    Drain();
    std::unique_lock<std::mutex> lk(m_);
    done_cv_.wait(lk, [this] { return pending_ == 0 && active_ == 0; });
    fn_ = nullptr;
  }

  static ThreadPool& Instance() {
    static ThreadPool pool(
        std::max(2u, std::thread::hardware_concurrency()) - 1);
    return pool;
  }

 private:
  void Drain() {
    const std::function<void(int, int)>* fn = fn_;
    if (!fn) return;
    while (true) {
      int lo = next_.fetch_add(chunk_);
      if (lo >= total_) break;
      (*fn)(lo, std::min(lo + chunk_, total_));
    }
  }
  void WorkerLoop() {
    int seen_gen = 0;
    while (true) {
      {
        std::unique_lock<std::mutex> lk(m_);
        cv_.wait(lk, [&] { return stop_ || generation_ != seen_gen; });
        if (stop_) return;
        seen_gen = generation_;
        active_++;
        pending_--;
      }
      Drain();
      {
        std::unique_lock<std::mutex> lk(m_);
        active_--;
        if (pending_ == 0 && active_ == 0) done_cv_.notify_all();
      }
    }
  }

  std::vector<std::thread> workers_;
  std::mutex submit_m_;   // serializes external ParallelFor callers
  std::mutex m_;
  std::condition_variable cv_, done_cv_;
  bool stop_;
  int pending_ = 0, active_ = 0, generation_ = 0;
  std::atomic<int> next_{0};
  int total_ = 0, chunk_ = 1;
  const std::function<void(int, int)>* fn_ = nullptr;
};

inline float BilinearU8(const uint8_t* img, int w, int h, int stride, int c,
                        int ch, float x, float y) {
  int x0 = (int)x, y0 = (int)y;
  float wx = x - x0, wy = y - y0;
  const uint8_t* p00 = img + (y0 * stride + x0) * c + ch;
  const uint8_t* p01 = p00 + c;
  const uint8_t* p10 = p00 + stride * c;
  const uint8_t* p11 = p10 + c;
  return (1 - wx) * (1 - wy) * *p00 + wx * (1 - wy) * *p01 +
         (1 - wx) * wy * *p10 + wx * wy * *p11;
}

}  // namespace

extern "C" {

// Undistort an 8-bit image (C channels) into float32 output using remap
// grids; invalid (negative) map entries produce 0. Optional 256-entry LUT
// applies the photometric inverse response per channel.
void tandem_remap_u8(const uint8_t* src, int in_w, int in_h, int channels,
                     const float* map_x, const float* map_y, int out_w,
                     int out_h, const float* lut256, float* dst) {
  ThreadPool::Instance().ParallelFor(out_h, 16, [&](int lo, int hi) {
    for (int y = lo; y < hi; y++) {
      for (int x = 0; x < out_w; x++) {
        int o = y * out_w + x;
        float mx = map_x[o], my = map_y[o];
        if (mx < 0 || my < 0 || mx > in_w - 1.001f || my > in_h - 1.001f) {
          for (int ch = 0; ch < channels; ch++) dst[o * channels + ch] = 0.f;
          continue;
        }
        for (int ch = 0; ch < channels; ch++) {
          float v = BilinearU8(src, in_w, in_h, in_w, channels, ch, mx, my);
          if (lut256) {
            int i0 = (int)v;
            i0 = std::min(i0, 254);
            float f = v - i0;
            v = lut256[i0] * (1 - f) + lut256[i0 + 1] * f;
          }
          dst[o * channels + ch] = v;
        }
      }
    }
  });
}

// Build an L-level intensity pyramid with central-difference gradients.
// out layout: level l buffers are packed consecutively; caller provides
// pointers per level via offsets (img, gx, gy each sized sum(H_l*W_l)).
void tandem_pyramid(const float* img0, int w, int h, int levels, float* imgs,
                    float* gxs, float* gys) {
  std::vector<int> ws(levels), hs(levels), off(levels);
  int acc = 0;
  for (int l = 0; l < levels; l++) {
    ws[l] = w >> l;
    hs[l] = h >> l;
    off[l] = acc;
    acc += ws[l] * hs[l];
  }
  std::memcpy(imgs, img0, sizeof(float) * w * h);
  for (int l = 1; l < levels; l++) {
    const float* src = imgs + off[l - 1];
    float* dst = imgs + off[l];
    int sw = ws[l - 1];
    ThreadPool::Instance().ParallelFor(hs[l], 16, [&](int lo, int hi) {
      for (int y = lo; y < hi; y++)
        for (int x = 0; x < ws[l]; x++)
          dst[y * ws[l] + x] =
              0.25f * (src[(2 * y) * sw + 2 * x] + src[(2 * y) * sw + 2 * x + 1] +
                       src[(2 * y + 1) * sw + 2 * x] +
                       src[(2 * y + 1) * sw + 2 * x + 1]);
    });
  }
  for (int l = 0; l < levels; l++) {
    const float* src = imgs + off[l];
    float* gx = gxs + off[l];
    float* gy = gys + off[l];
    int lw = ws[l], lh = hs[l];
    ThreadPool::Instance().ParallelFor(lh, 32, [&](int lo, int hi) {
      for (int y = lo; y < hi; y++)
        for (int x = 0; x < lw; x++) {
          int i = y * lw + x;
          gx[i] = (x > 0 && x < lw - 1)
                      ? 0.5f * (src[i + 1] - src[i - 1]) : 0.f;
          gy[i] = (y > 0 && y < lh - 1)
                      ? 0.5f * (src[i + lw] - src[i - lw]) : 0.f;
        }
    });
  }
}

// BGR uint8 -> packed RGB float [0,1] (dr_mvsnet input packing hot loop,
// dr_mvsnet.cpp:205-217).
void tandem_bgr_to_rgb_chw(const uint8_t* bgr, int w, int h, float* rgb_chw) {
  const float inv = 1.0f / 255.0f;
  ThreadPool::Instance().ParallelFor(h, 32, [&](int lo, int hi) {
    for (int y = lo; y < hi; y++)
      for (int x = 0; x < w; x++) {
        int i = y * w + x;
        rgb_chw[0 * w * h + i] = bgr[i * 3 + 2] * inv;
        rgb_chw[1 * w * h + i] = bgr[i * 3 + 1] * inv;
        rgb_chw[2 * w * h + i] = bgr[i * 3 + 0] * inv;
      }
  });
}

// Multi-view uint8 BGR HWC -> RGB CHW repack for the MVSNet runner's
// input contract (dr_mvsnet.cpp:180-250 does the same on the GPU; here
// the device gets uint8 and normalizes on-chip, so the host only
// reorders bytes). ~16 ms/KF in numpy for 7x480x640 — strided uint8
// transposes defeat its vectorization; the row loop below is memory-
// bound and parallelized across rows of all views.
void tandem_bgr_pack_u8(const uint8_t* const* bgr_views, int n_views,
                        int w, int h, uint8_t* out) {
  ThreadPool::Instance().ParallelFor(n_views * h, 32, [&](int lo, int hi) {
    for (int r = lo; r < hi; r++) {
      int v = r / h, y = r % h;
      const uint8_t* src = bgr_views[v] + (size_t)y * w * 3;
      uint8_t* dst = out + ((size_t)v * 3) * w * h + (size_t)y * w;
      const size_t plane = (size_t)w * h;
      for (int x = 0; x < w; x++) {
        dst[x] = src[x * 3 + 2];
        dst[plane + x] = src[x * 3 + 1];
        dst[2 * plane + x] = src[x * 3 + 0];
      }
    }
  });
}

int tandem_native_version() { return 3; }

}  // extern "C"

// ----------------------------------------------------------------------
// Prefetching image loader: the native equivalent of the reference's
// DatasetReader preload / per-frame read path (ImageRW + preload option,
// tandem/src/util/DatasetReader.h) — a background thread decodes frames
// ahead of the consumer into a bounded window, so PNG/JPEG decode never
// sits on the tracking thread. Requires OpenCV imgcodecs; compiled out
// (functions return failure) when the headers are unavailable.
#if defined(TANDEM_WITH_OPENCV)
#include <opencv2/core.hpp>
#include <opencv2/imgcodecs.hpp>

#include <map>
#include <sstream>
#include <string>

namespace {

class PrefetchLoader {
 public:
  PrefetchLoader(std::vector<std::string> paths, int ahead)
      : paths_(std::move(paths)), ahead_(std::max(ahead, 1)), stop_(false),
        consumer_(0) {
    worker_ = std::thread([this] { Loop(); });
  }
  ~PrefetchLoader() {
    {
      std::unique_lock<std::mutex> lk(m_);
      stop_ = true;
    }
    cv_.notify_all();
    worker_.join();
  }

  // Blocks until frame idx is decoded; fills dims. false = unavailable
  // (decode failed, out of range, or a BACKWARD seek past an already-spent
  // frame — the worker only decodes forward; the caller falls back to a
  // synchronous read instead of waiting forever).
  bool Info(int idx, int* h, int* w, int* c) {
    std::unique_lock<std::mutex> lk(m_);
    if (idx < 0 || idx >= (int)paths_.size()) return false;
    if (idx > consumer_) consumer_ = idx;   // advance the window
    cv_.notify_all();
    ready_cv_.wait(lk, [&] {
      return cache_.count(idx) || failed_.count(idx) ||
             (idx < decoded_next_ && !cache_.count(idx));
    });
    if (!cache_.count(idx)) return false;
    const cv::Mat& m = cache_[idx];
    *h = m.rows;
    *w = m.cols;
    *c = m.channels();
    return true;
  }

  void Copy(int idx, uint8_t* dst) {
    std::unique_lock<std::mutex> lk(m_);
    auto it = cache_.find(idx);
    if (it == cache_.end()) return;
    const cv::Mat& m = it->second;
    std::memcpy(dst, m.data, (size_t)m.rows * m.cols * m.channels());
    // Frames at or before the consumer cursor are spent.
    for (auto jt = cache_.begin(); jt != cache_.end();)
      jt = (jt->first <= idx) ? cache_.erase(jt) : std::next(jt);
    cv_.notify_all();
  }

 private:
  void Loop() {
    int next = 0;
    while (true) {
      {
        std::unique_lock<std::mutex> lk(m_);
        cv_.wait(lk, [&] {
          return stop_ || (next < (int)paths_.size()
                           && next <= consumer_ + ahead_
                           && (int)cache_.size() < 2 * ahead_);
        });
        if (stop_) return;
        if (next < consumer_) next = consumer_;  // seek forward
      }
      cv::Mat m = cv::imread(paths_[next], cv::IMREAD_COLOR);
      {
        std::unique_lock<std::mutex> lk(m_);
        if (m.empty())
          failed_[next] = true;
        else
          cache_[next] = m;
        decoded_next_ = next + 1;
        ready_cv_.notify_all();
      }
      next++;
    }
  }

  std::vector<std::string> paths_;
  int ahead_;
  bool stop_;
  int consumer_;
  int decoded_next_ = 0;   // worker's forward watermark (under m_)
  std::thread worker_;
  std::mutex m_;
  std::condition_variable cv_, ready_cv_;
  std::map<int, cv::Mat> cache_;
  std::map<int, bool> failed_;
};

}  // namespace

extern "C" {

void* tandem_loader_create(const char* paths_joined, int n, int ahead) {
  std::vector<std::string> paths;
  std::stringstream ss(paths_joined);
  std::string line;
  while (std::getline(ss, line, '\n'))
    if (!line.empty()) paths.push_back(line);
  if ((int)paths.size() != n) return nullptr;
  return new PrefetchLoader(std::move(paths), ahead);
}

int tandem_loader_info(void* h, int idx, int* out_h, int* out_w, int* out_c) {
  return static_cast<PrefetchLoader*>(h)->Info(idx, out_h, out_w, out_c)
             ? 0 : -1;
}

void tandem_loader_copy(void* h, int idx, uint8_t* dst) {
  static_cast<PrefetchLoader*>(h)->Copy(idx, dst);
}

void tandem_loader_destroy(void* h) { delete static_cast<PrefetchLoader*>(h); }

int tandem_loader_available() { return 1; }

}  // extern "C"

#else  // !TANDEM_WITH_OPENCV

extern "C" {
void* tandem_loader_create(const char*, int, int) { return nullptr; }
int tandem_loader_info(void*, int, int*, int*, int*) { return -1; }
void tandem_loader_copy(void*, int, uint8_t*) {}
void tandem_loader_destroy(void*) {}
int tandem_loader_available() { return 0; }
}  // extern "C"

#endif  // TANDEM_WITH_OPENCV
