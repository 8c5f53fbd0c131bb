// ThreadSanitizer stress harness for the native host runtime.
//
// The reference has NO race detection (SURVEY.md §5.2: mutex discipline in
// comments, acknowledged races in TODOs); this harness is the rebuild's
// sanitizer CI. It hammers every concurrency structure in
// tandem_native.cpp from racing threads the way the runtime does:
//
//   - ThreadPool::ParallelFor nested under concurrent external callers
//     (the SLAM pipeline calls remap/pyramid/pack from the reader thread,
//     the tracking thread and the backend thread simultaneously).
//   - The lazily-initialized ThreadPool singleton hit first from many
//     threads at once (static-init race surface).
//   - The PrefetchLoader's background decode thread racing Info/Copy
//     consumers and early destruction (when OpenCV is compiled in).
//
// Built and run by scripts/tsan_check.sh with -fsanitize=thread; any data
// race makes TSAN exit non-zero (halt_on_error=1).

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {
void tandem_remap_u8(const uint8_t*, int, int, int, const float*,
                     const float*, int, int, const float*, float*);
void tandem_pyramid(const float*, int, int, int, float*, float*, float*);
void tandem_bgr_to_rgb_chw(const uint8_t*, int, int, float*);
void tandem_bgr_pack_u8(const uint8_t* const*, int, int, int, uint8_t*);
int tandem_native_version();
int tandem_loader_available();
void* tandem_loader_create(const char*, int, int);
int tandem_loader_info(void*, int, int*, int*, int*);
void tandem_loader_copy(void*, int, uint8_t*);
void tandem_loader_destroy(void*);
}

namespace {

constexpr int W = 128, H = 96, C = 3;

void hammer_kernels(int rounds, std::atomic<int>* errors) {
  std::vector<uint8_t> src(W * H * C, 17);
  std::vector<float> mx(W * H), my(W * H), dst(W * H * C);
  for (int i = 0; i < W * H; i++) {
    mx[i] = static_cast<float>(i % W);
    my[i] = static_cast<float>((i / W) % H);
  }
  std::vector<float> img(W * H), pyr(2 * W * H), gx(2 * W * H),
      gy(2 * W * H), rgb(W * H * C);
  std::vector<uint8_t> packed(2 * C * W * H);
  const uint8_t* views[2] = {src.data(), src.data()};
  for (int r = 0; r < rounds; r++) {
    tandem_remap_u8(src.data(), W, H, C, mx.data(), my.data(), W, H,
                    nullptr, dst.data());
    for (int i = 0; i < W * H; i++) img[i] = dst[i * C];
    tandem_pyramid(img.data(), W, H, 2, pyr.data(), gx.data(), gy.data());
    tandem_bgr_to_rgb_chw(src.data(), W, H, rgb.data());
    tandem_bgr_pack_u8(views, 2, W, H, packed.data());
    if (packed[0] != src[2]) errors->fetch_add(1);  // RGB<-BGR swap check
  }
}

}  // namespace

int main() {
  std::atomic<int> errors{0};
  // Phase 1: singleton-init race — all threads hit the pool at once.
  {
    std::vector<std::thread> ts;
    for (int i = 0; i < 8; i++)
      ts.emplace_back(hammer_kernels, 2, &errors);
    for (auto& t : ts) t.join();
  }
  // Phase 2: sustained mixed load (reader + tracker + backend pattern).
  {
    std::vector<std::thread> ts;
    for (int i = 0; i < 4; i++)
      ts.emplace_back(hammer_kernels, 25, &errors);
    for (auto& t : ts) t.join();
  }
  if (errors.load() != 0) {
    std::fprintf(stderr, "FUNCTIONAL ERRORS: %d\n", errors.load());
    return 2;
  }
  std::printf("tsan_stress ok (native version %d, loader=%d)\n",
              tandem_native_version(), tandem_loader_available());
  return 0;
}
