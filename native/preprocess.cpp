// qtpu native host runtime: fused image preprocessing + int8 quantization.
//
// The serving ingest hot path (SURVEY.md §2.2 native-equivalent table; the
// reference has no native code of its own — this is the TPU-build's
// data-loader/runtime component).  Fusing normalize((px/255 - mean)/std) with
// quantization onto the stem's calibrated affine grid on the HOST means the
// engine ships int8 codes instead of f32 pixels to the device: 4x less
// host->device transfer, and zero device work for ingest.
//
// Build: g++ -O3 -march=native -ffp-contract=off -shared -fPIC -o libqtpu_native.so preprocess.cpp -lpthread
// ABI: plain C, consumed via ctypes (qtpu/data/native.py).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

inline int8_t quantize_one(float v, float scale, float zp_u) {
  // Matches qtpu.ops.qops.quantize_act EXACTLY: division (not reciprocal
  // multiply) and separate add, rounded to-even via std::nearbyint — built
  // with -ffp-contract=off so no FMA contraction changes the last ulp.
  float t = v / scale;
  float q = std::nearbyint(t + zp_u);
  q = std::min(std::max(q, 0.0f), 255.0f);
  return static_cast<int8_t>(static_cast<int>(q) - 128);
}

struct Job {
  const uint8_t* src;
  int8_t* dst;
  float* dstf;
  int64_t hwc;
  int channels;
  const float* mean;
  const float* std_dev;
  float scale;
  float zp_u;
};

void run_batch(const Job& job, int64_t n_images, int threads,
               void (*per_image)(const Job&, int64_t)) {
  if (threads <= 1 || n_images <= 1) {
    for (int64_t i = 0; i < n_images; ++i) per_image(job, i);
    return;
  }
  std::atomic<int64_t> next(0);
  std::vector<std::thread> pool;
  int t = std::min<int64_t>(threads, n_images);
  for (int k = 0; k < t; ++k) {
    pool.emplace_back([&] {
      int64_t i;
      while ((i = next.fetch_add(1)) < n_images) per_image(job, i);
    });
  }
  for (auto& th : pool) th.join();
}

void image_to_int8(const Job& job, int64_t i) {
  const uint8_t* s = job.src + i * job.hwc;
  int8_t* d = job.dst + i * job.hwc;
  const int C = job.channels;
  for (int64_t p = 0; p < job.hwc; ++p) {
    const int c = static_cast<int>(p % C);
    const float x = (s[p] / 255.0f - job.mean[c]) / job.std_dev[c];
    d[p] = quantize_one(x, job.scale, job.zp_u);
  }
}

void image_to_f32(const Job& job, int64_t i) {
  const uint8_t* s = job.src + i * job.hwc;
  float* d = job.dstf + i * job.hwc;
  const int C = job.channels;
  for (int64_t p = 0; p < job.hwc; ++p) {
    const int c = static_cast<int>(p % C);
    d[p] = (s[p] / 255.0f - job.mean[c]) / job.std_dev[c];
  }
}

}  // namespace

extern "C" {

// uint8 NHWC images -> int8 codes on the stem's affine grid (signed storage).
// zp_signed is the signed-grid zero point (freeze convention); scale > 0.
void qtpu_preprocess_quantize(const uint8_t* src, int64_t n, int64_t h,
                              int64_t w, int64_t c, const float* mean,
                              const float* std_dev, float scale,
                              int32_t zp_signed, int8_t* dst, int threads) {
  Job job{src, dst, nullptr, h * w * c, static_cast<int>(c), mean,
          std_dev, scale, static_cast<float>(zp_signed + 128)};
  run_batch(job, n, threads, image_to_int8);
}

// uint8 NHWC images -> normalized f32 (no quantization), for fp32 paths.
void qtpu_preprocess_f32(const uint8_t* src, int64_t n, int64_t h, int64_t w,
                         int64_t c, const float* mean, const float* std_dev,
                         float* dst, int threads) {
  Job job{src, nullptr, dst, h * w * c, static_cast<int>(c), mean,
          std_dev, 1.0f, 0.0f};
  run_batch(job, n, threads, image_to_f32);
}

// Parallel gather-pack: n equally-sized images (arbitrary dtype, given as
// raw pointers + bytes_per_image) copied into one contiguous batch buffer.
// The serving scheduler's np.stack of a B=128 f32 round is ~77 MB of
// single-threaded memcpy — comparable to the 8.3 ms device step on a
// directly-attached host — so the pack is a real runtime component, not a
// convenience (engine._dispatch_round uses it via qtpu.data.native).
void qtpu_pack_batch(const void* const* srcs, int64_t n,
                     int64_t bytes_per_image, void* dst, int threads) {
  auto copy_one = [&](int64_t i) {
    std::memcpy(static_cast<char*>(dst) + i * bytes_per_image, srcs[i],
                static_cast<size_t>(bytes_per_image));
  };
  if (threads <= 1 || n <= 1) {
    for (int64_t i = 0; i < n; ++i) copy_one(i);
    return;
  }
  std::atomic<int64_t> next(0);
  std::vector<std::thread> pool;
  int t = std::min<int64_t>(threads, n);
  for (int k = 0; k < t; ++k) {
    pool.emplace_back([&] {
      int64_t i;
      while ((i = next.fetch_add(1)) < n) copy_one(i);
    });
  }
  for (auto& th : pool) th.join();
}

int qtpu_native_version() { return 2; }

}  // extern "C"
