// skinjax native input staging — the data-loader runtime piece.
//
// The reference gets host-side input parallelism from torch DataLoader worker
// *processes* (train_pad_20.py:306-335). Here the heavy per-batch work —
// gathering sampled rows out of the decoded uint8 image cache and resizing to
// the model's static input — runs in C++ threads without GIL or pickling
// overhead, feeding the device transfer directly.
//
// Build: g++ -O3 -march=native -shared -fPIC -o _staging.so staging.cc -lpthread
// (driven by skinjax/data/native.py, cached next to this file).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

void parallel_for(int64_t n, int n_threads, void (*body)(int64_t, int64_t, void*),
                  void* ctx) {
  n_threads = std::max(1, n_threads);
  if (n_threads == 1 || n < 2) {
    body(0, n, ctx);
    return;
  }
  std::vector<std::thread> threads;
  int64_t chunk = (n + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    int64_t lo = t * chunk;
    int64_t hi = std::min(n, lo + chunk);
    if (lo >= hi) break;
    threads.emplace_back(body, lo, hi, ctx);
  }
  for (auto& th : threads) th.join();
}

struct GatherCtx {
  const uint8_t* cache;
  const int64_t* indices;
  int64_t item_bytes;
  uint8_t* out;
};

void gather_body(int64_t lo, int64_t hi, void* p) {
  auto* c = static_cast<GatherCtx*>(p);
  for (int64_t i = lo; i < hi; ++i) {
    std::memcpy(c->out + i * c->item_bytes,
                c->cache + c->indices[i] * c->item_bytes,
                static_cast<size_t>(c->item_bytes));
  }
}

struct ResizeCtx {
  const uint8_t* src;
  int h, w;
  uint8_t* dst;
  int oh, ow;
};

// per-image bilinear resize, HWC uint8, 3 channels (cv2 INTER_LINEAR
// half-pixel convention)
void resize_one(const uint8_t* src, int h, int w, uint8_t* dst, int oh, int ow) {
  const float sy = static_cast<float>(h) / oh;
  const float sx = static_cast<float>(w) / ow;
  for (int oy = 0; oy < oh; ++oy) {
    float fy = (oy + 0.5f) * sy - 0.5f;
    int y0 = static_cast<int>(fy >= 0 ? fy : fy - 1);  // floor
    float wy = fy - y0;
    int y0c = std::min(std::max(y0, 0), h - 1);
    int y1c = std::min(std::max(y0 + 1, 0), h - 1);
    for (int ox = 0; ox < ow; ++ox) {
      float fx = (ox + 0.5f) * sx - 0.5f;
      int x0 = static_cast<int>(fx >= 0 ? fx : fx - 1);
      float wx = fx - x0;
      int x0c = std::min(std::max(x0, 0), w - 1);
      int x1c = std::min(std::max(x0 + 1, 0), w - 1);
      const uint8_t* p00 = src + (y0c * w + x0c) * 3;
      const uint8_t* p01 = src + (y0c * w + x1c) * 3;
      const uint8_t* p10 = src + (y1c * w + x0c) * 3;
      const uint8_t* p11 = src + (y1c * w + x1c) * 3;
      uint8_t* o = dst + (oy * ow + ox) * 3;
      for (int ch = 0; ch < 3; ++ch) {
        float v = p00[ch] * (1 - wy) * (1 - wx) + p01[ch] * (1 - wy) * wx +
                  p10[ch] * wy * (1 - wx) + p11[ch] * wy * wx;
        o[ch] = static_cast<uint8_t>(v + 0.5f);
      }
    }
  }
}

void resize_body(int64_t lo, int64_t hi, void* p) {
  auto* c = static_cast<ResizeCtx*>(p);
  const int64_t in_stride = static_cast<int64_t>(c->h) * c->w * 3;
  const int64_t out_stride = static_cast<int64_t>(c->oh) * c->ow * 3;
  for (int64_t i = lo; i < hi; ++i) {
    resize_one(c->src + i * in_stride, c->h, c->w, c->dst + i * out_stride,
               c->oh, c->ow);
  }
}

}  // namespace

extern "C" {

// Gather n items of item_bytes each from cache[indices[i]] into out.
void skinjax_gather_u8(const uint8_t* cache, const int64_t* indices, int64_t n,
                       int64_t item_bytes, uint8_t* out, int n_threads) {
  GatherCtx ctx{cache, indices, item_bytes, out};
  parallel_for(n, n_threads, gather_body, &ctx);
}

// Batch bilinear resize: src (n, h, w, 3) u8 -> dst (n, oh, ow, 3) u8.
void skinjax_resize_bilinear_u8(const uint8_t* src, int64_t n, int h, int w,
                                uint8_t* dst, int oh, int ow, int n_threads) {
  ResizeCtx ctx{src, h, w, dst, oh, ow};
  parallel_for(n, n_threads, resize_body, &ctx);
}

}  // extern "C"
