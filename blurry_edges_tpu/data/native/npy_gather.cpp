// Threaded row-gather for host-side batch assembly.
//
// The global-stage training set (~16 GB of images + cached tokens at
// reference scale) exceeds TPU HBM, so batches are gathered on the host
// every step. numpy fancy indexing is single-threaded memcpy; this kernel
// splits the row copies across a small thread pool so batch assembly
// overlaps poorly-amortized memory latency and keeps the device fed.
//
// Built on demand with g++ (see blurry_edges_tpu/data/native.py); plain C ABI
// for ctypes.

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// Gather rows: dst[i, :] = src[idx[i], :] for i in [0, n_idx).
// row_bytes is the byte size of one row; src/dst are raw buffers.
void gather_rows(const char* src, const int64_t* idx, int64_t n_idx,
                 int64_t row_bytes, char* dst, int n_threads) {
  if (n_threads < 1) n_threads = 1;
  if (n_threads > static_cast<int>(n_idx)) n_threads = static_cast<int>(n_idx);
  auto worker = [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      std::memcpy(dst + i * row_bytes, src + idx[i] * row_bytes, row_bytes);
    }
  };
  if (n_threads == 1) {
    worker(0, n_idx);
    return;
  }
  std::vector<std::thread> pool;
  pool.reserve(n_threads);
  int64_t chunk = (n_idx + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    int64_t lo = t * chunk;
    int64_t hi = lo + chunk < n_idx ? lo + chunk : n_idx;
    if (lo >= hi) break;
    pool.emplace_back(worker, lo, hi);
  }
  for (auto& th : pool) th.join();
}

// Gather rows and divide by a per-row scalar (the alpha photon-level
// normalization of data/dataset.py) in the same pass: dst[i, :] =
// src[idx[i], :] / alpha[idx[i]]. float32 only.
void gather_rows_scaled_f32(const float* src, const int64_t* idx,
                            int64_t n_idx, int64_t row_elems,
                            const float* alpha, float* dst, int n_threads) {
  if (n_threads < 1) n_threads = 1;
  if (n_threads > static_cast<int>(n_idx)) n_threads = static_cast<int>(n_idx);
  auto worker = [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      const float inv = 1.0f / alpha[idx[i]];
      const float* s = src + idx[i] * row_elems;
      float* d = dst + i * row_elems;
      for (int64_t j = 0; j < row_elems; ++j) d[j] = s[j] * inv;
    }
  };
  if (n_threads == 1) {
    worker(0, n_idx);
    return;
  }
  std::vector<std::thread> pool;
  pool.reserve(n_threads);
  int64_t chunk = (n_idx + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    int64_t lo = t * chunk;
    int64_t hi = lo + chunk < n_idx ? lo + chunk : n_idx;
    if (lo >= hi) break;
    pool.emplace_back(worker, lo, hi);
  }
  for (auto& th : pool) th.join();
}

}  // extern "C"
