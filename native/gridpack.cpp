// gridpack: native grid packing / compaction for the TPU downscaling runtime.
//
// Role: the "data loader" layer of the framework.  The reference's runtime
// shuttles per-cell pandas DataFrames through Python
// (/root/reference/skdownscale/pointwise_models/core.py:40-66); here the
// host-side hot path is packing a (time, feature, cell) grid into the
// (valid_cell, time, feature) layout the TPU consumes — a fused
// gather+transpose over tens of GB for continental grids.  numpy does this
// as moveaxis+fancy-index (two materializations, single-threaded); this
// library does it in one multithreaded pass.
//
// Exposed via a plain C ABI for ctypes (no pybind11 dependency).
//
// Build: `make -C native` (produces libgridpack.so).

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

int hardware_threads() {
  unsigned n = std::thread::hardware_concurrency();
  return n ? static_cast<int>(n) : 4;
}

// Run fn(first, last) over [0, n) split across threads.
template <typename Fn>
void parallel_for(int64_t n, Fn fn) {
  int nt = hardware_threads();
  if (n < 1024 || nt <= 1) {
    fn(static_cast<int64_t>(0), n);
    return;
  }
  std::vector<std::thread> threads;
  int64_t chunk = (n + nt - 1) / nt;
  for (int t = 0; t < nt; ++t) {
    int64_t lo = t * chunk;
    int64_t hi = std::min(n, lo + chunk);
    if (lo >= hi) break;
    threads.emplace_back([=] { fn(lo, hi); });
  }
  for (auto& th : threads) th.join();
}

template <typename T>
void pack_compact_impl(const T* src, T* dst, const int32_t* cell_ids,
                       int64_t n_time, int64_t n_feat, int64_t n_cells,
                       int64_t n_valid) {
  // src: (T, F, C) C-contiguous; dst: (n_valid, T, F).
  // Cache-blocked transpose: a (TB x VB) tile is read along the contiguous
  // cell axis and written along the contiguous time axis, so both sides hit
  // full cache lines instead of one element per line.
  constexpr int64_t TB = 64, VB = 64;
  const int64_t n_vblocks = (n_valid + VB - 1) / VB;
  parallel_for(n_vblocks, [=](int64_t blo, int64_t bhi) {
    T tile[TB * VB];
    for (int64_t b = blo; b < bhi; ++b) {
      const int64_t v0 = b * VB;
      const int64_t v1 = std::min(n_valid, v0 + VB);
      for (int64_t f = 0; f < n_feat; ++f) {
        for (int64_t t0 = 0; t0 < n_time; t0 += TB) {
          const int64_t t1 = std::min(n_time, t0 + TB);
          for (int64_t t = t0; t < t1; ++t) {
            const T* row = src + (t * n_feat + f) * n_cells;
            T* trow = tile + (t - t0) * VB;
            for (int64_t v = v0; v < v1; ++v) trow[v - v0] = row[cell_ids[v]];
          }
          for (int64_t v = v0; v < v1; ++v) {
            T* out = dst + (v * n_time + t0) * n_feat + f;
            const T* tcol = tile + (v - v0);
            for (int64_t t = t0; t < t1; ++t) out[(t - t0) * n_feat] = tcol[(t - t0) * VB];
          }
        }
      }
    }
  });
}

template <typename T>
void unpack_scatter_impl(const T* src, T* dst, const int32_t* cell_ids,
                         int64_t n_time, int64_t n_out, int64_t n_cells,
                         int64_t n_valid, T fill) {
  // src: (n_valid, T, O); dst: (T, O, C) prefilled with `fill`.
  // Blocked like pack_compact: read along time, write along cells.
  parallel_for(n_time * n_out, [=](int64_t lo, int64_t hi) {
    for (int64_t to = lo; to < hi; ++to) {
      T* drow = dst + to * n_cells;
      for (int64_t c = 0; c < n_cells; ++c) drow[c] = fill;
    }
  });
  constexpr int64_t TB = 64, VB = 64;
  const int64_t n_vblocks = (n_valid + VB - 1) / VB;
  parallel_for(n_vblocks, [=](int64_t blo, int64_t bhi) {
    T tile[TB * VB];
    for (int64_t b = blo; b < bhi; ++b) {
      const int64_t v0 = b * VB;
      const int64_t v1 = std::min(n_valid, v0 + VB);
      for (int64_t o = 0; o < n_out; ++o) {
        for (int64_t t0 = 0; t0 < n_time; t0 += TB) {
          const int64_t t1 = std::min(n_time, t0 + TB);
          for (int64_t v = v0; v < v1; ++v) {
            const T* in = src + (v * n_time + t0) * n_out + o;
            T* tcol = tile + (v - v0);
            for (int64_t t = t0; t < t1; ++t) tcol[(t - t0) * VB] = in[(t - t0) * n_out];
          }
          for (int64_t t = t0; t < t1; ++t) {
            T* drow = dst + (t * n_out + o) * n_cells;
            const T* trow = tile + (t - t0) * VB;
            for (int64_t v = v0; v < v1; ++v) drow[cell_ids[v]] = trow[v - v0];
          }
        }
      }
    }
  });
}

template <typename T>
int64_t valid_mask_impl(const T* first_slice, uint8_t* mask, int64_t n_cells) {
  std::atomic<int64_t> count{0};
  parallel_for(n_cells, [&](int64_t lo, int64_t hi) {
    int64_t local = 0;
    for (int64_t c = lo; c < hi; ++c) {
      bool ok = !std::isnan(static_cast<double>(first_slice[c]));
      mask[c] = ok ? 1 : 0;
      local += ok;
    }
    count += local;
  });
  return count.load();
}

}  // namespace

extern "C" {

void gridpack_pack_f32(const float* src, float* dst, const int32_t* cell_ids,
                       int64_t n_time, int64_t n_feat, int64_t n_cells,
                       int64_t n_valid) {
  pack_compact_impl(src, dst, cell_ids, n_time, n_feat, n_cells, n_valid);
}

void gridpack_pack_f64(const double* src, double* dst, const int32_t* cell_ids,
                       int64_t n_time, int64_t n_feat, int64_t n_cells,
                       int64_t n_valid) {
  pack_compact_impl(src, dst, cell_ids, n_time, n_feat, n_cells, n_valid);
}

void gridpack_unpack_f32(const float* src, float* dst, const int32_t* cell_ids,
                         int64_t n_time, int64_t n_out, int64_t n_cells,
                         int64_t n_valid, float fill) {
  unpack_scatter_impl(src, dst, cell_ids, n_time, n_out, n_cells, n_valid, fill);
}

void gridpack_unpack_f64(const double* src, double* dst, const int32_t* cell_ids,
                         int64_t n_time, int64_t n_out, int64_t n_cells,
                         int64_t n_valid, double fill) {
  unpack_scatter_impl(src, dst, cell_ids, n_time, n_out, n_cells, n_valid, fill);
}

int64_t gridpack_valid_mask_f32(const float* first_slice, uint8_t* mask,
                                int64_t n_cells) {
  return valid_mask_impl(first_slice, mask, n_cells);
}

int64_t gridpack_valid_mask_f64(const double* first_slice, uint8_t* mask,
                                int64_t n_cells) {
  return valid_mask_impl(first_slice, mask, n_cells);
}

}  // extern "C"
