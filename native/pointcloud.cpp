// Host-side point-cloud runtime for dicp_tpu: fast I/O and preprocessing
// that feeds the TPU compute path.
//
// The reference has no native components (SURVEY.md §2.2) and no data loader
// at all — clouds arrive as in-memory torch tensors.  A production LiDAR
// odometry engine spends real wall-clock on the host side of the pipeline:
// reading scans from disk, voxel-downsampling, range filtering.  Doing this
// in Python costs more than the TPU solve itself; this library keeps the
// host side off the critical path (the device-side jittable voxel filter in
// dicp_tpu/ops/voxel.py remains for clouds already resident in HBM).
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in this image).
// All functions are thread-safe (no globals) so the Python loader can
// prefetch scans from a thread pool.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <unordered_map>
#include <vector>

extern "C" {

// Read a KITTI-style .bin scan (float32 records of `stride` values per
// point, x/y/z first).  Returns the number of points read into `out`
// (caller allocates max_points * stride floats), or -1 on I/O error.
int64_t pc_load_bin(const char* path, float* out, int64_t max_points,
                    int32_t stride) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  size_t want = static_cast<size_t>(max_points) * stride;
  size_t got = std::fread(out, sizeof(float), want, f);
  std::fclose(f);
  return static_cast<int64_t>(got / stride);
}

// Write a .bin scan; returns points written or -1.
int64_t pc_save_bin(const char* path, const float* data, int64_t n_points,
                    int32_t stride) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return -1;
  size_t want = static_cast<size_t>(n_points) * stride;
  size_t put = std::fwrite(data, sizeof(float), want, f);
  std::fclose(f);
  return static_cast<int64_t>(put / stride);
}

namespace {
struct CellSum {
  double acc[8] = {0, 0, 0, 0, 0, 0, 0, 0};  // up to 8 averaged columns
  uint32_t count = 0;
  int64_t first = 0;  // first-point index, for deterministic ordering
};
}  // namespace

// Voxel-grid downsample: average all columns of the points falling in each
// (voxel)^3 cell, emit one centroid per occupied cell ordered by first
// occurrence (deterministic).  points: n x stride row-major, x/y/z first;
// out: caller-allocated n x stride; out_weight (optional): points per cell.
// Returns the number of occupied cells.
int64_t pc_voxel_downsample(const float* points, int64_t n, int32_t stride,
                            float voxel, float* out, float* out_weight) {
  if (stride > 8 || stride < 3 || voxel <= 0.f) return -1;
  const double inv = 1.0 / voxel;
  std::unordered_map<uint64_t, CellSum> cells;
  cells.reserve(static_cast<size_t>(n));

  for (int64_t i = 0; i < n; ++i) {
    const float* p = points + i * stride;
    // 21-bit signed cell coordinates packed into one 64-bit key
    const int64_t cx = static_cast<int64_t>(std::floor(p[0] * inv)) & 0x1FFFFF;
    const int64_t cy = static_cast<int64_t>(std::floor(p[1] * inv)) & 0x1FFFFF;
    const int64_t cz = static_cast<int64_t>(std::floor(p[2] * inv)) & 0x1FFFFF;
    const uint64_t key = (static_cast<uint64_t>(cx) << 42) |
                         (static_cast<uint64_t>(cy) << 21) |
                         static_cast<uint64_t>(cz);
    auto& c = cells[key];
    if (c.count == 0) c.first = i;
    for (int32_t d = 0; d < stride; ++d) c.acc[d] += p[d];
    ++c.count;
  }

  // deterministic output order: by first-occurrence index
  std::vector<const CellSum*> order;
  order.reserve(cells.size());
  for (const auto& kv : cells) order.push_back(&kv.second);
  std::sort(order.begin(), order.end(),
            [](const CellSum* a, const CellSum* b) { return a->first < b->first; });

  int64_t m = 0;
  for (const CellSum* c : order) {
    float* o = out + m * stride;
    for (int32_t d = 0; d < stride; ++d)
      o[d] = static_cast<float>(c->acc[d] / c->count);
    if (out_weight) out_weight[m] = static_cast<float>(c->count);
    ++m;
  }
  return m;
}

// Range filter: keep points with min_r <= |xyz| <= max_r.  In-place
// compaction into out (may alias points); returns kept count.
int64_t pc_range_filter(const float* points, int64_t n, int32_t stride,
                        float min_r, float max_r, float* out) {
  const float lo2 = min_r * min_r, hi2 = max_r * max_r;
  int64_t m = 0;
  for (int64_t i = 0; i < n; ++i) {
    const float* p = points + i * stride;
    const float r2 = p[0] * p[0] + p[1] * p[1] + p[2] * p[2];
    if (r2 >= lo2 && r2 <= hi2) {
      std::memmove(out + m * stride, p, sizeof(float) * stride);
      ++m;
    }
  }
  return m;
}

}  // extern "C"
