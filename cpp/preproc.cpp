// Native host-side point-cloud preprocessing for the data loaders.
//
// The lineage ships its hot loops as native code (CUDA + C++ bindings,
// SURVEY.md §2.1); on the TPU rebuild the device side is Pallas/XLA, and
// THIS is the native tier for the host side of the pipeline: exact-semantics
// furthest point sampling (the KITTI crop→budget step — a pure-numpy loop
// takes ~30s per 120k-pt scene) and oriented-box membership / vote-target
// computation used by every detection loader.
//
// Exposed as a plain C ABI consumed via ctypes (tpu3dsad/utils/native.py).
// Semantics mirror tpu3dsad/ops/oracle.py exactly (seed 0, ties → lowest
// index) and are pinned by tests against the numpy oracles. Built with
// -ffp-contract=off (utils/native.py): FMA contraction would round d²
// differently than numpy's unfused fp32 ops and flip argmax ties,
// breaking oracle parity and cross-machine pack reproducibility.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

// Furthest point sampling. xyz: [n,3] row-major. out_idx: [m].
// mask: [n] (0 = padded/invalid) or nullptr for all-valid.
// The per-pick distance update/argmax parallelizes over point chunks with
// per-thread maxima merged by (value desc, index asc) — identical result to
// the serial scan (ties → lowest index).
void fps(const float* xyz, const uint8_t* mask, int64_t n, int64_t m,
         int64_t* out_idx) {
  if (m <= 0) return;  // zero-length output: nothing to write
  if (n <= 0) {        // no input points: defined output (all index 0)
    std::memset(out_idx, 0, sizeof(int64_t) * m);
    return;
  }
  std::vector<float> dist(n);
  const float inf = std::numeric_limits<float>::infinity();
  for (int64_t i = 0; i < n; ++i) {
    dist[i] = (mask == nullptr || mask[i]) ? inf : -inf;
  }
  int64_t last = 0;
  out_idx[0] = 0;
  for (int64_t s = 1; s < m; ++s) {
    const float lx = xyz[last * 3], ly = xyz[last * 3 + 1],
                lz = xyz[last * 3 + 2];
    float best = -inf;
    int64_t best_i = 0;
#pragma omp parallel
    {
      float tbest = -inf;
      int64_t tbest_i = 0;
#pragma omp for nowait
      for (int64_t i = 0; i < n; ++i) {
        const float dx = xyz[i * 3] - lx;
        const float dy = xyz[i * 3 + 1] - ly;
        const float dz = xyz[i * 3 + 2] - lz;
        float d2 = dx * dx + dy * dy + dz * dz;
        if (mask != nullptr && !mask[i]) d2 = -inf;
        if (d2 < dist[i]) dist[i] = d2;
        if (dist[i] > tbest) {  // strict '>': lowest index wins ties
          tbest = dist[i];
          tbest_i = i;
        }
      }
#pragma omp critical
      {
        if (tbest > best || (tbest == best && tbest_i < best_i)) {
          best = tbest;
          best_i = tbest_i;
        }
      }
    }
    last = best_i;
    out_idx[s] = best_i;
  }
}

// Vote targets for oriented (Z-up) boxes.
// points [n,3]; boxes [g,8]: cx cy cz dx dy dz heading cls.
// votes [n,3] out = center - point for the LAST containing box in array
// order (the python loaders iterate boxes in order and later boxes
// overwrite earlier ones); vote_mask [n] out.
void vote_targets(const float* points, int64_t n, const float* boxes,
                  int64_t g, float* votes, uint8_t* vote_mask) {
  std::memset(votes, 0, sizeof(float) * n * 3);
  std::memset(vote_mask, 0, sizeof(uint8_t) * n);
  for (int64_t b = 0; b < g; ++b) {
    const float cx = boxes[b * 8], cy = boxes[b * 8 + 1], cz = boxes[b * 8 + 2];
    const float hx = boxes[b * 8 + 3] * 0.5f, hy = boxes[b * 8 + 4] * 0.5f,
                hz = boxes[b * 8 + 5] * 0.5f;
    const float heading = boxes[b * 8 + 6];
    const float c = std::cos(heading), s = std::sin(heading);
    for (int64_t i = 0; i < n; ++i) {
      const float px = points[i * 3] - cx;
      const float py = points[i * 3 + 1] - cy;
      const float pz = points[i * 3 + 2] - cz;
      // world→box: R(-heading) = [c s; -s c]
      const float lx = c * px + s * py;
      const float ly = -s * px + c * py;
      const float eps = 1e-6f;
      if (std::fabs(lx) <= hx + eps && std::fabs(ly) <= hy + eps &&
          std::fabs(pz) <= hz + eps) {
        votes[i * 3] = cx - points[i * 3];
        votes[i * 3 + 1] = cy - points[i * 3 + 1];
        votes[i * 3 + 2] = cz - points[i * 3 + 2];
        vote_mask[i] = 1;
      }
    }
  }
}

// Range crop: writes indices of points inside [lo, hi]^3; returns count.
int64_t range_crop(const float* points, int64_t n, const float* lo,
                   const float* hi, int64_t* out_idx) {
  int64_t cnt = 0;
  for (int64_t i = 0; i < n; ++i) {
    const float x = points[i * 3], y = points[i * 3 + 1], z = points[i * 3 + 2];
    if (x >= lo[0] && x <= hi[0] && y >= lo[1] && y <= hi[1] && z >= lo[2] &&
        z <= hi[2]) {
      out_idx[cnt++] = i;
    }
  }
  return cnt;
}

}  // extern "C"
