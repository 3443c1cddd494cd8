// Native host-side runtime components.
//
// The reference's entire runtime is C++ (SURVEY §2: ~30.5k LoC of ROS/catkin
// C++). In this framework the device compute path is JAX/XLA/Pallas; the
// host-side pieces that benefit from native code live here:
//
//   * ts_raycast       — batched exact ray/segment intersection: the data
//                        generator for tests and benches (the simulator's
//                        inner loop; numpy version in data/simulator.py).
//   * ts_bresenham     — per-beam integer Bresenham with the reference's
//                        once-per-scan cell semantics (gridlinetraversal.h:
//                        27-207 and OccGridMapBase.h:270-330): the golden
//                        CPU reference used to validate the device scatter
//                        rasterizer's sampled-ray approximation.
//   * ts_decimate      — beam-wise range decimation/min-filter used by the
//                        host data pipeline when downsampling scans.
//
// Built as a plain C ABI shared library; Python binds via ctypes
// (tpu_slam/native/__init__.py). No pybind11 (not in this image).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <algorithm>
#include <limits>

extern "C" {

// Batched ray ↔ segment-set intersection.
// segments: (n_seg, 4) [x1,y1,x2,y2]; origins: (n_rays, 2); angles: (n_rays).
// out: (n_rays) ranges, +inf when nothing hit within range_max.
void ts_raycast(const double* segments, int64_t n_seg,
                const double* origins, const double* angles, int64_t n_rays,
                double range_max, double* out) {
  for (int64_t r = 0; r < n_rays; ++r) {
    const double ox = origins[2 * r], oy = origins[2 * r + 1];
    const double dx = std::cos(angles[r]), dy = std::sin(angles[r]);
    double best = std::numeric_limits<double>::infinity();
    for (int64_t s = 0; s < n_seg; ++s) {
      const double px = segments[4 * s], py = segments[4 * s + 1];
      const double qx = segments[4 * s + 2], qy = segments[4 * s + 3];
      const double ex = qx - px, ey = qy - py;
      const double denom = dx * ey - dy * ex;
      if (std::fabs(denom) < 1e-12) continue;
      const double wx = px - ox, wy = py - oy;
      const double t = (wx * ey - wy * ex) / denom;
      const double u = (wx * dy - wy * dx) / denom;
      if (t > 1e-9 && u >= 0.0 && u <= 1.0 && t < best) best = t;
    }
    out[r] = (best <= range_max) ? best
                                 : std::numeric_limits<double>::infinity();
  }
}

// Reference-exact scan rasterization: integer Bresenham free cells per beam
// plus endpoint occupancy, with once-per-scan dedup and occupied-beats-free
// (hector updateLineBresenhami/bresenham2D + update-index stamps,
// OccGridMapBase.h:220-330). Outputs two uint8 masks of size (h*w).
void ts_bresenham_masks(const double* origin_cell,       // (2,) fractional
                        const double* end_cells,         // (n, 2) fractional
                        const uint8_t* valid, int64_t n,
                        int64_t w, int64_t h,
                        uint8_t* free_mask, uint8_t* occ_mask) {
  std::memset(free_mask, 0, (size_t)(w * h));
  std::memset(occ_mask, 0, (size_t)(w * h));
  const int64_t x0 = (int64_t)std::floor(origin_cell[0]);
  const int64_t y0 = (int64_t)std::floor(origin_cell[1]);
  for (int64_t i = 0; i < n; ++i) {
    if (!valid[i]) continue;
    const int64_t x1 = (int64_t)std::floor(end_cells[2 * i]);
    const int64_t y1 = (int64_t)std::floor(end_cells[2 * i + 1]);
    // bresenham2D free cells, stopping before the end cell
    int64_t dx = std::llabs(x1 - x0), dy = std::llabs(y1 - y0);
    const int64_t sx = x0 < x1 ? 1 : -1, sy = y0 < y1 ? 1 : -1;
    int64_t x = x0, y = y0;
    int64_t err = dx - dy;
    while (!(x == x1 && y == y1)) {
      if (x >= 0 && x < w && y >= 0 && y < h) free_mask[y * w + x] = 1;
      const int64_t e2 = 2 * err;
      if (e2 > -dy) { err -= dy; x += sx; }
      if (e2 < dx)  { err += dx; y += sy; }
    }
    if (x1 >= 0 && x1 < w && y1 >= 0 && y1 < h) occ_mask[y1 * w + x1] = 1;
  }
  // occupied beats free (unset-free correction, OccGridMapBase.h:315-330)
  for (int64_t c = 0; c < w * h; ++c)
    if (occ_mask[c]) free_mask[c] = 0;
}

// Min-filter decimation of a range scan: out[j] = min over the window
// (keeps obstacles when downsampling beams for coarse pyramid levels).
void ts_decimate(const float* ranges, int64_t n, int64_t factor, float* out) {
  const int64_t m = n / factor;
  for (int64_t j = 0; j < m; ++j) {
    float best = std::numeric_limits<float>::infinity();
    for (int64_t k = 0; k < factor; ++k) {
      const float v = ranges[j * factor + k];
      if (v < best) best = v;
    }
    out[j] = best;
  }
}

}  // extern "C"
