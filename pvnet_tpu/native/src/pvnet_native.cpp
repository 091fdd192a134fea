// Native host-side kernels for pvnet_tpu, loaded via ctypes.
//
// C++ counterparts of the reference's CFFI extension suite
// (ref lib/utils/extend_utils/src/): farthest point sampling
// (farthest_point_sampling.cpp:77-160 semantics incl. the bbox-center
// seeded variant), brute-force nearest neighbor (nearest_neighborhood.cu
// CPU equivalent), and binary triangle rasterization
// (mesh_rasterization.cpp:4-71 semantics via barycentric coverage).
//
// Build: make -C pvnet_tpu/native  ->  libpvnet_native.so

#include <algorithm>
#include <cfloat>
#include <cmath>
#include <cstdint>
#include <vector>

extern "C" {

// Farthest point sampling over pts [pn, 3]; writes sn indices.
// init_center != 0 seeds min-dist from the bbox center and picks the
// farthest point first (the center itself is never emitted).
void fps_sample(const float* pts, int pn, int sn, int init_center,
                int* out_idxs) {
  std::vector<float> min_dist(pn, FLT_MAX);
  std::vector<uint8_t> mask(pn, 0);

  auto update_min_dist = [&](int idx) {
    const float x = pts[idx * 3], y = pts[idx * 3 + 1], z = pts[idx * 3 + 2];
    for (int i = 0; i < pn; ++i) {
      if (mask[i]) continue;
      const float dx = pts[i * 3] - x;
      const float dy = pts[i * 3 + 1] - y;
      const float dz = pts[i * 3 + 2] - z;
      const float d = dx * dx + dy * dy + dz * dz;
      if (d < min_dist[i]) min_dist[i] = d;
    }
  };
  auto find_max = [&]() {
    int max_idx = 0;
    float max_d = -1.f;
    for (int i = 0; i < pn; ++i) {
      if (mask[i]) continue;
      if (min_dist[i] > max_d) {
        max_d = min_dist[i];
        max_idx = i;
      }
    }
    return max_idx;
  };

  int cur;
  if (init_center) {
    float mn[3] = {FLT_MAX, FLT_MAX, FLT_MAX};
    float mx[3] = {-FLT_MAX, -FLT_MAX, -FLT_MAX};
    for (int i = 0; i < pn; ++i)
      for (int d = 0; d < 3; ++d) {
        mn[d] = std::min(mn[d], pts[i * 3 + d]);
        mx[d] = std::max(mx[d], pts[i * 3 + d]);
      }
    const float cx = (mn[0] + mx[0]) / 2.f;
    const float cy = (mn[1] + mx[1]) / 2.f;
    const float cz = (mn[2] + mx[2]) / 2.f;
    for (int i = 0; i < pn; ++i) {
      const float dx = pts[i * 3] - cx, dy = pts[i * 3 + 1] - cy,
                  dz = pts[i * 3 + 2] - cz;
      min_dist[i] = dx * dx + dy * dy + dz * dz;
    }
    cur = find_max();
  } else {
    cur = 0;
    update_min_dist(cur);
  }

  for (int i = 0; i < sn; ++i) {
    mask[cur] = 1;
    out_idxs[i] = cur;
    if (i < sn - 1) {
      update_min_dist(cur);
      cur = find_max();
    }
  }
}

// For each of qn query points find the index of the nearest of rn
// reference points; dim in {2, 3}.
void nearest_neighbor_idx(const float* ref_pts, int rn, const float* que_pts,
                          int qn, int dim, int* out_idxs) {
  for (int q = 0; q < qn; ++q) {
    float best = FLT_MAX;
    int best_i = 0;
    const float* Q = que_pts + q * dim;
    for (int r = 0; r < rn; ++r) {
      const float* R = ref_pts + r * dim;
      float d = 0.f;
      for (int k = 0; k < dim; ++k) {
        const float diff = R[k] - Q[k];
        d += diff * diff;
      }
      if (d < best) {
        best = d;
        best_i = r;
      }
    }
    out_idxs[q] = best_i;
  }
}

// Binary coverage mask of tn 2D triangles [tn, 3, 2] into mask [h, w].
void rasterize_binary(const float* tris, int tn, int h, int w,
                      uint8_t* mask) {
  for (int t = 0; t < tn; ++t) {
    const float* T = tris + t * 6;
    const float x0 = T[0], y0 = T[1], x1 = T[2], y1 = T[3], x2 = T[4],
                y2 = T[5];
    int xmin = std::max(0, (int)std::floor(std::min({x0, x1, x2})));
    int xmax = std::min(w - 1, (int)std::ceil(std::max({x0, x1, x2})));
    int ymin = std::max(0, (int)std::floor(std::min({y0, y1, y2})));
    int ymax = std::min(h - 1, (int)std::ceil(std::max({y0, y1, y2})));
    const double d = (double)(y1 - y2) * (x0 - x2) +
                     (double)(x2 - x1) * (y0 - y2);
    if (std::fabs(d) < 1e-12) continue;
    for (int y = ymin; y <= ymax; ++y) {
      for (int x = xmin; x <= xmax; ++x) {
        const double l0 =
            ((double)(y1 - y2) * (x - x2) + (double)(x2 - x1) * (y - y2)) / d;
        const double l1 =
            ((double)(y2 - y0) * (x - x2) + (double)(x0 - x2) * (y - y2)) / d;
        const double l2 = 1.0 - l0 - l1;
        if (l0 >= 0 && l1 >= 0 && l2 >= 0) mask[y * w + x] = 1;
      }
    }
  }
}

}  // extern "C"
