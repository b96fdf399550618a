// wsis_native: host-side native kernels for tpu3dwsis.
//
// TPU-native replacements for the reference's C++ prep/runtime components:
//  * felzenszwalb_mesh  — ScanNet superpoint generation (reference uses the
//    external Karbo123/segmentator C++ tool, Felzenszwalb-Huttenlocher graph
//    segmentation over mesh normal-difference edge weights;
//    data/ScanNetV2/ScanNetV2.md:26-30).
//  * compute_geof       — per-point linearity/planarity/scattering/
//    verticality from k-NN covariance eigendecomposition (reference
//    data/S3DIS/partition/ply_c/ply_c.cpp:396-476, OpenMP).
//  * cut_pursuit_l0     — L0 generalized minimal partition via iterative
//    graph cuts (reference data/S3DIS/partition/cut-pursuit/, Boost
//    boykov_kolmogorov_max_flow; self-contained BK maxflow here).
//  * knn_graph          — grid-hash k-nearest-neighbour search used by both.
//
// Exposed as a C ABI consumed via ctypes (no pybind11 in this image).
#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <numeric>
#include <queue>
#include <unordered_map>
#include <vector>

namespace {

// ---------------------------------------------------------------- union-find
struct UnionFind {
  std::vector<int> parent, rank_, size;
  explicit UnionFind(int n) : parent(n), rank_(n, 0), size(n, 1) {
    std::iota(parent.begin(), parent.end(), 0);
  }
  int find(int x) {
    while (parent[x] != x) {
      parent[x] = parent[parent[x]];
      x = parent[x];
    }
    return x;
  }
  int join(int a, int b) {
    a = find(a);
    b = find(b);
    if (a == b) return a;
    if (rank_[a] < rank_[b]) std::swap(a, b);
    parent[b] = a;
    size[a] += size[b];
    if (rank_[a] == rank_[b]) rank_[a]++;
    return a;
  }
};

struct V3 {
  float x = 0, y = 0, z = 0;
  V3() = default;
  V3(float a, float b, float c) : x(a), y(b), z(c) {}
  V3 operator-(const V3& o) const { return {x - o.x, y - o.y, z - o.z}; }
  V3 operator+(const V3& o) const { return {x + o.x, y + o.y, z + o.z}; }
  V3 cross(const V3& o) const {
    return {y * o.z - z * o.y, z * o.x - x * o.z, x * o.y - y * o.x};
  }
  float dot(const V3& o) const { return x * o.x + y * o.y + z * o.z; }
  float norm() const { return std::sqrt(dot(*this)); }
  void normalize() {
    float n = norm();
    if (n > 1e-12f) {
      x /= n;
      y /= n;
      z /= n;
    }
  }
};

// ------------------------------------------------------- grid-hash knn search
struct GridHash {
  float cell;
  std::unordered_map<int64_t, std::vector<int>> cells;
  const float* xyz;
  int n;

  GridHash(const float* xyz_, int n_, float cell_) : cell(cell_), xyz(xyz_), n(n_) {
    cells.reserve(n * 2);
    for (int i = 0; i < n; i++) cells[key_of(i)].push_back(i);
  }
  int64_t key(int64_t cx, int64_t cy, int64_t cz) const {
    return (cx * 73856093LL) ^ (cy * 19349663LL) ^ (cz * 83492791LL);
  }
  int64_t key_of(int i) const {
    return key((int64_t)std::floor(xyz[3 * i] / cell),
               (int64_t)std::floor(xyz[3 * i + 1] / cell),
               (int64_t)std::floor(xyz[3 * i + 2] / cell));
  }
  // k nearest neighbours of point q (excluding itself), expanding rings.
  void knn(int q, int k, std::vector<int>& out) const {
    out.clear();
    const float qx = xyz[3 * q], qy = xyz[3 * q + 1], qz = xyz[3 * q + 2];
    int64_t cx = (int64_t)std::floor(qx / cell);
    int64_t cy = (int64_t)std::floor(qy / cell);
    int64_t cz = (int64_t)std::floor(qz / cell);
    using Cand = std::pair<float, int>;
    std::vector<Cand> cands;
    for (int ring = 1; ring <= 8; ring++) {
      cands.clear();
      for (int64_t dx = -ring; dx <= ring; dx++)
        for (int64_t dy = -ring; dy <= ring; dy++)
          for (int64_t dz = -ring; dz <= ring; dz++) {
            auto it = cells.find(key(cx + dx, cy + dy, cz + dz));
            if (it == cells.end()) continue;
            for (int j : it->second) {
              if (j == q) continue;
              float ddx = xyz[3 * j] - qx, ddy = xyz[3 * j + 1] - qy,
                    ddz = xyz[3 * j + 2] - qz;
              cands.push_back({ddx * ddx + ddy * ddy + ddz * ddz, j});
            }
          }
      if ((int)cands.size() >= k || ring == 8) {
        int kk = std::min<int>(k, cands.size());
        std::partial_sort(cands.begin(), cands.begin() + kk, cands.end());
        for (int i = 0; i < kk; i++) out.push_back(cands[i].second);
        return;
      }
    }
  }
};

// 3x3 symmetric eigenvalues (descending) via the trigonometric method.
void eig3_sym(const double m[6], double ev[3]) {
  // m = [xx, xy, xz, yy, yz, zz]
  double p1 = m[1] * m[1] + m[2] * m[2] + m[4] * m[4];
  double q = (m[0] + m[3] + m[5]) / 3.0;
  double b00 = m[0] - q, b11 = m[3] - q, b22 = m[5] - q;
  double p2 = b00 * b00 + b11 * b11 + b22 * b22 + 2.0 * p1;
  double p = std::sqrt(std::max(p2 / 6.0, 0.0));
  if (p < 1e-16) {
    ev[0] = ev[1] = ev[2] = q;
    return;
  }
  // det(B)/2 where B = (M - qI)/p
  double c00 = b00 / p, c01 = m[1] / p, c02 = m[2] / p;
  double c11 = b11 / p, c12 = m[4] / p, c22 = b22 / p;
  double detB =
      c00 * (c11 * c22 - c12 * c12) - c01 * (c01 * c22 - c12 * c02) +
      c02 * (c01 * c12 - c11 * c02);
  double r = detB / 2.0;
  r = std::max(-1.0, std::min(1.0, r));
  double phi = std::acos(r) / 3.0;
  ev[0] = q + 2.0 * p * std::cos(phi);
  ev[2] = q + 2.0 * p * std::cos(phi + 2.0 * M_PI / 3.0);
  ev[1] = 3.0 * q - ev[0] - ev[2];
}

// Eigenvector of the symmetric matrix m for eigenvalue lam: the null
// direction of (M - lam*I), taken as the largest-magnitude cross product
// of two of its rows.  Returns false when every cross product vanishes
// (repeated eigenvalue — caller picks a basis).
bool eig3_sym_vec(const double m[6], double lam, double v[3]) {
  const double r[3][3] = {{m[0] - lam, m[1], m[2]},
                          {m[1], m[3] - lam, m[4]},
                          {m[2], m[4], m[5] - lam}};
  // select by ABSOLUTE cross magnitude (a tiny row crossed with a big one
  // has near-unit relative magnitude but is pure rounding noise — ratio-
  // first selection picks it and mislabels clean spectra as degenerate),
  // then validate the winner RELATIVELY: near-parallel large rows
  // (repeated eigenvalue to float precision) give a cross whose absolute
  // norm can clear any fixed epsilon while its direction is noise.
  double best = 0.0, best_denom = 0.0;
  for (int a = 0; a < 3; a++) {
    int b = (a + 1) % 3;
    double cx = r[a][1] * r[b][2] - r[a][2] * r[b][1];
    double cy = r[a][2] * r[b][0] - r[a][0] * r[b][2];
    double cz = r[a][0] * r[b][1] - r[a][1] * r[b][0];
    double n2 = cx * cx + cy * cy + cz * cz;
    if (n2 > best) {
      best = n2;
      best_denom = (r[a][0] * r[a][0] + r[a][1] * r[a][1] + r[a][2] * r[a][2]) *
                   (r[b][0] * r[b][0] + r[b][1] * r[b][1] + r[b][2] * r[b][2]);
      v[0] = cx;
      v[1] = cy;
      v[2] = cz;
    }
  }
  if (best < 1e-24 || best < 1e-18 * best_denom) return false;
  double inv = 1.0 / std::sqrt(best);
  v[0] *= inv;
  v[1] *= inv;
  v[2] *= inv;
  return true;
}

// unit vector orthogonal to unit u: cross with the least-aligned axis
void ortho_unit(const double u[3], double out[3]) {
  int ax = 0;
  double a0 = std::fabs(u[0]), a1 = std::fabs(u[1]), a2 = std::fabs(u[2]);
  if (a1 < a0 || a2 < a0) ax = (a1 <= a2) ? 1 : 2;
  double e[3] = {0, 0, 0};
  e[ax] = 1;
  out[0] = u[1] * e[2] - u[2] * e[1];
  out[1] = u[2] * e[0] - u[0] * e[2];
  out[2] = u[0] * e[1] - u[1] * e[0];
  double n = std::sqrt(out[0] * out[0] + out[1] * out[1] + out[2] * out[2]);
  for (int d = 0; d < 3; d++) out[d] /= n;
}

}  // namespace

extern "C" {

// ------------------------------------------------------------ edge features
// 13-d superpoint-graph edge features (reference compute_edges_feature,
// prepare_data_inst_ScanNetV2.py:340-433): paired-sample delta mean/std,
// centroid delta, and eigen shape-feature ratios. sp_start/sp_count index a
// permutation of points sorted by superpoint id. Sampling uses a per-edge
// xorshift stream seeded deterministically.
void wsis_edge_features(const float* xyz, int n, const int32_t* order,
                        const int32_t* sp_start, const int32_t* sp_count, int n_sp,
                        const float* centroid /*[n_sp,3]*/,
                        const float* shape /*[n_sp,3] length,surface,volume*/,
                        const int32_t* eu, const int32_t* ev, int n_edges,
                        int max_sample, uint64_t seed, float* out /*[n_edges,13]*/) {
#pragma omp parallel for schedule(dynamic, 64)
  for (int e = 0; e < n_edges; e++) {
    int s = eu[e], t = ev[e];
    uint64_t rng = seed ^ (0x9e3779b97f4a7c15ULL * (uint64_t)(e + 1));
    auto next = [&rng]() {
      rng ^= rng << 13;
      rng ^= rng >> 7;
      rng ^= rng << 17;
      return rng;
    };
    int ns = sp_count[s], nt = sp_count[t];
    int k = std::min(std::min(ns, nt), max_sample);
    double mx = 0, my = 0, mz = 0, sx = 0, sy = 0, sz = 0;
    for (int i = 0; i < k; i++) {
      // sample without strict dedup (statistically equivalent at prep scale)
      int pi = order[sp_start[s] + (ns > k ? (int)(next() % ns) : i)];
      int qi = order[sp_start[t] + (nt > k ? (int)(next() % nt) : i)];
      double dx = xyz[3 * pi] - xyz[3 * qi];
      double dy = xyz[3 * pi + 1] - xyz[3 * qi + 1];
      double dz = xyz[3 * pi + 2] - xyz[3 * qi + 2];
      mx += dx;
      my += dy;
      mz += dz;
      sx += dx * dx;
      sy += dy * dy;
      sz += dz * dz;
    }
    double inv = 1.0 / std::max(k, 1);
    mx *= inv;
    my *= inv;
    mz *= inv;
    float stdx = (float)std::sqrt(std::max(sx * inv - mx * mx, 0.0));
    float stdy = (float)std::sqrt(std::max(sy * inv - my * my, 0.0));
    float stdz = (float)std::sqrt(std::max(sz * inv - mz * mz, 0.0));
    out[13 * e + 0] = (float)mx;
    out[13 * e + 1] = (float)my;
    out[13 * e + 2] = (float)mz;
    out[13 * e + 3] = k > 1 ? stdx : 0.0f;
    out[13 * e + 4] = k > 1 ? stdy : 0.0f;
    out[13 * e + 5] = k > 1 ? stdz : 0.0f;
    out[13 * e + 6] = centroid[3 * s] - centroid[3 * t];
    out[13 * e + 7] = centroid[3 * s + 1] - centroid[3 * t + 1];
    out[13 * e + 8] = centroid[3 * s + 2] - centroid[3 * t + 2];
    out[13 * e + 9] = shape[3 * s] / (shape[3 * t] + 1e-6f);
    out[13 * e + 10] = shape[3 * s + 1] / (shape[3 * t + 1] + 1e-6f);
    out[13 * e + 11] = shape[3 * s + 2] / (shape[3 * t + 2] + 1e-6f);
    out[13 * e + 12] = (float)sp_count[s] / ((float)sp_count[t] + 1e-6f);
  }
}

// ---------------------------------------------------------------- knn graph
// For each point, its k nearest neighbours. out_nbr is [n, k] int32 (padded
// with -1). cell: grid cell size (pick ~ average spacing * 2).
void wsis_knn_graph(const float* xyz, int n, int k, float cell, int32_t* out_nbr) {
  GridHash grid(xyz, n, cell);
#pragma omp parallel
  {
    std::vector<int> nbr;
#pragma omp for schedule(dynamic, 256)
    for (int i = 0; i < n; i++) {
      grid.knn(i, k, nbr);
      for (int j = 0; j < k; j++) out_nbr[(size_t)i * k + j] = j < (int)nbr.size() ? nbr[j] : -1;
    }
  }
}

// ----------------------------------------------------- felzenszwalb on mesh
// ScanNet-style superpoint generation: vertex normals from faces, edges from
// faces, weight = 1 - dot(n_i, n_j) (squared when locally convex), then
// Felzenszwalb-Huttenlocher with threshold kthr and min segment size.
// Returns number of segments; out_seg gets contiguous ids [0, S).
int wsis_felzenszwalb_mesh(const float* verts, int n_verts, const int32_t* faces,
                           int n_faces, float kthr, int seg_min_verts,
                           int32_t* out_seg) {
  std::vector<V3> normal(n_verts);
  for (int f = 0; f < n_faces; f++) {
    int a = faces[3 * f], b = faces[3 * f + 1], c = faces[3 * f + 2];
    V3 pa(verts[3 * a], verts[3 * a + 1], verts[3 * a + 2]);
    V3 pb(verts[3 * b], verts[3 * b + 1], verts[3 * b + 2]);
    V3 pc(verts[3 * c], verts[3 * c + 1], verts[3 * c + 2]);
    V3 fn = (pb - pa).cross(pc - pa);
    normal[a] = normal[a] + fn;
    normal[b] = normal[b] + fn;
    normal[c] = normal[c] + fn;
  }
  for (auto& nv : normal) nv.normalize();

  struct Edge {
    float w;
    int a, b;
  };
  std::vector<Edge> edges;
  edges.reserve((size_t)n_faces * 3);
  auto add_edge = [&](int a, int b) {
    V3 pa(verts[3 * a], verts[3 * a + 1], verts[3 * a + 2]);
    V3 pb(verts[3 * b], verts[3 * b + 1], verts[3 * b + 2]);
    float w = 1.0f - normal[a].dot(normal[b]);
    V3 d = pb - pa;
    d.normalize();
    if (normal[a].dot(d) < 0) w *= w;  // convex junction: suppress weight
    edges.push_back({w, a, b});
  };
  for (int f = 0; f < n_faces; f++) {
    add_edge(faces[3 * f], faces[3 * f + 1]);
    add_edge(faces[3 * f + 1], faces[3 * f + 2]);
    add_edge(faces[3 * f + 2], faces[3 * f]);
  }
  std::sort(edges.begin(), edges.end(),
            [](const Edge& x, const Edge& y) { return x.w < y.w; });

  UnionFind uf(n_verts);
  std::vector<float> thresh(n_verts, kthr);
  for (const auto& e : edges) {
    int a = uf.find(e.a), b = uf.find(e.b);
    if (a == b) continue;
    if (e.w <= thresh[a] && e.w <= thresh[b]) {
      int r = uf.join(a, b);
      thresh[r] = e.w + kthr / uf.size[r];
    }
  }
  // merge small segments
  for (const auto& e : edges) {
    int a = uf.find(e.a), b = uf.find(e.b);
    if (a != b && (uf.size[a] < seg_min_verts || uf.size[b] < seg_min_verts))
      uf.join(a, b);
  }
  // relabel contiguous
  std::unordered_map<int, int> remap;
  int next = 0;
  for (int i = 0; i < n_verts; i++) {
    int r = uf.find(i);
    auto it = remap.find(r);
    if (it == remap.end()) it = remap.emplace(r, next++).first;
    out_seg[i] = it->second;
  }
  return next;
}

// ------------------------------------------------------------ geof features
// Per-point [linearity, planarity, scattering, verticality] from the k-NN
// covariance eigenvalues (ply_c.cpp:396-476 semantics; k=45 in the S3DIS
// pipeline). cell: grid cell for the knn search.
void wsis_compute_geof(const float* xyz, int n, int k, float cell, float* out) {
  GridHash grid(xyz, n, cell);
#pragma omp parallel
  {
    std::vector<int> nbr;
#pragma omp for schedule(dynamic, 256)
    for (int i = 0; i < n; i++) {
      grid.knn(i, k, nbr);
      // accumulate covariance over the neighbourhood incl. self
      double mx = xyz[3 * i], my = xyz[3 * i + 1], mz = xyz[3 * i + 2];
      int m = 1;
      for (int j : nbr) {
        mx += xyz[3 * j];
        my += xyz[3 * j + 1];
        mz += xyz[3 * j + 2];
        m++;
      }
      mx /= m;
      my /= m;
      mz /= m;
      double c[6] = {0, 0, 0, 0, 0, 0};
      auto acc = [&](int j) {
        double dx = xyz[3 * j] - mx, dy = xyz[3 * j + 1] - my, dz = xyz[3 * j + 2] - mz;
        c[0] += dx * dx;
        c[1] += dx * dy;
        c[2] += dx * dz;
        c[3] += dy * dy;
        c[4] += dy * dz;
        c[5] += dz * dz;
      };
      acc(i);
      for (int j : nbr) acc(j);
      for (double& v : c) v /= m;
      double ev[3];
      eig3_sym(c, ev);
      double raw[3] = {std::max(ev[0], 0.0), std::max(ev[1], 0.0),
                       std::max(ev[2], 0.0)};
      double l1 = std::sqrt(raw[0]), l2 = std::sqrt(raw[1]), l3 = std::sqrt(raw[2]);
      float linearity = (float)((l1 - l2) / (l1 + 1e-12));
      float planarity = (float)((l2 - l3) / (l1 + 1e-12));
      float scattering = (float)(l3 / (l1 + 1e-12));
      // verticality, SPG eigen formulation (ply_c.cpp:396-476): the unary
      // vector u_d = sum_i lambda_i * |v_i[d]| over the RAW eigenvalues and
      // the orthonormal eigenvectors; verticality = u_z / ||u||.
      double v1[3], v3[3], v2[3];
      bool ok1 = eig3_sym_vec(c, ev[0], v1);
      bool ok3 = eig3_sym_vec(c, ev[2], v3);
      if (!ok1 && !ok3) {
        // fully isotropic (l1=l2=l3): any orthonormal basis is an
        // eigenbasis; use the coordinate axes (what eigh returns for a
        // scaled identity)
        v1[0] = 1; v1[1] = 0; v1[2] = 0;
        v3[0] = 0; v3[1] = 0; v3[2] = 1;
      } else if (!ok3) {
        // l2=l3 repeated (e.g. an exact line: rank-1 covariance) — the
        // VALID v1 must be kept (discarding it inverted verticality on
        // exactly collinear vertical points); any unit vector orthogonal
        // to v1 spans the repeated eigenspace
        ortho_unit(v1, v3);
      } else if (!ok1) {
        // l1=l2 repeated (e.g. an exact isotropic plane): keep v3, any
        // orthogonal unit vector is an eigenvector of the repeated pair
        ortho_unit(v3, v1);
      }
      // middle vector by orthogonality (exact for distinct eigenvalues)
      v2[0] = v3[1] * v1[2] - v3[2] * v1[1];
      v2[1] = v3[2] * v1[0] - v3[0] * v1[2];
      v2[2] = v3[0] * v1[1] - v3[1] * v1[0];
      double u[3];
      for (int d = 0; d < 3; d++)
        u[d] = raw[0] * std::fabs(v1[d]) + raw[1] * std::fabs(v2[d]) +
               raw[2] * std::fabs(v3[d]);
      double un = std::sqrt(u[0] * u[0] + u[1] * u[1] + u[2] * u[2]);
      float verticality = (float)(un > 1e-24 ? u[2] / un : 0.0);
      out[4 * i] = linearity;
      out[4 * i + 1] = planarity;
      out[4 * i + 2] = scattering;
      out[4 * i + 3] = verticality;
    }
  }
}

// --------------------------------------------------------------- BK maxflow
// Minimal Boykov-Kolmogorov-style maxflow via BFS augmenting paths
// (Edmonds-Karp with capacity scaling is enough at superpoint-graph sizes).
struct MaxFlow {
  struct Arc {
    int to;
    double cap;
    int rev;
  };
  std::vector<std::vector<Arc>> g;
  explicit MaxFlow(int n) : g(n) {}
  void add(int u, int v, double cap, double rcap = 0.0) {
    g[u].push_back({v, cap, (int)g[v].size()});
    g[v].push_back({u, rcap, (int)g[u].size() - 1});
  }
  double run(int s, int t, std::vector<char>& side) {
    double flow = 0;
    const int n = g.size();
    std::vector<int> prev_v(n), prev_e(n);
    for (;;) {
      std::vector<char> vis(n, 0);
      std::queue<int> q;
      q.push(s);
      vis[s] = 1;
      while (!q.empty() && !vis[t]) {
        int u = q.front();
        q.pop();
        for (int ei = 0; ei < (int)g[u].size(); ei++) {
          const Arc& a = g[u][ei];
          if (!vis[a.to] && a.cap > 1e-12) {
            vis[a.to] = 1;
            prev_v[a.to] = u;
            prev_e[a.to] = ei;
            q.push(a.to);
          }
        }
      }
      if (!vis[t]) {
        side.assign(n, 0);
        for (int i = 0; i < n; i++) side[i] = vis[i];
        return flow;
      }
      double aug = std::numeric_limits<double>::max();
      for (int v = t; v != s; v = prev_v[v]) aug = std::min(aug, g[prev_v[v]][prev_e[v]].cap);
      for (int v = t; v != s; v = prev_v[v]) {
        Arc& a = g[prev_v[v]][prev_e[v]];
        a.cap -= aug;
        g[v][a.rev].cap += aug;
      }
      flow += aug;
    }
  }
};

// ----------------------------------------------------------- L0 cut pursuit
// Generalized minimal partition: minimize sum_i ||x_i - f(comp(i))||^2 +
// reg * (number of cut edges), by alternating (a) optimal per-component
// value = mean, (b) binary graph-cut split of each component along the
// direction of largest variance (reference CutPursuit.h:83-95 split()).
// Returns number of components; out_comp[i] in [0, C).
int wsis_cut_pursuit_l0(const float* feat, int n, int dim, const int32_t* eu,
                        const int32_t* ev, const float* ew, int n_edges,
                        float reg, int max_iter, int32_t* out_comp,
                        float* out_energy /*nullable: final E written here*/) {
  std::vector<int> comp(n, 0);
  int n_comp = 1;
  std::vector<std::vector<int>> members;

  auto rebuild_members = [&]() {
    members.assign(n_comp, {});
    for (int i = 0; i < n; i++) members[comp[i]].push_back(i);
  };
  rebuild_members();

  std::vector<double> mean;
  auto comp_means = [&]() {
    mean.assign((size_t)n_comp * dim, 0.0);
    for (int c = 0; c < n_comp; c++) {
      for (int i : members[c])
        for (int d = 0; d < dim; d++) mean[(size_t)c * dim + d] += feat[(size_t)i * dim + d];
      for (int d = 0; d < dim; d++) mean[(size_t)c * dim + d] /= std::max<size_t>(members[c].size(), 1);
    }
  };

  // L0 cut-pursuit energy (CutPursuit.h:83-95 semantics, L2 fidelity
  // API.h:117,133-134): E = sum_i ||f_i - mean_comp(i)||^2
  //                       + reg * sum_{cut edges} w_e.
  // The outer loop is a strict descent on E: a round of splits is only
  // KEPT if it lowers the energy; otherwise the partition reverts and the
  // loop has converged.  (members/mean must match comp when called.)
  auto energy = [&]() {
    double fid = 0.0;
    for (int c = 0; c < n_comp; c++)
      for (int i : members[c])
        for (int d = 0; d < dim; d++) {
          double dd = feat[(size_t)i * dim + d] - mean[(size_t)c * dim + d];
          fid += dd * dd;
        }
    double cut = 0.0;
    for (int e = 0; e < n_edges; e++)
      if (comp[eu[e]] != comp[ev[e]]) cut += ew[e];
    return fid + (double)reg * cut;
  };

  comp_means();
  double prev_energy = energy();

  for (int iter = 0; iter < max_iter; iter++) {
    comp_means();
    bool any_split = false;
    std::vector<int> undo_comp = comp;
    int undo_n_comp = n_comp;

    // --- split step: binary labeling per component via maxflow ---
    // seeds: two farthest-from-mean points projected on principal direction
    std::vector<int> new_comp = comp;
    int next_id = n_comp;
    for (int c = 0; c < n_comp; c++) {
      const auto& mem = members[c];
      if (mem.size() < 2) continue;
      // principal direction approximated by the point farthest from mean
      size_t base = (size_t)c * dim;
      int far1 = -1;
      double best = -1;
      for (int i : mem) {
        double d2 = 0;
        for (int d = 0; d < dim; d++) {
          double dd = feat[(size_t)i * dim + d] - mean[base + d];
          d2 += dd * dd;
        }
        if (d2 > best) {
          best = d2;
          far1 = i;
        }
      }
      if (best < 1e-12) continue;  // constant component
      // second seed: farthest from far1
      int far2 = -1;
      best = -1;
      for (int i : mem) {
        double d2 = 0;
        for (int d = 0; d < dim; d++) {
          double dd = feat[(size_t)i * dim + d] - feat[(size_t)far1 * dim + d];
          d2 += dd * dd;
        }
        if (d2 > best) {
          best = d2;
          far2 = i;
        }
      }
      // local index map
      std::unordered_map<int, int> local;
      local.reserve(mem.size() * 2);
      for (int li = 0; li < (int)mem.size(); li++) local[mem[li]] = li;
      MaxFlow mf(mem.size() + 2);
      int S = mem.size(), T = mem.size() + 1;
      // data terms: cost of assigning to seed1 vs seed2
      for (int li = 0; li < (int)mem.size(); li++) {
        int i = mem[li];
        double d1 = 0, d2 = 0;
        for (int d = 0; d < dim; d++) {
          double a = feat[(size_t)i * dim + d] - feat[(size_t)far1 * dim + d];
          double b = feat[(size_t)i * dim + d] - feat[(size_t)far2 * dim + d];
          d1 += a * a;
          d2 += b * b;
        }
        mf.add(S, li, d2, 0.0);
        mf.add(li, T, d1, 0.0);
      }
      // smoothness: reg * w on intra-component edges
      for (int e = 0; e < n_edges; e++) {
        int a = eu[e], b = ev[e];
        if (comp[a] != c || comp[b] != c) continue;
        auto ia = local[a], ib = local[b];
        mf.add(ia, ib, reg * ew[e], reg * ew[e]);
      }
      std::vector<char> side;
      mf.run(S, T, side);
      int cnt1 = 0;
      for (int li = 0; li < (int)mem.size(); li++) cnt1 += side[li] ? 1 : 0;
      if (cnt1 == 0 || cnt1 == (int)mem.size()) continue;
      for (int li = 0; li < (int)mem.size(); li++)
        if (!side[li]) new_comp[mem[li]] = next_id;
      next_id++;
      any_split = true;
    }
    if (!any_split) break;
    comp = new_comp;
    n_comp = next_id;

    // --- merge step: relabel by connected components of same-label regions
    // (each split labeling may disconnect) ---
    {
      std::vector<std::vector<int>> adj(n);
      for (int e = 0; e < n_edges; e++) {
        if (comp[eu[e]] == comp[ev[e]]) {
          adj[eu[e]].push_back(ev[e]);
          adj[ev[e]].push_back(eu[e]);
        }
      }
      std::vector<int> cc(n, -1);
      int ncc = 0;
      for (int i = 0; i < n; i++) {
        if (cc[i] != -1) continue;
        std::queue<int> q;
        q.push(i);
        cc[i] = ncc;
        while (!q.empty()) {
          int u = q.front();
          q.pop();
          for (int v : adj[u])
            if (cc[v] == -1) {
              cc[v] = ncc;
              q.push(v);
            }
        }
        ncc++;
      }
      comp = cc;
      n_comp = ncc;
    }
    rebuild_members();

    // energy-descent acceptance (the reference's convergence criterion):
    // revert and stop when the round did not lower E
    comp_means();
    double e_new = energy();
    if (e_new >= prev_energy - 1e-9 * std::fabs(prev_energy)) {
      comp = undo_comp;
      n_comp = undo_n_comp;
      rebuild_members();
      break;
    }
    prev_energy = e_new;
  }

  if (out_energy != nullptr) *out_energy = (float)prev_energy;
  for (int i = 0; i < n; i++) out_comp[i] = comp[i];
  return n_comp;
}

}  // extern "C"
