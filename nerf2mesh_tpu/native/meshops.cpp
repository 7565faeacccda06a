// meshops: native mesh processing for nerf2mesh-tpu.
//
// Replaces the reference's pymeshlab dependency (/root/reference/meshutils.py)
// with a small self-contained C++ library exposed through a C ABI (ctypes):
//   - quadric edge-collapse decimation (Garland-Heckbert), with optional
//     per-face protection mask (used by adaptive refinement, meshutils.py:191)
//   - duplicate-vertex merge (epsilon grid hashing)
//   - small-connected-component removal by face count / bbox diameter
//     (meshutils.py:146-188 clean_mesh semantics)
//
// These run host-side a handful of times per job (SURVEY.md §7), but on a
// single-core host a Python implementation of decimation would take minutes;
// this runs ~1e6 collapses in seconds.
//
// Build: make -C nerf2mesh_tpu/native   (produces libmeshops.so)

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <cmath>
#include <vector>
#include <queue>
#include <unordered_map>
#include <algorithm>
#include <functional>

namespace {

struct Vec3 {
  double x = 0, y = 0, z = 0;
  Vec3() = default;
  Vec3(double a, double b, double c) : x(a), y(b), z(c) {}
  Vec3 operator+(const Vec3& o) const { return {x + o.x, y + o.y, z + o.z}; }
  Vec3 operator-(const Vec3& o) const { return {x - o.x, y - o.y, z - o.z}; }
  Vec3 operator*(double s) const { return {x * s, y * s, z * s}; }
  double dot(const Vec3& o) const { return x * o.x + y * o.y + z * o.z; }
  Vec3 cross(const Vec3& o) const {
    return {y * o.z - z * o.y, z * o.x - x * o.z, x * o.y - y * o.x};
  }
  double norm() const { return std::sqrt(dot(*this)); }
};

// symmetric 4x4 quadric, 10 coefficients
struct Quadric {
  double q[10] = {0};
  void addPlane(double a, double b, double c, double d, double w) {
    q[0] += w * a * a; q[1] += w * a * b; q[2] += w * a * c; q[3] += w * a * d;
    q[4] += w * b * b; q[5] += w * b * c; q[6] += w * b * d;
    q[7] += w * c * c; q[8] += w * c * d; q[9] += w * d * d;
  }
  void add(const Quadric& o) { for (int i = 0; i < 10; i++) q[i] += o.q[i]; }
  double eval(const Vec3& v) const {
    return q[0]*v.x*v.x + 2*q[1]*v.x*v.y + 2*q[2]*v.x*v.z + 2*q[3]*v.x
         + q[4]*v.y*v.y + 2*q[5]*v.y*v.z + 2*q[6]*v.y
         + q[7]*v.z*v.z + 2*q[8]*v.z + q[9];
  }
};

struct EdgeKey {
  uint64_t k;
  EdgeKey(int a, int b) {
    if (a > b) std::swap(a, b);
    k = (uint64_t(uint32_t(a)) << 32) | uint32_t(b);
  }
  bool operator==(const EdgeKey& o) const { return k == o.k; }
};
struct EdgeKeyHash {
  size_t operator()(const EdgeKey& e) const {
    uint64_t x = e.k; x ^= x >> 33; x *= 0xff51afd7ed558ccdULL; x ^= x >> 33;
    return size_t(x);
  }
};

struct HeapItem {
  double cost;
  int a, b;
  uint32_t stamp_a, stamp_b;
  bool operator<(const HeapItem& o) const { return cost > o.cost; }  // min-heap
};

void write_out(const std::vector<Vec3>& V, const std::vector<int>& F,
               float** out_v, int* out_nv, int** out_f, int* out_nf) {
  *out_nv = (int)V.size();
  *out_nf = (int)(F.size() / 3);
  *out_v = (float*)std::malloc(sizeof(float) * 3 * V.size());
  *out_f = (int*)std::malloc(sizeof(int) * F.size());
  for (size_t i = 0; i < V.size(); i++) {
    (*out_v)[3 * i + 0] = (float)V[i].x;
    (*out_v)[3 * i + 1] = (float)V[i].y;
    (*out_v)[3 * i + 2] = (float)V[i].z;
  }
  std::memcpy(*out_f, F.data(), sizeof(int) * F.size());
}

// compact: drop unreferenced vertices, renumber
void compact(std::vector<Vec3>& V, std::vector<int>& F) {
  std::vector<int> remap(V.size(), -1);
  std::vector<Vec3> NV;
  NV.reserve(V.size());
  for (size_t i = 0; i < F.size(); i++) {
    int v = F[i];
    if (remap[v] < 0) {
      remap[v] = (int)NV.size();
      NV.push_back(V[v]);
    }
    F[i] = remap[v];
  }
  V.swap(NV);
}

}  // namespace

extern "C" {

void meshops_free(void* p) { std::free(p); }

// Quadric edge-collapse to `target_faces`. protect: optional [nf] mask, faces
// with protect!=0 are never touched (their vertices are pinned).
int meshops_decimate(const float* verts, int nv, const int* tris, int nf,
                     int target_faces, const uint8_t* protect,
                     float** out_v, int* out_nv, int** out_f, int* out_nf) {
  std::vector<Vec3> V(nv);
  for (int i = 0; i < nv; i++)
    V[i] = Vec3(verts[3 * i], verts[3 * i + 1], verts[3 * i + 2]);
  std::vector<int> F(tris, tris + 3 * (size_t)nf);

  std::vector<Quadric> Q(nv);
  std::vector<char> pinned(nv, 0);
  std::vector<std::vector<int>> vfaces(nv);
  std::vector<char> dead_face(nf, 0);

  for (int f = 0; f < nf; f++) {
    int a = F[3 * f], b = F[3 * f + 1], c = F[3 * f + 2];
    Vec3 n = (V[b] - V[a]).cross(V[c] - V[a]);
    double area2 = n.norm();
    if (area2 < 1e-30) { dead_face[f] = 1; continue; }
    Vec3 un = n * (1.0 / area2);
    double d = -un.dot(V[a]);
    double w = 0.5 * area2;  // area weight
    Q[a].addPlane(un.x, un.y, un.z, d, w);
    Q[b].addPlane(un.x, un.y, un.z, d, w);
    Q[c].addPlane(un.x, un.y, un.z, d, w);
    vfaces[a].push_back(f); vfaces[b].push_back(f); vfaces[c].push_back(f);
    if (protect && protect[f]) { pinned[a] = pinned[b] = pinned[c] = 1; }
  }

  // boundary edges get a constraint quadric so borders don't shrink
  {
    std::unordered_map<EdgeKey, int, EdgeKeyHash> ecount;
    ecount.reserve(nf * 3);
    for (int f = 0; f < nf; f++) {
      if (dead_face[f]) continue;
      for (int e = 0; e < 3; e++) {
        ecount[EdgeKey(F[3 * f + e], F[3 * f + (e + 1) % 3])]++;
      }
    }
    for (int f = 0; f < nf; f++) {
      if (dead_face[f]) continue;
      int vv[3] = {F[3 * f], F[3 * f + 1], F[3 * f + 2]};
      for (int e = 0; e < 3; e++) {
        int a = vv[e], b = vv[(e + 1) % 3];
        if (ecount[EdgeKey(a, b)] == 1) {
          // plane through edge, perpendicular to the face
          int c = vv[(e + 2) % 3];
          Vec3 fn = (V[b] - V[a]).cross(V[c] - V[a]);
          Vec3 en = (V[b] - V[a]).cross(fn);
          double nn = en.norm();
          if (nn > 1e-30) {
            en = en * (1.0 / nn);
            double d = -en.dot(V[a]);
            double w = (V[b] - V[a]).dot(V[b] - V[a]) * 10.0;
            Q[a].addPlane(en.x, en.y, en.z, d, w);
            Q[b].addPlane(en.x, en.y, en.z, d, w);
          }
        }
      }
    }
  }

  std::vector<uint32_t> stamp(nv, 0);
  std::vector<int> parent(nv);
  for (int i = 0; i < nv; i++) parent[i] = i;
  std::function<int(int)> find = [&](int x) {
    while (parent[x] != x) { parent[x] = parent[parent[x]]; x = parent[x]; }
    return x;
  };

  auto best_point = [&](int a, int b, double* cost) {
    Quadric q = Q[a]; q.add(Q[b]);
    Vec3 cands[3] = {V[a], V[b], (V[a] + V[b]) * 0.5};
    int bi = 0; double bc = 1e300;
    for (int i = 0; i < 3; i++) {
      double c = q.eval(cands[i]);
      if (c < bc) { bc = c; bi = i; }
    }
    *cost = bc;
    return cands[bi];
  };

  std::priority_queue<HeapItem> heap;
  std::unordered_map<EdgeKey, char, EdgeKeyHash> in_heap;
  auto push_edge = [&](int a, int b) {
    a = find(a); b = find(b);
    if (a == b || pinned[a] || pinned[b]) return;
    double cost;
    best_point(a, b, &cost);
    heap.push({cost, a, b, stamp[a], stamp[b]});
  };

  for (int f = 0; f < nf; f++) {
    if (dead_face[f]) continue;
    for (int e = 0; e < 3; e++) {
      int a = F[3 * f + e], b = F[3 * f + (e + 1) % 3];
      EdgeKey k(a, b);
      if (!in_heap.count(k)) { in_heap[k] = 1; push_edge(a, b); }
    }
  }

  int live_faces = 0;
  for (int f = 0; f < nf; f++) if (!dead_face[f]) live_faces++;

  auto face_alive = [&](int f) {
    if (dead_face[f]) return false;
    int a = find(F[3 * f]), b = find(F[3 * f + 1]), c = find(F[3 * f + 2]);
    return a != b && b != c && a != c;
  };

  while (live_faces > target_faces && !heap.empty()) {
    HeapItem it = heap.top(); heap.pop();
    int a = find(it.a), b = find(it.b);
    if (a == b) continue;
    if (stamp[a] != it.stamp_a || stamp[b] != it.stamp_b) continue;  // stale
    if (pinned[a] || pinned[b]) continue;

    double cost;
    Vec3 np = best_point(a, b, &cost);

    // link condition: the common neighbor vertices of a and b must be exactly
    // the opposite vertices of the faces sharing edge (a,b); any extra common
    // neighbor means the collapse pinches the surface into a non-manifold fin.
    {
      auto neigh = [&](int v, std::vector<int>& out) {
        for (int f : vfaces[v]) {
          if (dead_face[f]) continue;
          int x = find(F[3 * f]), y = find(F[3 * f + 1]), z = find(F[3 * f + 2]);
          if (x == y || y == z || x == z) continue;
          if (x != v) out.push_back(x);
          if (y != v) out.push_back(y);
          if (z != v) out.push_back(z);
        }
        std::sort(out.begin(), out.end());
        out.erase(std::unique(out.begin(), out.end()), out.end());
      };
      std::vector<int> na, nb, common, opp;
      neigh(a, na); neigh(b, nb);
      std::set_intersection(na.begin(), na.end(), nb.begin(), nb.end(),
                            std::back_inserter(common));
      for (int f : vfaces[a]) {
        if (dead_face[f]) continue;
        int vv[3] = {find(F[3 * f]), find(F[3 * f + 1]), find(F[3 * f + 2])};
        bool ha = false, hb = false; int other = -1;
        for (int k = 0; k < 3; k++) {
          if (vv[k] == a) ha = true;
          else if (vv[k] == b) hb = true;
          else other = vv[k];
        }
        if (ha && hb && other >= 0) opp.push_back(other);
      }
      std::sort(opp.begin(), opp.end());
      opp.erase(std::unique(opp.begin(), opp.end()), opp.end());
      if (common != opp) continue;  // reject: would create non-manifold edge
    }

    // collapse b into a
    parent[b] = a;
    V[a] = np;
    Q[a].add(Q[b]);
    stamp[a]++;

    // merge face lists, count killed faces, re-push neighbor edges
    std::vector<int>& fa = vfaces[a];
    std::vector<int>& fb = vfaces[b];
    fa.insert(fa.end(), fb.begin(), fb.end());
    fb.clear();
    std::sort(fa.begin(), fa.end());
    fa.erase(std::unique(fa.begin(), fa.end()), fa.end());
    std::vector<int> keep;
    keep.reserve(fa.size());
    for (int f : fa) {
      if (dead_face[f]) continue;
      int x = find(F[3 * f]), y = find(F[3 * f + 1]), z = find(F[3 * f + 2]);
      if (x == y || y == z || x == z) {
        dead_face[f] = 1;
        live_faces--;
      } else {
        keep.push_back(f);
      }
    }
    fa.swap(keep);
    for (int f : fa) {
      for (int e = 0; e < 3; e++) {
        int u = find(F[3 * f + e]), v = find(F[3 * f + (e + 1) % 3]);
        if (u == a || v == a) push_edge(u, v);
      }
    }
  }

  // emit
  std::vector<int> OF;
  OF.reserve(3 * (size_t)live_faces);
  for (int f = 0; f < nf; f++) {
    if (dead_face[f]) continue;
    int a = find(F[3 * f]), b = find(F[3 * f + 1]), c = find(F[3 * f + 2]);
    if (a == b || b == c || a == c) continue;
    OF.push_back(a); OF.push_back(b); OF.push_back(c);
  }
  std::vector<Vec3> OV = V;
  compact(OV, OF);
  write_out(OV, OF, out_v, out_nv, out_f, out_nf);
  return 0;
}

// Merge vertices within eps, drop degenerate/duplicate faces, remove
// connected components with fewer than min_faces faces or bbox diagonal
// below min_diameter (fraction of total bbox diagonal if <= 1).
int meshops_clean(const float* verts, int nv, const int* tris, int nf,
                  float merge_eps, int min_faces, float min_diameter,
                  float** out_v, int* out_nv, int** out_f, int* out_nf) {
  std::vector<Vec3> V(nv);
  for (int i = 0; i < nv; i++)
    V[i] = Vec3(verts[3 * i], verts[3 * i + 1], verts[3 * i + 2]);
  std::vector<int> F(tris, tris + 3 * (size_t)nf);

  // 1. merge close vertices via eps-grid
  std::vector<int> remap(nv);
  if (merge_eps > 0) {
    std::unordered_map<uint64_t, int> grid;
    grid.reserve(nv);
    double inv = 1.0 / merge_eps;
    for (int i = 0; i < nv; i++) {
      int64_t gx = (int64_t)std::llround(V[i].x * inv);
      int64_t gy = (int64_t)std::llround(V[i].y * inv);
      int64_t gz = (int64_t)std::llround(V[i].z * inv);
      uint64_t key = (uint64_t)(gx * 73856093LL ^ gy * 19349663LL ^ gz * 83492791LL);
      auto itr = grid.find(key);
      if (itr == grid.end()) { grid[key] = i; remap[i] = i; }
      else remap[i] = itr->second;
    }
  } else {
    for (int i = 0; i < nv; i++) remap[i] = i;
  }
  for (auto& idx : F) idx = remap[idx];

  // 2. drop degenerate and duplicate faces
  std::vector<int> F2;
  F2.reserve(F.size());
  std::unordered_map<uint64_t, char> seen;
  seen.reserve(nf);
  for (int f = 0; f < nf; f++) {
    int a = F[3 * f], b = F[3 * f + 1], c = F[3 * f + 2];
    if (a == b || b == c || a == c) continue;
    int s[3] = {a, b, c};
    std::sort(s, s + 3);
    uint64_t key = ((uint64_t)s[0] * 73856093ULL) ^ ((uint64_t)s[1] * 19349663ULL)
                   ^ ((uint64_t)s[2] * 83492791ULL);
    if (seen.count(key)) continue;
    seen[key] = 1;
    F2.push_back(a); F2.push_back(b); F2.push_back(c);
  }

  // 3. connected components over shared vertices (union-find)
  int nf2 = (int)(F2.size() / 3);
  std::vector<int> parent(nv);
  for (int i = 0; i < nv; i++) parent[i] = i;
  std::function<int(int)> find = [&](int x) {
    while (parent[x] != x) { parent[x] = parent[parent[x]]; x = parent[x]; }
    return x;
  };
  for (int f = 0; f < nf2; f++) {
    int a = find(F2[3 * f]), b = find(F2[3 * f + 1]), c = find(F2[3 * f + 2]);
    parent[b] = a; parent[c] = find(a);
  }
  // component stats
  std::unordered_map<int, int> comp_faces;
  std::unordered_map<int, Vec3> cmin, cmax;
  for (int f = 0; f < nf2; f++) {
    int r = find(F2[3 * f]);
    comp_faces[r]++;
    for (int e = 0; e < 3; e++) {
      const Vec3& p = V[F2[3 * f + e]];
      auto it = cmin.find(r);
      if (it == cmin.end()) { cmin[r] = p; cmax[r] = p; }
      else {
        Vec3& lo = cmin[r]; Vec3& hi = cmax[r];
        lo.x = std::min(lo.x, p.x); lo.y = std::min(lo.y, p.y); lo.z = std::min(lo.z, p.z);
        hi.x = std::max(hi.x, p.x); hi.y = std::max(hi.y, p.y); hi.z = std::max(hi.z, p.z);
      }
    }
  }
  // global diagonal for relative min_diameter
  double gdiag = 0;
  {
    Vec3 lo = V.empty() ? Vec3() : V[0], hi = lo;
    for (auto& p : V) {
      lo.x = std::min(lo.x, p.x); lo.y = std::min(lo.y, p.y); lo.z = std::min(lo.z, p.z);
      hi.x = std::max(hi.x, p.x); hi.y = std::max(hi.y, p.y); hi.z = std::max(hi.z, p.z);
    }
    gdiag = (hi - lo).norm();
  }
  double min_diag = min_diameter <= 1.0 ? min_diameter * 0.01 * gdiag : min_diameter;

  std::vector<int> F3;
  F3.reserve(F2.size());
  for (int f = 0; f < nf2; f++) {
    int r = find(F2[3 * f]);
    double diag = (cmax[r] - cmin[r]).norm();
    if (comp_faces[r] < min_faces && diag < min_diag) continue;
    F3.push_back(F2[3 * f]); F3.push_back(F2[3 * f + 1]); F3.push_back(F2[3 * f + 2]);
  }

  compact(V, F3);
  write_out(V, F3, out_v, out_nv, out_f, out_nf);
  return 0;
}

}  // extern "C"
