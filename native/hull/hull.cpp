// Hidden-point-removal visibility: spherical flip + 3-D quickhull.
//
// TPU-native replacement for the o3d `hidden_point_removal` call used by
// the reference's get_point_validation_by_o3d (ours_utils.py:204-225).
// o3d delegates to qhull; on the 1-core tunnel hosts the general-purpose
// qhull (facet merging, arbitrary-dim bookkeeping) costs ~1 s/shape for
// the 8 view hulls.  This is a dedicated 3-D quickhull that only needs
// the hull VERTEX SET (visibility = "is a hull vertex"), single-threaded,
// double precision.  Any degeneracy (flat input, open horizon, iteration
// cap) aborts the view with a nonzero flag and the Python caller redoes
// that view with scipy/qhull, so robustness never regresses below the
// previous path.
//
// Build: g++ -O3 -fPIC -shared -std=c++17 hull.cpp -o libhull.so
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Face {
  int v[3];        // vertex indices, CCW seen from outside
  int adj[3];      // adj[i] = face across edge (v[i], v[(i+1)%3])
  double n[3];     // unit outward normal
  double d;        // plane offset: dot(n, x) = d on the plane
  std::vector<int> outside;  // points strictly outside this face
  int far_idx = -1;
  double far_dist = 0.0;
  bool alive = true;
};

struct Hull {
  const double* pts;  // [n][3]
  int n;
  double eps;
  std::vector<Face> faces;
  std::vector<int> stack;  // faces with nonempty outside sets
  bool failed = false;

  double dist(int f, int p) const {
    const Face& F = faces[f];
    const double* x = pts + 3 * p;
    return F.n[0] * x[0] + F.n[1] * x[1] + F.n[2] * x[2] - F.d;
  }

  bool set_plane(Face& F) {
    const double* a = pts + 3 * F.v[0];
    const double* b = pts + 3 * F.v[1];
    const double* c = pts + 3 * F.v[2];
    double ab[3] = {b[0] - a[0], b[1] - a[1], b[2] - a[2]};
    double ac[3] = {c[0] - a[0], c[1] - a[1], c[2] - a[2]};
    double nx = ab[1] * ac[2] - ab[2] * ac[1];
    double ny = ab[2] * ac[0] - ab[0] * ac[2];
    double nz = ab[0] * ac[1] - ab[1] * ac[0];
    double len = std::sqrt(nx * nx + ny * ny + nz * nz);
    if (len < 1e-300) return false;
    F.n[0] = nx / len; F.n[1] = ny / len; F.n[2] = nz / len;
    F.d = F.n[0] * a[0] + F.n[1] * a[1] + F.n[2] * a[2];
    return true;
  }

  void push_if_work(int f) {
    if (!faces[f].outside.empty()) stack.push_back(f);
  }

  // Assign each point of `cand` to the first new face it is outside of.
  void distribute(const std::vector<int>& cand, const int* newf, int nnew) {
    for (int p : cand) {
      for (int k = 0; k < nnew; ++k) {
        double dd = dist(newf[k], p);
        if (dd > eps) {
          Face& F = faces[newf[k]];
          F.outside.push_back(p);
          if (dd > F.far_dist) { F.far_dist = dd; F.far_idx = p; }
          break;
        }
      }
    }
  }

  bool init_simplex() {
    // extreme points along the 3 axes
    int lo[3] = {0, 0, 0}, hi[3] = {0, 0, 0};
    for (int p = 1; p < n; ++p)
      for (int k = 0; k < 3; ++k) {
        if (pts[3 * p + k] < pts[3 * lo[k] + k]) lo[k] = p;
        if (pts[3 * p + k] > pts[3 * hi[k] + k]) hi[k] = p;
      }
    // farthest pair among the 6 candidates
    int cand[6] = {lo[0], hi[0], lo[1], hi[1], lo[2], hi[2]};
    int A = cand[0], B = cand[1];
    double best = -1.0;
    for (int i = 0; i < 6; ++i)
      for (int j = i + 1; j < 6; ++j) {
        const double* a = pts + 3 * cand[i];
        const double* b = pts + 3 * cand[j];
        double d2 = 0;
        for (int k = 0; k < 3; ++k) d2 += (a[k] - b[k]) * (a[k] - b[k]);
        if (d2 > best) { best = d2; A = cand[i]; B = cand[j]; }
      }
    if (best <= eps * eps) return false;
    // farthest point from line AB
    const double* a = pts + 3 * A;
    const double* b = pts + 3 * B;
    double ab[3] = {b[0] - a[0], b[1] - a[1], b[2] - a[2]};
    double ab2 = ab[0] * ab[0] + ab[1] * ab[1] + ab[2] * ab[2];
    int C = -1; best = eps * eps;
    for (int p = 0; p < n; ++p) {
      const double* x = pts + 3 * p;
      double ax[3] = {x[0] - a[0], x[1] - a[1], x[2] - a[2]};
      double t = (ax[0] * ab[0] + ax[1] * ab[1] + ax[2] * ab[2]) / ab2;
      double d2 = 0;
      for (int k = 0; k < 3; ++k) {
        double r = ax[k] - t * ab[k];
        d2 += r * r;
      }
      if (d2 > best) { best = d2; C = p; }
    }
    if (C < 0) return false;
    // base triangle, then farthest point from its plane
    Face base;
    base.v[0] = A; base.v[1] = B; base.v[2] = C;
    if (!set_plane(base)) return false;
    int D = -1; best = eps;
    double sign = 0.0;
    for (int p = 0; p < n; ++p) {
      const double* x = pts + 3 * p;
      double dd = base.n[0] * x[0] + base.n[1] * x[1] + base.n[2] * x[2]
                  - base.d;
      if (std::fabs(dd) > best) { best = std::fabs(dd); D = p; sign = dd; }
    }
    if (D < 0) return false;
    // orient: make D below the base plane (base CCW from outside)
    if (sign > 0) std::swap(base.v[1], base.v[2]);
    int a0 = base.v[0], b0 = base.v[1], c0 = base.v[2];
    faces.resize(4);
    // tetra faces, all CCW from outside:
    //   0:(a,b,c)  1:(b,a,D)  2:(c,b,D)  3:(a,c,D)
    int fv[4][3] = {{a0, b0, c0}, {b0, a0, D}, {c0, b0, D}, {a0, c0, D}};
    int fa[4][3] = {{1, 2, 3},    {0, 3, 2},   {0, 1, 3},   {0, 2, 1}};
    for (int f = 0; f < 4; ++f) {
      for (int k = 0; k < 3; ++k) {
        faces[f].v[k] = fv[f][k];
        faces[f].adj[k] = fa[f][k];
      }
      if (!set_plane(faces[f])) return false;
    }
    // initial outside sets
    for (int p = 0; p < n; ++p) {
      if (p == a0 || p == b0 || p == c0 || p == D) continue;
      for (int f = 0; f < 4; ++f) {
        double dd = dist(f, p);
        if (dd > eps) {
          faces[f].outside.push_back(p);
          if (dd > faces[f].far_dist) {
            faces[f].far_dist = dd; faces[f].far_idx = p;
          }
          break;
        }
      }
    }
    for (int f = 0; f < 4; ++f) push_if_work(f);
    return true;
  }

  bool run() {
    if (!init_simplex()) return false;
    std::vector<int> visible, horizon_face, horizon_edge;
    std::vector<char> vis_mark;
    std::vector<int> dfs;
    long iter = 0, iter_cap = 64L * n + 1024;
    while (!stack.empty()) {
      if (++iter > iter_cap) return false;
      int f0 = stack.back();
      stack.pop_back();
      Face& F0 = faces[f0];
      if (!F0.alive || F0.outside.empty()) continue;
      int p = F0.far_idx;

      // find all faces visible from p (DFS over adjacency)
      visible.clear(); horizon_face.clear(); horizon_edge.clear();
      if ((int)vis_mark.size() < (int)faces.size())
        vis_mark.resize(faces.size(), 0);
      dfs.clear();
      dfs.push_back(f0);
      vis_mark[f0] = 1;
      while (!dfs.empty()) {
        int f = dfs.back();
        dfs.pop_back();
        visible.push_back(f);
        for (int e = 0; e < 3; ++e) {
          int g = faces[f].adj[e];
          if (vis_mark[g]) continue;
          if (dist(g, p) > eps) {
            vis_mark[g] = 1;
            dfs.push_back(g);
          } else {
            horizon_face.push_back(f);
            horizon_edge.push_back(e);
          }
        }
      }

      // new faces: one per horizon edge (a,b) -> (a,b,p)
      int nnew = (int)horizon_face.size();
      if (nnew < 3) return false;
      std::vector<int> newf(nnew);
      int base_id = (int)faces.size();
      for (int k = 0; k < nnew; ++k) newf[k] = base_id + k;
      faces.resize(base_id + nnew);
      vis_mark.resize(faces.size(), 0);
      // map: first horizon vertex a -> new face id (to stitch p-edges)
      // horizon vertices are a loop; use two flat arrays keyed by vertex
      // via a local hash (std::vector of pairs is fine at horizon size)
      std::vector<std::pair<int, int>> by_a(nnew);
      for (int k = 0; k < nnew; ++k) {
        int hf = horizon_face[k], he = horizon_edge[k];
        Face& NF = faces[newf[k]];
        int a2 = faces[hf].v[he];
        int b2 = faces[hf].v[(he + 1) % 3];
        NF.v[0] = a2; NF.v[1] = b2; NF.v[2] = p;
        NF.alive = true;
        NF.outside.clear(); NF.far_idx = -1; NF.far_dist = 0.0;
        if (!set_plane(NF)) return false;
        // adjacency across the horizon edge: the non-visible neighbor
        int g = faces[hf].adj[he];
        NF.adj[0] = g;
        // fix g's back-pointer (find the edge of g adjacent to hf)
        for (int e = 0; e < 3; ++e)
          if (faces[g].adj[e] == hf) { faces[g].adj[e] = newf[k]; break; }
        by_a[k] = {a2, newf[k]};
      }
      // stitch p-edges: new face k has edge1 (b2,p) and edge2 (p,a2).
      // neighbor across (b2,p) is the new face whose a == b2;
      // neighbor across (p,a2) is the new face whose b == a2.
      for (int k = 0; k < nnew; ++k) {
        Face& NF = faces[newf[k]];
        int a2 = NF.v[0], b2 = NF.v[1];
        int next = -1, prev = -1;
        for (int j = 0; j < nnew; ++j) {
          if (by_a[j].first == b2) next = by_a[j].second;
          if (faces[by_a[j].second].v[1] == a2) prev = by_a[j].second;
        }
        if (next < 0 || prev < 0) return false;
        NF.adj[1] = next;
        NF.adj[2] = prev;
      }
      // redistribute outside points of all visible faces
      for (int f : visible) {
        distribute(faces[f].outside, newf.data(), nnew);
        faces[f].outside.clear();
        faces[f].outside.shrink_to_fit();
        faces[f].alive = false;
      }
      for (int k = 0; k < nnew; ++k) push_if_work(newf[k]);
    }
    return true;
  }
};

}  // namespace

extern "C" {

// Visibility for one eye. pts: [n][3] doubles (raw cloud), eye: [3].
// vis_out: [n] bytes set to 1 for visible points.  Returns 0 on success,
// nonzero on degeneracy (caller falls back to qhull for this view).
int hpr_one_view(const double* pts, int n, const double* eye,
                 double radius_param, unsigned char* vis_out) {
  if (n < 4) return 1;
  // spherical flip about the eye (Katz et al.): q = p' + 2(R-|p'|) p'/|p'|
  // with p' = p - eye, R = radius_param * max|p'|; the eye itself maps to
  // the origin and is appended as point n.
  std::vector<double> flip(3 * (n + 1));
  double maxn = 0.0;
  std::vector<double> norms(n);
  for (int i = 0; i < n; ++i) {
    double x = pts[3 * i] - eye[0];
    double y = pts[3 * i + 1] - eye[1];
    double z = pts[3 * i + 2] - eye[2];
    double nn = std::sqrt(x * x + y * y + z * z);
    norms[i] = nn;
    if (nn > maxn) maxn = nn;
    flip[3 * i] = x; flip[3 * i + 1] = y; flip[3 * i + 2] = z;
  }
  double R = radius_param * maxn;
  if (!(R > 0.0)) return 2;
  for (int i = 0; i < n; ++i) {
    double nn = norms[i] > 1e-12 ? norms[i] : 1e-12;
    double s = 1.0 + 2.0 * (R - norms[i]) / nn;
    flip[3 * i] *= s; flip[3 * i + 1] *= s; flip[3 * i + 2] *= s;
  }
  flip[3 * n] = flip[3 * n + 1] = flip[3 * n + 2] = 0.0;

  Hull h;
  h.pts = flip.data();
  h.n = n + 1;
  h.eps = 1e-10 * 2.0 * R;  // relative tolerance at the flipped scale
  if (!h.run()) return 3;
  std::memset(vis_out, 0, n);
  for (const Face& F : h.faces)
    if (F.alive)
      for (int k = 0; k < 3; ++k)
        if (F.v[k] < n) vis_out[F.v[k]] = 1;
  return 0;
}

// All views in one call: eyes [v][3], vis_out [v][n].  view_rc [v] gets
// the per-view return code (0 ok).  Returns the number of failed views.
int hpr_visibility(const double* pts, int n, const double* eyes, int v,
                   double radius_param, unsigned char* vis_out,
                   int* view_rc) {
  int bad = 0;
  for (int i = 0; i < v; ++i) {
    int rc = hpr_one_view(pts, n, eyes + 3 * i, radius_param,
                          vis_out + (size_t)i * n);
    view_rc[i] = rc;
    if (rc) ++bad;
  }
  return bad;
}

}  // extern "C"
