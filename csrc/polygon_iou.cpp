// Host-side float64 polygon geometry for evaluation and patch merging.
//
// Re-provides the role of the reference's polygon_geo_cpu extension
// (r3det/ops/polygon_geo/src/polygon_geo_cpu.cpp: CPU float64 polygon IoU
// matrix used by DOTA mAP evaluation) and the host side of cross-patch
// merge NMS. Implementation is our own: Sutherland–Hodgman convex
// clipping + shoelace area (the reference uses a vertex/edge-intersection
// point collector; results agree to float64 precision on convex quads).
//
// Exposed via a plain C ABI for ctypes (no pybind11 in this image):
//   polygon_iou_matrix(p1, n1, p2, n2, out)   — (n1, n2) IoU matrix
//   polygon_greedy_nms(polys, scores, n, thr, keep_out) -> num_kept
//
// Build: g++ -O3 -march=native -shared -fPIC polygon_iou.cpp -o libpolygeo.so
#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <vector>

namespace {

struct Pt { double x, y; };

double shoelace(const Pt* p, int n) {
  double a = 0;
  for (int i = 0; i < n; ++i) {
    const Pt& u = p[i];
    const Pt& v = p[(i + 1) % n];
    a += u.x * v.y - v.x * u.y;
  }
  return 0.5 * a;  // signed
}

// Clip convex polygon `in` (n vertices) by the half-plane left of edge
// (a -> b) assuming counter-clockwise orientation of the clip polygon.
int clip_halfplane(const Pt* in, int n, Pt a, Pt b, Pt* out) {
  int m = 0;
  for (int i = 0; i < n; ++i) {
    Pt cur = in[i];
    Pt nxt = in[(i + 1) % n];
    double c1 = (b.x - a.x) * (cur.y - a.y) - (b.y - a.y) * (cur.x - a.x);
    double c2 = (b.x - a.x) * (nxt.y - a.y) - (b.y - a.y) * (nxt.x - a.x);
    bool in1 = c1 >= 0, in2 = c2 >= 0;
    if (in1) out[m++] = cur;
    if (in1 != in2) {
      double t = c1 / (c1 - c2);
      out[m++] = {cur.x + t * (nxt.x - cur.x), cur.y + t * (nxt.y - cur.y)};
    }
  }
  return m;
}

// Ensure CCW order (positive signed area).
void make_ccw(Pt* p, int n) {
  if (shoelace(p, n) < 0) std::reverse(p, p + n);
}

double quad_inter_area(const double* q1, const double* q2) {
  Pt a[4] = {{q1[0], q1[1]}, {q1[2], q1[3]}, {q1[4], q1[5]}, {q1[6], q1[7]}};
  Pt b[4] = {{q2[0], q2[1]}, {q2[2], q2[3]}, {q2[4], q2[5]}, {q2[6], q2[7]}};
  make_ccw(a, 4);
  make_ccw(b, 4);
  // clip a by b's 4 edges; intersection of two quads has <= 8 vertices,
  // buffers sized 16 for slack
  Pt buf1[16], buf2[16];
  std::memcpy(buf1, a, sizeof(a));
  int n = 4;
  Pt* cur = buf1;
  Pt* nxt = buf2;
  for (int e = 0; e < 4 && n > 2; ++e) {
    n = clip_halfplane(cur, n, b[e], b[(e + 1) % 4], nxt);
    std::swap(cur, nxt);
  }
  if (n < 3) return 0.0;
  return std::fabs(shoelace(cur, n));
}

double quad_area(const double* q) {
  Pt p[4] = {{q[0], q[1]}, {q[2], q[3]}, {q[4], q[5]}, {q[6], q[7]}};
  return std::fabs(shoelace(p, 4));
}

}  // namespace

extern "C" {

// p1: (n1, 8) row-major doubles; p2: (n2, 8); out: (n1, n2)
void polygon_iou_matrix(const double* p1, int64_t n1, const double* p2,
                        int64_t n2, double* out) {
  std::vector<double> a2(n2);
  for (int64_t j = 0; j < n2; ++j) a2[j] = quad_area(p2 + 8 * j);
  for (int64_t i = 0; i < n1; ++i) {
    const double* qi = p1 + 8 * i;
    double a1 = quad_area(qi);
    for (int64_t j = 0; j < n2; ++j) {
      double inter = quad_inter_area(qi, p2 + 8 * j);
      double uni = a1 + a2[j] - inter;
      out[i * n2 + j] = uni > 1e-12 ? inter / uni : 0.0;
    }
  }
}

// Greedy NMS over scored quads. polys: (n, 8); scores: (n,).
// keep_out: (n,) int64 buffer; returns number kept (indices in score order).
int64_t polygon_greedy_nms(const double* polys, const double* scores,
                           int64_t n, double thr, int64_t* keep_out) {
  std::vector<int64_t> order(n);
  std::iota(order.begin(), order.end(), 0);
  std::stable_sort(order.begin(), order.end(),
                   [&](int64_t a, int64_t b) { return scores[a] > scores[b]; });
  std::vector<char> suppressed(n, 0);
  std::vector<double> areas(n);
  for (int64_t i = 0; i < n; ++i) areas[i] = quad_area(polys + 8 * i);
  int64_t num = 0;
  for (int64_t oi = 0; oi < n; ++oi) {
    int64_t i = order[oi];
    if (suppressed[i]) continue;
    keep_out[num++] = i;
    for (int64_t oj = oi + 1; oj < n; ++oj) {
      int64_t j = order[oj];
      if (suppressed[j]) continue;
      double inter = quad_inter_area(polys + 8 * i, polys + 8 * j);
      double uni = areas[i] + areas[j] - inter;
      if (uni > 1e-12 && inter / uni > thr) suppressed[j] = 1;
    }
  }
  return num;
}

}  // extern "C"
