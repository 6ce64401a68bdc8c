// Host-side native ops for the data pipeline (dataloader workers).
//
// Native counterpart of the reference's CPU geometry kernels
// (pcdet/ops/iou3d_nms/src/iou3d_cpu.cpp — rotated BEV IoU used by the GT
// sampler's collision test, and pcdet/ops/roiaware_pool3d — points-in-box
// membership used by offline GT-database creation). On TPU these run on the
// host inside dataloader workers, so C++ (not Pallas) is the right
// substrate. Box layout: [x, y, z, dx, dy, dz, heading].
//
// Build: g++ -O3 -shared -fPIC host_ops.cpp -o libhost_ops.so

#include <cmath>
#include <cstdint>
#include <cstring>
#include <algorithm>

namespace {

struct Pt {
  double x, y;
};

inline double cross(const Pt& o, const Pt& a, const Pt& b) {
  return (a.x - o.x) * (b.y - o.y) - (a.y - o.y) * (b.x - o.x);
}

// 4 BEV corners, CCW
void box_corners(const float* b, Pt* c) {
  const double cx = b[0], cy = b[1], dx = b[3], dy = b[4], a = b[6];
  const double ca = std::cos(a), sa = std::sin(a);
  const double lx[4] = {0.5, 0.5, -0.5, -0.5};
  const double ly[4] = {-0.5, 0.5, 0.5, -0.5};
  for (int i = 0; i < 4; ++i) {
    const double px = lx[i] * dx, py = ly[i] * dy;
    c[i].x = px * ca - py * sa + cx;
    c[i].y = px * sa + py * ca + cy;
  }
}

// Sutherland–Hodgman: clip polygon (poly, n) by half-plane left of p0->p1
int clip_halfplane(const Pt* poly, int n, Pt p0, Pt p1, Pt* out) {
  int m = 0;
  for (int i = 0; i < n; ++i) {
    const Pt& cur = poly[i];
    const Pt& nxt = poly[(i + 1) % n];
    const double dc = cross(p0, p1, cur);
    const double dn = cross(p0, p1, nxt);
    if (dc >= 0) out[m++] = cur;
    if ((dc >= 0) != (dn >= 0)) {
      const double t = dc / (dc - dn);
      out[m++] = {cur.x + t * (nxt.x - cur.x), cur.y + t * (nxt.y - cur.y)};
    }
  }
  return m;
}

double polygon_area(const Pt* p, int n) {
  if (n < 3) return 0.0;
  double a = 0.0;
  for (int i = 0; i < n; ++i) {
    const Pt& u = p[i];
    const Pt& v = p[(i + 1) % n];
    a += u.x * v.y - v.x * u.y;
  }
  return std::fabs(a) * 0.5;
}

double rotated_overlap(const float* ba, const float* bb) {
  Pt ca[4], cb[4];
  box_corners(ba, ca);
  box_corners(bb, cb);
  Pt buf1[16], buf2[16];
  std::memcpy(buf1, ca, sizeof(ca));
  int n = 4;
  Pt* src = buf1;
  Pt* dst = buf2;
  for (int e = 0; e < 4 && n > 0; ++e) {
    n = clip_halfplane(src, n, cb[e], cb[(e + 1) % 4], dst);
    std::swap(src, dst);
  }
  return polygon_area(src, n);
}

}  // namespace

extern "C" {

// (N,7) x (M,7) -> (N,M) rotated BEV IoU
void boxes_iou_bev(const float* boxes_a, int n, const float* boxes_b, int m,
                   float* out) {
  for (int i = 0; i < n; ++i) {
    const float* ba = boxes_a + i * 7;
    const double area_a = (double)ba[3] * ba[4];
    for (int j = 0; j < m; ++j) {
      const float* bb = boxes_b + j * 7;
      const double inter = rotated_overlap(ba, bb);
      const double uni = area_a + (double)bb[3] * bb[4] - inter;
      out[i * m + j] = (float)(inter / std::max(uni, 1e-6));
    }
  }
}

// (N,7) x (M,7) -> (N,M) 3D IoU
void boxes_iou_3d(const float* boxes_a, int n, const float* boxes_b, int m,
                  float* out) {
  for (int i = 0; i < n; ++i) {
    const float* ba = boxes_a + i * 7;
    const double va = (double)ba[3] * ba[4] * ba[5];
    for (int j = 0; j < m; ++j) {
      const float* bb = boxes_b + j * 7;
      const double inter_bev = rotated_overlap(ba, bb);
      const double hi = std::min(ba[2] + ba[5] / 2.0, bb[2] + bb[5] / 2.0);
      const double lo = std::max(ba[2] - ba[5] / 2.0, bb[2] - bb[5] / 2.0);
      const double ih = std::max(hi - lo, 0.0);
      const double inter = inter_bev * ih;
      const double vb = (double)bb[3] * bb[4] * bb[5];
      out[i * m + j] = (float)(inter / std::max(va + vb - inter, 1e-6));
    }
  }
}

// (N,3) points x (M,7) boxes -> (N,) int32 index of first containing box, -1 if none
void points_in_boxes(const float* pts, int n, const float* boxes, int m,
                     int32_t* out) {
  for (int i = 0; i < n; ++i) {
    const float px = pts[i * 3], py = pts[i * 3 + 1], pz = pts[i * 3 + 2];
    out[i] = -1;
    for (int j = 0; j < m; ++j) {
      const float* b = boxes + j * 7;
      const float dz = pz - b[2];
      if (std::fabs(dz) >= b[5] / 2) continue;
      const float sx = px - b[0], sy = py - b[1];
      const float ca = std::cos(-b[6]), sa = std::sin(-b[6]);
      const float lx = sx * ca - sy * sa;
      const float ly = sx * sa + sy * ca;
      if (std::fabs(lx) < b[3] / 2 && std::fabs(ly) < b[4] / 2) {
        out[i] = j;
        break;
      }
    }
  }
}

// Greedy rotated NMS on host: returns number kept; keep indices in `keep`.
int nms_bev(const float* boxes, const float* scores, int n, float thresh,
            int32_t* keep) {
  // order by score desc (stable)
  int32_t* order = new int32_t[n];
  for (int i = 0; i < n; ++i) order[i] = i;
  std::stable_sort(order, order + n,
                   [&](int a, int b) { return scores[a] > scores[b]; });
  bool* suppressed = new bool[n]();
  int nk = 0;
  for (int oi = 0; oi < n; ++oi) {
    const int i = order[oi];
    if (suppressed[i]) continue;
    keep[nk++] = i;
    const float* bi = boxes + i * 7;
    const double area_i = (double)bi[3] * bi[4];
    for (int oj = oi + 1; oj < n; ++oj) {
      const int j = order[oj];
      if (suppressed[j]) continue;
      const float* bj = boxes + j * 7;
      const double inter = rotated_overlap(bi, bj);
      const double uni = area_i + (double)bj[3] * bj[4] - inter;
      if (inter / std::max(uni, 1e-6) > thresh) suppressed[j] = true;
    }
  }
  delete[] order;
  delete[] suppressed;
  return nk;
}

}  // extern "C"
