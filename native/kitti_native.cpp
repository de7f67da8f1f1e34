// Native host-side kernels for monodetr_tpu, loaded via ctypes.
//
// 1. warp_affine_normalize: the data-loader hot path — bilinear affine warp
//    of an RGB uint8 image to the fixed network resolution, fused with
//    /255 + ImageNet mean/std normalization, emitting float32 NHWC.
//    Replaces PIL Image.transform(AFFINE) + numpy normalize (the reference's
//    per-worker python warp, kitti_dataset.py:154-163).  PIL semantics:
//    output pixel (x, y) samples the source at
//      (a*(x+0.5) + b*(y+0.5) + c - 0.5,  d*(x+0.5) + e*(y+0.5) + f - 0.5)
//    with bilinear weights and zero fill outside.
//
// 2. rotated_iou: pairwise rotated-rectangle BEV overlap via
//    Sutherland-Hodgman clipping — the evaluator kernel the reference runs
//    in numba-CUDA (rotate_iou.py).  criterion: -1 IoU, 0 inter/area1,
//    1 inter/area2, 2 raw intersection area.
//
// Build: native/build.sh (g++ -O3 -shared -fPIC).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <algorithm>

extern "C" {

void warp_affine_normalize(
    const uint8_t* src, int src_h, int src_w,
    const double* inv,   // 2x3 row-major dst->src affine
    float* dst, int dst_h, int dst_w,
    const float* mean, const float* std_) {
  const double a = inv[0], b = inv[1], c = inv[2];
  const double d = inv[3], e = inv[4], f = inv[5];
  const float inv_std0 = 1.0f / std_[0];
  const float inv_std1 = 1.0f / std_[1];
  const float inv_std2 = 1.0f / std_[2];

  for (int y = 0; y < dst_h; ++y) {
    const double yc = y + 0.5;
    float* row = dst + (size_t)y * dst_w * 3;
    for (int x = 0; x < dst_w; ++x) {
      const double xc = x + 0.5;
      const double sx = a * xc + b * yc + c - 0.5;
      const double sy = d * xc + e * yc + f - 0.5;

      const int x0 = (int)std::floor(sx);
      const int y0 = (int)std::floor(sy);
      const float wx = (float)(sx - x0);
      const float wy = (float)(sy - y0);

      float acc[3] = {0.f, 0.f, 0.f};
      for (int dy = 0; dy < 2; ++dy) {
        const int yy = y0 + dy;
        if (yy < 0 || yy >= src_h) continue;
        const float wyv = dy ? wy : 1.f - wy;
        const uint8_t* srow = src + (size_t)yy * src_w * 3;
        for (int dx = 0; dx < 2; ++dx) {
          const int xx = x0 + dx;
          if (xx < 0 || xx >= src_w) continue;
          const float w = wyv * (dx ? wx : 1.f - wx);
          const uint8_t* p = srow + (size_t)xx * 3;
          acc[0] += w * p[0];
          acc[1] += w * p[1];
          acc[2] += w * p[2];
        }
      }
      const float s = 1.0f / 255.0f;
      row[x * 3 + 0] = (acc[0] * s - mean[0]) * inv_std0;
      row[x * 3 + 1] = (acc[1] * s - mean[1]) * inv_std1;
      row[x * 3 + 2] = (acc[2] * s - mean[2]) * inv_std2;
    }
  }
}

// ---------------- rotated IoU ----------------

struct Pt { double x, z; };

static inline double polygon_area(const Pt* p, int n) {
  double s = 0;
  for (int i = 0; i < n; ++i) {
    const Pt& u = p[i];
    const Pt& v = p[(i + 1) % n];
    s += u.x * v.z - v.x * u.z;
  }
  return std::abs(s) * 0.5;
}

// clip convex polygon (p, n) against half-plane left of directed edge a->b
static int clip_edge(const Pt* p, int n, Pt a, Pt b, Pt* out) {
  const double dx = b.x - a.x, dz = b.z - a.z;
  int m = 0;
  for (int i = 0; i < n; ++i) {
    const Pt& cur = p[i];
    const Pt& nxt = p[(i + 1) % n];
    const double dc = dx * (cur.z - a.z) - dz * (cur.x - a.x);
    const double dn = dx * (nxt.z - a.z) - dz * (nxt.x - a.x);
    if (dc >= 0) out[m++] = cur;
    if ((dc >= 0) != (dn >= 0)) {
      const double t = dc / (dc - dn);
      out[m++] = {cur.x + (nxt.x - cur.x) * t, cur.z + (nxt.z - cur.z) * t};
    }
  }
  return m;
}

static void box_corners(const double* box, Pt* c) {
  // box: cx, cz, l, w, ry
  const double cx = box[0], cz = box[1], hl = box[2] / 2, hw = box[3] / 2;
  const double co = std::cos(box[4]), si = std::sin(box[4]);
  const double dx[4] = {hl, hl, -hl, -hl};
  const double dz[4] = {hw, -hw, -hw, hw};
  for (int i = 0; i < 4; ++i) {
    c[i].x = cx + dx[i] * co + dz[i] * si;
    c[i].z = cz - dx[i] * si + dz[i] * co;
  }
}

static double rect_intersection(const double* b1, const double* b2) {
  Pt subj[16], clip[4], buf[16];
  box_corners(b1, subj);
  int n = 4;
  box_corners(b2, clip);
  // ensure counter-clockwise clip polygon
  double cross = (clip[1].x - clip[0].x) * (clip[2].z - clip[0].z) -
                 (clip[1].z - clip[0].z) * (clip[2].x - clip[0].x);
  if (cross < 0) std::swap(clip[1], clip[3]);
  for (int e = 0; e < 4 && n > 0; ++e) {
    n = clip_edge(subj, n, clip[e], clip[(e + 1) % 4], buf);
    std::memcpy(subj, buf, sizeof(Pt) * n);
  }
  return n > 0 ? polygon_area(subj, n) : 0.0;
}

void rotated_iou(const double* boxes, int n, const double* qboxes, int m,
                 int criterion, float* out) {
  for (int i = 0; i < n; ++i) {
    const double* b1 = boxes + i * 5;
    const double area1 = b1[2] * b1[3];
    for (int j = 0; j < m; ++j) {
      const double* b2 = qboxes + j * 5;
      const double inter = rect_intersection(b1, b2);
      double denom;
      switch (criterion) {
        case -1: denom = area1 + b2[2] * b2[3] - inter; break;
        case 0: denom = area1; break;
        case 1: denom = b2[2] * b2[3]; break;
        default: out[i * m + j] = (float)inter; continue;
      }
      out[i * m + j] = denom > 0 ? (float)(inter / denom) : 0.f;
    }
  }
}

}  // extern "C"
