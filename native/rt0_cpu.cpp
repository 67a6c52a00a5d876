// rt0_cpu — native CPU reference path tracer for raytracer0_tpu.
//
// A C++17, dependency-free implementation of the same rendering math as
// cpu_ref/tracer.py (which itself mirrors the reference GLSL control flow,
// raytracer.glsl:1986-2105), sharing the framework's counter-based RNG so
// it traces the *same paths* as the TPU integrator.  Role in the runtime:
//
//   * fast bit-level oracle: validates device renders at resolutions the
//     scalar Python reference cannot reach (it is ~100x faster);
//   * host-side fallback renderer where no accelerator exists.
//
// All arithmetic is float32 to match device numerics (the Python oracle
// promotes through float64 scalars; this one does not).
//
// Exposed C ABI (see cpu_ref/native.py for the ctypes wrapper):
//   rt0_render(scene arrays..., camera..., config..., out[H*W*3])
//
// Covers: analytic primitives, SDF library + sphere tracing,
// DIFF/SPEC/REFR/COAT, NEE (sphere/SDF/directional lights), MIS,
// procedural sky, spectral transport, homogeneous volumetrics.
// Textures are out of scope (oracle use is on texture-free scenes).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <algorithm>

namespace {

constexpr float PI = 3.14159265f;
constexpr float TWO_PI = 6.28318531f;
constexpr float FOUR_PI = 12.5663706f;
constexpr float RAD = 0.01745329f;
constexpr float ONE_OVER_PI = 0.31830989f;
constexpr float IOR_AIR = 1.00029f;

// ---------------------------------------------------------------- vec3
struct V3 {
  float x, y, z;
};
static inline V3 v3(float x, float y, float z) { return {x, y, z}; }
static inline V3 operator+(V3 a, V3 b) { return {a.x + b.x, a.y + b.y, a.z + b.z}; }
static inline V3 operator-(V3 a, V3 b) { return {a.x - b.x, a.y - b.y, a.z - b.z}; }
static inline V3 operator*(V3 a, float s) { return {a.x * s, a.y * s, a.z * s}; }
static inline V3 operator*(V3 a, V3 b) { return {a.x * b.x, a.y * b.y, a.z * b.z}; }
static inline float dot(V3 a, V3 b) { return a.x * b.x + a.y * b.y + a.z * b.z; }
static inline float len(V3 a) { return std::sqrt(std::max(dot(a, a), 0.0f)); }
static inline V3 norm(V3 a) {
  float l = len(a);
  if (l < 1e-12f) return {0, 0, 0};
  return a * (1.0f / l);
}
static inline V3 cross(V3 a, V3 b) {
  return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z, a.x * b.y - a.y * b.x};
}
static inline V3 vmax(V3 a, float s) {
  return {std::max(a.x, s), std::max(a.y, s), std::max(a.z, s)};
}
static inline float clampf(float x, float lo, float hi) {
  return std::min(std::max(x, lo), hi);
}

// ---------------------------------------------------------------- RNG
// Identical to rng.py: PCG-RXS-M-XS hash + keyed fold.
static inline uint32_t pcg(uint32_t x) {
  x = x * 747796405u + 2891336453u;
  x = ((x >> ((x >> 28u) + 4u)) ^ x) * 277803737u;
  return (x >> 22u) ^ x;
}
static const uint32_t CK[5] = {0x9E3779B9u, 0x85EBCA6Bu, 0xC2B2AE35u,
                               0x27D4EB2Fu, 0x165667B1u};

struct Fold {
  uint32_t h = 0x5BD1E995u;
  int i = 0;
  Fold &operator<<(uint32_t c) {
    h = pcg(h + c * CK[i % 5] + (uint32_t)i);
    ++i;
    return *this;
  }
};
static inline float u01(uint32_t h) { return (float)(h >> 8) * (1.0f / 16777216.0f); }

// coordinate pack helper: fold(a, b, c, ...) -> uniform(s)
template <typename... Args>
static uint32_t fold(Args... args) {
  Fold f;
  uint32_t cs[] = {(uint32_t)args...};
  for (uint32_t c : cs) f << c;
  return f.h;
}
template <typename... Args>
static float uniform1(Args... a) { return u01(fold(a...)); }
template <typename... Args>
static void uniform2(float &r1, float &r2, Args... a) {
  uint32_t h = fold(a...);
  r1 = u01(h);
  r2 = u01(pcg(h));
}

// RNG stream ids (rng.Stream)
enum Stream : uint32_t {
  S_AA = 0, S_APERTURE = 1, S_WAVELENGTH = 2, S_BSDF_DIR = 3,
  S_BSDF_CHOICE = 4, S_NEE_CONE = 5, S_NEE_SDF_POINT = 6, S_ENV_DIR = 7,
  S_VOL_FREEPATH = 8, S_VOL_PHASE = 9, S_VOL_NEE = 10,
};

// ---------------------------------------------------------------- scene
enum MatType { M_LIGHT = 0, M_DIR_LIGHT = 1, M_DIFF = 2, M_SPEC = 3,
               M_REFR_FRESNEL = 4, M_REFR_SCHLICK = 5, M_COAT = 6 };
enum MeshType { G_SPHERE = 0, G_PLANE = 1, G_BOX = 2, G_SDF = 3 };
enum SdfShape { SD_BOX = 0, SD_ROUND_BOX = 1, SD_SPHERE = 2, SD_TRI_PRISM = 3,
                SD_CONE = 4, SD_MENGER = 5, SD_MANDELBULB = 6,
                SD_TRIANGLE = 12, SD_QUAD = 13 };

struct Scene {
  int n, num_analytic, num_sdfs, num_lights;
  const float *pos;       // [n,3]
  const float *joker;     // [n,4]
  const float *aux;       // [n,12] triangle/quad vertices rel. to pos
  const int32_t *mesh_type;
  const int32_t *sdf_shape;
  const int32_t *mat_type;
  const float *color;     // [n,3]
  const float *emission;  // [n,3]
  const float *ior;       // [n]
  const int32_t *lights;  // [L]
  V3 p(int i) const { return {pos[3 * i], pos[3 * i + 1], pos[3 * i + 2]}; }
  V3 c(int i) const { return {color[3 * i], color[3 * i + 1], color[3 * i + 2]}; }
  V3 e(int i) const { return {emission[3 * i], emission[3 * i + 1], emission[3 * i + 2]}; }
  const float *jk(int i) const { return joker + 4 * i; }
  const float *ax(int i) const { return aux + 12 * i; }
};

struct Config {
  int max_bounces, max_diff, max_spec, max_scatter, marching_steps;
  float fudge, epsilon, infinity;
  int sample_lights, use_mis, use_biased, use_sky, use_spectral, use_vol;
  float vol_sigma_t, vol_sigma_s, vol_g;
};

// ---------------------------------------------------------------- sdf
static float sd_box(V3 p, V3 b) {
  V3 d = {std::fabs(p.x) - b.x, std::fabs(p.y) - b.y, std::fabs(p.z) - b.z};
  V3 dmax = {std::max(d.x, 0.0f), std::max(d.y, 0.0f), std::max(d.z, 0.0f)};
  return len(dmax) + std::min(std::max(d.x, std::max(d.y, d.z)), 0.0f);
}
static float sd_round_box(V3 p, V3 b, float r) {
  V3 d = {std::max(std::fabs(p.x) - b.x, 0.0f), std::max(std::fabs(p.y) - b.y, 0.0f),
          std::max(std::fabs(p.z) - b.z, 0.0f)};
  return len(d) - r;
}
static float sd_sphere(V3 p, float s) { return len(p) - s; }
static float sd_tri_prism(V3 p, float hx, float hy) {
  V3 q = {std::fabs(p.x), std::fabs(p.y), std::fabs(p.z)};
  return std::max(q.z - hy, std::max(q.x * 0.866025f + p.y * 0.5f, -p.y) - hx * 0.5f);
}
static float sd_cone(V3 p, V3 c) {
  float qx = std::sqrt(p.x * p.x + p.z * p.z);
  float d1 = -p.y - c.z;
  float d2 = std::max(qx * c.x + p.y * c.y, p.y);
  float ox = std::max(d1, 0.0f), oy = std::max(d2, 0.0f);
  return std::sqrt(ox * ox + oy * oy) + std::min(std::max(d1, d2), 0.0f);
}
static float sd_menger(V3 p, V3 scale) {
  float d = sd_box(p, scale);
  float s = 1.0f;
  for (int m = 0; m < 4; ++m) {
    auto md = [](float v) { return v - 2.0f * std::floor(v / 2.0f); };
    V3 a = {md(p.x * s) - 1.0f, md(p.y * s) - 1.0f, md(p.z * s) - 1.0f};
    s *= 3.0f;
    V3 r = {std::fabs(1.0f - 3.0f * std::fabs(a.x)),
            std::fabs(1.0f - 3.0f * std::fabs(a.y)),
            std::fabs(1.0f - 3.0f * std::fabs(a.z))};
    float da = std::max(r.x, r.y), db = std::max(r.y, r.z), dc = std::max(r.z, r.x);
    float c = (std::min(da, std::min(db, dc)) - 1.0f) / s;
    d = std::max(c, d);
  }
  return d;
}
static float sd_mandelbulb(V3 p) {
  V3 w = p;
  float m = dot(w, w), dz = 1.0f;
  for (int i = 0; i < 3; ++i) {
    float m2 = m * m, m4 = m2 * m2;
    dz = 8.0f * std::sqrt(std::max(m4 * m2 * m, 1e-20f)) * dz + 1.0f;
    float x = w.x, y = w.y, z = w.z;
    float x2 = x * x, y2 = y * y, z2 = z * z;
    float x4 = x2 * x2, y4 = y2 * y2, z4 = z2 * z2;
    float k3 = x2 + z2;
    float k2 = 1.0f / std::sqrt(std::max(k3 * k3 * k3 * k3 * k3 * k3 * k3, 1e-20f));
    float k1 = x4 + y4 + z4 - 6.0f * y2 * z2 - 6.0f * x2 * y2 + 2.0f * z2 * x2;
    float k4 = x2 - y2 + z2;
    w.x = p.x + 64.0f * x * y * z * (x2 - z2) * k4 * (x4 - 6.0f * x2 * z2 + z4) * k1 * k2;
    w.y = p.y + -16.0f * y2 * k3 * k4 * k4 + k1 * k1;
    w.z = p.z + -8.0f * y * k4 *
          (x4 * x4 - 28.0f * x4 * x2 * z2 + 70.0f * x4 * z4 - 28.0f * x2 * z2 * z4 + z4 * z4) * k1 * k2;
    m = dot(w, w);
    if (m > 4.0f) break;
  }
  float ms = std::max(m, 1e-12f);
  return 0.25f * std::log(ms) * std::sqrt(ms) / dz;
}

static inline float edge_dist2(V3 e, V3 pv) {
  float ee = dot(e, e);
  float h = std::min(std::max(dot(e, pv) / std::max(ee, 1e-12f), 0.0f), 1.0f);
  V3 d = e * h - pv;
  return dot(d, d);
}
// udTriangle (raytracer.glsl:537-554)
static float ud_triangle(V3 p, V3 a, V3 b, V3 c) {
  V3 ba = b - a, pa = p - a;
  V3 cb = c - b, pb = p - b;
  V3 ac = a - c, pc = p - c;
  V3 nor = cross(ba, ac);
  auto sg = [](float v) { return (v > 0.0f) - (v < 0.0f); };
  float ssum = (float)sg(dot(cross(ba, nor), pa)) +
               (float)sg(dot(cross(cb, nor), pb)) +
               (float)sg(dot(cross(ac, nor), pc));
  float d2;
  if (ssum < 2.0f) {
    d2 = std::min(std::min(edge_dist2(ba, pa), edge_dist2(cb, pb)),
                  edge_dist2(ac, pc));
  } else {
    float dn = dot(nor, pa);
    d2 = dn * dn / std::max(dot(nor, nor), 1e-12f);
  }
  return std::sqrt(std::max(d2, 0.0f));
}
// udQuad (raytracer.glsl:556-576)
static float ud_quad(V3 p, V3 a, V3 b, V3 c, V3 d) {
  V3 ba = b - a, pa = p - a;
  V3 cb = c - b, pb = p - b;
  V3 dc = d - c, pc = p - c;
  V3 ad = a - d, pd = p - d;
  V3 nor = cross(ba, ad);
  auto sg = [](float v) { return (v > 0.0f) - (v < 0.0f); };
  float ssum = (float)sg(dot(cross(ba, nor), pa)) +
               (float)sg(dot(cross(cb, nor), pb)) +
               (float)sg(dot(cross(dc, nor), pc)) +
               (float)sg(dot(cross(ad, nor), pd));
  float d2;
  if (ssum < 3.0f) {
    d2 = std::min(std::min(edge_dist2(ba, pa), edge_dist2(cb, pb)),
                  std::min(edge_dist2(dc, pc), edge_dist2(ad, pd)));
  } else {
    float dn = dot(nor, pa);
    d2 = dn * dn / std::max(dot(nor, nor), 1e-12f);
  }
  return std::sqrt(std::max(d2, 0.0f));
}

static float sdf_value(const Scene &s, int i, V3 p) {
  V3 q = p - s.p(i);
  const float *j = s.jk(i);
  switch (s.sdf_shape[i]) {
    case SD_BOX: return sd_box(q, v3(j[0], j[1], j[2]));
    case SD_ROUND_BOX: return sd_round_box(q, v3(j[0], j[1], j[2]), j[3]);
    case SD_SPHERE: return sd_sphere(q, j[0]);
    case SD_TRI_PRISM: return sd_tri_prism(q, j[0], j[1]);
    case SD_CONE: return sd_cone(q, v3(j[0], j[1], j[2]));
    case SD_MENGER: return sd_menger(q, v3(j[0], j[1], j[2]));
    case SD_MANDELBULB: return sd_mandelbulb(q);
    case SD_TRIANGLE: {
      const float *a = s.ax(i);
      return ud_triangle(q, v3(a[0], a[1], a[2]), v3(a[3], a[4], a[5]),
                         v3(a[6], a[7], a[8]));
    }
    case SD_QUAD: {
      const float *a = s.ax(i);
      return ud_quad(q, v3(a[0], a[1], a[2]), v3(a[3], a[4], a[5]),
                     v3(a[6], a[7], a[8]), v3(a[9], a[10], a[11]));
    }
    default: return 1e9f;
  }
}
static float sdf_map(const Scene &s, V3 p, int &which) {
  float best = 1e30f;
  which = 0;
  for (int k = 0; k < s.num_sdfs; ++k) {
    float d = sdf_value(s, s.num_analytic + k, p);
    if (d < best) { best = d; which = k; }
  }
  return best;
}
static V3 sdf_normal(const Scene &s, V3 p, float eps) {
  static const V3 K[4] = {{1, -1, -1}, {-1, -1, 1}, {-1, 1, -1}, {1, 1, 1}};
  V3 n = {0, 0, 0};
  int w;
  for (auto k : K) n = n + k * sdf_map(s, p + k * eps, w);
  return norm(n);
}

// --------------------------------------------------------- intersection
struct HitInfo {
  float t;
  int idx;
  V3 n;
  bool missed;
};

static HitInfo intersect(const Scene &s, const Config &cfg, V3 o, V3 d) {
  float eps = cfg.epsilon, tmin = cfg.infinity;
  int idx = -1;
  V3 n_out = {0, 0, 0};
  for (int i = 0; i < s.num_analytic; ++i) {
    const float *j = s.jk(i);
    if (j[0] == 0.0f) continue;
    int mt = s.mesh_type[i];
    if (mt == G_SPHERE) {
      V3 oc = o - s.p(i);
      float b = dot(oc, d), c = dot(oc, oc) - j[0] * j[0];
      float disc = b * b - c;
      if (disc <= 0.0f) continue;
      float sq = std::sqrt(disc);
      float t = -b - sq;
      if (!(t > eps && t < tmin)) t = -b + sq;
      if (t > eps && t < tmin) { tmin = t; idx = i; }
    } else if (mt == G_PLANE) {
      float denom = dot(s.p(i), d);
      if (std::fabs(denom) < 1e-12f) continue;
      float t = (-j[0] - dot(s.p(i), o)) / denom;
      if (t > eps && t < tmin) { tmin = t; idx = i; }
    } else if (mt == G_BOX) {
      float tn = -1e30f, tf = 1e30f;
      float half = j[0] * 0.5f;
      const float oc[3] = {o.x, o.y, o.z}, dc[3] = {d.x, d.y, d.z};
      const float pc[3] = {s.p(i).x, s.p(i).y, s.p(i).z};
      bool ok = true;
      for (int c = 0; c < 3 && ok; ++c) {
        float m = 1.0f / (std::fabs(dc[c]) < 1e-12f ? (dc[c] < 0 ? -1e-12f : 1e-12f) : dc[c]);
        float nv = m * (pc[c] - oc[c]);
        float k = std::fabs(m) * half;
        tn = std::max(tn, nv - k);
        tf = std::min(tf, nv + k);
      }
      if (tn > tf || tf < 0.0f) continue;
      float t = tn > 0.0f ? tn : tf;
      if (t > eps && t < tmin) {
        tmin = t;
        idx = i;
        V3 hp = o + d * t - s.p(i);
        float db[3] = {std::fabs(hp.x) - half, std::fabs(hp.y) - half, std::fabs(hp.z) - half};
        V3 n = {0, 0, 0};
        if (db[0] >= db[1] && db[0] >= db[2]) n.x = hp.x < 0 ? -1.0f : 1.0f;
        else if (db[1] >= db[2] && db[1] >= db[0]) n.y = hp.y < 0 ? -1.0f : 1.0f;
        else n.z = hp.z < 0 ? -1.0f : 1.0f;
        n_out = n;
      }
    }
  }
  // SDF march (raytracer.glsl:974-993)
  if (s.num_sdfs > 0) {
    float t = eps * 4.0f;
    int which = 0;
    for (int st = 0; st < cfg.marching_steps; ++st) {
      float dist = sdf_map(s, o + d * t, which);
      float h = std::fabs(dist);
      if (h < eps || t > tmin) break;
      t += h * cfg.fudge;
    }
    if (t <= tmin) {
      tmin = t;
      idx = s.num_analytic + which;
      n_out = sdf_normal(s, o + d * t, eps);
    }
  }

  if (idx < 0) return {cfg.infinity, 0, {0, 0, 0}, true};
  V3 pos = o + d * tmin;
  int mt = s.mesh_type[idx];
  if (mt == G_SPHERE) n_out = norm(pos - s.p(idx));
  else if (mt == G_PLANE) n_out = norm(s.p(idx));
  return {tmin, idx, n_out, false};
}

// ----------------------------------------------------------- sampling
static void onb(V3 n, V3 &u, V3 &v) {
  float sig = n.z < 0.0f ? -1.0f : 1.0f;
  if (std::fabs(n.z) > 0.99999f) { u = {1, 0, 0}; v = {0, sig, 0}; return; }
  float a = -1.0f / (sig + n.z);
  float b = n.x * n.y * a;
  u = {1.0f + sig * n.x * n.x * a, sig * b, -sig * n.x};
  v = {b, sig + n.y * n.y * a, -n.y};
}
static V3 sample_biased(V3 w, float power, float u1, float u2) {
  V3 u, v;
  onb(w, u, v);
  float ang = u1 * TWO_PI;
  float ry = std::pow(std::max(u2, 1e-12f), 1.0f / (power + 1.0f));
  float om = std::sqrt(std::max(1.0f - ry * ry, 0.0f));
  return norm(u * (std::cos(ang) * om) + v * (std::sin(ang) * om) + w * ry);
}
static V3 sample_cone(V3 w, float extent, float u1, float u2) {
  V3 u, v;
  onb(w, u, v);
  float ang = u1 * TWO_PI;
  float ry = 1.0f - u2 * extent;
  float om = std::sqrt(std::max(1.0f - ry * ry, 0.0f));
  return norm(u * (std::cos(ang) * om) + v * (std::sin(ang) * om) + w * ry);
}
static V3 sphere_dir(float u1, float u2) {
  float z = 1.0f - 2.0f * u1;
  float r = std::sqrt(std::max(1.0f - z * z, 0.0f));
  float phi = TWO_PI * u2;
  return {r * std::cos(phi), r * std::sin(phi), z};
}
static V3 sample_hg(V3 w, float g, float u1, float u2) {
  float ct;
  if (std::fabs(g) < 1e-3f) ct = 1.0f - 2.0f * u1;
  else {
    float sq = (1.0f - g * g) / (1.0f - g + 2.0f * g * u1);
    ct = (1.0f + g * g - sq * sq) / (2.0f * g);
  }
  float st = std::sqrt(std::max(1.0f - ct * ct, 0.0f));
  float phi = TWO_PI * u2;
  V3 tv, bv;
  onb(w, tv, bv);
  return norm(tv * (std::cos(phi) * st) + bv * (std::sin(phi) * st) + w * ct);
}
static float hg_phase(float ct, float g) {
  float g2 = g * g;
  float den = std::max(1.0f + g2 - 2.0f * g * ct, 1e-6f);
  return (1.0f - g2) / (FOUR_PI * den * std::sqrt(den));
}
static float schlick(V3 d, V3 n, float nc, float nt) {
  float r0 = (nc - nt) / (nc + nt);
  r0 *= r0;
  float c = clampf(1.0f + dot(n, d), 0.0f, 1.0f);
  return r0 + (1.0f - r0) * c * c * c * c * c;
}
static float fresnel(V3 d, V3 n, float nc, float nt, V3 refr) {
  float ci = dot(d, n), ct = dot(n, refr);
  float rsd = nc * ci + nt * ct, rpd = nc * ct + nt * ci;
  if (std::fabs(rsd) < 1e-12f || std::fabs(rpd) < 1e-12f) return 1.0f;
  float rs = (nc * ci - nt * ct) / rsd, rp = (nc * ct - nt * ci) / rpd;
  return clampf((rs * rs + rp * rp) * 0.5f, 0.0f, 1.0f);
}
static float power_heuristic(float f, float g) {
  float d = f * f + g * g;
  if (d <= 0.0f) return 0.0f;
  return std::max(f * f, 0.0f) / std::max(d, 1e-12f);
}
static float cosine_pdf(V3 wi, V3 n) { return std::max(0.0f, dot(wi, n)) * ONE_OVER_PI; }
static float sphere_light_pdf(V3 lp, float r, V3 x) {
  V3 dv = lp - x;
  float d2 = dot(dv, dv), r2 = r * r;
  if (d2 <= r2 || d2 < 1e-12f) return 0.0f;
  float cm = std::sqrt(std::max(0.0f, 1.0f - r2 / d2));
  float den = 1.0f - cm;
  if (den < 1e-6f) return 0.0f;
  return 1.0f / std::max(TWO_PI * den, 1e-12f);
}

// spectral (Wyman CMF fit)
static float gaussf(float l, float mu, float slo, float shi) {
  float t = (l - mu) * (l < mu ? slo : shi);
  return std::exp(-0.5f * t * t);
}
static V3 wavelength_rgb(float l) {
  float x = 0.362f * gaussf(l, 442.0f, 0.0624f, 0.0374f) +
            1.056f * gaussf(l, 599.8f, 0.0264f, 0.0323f) -
            0.065f * gaussf(l, 501.1f, 0.0490f, 0.0382f);
  float y = 0.821f * gaussf(l, 568.8f, 0.0213f, 0.0247f) +
            0.286f * gaussf(l, 530.9f, 0.0613f, 0.0322f);
  float z = 1.217f * gaussf(l, 437.0f, 0.0845f, 0.0278f) +
            0.681f * gaussf(l, 459.0f, 0.0385f, 0.0725f);
  V3 rgb = {3.2404542f * x - 1.5371385f * y - 0.4985314f * z,
            -0.9692660f * x + 1.8760108f * y + 0.0415560f * z,
            0.0556434f * x - 0.2040259f * y + 1.0572252f * z};
  rgb = {std::max(rgb.x, 0.0f) / 0.378f, std::max(rgb.y, 0.0f) / 0.298f,
         std::max(rgb.z, 0.0f) / 0.285f};
  return rgb;
}
static float cauchy_ior(float l_nm, float a) {
  float lu = l_nm * 0.001f;
  return a + 0.04f / std::max(lu * lu, 1e-6f);
}

// -------------------------------------------------------------- NEE
static V3 direct_light_slot(const Scene &s, const Config &cfg, int slot, V3 x,
                            V3 nl, uint32_t pix, uint32_t pass, uint32_t samp,
                            uint32_t depth) {
  int li = s.lights[slot];
  if (li < 0) return {0, 0, 0};
  int lm = s.mat_type[li], lt = s.mesh_type[li];
  if (lm == M_LIGHT) {
    float u1, u2;
    uniform2(u1, u2, pix, pass, samp, depth, (uint32_t)slot, (uint32_t)S_NEE_CONE);
    if (lt == G_SPHERE) {
      V3 sw = s.p(li) - x;
      float d2 = dot(sw, sw), r2 = s.jk(li)[0] * s.jk(li)[0];
      float cam = std::sqrt(std::max(1.0f - clampf(r2 / std::max(d2, 1e-12f), 0.0f, 1.0f), 0.0f));
      V3 dir = sample_cone(norm(sw), 1.0f - cam, u1, u2);
      HitInfo h = intersect(s, cfg, x + nl * cfg.epsilon, dir);
      if (!h.missed && s.mat_type[h.idx] == M_LIGHT) {
        V3 lc = vmax(s.c(h.idx), 0.001f);
        float w = 2.0f * (1.0f - cam);
        float cw = std::max(0.001f, dot(dir, nl));
        float fog = cfg.use_vol ? std::exp(-cfg.vol_sigma_t * h.t) : 1.0f;
        return lc * s.e(h.idx) * (w * cw * fog);
      }
    } else if (lt == G_SDF) {
      float su1, su2;
      uniform2(su1, su2, pix, pass, samp, depth, (uint32_t)slot, (uint32_t)S_NEE_SDF_POINT);
      const float *j = s.jk(li);
      V3 ld = s.p(li) + sphere_dir(su1, su2) * v3(j[0], j[1], j[2]);
      V3 dir = norm(ld - x);
      HitInfo h = intersect(s, cfg, x + nl * cfg.epsilon, dir);
      if (!h.missed && s.mat_type[h.idx] == M_LIGHT) {
        V3 lc = vmax(s.c(h.idx), 0.001f);
        return lc * s.e(h.idx) * std::max(0.001f, dot(dir, nl));
      }
    }
  } else if (lm == M_DIR_LIGHT) {
    V3 dir = norm(s.p(li));
    HitInfo h = intersect(s, cfg, x + nl * cfg.epsilon, dir);
    if (h.missed) return s.c(li) * s.e(li) * std::max(0.001f, dot(s.p(li), nl));
  }
  return {0, 0, 0};
}

static V3 sky_color(V3 d) {
  float h = clampf(d.y * 0.6f + 0.5f, 0.3f, 1.0f);
  return {0.5f + 0.5f * std::cos(TWO_PI * (0.525f + 0.9f * h)),
          0.5f + 0.5f * std::cos(TWO_PI * (0.408f + 0.97f * h)),
          0.5f + 0.5f * std::cos(TWO_PI * (0.409f + 0.8f * h))};
}

// ----------------------------------------------------------- radiance
static V3 radiance(const Scene &s, const Config &cfg, V3 o, V3 d, uint32_t pix,
                   uint32_t pass, uint32_t samp, float hero) {
  V3 acc = {0, 0, 0}, mask = {1, 1, 1};
  bool specular = true;
  V3 prev_nl = {0, 1, 0};
  int n_diff = 0, n_spec = 0, n_scat = 0;

  for (uint32_t depth = 0; depth < (uint32_t)cfg.max_bounces; ++depth) {
    HitInfo hit = intersect(s, cfg, o, d);

    if (cfg.use_vol) {
      float ufp = uniform1(pix, pass, samp, depth, (uint32_t)S_VOL_FREEPATH);
      float sd = -std::log(std::max(ufp, 1e-6f)) / cfg.vol_sigma_t;
      if (sd < std::min(cfg.infinity, hit.t)) {
        V3 sp = o + d * sd;
        mask = mask * (cfg.vol_sigma_s / cfg.vol_sigma_t);
        if (cfg.sample_lights) {
          for (int slot = 0; slot < s.num_lights; ++slot) {
            int li = s.lights[slot];
            if (li < 0 || s.mat_type[li] != M_LIGHT || s.mesh_type[li] != G_SPHERE) continue;
            V3 dl = s.p(li) - sp;
            float dist = std::max(len(dl), 1e-6f);
            float r2 = s.jk(li)[0] * s.jk(li)[0];
            float cam = std::sqrt(std::max(1.0f - clampf(r2 / (dist * dist), 0.0f, 1.0f), 0.0f));
            float u1, u2;
            uniform2(u1, u2, pix, pass, samp, depth, (uint32_t)slot, (uint32_t)S_VOL_NEE);
            V3 dir = sample_cone(dl * (1.0f / dist), 1.0f - cam, u1, u2);
            HitInfo sh = intersect(s, cfg, sp + dir * (cfg.epsilon * 20.0f), dir);
            if (sh.missed || sh.idx != li) continue;
            float om = 2.0f * (1.0f - cam);
            float ph = hg_phase(dot(d, dir), cfg.vol_g);
            float fog = std::exp(-cfg.vol_sigma_t * sh.t);
            acc = acc + mask * s.c(li) * s.e(li) * (ph * fog * PI * om);
          }
        }
        float h1, h2;
        uniform2(h1, h2, pix, pass, samp, depth, (uint32_t)S_VOL_PHASE);
        o = sp;
        d = sample_hg(d, cfg.vol_g, h1, h2);
        specular = false;
        if (++n_scat >= cfg.max_scatter ||
            std::max(mask.x, std::max(mask.y, mask.z)) < 0.01f) break;
        continue;
      }
    }

    if (hit.missed) {
      if (!specular && cfg.sample_lights) break;
      if (cfg.use_sky) acc = acc + mask * sky_color(d);
      break;
    }

    V3 c = vmax(s.c(hit.idx), 0.001f);
    V3 e = vmax(s.e(hit.idx), 0.001f);
    float inside = dot(d, hit.n) > 0.0f ? -1.0f : 1.0f;
    V3 hp = o + d * hit.t;
    int mt = s.mat_type[hit.idx];

    if (mt == M_LIGHT) {
      mask = mask * c;
      float mis_w = 1.0f;
      if (cfg.use_mis && !specular && cfg.sample_lights && depth > 0) {
        V3 ldir = norm(hp - o);
        float lpdf = s.mesh_type[hit.idx] == G_SPHERE
                         ? sphere_light_pdf(s.p(hit.idx), s.jk(hit.idx)[0], o)
                         : 1.0f / FOUR_PI;
        mis_w = power_heuristic(cosine_pdf(ldir, prev_nl), lpdf);
      }
      acc = acc + mask * e * mis_w;
      break;
    }
    if (mt == M_DIR_LIGHT) break;

    V3 nl = hit.n * inside;
    prev_nl = nl;
    float u1, u2, uc;
    uniform2(u1, u2, pix, pass, samp, depth, (uint32_t)S_BSDF_DIR);
    uc = uniform1(pix, pass, samp, depth, (uint32_t)S_BSDF_CHOICE);
    V3 rand_dir = cfg.use_biased ? sample_biased(nl, 1.0f, u1, u2)
                                 : sample_cone(nl, 1.0f, u1, u2);
    V3 rough = e * rand_dir;

    float nt = s.ior[hit.idx];
    float nt_eff = cfg.use_spectral && nt < 0.0f ? cauchy_ior(hero, std::fabs(nt))
                                                 : std::fabs(nt);
    nt_eff = std::max(nt_eff, 1e-3f);
    float nc = IOR_AIR;

    if (mt == M_DIFF) {
      o = hp + nl * cfg.epsilon;
      d = rand_dir;
      mask = mask * c;
      ++n_diff;
      specular = false;
    } else if (mt == M_SPEC) {
      o = hp + nl * cfg.epsilon;
      d = norm(rough + (d - nl * (2.0f * dot(d, nl))));
      mask = mask * c;
      ++n_spec;
      specular = true;
    } else if (mt == M_REFR_FRESNEL || mt == M_REFR_SCHLICK) {
      float nnt = inside > 0 ? nc / nt_eff : nt_eff / nc;
      float ci = dot(d, nl);
      float k = 1.0f - nnt * nnt * (1.0f - ci * ci);
      if (k < 0.0f) {
        o = hp + nl * cfg.epsilon;
        d = norm(rough + (d - nl * (2.0f * ci)));
        ++n_spec;
        specular = true;
      } else {
        V3 tdir = norm(rough + (d * nnt - nl * (nnt * ci + std::sqrt(k))));
        float re = mt == M_REFR_FRESNEL ? fresnel(d, nl, nc, nt_eff, tdir)
                                        : schlick(d, nl, nc, nt_eff);
        if (uc < re) {
          o = hp + nl * cfg.epsilon;
          d = norm(rough + (d - nl * (2.0f * ci)));
          ++n_spec;
        } else {
          o = hp - nl * cfg.epsilon;
          mask = mask * c;
          d = tdir;
          ++n_scat;
        }
        specular = true;
      }
    } else if (mt == M_COAT) {
      o = hp + nl * cfg.epsilon;
      if (uc < schlick(d, nl, nc, nt_eff)) {
        d = norm(rough + (d - nl * (2.0f * dot(d, nl))));
        ++n_spec;
        specular = true;
      } else {
        d = rand_dir;
        mask = mask * c;
        ++n_diff;
        specular = false;
      }
    } else {
      break;
    }

    if (!specular && cfg.sample_lights && s.num_lights > 0) {
      for (int slot = 0; slot < s.num_lights; ++slot) {
        V3 contrib = direct_light_slot(s, cfg, slot, hp, nl, pix, pass, samp, depth);
        if (cfg.use_mis) {
          if (dot(contrib, contrib) <= 1e-6f) continue;
          int li = s.lights[slot];
          V3 ldir = norm(s.p(li) - hp);
          float lpdf = 0.0f;
          if (s.mat_type[li] == M_LIGHT)
            lpdf = s.mesh_type[li] == G_SPHERE
                       ? sphere_light_pdf(s.p(li), s.jk(li)[0], hp)
                       : 1.0f / FOUR_PI;
          contrib = contrib * power_heuristic(lpdf, cosine_pdf(ldir, nl));
        }
        acc = acc + contrib * mask;
      }
    }

    if (std::max(mask.x, std::max(mask.y, mask.z)) < 0.01f) break;
    if (n_diff >= cfg.max_diff || n_spec >= cfg.max_spec || n_scat >= cfg.max_scatter)
      break;
  }

  if (cfg.use_spectral) acc = acc * wavelength_rgb(hero);
  return acc;
}

// --------------------------------------------------------------- camera
static float tentf(float r) {
  if (r >= 0.5f) {
    float h = 1.0f - r;
    return -(std::sqrt(std::max(2.0f * h, 0.0f)) - 1.0f);
  }
  return std::sqrt(std::max(2.0f * r, 0.0f)) - 1.0f;
}

}  // namespace

extern "C" {

// Renders `passes` spp and writes the mean radiance (pre-tonemap) into
// out[H*W*3], row 0 = image bottom (gl_FragCoord convention).
void rt0_render(
    // scene
    int n, int num_analytic, int num_sdfs,
    const float *pos, const float *joker, const float *aux,
    const int32_t *mesh_type,
    const int32_t *sdf_shape, const int32_t *mat_type, const float *color,
    const float *emission, const float *ior, const int32_t *lights,
    int num_lights,
    // camera
    const float *cam_origin, const float *cam_lookat, float fov,
    float aperture, float focal,
    // config
    int max_bounces, int max_diff, int max_spec, int max_scatter,
    int marching_steps, float fudge, float epsilon, float infinity,
    int sample_lights, int use_mis, int use_biased, int use_sky,
    int use_spectral, int use_vol, float vol_sigma_t, float vol_sigma_s,
    float vol_g, int spp,
    // image
    int height, int width, int passes, float *out) {
  Scene s{n, num_analytic, num_sdfs, num_lights, pos, joker, aux, mesh_type,
          sdf_shape, mat_type, color, emission, ior, lights};
  Config cfg{max_bounces, max_diff, max_spec, max_scatter, marching_steps,
             fudge, epsilon, infinity, sample_lights, use_mis, use_biased,
             use_sky, use_spectral, use_vol, vol_sigma_t, vol_sigma_s, vol_g};

  V3 origin = {cam_origin[0], cam_origin[1], cam_origin[2]};
  V3 lookat = {cam_lookat[0], cam_lookat[1], cam_lookat[2]};
  V3 w = norm(lookat);
  V3 u = norm(cross(w, v3(0, 1, 0)));
  V3 v = cross(u, w);
  float vlen = std::tan(fov * RAD * 0.5f);
  float ulen = (float)width / (float)height * vlen;

  std::memset(out, 0, sizeof(float) * height * width * 3);

  for (int p = 0; p < passes; ++p) {
    for (int row = 0; row < height; ++row) {
      for (int col = 0; col < width; ++col) {
        uint32_t pix = (uint32_t)(row * width + col);
        for (int sp = 0; sp < spp; ++sp) {
          float rx = uniform1(pix, (uint32_t)p, (uint32_t)sp, (uint32_t)S_AA);
          float ry = uniform1(pix, (uint32_t)p, (uint32_t)sp, (uint32_t)(S_AA + 16));
          float a1, a2;
          uniform2(a1, a2, pix, (uint32_t)p, (uint32_t)sp, (uint32_t)S_APERTURE);

          float ys = 2.0f * (row + 0.5f) / height - 1.0f;
          float xs = 2.0f * (col + 0.5f) / width - 1.0f;
          float dx = xs + tentf(rx) / (width * 0.5f);
          float dy = ys + tentf(ry) / (height * 0.5f);
          V3 dirn = norm(u * (dx * ulen) + v * (dy * vlen) + w);
          V3 fp = dirn * focal;
          float ang = a1 * TWO_PI, rad = a2 * aperture;
          V3 ap = (u * std::cos(ang) + v * std::sin(ang)) * rad;
          V3 o = origin + ap;
          V3 d = norm(fp - ap);

          float hero = 550.0f;
          if (use_spectral)
            hero = 380.0f + 340.0f * uniform1(pix, (uint32_t)p, (uint32_t)sp,
                                              (uint32_t)S_WAVELENGTH);
          V3 r = radiance(s, cfg, o, d, pix, (uint32_t)p, (uint32_t)sp, hero);
          float *px = out + 3 * (row * width + col);
          px[0] += r.x;
          px[1] += r.y;
          px[2] += r.z;
        }
      }
    }
  }
  float scale = 1.0f / (float)(passes * spp);
  for (int i = 0; i < height * width * 3; ++i) out[i] *= scale;
}

}  // extern "C"
