"""CPU reference path tracer — the validation oracle.

An *independent*, scalar, per-pixel numpy implementation that follows the
reference GLSL control flow literally (loops, breaks, continues —
raytracer.glsl:1986-2105) rather than the wavefront/masked structure of
the device integrator.  It shares exactly two things with the device
path: the counter-based RNG (`rng` with xp=numpy, bit-identical draws)
and the scene data layout.  Agreement between this tracer and the jitted
integrator therefore validates the masked-wavefront re-design, not just
the arithmetic (SURVEY.md §4).

Covers: analytic intersection, DIFF/SPEC/REFR/COAT BSDFs, sphere/SDF/
directional-light NEE, MIS both sides, procedural sky, image textures,
SDF sphere tracing, spectral transport, and homogeneous volumetrics.
Procedural noise textures and ReSTIR are intentionally out of scope
(ReSTIR has no per-pixel scalar equivalent — its correctness is tested
via reservoir-op unit tests and statistical comparisons instead).
"""

from __future__ import annotations

import math

import numpy as np

from raytracer0_tpu import rng
from raytracer0_tpu.config import RenderConfig
from raytracer0_tpu.models.materials import MatType, MeshType, SdfShape

EPS_ONB = 1e-12
PI = 3.14159265
TWO_PI = 6.28318531
FOUR_PI = 12.5663706
RAD = 0.01745329
ONE_OVER_PI = 0.31830989
IOR_AIR = 1.00029


def f32(x):
    return np.float32(x)


def v3(x, y, z):
    return np.array([x, y, z], np.float32)


def normalize(v):
    n = math.sqrt(float(v @ v))
    if n < 1e-12:
        return v * 0.0
    return (v / n).astype(np.float32)


def scene_to_np(scene):
    """Snapshot the Scene pytree as host numpy arrays."""
    class S:
        pass

    s = S()
    for name in ("pos", "joker", "aux", "mesh_type", "sdf_shape", "color", "emission",
                 "ior", "tex_cmask", "tex_emask", "tex_params", "mat_type",
                 "tex_type", "opts", "light_idx", "images", "noise", "cubemap"):
        setattr(s, name, np.asarray(getattr(scene, name)))
    s.num_analytic = scene.num_analytic
    s.num_sdfs = scene.num_sdfs
    s.n = s.pos.shape[0]
    return s


# ---------------------------------------------------------------------------
# sampling (same formulas as ops/sampling.py, scalar)
# ---------------------------------------------------------------------------

def onb(n):
    sig = -1.0 if n[2] < 0.0 else 1.0
    if abs(n[2]) > 0.99999:
        return v3(1, 0, 0), v3(0, sig, 0)
    a = -1.0 / (sig + n[2])
    b = n[0] * n[1] * a
    u = v3(1.0 + sig * n[0] * n[0] * a, sig * b, -sig * n[0])
    v = v3(b, sig + n[1] * n[1] * a, -n[1])
    return u, v


def sample_biased(w, power, u1, u2):
    u, v = onb(w)
    ang = u1 * TWO_PI
    r_y = max(u2, 1e-12) ** (1.0 / (power + 1.0))
    om = math.sqrt(max(1.0 - r_y * r_y, 0.0))
    return normalize(math.cos(ang) * om * u + math.sin(ang) * om * v + r_y * w)


def sample_cone(w, extent, u1, u2):
    u, v = onb(w)
    ang = u1 * TWO_PI
    r_y = 1.0 - u2 * extent
    om = math.sqrt(max(1.0 - r_y * r_y, 0.0))
    return normalize(math.cos(ang) * om * u + math.sin(ang) * om * v + r_y * w)


def random_sphere_direction(u1, u2):
    z = 1.0 - 2.0 * u1
    r = math.sqrt(max(1.0 - z * z, 0.0))
    phi = TWO_PI * u2
    return v3(r * math.cos(phi), r * math.sin(phi), z)


def sample_hg(w, g, u1, u2):
    if abs(g) < 1e-3:
        cos_t = 1.0 - 2.0 * u1
    else:
        sqr = (1.0 - g * g) / (1.0 - g + 2.0 * g * u1)
        cos_t = (1.0 + g * g - sqr * sqr) / (2.0 * g)
    sin_t = math.sqrt(max(1.0 - cos_t * cos_t, 0.0))
    phi = TWO_PI * u2
    t_vec, b_vec = onb(w)
    return normalize(math.cos(phi) * sin_t * t_vec + math.sin(phi) * sin_t * b_vec
                     + cos_t * w)


def hg_phase(cos_theta, g):
    g2 = g * g
    denom = max(1.0 + g2 - 2.0 * g * cos_theta, 1e-6)
    return (1.0 - g2) / (FOUR_PI * denom * math.sqrt(denom))


def reflect(d, n):
    return d - 2.0 * float(d @ n) * n


def refract(d, n, eta):
    cos_i = float(d @ n)
    k = 1.0 - eta * eta * (1.0 - cos_i * cos_i)
    if k < 0.0:
        return None
    return (eta * d - (eta * cos_i + math.sqrt(k)) * n).astype(np.float32)


def schlick(d, n, nc, nt):
    r0 = ((nc - nt) / (nc + nt)) ** 2
    c = min(max(1.0 + float(n @ d), 0.0), 1.0)
    return r0 + (1.0 - r0) * c ** 5


def fresnel(d, n, nc, nt, refr_dir):
    cos_i = float(d @ n)
    cos_t = float(n @ refr_dir)
    rs_den = nc * cos_i + nt * cos_t
    rp_den = nc * cos_t + nt * cos_i
    if abs(rs_den) < 1e-12 or abs(rp_den) < 1e-12:
        return 1.0
    rs = ((nc * cos_i - nt * cos_t) / rs_den) ** 2
    rp = ((nc * cos_t - nt * cos_i) / rp_den) ** 2
    return min(max((rs + rp) * 0.5, 0.0), 1.0)


def power_heuristic(nf, f_pdf, ng, g_pdf):
    f = nf * f_pdf
    g = ng * g_pdf
    denom = f * f + g * g
    if denom <= 0.0:
        return 0.0
    return max(f * f, 0.0) / max(denom, 1e-20)


def cosine_hemisphere_pdf(wi, n):
    return max(0.0, float(wi @ n)) * ONE_OVER_PI


def sphere_light_pdf(light_pos, light_r, x):
    d = light_pos - x
    d2 = float(d @ d)
    r2 = light_r * light_r
    if d2 <= r2 or d2 < 1e-12:
        return 0.0
    cos_max = math.sqrt(max(0.0, 1.0 - r2 / d2))
    denom = 1.0 - cos_max
    if denom < 1e-6:
        return 0.0
    return 1.0 / max(TWO_PI * denom, 1e-12)


# ---------------------------------------------------------------------------
# spectral (scalar mirror of ops/spectral.py)
# ---------------------------------------------------------------------------

def _gauss(l, mu, s_lo, s_hi):
    t = (l - mu) * (s_lo if l < mu else s_hi)
    return math.exp(-0.5 * t * t)


def wavelength_to_rgb(l):
    x = (0.362 * _gauss(l, 442.0, 0.0624, 0.0374)
         + 1.056 * _gauss(l, 599.8, 0.0264, 0.0323)
         - 0.065 * _gauss(l, 501.1, 0.0490, 0.0382))
    y = (0.821 * _gauss(l, 568.8, 0.0213, 0.0247)
         + 0.286 * _gauss(l, 530.9, 0.0613, 0.0322))
    z = (1.217 * _gauss(l, 437.0, 0.0845, 0.0278)
         + 0.681 * _gauss(l, 459.0, 0.0385, 0.0725))
    rgb = v3(3.2404542 * x - 1.5371385 * y - 0.4985314 * z,
             -0.9692660 * x + 1.8760108 * y + 0.0415560 * z,
             0.0556434 * x - 0.2040259 * y + 1.0572252 * z)
    return np.maximum(rgb, 0.0) / v3(0.378, 0.298, 0.285)


def cauchy_ior(lambda_nm, a):
    lu = lambda_nm * 0.001
    return a + 0.04 / max(lu * lu, 1e-6)


# ---------------------------------------------------------------------------
# SDF library (scalar mirror of ops/sdf.py; raytracer.glsl:496-712)
# ---------------------------------------------------------------------------

def _sd_box(p, b):
    d = np.abs(p) - b
    return (np.linalg.norm(np.maximum(d, 0.0))
            + min(max(d[0], max(d[1], d[2])), 0.0))


def _sd_round_box(p, b, r):
    return float(np.linalg.norm(np.maximum(np.abs(p) - b, 0.0)) - r)


def _sd_sphere(p, s):
    return float(np.linalg.norm(p) - s)


def _sd_tri_prism(p, h):
    q = np.abs(p)
    return max(q[2] - h[1], max(q[0] * 0.866025 + p[1] * 0.5, -p[1]) - h[0] * 0.5)


def _sd_cone(p, c):
    q = np.array([math.hypot(p[0], p[2]), p[1]])
    d1 = -q[1] - c[2]
    d2 = max(float(q @ c[:2]), q[1])
    return (np.linalg.norm(np.maximum(np.array([d1, d2]), 0.0))
            + min(max(d1, d2), 0.0))


def _menger(p, scale):
    d = _sd_box(p, scale)
    s = 1.0
    for _ in range(4):
        a = np.mod(p * s, 2.0) - 1.0
        s *= 3.0
        r = np.abs(1.0 - 3.0 * np.abs(a))
        da = max(r[0], r[1]); db = max(r[1], r[2]); dc = max(r[2], r[0])
        c = (min(da, min(db, dc)) - 1.0) / s
        d = max(c, d)
    return d


def _mandelbulb(p):
    """f32 mirror of ops.sdf.mandelbulb (guards included) — GLSL is f32."""
    f = np.float32
    w = p.astype(f).copy()
    m = f(w @ w)
    dz = f(1.0)
    with np.errstate(over="ignore", under="ignore"):
        for _ in range(3):
            m2 = m * m
            m4 = m2 * m2
            dz = f(8.0) * np.sqrt(np.maximum(m4 * m2 * m, f(1e-20))) * dz + f(1.0)
            x, y, z = w[0], w[1], w[2]
            x2, y2, z2 = x * x, y * y, z * z
            x4, y4, z4 = x2 * x2, y2 * y2, z2 * z2
            k3 = x2 + z2
            k2 = f(1.0) / np.sqrt(np.maximum(k3 ** 7, f(1e-20)))
            k1 = x4 + y4 + z4 - f(6.0) * y2 * z2 - f(6.0) * x2 * y2 + f(2.0) * z2 * x2
            k4 = x2 - y2 + z2
            w[0] = p[0] + f(64.0) * x * y * z * (x2 - z2) * k4 * (x4 - f(6.0) * x2 * z2 + z4) * k1 * k2
            w[1] = p[1] + f(-16.0) * y2 * k3 * k4 * k4 + k1 * k1
            w[2] = p[2] + f(-8.0) * y * k4 * (x4 * x4 - f(28.0) * x4 * x2 * z2 + f(70.0) * x4 * z4
                                              - f(28.0) * x2 * z2 * z4 + z4 * z4) * k1 * k2
            m = f(w @ w)
            if m > 4.0:
                break
    m_safe = np.maximum(m, f(1e-12))
    return float(f(0.25) * np.log(m_safe) * np.sqrt(m_safe) / dz)


def _ud_triangle(p, a, b, c):
    """udTriangle (raytracer.glsl:537-554)."""
    ba, pa = b - a, p - a
    cb, pb = c - b, p - b
    ac, pc = a - c, p - c
    nor = np.cross(ba, ac)

    def edge2(e, pv):
        h = min(max(float(e @ pv) / max(float(e @ e), 1e-12), 0.0), 1.0)
        d = e * h - pv
        return float(d @ d)

    sgn = (np.sign(np.cross(ba, nor) @ pa) + np.sign(np.cross(cb, nor) @ pb)
           + np.sign(np.cross(ac, nor) @ pc))
    if sgn < 2.0:
        d2 = min(edge2(ba, pa), edge2(cb, pb), edge2(ac, pc))
    else:
        dn = float(nor @ pa)
        d2 = dn * dn / max(float(nor @ nor), 1e-12)
    return math.sqrt(max(d2, 0.0))


def _ud_quad(p, a, b, c, d):
    """udQuad (raytracer.glsl:556-576)."""
    ba, pa = b - a, p - a
    cb, pb = c - b, p - b
    dc, pc = d - c, p - c
    ad, pd = a - d, p - d
    nor = np.cross(ba, ad)

    def edge2(e, pv):
        h = min(max(float(e @ pv) / max(float(e @ e), 1e-12), 0.0), 1.0)
        dd = e * h - pv
        return float(dd @ dd)

    sgn = (np.sign(np.cross(ba, nor) @ pa) + np.sign(np.cross(cb, nor) @ pb)
           + np.sign(np.cross(dc, nor) @ pc) + np.sign(np.cross(ad, nor) @ pd))
    if sgn < 3.0:
        d2 = min(edge2(ba, pa), edge2(cb, pb), edge2(dc, pc), edge2(ad, pd))
    else:
        dn = float(nor @ pa)
        d2 = dn * dn / max(float(nor @ nor), 1e-12)
    return math.sqrt(max(d2, 0.0))


def sdf_value(s, i, p):
    """Distance of SDF entry i (global mesh index) at point p."""
    shape = int(s.sdf_shape[i])
    q = (p - s.pos[i]).astype(np.float32)
    jk = s.joker[i]
    if shape == SdfShape.BOX:
        return _sd_box(q, jk[:3])
    if shape == SdfShape.ROUND_BOX:
        return _sd_round_box(q, jk[:3], jk[3])
    if shape == SdfShape.SPHERE:
        return _sd_sphere(q, jk[0])
    if shape == SdfShape.TRI_PRISM:
        return _sd_tri_prism(q, jk[:2])
    if shape == SdfShape.CONE:
        return _sd_cone(q, jk[:3])
    if shape == SdfShape.MENGER_SPONGE:
        return _menger(q, jk[:3])
    if shape == SdfShape.MANDELBULB:
        return _mandelbulb(q)
    if shape == SdfShape.TRIANGLE:
        ax = s.aux[i]
        return _ud_triangle(q, ax[0:3], ax[3:6], ax[6:9])
    if shape == SdfShape.QUAD:
        ax = s.aux[i]
        return _ud_quad(q, ax[0:3], ax[3:6], ax[6:9], ax[9:12])
    raise NotImplementedError(f"cpu_ref: sdf shape {shape}")


def sdf_map(s, p):
    """min over SDF entries → (distance, sdf ordinal) (raytracer.glsl:700-712)."""
    best_d = None
    best_i = 0
    for k in range(s.num_sdfs):
        i = s.num_analytic + k
        d = sdf_value(s, i, p)
        if best_d is None or d < best_d:
            best_d = d
            best_i = k
    return best_d, best_i


def sdf_normal(s, p, eps):
    """Tetrahedral 4-tap gradient (raytracer.glsl:714-722)."""
    k = [v3(1, -1, -1), v3(-1, -1, 1), v3(-1, 1, -1), v3(1, 1, 1)]
    n = v3(0, 0, 0)
    for kk in k:
        n = n + kk * sdf_map(s, p + kk * eps)[0]
    return normalize(n)


def sdf_march(s, o, d, tmin, cfg):
    """Sphere trace (raytracer.glsl:974-993)."""
    t = cfg.epsilon * 4.0
    res_i = 0
    for _ in range(cfg.marching_steps):
        dist, res_i = sdf_map(s, o + d * t)
        h = abs(dist)
        if h < cfg.epsilon or t > tmin:
            break
        t += h * cfg.fudge_factor
    # Reference quirk (raytracer.glsl:986): only `t > tmin` rejects — a
    # marching-step-exhausted trace within tmin still reports a hit.
    if t > tmin:
        return None
    n = sdf_normal(s, o + d * t, cfg.epsilon)
    return t, s.num_analytic + res_i, n


# ---------------------------------------------------------------------------
# intersection (scalar mirror of ops/intersect.py; raytracer.glsl:997-1082)
# ---------------------------------------------------------------------------

def intersect(s, o, d, cfg):
    """Returns (t, idx, n, uv, missed)."""
    eps = cfg.epsilon
    tmin = cfg.infinity
    idx = -1
    n_out = v3(0, 0, 0)

    for i in range(s.num_analytic):
        if s.joker[i, 0] == 0.0:
            continue
        mt = int(s.mesh_type[i])
        if mt == MeshType.SPHERE:
            oc = o - s.pos[i]
            b = float(oc @ d)
            c = float(oc @ oc) - s.joker[i, 0] ** 2
            disc = b * b - c
            if disc <= 0.0:
                continue
            sq = math.sqrt(disc)
            t = -b - sq
            if not (t > eps and t < tmin):
                t = -b + sq
            if t > eps and t < tmin:
                tmin = t
                idx = i
        elif mt == MeshType.PLANE:
            denom = float(s.pos[i] @ d)
            if abs(denom) < 1e-12:
                continue
            t = (-s.joker[i, 0] - float(s.pos[i] @ o)) / denom
            if t > eps and t < tmin:
                tmin = t
                idx = i
        elif mt == MeshType.BOX:
            with np.errstate(divide="ignore"):
                m = 1.0 / d
            n_vec = m * (s.pos[i] - o)
            k = np.abs(m) * s.joker[i, 0] * 0.5
            t1 = n_vec - k
            t2 = n_vec + k
            t_near = float(np.max(t1))
            t_far = float(np.min(t2))
            if t_near > t_far or t_far < 0.0:
                continue
            t = t_near if t_near > 0.0 else t_far
            if t > eps and t < tmin:
                tmin = t
                idx = i
                hp = o + d * t - s.pos[i]
                dd = np.abs(hp) - s.joker[i, 0] * 0.5
                step_y = (dd >= np.roll(dd, -1)).astype(np.float32)
                step_z = (dd >= np.roll(dd, -2)).astype(np.float32)
                n_out = normalize(np.sign(hp) * step_y * step_z)

    sdf_is_winner = False
    if s.num_sdfs > 0:
        res = sdf_march(s, o, d, tmin, cfg)
        if res is not None and res[0] < tmin:
            tmin, idx, n_out = res
            sdf_is_winner = True

    if idx < 0:
        return cfg.infinity, 0, v3(0, 0, 0), np.array([-1.0, -1.0], np.float32), True

    pos = o + d * tmin
    mt = int(s.mesh_type[idx])
    uv = None
    if not sdf_is_winner:
        if mt == MeshType.SPHERE:
            rho = max(math.sqrt(float(pos @ pos)), 1e-12)
            phi = math.asin(min(max(pos[1] / rho, -1.0 + 1e-6), 1.0 - 1e-6))
            theta = math.atan2(pos[2], pos[0])
            uv = np.array([phi / PI, theta / TWO_PI], np.float32)
            n_out = normalize(pos - s.pos[idx])
        elif mt == MeshType.PLANE:
            n_out = normalize(s.pos[idx])
    if uv is None:
        na = np.abs(n_out)
        if na[0] > na[1] and na[0] > na[2]:
            uv = np.array([-pos[2], -pos[1]], np.float32)
        elif na[1] > na[0] and na[1] > na[2]:
            uv = np.array([pos[0], pos[2]], np.float32)
        else:
            uv = np.array([pos[0], -pos[1]], np.float32)
    return float(tmin), idx, n_out, uv, False


def get_texel(s, idx, uv, pos):
    """Image textures only (tests use scenes without procedural noise)."""
    tt = int(s.tex_type[idx])
    if tt < 0:
        return np.zeros(4, np.float32)
    if tt <= 3:
        img = s.images[tt]
        h, w = img.shape[0], img.shape[1]
        u = uv[0] - math.floor(uv[0])
        v = uv[1] - math.floor(uv[1])
        x = min(max(u * w - 0.5, 0.0), w - 1.0)
        y = min(max(v * h - 0.5, 0.0), h - 1.0)
        x0, y0 = int(x), int(y)
        x1, y1 = min(x0 + 1, w - 1), min(y0 + 1, h - 1)
        fx, fy = x - x0, y - y0
        return ((img[y0, x0] * (1 - fx) + img[y0, x1] * fx) * (1 - fy)
                + (img[y1, x0] * (1 - fx) + img[y1, x1] * fx) * fy)
    raise NotImplementedError(f"cpu_ref texel type {tt}")


# ---------------------------------------------------------------------------
# direct lighting (raytracer.glsl:1174-1230)
# ---------------------------------------------------------------------------

def direct_light_slot(s, cfg, slot, x, nl, rd, pix, pass_idx, sample_idx, depth):
    li = int(s.light_idx[slot])
    if li < 0:
        return np.zeros(3, np.float32)
    l_mat = int(s.mat_type[li])
    l_type = int(s.mesh_type[li])
    out = np.zeros(3, np.float32)

    if l_mat == MatType.LIGHT:
        u1, u2 = rng.uniform2(pix, pass_idx, sample_idx, depth, slot,
                              rng.Stream.NEE_CONE, xp=np)
        if l_type == MeshType.SPHERE:
            sw = s.pos[li] - x
            d2 = float(sw @ sw)
            r2 = s.joker[li, 0] ** 2
            cos_a_max = math.sqrt(max(1.0 - min(max(r2 / max(d2, 1e-12), 0.0), 1.0), 0.0))
            sr_dir = sample_cone(normalize(sw), 1.0 - cos_a_max, float(u1), float(u2))
            t, hidx, _, huv, missed = intersect(s, x + nl * cfg.epsilon, sr_dir, cfg)
            if not missed and int(s.mat_type[hidx]) == MatType.LIGHT:
                texel = get_texel(s, hidx, huv, x)
                lit_c = np.maximum(s.color[hidx] * (1 - texel[3]) + texel[:3] * texel[3], 0.001)
                weight = 2.0 * (1.0 - cos_a_max)
                t_fog = math.exp(-cfg.vol_sigma_t * t) if cfg.use_volumetrics else 1.0
                out = lit_c * s.emission[hidx] * weight * max(0.001, float(sr_dir @ nl)) * t_fog
        elif l_type == MeshType.SDF:
            su1, su2 = rng.uniform2(pix, pass_idx, sample_idx, depth, slot,
                                    rng.Stream.NEE_SDF_POINT, xp=np)
            ld = s.pos[li] + random_sphere_direction(float(su1), float(su2)) * s.joker[li, :3]
            sr_dir = normalize(ld - x)
            t, hidx, _, huv, missed = intersect(s, x + nl * cfg.epsilon, sr_dir, cfg)
            if not missed and int(s.mat_type[hidx]) == MatType.LIGHT:
                texel = get_texel(s, hidx, huv, x)
                lit_c = np.maximum(s.color[hidx] * (1 - texel[3]) + texel[:3] * texel[3], 0.001)
                out = lit_c * s.emission[hidx] * max(0.001, float(sr_dir @ nl))
    elif l_mat == MatType.DIR_LIGHT:
        ldir = normalize(s.pos[li])
        t, hidx, _, _, missed = intersect(s, x + nl * cfg.epsilon, ldir, cfg)
        if missed:
            out = s.color[li] * s.emission[li] * max(0.001, float(s.pos[li] @ nl))
    return out.astype(np.float32)


def light_pdf_slot(s, slot, x):
    li = int(s.light_idx[slot])
    if li < 0:
        return 0.0
    if int(s.mat_type[li]) != MatType.LIGHT:
        return 0.0
    if int(s.mesh_type[li]) == MeshType.SPHERE:
        return sphere_light_pdf(s.pos[li], float(s.joker[li, 0]), x)
    return 1.0 / FOUR_PI


def procedural_sky(d):
    h = min(max(d[1] * 0.6 + 0.5, 0.3), 1.0)
    return (0.5 + 0.5 * np.cos(TWO_PI * (v3(0.525, 0.408, 0.409)
                                         + v3(0.9, 0.97, 0.8) * h))).astype(np.float32)


# ---------------------------------------------------------------------------
# radiance (raytracer.glsl:1986-2105) — scalar control flow
# ---------------------------------------------------------------------------

def radiance(s, cfg: RenderConfig, o, d, pix, pass_idx, sample_idx, hero_wl):
    acc = np.zeros(3, np.float32)
    mask = np.ones(3, np.float32)
    specular = True
    prev_nl = v3(0, 1, 0)
    n_diff = n_spec = n_scat = 0
    num_lights = int(s.light_idx.shape[0])

    for depth in range(cfg.max_bounces):
        t, idx, n, uv, missed = intersect(s, o, d, cfg)

        if cfg.use_volumetrics:
            u_fp = float(rng.uniform(pix, pass_idx, sample_idx, depth,
                                     rng.Stream.VOL_FREEPATH, xp=np))
            scatter_d = -math.log(max(u_fp, 1e-6)) / cfg.vol_sigma_t
            if scatter_d < min(cfg.infinity, t):
                scatter_pos = o + scatter_d * d
                mask = mask * (cfg.vol_sigma_s / cfg.vol_sigma_t)
                if cfg.sample_lights:
                    for slot in range(num_lights):
                        li = int(s.light_idx[slot])
                        if li < 0 or int(s.mat_type[li]) != MatType.LIGHT \
                                or int(s.mesh_type[li]) != MeshType.SPHERE:
                            continue
                        dl = s.pos[li] - scatter_pos
                        dist = max(float(np.linalg.norm(dl)), 1e-6)
                        r2 = s.joker[li, 0] ** 2
                        cos_a_max = math.sqrt(max(
                            1.0 - min(max(r2 / (dist * dist), 0.0), 1.0), 0.0))
                        u1, u2 = rng.uniform2(pix, pass_idx, sample_idx, depth,
                                              slot, rng.Stream.VOL_NEE, xp=np)
                        dir_l = sample_cone(dl / dist, 1.0 - cos_a_max,
                                            float(u1), float(u2))
                        ts, hidx, _, _, sm = intersect(
                            s, scatter_pos + dir_l * cfg.epsilon * 20.0, dir_l, cfg)
                        if sm or hidx != li:
                            continue
                        omega = 2.0 * (1.0 - cos_a_max)
                        phase = hg_phase(float(d @ dir_l), cfg.vol_g)
                        t_fog = math.exp(-cfg.vol_sigma_t * ts)
                        acc = acc + mask * s.color[li] * s.emission[li] \
                            * phase * t_fog * PI * omega
                hg1, hg2 = rng.uniform2(pix, pass_idx, sample_idx, depth,
                                        rng.Stream.VOL_PHASE, xp=np)
                new_d = sample_hg(d, cfg.vol_g, float(hg1), float(hg2))
                o, d = scatter_pos, new_d
                specular = False
                n_scat += 1
                if n_scat >= cfg.max_scattering_events or float(mask.max()) < 0.01:
                    break
                continue

        if missed:
            if not specular and cfg.sample_lights:
                break
            if cfg.use_procedural_sky:
                acc = acc + mask * procedural_sky(d)
            break

        texel = get_texel(s, idx, uv, o + d * t)
        blend_c = float(s.opts[idx, 0]) * texel[3]
        blend_e = float(s.opts[idx, 1]) * texel[3]
        c = np.maximum(s.color[idx] * (1 - blend_c)
                       + texel[:3] * s.tex_cmask[idx] * blend_c, 0.001)
        e = np.maximum(s.emission[idx] * (1 - blend_e)
                       + texel[:3] * s.tex_emask[idx] * blend_e, 0.001)

        inside = -np.sign(float(d @ n)) or 1.0
        hit_pos = o + d * t
        mat_type = int(s.mat_type[idx])

        if mat_type == MatType.LIGHT:
            mask = mask * c
            mis_w = 1.0
            if cfg.use_mis and not specular and cfg.sample_lights and depth > 0:
                light_dir = normalize(hit_pos - o)
                if int(s.mesh_type[idx]) == MeshType.SPHERE:
                    l_pdf = sphere_light_pdf(s.pos[idx], float(s.joker[idx, 0]), o)
                else:
                    l_pdf = 1.0 / FOUR_PI
                b_pdf = cosine_hemisphere_pdf(light_dir, prev_nl)
                mis_w = power_heuristic(1.0, b_pdf, 1.0, l_pdf)
            acc = acc + mask * e * mis_w
            break

        # ---- brdf (raytracer.glsl:1804-1884) ----
        nl = n * inside
        prev_nl = nl
        u1, u2 = rng.uniform2(pix, pass_idx, sample_idx, depth,
                              rng.Stream.BSDF_DIR, xp=np)
        uc = float(rng.uniform(pix, pass_idx, sample_idx, depth,
                               rng.Stream.BSDF_CHOICE, xp=np))
        if cfg.use_biased_sampling:
            rand_dir = sample_biased(nl, 1.0, float(u1), float(u2))
        else:
            rand_dir = sample_cone(nl, 1.0, float(u1), float(u2))
        roughness = e * rand_dir

        nt = float(s.ior[idx])
        if cfg.use_spectral:
            nt_eff = cauchy_ior(hero_wl, abs(nt)) if nt < 0.0 else nt
        else:
            nt_eff = abs(nt)
        nt_eff = max(nt_eff, 1e-3)
        nc = IOR_AIR

        if mat_type == MatType.DIFF:
            o = hit_pos + nl * cfg.epsilon
            d = rand_dir
            mask = mask * c
            n_diff += 1
            specular = False
        elif mat_type == MatType.SPEC:
            o = hit_pos + nl * cfg.epsilon
            d = normalize(roughness + reflect(d, nl))
            mask = mask * c
            n_spec += 1
            specular = True
        elif mat_type in (MatType.REFR_FRESNEL, MatType.REFR_SCHLICK):
            nnt = nc / nt_eff if inside > 0 else nt_eff / nc
            tdir = refract(d, nl, nnt)
            if tdir is None:  # TIR
                o = hit_pos + nl * cfg.epsilon
                d = normalize(roughness + reflect(d, nl))
                n_spec += 1
                specular = True
            else:
                tdir = normalize(roughness + tdir)
                if mat_type == MatType.REFR_FRESNEL:
                    re = fresnel(d, nl, nc, nt_eff, tdir)
                else:
                    re = schlick(d, nl, nc, nt_eff)
                if uc < re:
                    o = hit_pos + nl * cfg.epsilon
                    d = normalize(roughness + reflect(d, nl))
                    n_spec += 1
                else:
                    o = hit_pos - nl * cfg.epsilon
                    mask = mask * c
                    d = tdir
                    n_scat += 1
                specular = True
        elif mat_type == MatType.COAT:
            o = hit_pos + nl * cfg.epsilon
            if uc < schlick(d, nl, nc, nt_eff):
                d = normalize(roughness + reflect(d, nl))
                n_spec += 1
                specular = True
            else:
                d = rand_dir
                mask = mask * c
                n_diff += 1
                specular = False
        else:
            break  # DIR_LIGHT surface or unknown: terminate

        if not specular and cfg.sample_lights and num_lights > 0:
            for slot in range(num_lights):
                contrib = direct_light_slot(s, cfg, slot, hit_pos, nl, d,
                                            pix, pass_idx, sample_idx, depth)
                if cfg.use_mis:
                    if float(contrib @ contrib) <= 1e-6:
                        continue
                    li = int(s.light_idx[slot])
                    light_dir = normalize(s.pos[li] - hit_pos)
                    l_pdf = light_pdf_slot(s, slot, hit_pos)
                    b_pdf = cosine_hemisphere_pdf(light_dir, nl)
                    contrib = contrib * power_heuristic(1.0, l_pdf, 1.0, b_pdf)
                acc = acc + contrib * mask

        if float(mask.max()) < 0.01:
            break
        if (n_diff >= cfg.max_diff_bounces or n_spec >= cfg.max_spec_bounces
                or n_scat >= cfg.max_scattering_events):
            break

    if cfg.use_spectral:
        acc = acc * wavelength_to_rgb(hero_wl)
    return acc


# ---------------------------------------------------------------------------
# camera + full-frame render (mirror of models/camera.py + renderer.py)
# ---------------------------------------------------------------------------

def tent(r):
    if r >= 0.5:
        h = 1.0 - r
        return -(math.sqrt(max(2.0 * h, 0.0)) - 1.0)
    return math.sqrt(max(2.0 * r, 0.0)) - 1.0


def generate_ray(camera, height, width, row, col, pass_idx, sample_idx):
    pix = np.uint32(row * width + col)
    origin = np.asarray(camera.origin, np.float32)
    lookat = np.asarray(camera.lookat, np.float32)
    fov = float(camera.fov)
    aperture = float(camera.aperture)
    focal = float(camera.focal_length)

    r_aa_x = float(rng.uniform(pix, pass_idx, sample_idx, rng.Stream.AA, xp=np))
    r_aa_y = float(rng.uniform(pix, pass_idx, sample_idx, rng.Stream.AA + 16, xp=np))
    ap1, ap2 = rng.uniform2(pix, pass_idx, sample_idx, rng.Stream.APERTURE, xp=np)

    ys = 2.0 * (row + 0.5) / height - 1.0
    xs = 2.0 * (col + 0.5) / width - 1.0
    aspect = width / height
    v_len = math.tan(fov * RAD * 0.5)
    u_len = aspect * v_len
    w = normalize(lookat)
    u = normalize(np.cross(w, v3(0, 1, 0)))
    v = np.cross(u, w)
    dx = xs + tent(r_aa_x) / (width * 0.5)
    dy = ys + tent(r_aa_y) / (height * 0.5)
    dirn = normalize(dx * u * u_len + dy * v * v_len + w)
    focal_point = dirn * focal
    ang = float(ap1) * TWO_PI
    rad = float(ap2) * aperture
    ap_pos = (math.cos(ang) * u + math.sin(ang) * v) * rad
    return (origin + ap_pos).astype(np.float32), normalize(focal_point - ap_pos)


def animate_positions_np(s, time_s):
    """Scalar mirror of getAnimatedPosition (raytracer.glsl:263-298):
    per-index orbits for meshes 6..14, then the SDF rotate-about-Y + bob
    branch for rows >= num_analytic.  Independent implementation of
    models.scene.animate_positions for oracle parity tests."""
    t = float(time_s)
    pos = s.pos.copy()
    for i in range(s.n):
        p = pos[i].astype(np.float64)
        if 6 <= i <= 14:
            radius = 0.6
            speed = 1.0 + (i - 6) * 0.2
            phase = (i - 6) * 0.7
            p = p + np.array([
                math.cos(t * speed + phase) * radius * 0.3,
                math.sin(t * speed * 2.0 + phase) * 0.1,
                math.sin(t * speed + phase) * radius * 0.3,
            ])
        if i >= s.num_analytic and s.num_sdfs > 0:
            ang = t * 0.5
            ca, sa = math.cos(ang), math.sin(ang)
            p = np.array([p[0] * ca - p[2] * sa,
                          p[1] + math.sin(t * 1.5) * 0.05,
                          p[0] * sa + p[2] * ca])
        pos[i] = p.astype(np.float32)
    s.pos = pos
    return s


def render(scene, camera, cfg: RenderConfig, height, width, passes,
           time_s=0.0):
    """Mean radiance image [H, W, 3] over `passes` (pre-tonemap)."""
    s = scene_to_np(scene)
    if int(cfg.render_mode) == 1:
        s = animate_positions_np(s, time_s)
    out = np.zeros((height, width, 3), np.float32)
    for p in range(passes):
        for row in range(height):
            for col in range(width):
                pix = np.uint32(row * width + col)
                for smp_i in range(cfg.samples_per_pass):
                    o, d = generate_ray(camera, height, width, row, col, p, smp_i)
                    if cfg.use_spectral:
                        hero = 380.0 + 340.0 * float(rng.uniform(
                            pix, p, smp_i, rng.Stream.WAVELENGTH, xp=np))
                    else:
                        hero = 550.0
                    out[row, col] += radiance(s, cfg, o, d, pix, p, smp_i, hero)
    return out / (passes * cfg.samples_per_pass)
