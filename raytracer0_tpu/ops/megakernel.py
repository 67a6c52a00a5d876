"""Pallas megakernels: the entire bounce loop (and its adjoint) in fused
TPU kernels.

The XLA wavefront integrator round-trips per-pixel state through HBM at
every fusion boundary (~95 ms forward at 512x12 bounces on v5e).  These
kernels keep ALL per-lane path state — ray, throughput, accumulator,
counters — in VMEM/registers for the whole `max_bounces` loop: HBM
traffic collapses to reading the primary rays once and writing radiance
(or gradients) once.  It is the speed-of-light realization of the
reference's GLSL megakernel (raytracer.glsl:1986-2105) for the analytic
scene class.  Measured: 6.7 ms forward at 512^2 x 12 bounces (14x the
XLA path).

Layout: pure SoA — every quantity is a `[BLOCK_ROWS, W]` f32/i32/u32
block, vectors are python triples of blocks (VPU-native; no trailing
length-3 axis).  Scene parameters live in SMEM as a small f32 table; all
type dispatch (primitive type, material type, light slots) is resolved
at trace time from the scene's static structure, exactly like the
reference's codegen constant folding.

Coverage (static preconditions, `supported()`): analytic primitives,
the SDF shape library, DIFF/SPEC/REFR/COAT, NEE + MIS (all three
reference light samplers in-kernel since round 5: sphere cone, SDF
bounding-ellipsoid point, directional occlusion-to-infinity),
procedural sky, hero-wavelength spectral transport (Cauchy dispersion
in-kernel, CMF RGB conversion outside), homogeneous participating media
(free-path sampling, HG in-scatter NEE, fog-attenuated shadow rays),
and CHECK/RIPPLE on spheres (polynomial spherical UV) — i.e. BASELINE
configs 1-3 and 5.  ReSTIR runs *fused* (round 4,
`trace_forward_restir_fused`): all four reservoir phases + reservoir
shading inside the bounce loop with a 5-channel state export —
full-grid, row-band (tile mode), and per-shard (multi-chip) launches.
Image textures and photographic cubemaps run as split kernels with
deferred-record resolution; gloss-coupled image textures run on the
suffix-resume split (round 5, `trace_forward_gloss`).  RNG is the same
counter hash, so these kernels are *bit-compatible* with
`integrator.trace` and validated against it per-pixel.

Gradients: the backward pass is its own Pallas kernel.  The bounce loop
is a pure function of (scene table, primary ray) per block, so the
backward kernel replays it block-resident under `jax.vjp` (RNG is
counter-based, replay is exact) and XLA-transposed ops produce AD-exact
gradients w.r.t. scene parameters and primary rays — no hand-derived
adjoints, no HBM residuals.  The default plain-path adjoint is the
round-5 *per-slot stash* kernel (`_bwd_slotted_kernel_body`): forward
sweep stashes each live bounce's input carry in VMEM and stops at the
block's last live bounce, backward sweep vjp's ONE bounce per live slot
— dead tail slots skip both sweeps (bwd/fwd 1.62 vs 2.25 whole-graph at
12 bounces).  The fused ReSTIR kernel has its own adjoint
(`_fused_restir_call` custom_vjp) with taps/history as differentiable
inputs.  Per-mesh parameter gradients are accumulated across the
sequential TPU grid into one SMEM table.
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracer0_tpu import rng as rng_mod
from raytracer0_tpu.config import RenderConfig, RenderMode
from raytracer0_tpu.models.materials import MatType, MeshType, SdfShape, TexType

BLOCK_ROWS = 8
BLOCK_COLS = 128

PI = 3.14159265
TWO_PI = 6.28318531
ONE_OVER_PI = 0.31830989
FOUR_PI = 12.5663706
IOR_AIR = 1.00029

_M1 = np.uint32(747796405)
_A1 = np.uint32(2891336453)
_M2 = np.uint32(277803737)
_CK = rng_mod._CK
_SEED0 = np.uint32(0x5BD1E995)
_INV = np.float32(1.0 / (1 << 24))


# ----------------------------------------------------------------------
# in-kernel counter RNG (bit-identical to rng.py)
# ----------------------------------------------------------------------

def _pcg(x):
    x = x * _M1 + _A1
    x = ((x >> ((x >> np.uint32(28)) + np.uint32(4))) ^ x) * _M2
    return (x >> np.uint32(22)) ^ x


def _fold(*coords):
    h = jnp.uint32(_SEED0)
    for i, c in enumerate(coords):
        # always lift to a jnp uint32 so the multiply wraps silently on
        # device instead of overflowing a numpy scalar at trace time
        c = jnp.asarray(c).astype(jnp.uint32)
        h = _pcg(h + c * _CK[i % len(_CK)] + np.uint32(i))
    return h


def _u01(h):
    # Mosaic lacks a direct u32->f32 cast; the top-24-bit value fits in
    # int32, so round-trip through it (bit-exact with rng.uniform_from_bits).
    return (h >> np.uint32(8)).astype(jnp.int32).astype(jnp.float32) * _INV


def _uniform(*coords):
    return _u01(_fold(*coords))


def _uniform2(*coords):
    h = _fold(*coords)
    return _u01(h), _u01(_pcg(h))


# ----------------------------------------------------------------------
# in-kernel procedural textures (ops/textures.get_texel semantics,
# raytracer.glsl:726-772) on component tuples.
#
# The noise LUT *is* counter-hash data — rng.noise_lut(size=256, seed=7)
# fills texel (row, col, ch) with uniform(row, col, ch, 7) (rng.py:
# 132-142) — so the kernel recomputes texels pointwise with the same
# hash instead of gathering: Mosaic has no per-lane VMEM gather, and the
# recomputation is bit-identical to the XLA path's LUT fetch.
# ----------------------------------------------------------------------

#: Texture types the kernel evaluates; IMAGE0-3 stay on the XLA path
#: (real image data needs per-lane gathers).
_TEX_KERNEL_OK = frozenset(int(t) for t in (
    TexType.CHECK, TexType.RIPPLE, TexType.VORONOI,
    TexType.GRADIENT_NOISE, TexType.VALUE_NOISE, TexType.METAL))
#: UV-based types.  Spheres carrying CHECK/RIPPLE evaluate the
#: spherical UV in-kernel via polynomial asin/atan2 (round 5); image
#: types on spheres resolve their UVs host-side on the deferred split.
_TEX_UV_TYPES = frozenset((int(TexType.CHECK), int(TexType.RIPPLE),
                           int(TexType.IMAGE0), int(TexType.IMAGE1),
                           int(TexType.IMAGE2), int(TexType.IMAGE3)))


def _lut_texel(y, x, ch):
    """rng.noise_lut texel via hash recompute; y/x int32 in [0, 256)."""
    return _uniform(y, x, np.uint32(ch), np.uint32(7))


def _lut_bilinear_k(u, v, ch):
    """ops/noise._lut_bilinear single-channel fetch (REPEAT wrap)."""
    x0f = jnp.floor(u)
    y0f = jnp.floor(v)
    fx = u - x0f
    fy = v - y0f
    x0 = x0f.astype(jnp.int32) & 255
    y0 = y0f.astype(jnp.int32) & 255
    x1 = (x0 + 1) & 255
    y1 = (y0 + 1) & 255
    c00 = _lut_texel(y0, x0, ch)
    c01 = _lut_texel(y0, x1, ch)
    c10 = _lut_texel(y1, x0, ch)
    c11 = _lut_texel(y1, x1, ch)
    return (c00 * (1 - fx) + c01 * fx) * (1 - fy) + \
        (c10 * (1 - fx) + c11 * fx) * fy


def _value_noise_k(p):
    """ops/noise.value_noise (raytracer.glsl:393-401)."""
    i0, i1, i2 = jnp.floor(p[0]), jnp.floor(p[1]), jnp.floor(p[2])
    f0, f1, f2 = p[0] - i0, p[1] - i1, p[2] - i2
    f0 = f0 * f0 * (3.0 - 2.0 * f0)
    f1 = f1 * f1 * (3.0 - 2.0 * f1)
    f2 = f2 * f2 * (3.0 - 2.0 * f2)
    u = (i0 + 37.0 * i2) + f0
    v = (i1 + 17.0 * i2) + f1
    g = _lut_bilinear_k(u, v, 1)
    r = _lut_bilinear_k(u, v, 0)
    return g + (r - g) * f2


def _metal_fbm_k(q):
    """ops/noise.metal_fbm (raytracer.glsl:762-768)."""
    m = (-1.2, 1.99, -1.6)
    f = 0.5 * _value_noise_k(q)
    q = (m[0] * q[0] * 2.01, m[1] * q[1] * 2.01, m[2] * q[2] * 2.01)
    f = f + 0.25 * _value_noise_k(q)
    q = (m[0] * q[0] * 2.02, m[1] * q[1] * 2.02, m[2] * q[2] * 2.02)
    return f + 0.125 * _value_noise_k(q)


def _voronoi_k(x):
    """ops/noise.voronoi (raytracer.glsl:404-433) → (sqrt F1, sqrt F2, id)."""
    p0, p1, p2 = jnp.floor(x[0]), jnp.floor(x[1]), jnp.floor(x[2])
    f0, f1c, f2c = x[0] - p0, x[1] - p1, x[2] - p2
    F1 = jnp.full_like(x[0], 100.0)
    F2 = jnp.full_like(x[0], 100.0)
    cid = jnp.zeros_like(x[0])
    for k in (-1.0, 0.0, 1.0):
        for j in (-1.0, 0.0, 1.0):
            for i in (-1.0, 0.0, 1.0):
                h0, h1, h2 = p0 + i, p1 + j, p2 + k
                tx = jnp.floor(h0 + 3.0 * h2).astype(jnp.int32) & 255
                ty = jnp.floor(h1 + 1.0 * h2).astype(jnp.int32) & 255
                r0 = i - f0 + _lut_texel(ty, tx, 0)
                r1 = j - f1c + _lut_texel(ty, tx, 1)
                r2 = k - f2c + _lut_texel(ty, tx, 2)
                d = r0 * r0 + r1 * r1 + r2 * r2
                new_id = jnp.abs(h0 + h1 * 57.0 + h2 * 113.0)
                closer = d < F1
                F2 = jnp.where(closer, F1, jnp.where(d < F2, d, F2))
                cid = jnp.where(closer, new_id, cid)
                F1 = jnp.where(closer, d, F1)
    return jnp.sqrt(F1), jnp.sqrt(F2), cid


def _sky_palette_k(h):
    """Cosine-palette sky from elevation factor h (raytracer.glsl:2062)."""
    return (0.5 + 0.5 * jnp.cos(TWO_PI * (0.525 + 0.9 * h)),
            0.5 + 0.5 * jnp.cos(TWO_PI * (0.408 + 0.97 * h)),
            0.5 + 0.5 * jnp.cos(TWO_PI * (0.409 + 0.8 * h)))


def _proc_cubemap_sample(d, size):
    """Bilinear sample of the *procedural* default cubemap
    (sky.default_cubemap): baked texels are formula data — the palette at
    the texel-center direction — so the kernel recomputes the 4 bilinear
    taps instead of gathering (same trick as the noise LUT).  Matches
    sky.sample_cubemap on the baked faces to f32 cos/rsqrt ULPs."""
    x, y, z = d
    ax, ay, az = jnp.abs(x), jnp.abs(y), jnp.abs(z)
    x_major = (ax >= ay) & (ax >= az)
    y_major = (ay > ax) & (ay >= az)
    face = jnp.where(
        x_major, jnp.where(x > 0, 0, 1),
        jnp.where(y_major, jnp.where(y > 0, 2, 3),
                  jnp.where(z > 0, 4, 5))).astype(jnp.int32)
    ma = jnp.maximum(jnp.where(x_major, ax, jnp.where(y_major, ay, az)),
                     1e-9)
    sc = jnp.where(x_major, jnp.where(x > 0, -z, z),
                   jnp.where(y_major, x, jnp.where(z > 0, x, -x)))
    tc = jnp.where(x_major, -y,
                   jnp.where(y_major, jnp.where(y > 0, z, -z), -y))
    u = 0.5 * (sc / ma + 1.0)
    v = 0.5 * (tc / ma + 1.0)

    w = jnp.float32(size)
    xpix = jnp.clip(u * w - 0.5, 0.0, w - 1.0)
    ypix = jnp.clip(v * w - 0.5, 0.0, w - 1.0)
    x0 = jnp.floor(xpix)
    y0 = jnp.floor(ypix)
    fx = xpix - x0
    fy = ypix - y0
    x1 = jnp.minimum(x0 + 1.0, w - 1.0)
    y1 = jnp.minimum(y0 + 1.0, w - 1.0)

    def texel(xi, yi):
        # texel-center direction per face (sky.default_cubemap:34-45)
        s = (xi + 0.5) / w * 2.0 - 1.0
        t = (yi + 0.5) / w * 2.0 - 1.0
        is0 = face == 0
        is1 = face == 1
        is2 = face == 2
        is3 = face == 3
        is4 = face == 4
        dx = jnp.where(is0, 1.0, jnp.where(is1, -1.0,
             jnp.where(is2 | is3 | is4, s, -s)))
        dy = jnp.where(is2, 1.0, jnp.where(is3, -1.0, -t))
        dz = jnp.where(is0, -s, jnp.where(is1, s,
             jnp.where(is2, t, jnp.where(is3, -t,
             jnp.where(is4, 1.0, -1.0)))))
        inv = 1.0 / jnp.sqrt(dx * dx + dy * dy + dz * dz)
        h = jnp.clip(dy * inv * 0.6 + 0.5, 0.3, 1.0)
        return _sky_palette_k(h)

    c00 = texel(x0, y0)
    c01 = texel(x1, y0)
    c10 = texel(x0, y1)
    c11 = texel(x1, y1)
    return tuple(
        (c00[k] * (1 - fx) + c01[k] * fx) * (1 - fy)
        + (c10[k] * (1 - fx) + c11[k] * fx) * fy
        for k in range(3))


def _gradient_hash_k(p):
    """iq's sin gradient hash (ops/noise._gradient_hash)."""
    d0 = p[0] * 127.1 + p[1] * 311.7 + p[2] * 74.7
    d1 = p[0] * 269.5 + p[1] * 183.3 + p[2] * 246.1
    d2 = p[0] * 113.5 + p[1] * 271.9 + p[2] * 124.6
    s0 = jnp.sin(d0) * 43758.5453
    s1 = jnp.sin(d1) * 43758.5453
    s2 = jnp.sin(d2) * 43758.5453
    return (-1.0 + 2.0 * (s0 - jnp.floor(s0)),
            -1.0 + 2.0 * (s1 - jnp.floor(s1)),
            -1.0 + 2.0 * (s2 - jnp.floor(s2)))


def _gradient_noise_k(p):
    """ops/noise.gradient_noise (raytracer.glsl:371-385)."""
    i = (jnp.floor(p[0]), jnp.floor(p[1]), jnp.floor(p[2]))
    f = (p[0] - i[0], p[1] - i[1], p[2] - i[2])
    u = tuple(t * t * (3.0 - 2.0 * t) for t in f)

    def g(ox, oy, oz):
        gh = _gradient_hash_k((i[0] + ox, i[1] + oy, i[2] + oz))
        return (gh[0] * (f[0] - ox) + gh[1] * (f[1] - oy)
                + gh[2] * (f[2] - oz))

    lerp = lambda a, b, t: a + (b - a) * t
    return lerp(
        lerp(lerp(g(0.0, 0.0, 0.0), g(1.0, 0.0, 0.0), u[0]),
             lerp(g(0.0, 1.0, 0.0), g(1.0, 1.0, 0.0), u[0]), u[1]),
        lerp(lerp(g(0.0, 0.0, 1.0), g(1.0, 0.0, 1.0), u[0]),
             lerp(g(0.0, 1.0, 1.0), g(1.0, 1.0, 1.0), u[0]), u[1]),
        u[2])


# ----------------------------------------------------------------------
# component-tuple vector helpers ([R, W] blocks)
# ----------------------------------------------------------------------

def _dot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _add(a, b):
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def _sub(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def _mul(a, b):
    return (a[0] * b[0], a[1] * b[1], a[2] * b[2])


def _scale(a, s):
    return (a[0] * s, a[1] * s, a[2] * s)


def _where3(c, a, b):
    return (jnp.where(c, a[0], b[0]), jnp.where(c, a[1], b[1]),
            jnp.where(c, a[2], b[2]))


def _safe_sqrt(x):
    pos = x > 0.0
    return jnp.where(pos, jnp.sqrt(jnp.where(pos, x, 1.0)), 0.0)


def _atan_poly(t):
    """atan(t) on [0, 1]: Hart's 8-term odd minimax (max err ~1e-7 rad).
    Mosaic has no atan/atan2 lowering (verified unimplemented on v5e
    r5), so spherical UVs evaluate this polynomial instead."""
    s = t * t
    p = -0.0040540580
    for c in (0.0218612288, -0.0559098861, 0.0964200441, -0.1390853351,
              0.1994653599, -0.3332985605, 0.9999993329):
        p = p * s + c
    return t * p


def _atan2_k(y, x):
    """Four-quadrant atan2 via range reduction + `_atan_poly`; matches
    jnp.arctan2 to ~1e-7 rad (exact at y == 0: +0 maps to +pi for
    x < 0, like XLA)."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    swap = ay > ax
    num = jnp.minimum(ax, ay)
    den = jnp.maximum(jnp.maximum(ax, ay), 1e-30)
    r = _atan_poly(num / den)
    r = jnp.where(swap, PI * 0.5 - r, r)
    r = jnp.where(x < 0.0, PI - r, r)
    return jnp.where(y < 0.0, -r, r)


def _asin_k(v):
    """asin(v) = atan2(v, sqrt(1 - v^2)); callers clip |v| < 1."""
    return _atan2_k(v, jnp.sqrt(jnp.maximum(1.0 - v * v, 0.0)))


def _normalize(a):
    inv = jax.lax.rsqrt(jnp.maximum(_dot(a, a), 1e-12))
    return _scale(a, inv)


def _reflect(d, n):
    k = 2.0 * _dot(d, n)
    return (d[0] - k * n[0], d[1] - k * n[1], d[2] - k * n[2])


def _onb(n):
    """Duff et al. branch-free ONB (vecmath.onb semantics)."""
    sig = jnp.where(n[2] < 0.0, -1.0, 1.0)
    denom = sig + n[2]
    a = -1.0 / jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    b = n[0] * n[1] * a
    u = (1.0 + sig * n[0] * n[0] * a, sig * b, -sig * n[0])
    v = (b, sig + n[1] * n[1] * a, -n[1])
    degen = jnp.abs(n[2]) > 0.99999
    zeros = jnp.zeros_like(n[0])
    u = _where3(degen, (jnp.ones_like(n[0]), zeros, zeros), u)
    v = _where3(degen, (zeros, sig, zeros), v)
    return u, v


def _sample_biased(w, u1, u2):
    """Cosine-weighted hemisphere (sampling.sample_biased, power=1)."""
    u, v = _onb(w)
    ang = u1 * TWO_PI
    r_y = jnp.sqrt(jnp.maximum(u2, 1e-12))  # u2 ** (1/2)
    om = _safe_sqrt(1.0 - r_y * r_y)
    ca, sa = jnp.cos(ang) * om, jnp.sin(ang) * om
    return _normalize((ca * u[0] + sa * v[0] + r_y * w[0],
                       ca * u[1] + sa * v[1] + r_y * w[1],
                       ca * u[2] + sa * v[2] + r_y * w[2]))


def _sample_cone(w, extent, u1, u2):
    u, v = _onb(w)
    ang = u1 * TWO_PI
    r_y = 1.0 - u2 * extent
    om = _safe_sqrt(1.0 - r_y * r_y)
    ca, sa = jnp.cos(ang) * om, jnp.sin(ang) * om
    return _normalize((ca * u[0] + sa * v[0] + r_y * w[0],
                       ca * u[1] + sa * v[1] + r_y * w[1],
                       ca * u[2] + sa * v[2] + r_y * w[2]))


def _sample_hg(w, g, u1, u2):
    """Henyey-Greenstein importance sampling (sampling.sample_hg,
    raytracer.glsl:1157-1171).  `g` is a python float (config constant),
    so the isotropic branch resolves at trace time."""
    if abs(g) < 1e-3:
        cos_t = 1.0 - 2.0 * u1
    else:
        sqr = (1.0 - g * g) / (1.0 - g + 2.0 * g * u1)
        cos_t = (1.0 + g * g - sqr * sqr) / (2.0 * g)
    sin_t = _safe_sqrt(1.0 - cos_t * cos_t)
    phi = TWO_PI * u2
    t, b = _onb(w)
    cp = jnp.cos(phi) * sin_t
    sp = jnp.sin(phi) * sin_t
    d = (cp * t[0] + sp * b[0] + cos_t * w[0],
         cp * t[1] + sp * b[1] + cos_t * w[1],
         cp * t[2] + sp * b[2] + cos_t * w[2])
    return _normalize(d)


def _hg_phase(cos_theta, g):
    """HG phase value (sampling.hg_phase, raytracer.glsl:2032-2037)."""
    g2 = g * g
    denom = jnp.maximum(1.0 + g2 - 2.0 * g * cos_theta, 1e-6)
    return (1.0 - g2) / (FOUR_PI * denom * jnp.sqrt(denom))


def _hero_wavelength(pix, pass_u, samp_u):
    """λ = u*340 + 380 nm from the WAVELENGTH stream (spectral.py,
    raytracer.glsl:2122-2124) — bit-identical to the XLA path's draw."""
    u = _uniform(pix, pass_u, samp_u, np.uint32(rng_mod.Stream.WAVELENGTH))
    return u * 340.0 + 380.0


def _power_heuristic(f, g):
    f2 = f * f
    g2 = g * g
    denom = f2 + g2
    return jnp.where(denom > 0.0, jnp.maximum(f2, 0.0) /
                     jnp.maximum(denom, 1e-12), 0.0)


_SDF_SHAPES_OK = frozenset(int(s) for s in SdfShape)


def _textures_supported(scene) -> bool:
    """Kernel texture coverage: procedural types evaluate in-kernel via
    the hash-recomputed LUT; image textures and UV-textured *spheres*
    (spherical UV needs asin/atan2) route to the XLA path."""
    if not scene.tex_types_used:
        return True
    tts = scene.tex_types_static
    opts = scene.opts_static
    if len(tts) != len(scene.mesh_types_static) or len(opts) != len(tts):
        return False  # scene built without static texture structure
    for i, tt in enumerate(tts):
        if tt == int(TexType.NONE) or not (opts[i][0] or opts[i][1]):
            continue  # never blended — dead texture slot
        if tt not in _TEX_KERNEL_OK:
            return False
        # UV-textured spheres run in-kernel since round 5 (spherical UV
        # via polynomial asin/atan2); image types were already excluded
        # by _TEX_KERNEL_OK above and take the deferred split instead.
    return True


def _geometry_supported(scene, check_textures=True,
                        sphere_lights_only=False) -> bool:
    """Scene-side support: primitive set, SDF shapes, light slots.

    Plain-path NEE covers all three reference light samplers in-kernel
    (sphere cone / SDF bounding-ellipsoid point / directional occlusion,
    raytracer.glsl:1182-1227 — round 5, VERDICT r4 next #4).  The ReSTIR
    kernels' target function and reservoir shading remain analytic-
    sphere-only, so they pass `sphere_lights_only=True`."""
    na = scene.num_analytic
    analytic_ok = all(
        t in (int(MeshType.SPHERE), int(MeshType.PLANE), int(MeshType.BOX))
        for t in scene.mesh_types_static[:na])
    sdf_ok = (all(t == int(MeshType.SDF)
                  for t in scene.mesh_types_static[na:])
              and all(s in _SDF_SHAPES_OK for s in scene.sdf_shapes_static))
    if sphere_lights_only:
        lights_ok = all(
            li < 0 or (li < na
                       and scene.mesh_types_static[li] == int(MeshType.SPHERE)
                       and scene.mat_types_static[li] == int(MatType.LIGHT))
            for li in scene.lights_static)
    else:
        # any in-range slot whose material is LIGHT (sphere or SDF
        # bound) or DIR_LIGHT
        lights_ok = all(
            li < 0 or (li < len(scene.mesh_types_static)
                       and scene.mat_types_static[li] in (
                           int(MatType.LIGHT), int(MatType.DIR_LIGHT)))
            for li in scene.lights_static)
    return bool((not check_textures or _textures_supported(scene))
                and analytic_ok and sdf_ok and lights_ok)


def supported(scene, cfg: RenderConfig) -> bool:
    """Static feature test: can the megakernel render this (scene, cfg)?"""
    return (
        _geometry_supported(scene)
        and not cfg.use_restir
        and (not cfg.use_cubemap or scene.cubemap_is_procedural)
        and cfg.use_biased_sampling
        and int(cfg.render_mode) == int(RenderMode.STATIC)
    )


def supported_restir(scene, cfg: RenderConfig) -> bool:
    """Can the ReSTIR split (trace_forward_gbuffer + cast_rays) serve this
    (scene, cfg)?  Requires that ReSTIR is engaged for *every* diffuse
    bounce (the reference's gating, raytracer.glsl:1899-1946): with MIS
    and <= 8 lights the reference falls back to per-light NEE, which the
    plain megakernel path covers instead.  Animated mode is fine — the
    host pre-animates scene positions before the kernel runs."""
    num_lights = sum(1 for li in scene.lights_static if li >= 0)
    engaged = cfg.use_restir and cfg.sample_lights and num_lights > 0 and (
        not cfg.use_mis or num_lights > 8)
    return (
        _geometry_supported(scene, sphere_lights_only=True)
        and engaged
        and (not cfg.use_cubemap or scene.cubemap_is_procedural)
        and cfg.use_biased_sampling
    )


def supports_shape(height: int, width: int) -> bool:
    return height % BLOCK_ROWS == 0 and width % BLOCK_COLS == 0


# Packed f32 scene table columns.
(_C_PX, _C_PY, _C_PZ, _C_J0, _C_J1, _C_J2, _C_J3,
 _C_CR, _C_CG, _C_CB, _C_ER, _C_EG, _C_EB, _C_NT) = range(14)
_C_AUX = 14  # 12 aux floats (triangle/quad vertices) follow
_C_TP = 26   # 4 texture params (tex_params)
_C_CM = 30   # 3 color-mask floats (tex_cmask)
_C_EM = 33   # 3 emission-mask floats (tex_emask)
_NCOLS = 36


# ----------------------------------------------------------------------
# SDF distance library on component tuples (ops/sdf.py semantics,
# raytracer.glsl:496-698) — p/pos are 3-tuples of [R, C] blocks, jk a
# 4-tuple of SMEM scalars.  `jnp.mod`/`jnp.power` are avoided (floor +
# explicit multiplies) for Mosaic lowering.
# ----------------------------------------------------------------------

def _length(a):
    return jnp.sqrt(jnp.maximum(_dot(a, a), 0.0))


def _mod2(x):
    return x - 2.0 * jnp.floor(x * 0.5)


def _tsd_box(q, b):
    dx = jnp.abs(q[0]) - b[0]
    dy = jnp.abs(q[1]) - b[1]
    dz = jnp.abs(q[2]) - b[2]
    outside = _length((jnp.maximum(dx, 0.0), jnp.maximum(dy, 0.0),
                       jnp.maximum(dz, 0.0)))
    inside = jnp.minimum(jnp.maximum(dx, jnp.maximum(dy, dz)), 0.0)
    return outside + inside


def _tsd_round_box(q, b, r):
    d = (jnp.maximum(jnp.abs(q[0]) - b[0], 0.0),
         jnp.maximum(jnp.abs(q[1]) - b[1], 0.0),
         jnp.maximum(jnp.abs(q[2]) - b[2], 0.0))
    return _length(d) - r


def _tsd_sphere(q, s):
    return _length(q) - s


def _tsd_tri_prism(q, h0, h1):
    qa = (jnp.abs(q[0]), jnp.abs(q[1]), jnp.abs(q[2]))
    return jnp.maximum(
        qa[2] - h1,
        jnp.maximum(qa[0] * 0.866025 + q[1] * 0.5, -q[1]) - h0 * 0.5)


def _tsd_cone(q, c0, c1, c2):
    qx = jnp.sqrt(jnp.maximum(q[0] * q[0] + q[2] * q[2], 0.0))
    qy = q[1]
    d1 = -qy - c2
    d2 = jnp.maximum(qx * c0 + qy * c1, qy)
    outside = jnp.sqrt(jnp.maximum(
        jnp.maximum(d1, 0.0) ** 2 + jnp.maximum(d2, 0.0) ** 2, 0.0))
    return outside + jnp.minimum(jnp.maximum(d1, d2), 0.0)


def _tsd_ellipsoid(q, r0, r1, r2):
    scaled = (q[0] / r0, q[1] / r1, q[2] / r2)
    slen = jnp.sqrt(jnp.maximum(_dot(scaled, scaled), 1e-12))
    return (slen - 1.0) * jnp.minimum(r0, jnp.minimum(r1, r2))


def _tsd_capsule(p, a, b, r):
    pa = _sub(p, a)
    ba = _sub(b, a)
    h = jnp.clip(_dot(pa, ba) / jnp.maximum(_dot(ba, ba), 1e-12), 0.0, 1.0)
    return _length(_sub(pa, _scale(ba, h))) - r


def _tsd_menger(q, b):
    """4-iteration Menger sponge (raytracer.glsl:642-660)."""
    d = _tsd_box(q, b)
    s = 1.0
    for _ in range(4):
        a = (_mod2(q[0] * s) - 1.0, _mod2(q[1] * s) - 1.0,
             _mod2(q[2] * s) - 1.0)
        s = s * 3.0
        r = (jnp.abs(1.0 - 3.0 * jnp.abs(a[0])),
             jnp.abs(1.0 - 3.0 * jnp.abs(a[1])),
             jnp.abs(1.0 - 3.0 * jnp.abs(a[2])))
        da = jnp.maximum(r[0], r[1])
        db = jnp.maximum(r[1], r[2])
        dc = jnp.maximum(r[2], r[0])
        c = (jnp.minimum(da, jnp.minimum(db, dc)) - 1.0) / s
        d = jnp.maximum(c, d)
    return d


def _tsd_mandelbulb(p):
    """Power-8 Mandelbulb, 3 iterations (raytracer.glsl:663-698)."""
    w = p
    m = _dot(w, w)
    dz = jnp.ones_like(m)
    done = jnp.zeros_like(m)  # f32 mask (Mosaic-friendly)
    for _ in range(3):
        m2 = m * m
        m4 = m2 * m2
        dz_new = 8.0 * jnp.sqrt(jnp.maximum(m4 * m2 * m, 1e-20)) * dz + 1.0
        x, y, z = w
        x2, y2, z2 = x * x, y * y, z * z
        x4, y4, z4 = x2 * x2, y2 * y2, z2 * z2
        k3 = x2 + z2
        k3_7 = k3 * k3 * k3 * k3 * k3 * k3 * k3
        k2 = jax.lax.rsqrt(jnp.maximum(k3_7, 1e-20))
        k1 = x4 + y4 + z4 - 6.0 * y2 * z2 - 6.0 * x2 * y2 + 2.0 * z2 * x2
        k4 = x2 - y2 + z2
        wx = p[0] + 64.0 * x * y * z * (x2 - z2) * k4 * (x4 - 6.0 * x2 * z2 + z4) * k1 * k2
        wy = p[1] + -16.0 * y2 * k3 * k4 * k4 + k1 * k1
        wz = p[2] + -8.0 * y * k4 * (x4 * x4 - 28.0 * x4 * x2 * z2 + 70.0 * x4 * z4
                                     - 28.0 * x2 * z2 * z4 + z4 * z4) * k1 * k2
        live = done < 0.5
        w = _where3(live, (wx, wy, wz), w)
        dz = jnp.where(live, dz_new, dz)
        m_new = _dot((wx, wy, wz), (wx, wy, wz))
        m = jnp.where(live, m_new, m)
        done = jnp.maximum(done, jnp.where(m > 4.0, 1.0, 0.0))
    m_safe = jnp.maximum(m, 1e-12)
    return 0.25 * jnp.log(m_safe) * jnp.sqrt(m_safe) / dz


def _tdisp(p, phase):
    """disp(p, phase, power=1) (ops/sdf.disp) — both call sites use power 1."""
    return (0.5 + 0.5 * jnp.cos(p[0] + 1.5 * phase)
            * jnp.sin(p[1] + 2.0 * phase) * jnp.sin(p[2] + 1.0 * phase))


def _tsd_sea_box(q, b, level):
    sea = (-q[1] + level) \
        - _tdisp(_scale(q, 10.0), 2.5) * 0.07 \
        - _tdisp(_scale(q, 15.0), 4.5) * 0.03
    box = _tsd_box(q, b)
    return jnp.maximum(-sea, box)  # op_subtract(box, sea)


def _tsd_edge2(e, pv):
    """Squared distance to segment 0→e (e is a 3-tuple of SMEM scalars,
    pv of [R, C] blocks)."""
    ee = e[0] * e[0] + e[1] * e[1] + e[2] * e[2]
    h = jnp.clip(_dot(e, pv) / jnp.maximum(ee, 1e-12), 0.0, 1.0)
    d = (e[0] * h - pv[0], e[1] * h - pv[1], e[2] * h - pv[2])
    return _dot(d, d)


def _cross_s(a, b):
    """Cross product of two scalar 3-tuples (trace-time constants)."""
    return (a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0])


def _tsd_triangle(q, a, b, c):
    """udTriangle on component tuples (raytracer.glsl:537-554); the
    vertices a/b/c are SMEM scalar 3-tuples so edge vectors and normals
    fold at trace time."""
    ba = (b[0] - a[0], b[1] - a[1], b[2] - a[2])
    cb = (c[0] - b[0], c[1] - b[1], c[2] - b[2])
    ac = (a[0] - c[0], a[1] - c[1], a[2] - c[2])
    pa = (q[0] - a[0], q[1] - a[1], q[2] - a[2])
    pb = (q[0] - b[0], q[1] - b[1], q[2] - b[2])
    pc = (q[0] - c[0], q[1] - c[1], q[2] - c[2])
    nor = _cross_s(ba, ac)
    sgn = (jnp.sign(_dot(_cross_s(ba, nor), pa))
           + jnp.sign(_dot(_cross_s(cb, nor), pb))
           + jnp.sign(_dot(_cross_s(ac, nor), pc)))
    d_edge = jnp.minimum(jnp.minimum(_tsd_edge2(ba, pa), _tsd_edge2(cb, pb)),
                         _tsd_edge2(ac, pc))
    dn = _dot(nor, pa)
    nn = nor[0] * nor[0] + nor[1] * nor[1] + nor[2] * nor[2]
    d_face = dn * dn / jnp.maximum(nn, 1e-12)
    return jnp.sqrt(jnp.maximum(jnp.where(sgn < 2.0, d_edge, d_face), 0.0))


def _tsd_quad(q, a, b, c, d):
    """udQuad on component tuples (raytracer.glsl:556-576)."""
    ba = (b[0] - a[0], b[1] - a[1], b[2] - a[2])
    cb = (c[0] - b[0], c[1] - b[1], c[2] - b[2])
    dc = (d[0] - c[0], d[1] - c[1], d[2] - c[2])
    ad = (a[0] - d[0], a[1] - d[1], a[2] - d[2])
    pa = (q[0] - a[0], q[1] - a[1], q[2] - a[2])
    pb = (q[0] - b[0], q[1] - b[1], q[2] - b[2])
    pc = (q[0] - c[0], q[1] - c[1], q[2] - c[2])
    pd = (q[0] - d[0], q[1] - d[1], q[2] - d[2])
    nor = _cross_s(ba, ad)
    sgn = (jnp.sign(_dot(_cross_s(ba, nor), pa))
           + jnp.sign(_dot(_cross_s(cb, nor), pb))
           + jnp.sign(_dot(_cross_s(dc, nor), pc))
           + jnp.sign(_dot(_cross_s(ad, nor), pd)))
    d_edge = jnp.minimum(
        jnp.minimum(_tsd_edge2(ba, pa), _tsd_edge2(cb, pb)),
        jnp.minimum(_tsd_edge2(dc, pc), _tsd_edge2(ad, pd)))
    dn = _dot(nor, pa)
    nn = nor[0] * nor[0] + nor[1] * nor[1] + nor[2] * nor[2]
    d_face = dn * dn / jnp.maximum(nn, 1e-12)
    return jnp.sqrt(jnp.maximum(jnp.where(sgn < 3.0, d_edge, d_face), 0.0))


def _tsd_siggraph(p):
    ax = (-2.0 / 3.0, 2.0 / 3.0, 1.0 / 3.0)
    ce = (0.0, -0.2, -0.2)
    d1 = _dot(p, ax) - 0.1
    d2 = _length(p) - 1.0
    pc = _sub(p, ce)
    d3 = _length(_sub(pc, _scale(ax, _dot(pc, ax)))) - 1.0
    return jnp.maximum(jnp.maximum(d1, d2), -d3)


def _sdf_distance(shape, p, pos, jk, ax=None):
    """Distance of one SDF entry (ops/sdf._entry_distance semantics)."""
    q = _sub(p, pos)
    j0, j1, j2, j3 = jk
    if shape == int(SdfShape.TRIANGLE):
        return _tsd_triangle(q, ax[0:3], ax[3:6], ax[6:9])
    if shape == int(SdfShape.QUAD):
        return _tsd_quad(q, ax[0:3], ax[3:6], ax[6:9], ax[9:12])
    if shape == int(SdfShape.BOX):
        return _tsd_box(q, (j0, j1, j2))
    if shape == int(SdfShape.ROUND_BOX):
        return _tsd_round_box(q, (j0, j1, j2), j3)
    if shape == int(SdfShape.SPHERE):
        return _tsd_sphere(q, j0)
    if shape == int(SdfShape.TRI_PRISM):
        return _tsd_tri_prism(q, j0, j1)
    if shape == int(SdfShape.CONE):
        return _tsd_cone(q, j0, j1, j2)
    if shape == int(SdfShape.MENGER_SPONGE):
        return _tsd_menger(q, (j0, j1, j2))
    if shape == int(SdfShape.MANDELBULB):
        return _tsd_mandelbulb(q)
    if shape == int(SdfShape.ELLIPSOID):
        return _tsd_ellipsoid(q, j0, j1, j2)
    if shape == int(SdfShape.CAPSULE):
        return _tsd_capsule(p, pos, (j0, j1, j2), j3)
    if shape == int(SdfShape.SEA_BOX):
        return _tsd_sea_box(q, (j0, j1, j2), j3)
    if shape == int(SdfShape.SIGGRAPH):
        return _tsd_siggraph(q)
    if shape == int(SdfShape.SNOWBALL):
        # ops/sdf.snowball — its value-noise LUT fetch is the hash
        # recompute (_value_noise_k), same as the texture system
        return _tsd_sphere(q, j0) - 0.04 * _value_noise_k(
            (q[0] * 8.0, q[1] * 8.0, q[2] * 8.0))
    raise ValueError(f"megakernel: unsupported SDF shape {shape}")


# ----------------------------------------------------------------------
# the pure per-block trace: unrolled bounce loop on [R, C] blocks
# ----------------------------------------------------------------------

def _geometry(meta, cfg: RenderConfig, sv):
    """Scene geometry closures over the SMEM table snapshot: analytic +
    SDF intersection, per-winner parameter select, static lane masks.
    Shared by the trace kernels and the standalone ray-cast kernel."""
    import types

    (mesh_types, mat_types, lights, sdf_shapes, n_analytic,
     tex_types, opts_ce, pc_size) = meta
    n_mesh = len(mesh_types)
    n_sdf = len(sdf_shapes)
    eps = cfg.epsilon
    inf = cfg.infinity
    sg = jax.lax.stop_gradient

    def mesh_p(i):
        return (sv[i][_C_PX], sv[i][_C_PY], sv[i][_C_PZ])

    # ---- SDF scene map (ops/sdf.scene_map over the static entry list) ----
    def sdf_map(p, svv):
        best = None
        best_i = None
        for k in range(n_sdf):
            i = n_analytic + k
            pos = (svv[i][_C_PX], svv[i][_C_PY], svv[i][_C_PZ])
            jk = (svv[i][_C_J0], svv[i][_C_J1], svv[i][_C_J2], svv[i][_C_J3])
            ax = tuple(svv[i][_C_AUX + a] for a in range(12))
            dk = _sdf_distance(sdf_shapes[k], p, pos, jk, ax)
            if best is None:
                best, best_i = dk, jnp.zeros_like(dk, jnp.int32)
            else:
                closer = dk < best
                best_i = jnp.where(closer, k, best_i)
                best = jnp.minimum(dk, best)
        return best, best_i

    sv_sg = tuple(tuple(sg(v) for v in row) for row in sv) if n_sdf else sv

    def _sdf_bound_radius(shape, jk):
        """Conservative bounding-sphere radius of one SDF entry around its
        center, or None when no cheap bound exists (rotation-invariant, so
        the animated rotate-Y never escapes it; the bob moves the center,
        which the host pre-animates into `pos`)."""
        j0, j1, j2, j3 = jk
        norm3 = jnp.sqrt(j0 * j0 + j1 * j1 + j2 * j2)
        s = int(shape)
        if s in (int(SdfShape.BOX), int(SdfShape.MENGER_SPONGE)):
            return norm3 * 1.05 + 0.05
        if s == int(SdfShape.ROUND_BOX):
            return norm3 * 1.05 + jnp.abs(j3) + 0.05
        if s == int(SdfShape.SPHERE):
            return jnp.abs(j0) + 0.05
        if s == int(SdfShape.SNOWBALL):
            return jnp.abs(j0) + 0.15
        if s == int(SdfShape.MANDELBULB):
            return jnp.asarray(2.5, jnp.float32)  # escape radius ~1.5
        if s == int(SdfShape.ELLIPSOID):
            return jnp.abs(j0) + jnp.abs(j1) + jnp.abs(j2) + 0.05
        return None

    def sdf_march(o, d, tlimit):
        """Sphere trace (ops/sdf.march semantics): non-differentiated
        fori march + implicit-function reattachment of the hit t.

        Bounding-sphere gate: lanes whose ray cannot enter any SDF
        entry's conservative bound within [0, tlimit] are marked done at
        entry (and forced invalid) — a lane outside every bound can never
        converge to |dist|<eps inside tlimit, so this is bit-exact, and
        whole blocks away from the SDFs skip the march loop entirely
        (the march was ~9 ms of the 44 ms restir_demo pass at 512²)."""
        o_s = tuple(sg(x) for x in o)
        d_s = tuple(sg(x) for x in d)
        tl = sg(tlimit)
        t0 = jnp.full_like(o[0], eps * 4.0)
        d0, _ = sdf_map(_add(o_s, _scale(d_s, t0)), sv_sg)
        done0 = jnp.where(jnp.abs(d0) < eps, 1.0, 0.0)

        bound_rs = [_sdf_bound_radius(sdf_shapes[k],
                                      (sv_sg[n_analytic + k][_C_J0],
                                       sv_sg[n_analytic + k][_C_J1],
                                       sv_sg[n_analytic + k][_C_J2],
                                       sv_sg[n_analytic + k][_C_J3]))
                    for k in range(n_sdf)]
        if n_sdf and all(r is not None for r in bound_rs):
            can_hit = jnp.zeros_like(done0) > 1.0
            for k, rb in enumerate(bound_rs):
                pos = tuple(sg(v) for v in mesh_p(n_analytic + k))
                oc = _sub(o_s, pos)
                b = _dot(oc, d_s)
                cq = _dot(oc, oc) - rb * rb
                disc = b * b - cq
                sq = _safe_sqrt(disc)
                enter = -b - sq
                exit_t = -b + sq
                can_hit = can_hit | ((disc > 0.0) & (exit_t > 0.0)
                                     & (enter < tl))
            bound_miss = ~can_hit
            done0 = jnp.maximum(done0, jnp.where(bound_miss, 1.0, 0.0))
        else:
            bound_miss = None

        # Chunked early exit: bursts of fixed unrolled steps with an
        # all-lanes-done check between bursts.  A per-step dynamic check
        # costs more than it saves (the [R,C]->scalar reduce serializes
        # the VPU); per-chunk it amortizes while still cutting marching
        # cost to the block's slowest lane, like the XLA path's
        # all-lanes-done while_loop.
        chunk = min(16, max(1, cfg.marching_steps - 1))

        def step_once(t, done):
            dist, _ = sdf_map(_add(o_s, _scale(d_s, t)), sv_sg)
            h = jnp.abs(dist)
            hop = jnp.where((h < eps) | (t > tl), 1.0, 0.0)
            stop = jnp.maximum(done, hop)
            return t + (1.0 - stop) * h * cfg.fudge_factor, stop

        def cond(carry):
            step, _, done = carry
            return (step < cfg.marching_steps - 1) & (jnp.min(done) < 0.5)

        def body(carry):
            step, t, done = carry
            for _ in range(chunk):
                t, done = step_once(t, done)
            return step + chunk, t, done

        _, t_star, _ = jax.lax.while_loop(
            cond, body, (jnp.zeros((), jnp.int32), t0, done0))
        valid = t_star <= tl
        if bound_miss is not None:
            valid = valid & ~bound_miss
        # Escaped lanes settle far out where unbounded fields (Mandelbulb)
        # overflow f32 to NaN and poison reverse-mode even at zero
        # cotangent — pin their evaluation point to the ray origin
        # (results discarded by the `wins` gate).
        t_safe = jnp.where(valid, t_star, 0.0)
        # final map at the settled t: winner ordinal + differentiable
        # reattachment  t = t* - (f - sg(f)) / sg(df/dt)
        x = _add(o, _scale(d, t_safe))
        f_val, res_i = sdf_map(x, sv)
        x_s = tuple(sg(v) for v in x)
        f_fwd, _ = sdf_map(_add(x_s, _scale(d_s, eps)), sv_sg)
        f_bwd, _ = sdf_map(_sub(x_s, _scale(d_s, eps)), sv_sg)
        dfdt = (f_fwd - f_bwd) / (2.0 * eps)
        dfdt = jnp.where(jnp.abs(dfdt) < 0.05,
                         jnp.where(dfdt < 0.0, -0.05, 0.05), dfdt)
        t = jnp.where(valid, t_star - (f_val - sg(f_val)) / sg(dfdt), t_star)
        return t, res_i, valid

    # ---- intersection over static mesh list (analytic_min semantics) ----
    def intersect(o, d):
        tmin = jnp.full_like(o[0], jnp.inf)
        idx = jnp.zeros_like(o[0], jnp.int32)
        for i in range(n_analytic):
            mt = mesh_types[i]
            p = mesh_p(i)
            j0 = sv[i][_C_J0]
            if mt == int(MeshType.SPHERE):
                oc = _sub(o, p)
                bq = _dot(oc, d)
                cq = _dot(oc, oc) - j0 * j0
                disc = bq * bq - cq
                sq = _safe_sqrt(disc)
                t0 = -bq - sq
                t1 = -bq + sq
                t = jnp.where(t0 > eps, t0, t1)
                valid = (disc > 0.0) & (t > eps)
            elif mt == int(MeshType.PLANE):
                denom = _dot(p, d)
                dmag = jnp.where(jnp.abs(denom) < 1e-12,
                                 jnp.where(denom < 0, -1e-12, 1e-12), denom)
                t = (-j0 - _dot(p, o)) / dmag
                valid = (t > eps) & (jnp.abs(denom) > 1e-12)
            else:  # BOX
                half = j0 * 0.5
                tn = jnp.full_like(o[0], -jnp.inf)
                tf = jnp.full_like(o[0], jnp.inf)
                for c in range(3):
                    dc = d[c]
                    dmag = jnp.where(jnp.abs(dc) < 1e-12,
                                     jnp.where(dc < 0, -1e-12, 1e-12), dc)
                    m = 1.0 / dmag
                    nv = m * (p[c] - o[c])
                    k = jnp.abs(m) * half
                    tn = jnp.maximum(tn, nv - k)
                    tf = jnp.minimum(tf, nv + k)
                t = jnp.where(tn > 0.0, tn, tf)
                valid = (tn <= tf) & (tf >= 0.0) & (t > eps)
            # degenerate skip is static here: joker0 == 0 rows are data,
            # keep the runtime guard for parity
            valid = valid & (j0 != 0.0)
            closer = valid & (t < tmin)
            tmin = jnp.where(closer, t, tmin)
            idx = jnp.where(closer, i, idx)
        if n_sdf:
            # merge exactly like ops/intersect.intersect: march up to the
            # nearest analytic t (cfg.infinity on analytic miss)
            tl = jnp.where(tmin > 1e30, inf, tmin)
            t_sdf, ord_i, march_ok = sdf_march(o, d, tl)
            wins = march_ok & (t_sdf < tl)
            tmin = jnp.where(wins, t_sdf, tmin)
            idx = jnp.where(wins, n_analytic + ord_i, idx)
        return tmin, idx

    # Winner-parameter columns actually consumed by the bounce body.
    _SEL_COLS = (_C_PX, _C_PY, _C_PZ, _C_J0, _C_CR, _C_CG, _C_CB,
                 _C_ER, _C_EG, _C_EB, _C_NT)

    def select_mesh_params(idx):
        """Per-lane winner params via select over the static mesh list
        (the 11 consumed columns only).

        An in-kernel one-hot MXU contraction was measured at 89.9 ms vs
        42.2 ms for the select chain on restir_demo/512²/v5e (bit-equal
        results) — Mosaic's tiny-K dot lowering loses badly, unlike the
        XLA-level one-hot trick in ops/restir.  Kept behind
        RT0_MXU_SELECT=1 for future A/B."""
        if os.environ.get("RT0_MXU_SELECT") != "1":
            zeros = jnp.zeros_like(idx, jnp.float32)
            cols = {c: zeros for c in _SEL_COLS}
            for i in range(n_mesh):
                m = idx == i
                for c in _SEL_COLS:
                    cols[c] = jnp.where(m, sv[i][c], cols[c])
        else:
            table = jnp.stack([
                jnp.stack([sv[i][c] for c in _SEL_COLS])
                for i in range(n_mesh)])                    # [n_mesh, 11]
            oh = (idx[..., None] == jax.lax.broadcasted_iota(
                jnp.int32, idx.shape + (n_mesh,), idx.ndim)
            ).astype(jnp.float32)
            res = jax.lax.dot_general(
                oh, table, (((oh.ndim - 1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)         # [R, C, 11]
            cols = {c: res[..., k] for k, c in enumerate(_SEL_COLS)}
        return ((cols[_C_PX], cols[_C_PY], cols[_C_PZ]), cols[_C_J0],
                (cols[_C_CR], cols[_C_CG], cols[_C_CB]),
                (cols[_C_ER], cols[_C_EG], cols[_C_EB]), cols[_C_NT])

    def lane_mask(idx, pred):
        """OR of (idx == i) over static rows i satisfying pred(i)."""
        m = jnp.zeros_like(idx, bool)
        for i in range(n_mesh):
            if pred(i):
                m = m | (idx == i)
        return m

    def sphere_light_pdf(cx, cy, cz, radius, x):
        dv = (cx - x[0], cy - x[1], cz - x[2])
        d2 = _dot(dv, dv)
        r2 = radius * radius
        inside = d2 <= r2
        ratio = r2 / jnp.maximum(d2, 1e-12)
        cos_max = _safe_sqrt(1.0 - jnp.minimum(ratio, 1.0))
        denom = 1.0 - cos_max
        degenerate = denom < 1e-6
        pdf = 1.0 / jnp.maximum(TWO_PI * denom, 1e-12)
        return jnp.where(inside | degenerate, 0.0, pdf)

    return types.SimpleNamespace(
        mesh_p=mesh_p, sdf_map=sdf_map, sdf_march=sdf_march,
        intersect=intersect, select_mesh_params=select_mesh_params,
        lane_mask=lane_mask, sphere_light_pdf=sphere_light_pdf)


# Packed fused-ReSTIR reservoir channel order (weight_sum, M, W, age,
# light_index-as-f32) — the full `Reservoirs` pytree minus light_pos /
# light_color, which are pure functions of light_index (+ the frame's
# scene): candidate generation stores the light *center* from the slot
# table (ops/restir.py:419-426), temporal/spatial merges only move
# stored values between reservoirs, and animated mode re-derives them
# from the index anyway (raytracer.glsl:1669-1676) — so 6 of the 11
# packed f32 channels are redundant and the kernel exports only these 5.
_RES_CH = 5
_RES_WS, _RES_M, _RES_W, _RES_AGE, _RES_IDX = range(_RES_CH)


def _build_restir_vertex(meta, cfg: RenderConfig, sv, g, pix, pass_u,
                         samp_u, height, width, taps_ref, hist_ref,
                         row0=0):
    """In-kernel ReSTIR: the full per-vertex reservoir pipeline
    (candidate generation → temporal reuse → spatial reuse → finalize +
    shade, raytracer.glsl:1619-1801) fused into the bounce loop,
    mirroring `ops/restir.reservoir_direct` op-for-op.

    This replaces the G-buffer split (trace_forward_gbuffer + XLA
    phases + cast_rays), whose per-slot record export hit a measured
    ~8.4 ms/slot Mosaic loop-state floor (experiments/README.md,
    exp_slot_scaling) — 48 exported channels at 4 diffuse slots.  Here
    the loop carries only the 5-channel winner reservoir (_RES_CH) and
    the shading happens where the data already is:

      * spatial taps: the previous frame's packed reservoir grid is
        pre-rolled in XLA by the 8 static Poisson offsets
        (restir.POISSON_DISK × SPATIAL_RADIUS) into an aligned
        [8, 5, H, W] input — each tap is a plain block read, the in-VMEM
        analogue of the XLA path's proven static-roll taps;
      * temporal taps: identity reprojection (cfg.restir_adhoc_motion =
        False — the kernel's required mode) reads the [2, 5, H, W]
        history input at the pixel itself;
      * light pos/color/validity are derived from the reservoir's light
        index via arithmetic selects over the per-slot SMEM scalars —
        the target function is precomputed per light slot once per
        vertex and every phase selects from it;
      * visibility + shading shadow rays use the kernel's own
        `intersect` (the fused twin of cast_rays).

    RNG streams key on (pixel, pass, sample, bounce depth, phase)
    exactly like the XLA path, so results agree per-pixel up to f32
    reassociation at shadow-threshold edges (same contract as the
    gbuffer split it replaces).
    """
    from raytracer0_tpu.ops.restir import (
        POISSON_DISK, SPATIAL_RADIUS, MAX_RESERVOIR_AGE,
        MAX_TEMPORAL_SAMPLES, TEMPORAL_ALPHA, RESTIR_SPATIAL_SAMPLES)

    (mesh_types, mat_types, lights, sdf_shapes, n_analytic,
     tex_types, opts_ce, pc_size) = meta
    L = len(lights)
    eps = cfg.epsilon
    animated = int(cfg.render_mode) == 1
    intersect = g.intersect
    lane_mask = g.lane_mask
    select_mesh_params = g.select_mesh_params
    mesh_p = g.mesh_p

    # Per-light-slot traced scalars (the XLA light_tab, restir.py:418-426).
    slot_pos, slot_col, slot_j0, slot_live = [], [], [], []
    for li in lights:
        i = max(li, 0)
        slot_pos.append(mesh_p(i))
        slot_col.append((sv[i][_C_CR] * sv[i][_C_ER],
                         sv[i][_C_CG] * sv[i][_C_EG],
                         sv[i][_C_CB] * sv[i][_C_EB]))
        slot_j0.append(sv[i][_C_J0])
        slot_live.append(li >= 0)  # static

    # per-slot stored-value checks of is_valid_reservoir (restir.py:163-167):
    # lc2 on the stored color == derived color, lp2 on the stored position
    slot_lc2 = [_dot(c, c) for c in slot_col]
    slot_lp2 = [_dot(p, p) for p in slot_pos]

    n_spatial = RESTIR_SPATIAL_SAMPLES
    if L > 10:
        n_spatial = max(4, n_spatial // 2)
    tap_offsets = [(int(round(dy * SPATIAL_RADIUS)),
                    int(round(dx * SPATIAL_RADIUS)))
                   for dx, dy in POISSON_DISK]

    frame_ok = pass_u > np.uint32(MAX_TEMPORAL_SAMPLES)
    few_frames = pass_u < np.uint32(10)
    age_thr = 2.0 if animated else MAX_RESERVOIR_AGE * 0.8

    # global pixel coordinates of this block (`row0` offsets band-mode
    # launches, where the grid covers rows [row0, row0+band) of a taller
    # image — the taps/hist inputs are pre-sliced to the band)
    bi = pl.program_id(0)
    bj = pl.program_id(1)
    rows = (row0 + bi * BLOCK_ROWS
            + jax.lax.broadcasted_iota(jnp.int32,
                                       (BLOCK_ROWS, BLOCK_COLS), 0))
    cols = (bj * BLOCK_COLS
            + jax.lax.broadcasted_iota(jnp.int32,
                                       (BLOCK_ROWS, BLOCK_COLS), 1))

    def _finite(v):
        return jnp.abs(v) < jnp.float32(np.inf)

    def _sel(idx_lane, values, init=0.0):
        """Chained select of a per-slot traced scalar by the per-lane
        slot index; exactly the value the XLA one-hot row-select picks
        (restir._row_select), `init` for out-of-range (-1)."""
        out = jnp.full_like(idx_lane, init, jnp.float32)
        for l, v in enumerate(values):
            out = jnp.where(idx_lane == l, v, out)
        return out

    def _sel_bool(idx_lane, values):
        out = jnp.zeros_like(idx_lane, bool)
        for l, v in enumerate(values):
            out = jnp.where(idx_lane == l, v, out)
        return out

    def _sel3(idx_lane, triples):
        return tuple(_sel(idx_lane, [t[k] for t in triples])
                     for k in range(3))

    def _validity(h_ws, h_m, h_w, h_age, h_idx):
        """is_valid_reservoir (restir.py:153-168) on the packed record;
        stored-color/pos checks act on the slot-derived values (equal to
        the stored ones — see _RES_CH note)."""
        ok = (_finite(h_m) & _finite(h_ws) & _finite(h_w) & _finite(h_age))
        ok &= (h_m > 0.0) & (h_m <= 200.0)
        ok &= (h_ws > 0.0) & (h_ws <= 1000.0)
        ok &= (h_w >= 0.0) & (h_w <= 20.0)
        ok &= (h_age >= 0.0) & (h_age <= MAX_RESERVOIR_AGE + 5.0)
        lc2 = _sel(h_idx, slot_lc2)          # 0.0 when idx == -1
        ok &= (lc2 >= 1e-6) & (lc2 <= 1e4)
        ok &= h_idx < L
        lp2 = _sel(h_idx, slot_lp2)
        ok &= ~((lp2 < 1e-6) & (h_idx >= 0))
        return ok

    def vertex(x, nl, idx, depth_u):
        """One diffuse vertex: returns (direct light rgb *excluding*
        the throughput mask, (ws, m, w, age, idx) reservoir)."""
        zeros = jnp.zeros_like(x[0])

        # shading-point material for the target function — raw scene
        # color / |ior| / type, NOT the textured-clamped shading color
        # (restir.py:405-412)
        _, _, w_c, _, w_nt = select_mesh_params(idx)
        surface_lum = (w_c[0] * 0.2126 + w_c[1] * 0.7152
                       + w_c[2] * 0.0722)
        nt_abs = jnp.abs(w_nt)
        nnt = (nt_abs - 1.0) / jnp.maximum(nt_abs + 1.0, 1e-6)
        r0 = nnt * nnt
        f_refr = lane_mask(idx, lambda i: mat_types[i] in (
            int(MatType.REFR_FRESNEL), int(MatType.REFR_SCHLICK))
        ).astype(jnp.float32)
        f_coat = lane_mask(
            idx, lambda i: mat_types[i] == int(MatType.COAT)
        ).astype(jnp.float32)
        base = surface_lum + (r0 - surface_lum) * f_refr
        brdf_weight = (base + ((1.0 - r0) * surface_lum - base)
                       * f_coat) * ONE_OVER_PI

        # per-slot target values p̂ at this vertex (evaluate_target,
        # restir.py:109-130) — computed once, selected by every phase
        tv_l, d2_l = [], []
        for l in range(L):
            lv = _sub(slot_pos[l], x)
            d2 = _dot(lv, lv)
            ldir = _normalize(lv)
            cos_t = jnp.maximum(0.0, _dot(nl, ldir))
            lc = slot_col[l]
            light_lum = lc[0] * 0.2126 + lc[1] * 0.7152 + lc[2] * 0.0722
            p_hat = (light_lum * brdf_weight * cos_t
                     / jnp.maximum(d2, 1e-4))
            valid = (d2 >= 1e-6) & (cos_t > 0.0) & (light_lum > 0.0)
            tv = jnp.where(valid, p_hat, 0.0) if slot_live[l] else zeros
            tv_l.append(tv)
            d2_l.append(d2)

        def combine(state, s_ws, s_m, s_w, s_age, s_idx, ok_extra, rand):
            """combine_reservoirs (restir.py:171-203) on the 5-field
            carry; target reweighting selects from tv_l."""
            r_ws, r_m, r_w, r_age, r_idx = state
            ok = _validity(s_ws, s_m, s_w, s_age, s_idx) & ok_extra
            tw = _sel(s_idx, tv_l)
            ok &= tw > 0.0
            contribution = jnp.clip(
                tw * jnp.maximum(s_w, 0.0) * jnp.maximum(s_m, 1.0),
                0.0, 200.0)
            ws_n = r_ws + jnp.where(ok, contribution, 0.0)
            m_n = r_m + jnp.where(ok, s_m, 0.0)
            over = m_n > 40.0
            scale = jnp.where(over, 40.0 / jnp.maximum(m_n, 1e-6), 1.0)
            ws_n = ws_n * scale
            m_n = jnp.minimum(m_n, 40.0)
            sel_prob = contribution / jnp.maximum(ws_n, 1e-12)
            take = ok & (ws_n > 0.0) & (rand < sel_prob)
            new_age = jnp.minimum(s_age + 0.25, MAX_RESERVOIR_AGE)
            return (ws_n, m_n, r_w,
                    jnp.where(take, new_age, r_age),
                    jnp.where(take, s_idx, r_idx))

        # ---- phase 1: candidate generation (restir.py:430-440) ----
        r_ws = zeros
        r_m = zeros
        r_w = zeros
        r_age = zeros
        r_idx = jnp.full_like(x[0], -1, jnp.int32)
        eff = min(cfg.restir_samples, max(4, L))
        for i in range(eff):
            c1, c2 = _uniform2(pix, pass_u, samp_u, depth_u,
                               np.uint32(i),
                               np.uint32(rng_mod.Stream.RESTIR_CANDIDATE))
            slot = jnp.clip((c1 * L).astype(jnp.int32), 0, L - 1)
            tv = _sel(slot, tv_l)
            # update_reservoir (restir.py:133-150)
            take = tv > 0.0
            ws_n = r_ws + jnp.where(take, tv, 0.0)
            m_n = r_m + jnp.where(take, 1.0, 0.0)
            overflow = m_n > 60.0
            ws_n = jnp.where(overflow, ws_n * 0.95, ws_n)
            m_n = jnp.where(overflow, m_n * 0.95, m_n)
            sel_prob = tv / jnp.maximum(ws_n, 1e-12)
            take_sel = take & (ws_n > 0.0) & (c2 < sel_prob)
            r_idx = jnp.where(take_sel, slot, r_idx)
            r_ws, r_m = ws_n, m_n

        # ---- phase 2: temporal reuse, identity reprojection
        # (restir.py:443-484; the kernel's required mode) ----
        for level in range(MAX_TEMPORAL_SAMPLES):
            h_ws = hist_ref[level, _RES_WS]
            h_m = hist_ref[level, _RES_M]
            h_w = hist_ref[level, _RES_W]
            h_age = hist_ref[level, _RES_AGE]
            h_idx = hist_ref[level, _RES_IDX].astype(jnp.int32)
            # pre-decay gates (restir.py:458-459)
            ok_pre = (_validity(h_ws, h_m, h_w, h_age, h_idx)
                      & frame_ok & (h_m > 0.0)
                      & (h_age < MAX_RESERVOIR_AGE))
            # decay (restir.py:469-473); pos/color refresh is implicit —
            # all light data derives from the index
            h_age = h_age + (level + 1.0)
            alpha = TEMPORAL_ALPHA * (0.80 if level == 1 else 1.0) * \
                (0.85 if animated else 1.0)
            h_m = h_m * alpha
            h_ws = h_ws * alpha
            t_rand = _uniform(pix, pass_u, samp_u, depth_u,
                              np.uint32(level),
                              np.uint32(rng_mod.Stream.RESTIR_TEMPORAL),
                              np.uint32(991))
            r_ws, r_m, r_w, r_age, r_idx = combine(
                (r_ws, r_m, r_w, r_age, r_idx),
                h_ws, h_m, h_w, h_age, h_idx, ok_pre, t_rand)

        # post-combine clamp (restir.py:481-484)
        over = r_m > 100.0
        r_m = jnp.where(over, jnp.minimum(r_m, 80.0), r_m)
        r_ws = jnp.where(over, r_ws * 0.9, r_ws)

        # ---- phase 3: spatial reuse (restir.py:487-519): aligned
        # pre-rolled taps, compile-time offsets ----
        for i in range(n_spatial):
            s1, s2 = _uniform2(pix, pass_u, samp_u, depth_u,
                               np.uint32(i),
                               np.uint32(rng_mod.Stream.RESTIR_SPATIAL))
            drow, dcol = tap_offsets[i]
            in_b = ((rows + drow >= 0) & (rows + drow < height)
                    & (cols + dcol >= 0) & (cols + dcol < width))
            t_ws = taps_ref[i, _RES_WS]
            t_m = taps_ref[i, _RES_M]
            t_w = taps_ref[i, _RES_W]
            t_age = taps_ref[i, _RES_AGE]
            t_idx = taps_ref[i, _RES_IDX].astype(jnp.int32)

            ok = in_b & (t_m > 0.0)
            if i >= max(2, n_spatial // 2):
                ok &= ~few_frames        # warm-up halving
            ld2 = _sel(t_idx, d2_l)      # |stored light pos - x|²
            ok &= ~((t_idx >= 0) & (ld2 > 225.0))
            ok &= ~(t_age > age_thr)
            ok &= ~(s1 < 0.03)
            r_ws, r_m, r_w, r_age, r_idx = combine(
                (r_ws, r_m, r_w, r_age, r_idx),
                t_ws, t_m, t_w, t_age, t_idx, ok, s2)

        # ---- phase 4: finalize + shade (restir.py:522-542) ----
        # visibility (is_visible, restir.py:216-230)
        win_pos = _sel3(r_idx, slot_pos)
        sd = _sub(win_pos, x)
        dist = jnp.sqrt(jnp.maximum(_dot(sd, sd), 1e-12))
        close = dist < eps * 10.0
        sdir = (sd[0] / dist, sd[1] / dist, sd[2] / dist)
        t_vis, i_vis = intersect(_add(x, _scale(sdir, eps * 2.0)), sdir)
        missed_vis = t_vis > 1e30
        blocked = (t_vis < dist - eps * 2.0) & ~missed_vis
        blocker_light = lane_mask(
            i_vis, lambda i: mat_types[i] == int(MatType.LIGHT))
        visible = close | ~blocked | (blocked & blocker_light)

        # finalize_reservoir (restir.py:233-254)
        p_hat = _sel(r_idx, tv_l)
        good = (r_ws > 0.0) & (r_m > 0.0) & (p_hat > 0.0) & visible
        m_cl = jnp.clip(r_m, 1.0, 40.0)
        raw_w = r_ws / jnp.maximum(p_hat * m_cl, 1e-12)
        norm_age = jnp.clip(r_age / MAX_RESERVOIR_AGE, 0.0, 1.0)
        bias = jnp.where(r_age > 0.0,
                         0.85 + 0.15 * (1.0 - norm_age * 0.3), 1.0)
        bias = bias * jnp.where(m_cl > 16.0,
                                _safe_sqrt(16.0 / m_cl), 1.0)
        w_val = jnp.clip(bias * raw_w, 0.0, 12.0)
        w_val = jnp.where(_finite(w_val), w_val, 0.0)
        r_w = jnp.where(good, w_val, 0.0)
        r_age = jnp.minimum(r_age, MAX_RESERVOIR_AGE)

        # shade (_shade_selected, restir.py:268-320; supported scenes
        # have analytic sphere lights only, so the cone branch is the
        # whole dispatch)
        slot_cl = jnp.clip(r_idx, 0, L - 1)
        l_pos = _sel3(slot_cl, slot_pos)
        j0 = _sel(slot_cl, slot_j0)
        u1, u2 = _uniform2(pix, pass_u, samp_u, depth_u,
                           np.uint32(rng_mod.Stream.NEE_CONE),
                           np.uint32(77))
        sw = _sub(l_pos, x)
        d2s = _dot(sw, sw)
        r2s = j0 * j0
        mag = jnp.maximum(jnp.abs(d2s), 1e-12)     # vm.safe_div
        ratio = jnp.clip(r2s / jnp.where(d2s < 0, -mag, mag), 0.0, 1.0)
        cos_a_max = _safe_sqrt(1.0 - ratio)
        dir_l = _sample_cone(_normalize(sw), 1.0 - cos_a_max, u1, u2)
        t_sh, i_sh = intersect(_add(x, _scale(nl, eps)), dir_l)
        missed_sh = t_sh > 1e30
        hit_light = lane_mask(
            i_sh, lambda i: mat_types[i] == int(MatType.LIGHT)) \
            & ~missed_sh
        _, _, hc, he, _ = select_mesh_params(i_sh)
        lit = (jnp.maximum(hc[0], 0.001), jnp.maximum(hc[1], 0.001),
               jnp.maximum(hc[2], 0.001))
        cos_term = jnp.maximum(0.001, _dot(dir_l, nl))
        if cfg.use_volumetrics:
            fog = jnp.exp(-cfg.vol_sigma_t * t_sh)
        else:
            fog = 1.0
        weight = 2.0 * (1.0 - cos_a_max)
        ck = weight * cos_term * fog
        con = (lit[0] * he[0] * ck, lit[1] * he[1] * ck,
               lit[2] * he[2] * ck)
        con = _where3(hit_light, con, (zeros, zeros, zeros))

        eff_w = jnp.clip(r_w, 0.0, 8.0)
        eff_w = eff_w * jnp.where(
            r_m > 30.0,
            _safe_sqrt(30.0 / jnp.maximum(r_m, 1e-6)), 1.0)
        out = _scale(con, eff_w)
        slot_in_range = (r_idx >= 0) & (r_idx < L)
        shade_ok = (r_w > 0.0) & slot_in_range
        all_fin = _finite(out[0]) & _finite(out[1]) & _finite(out[2])
        gate = all_fin & shade_ok
        out = _where3(gate, out, (zeros, zeros, zeros))
        return out, (r_ws, r_m, r_w, r_age, r_idx)

    return vertex


def _build_bounce(meta, cfg: RenderConfig, sv, pix, pass_u, samp_u, o,
                  restir_slots=0, env_slots=0, gbuf_refs=None,
                  env_refs=None, tex_slots=0, tex_refs=None,
                  tex_acc_refs=None, restir_fused=None,
                  texlight_refs=None, gloss_refs=None):
    """Build the one-bounce transition function on the explicit lane-state
    carry, closed over the scene values `sv` (raytracer.glsl:1986-2105
    radiance-loop body).

    `env_slots > 0` runs the *deferred-cubemap* split (VERDICT r2 next
    #3): with a photographic cubemap (pc_size == 0) the kernel cannot
    fetch texels (Mosaic has no per-lane gather), but every cubemap
    fetch is *terminal* — a miss ends the path, and the per-diffuse-
    bounce environment gather (raytracer.glsl:1888-1897) contributes
    weight x cubemap(dir) with nothing downstream depending on the
    texel.  So the kernel exports (throughput, direction) records — one
    miss record per lane plus one per diffuse ordinal — and the host
    wrapper adds `sum_k w_k * sample_cubemap(d_k)` with full-resolution
    XLA bilinear gathers afterward.  Exact parity with the XLA wavefront
    path, no in-kernel texture memory at all.

    Slot records (G-buffer and env) are written to the output refs as
    pl.when-gated masked stores.  Measured on v5e at 512² (experiments/
    README.md): the export costs ~8.4 ms/slot/pass *however it is
    expressed* — where-RMW ref updates, masked stores, pl.when-gated
    stores, loop-carried values, and a fully unrolled loop all land
    within noise, and a packed single-store layout is worse — because
    Pallas discharges in-loop ref writes into while_loop state and the
    per-iteration cost scales with that state.  The ~40 ms restir_demo
    G-buffer trace is therefore a Mosaic loop-state floor, not a store-
    instruction count; the XLA reservoir phases add only ~9 ms on top.
    Known next lever (unimplemented): shrink the record to 7 fields —
    pos(3) + mask(3) + sign-encoded idx*inside(1) — recomputing nl in
    XLA from (idx, pos) and rekeying the per-vertex ReSTIR streams on
    the diffuse ordinal instead of bounce depth; the floor scales with
    state bytes, so ~7/12 of the export cost.

    `tex_slots > 0` runs the *deferred image-texture* split (VERDICT r2
    next #3, getTexel's IMAGE0-3 branch, raytracer.glsl:726-772): image
    texels are per-lane gathers the kernel cannot do, but on DIFF
    surfaces the texel only scales the throughput multiplicatively.  The
    kernel shades with a fixed placeholder texel (0.5 gray, alpha 1),
    counts image-texture vertices per lane (`ntex`), splits the
    accumulator by that count (group 0 in the carry, groups 1..K in
    `tex_acc_refs`), and records each vertex's (hit pos, mesh idx) in
    `tex_refs`.  The host wrapper recomputes the true texel per record —
    spherical/dominant-axis UV included, so UV-textured *spheres* need
    no in-kernel asin — and reconstitutes
    radiance = sum_g (prod_{j<=g} rho_j) * acc_g with
    rho_j = c_true/c_placeholder.  Exact because image rows are gated to
    DIFF analytic meshes (no texel->direction coupling) with color-only
    blending, and ntex <= ndif <= max_diff_bounces bounds the count.
    Sole residual deviation: the luminance cutoff (raytracer.glsl:2097)
    sees the placeholder throughput (documented in PARITY.md)."""
    (mesh_types, mat_types, lights, sdf_shapes, n_analytic,
     tex_types, opts_ce, pc_size) = meta
    n_mesh = len(mesh_types)
    n_sdf = len(sdf_shapes)
    eps = cfg.epsilon
    inf = cfg.infinity
    sg = jax.lax.stop_gradient

    g = _geometry(meta, cfg, sv)
    mesh_p, sdf_map = g.mesh_p, g.sdf_map
    sdf_march, intersect = g.sdf_march, g.intersect
    select_mesh_params, lane_mask = g.select_mesh_params, g.lane_mask
    sphere_light_pdf = g.sphere_light_pdf

    def shade_nee(x, nl, depth_u):
        """Per-light NEE + MIS (lighting.sample_lights_nee semantics)."""
        tr = jnp.zeros_like(x[0])
        tg = jnp.zeros_like(x[0])
        tb = jnp.zeros_like(x[0])
        for slot, li in enumerate(lights):
            if li < 0:
                continue
            l_mat = mat_types[li]
            l_mesh = mesh_types[li]
            lp = mesh_p(li)
            j0 = sv[li][_C_J0]
            u1, u2 = _uniform2(pix, pass_u, samp_u, depth_u,
                               np.uint32(slot),
                               np.uint32(rng_mod.Stream.NEE_CONE))
            if l_mat == int(MatType.LIGHT) and l_mesh == int(MeshType.SPHERE):
                sw = _sub(lp, x)
                d2 = _dot(sw, sw)
                r2 = j0 * j0
                ratio = jnp.clip(r2 / jnp.maximum(d2, 1e-12), 0.0, 1.0)
                cos_a_max = _safe_sqrt(1.0 - ratio)
                sr = _sample_cone(_normalize(sw), 1.0 - cos_a_max, u1, u2)
                so = _add(x, _scale(nl, eps))
                ts, hidx = intersect(so, sr)
                hit_light = lane_mask(
                    hidx, lambda i: mat_types[i] == int(MatType.LIGHT)) \
                    & (ts < 1e30)
                _, _, hc, he, _ = select_mesh_params(hidx)
                lit = (jnp.maximum(hc[0], 0.001), jnp.maximum(hc[1], 0.001),
                       jnp.maximum(hc[2], 0.001))
                cos_term = jnp.maximum(0.001, _dot(sr, nl))
                weight = 2.0 * (1.0 - cos_a_max)
                if cfg.use_volumetrics:
                    # Beer-Lambert fog attenuation of shadow rays
                    # (lighting.py, raytracer.glsl:1198-1202)
                    t_fog = jnp.exp(-cfg.vol_sigma_t * jnp.minimum(ts, inf))
                    weight_t = weight * cos_term * t_fog
                else:
                    weight_t = weight * cos_term
                contrib = _scale(_mul(lit, he), weight_t)
                zero3 = (0.0 * tr,) * 3
                contrib = _where3(hit_light, contrib, zero3)
                if cfg.use_mis:
                    has_e = _dot(contrib, contrib) > 1e-6
                    l_pdf = sphere_light_pdf(lp[0], lp[1], lp[2], j0, x)
                    ldir = _normalize(sw)
                    b_pdf = jnp.maximum(0.0, _dot(ldir, nl)) * ONE_OVER_PI
                    wgt = _power_heuristic(l_pdf, b_pdf)
                    contrib = _where3(has_e, _scale(contrib, wgt), zero3)
                tr = tr + contrib[0]
                tg = tg + contrib[1]
                tb = tb + contrib[2]
            elif l_mat == int(MatType.LIGHT):
                # SDF-bound area light (round 5, VERDICT r4 next #4):
                # random point on the bounding ellipsoid
                # (lighting.direct_light_slot:60-65, raytracer.glsl:
                # 1205-1217), no solid-angle weight, no fog term
                su1, su2 = _uniform2(pix, pass_u, samp_u, depth_u,
                                     np.uint32(slot),
                                     np.uint32(rng_mod.Stream.NEE_SDF_POINT))
                z = 1.0 - 2.0 * su1
                rr = _safe_sqrt(1.0 - z * z)
                phi = TWO_PI * su2
                j1 = sv[li][_C_J1]
                j2 = sv[li][_C_J2]
                ld = (lp[0] + rr * jnp.cos(phi) * j0,
                      lp[1] + rr * jnp.sin(phi) * j1,
                      lp[2] + z * j2)
                sr = _normalize(_sub(ld, x))
                so = _add(x, _scale(nl, eps))
                ts, hidx = intersect(so, sr)
                hit_light = lane_mask(
                    hidx, lambda i: mat_types[i] == int(MatType.LIGHT)) \
                    & (ts < 1e30)
                _, _, hc, he, _ = select_mesh_params(hidx)
                lit = (jnp.maximum(hc[0], 0.001), jnp.maximum(hc[1], 0.001),
                       jnp.maximum(hc[2], 0.001))
                cos_term = jnp.maximum(0.001, _dot(sr, nl))
                contrib = _scale(_mul(lit, he), cos_term)
                zero3 = (0.0 * tr,) * 3
                contrib = _where3(hit_light, contrib, zero3)
                if cfg.use_mis:
                    # uniform-sphere fallback pdf for non-sphere area
                    # lights (lighting.light_pdf_slot, raytracer.glsl:
                    # 1261)
                    has_e = _dot(contrib, contrib) > 1e-6
                    sw = _sub(lp, x)
                    ldir = _normalize(sw)
                    b_pdf = jnp.maximum(0.0, _dot(ldir, nl)) * ONE_OVER_PI
                    wgt = _power_heuristic(
                        jnp.full_like(tr, 1.0 / FOUR_PI), b_pdf)
                    contrib = _where3(has_e, _scale(contrib, wgt), zero3)
                tr = tr + contrib[0]
                tg = tg + contrib[1]
                tb = tb + contrib[2]
            elif l_mat == int(MatType.DIR_LIGHT):
                # directional light: mesh.pos IS the direction; lit when
                # the occlusion ray to infinity misses
                # (lighting.direct_light_slot:67-68,103, raytracer.glsl:
                # 1220-1227).  Under MIS the light-slot pdf is 0
                # (light_pdf_slot gates on MatType.LIGHT), so the power-
                # heuristic weight vanishes — mirrored exactly.
                inv_len = 1.0 / jnp.sqrt(jnp.maximum(
                    lp[0] * lp[0] + lp[1] * lp[1] + lp[2] * lp[2], 1e-12))
                srd = (jnp.full_like(tr, lp[0] * inv_len),
                       jnp.full_like(tr, lp[1] * inv_len),
                       jnp.full_like(tr, lp[2] * inv_len))
                so = _add(x, _scale(nl, eps))
                ts, _hidx = intersect(so, srd)
                missed_s = ts > 1e30
                lc = (sv[li][_C_CR] * sv[li][_C_ER],
                      sv[li][_C_CG] * sv[li][_C_EG],
                      sv[li][_C_CB] * sv[li][_C_EB])
                cosw = jnp.maximum(
                    0.001, lp[0] * nl[0] + lp[1] * nl[1] + lp[2] * nl[2])
                contrib = (lc[0] * cosw, lc[1] * cosw, lc[2] * cosw)
                zero3 = (0.0 * tr,) * 3
                contrib = _where3(missed_s, contrib, zero3)
                if cfg.use_mis:
                    contrib = zero3  # l_pdf = 0 -> zero heuristic weight
                tr = tr + contrib[0]
                tg = tg + contrib[1]
                tb = tb + contrib[2]
        return (tr, tg, tb)

    zeros = jnp.zeros_like(o[0])
    ones = jnp.ones_like(o[0])
    # (initial carry values live in _st0 — the single source of truth;
    #  bounce() only ever sees the unpacked carry)
    _img_textured = [i for i in range(n_mesh)
                     if (tex_slots or texlight_refs is not None
                         or gloss_refs is not None)
                     and len(tex_types) == n_mesh
                     and int(TexType.IMAGE0) <= tex_types[i]
                     <= int(TexType.IMAGE3)
                     and (opts_ce[i][0] or opts_ce[i][1])]
    # DIFF rows: placeholder-texel throughput deferral (ntex groups);
    # LIGHT rows: terminal emissive-hit records (round 4) — the hit's
    # contribution mask*c*e*mis is linear in the texel and nothing
    # downstream depends on it, exactly like a cubemap fetch
    img_rows = [i for i in _img_textured
                if tex_slots and mat_types[i] == int(MatType.DIFF)]
    img_light_rows = [i for i in _img_textured
                      if texlight_refs is not None
                      and mat_types[i] == int(MatType.LIGHT)]
    # gloss-coupled rows (round 5, VERDICT r4 next #3): SPEC surfaces
    # whose image texel feeds emission-as-glossiness (and/or color) —
    # the texel steers the bounce DIRECTION (raytracer.glsl:1812-1813),
    # so the lane exports a suffix-resume record and dies; the host
    # resolves the true texel, reproduces the brdf commit (bsdf.sample
    # SPEC semantics, same RNG stream), and relaunches the suffix.
    img_gloss_rows = [i for i in _img_textured
                      if gloss_refs is not None
                      and mat_types[i] == int(MatType.SPEC)]

    if cfg.use_spectral:
        hero_wl = _hero_wavelength(pix, pass_u, samp_u)

    if restir_fused is not None:
        restir_vertex = _build_restir_vertex(
            meta, cfg, sv, g, pix, pass_u, samp_u,
            restir_fused["height"], restir_fused["width"],
            restir_fused["taps_ref"], restir_fused["hist_ref"],
            restir_fused.get("row0", 0))

    def bounce(depth_u, st):
        """One bounce on the explicit lane-state carry.  `depth_u` is a
        numpy constant when unrolled (bit-identical constant folding) or
        a traced uint32 under fori_loop.  The boolean lane masks travel
        as f32 0/1 (Mosaic can't carry i1 vectors through scf loops)."""
        res_carry = None
        if restir_fused is not None:
            (o, d, mask, acc, active_f, specular_f, prev_nl,
             ndif, nspec, nscat, r_ws, r_m, r_w, r_age, r_idx) = st
            res_carry = (r_ws, r_m, r_w, r_age, r_idx)
            ntex = None
        elif tex_slots:
            (o, d, mask, acc, active_f, specular_f, prev_nl,
             ndif, nspec, nscat, ntex) = st
        else:
            (o, d, mask, acc, active_f, specular_f, prev_nl,
             ndif, nspec, nscat) = st
            ntex = None

        def acc_add(acc, gate, vr, vg, vb, cnt=None):
            """Accumulate a gated contribution; with the image-texture
            split, route it to the group selected by the lane's current
            texture-vertex count (group 0 stays in the carry, the rest
            read-modify-write tex_acc_refs)."""
            if not tex_slots:
                return (acc[0] + jnp.where(gate, vr, 0.0),
                        acc[1] + jnp.where(gate, vg, 0.0),
                        acc[2] + jnp.where(gate, vb, 0.0))
            g0 = gate & (cnt == 0)
            out = (acc[0] + jnp.where(g0, vr, 0.0),
                   acc[1] + jnp.where(g0, vg, 0.0),
                   acc[2] + jnp.where(g0, vb, 0.0))
            for g in range(1, tex_slots + 1):
                selg = gate & (cnt == g)
                for j, v in enumerate((vr, vg, vb)):
                    r = tex_acc_refs[3 * (g - 1) + j]
                    r[...] = jnp.where(selg, r[...] + v, r[...])
            return out

        active = active_f > 0.5
        specular = specular_f > 0.5
        tmin, idx = intersect(o, d)
        missed_now = tmin > 1e30
        t_eff = jnp.where(missed_now, inf, tmin)

        # ---- participating medium event (integrator.trace semantics,
        # raytracer.glsl:1999-2053) ----
        if cfg.use_volumetrics:
            u_fp = _uniform(pix, pass_u, samp_u, depth_u,
                            np.uint32(rng_mod.Stream.VOL_FREEPATH))
            scatter_d = -jnp.log(jnp.maximum(u_fp, 1e-6)) / cfg.vol_sigma_t
            scatters = active & (scatter_d < jnp.minimum(inf, tmin))
            scatter_pos = _add(o, _scale(d, scatter_d))
            vol_w = cfg.vol_sigma_s / cfg.vol_sigma_t
            mask = (jnp.where(scatters, mask[0] * vol_w, mask[0]),
                    jnp.where(scatters, mask[1] * vol_w, mask[1]),
                    jnp.where(scatters, mask[2] * vol_w, mask[2]))

            # in-scatter NEE at the medium event (_volumetric_nee,
            # raytracer.glsl:2011-2044) — sphere lights only (gate)
            if cfg.sample_lights and any(li >= 0 for li in lights):
                vr, vg, vb = zeros, zeros, zeros
                for slot, li in enumerate(lights):
                    if li < 0:
                        continue
                    if not (mat_types[li] == int(MatType.LIGHT)
                            and mesh_types[li] == int(MeshType.SPHERE)):
                        continue
                    lp = mesh_p(li)
                    l_r = sv[li][_C_J0]
                    dl = _sub(lp, scatter_pos)
                    dist = jnp.sqrt(jnp.maximum(_dot(dl, dl), 1e-12))
                    r2 = l_r * l_r
                    cos_a_max = _safe_sqrt(
                        1.0 - jnp.clip(r2 / jnp.maximum(dist * dist, 1e-12),
                                       0.0, 1.0))
                    vu1, vu2 = _uniform2(pix, pass_u, samp_u, depth_u,
                                         np.uint32(slot),
                                         np.uint32(rng_mod.Stream.VOL_NEE))
                    inv = 1.0 / dist
                    dir_l = _sample_cone((dl[0] * inv, dl[1] * inv,
                                          dl[2] * inv),
                                         1.0 - cos_a_max, vu1, vu2)
                    sh_o = _add(scatter_pos, _scale(dir_l, eps * 20.0))
                    sh_t, sh_idx = intersect(sh_o, dir_l)
                    reached = (sh_idx == li) & (sh_t < 1e30)
                    omega = 2.0 * (1.0 - cos_a_max)
                    phase = _hg_phase(_dot(d, dir_l), cfg.vol_g)
                    t_fog = jnp.exp(-cfg.vol_sigma_t * jnp.minimum(sh_t, inf))
                    sc = phase * t_fog * PI * omega
                    lc = (sv[li][_C_CR] * sv[li][_C_ER] * sc,
                          sv[li][_C_CG] * sv[li][_C_EG] * sc,
                          sv[li][_C_CB] * sv[li][_C_EB] * sc)
                    vr = vr + jnp.where(reached, lc[0], 0.0)
                    vg = vg + jnp.where(reached, lc[1], 0.0)
                    vb = vb + jnp.where(reached, lc[2], 0.0)
                acc = acc_add(acc, scatters, mask[0] * vr, mask[1] * vg,
                              mask[2] * vb, ntex)

            hg1, hg2 = _uniform2(pix, pass_u, samp_u, depth_u,
                                 np.uint32(rng_mod.Stream.VOL_PHASE))
            hg_dir = _sample_hg(d, cfg.vol_g, hg1, hg2)
            nscat = nscat + jnp.where(scatters, 1, 0)
            specular = specular & ~scatters
            vol_done = scatters & (
                (nscat >= cfg.max_scattering_events)
                | (jnp.maximum(mask[0], jnp.maximum(mask[1], mask[2])) < 0.01))
            active = active & ~vol_done
        else:
            scatters = jnp.zeros_like(active)

        surface = active & ~scatters & ~missed_now

        # ---- miss: sky (NEE-suppressed for non-specular paths) ----
        missed = active & ~scatters & missed_now
        if cfg.sample_lights:
            env_allowed = specular
        else:
            env_allowed = jnp.ones_like(specular)
        if cfg.use_procedural_sky:
            hsky = jnp.clip(d[1] * 0.6 + 0.5, 0.3, 1.0)
            sky = _sky_palette_k(hsky)
        elif cfg.use_cubemap and pc_size:
            sky = _proc_cubemap_sample(d, pc_size)
        else:
            sky = None
        if sky is not None:
            env_gate = missed & env_allowed
            acc = acc_add(acc, env_gate, mask[0] * sky[0], mask[1] * sky[1],
                          mask[2] * sky[2], ntex)
        elif env_slots:
            # deferred cubemap: each lane misses at most once (miss
            # terminates) — record (throughput, direction) for the host
            env_gate = missed & env_allowed
            for j, v in enumerate((mask[0], mask[1], mask[2],
                                   d[0], d[1], d[2])):
                env_refs[j][...] = jnp.where(env_gate, v, env_refs[j][...])
        active = active & ~missed

        hit_pos = _add(o, _scale(d, t_eff))
        w_pos, w_j0, w_c, w_e, w_nt = select_mesh_params(idx)

        # normal per winner type (static masks)
        is_sph = lane_mask(idx, lambda i: mesh_types[i] == int(MeshType.SPHERE))
        is_pln = lane_mask(idx, lambda i: mesh_types[i] == int(MeshType.PLANE))
        n_sph = _normalize(_sub(hit_pos, w_pos))
        n_pln = _normalize(w_pos)
        hp = _sub(hit_pos, w_pos)
        half = w_j0 * 0.5
        dbx = jnp.abs(hp[0]) - half
        dby = jnp.abs(hp[1]) - half
        dbz = jnp.abs(hp[2]) - half
        sx = jnp.where((dbx >= dby) & (dbx >= dbz), jnp.sign(hp[0]), 0.0)
        sy = jnp.where((dby >= dbz) & (dby >= dbx), jnp.sign(hp[1]), 0.0)
        sz = jnp.where((dbz >= dbx) & (dbz >= dby), jnp.sign(hp[2]), 0.0)
        n_box = _normalize((sx, sy, sz))
        n = _where3(is_sph, n_sph, _where3(is_pln, n_pln, n_box))
        if n_sdf:
            # tetrahedral 4-tap finite-difference normal (sdf.calc_normal)
            is_sdf = lane_mask(
                idx, lambda i: mesh_types[i] == int(MeshType.SDF))
            # taps pinned to the origin on non-SDF lanes: far-away
            # evaluation of unbounded fields is NaN-prone (see sdf_march)
            tp = _where3(is_sdf, hit_pos, (zeros, zeros, zeros))
            gx = jnp.zeros_like(hit_pos[0])
            gy = jnp.zeros_like(hit_pos[0])
            gz = jnp.zeros_like(hit_pos[0])
            for kx, ky, kz in ((1.0, -1.0, -1.0), (-1.0, -1.0, 1.0),
                               (-1.0, 1.0, -1.0), (1.0, 1.0, 1.0)):
                tap, _ = sdf_map((tp[0] + kx * eps,
                                  tp[1] + ky * eps,
                                  tp[2] + kz * eps), sv)
                gx = gx + kx * tap
                gy = gy + ky * tap
                gz = gz + kz * tap
            n = _where3(is_sdf, _normalize((gx, gy, gz)), n)

        # ---- textured color / emission (integrator.py:190-205,
        # raytracer.glsl:2071-2077): per-present-type evaluation under
        # static lane masks, then mix on the raw colors before the clamp ----
        tex_rows = [i for i in range(n_mesh)
                    if len(tex_types) == n_mesh
                    and tex_types[i] != int(TexType.NONE)
                    and (opts_ce[i][0] or opts_ce[i][1])]
        if tex_rows:
            tp_cols = [jnp.zeros_like(tmin)] * 10
            for i in tex_rows:
                mi = idx == i
                for ci in range(10):
                    tp_cols[ci] = jnp.where(mi, sv[i][_C_TP + ci],
                                            tp_cols[ci])
            tp = tp_cols[0:4]
            cm = tp_cols[4:7]
            em = tp_cols[7:10]

            present = sorted({tex_types[i] for i in tex_rows})
            if any(t in _TEX_UV_TYPES for t in present):
                # dominant-normal-axis planar UV (intersect.parse_hit)
                na0, na1, na2 = jnp.abs(n[0]), jnp.abs(n[1]), jnp.abs(n[2])
                x_dom = (na0 > na1) & (na0 > na2)
                y_dom = (na1 > na0) & (na1 > na2)
                uv_u = jnp.where(x_dom, -hit_pos[2], hit_pos[0])
                uv_v = jnp.where(x_dom, -hit_pos[1],
                                 jnp.where(y_dom, hit_pos[2], -hit_pos[1]))
                # spherical UV for UV-textured *spheres* (round 5,
                # VERDICT r4 next #3: CHECK/RIPPLE-on-spheres at kernel
                # speed) — world-position based, the reference quirk
                # (raytracer.glsl:1055-1059; intersect.parse_hit:167-173)
                # via the polynomial asin/atan2 (~1e-7 rad vs XLA's, so
                # only CHECK/RIPPLE cell-boundary pixels can differ)
                sph_uv = [i for i in tex_rows
                          if tex_types[i] in _TEX_UV_TYPES
                          and mesh_types[i] == int(MeshType.SPHERE)]
                if sph_uv:
                    m_sph = lane_mask(idx, lambda i: i in sph_uv)
                    rho = jnp.sqrt(jnp.maximum(_dot(hit_pos, hit_pos),
                                               1e-12))
                    sphi = _asin_k(jnp.clip(hit_pos[1] / rho,
                                            -1.0 + 1e-6, 1.0 - 1e-6))
                    stheta = _atan2_k(hit_pos[2], hit_pos[0])
                    uv_u = jnp.where(m_sph, sphi * ONE_OVER_PI, uv_u)
                    uv_v = jnp.where(m_sph, stheta / TWO_PI, uv_v)
            scaled = (tp[0] * hit_pos[0], tp[1] * hit_pos[1],
                      tp[2] * hit_pos[2])

            texel = (zeros, zeros, zeros, zeros)

            def put(ttype, tex4):
                m = lane_mask(idx, lambda i: i in tex_rows
                              and tex_types[i] == ttype)
                return tuple(jnp.where(m, tv, old)
                             for tv, old in zip(tex4, texel))

            for t in present:
                if t == int(TexType.CHECK):
                    s = jnp.floor(tp[0] * uv_u) + jnp.floor(tp[1] * uv_v)
                    nmod = jnp.maximum(tp[2], 1e-6)
                    val = s - nmod * jnp.floor(s / nmod)
                    texel = put(t, (val, val, val, val))
                elif t == int(TexType.RIPPLE):
                    du = uv_u - tp[0]
                    dv = uv_v - tp[1]
                    dist = jnp.sqrt(du * du + dv * dv)
                    s = jnp.ceil(dist * tp[2])
                    nmod = jnp.maximum(tp[3], 1e-6)
                    val = s - nmod * jnp.floor(s / nmod)
                    texel = put(t, (val, val, val, val))
                elif t == int(TexType.VORONOI):
                    s1, s2, cid = _voronoi_k(scaled)
                    texel = put(t, (s1, s2, cid, zeros))
                elif t == int(TexType.GRADIENT_NOISE):
                    f = _gradient_noise_k(scaled)
                    tt_ = jnp.clip((f + 0.7) / 1.4, 0.0, 1.0)
                    val = tt_ * tt_ * (3.0 - 2.0 * tt_)
                    texel = put(t, (val, val, val, val))
                elif t == int(TexType.VALUE_NOISE):
                    val = _value_noise_k(scaled)
                    texel = put(t, (val, val, val, val))
                elif t == int(TexType.METAL):
                    val = _metal_fbm_k(scaled)
                    texel = put(t, (val, val, val, val))
                elif (tex_slots
                      and int(TexType.IMAGE0) <= t <= int(TexType.IMAGE3)):
                    # deferred image texture: fixed placeholder texel —
                    # the host wrapper divides the true/placeholder color
                    # ratio back in (see module docstring)
                    half = jnp.full_like(zeros, 0.5)
                    texel = put(t, (half, half, half, ones))

            gate_c = lane_mask(idx, lambda i: i in tex_rows
                               and opts_ce[i][0])
            gate_e = lane_mask(idx, lambda i: i in tex_rows
                               and opts_ce[i][1])
            bc = jnp.where(gate_c, texel[3], 0.0)
            be = jnp.where(gate_e, texel[3], 0.0)
            c = tuple(jnp.maximum(
                w_c[k] + (texel[k] * cm[k] - w_c[k]) * bc, 0.001)
                for k in range(3))
            e = tuple(jnp.maximum(
                w_e[k] + (texel[k] * em[k] - w_e[k]) * be, 0.001)
                for k in range(3))
        else:
            c = (jnp.maximum(w_c[0], 0.001), jnp.maximum(w_c[1], 0.001),
                 jnp.maximum(w_c[2], 0.001))
            e = (jnp.maximum(w_e[0], 0.001), jnp.maximum(w_e[1], 0.001),
                 jnp.maximum(w_e[2], 0.001))

        inside = -jnp.sign(_dot(d, n))
        inside = jnp.where(inside == 0.0, 1.0, inside)

        # ---- emissive termination + MIS (2079-2090) ----
        is_light = surface & lane_mask(
            idx, lambda i: mat_types[i] == int(MatType.LIGHT))
        if cfg.use_mis and cfg.sample_lights:
            ldir = _normalize(_sub(hit_pos, o))
            l_pdf = sphere_light_pdf(w_pos[0], w_pos[1], w_pos[2], w_j0, o)
            l_pdf = jnp.where(is_sph, l_pdf, 1.0 / FOUR_PI)
            b_pdf = jnp.maximum(0.0, _dot(ldir, prev_nl)) * ONE_OVER_PI
            mis_w = _power_heuristic(b_pdf, l_pdf)
            # depth-0 hits take weight 1 (constant-folds when unrolled)
            mis_w = jnp.where(~specular & (depth_u > np.uint32(0)),
                              mis_w, 1.0)
        else:
            mis_w = ones
        lgate = is_light
        if img_light_rows:
            # image-textured emitter: suppress the in-kernel accumulate
            # and export (throughput*mis, hit pos, idx, 1+group) — the
            # host resolves the true textured c*e (terminal, one record
            # per lane max)
            tex_light = lgate & lane_mask(
                idx, lambda i: i in img_light_rows)
            lgate = lgate & ~tex_light
            grp_f = (jnp.zeros_like(hit_pos[0]) if ntex is None
                     else ntex.astype(jnp.float32))
            for j, v in enumerate((
                    mask[0] * mis_w, mask[1] * mis_w, mask[2] * mis_w,
                    hit_pos[0], hit_pos[1], hit_pos[2],
                    idx.astype(jnp.float32), 1.0 + grp_f)):
                texlight_refs[j][...] = jnp.where(tex_light, v,
                                                  texlight_refs[j][...])
        acc = acc_add(acc, lgate, mask[0] * c[0] * e[0] * mis_w,
                      mask[1] * c[1] * e[1] * mis_w,
                      mask[2] * c[2] * e[2] * mis_w, ntex)
        active = active & ~is_light
        surface = surface & ~is_light
        # DIR_LIGHT-material surfaces terminate
        is_dirl = surface & lane_mask(
            idx, lambda i: mat_types[i] == int(MatType.DIR_LIGHT))
        active = active & ~is_dirl
        surface = surface & ~is_dirl

        if img_gloss_rows:
            # gloss-coupled vertex: record (hit pos, incoming dir,
            # pre-albedo throughput, winner idx, absolute depth,
            # counters) and kill the lane — one record per lane per
            # launch (the first gloss hit ends the lane; later gloss
            # hits belong to later resume launches)
            gl = surface & lane_mask(idx, lambda i: i in img_gloss_rows)
            # u32 -> f32 hops through i32 (no direct Mosaic cast)
            depth_g = jnp.zeros_like(hit_pos[0]) + (
                depth_u.astype(jnp.int32).astype(jnp.float32)
                if hasattr(depth_u, "astype") else float(int(depth_u)))
            gvals = (hit_pos[0], hit_pos[1], hit_pos[2],
                     d[0], d[1], d[2],
                     mask[0], mask[1], mask[2],
                     idx.astype(jnp.float32), depth_g,
                     ndif.astype(jnp.float32), nspec.astype(jnp.float32),
                     nscat.astype(jnp.float32),
                     jnp.ones_like(hit_pos[0]))

            @pl.when(jnp.any(gl))
            def _():
                for j, v in enumerate(gvals):
                    pltpu.store(gloss_refs[j], v, mask=gl)

            active = active & ~gl
            surface = surface & ~gl

        # ---- brdf (1804-1884) ----
        nl = _scale(n, inside)
        u1, u2 = _uniform2(pix, pass_u, samp_u, depth_u,
                           np.uint32(rng_mod.Stream.BSDF_DIR))
        uc = _uniform(pix, pass_u, samp_u, depth_u,
                      np.uint32(rng_mod.Stream.BSDF_CHOICE))
        rand_dir = _sample_biased(nl, u1, u2)
        # glossiness magnitude detached — must mirror ops/bsdf.py so the
        # hand-adjoint replay and jax.grad of the XLA path agree (the
        # reparam gradient through the perturbed direction is divergent
        # at geometric silhouettes; see bsdf.sample)
        rough = _mul(tuple(sg(ei) for ei in e), rand_dir)

        if cfg.use_spectral:
            # Cauchy dispersion: negative IoR encodes the A coefficient
            # (bsdf.sample / spectral.cauchy_ior, raytracer.glsl:355-358)
            lu = hero_wl * 0.001
            cauchy = jnp.abs(w_nt) + 0.04 / jnp.maximum(lu * lu, 1e-6)
            nt_raw = jnp.where(w_nt < 0.0, cauchy, w_nt)
        else:
            nt_raw = jnp.abs(w_nt)
        nt_eff = jnp.maximum(nt_raw, 1e-3)
        refl = _normalize(_add(rough, _reflect(d, nl)))

        entering = inside > 0.0
        nnt = jnp.where(entering, IOR_AIR / nt_eff, nt_eff / IOR_AIR)
        cos_i = _dot(d, nl)
        kk = 1.0 - nnt * nnt * (1.0 - cos_i * cos_i)
        tir = kk < 0.0
        sqk = _safe_sqrt(kk)
        tdir_raw = (nnt * d[0] - (nnt * cos_i + sqk) * nl[0],
                    nnt * d[1] - (nnt * cos_i + sqk) * nl[1],
                    nnt * d[2] - (nnt * cos_i + sqk) * nl[2])
        tdir_raw = _where3(tir, (zeros, zeros, zeros), tdir_raw)
        tdir = _normalize(_add(rough, tdir_raw))

        r0 = ((IOR_AIR - nt_eff) / (IOR_AIR + nt_eff)) ** 2
        csl = jnp.clip(1.0 + _dot(nl, d), 0.0, 1.0)
        re_schlick = r0 + (1.0 - r0) * csl ** 5
        cos_t2 = _dot(nl, tdir)
        rs_den = IOR_AIR * cos_i + nt_eff * cos_t2
        rp_den = IOR_AIR * cos_t2 + nt_eff * cos_i
        rs = ((IOR_AIR * cos_i - nt_eff * cos_t2)
              / jnp.where(jnp.abs(rs_den) < 1e-12, 1e-12, rs_den)) ** 2
        rp = ((IOR_AIR * cos_t2 - nt_eff * cos_i)
              / jnp.where(jnp.abs(rp_den) < 1e-12, 1e-12, rp_den)) ** 2
        re_fresnel = jnp.clip((rs + rp) * 0.5, 0.0, 1.0)

        is_diff = lane_mask(idx, lambda i: mat_types[i] == int(MatType.DIFF))
        is_spec = lane_mask(idx, lambda i: mat_types[i] == int(MatType.SPEC))
        is_refr_f = lane_mask(idx, lambda i: mat_types[i] == int(MatType.REFR_FRESNEL))
        is_refr_s = lane_mask(idx, lambda i: mat_types[i] == int(MatType.REFR_SCHLICK))
        is_refr = is_refr_f | is_refr_s
        is_coat = lane_mask(idx, lambda i: mat_types[i] == int(MatType.COAT))

        re = jnp.where(is_refr_f, re_fresnel, re_schlick)
        refl_choice = uc < re
        refr_reflects = tir | refl_choice
        coat_spec = uc < re_schlick

        new_d = _where3(is_diff, rand_dir,
                _where3(is_spec, refl,
                _where3(is_refr, _where3(refr_reflects, refl, tdir),
                _where3(coat_spec, refl, rand_dir))))
        o_out = _add(hit_pos, _scale(nl, eps))
        o_in = _sub(hit_pos, _scale(nl, eps))
        new_o = _where3(is_refr & ~refr_reflects, o_in, o_out)

        attenuates = is_diff | is_spec | (is_refr & ~refr_reflects) | (is_coat & ~coat_spec)
        mask_after = _where3(attenuates, _mul(mask, c), mask)
        bs_specular = is_spec | is_refr | (is_coat & coat_spec)

        if tex_slots:
            # deferred image texture: record this vertex (hit pos + mesh
            # idx — the host recomputes UV and the texel ratio) and bump
            # the per-lane texture-vertex count; contributions computed
            # *after* this vertex's albedo use the bumped count
            tex_hit = surface & lane_mask(idx, lambda i: i in img_rows)
            for k in range(tex_slots):
                selk = tex_hit & (ntex == k)
                for j, v in enumerate((hit_pos[0], hit_pos[1], hit_pos[2],
                                       idx, jnp.ones_like(hit_pos[0]))):
                    r = tex_refs[5 * k + j]
                    r[...] = jnp.where(selk, v, r[...])
            ntex_post = ntex + jnp.where(tex_hit, 1, 0)
        else:
            ntex_post = None

        one_i = jnp.ones_like(ndif)
        zero_i = jnp.zeros_like(ndif)
        diff_inc = jnp.where(is_diff | (is_coat & ~coat_spec), one_i, zero_i)
        spec_inc = jnp.where(is_spec | (is_refr & refr_reflects)
                             | (is_coat & coat_spec), one_i, zero_i)
        scat_inc = jnp.where(is_refr & ~refr_reflects, one_i, zero_i)

        diffuse_lane = surface & ~bs_specular

        if cfg.use_cubemap and (pc_size or env_slots):
            # ---- cubemap gather ray on diffuse bounces (integrator.py:
            # 239-250, raytracer.glsl:1888-1897): one biased-hemisphere
            # ray; env added where it escapes ----
            eu1, eu2 = _uniform2(pix, pass_u, samp_u, depth_u,
                                 np.uint32(rng_mod.Stream.ENV_DIR))
            env_dir = _sample_biased(nl, eu1, eu2)
            env_o = _add(hit_pos, _scale(nl, eps))
            env_t, _env_i = intersect(env_o, env_dir)
            env_missed = env_t > 1e30
            env_g = diffuse_lane & env_missed
            if pc_size:
                env_rad = _proc_cubemap_sample(env_dir, pc_size)
                acc = acc_add(acc, env_g, mask_after[0] * env_rad[0],
                              mask_after[1] * env_rad[1],
                              mask_after[2] * env_rad[2], ntex_post)
            else:
                # deferred cubemap: record the k-th diffuse env gather
                # (the weight already gates on the in-kernel escape test)
                for k in range(env_slots):
                    sel = env_g & (ndif == k)
                    base = 6 * (1 + k)
                    for j, v in enumerate((mask_after[0], mask_after[1],
                                           mask_after[2], env_dir[0],
                                           env_dir[1], env_dir[2])):
                        r = env_refs[base + j]
                        r[...] = jnp.where(sel, v, r[...])

        if restir_slots:
            # ---- G-buffer export instead of in-kernel NEE: the k-th
            # diffuse vertex of each lane records its shading inputs for
            # the host-side reservoir pipeline (ReSTIR split).
            # ONE masked store of the packed [12*slots, R, C] record per
            # bounce: masked VMEM stores cost ~200 cycles *per
            # instruction* on v5e regardless of width (measured: 48
            # separate field stores = 8.4 ms/slot/pass at 512²; carrying
            # the records through the rolled loop costs the same — Pallas
            # discharges in-loop ref writes into loop state), so the only
            # winning layout is minimum store count. ----
            ones_f = jnp.ones_like(hit_pos[0])
            depth_f = jnp.full_like(ones_f,
                                    depth_u.astype(jnp.int32)
                                    if hasattr(depth_u, "astype")
                                    else int(depth_u))
            for k in range(restir_slots):
                sel = diffuse_lane & (ndif == k)
                vals = (hit_pos[0], hit_pos[1], hit_pos[2],
                        nl[0], nl[1], nl[2],
                        mask_after[0], mask_after[1], mask_after[2],
                        idx.astype(jnp.float32), depth_f, ones_f)

                # a lane writes slot k during exactly one bounce, so most
                # (slot, bounce) pairs write nothing — skip them wholesale
                @pl.when(jnp.any(sel))
                def _(k=k, sel=sel, vals=vals):
                    for j, v in enumerate(vals):
                        pltpu.store(gbuf_refs[12 * k + j], v, mask=sel)
        elif restir_fused is not None:
            # ---- fused in-kernel ReSTIR: the whole reservoir pipeline
            # runs here and shades this vertex directly; the lane's
            # exported reservoir is the last diffuse vertex's (the
            # reference's g_final_reservoir overwrite, raytracer.glsl:
            # 1616, 2171-2174 — same commit rule as the XLA wavefront,
            # integrator.py:261-266) ----
            rs_out, rs_new = restir_vertex(hit_pos, nl, idx, depth_u)
            acc = acc_add(acc, diffuse_lane,
                          rs_out[0] * mask_after[0],
                          rs_out[1] * mask_after[1],
                          rs_out[2] * mask_after[2], ntex)
            res_carry = tuple(
                jnp.where(diffuse_lane, nv, ov)
                for nv, ov in zip(rs_new, res_carry))
        elif cfg.sample_lights and any(li >= 0 for li in lights):
            # ---- NEE ----
            nee = shade_nee(hit_pos, nl, depth_u)
            acc = acc_add(acc, diffuse_lane, nee[0] * mask_after[0],
                          nee[1] * mask_after[1], nee[2] * mask_after[2],
                          ntex_post)

        # ---- commit lane state ----
        o = _where3(surface, new_o, o)
        d = _where3(surface, new_d, d)
        mask = _where3(surface, mask_after, mask)
        # pure i1 bitwise select — Mosaic can't lower an i1 vector select
        specular = (surface & bs_specular) | (~surface & specular)
        prev_nl = _where3(surface, nl, prev_nl)
        ndif = ndif + jnp.where(surface, diff_inc, 0)
        nspec = nspec + jnp.where(surface, spec_inc, 0)
        nscat = nscat + jnp.where(surface, scat_inc, 0)

        cutoff = surface & (jnp.maximum(mask[0], jnp.maximum(mask[1], mask[2])) < 0.01)
        capped = surface & ((ndif >= cfg.max_diff_bounces)
                            | (nspec >= cfg.max_spec_bounces)
                            | (nscat >= cfg.max_scattering_events))
        active = active & ~(cutoff | capped)

        # volumetric lanes continue with the HG-scattered ray
        if cfg.use_volumetrics:
            o = _where3(scatters, scatter_pos, o)
            d = _where3(scatters, hg_dir, d)

        out = (o, d, mask, acc,
               jnp.where(active, 1.0, 0.0), jnp.where(specular, 1.0, 0.0),
               prev_nl, ndif, nspec, nscat)
        if restir_fused is not None:
            out = out + res_carry
        elif tex_slots:
            out = out + (ntex_post,)
        return out

    return bounce


def _st0(o, d, tex_slots=0, restir_fused=False):
    """Initial lane-state carry for the bounce loop."""
    zeros = jnp.zeros_like(o[0])
    ones = jnp.ones_like(o[0])
    zeros_i = jnp.zeros_like(o[0], jnp.int32)
    st = (o, d, (ones, ones, ones), (zeros, zeros, zeros),
          ones, ones, (zeros, ones, zeros),
          zeros_i, zeros_i, zeros_i)
    if restir_fused:
        # empty winner reservoir: ws, m, w, age = 0; light_index = -1
        st = st + (zeros, zeros, zeros, zeros, zeros_i - 1)
    elif tex_slots:
        st = st + (zeros_i,)  # ntex: image-texture vertices so far
    return st


def _trace_block(meta, cfg: RenderConfig, sv, pix, pass_u, samp_u, o, d,
                 unroll=True, restir_slots=0, env_slots=0,
                 gbuf_refs=None, env_refs=None, tex_slots=0,
                 tex_refs=None, tex_acc_refs=None, restir_fused=None,
                 texlight_refs=None, gate_from=None, gloss_refs=None,
                 st_init=None, depth_off=None):
    """Radiance of one SoA block.  Pure in (sv, o, d) — `sv` is a tuple of
    per-mesh 36-scalar tuples (the SMEM table snapshot) so `jax.vjp` of
    this function gives the exact adjoint w.r.t. scene params and rays.

    With `restir_slots > 0` the kernel runs the ReSTIR split (VERDICT r1
    next #1): diffuse-bounce NEE is *not* accumulated in-kernel; instead
    the k-th diffuse vertex per lane (k < restir_slots) exports a
    G-buffer record (hit pos, oriented normal, post-albedo throughput,
    winner mesh index, bounce depth, valid flag) and the return value is
    (acc, gbuf).  The host-side reservoir pipeline (ops/restir.py) then
    shades those vertices — the reference engages ReSTIR from brdf on
    exactly those bounces (raytracer.glsl:1899-1946)."""
    bounce = _build_bounce(meta, cfg, sv, pix, pass_u, samp_u, o,
                           restir_slots, env_slots, gbuf_refs, env_refs,
                           tex_slots, tex_refs, tex_acc_refs, restir_fused,
                           texlight_refs, gloss_refs=gloss_refs)
    st = _st0(o, d, tex_slots, restir_fused is not None) \
        if st_init is None else st_init
    if depth_off is not None:
        # suffix resume (gloss split): RNG streams key on each lane's
        # ABSOLUTE bounce depth, so resumed paths draw the exact randoms
        # the monolithic trace would; lanes whose absolute depth reaches
        # max_bounces are killed — the monolithic loop would have ended
        # them (raytracer.glsl:1994)
        _b = bounce

        def bounce(depth_u, s, _b=_b):
            abs_d = depth_u + depth_off
            act = jnp.where(abs_d >= np.uint32(cfg.max_bounces), 0.0, s[4])
            return _b(abs_d, (s[0], s[1], s[2], s[3], act) + s[5:])
    if unroll:
        # full unroll: short loops trace fast and spill nothing.
        # `gate_from` wraps bounce slots >= that depth in an
        # any-lane-alive lax.cond (used by the adjoint kernels, round 5:
        # cond transposes to cond, so dead tail slots skip BOTH the
        # forward replay and the transpose sweep — the forward's rolled
        # early exit, which the unrolled adjoint replay otherwise
        # loses).  bounce() is a no-op on dead lanes, so gating is
        # bit-exact.  (A round-2 attempt hit a Mosaic internal error on
        # mixed-i1 carried state; the carry has been all-f32/i32 since
        # the fused-ReSTIR refactor.)
        for depth in range(cfg.max_bounces):
            if gate_from is not None and depth >= gate_from:
                st = jax.lax.cond(
                    jnp.max(st[4]) > 0.5,
                    functools.partial(bounce, np.uint32(depth)),
                    lambda s: s, st)
            else:
                st = bounce(np.uint32(depth), st)
    else:
        # rolled loop: one traced bounce instead of max_bounces copies —
        # cuts Mosaic compile time ~linearly in max_bounces (the config-5
        # 12-bounce kernel compiled ~4.5 min unrolled on v5e, VERDICT r1
        # weak #3) at identical results (counter RNG keys on depth), and
        # avoids the unrolled body's register spills (27x faster measured)
        # while_loop with an all-lanes-dead early exit: once every lane
        # in the [BLOCK_ROWS, BLOCK_COLS] block has terminated (miss /
        # emitter hit / luminance cutoff), the remaining bounce slots are
        # identity and are skipped.  bounce() is a no-op on inactive
        # lanes, so this is bit-identical to running all slots.
        def _alive(c):
            i, s = c
            return (i < cfg.max_bounces) & (jnp.max(s[4]) > 0.5)

        _, st = jax.lax.while_loop(
            _alive,
            lambda c: (c[0] + 1, bounce(c[0].astype(jnp.uint32), c[1])),
            (jnp.int32(0), st))
    if restir_fused is not None:
        return st[3], st[10:15]
    return st[3]


def _load_scene_vals(ft_ref, n_mesh):
    return tuple(tuple(ft_ref[i, c] for c in range(_NCOLS))
                 for i in range(n_mesh))


# ----------------------------------------------------------------------
# forward kernel
# ----------------------------------------------------------------------

def _fwd_kernel_body(meta, cfg: RenderConfig, ft_ref, pp_ref,
                     ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, pix_ref,
                     r_ref, g_ref, b_ref):
    sv = _load_scene_vals(ft_ref, len(meta[0]))
    pass_u = pp_ref[0, 0].astype(jnp.uint32)
    samp_u = pp_ref[0, 1].astype(jnp.uint32)
    acc = _trace_block(meta, cfg, sv, pix_ref[:], pass_u, samp_u,
                       (ox_ref[:], oy_ref[:], oz_ref[:]),
                       (dx_ref[:], dy_ref[:], dz_ref[:]),
                       unroll=cfg.max_bounces < cfg.megakernel_unroll_below)
    r_ref[:] = acc[0]
    g_ref[:] = acc[1]
    b_ref[:] = acc[2]


def _scene_table(scene):
    """Pack the differentiable scene params into the SMEM f32 table."""
    return jnp.concatenate([
        scene.pos,                      # 0:3
        scene.joker,                    # 3:7
        scene.color,                    # 7:10
        scene.emission,                 # 10:13
        scene.ior[:, None],             # 13
        scene.aux,                      # 14:26
        scene.tex_params,               # 26:30
        scene.tex_cmask,                # 30:33
        scene.tex_emask,                # 33:36
    ], axis=1)


def _row_spec():
    return pl.BlockSpec((BLOCK_ROWS, BLOCK_COLS), lambda i, j: (i, j),
                        memory_space=pltpu.VMEM)


def _forward(scene, cfg: RenderConfig, ro, rd, pix, pass_idx, sample_idx):
    h, w = pix.shape
    assert h % BLOCK_ROWS == 0, f"height {h} not divisible by {BLOCK_ROWS}"
    assert w % BLOCK_COLS == 0, f"width {w} not divisible by {BLOCK_COLS}"
    meta = (scene.mesh_types_static, scene.mat_types_static,
            scene.lights_static, scene.sdf_shapes_static,
            scene.num_analytic, scene.tex_types_static, scene.opts_static,
            int(scene.cubemap.shape[1])
            if scene.cubemap_is_procedural else 0)

    ft = _scene_table(scene)
    pp = jnp.asarray([[pass_idx, sample_idx]], jnp.int32).reshape(1, 2)

    grid = (h // BLOCK_ROWS, w // BLOCK_COLS)
    row_spec = _row_spec()
    kernel = functools.partial(_fwd_kernel_body, meta, cfg)
    interpret = os.environ.get("RT0_PALLAS_INTERPRET") == "1"
    r, g, b = pl.pallas_call(
        kernel,
        grid=grid,
        interpret=interpret,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # ft
            pl.BlockSpec(memory_space=pltpu.SMEM),   # pp
            row_spec, row_spec, row_spec,            # o
            row_spec, row_spec, row_spec,            # d
            row_spec,                                # pix
        ],
        out_specs=[row_spec, row_spec, row_spec],
        out_shape=[jax.ShapeDtypeStruct((h, w), jnp.float32)] * 3,
    )(ft, pp, ro[..., 0], ro[..., 1], ro[..., 2],
      rd[..., 0], rd[..., 1], rd[..., 2], pix)
    return jnp.stack([r, g, b], axis=-1)


# ----------------------------------------------------------------------
# backward kernel: jax.vjp of the unrolled trace, inside the kernel
# ----------------------------------------------------------------------

def _bwd_gate_from():
    """First unrolled bounce slot the adjoint replay gates on
    any-lane-alive (trace-time; RT0_BWD_GATE_FROM opts in).  Default
    OFF: under vjp the lax.cond boundary selects between i1-vector
    residual tuples and Mosaic's arith.select has no scalar-pred
    lowering for vector<8x128xi1> operands (internal error, verified on
    v5e r5) — the same wall round 2 hit.  The dead-tail skip ships via
    the per-slot pl.when adjoint instead (no value-carrying branches)."""
    v = os.environ.get("RT0_BWD_GATE_FROM", "off")
    if v == "off":
        return None
    return int(v)


def _bwd_kernel_body(meta, cfg: RenderConfig, ft_ref, pp_ref,
                     ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, pix_ref,
                     ctr_ref, ctg_ref, ctb_ref,
                     dft_ref,
                     dox_ref, doy_ref, doz_ref, ddx_ref, ddy_ref, ddz_ref):
    n_mesh = len(meta[0])
    sv = _load_scene_vals(ft_ref, n_mesh)
    pass_u = pp_ref[0, 0].astype(jnp.uint32)
    samp_u = pp_ref[0, 1].astype(jnp.uint32)
    pix = pix_ref[:]
    o = (ox_ref[:], oy_ref[:], oz_ref[:])
    d = (dx_ref[:], dy_ref[:], dz_ref[:])

    def f(sv, o, d):
        # Always unrolled: Mosaic cannot lower the stacked (extensive)
        # residuals a reverse-mode lax.scan needs, so the adjoint replay
        # pays the unrolled compile (~46 s at 12 bounces, once per
        # config).  Measured alternatives on v5e (512², 12 bounces) all
        # lose to this whole-graph vjp (14.6 ms): hand-checkpointed
        # per-bounce vjp 15.5 ms, + VMEM-stash CSE barrier 16.2 ms,
        # fully rolled stash sweeps 17.9 ms (jax.checkpoint/remat2 and
        # optimization_barrier have no Mosaic lowering at all).
        # Round 5: bounce slots >= _bwd_gate_from() are lax.cond-gated
        # on any-lane-alive — the replay AND its transpose skip the dead
        # tail (the forward's early exit, recovered for the adjoint).
        return _trace_block(meta, cfg, sv, pix, pass_u, samp_u, o, d,
                            unroll=True, gate_from=_bwd_gate_from())

    # Forward is replayed block-resident (counter RNG ⇒ exact replay);
    # XLA's transpose of the unrolled loop is the exact adjoint.
    _, vjp = jax.vjp(f, sv, o, d)
    dsv, do, dd = vjp((ctr_ref[:], ctg_ref[:], ctb_ref[:]))

    dox_ref[:] = do[0]
    doy_ref[:] = do[1]
    doz_ref[:] = do[2]
    ddx_ref[:] = dd[0]
    ddy_ref[:] = dd[1]
    ddz_ref[:] = dd[2]

    # scene-parameter gradients: accumulate across the sequential grid
    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)
    for i in range(n_mesh):
        for c in range(_NCOLS):
            g = dsv[i][c]

            @pl.when(first)
            def _(i=i, c=c, g=g):
                dft_ref[i, c] = g

            @pl.when(~first)
            def _(i=i, c=c, g=g):
                dft_ref[i, c] = dft_ref[i, c] + g


# Per-slot stash adjoint (round 5, VERDICT r4 next #2): the whole-graph
# vjp replays ALL max_bounces slots unconditionally — the forward's
# rolled early exit (fwd(12 bounces) ~= fwd(4): most lanes die in a few
# bounces, BENCH_r04 adjoint sweep) is lost in the adjoint, which is why
# bwd/fwd grows super-linearly in depth (1.46/2.45/4.2 at 2/6/12).
# lax.cond gating is unavailable (Mosaic can't select i1-vector residual
# tuples), but pl.when regions carry no values — only ref effects — so:
#   fwd sweep: each slot, gated on any-lane-alive, reads the carry from
#     a VMEM stash, runs one bounce, writes carry + per-depth stash;
#   bwd sweep: each slot, gated on "slot ran", re-runs jax.vjp of that
#     ONE bounce from its stashed input and chains cotangents through
#     VMEM ct refs, accumulating scene-param cotangents in SMEM.
# Dead tail slots skip both sweeps entirely; per-slot residuals also
# bound the VMEM residual stack to one bounce.  Bit-exact: a skipped
# slot is the identity, whose vjp is the identity.

_ST_F = 17   # float carry channels: o3 d3 mask3 acc3 active spec prev_nl3
_ST_I = 3    # int carry channels: ndif nspec nscat (no cotangents)
_ST_RF = 4   # fused-ReSTIR extra float channels: ws m w age
_ST_RI = 1   # fused-ReSTIR extra int channel: winner light index


def _st_to_channels(st, restir=False):
    """Flatten the bounce carry into (floats, ints) channel lists."""
    (o, d, mask, acc, active_f, specular_f, prev_nl,
     ndif, nspec, nscat) = st[:10]
    floats = [*o, *d, *mask, *acc, active_f, specular_f, *prev_nl]
    ints = [ndif, nspec, nscat]
    if restir:
        r_ws, r_m, r_w, r_age, r_idx = st[10:15]
        floats += [r_ws, r_m, r_w, r_age]
        ints += [r_idx]
    return floats, ints


def _st_from_channels(floats, ints, restir=False):
    f = list(floats)
    st = ((f[0], f[1], f[2]), (f[3], f[4], f[5]), (f[6], f[7], f[8]),
          (f[9], f[10], f[11]), f[12], f[13], (f[14], f[15], f[16]),
          ints[0], ints[1], ints[2])
    if restir:
        st = st + (f[17], f[18], f[19], f[20], ints[3])
    return st


def _bwd_slotted_kernel_body(meta, cfg: RenderConfig, ft_ref, pp_ref,
                             ox_ref, oy_ref, oz_ref,
                             dx_ref, dy_ref, dz_ref, pix_ref,
                             ctr_ref, ctg_ref, ctb_ref,
                             dft_ref,
                             dox_ref, doy_ref, doz_ref,
                             ddx_ref, ddy_ref, ddz_ref,
                             stash_ref, ct_ref, ran_ref, dsv_ref):
    n_mesh = len(meta[0])
    nb = cfg.max_bounces
    sv = _load_scene_vals(ft_ref, n_mesh)
    pass_u = pp_ref[0, 0].astype(jnp.uint32)
    samp_u = pp_ref[0, 1].astype(jnp.uint32)
    pix = pix_ref[:]
    o = (ox_ref[:], oy_ref[:], oz_ref[:])
    d = (dx_ref[:], dy_ref[:], dz_ref[:])

    def bounce_of(sv_t):
        return _build_bounce(meta, cfg, sv_t, pix, pass_u, samp_u, o)

    bounce = bounce_of(sv)

    # ---- forward sweep: stash the input carry of every live slot ----
    floats0, ints0 = _st_to_channels(_st0(o, d))
    for c, v in enumerate(floats0):
        stash_ref[0, c] = v
    for c, v in enumerate(ints0):
        stash_ref[0, _ST_F + c] = v.astype(jnp.float32)
    ran_ref[0] = 1

    for k in range(nb):
        @pl.when(ran_ref[0] > k)
        def _(k=k):
            floats = [stash_ref[k, c] for c in range(_ST_F)]
            ints = [stash_ref[k, _ST_F + c].astype(jnp.int32)
                    for c in range(_ST_I)]
            st2 = bounce(np.uint32(k), _st_from_channels(floats, ints))
            f2, i2 = _st_to_channels(st2)
            for c, v in enumerate(f2):
                stash_ref[k + 1, c] = v
            for c, v in enumerate(i2):
                stash_ref[k + 1, _ST_F + c] = v.astype(jnp.float32)
            # dead-block early exit: stop running slots once every lane
            # in the block has terminated (f2[12] is active_f)
            alive = jnp.max(f2[12]) > 0.5
            ran_ref[0] = jnp.where(alive, k + 2, k + 1)

    # ---- cotangent init: loss sees only the final accumulator ----
    zeros = jnp.zeros_like(ctr_ref[:])
    for c in range(_ST_F):
        ct_ref[c] = zeros
    ct_ref[9] = ctr_ref[:]
    ct_ref[10] = ctg_ref[:]
    ct_ref[11] = ctb_ref[:]
    for i in range(n_mesh):
        for c in range(_NCOLS):
            dsv_ref[i, c] = 0.0

    # ---- backward sweep: one-slot vjp per ran slot, newest first ----
    for k in reversed(range(nb)):
        @pl.when(ran_ref[0] > k)
        def _(k=k):
            floats = [stash_ref[k, c] for c in range(_ST_F)]
            ints = [stash_ref[k, _ST_F + c].astype(jnp.int32)
                    for c in range(_ST_I)]

            def f(sv_t, fl):
                st2 = bounce_of(sv_t)(np.uint32(k),
                                      _st_from_channels(fl, ints))
                return _st_to_channels(st2)[0]

            _, vjp = jax.vjp(f, sv, floats)
            ct_out = [ct_ref[c] for c in range(_ST_F)]
            d_sv, d_fl = vjp(ct_out)
            for c in range(_ST_F):
                ct_ref[c] = d_fl[c]
            for i in range(n_mesh):
                for c in range(_NCOLS):
                    dsv_ref[i, c] = dsv_ref[i, c] + d_sv[i][c]

    # ---- emit ----
    dox_ref[:] = ct_ref[0]
    doy_ref[:] = ct_ref[1]
    doz_ref[:] = ct_ref[2]
    ddx_ref[:] = ct_ref[3]
    ddy_ref[:] = ct_ref[4]
    ddz_ref[:] = ct_ref[5]
    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)
    for i in range(n_mesh):
        for c in range(_NCOLS):
            g = dsv_ref[i, c]

            @pl.when(first)
            def _(i=i, c=c, g=g):
                dft_ref[i, c] = g

            @pl.when(~first)
            def _(i=i, c=c, g=g):
                dft_ref[i, c] = dft_ref[i, c] + g


def _bwd_slotted() -> bool:
    """Trace-time selection of the per-slot stash adjoint.

    Default ON (round 5 A/B on v5e, cornell 512² x 12 bounces, raygen
    included: fwd+bwd 7.90 -> 5.67 ms, bwd/fwd 2.25 -> 1.62, compile 94
    -> 45 s, grad fingerprints equal to f32 reassociation).  Set
    RT0_BWD_SLOTTED=0 for the round-4 whole-graph-vjp kernel."""
    return os.environ.get("RT0_BWD_SLOTTED", "1") == "1"


def _backward(scene, cfg: RenderConfig, ro, rd, pix, pass_idx, sample_idx, ct):
    h, w = pix.shape
    meta = (scene.mesh_types_static, scene.mat_types_static,
            scene.lights_static, scene.sdf_shapes_static,
            scene.num_analytic, scene.tex_types_static, scene.opts_static,
            int(scene.cubemap.shape[1])
            if scene.cubemap_is_procedural else 0)
    n_mesh = len(meta[0])

    ft = _scene_table(scene)
    pp = jnp.asarray([[pass_idx, sample_idx]], jnp.int32).reshape(1, 2)

    grid = (h // BLOCK_ROWS, w // BLOCK_COLS)
    row_spec = _row_spec()
    interpret = os.environ.get("RT0_PALLAS_INTERPRET") == "1"
    scratch = []
    if _bwd_slotted():
        kernel = functools.partial(_bwd_slotted_kernel_body, meta, cfg)
        scratch = [
            pltpu.VMEM((cfg.max_bounces + 1, _ST_F + _ST_I,
                        BLOCK_ROWS, BLOCK_COLS), jnp.float32),  # stash
            pltpu.VMEM((_ST_F, BLOCK_ROWS, BLOCK_COLS),
                       jnp.float32),                            # ct carry
            pltpu.SMEM((1,), jnp.int32),                        # ran
            pltpu.SMEM((n_mesh, _NCOLS), jnp.float32),          # dsv acc
        ]
    else:
        kernel = functools.partial(_bwd_kernel_body, meta, cfg)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        interpret=interpret,
        scratch_shapes=scratch,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # ft
            pl.BlockSpec(memory_space=pltpu.SMEM),   # pp
            row_spec, row_spec, row_spec,            # o
            row_spec, row_spec, row_spec,            # d
            row_spec,                                # pix
            row_spec, row_spec, row_spec,            # ct
        ],
        out_specs=[
            pl.BlockSpec((n_mesh, _NCOLS), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            row_spec, row_spec, row_spec,
            row_spec, row_spec, row_spec,
        ],
        out_shape=[jax.ShapeDtypeStruct((n_mesh, _NCOLS), jnp.float32)]
        + [jax.ShapeDtypeStruct((h, w), jnp.float32)] * 6,
    )(ft, pp, ro[..., 0], ro[..., 1], ro[..., 2],
      rd[..., 0], rd[..., 1], rd[..., 2], pix,
      ct[..., 0], ct[..., 1], ct[..., 2])
    dft, dox, doy, doz, ddx, ddy, ddz = outs
    d_ro = jnp.stack([dox, doy, doz], axis=-1)
    d_rd = jnp.stack([ddx, ddy, ddz], axis=-1)
    return dft, d_ro, d_rd


def _zero_cotangent(x):
    if jnp.issubdtype(jnp.result_type(x), jnp.floating):
        return jnp.zeros_like(x)
    return np.zeros(jnp.shape(x), jax.dtypes.float0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _trace_core(scene, cfg, ro, rd, pix, pass_idx, sample_idx):
    """Megakernel radiance (pre spectral-RGB scaling), bit-compatible with
    `integrator.trace` on the supported scene class.  Backward is the
    fused Pallas adjoint kernel."""
    return _forward(scene, cfg, ro, rd, pix, pass_idx, sample_idx)


def trace_forward(scene, cfg, ro, rd, pix, pass_idx, sample_idx):
    """Megakernel radiance, bit-compatible with `integrator.trace`.

    The hero-wavelength → RGB conversion (spectral.wavelength_to_rgb,
    raytracer.glsl:2153-2155) is a per-pixel constant w.r.t. all traced
    inputs (pure RNG), so it is applied outside the custom-vjp core —
    the adjoint kernel then sees the correctly scaled cotangent for free."""
    out = _trace_core(scene, cfg, ro, rd, pix, pass_idx, sample_idx)
    if cfg.use_spectral:
        from raytracer0_tpu.ops import spectral
        wl = spectral.sample_wavelength(
            rng_mod.uniform(pix, pass_idx, sample_idx,
                            rng_mod.Stream.WAVELENGTH))
        out = out * spectral.wavelength_to_rgb(wl)
    return out


def _fwd(scene, cfg, ro, rd, pix, pass_idx, sample_idx):
    out = _forward(scene, cfg, ro, rd, pix, pass_idx, sample_idx)
    return out, (scene, ro, rd, pix, pass_idx, sample_idx)


def _bwd(cfg, res, ct):
    scene, ro, rd, pix, pass_idx, sample_idx = res
    dft, d_ro, d_rd = _backward(scene, cfg, ro, rd, pix, pass_idx,
                                sample_idx, ct)
    d_scene = jax.tree.map(_zero_cotangent, scene)
    d_scene = d_scene.replace(
        pos=dft[:, _C_PX:_C_PZ + 1],
        joker=dft[:, _C_J0:_C_J3 + 1],
        color=dft[:, _C_CR:_C_CB + 1],
        emission=dft[:, _C_ER:_C_EB + 1],
        ior=dft[:, _C_NT],
        aux=dft[:, _C_AUX:_C_AUX + 12],
        tex_params=dft[:, _C_TP:_C_TP + 4],
        tex_cmask=dft[:, _C_CM:_C_CM + 3],
        tex_emask=dft[:, _C_EM:_C_EM + 3],
    )
    return d_scene, d_ro, d_rd, None, None, None


_trace_core.defvjp(_fwd, _bwd)

# ----------------------------------------------------------------------
# ReSTIR split: G-buffer forward kernel + standalone ray-cast kernel
# ----------------------------------------------------------------------

def _gbuf_kernel_body(meta, cfg: RenderConfig, slots, ft_ref, pp_ref,
                      ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                      pix_ref, *out_refs):
    sv = _load_scene_vals(ft_ref, len(meta[0]))
    pass_u = pp_ref[0, 0].astype(jnp.uint32)
    samp_u = pp_ref[0, 1].astype(jnp.uint32)
    gbuf_refs = out_refs[3:]
    # initialize the slot records (all f32; idx/depth decoded by the
    # wrapper — depth starts at -1)
    for n, r in enumerate(gbuf_refs):
        r[...] = jnp.full_like(r[...], -1.0 if n % 12 == 10 else 0.0)
    acc = _trace_block(
        meta, cfg, sv, pix_ref[:], pass_u, samp_u,
        (ox_ref[:], oy_ref[:], oz_ref[:]),
        (dx_ref[:], dy_ref[:], dz_ref[:]),
        unroll=cfg.max_bounces < cfg.megakernel_unroll_below,
        restir_slots=slots, gbuf_refs=gbuf_refs)
    out_refs[0][:] = acc[0]
    out_refs[1][:] = acc[1]
    out_refs[2][:] = acc[2]


def trace_forward_gbuffer(scene, cfg: RenderConfig, ro, rd, pix,
                          pass_idx, sample_idx, slots_override=None):
    """Path-trace radiance *minus diffuse-bounce NEE*, plus the per-
    diffuse-vertex G-buffer for the host-side reservoir pipeline.

    Returns (radiance [H, W, 3], gbuf) where gbuf is a list of
    `cfg.max_diff_bounces` dicts with keys pos [H,W,3], nl [H,W,3],
    mask [H,W,3], idx i32 [H,W], depth i32 [H,W], valid bool [H,W].
    Spectral RGB scaling is applied to the radiance only — the reference
    applies it to the whole frame *after* accumulation
    (raytracer.glsl:2153-2155), so the caller must scale the ReSTIR
    direct contribution with the same per-pixel weight.

    Forward-only (no custom VJP): the reservoir pipeline is not part of
    the gradient path — `sample_radiance` keeps gradients on the plain
    megakernel / XLA routes.
    """
    h, w = pix.shape
    assert supports_shape(h, w), (h, w)
    slots = slots_override or min(cfg.max_diff_bounces, cfg.max_bounces)
    meta = (scene.mesh_types_static, scene.mat_types_static,
            scene.lights_static, scene.sdf_shapes_static,
            scene.num_analytic, scene.tex_types_static, scene.opts_static,
            int(scene.cubemap.shape[1])
            if scene.cubemap_is_procedural else 0)
    ft = _scene_table(scene)
    pp = jnp.asarray([[pass_idx, sample_idx]], jnp.int32).reshape(1, 2)

    grid = (h // BLOCK_ROWS, w // BLOCK_COLS)
    row_spec = _row_spec()
    kernel = functools.partial(_gbuf_kernel_body, meta, cfg, slots)
    interpret = os.environ.get("RT0_PALLAS_INTERPRET") == "1"

    # 12 f32 record fields per slot (idx/depth are small exact ints
    # through the f32 roundtrip); per-(slot,bounce) stores are pl.when-
    # gated in the kernel — a lane writes its slot k during exactly one
    # bounce, so most pairs skip entirely
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        interpret=interpret,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # ft
            pl.BlockSpec(memory_space=pltpu.SMEM),   # pp
            row_spec, row_spec, row_spec,            # o
            row_spec, row_spec, row_spec,            # d
            row_spec,                                # pix
        ],
        out_specs=[row_spec] * (3 + 12 * slots),
        out_shape=[jax.ShapeDtypeStruct((h, w), jnp.float32)]
        * (3 + 12 * slots),
    )(ft, pp, ro[..., 0], ro[..., 1], ro[..., 2],
      rd[..., 0], rd[..., 1], rd[..., 2], pix)

    radiance = jnp.stack(outs[0:3], axis=-1)
    if cfg.use_spectral:
        from raytracer0_tpu.ops import spectral
        wl = spectral.sample_wavelength(
            rng_mod.uniform(pix, pass_idx, sample_idx,
                            rng_mod.Stream.WAVELENGTH))
        radiance = radiance * spectral.wavelength_to_rgb(wl)

    gbuf = []
    for k in range(slots):
        b = outs[3 + 12 * k: 3 + 12 * (k + 1)]
        gbuf.append(dict(
            pos=jnp.stack(b[0:3], axis=-1),
            nl=jnp.stack(b[3:6], axis=-1),
            mask=jnp.stack(b[6:9], axis=-1),
            idx=b[9].astype(jnp.int32), depth=b[10].astype(jnp.int32),
            valid=b[11] > 0.5,
        ))
    return radiance, gbuf


def supported_restir_fused(scene, cfg: RenderConfig) -> bool:
    """Can the fused in-kernel ReSTIR kernel serve this (scene, cfg)?
    Same scene class as the split path, plus identity temporal
    reprojection (the ad-hoc motion gather has no in-kernel analogue and
    routes to the split/XLA paths)."""
    return supported_restir(scene, cfg) and not cfg.restir_adhoc_motion


def _fused_restir_kernel_body(meta, cfg: RenderConfig, hw, ft_ref, pp_ref,
                              ox_ref, oy_ref, oz_ref,
                              dx_ref, dy_ref, dz_ref,
                              pix_ref, taps_ref, hist_ref,
                              r_ref, g_ref, b_ref, res_ref):
    sv = _load_scene_vals(ft_ref, len(meta[0]))
    pass_u = pp_ref[0, 0].astype(jnp.uint32)
    samp_u = pp_ref[0, 1].astype(jnp.uint32)
    row0 = pp_ref[0, 2]
    acc, res = _trace_block(
        meta, cfg, sv, pix_ref[:], pass_u, samp_u,
        (ox_ref[:], oy_ref[:], oz_ref[:]),
        (dx_ref[:], dy_ref[:], dz_ref[:]),
        unroll=cfg.max_bounces < cfg.megakernel_unroll_below,
        restir_fused=dict(taps_ref=taps_ref, hist_ref=hist_ref,
                          height=hw[0], width=hw[1], row0=row0))
    r_ref[:] = acc[0]
    g_ref[:] = acc[1]
    b_ref[:] = acc[2]
    res_ref[_RES_WS] = res[0]
    res_ref[_RES_M] = res[1]
    res_ref[_RES_W] = res[2]
    res_ref[_RES_AGE] = res[3]
    res_ref[_RES_IDX] = res[4].astype(jnp.float32)


def trace_forward_restir_fused(scene, cfg: RenderConfig, ro, rd, pix,
                               pass_idx, sample_idx, back5, hist5):
    """Fused ReSTIR render kernel: path trace + all four reservoir
    phases + reservoir shading in ONE Pallas kernel (VERDICT r3 next #1
    design (a) — the split G-buffer contract hit a measured ~8.4 ms/slot
    Mosaic loop-state export floor; this exports 5 reservoir channels
    plus radiance instead of 12 x max_diff_bounces G-buffer channels,
    and eliminates the separate XLA phase pass and cast_rays launches).

    `back5`  — previous frame's packed reservoirs [5, H, W]
               (weight_sum, M, W, age, light_index-as-f32);
    `hist5`  — temporal history levels [2, 5, H, W], same packing.

    Returns (radiance [H, W, 3] *pre spectral scaling*, new packed
    reservoirs [5, H, W]).  Spatial taps are pre-rolled here in XLA by
    the 8 static Poisson offsets so every in-kernel tap is an aligned
    block read (the rolls are two static slices each — the same trick
    the XLA phase path uses, restir.py:386-397).
    """
    h, w = pix.shape
    assert supports_shape(h, w), (h, w)
    taps = roll_taps(back5)
    return _fused_restir_call(scene, cfg, ro, rd, pix, pass_idx,
                              sample_idx, taps, hist5,
                              jnp.int32(0), h, w)


def roll_taps(back5):
    """Pre-roll the packed back-reservoir grid by the 8 static Poisson
    offsets: tap i's value for pixel (r, c) sits at [i, :, r, c]."""
    from raytracer0_tpu.ops.restir import POISSON_DISK, SPATIAL_RADIUS

    return jnp.stack([
        jnp.roll(back5,
                 (-int(round(dy * SPATIAL_RADIUS)),
                  -int(round(dx * SPATIAL_RADIUS))),
                 axis=(1, 2))
        for dx, dy in POISSON_DISK])                      # [8, 5, H, W]


def trace_forward_restir_fused_band(scene, cfg: RenderConfig, ro, rd, pix,
                                    pass_idx, sample_idx, taps_full,
                                    hist5_full, row0, full_height):
    """Band-mode fused ReSTIR (round 4): render rows [row0, row0+band)
    of a `full_height`-tall image with the same fused kernel — the
    full-resolution pre-rolled taps and history are dynamically sliced
    to the band, and the kernel offsets its global row coordinates by
    `row0`.  Powers ReSTIR tile rendering at fused-kernel speed
    (render/tiles.py; the reference's tile mode keeps its ReSTIR buffers
    full-resolution the same way, index.js:762-793)."""
    band, w = pix.shape
    assert supports_shape(band, w), (band, w)
    taps = jax.lax.dynamic_slice_in_dim(taps_full, row0, band, axis=2)
    hist = jax.lax.dynamic_slice_in_dim(hist5_full, row0, band, axis=2)
    return _fused_restir_call(scene, cfg, ro, rd, pix, pass_idx,
                              sample_idx, taps, hist,
                              jnp.asarray(row0, jnp.int32),
                              full_height, w)


def _fused_meta(scene):
    return (scene.mesh_types_static, scene.mat_types_static,
            scene.lights_static, scene.sdf_shapes_static,
            scene.num_analytic, scene.tex_types_static, scene.opts_static,
            int(scene.cubemap.shape[1])
            if scene.cubemap_is_procedural else 0)


def _fused_restir_fwd_impl(scene, cfg: RenderConfig, ro, rd, pix, pass_idx,
                           sample_idx, taps, hist5, row0, full_h, full_w):
    h, w = pix.shape
    meta = _fused_meta(scene)
    ft = _scene_table(scene)
    pp = jnp.stack([jnp.asarray(pass_idx, jnp.int32),
                    jnp.asarray(sample_idx, jnp.int32),
                    jnp.asarray(row0, jnp.int32)]).reshape(1, 3)

    grid = (h // BLOCK_ROWS, w // BLOCK_COLS)
    row_spec = _row_spec()
    kernel = functools.partial(_fused_restir_kernel_body, meta, cfg,
                               (full_h, full_w))
    interpret = os.environ.get("RT0_PALLAS_INTERPRET") == "1"
    n_taps = taps.shape[0]
    r, g, b, res5 = pl.pallas_call(
        kernel,
        grid=grid,
        interpret=interpret,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # ft
            pl.BlockSpec(memory_space=pltpu.SMEM),   # pp
            row_spec, row_spec, row_spec,            # o
            row_spec, row_spec, row_spec,            # d
            row_spec,                                # pix
            pl.BlockSpec((n_taps, _RES_CH, BLOCK_ROWS, BLOCK_COLS),
                         lambda i, j: (0, 0, i, j),
                         memory_space=pltpu.VMEM),   # taps
            pl.BlockSpec((2, _RES_CH, BLOCK_ROWS, BLOCK_COLS),
                         lambda i, j: (0, 0, i, j),
                         memory_space=pltpu.VMEM),   # hist
        ],
        out_specs=[row_spec, row_spec, row_spec,
                   pl.BlockSpec((_RES_CH, BLOCK_ROWS, BLOCK_COLS),
                                lambda i, j: (0, i, j),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((h, w), jnp.float32)] * 3
        + [jax.ShapeDtypeStruct((_RES_CH, h, w), jnp.float32)],
    )(ft, pp, ro[..., 0], ro[..., 1], ro[..., 2],
      rd[..., 0], rd[..., 1], rd[..., 2], pix, taps, hist5)
    return jnp.stack([r, g, b], axis=-1), res5


def _fused_restir_bwd_kernel_body(meta, cfg: RenderConfig, hw, ft_ref,
                                  pp_ref, ox_ref, oy_ref, oz_ref,
                                  dx_ref, dy_ref, dz_ref,
                                  pix_ref, taps_ref, hist_ref,
                                  ctr_ref, ctg_ref, ctb_ref, ctres_ref,
                                  dft_ref,
                                  dox_ref, doy_ref, doz_ref,
                                  ddx_ref, ddy_ref, ddz_ref,
                                  dtaps_ref, dhist_ref):
    """Adjoint of the fused ReSTIR megakernel (VERDICT r4 next #1).

    Same recipe as `_bwd_kernel_body`: the fused trace — bounce loop +
    all four reservoir phases + reservoir shading — is a pure function
    of (scene table, primary ray, spatial-tap values, temporal-history
    values) per block, so the backward kernel replays it block-resident
    under `jax.vjp` (counter RNG ⇒ exact replay) and XLA's transpose is
    the exact adjoint.  Cotangents flow through candidate weights,
    reservoir combines, finalize bias/W and shading — with the discrete
    light selections detached (the light-index channel is int-cast on
    read, exactly the semantics the FD-linearity tests pin,
    tests/test_restir.py:183-214)."""
    n_mesh = len(meta[0])
    sv = _load_scene_vals(ft_ref, n_mesh)
    pass_u = pp_ref[0, 0].astype(jnp.uint32)
    samp_u = pp_ref[0, 1].astype(jnp.uint32)
    row0 = pp_ref[0, 2]
    pix = pix_ref[:]
    o = (ox_ref[:], oy_ref[:], oz_ref[:])
    d = (dx_ref[:], dy_ref[:], dz_ref[:])
    taps_v = taps_ref[...]
    hist_v = hist_ref[...]

    def f(sv, o, d, taps_v, hist_v):
        # _build_restir_vertex indexes taps/hist as [slot, channel] block
        # reads — identical syntax on refs and on these value arrays, so
        # the forward body is reused verbatim with the values traced as
        # vjp inputs.
        acc, res = _trace_block(
            meta, cfg, sv, pix, pass_u, samp_u, o, d,
            unroll=True, gate_from=_bwd_gate_from(),
            restir_fused=dict(taps_ref=taps_v, hist_ref=hist_v,
                              height=hw[0], width=hw[1], row0=row0))
        return acc, res[:4]  # float channels; winner index detached

    _, vjp = jax.vjp(f, sv, o, d, taps_v, hist_v)
    ct_acc = (ctr_ref[:], ctg_ref[:], ctb_ref[:])
    ct_res = tuple(ctres_ref[c] for c in range(_RES_CH - 1))
    dsv, do, dd, dtaps, dhist = vjp((ct_acc, ct_res))

    dox_ref[:] = do[0]
    doy_ref[:] = do[1]
    doz_ref[:] = do[2]
    ddx_ref[:] = dd[0]
    ddy_ref[:] = dd[1]
    ddz_ref[:] = dd[2]
    dtaps_ref[...] = dtaps
    dhist_ref[...] = dhist

    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)
    for i in range(n_mesh):
        for c in range(_NCOLS):
            g = dsv[i][c]

            @pl.when(first)
            def _(i=i, c=c, g=g):
                dft_ref[i, c] = g

            @pl.when(~first)
            def _(i=i, c=c, g=g):
                dft_ref[i, c] = dft_ref[i, c] + g


def _fused_restir_bwd_slotted_kernel_body(
        meta, cfg: RenderConfig, hw, ft_ref, pp_ref,
        ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
        pix_ref, taps_ref, hist_ref,
        ctr_ref, ctg_ref, ctb_ref, ctres_ref,
        dft_ref,
        dox_ref, doy_ref, doz_ref, ddx_ref, ddy_ref, ddz_ref,
        dtaps_ref, dhist_ref,
        stash_ref, ct_ref, ran_ref, dsv_ref):
    """Per-slot stash adjoint of the fused ReSTIR kernel (the
    `_bwd_slotted_kernel_body` scheme extended with the 5-channel
    reservoir carry and per-slot tap/history cotangent accumulation).
    Dead tail slots skip both sweeps; the vjp residual stack is bounded
    to ONE bounce+vertex, so no raised VMEM cap is needed."""
    n_mesh = len(meta[0])
    nb = cfg.max_bounces
    nf = _ST_F + _ST_RF
    ni = _ST_I + _ST_RI
    sv = _load_scene_vals(ft_ref, n_mesh)
    pass_u = pp_ref[0, 0].astype(jnp.uint32)
    samp_u = pp_ref[0, 1].astype(jnp.uint32)
    row0 = pp_ref[0, 2]
    pix = pix_ref[:]
    o = (ox_ref[:], oy_ref[:], oz_ref[:])
    d = (dx_ref[:], dy_ref[:], dz_ref[:])
    taps_v = taps_ref[...]
    hist_v = hist_ref[...]

    def bounce_of(sv_t, taps_t, hist_t):
        return _build_bounce(
            meta, cfg, sv_t, pix, pass_u, samp_u, o,
            restir_fused=dict(taps_ref=taps_t, hist_ref=hist_t,
                              height=hw[0], width=hw[1], row0=row0))

    bounce = bounce_of(sv, taps_v, hist_v)

    # ---- forward sweep ----
    floats0, ints0 = _st_to_channels(_st0(o, d, restir_fused=True),
                                     restir=True)
    for c, v in enumerate(floats0):
        stash_ref[0, c] = v
    for c, v in enumerate(ints0):
        stash_ref[0, nf + c] = v.astype(jnp.float32)
    ran_ref[0] = 1

    for k in range(nb):
        @pl.when(ran_ref[0] > k)
        def _(k=k):
            floats = [stash_ref[k, c] for c in range(nf)]
            ints = [stash_ref[k, nf + c].astype(jnp.int32)
                    for c in range(ni)]
            st2 = bounce(np.uint32(k),
                         _st_from_channels(floats, ints, restir=True))
            f2, i2 = _st_to_channels(st2, restir=True)
            for c, v in enumerate(f2):
                stash_ref[k + 1, c] = v
            for c, v in enumerate(i2):
                stash_ref[k + 1, nf + c] = v.astype(jnp.float32)
            alive = jnp.max(f2[12]) > 0.5
            ran_ref[0] = jnp.where(alive, k + 2, k + 1)

    # ---- cotangent init: radiance + final reservoir floats ----
    zeros = jnp.zeros_like(ctr_ref[:])
    for c in range(nf):
        ct_ref[c] = zeros
    ct_ref[9] = ctr_ref[:]
    ct_ref[10] = ctg_ref[:]
    ct_ref[11] = ctb_ref[:]
    for c in range(_ST_RF):
        ct_ref[_ST_F + c] = ctres_ref[c]
    for i in range(n_mesh):
        for c in range(_NCOLS):
            dsv_ref[i, c] = 0.0
    dtaps_ref[...] = jnp.zeros_like(dtaps_ref[...])
    dhist_ref[...] = jnp.zeros_like(dhist_ref[...])

    # ---- backward sweep ----
    for k in reversed(range(nb)):
        @pl.when(ran_ref[0] > k)
        def _(k=k):
            floats = [stash_ref[k, c] for c in range(nf)]
            ints = [stash_ref[k, nf + c].astype(jnp.int32)
                    for c in range(ni)]

            def f(sv_t, fl, taps_t, hist_t):
                st2 = bounce_of(sv_t, taps_t, hist_t)(
                    np.uint32(k), _st_from_channels(fl, ints, restir=True))
                return _st_to_channels(st2, restir=True)[0]

            _, vjp = jax.vjp(f, sv, floats, taps_v, hist_v)
            ct_out = [ct_ref[c] for c in range(nf)]
            d_sv, d_fl, d_tp, d_hs = vjp(ct_out)
            for c in range(nf):
                ct_ref[c] = d_fl[c]
            dtaps_ref[...] = dtaps_ref[...] + d_tp
            dhist_ref[...] = dhist_ref[...] + d_hs
            for i in range(n_mesh):
                for c in range(_NCOLS):
                    dsv_ref[i, c] = dsv_ref[i, c] + d_sv[i][c]

    # ---- emit ----
    dox_ref[:] = ct_ref[0]
    doy_ref[:] = ct_ref[1]
    doz_ref[:] = ct_ref[2]
    ddx_ref[:] = ct_ref[3]
    ddy_ref[:] = ct_ref[4]
    ddz_ref[:] = ct_ref[5]
    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)
    for i in range(n_mesh):
        for c in range(_NCOLS):
            g = dsv_ref[i, c]

            @pl.when(first)
            def _(i=i, c=c, g=g):
                dft_ref[i, c] = g

            @pl.when(~first)
            def _(i=i, c=c, g=g):
                dft_ref[i, c] = dft_ref[i, c] + g


def _fused_bwd_slotted() -> bool:
    """Per-slot stash adjoint for the fused ReSTIR kernel
    (RT0_FUSED_BWD_SLOTTED; trace-time)."""
    return os.environ.get("RT0_FUSED_BWD_SLOTTED", "0") == "1"


def _fused_restir_backward(scene, cfg: RenderConfig, ro, rd, pix,
                           pass_idx, sample_idx, taps, hist5, row0,
                           full_h, full_w, ct_rad, ct_res5):
    h, w = pix.shape
    meta = _fused_meta(scene)
    n_mesh = len(meta[0])
    ft = _scene_table(scene)
    pp = jnp.stack([jnp.asarray(pass_idx, jnp.int32),
                    jnp.asarray(sample_idx, jnp.int32),
                    jnp.asarray(row0, jnp.int32)]).reshape(1, 3)

    grid = (h // BLOCK_ROWS, w // BLOCK_COLS)
    row_spec = _row_spec()
    interpret = os.environ.get("RT0_PALLAS_INTERPRET") == "1"
    scratch = []
    if _fused_bwd_slotted():
        kernel = functools.partial(_fused_restir_bwd_slotted_kernel_body,
                                   meta, cfg, (full_h, full_w))
        nf = _ST_F + _ST_RF
        ni = _ST_I + _ST_RI
        scratch = [
            pltpu.VMEM((cfg.max_bounces + 1, nf + ni,
                        BLOCK_ROWS, BLOCK_COLS), jnp.float32),  # stash
            pltpu.VMEM((nf, BLOCK_ROWS, BLOCK_COLS), jnp.float32),  # ct
            pltpu.SMEM((1,), jnp.int32),                        # ran
            pltpu.SMEM((len(meta[0]), _NCOLS), jnp.float32),    # dsv acc
        ]
        # residuals bounded to one bounce+vertex: default scope suffices
        params = pltpu.CompilerParams()
    else:
        kernel = functools.partial(_fused_restir_bwd_kernel_body, meta,
                                   cfg, (full_h, full_w))
        # The whole-graph vjp residual stack overflows the default
        # 16 MiB scoped-VMEM budget (~33 MiB at 6 bounces); raise the
        # per-kernel cap — v5e has 128 MiB physical VMEM.
        params = pltpu.CompilerParams(
            vmem_limit_bytes=int(os.environ.get("RT0_BWD_VMEM_MB", "96"))
            * 1024 * 1024)
    n_taps = taps.shape[0]
    tap_spec = pl.BlockSpec((n_taps, _RES_CH, BLOCK_ROWS, BLOCK_COLS),
                            lambda i, j: (0, 0, i, j),
                            memory_space=pltpu.VMEM)
    hist_spec = pl.BlockSpec((2, _RES_CH, BLOCK_ROWS, BLOCK_COLS),
                             lambda i, j: (0, 0, i, j),
                             memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        interpret=interpret,
        compiler_params=params,
        scratch_shapes=scratch,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # ft
            pl.BlockSpec(memory_space=pltpu.SMEM),   # pp
            row_spec, row_spec, row_spec,            # o
            row_spec, row_spec, row_spec,            # d
            row_spec,                                # pix
            tap_spec,                                # taps
            hist_spec,                               # hist
            row_spec, row_spec, row_spec,            # ct radiance
            pl.BlockSpec((_RES_CH - 1, BLOCK_ROWS, BLOCK_COLS),
                         lambda i, j: (0, i, j),
                         memory_space=pltpu.VMEM),   # ct reservoir floats
        ],
        out_specs=[
            pl.BlockSpec((n_mesh, _NCOLS), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            row_spec, row_spec, row_spec,
            row_spec, row_spec, row_spec,
            tap_spec, hist_spec,
        ],
        out_shape=[jax.ShapeDtypeStruct((n_mesh, _NCOLS), jnp.float32)]
        + [jax.ShapeDtypeStruct((h, w), jnp.float32)] * 6
        + [jax.ShapeDtypeStruct(taps.shape, jnp.float32),
           jax.ShapeDtypeStruct(hist5.shape, jnp.float32)],
    )(ft, pp, ro[..., 0], ro[..., 1], ro[..., 2],
      rd[..., 0], rd[..., 1], rd[..., 2], pix, taps, hist5,
      ct_rad[..., 0], ct_rad[..., 1], ct_rad[..., 2],
      ct_res5[:_RES_CH - 1])
    dft, dox, doy, doz, ddx, ddy, ddz, dtaps, dhist = outs
    d_ro = jnp.stack([dox, doy, doz], axis=-1)
    d_rd = jnp.stack([ddx, ddy, ddz], axis=-1)
    return dft, d_ro, d_rd, dtaps, dhist


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 10, 11))
def _fused_restir_call(scene, cfg: RenderConfig, ro, rd, pix, pass_idx,
                       sample_idx, taps, hist5, row0, full_h, full_w):
    """Differentiable fused ReSTIR launch: forward is the single fused
    Pallas kernel; backward is `_fused_restir_backward` — gradients
    w.r.t. scene parameters, primary rays, the pre-rolled spatial taps
    and the temporal history (reservoirs as differentiable state,
    BASELINE.json north star).  The tap/history cotangents transpose
    through `roll_taps` / halo exchange / band slicing in XLA above this
    call, so the single-chip, band and sharded paths are all trainable."""
    return _fused_restir_fwd_impl(scene, cfg, ro, rd, pix, pass_idx,
                                  sample_idx, taps, hist5, row0,
                                  full_h, full_w)


def _fused_restir_vjp_fwd(scene, cfg, ro, rd, pix, pass_idx, sample_idx,
                          taps, hist5, row0, full_h, full_w):
    out = _fused_restir_fwd_impl(scene, cfg, ro, rd, pix, pass_idx,
                                 sample_idx, taps, hist5, row0,
                                 full_h, full_w)
    return out, (scene, ro, rd, pix, pass_idx, sample_idx, taps, hist5,
                 row0)


def _fused_restir_vjp_bwd(cfg, full_h, full_w, res, ct):
    scene, ro, rd, pix, pass_idx, sample_idx, taps, hist5, row0 = res
    ct_rad, ct_res5 = ct
    dft, d_ro, d_rd, d_taps, d_hist = _fused_restir_backward(
        scene, cfg, ro, rd, pix, pass_idx, sample_idx, taps, hist5,
        row0, full_h, full_w, ct_rad, ct_res5)
    d_scene = jax.tree.map(_zero_cotangent, scene)
    d_scene = d_scene.replace(
        pos=dft[:, _C_PX:_C_PZ + 1],
        joker=dft[:, _C_J0:_C_J3 + 1],
        color=dft[:, _C_CR:_C_CB + 1],
        emission=dft[:, _C_ER:_C_EB + 1],
        ior=dft[:, _C_NT],
        aux=dft[:, _C_AUX:_C_AUX + 12],
        tex_params=dft[:, _C_TP:_C_TP + 4],
        tex_cmask=dft[:, _C_CM:_C_CM + 3],
        tex_emask=dft[:, _C_EM:_C_EM + 3],
    )
    return (d_scene, d_ro, d_rd, None, None, None, d_taps, d_hist, None)


_fused_restir_call.defvjp(_fused_restir_vjp_fwd, _fused_restir_vjp_bwd)


def _cast_kernel_body(meta, cfg: RenderConfig, ft_ref,
                      ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                      t_ref, idx_ref):
    sv = _load_scene_vals(ft_ref, len(meta[0]))
    g = _geometry(meta, cfg, sv)
    t, idx = g.intersect((ox_ref[:], oy_ref[:], oz_ref[:]),
                         (dx_ref[:], dy_ref[:], dz_ref[:]))
    t_ref[:] = t
    idx_ref[:] = idx


def cast_rays(scene, cfg: RenderConfig, ro, rd):
    """Fused nearest-hit query (shadow/visibility rays): the megakernel's
    intersector as a standalone kernel, so the host-side ReSTIR phases
    get Pallas-speed occlusion tests instead of the XLA march.

    Returns (t, idx, missed) with `ops.intersect` conventions:
    t = cfg.infinity and idx = 0 on miss."""
    h, w = ro.shape[:-1]
    assert supports_shape(h, w), (h, w)
    meta = (scene.mesh_types_static, scene.mat_types_static,
            scene.lights_static, scene.sdf_shapes_static,
            scene.num_analytic, scene.tex_types_static, scene.opts_static,
            int(scene.cubemap.shape[1])
            if scene.cubemap_is_procedural else 0)
    ft = _scene_table(scene)
    grid = (h // BLOCK_ROWS, w // BLOCK_COLS)
    row_spec = _row_spec()
    kernel = functools.partial(_cast_kernel_body, meta, cfg)
    interpret = os.environ.get("RT0_PALLAS_INTERPRET") == "1"
    t, idx = pl.pallas_call(
        kernel,
        grid=grid,
        interpret=interpret,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [row_spec] * 6,
        out_specs=[row_spec, row_spec],
        out_shape=[jax.ShapeDtypeStruct((h, w), jnp.float32),
                   jax.ShapeDtypeStruct((h, w), jnp.int32)],
    )(ft, ro[..., 0], ro[..., 1], ro[..., 2],
      rd[..., 0], rd[..., 1], rd[..., 2])
    missed = t > 1e30
    return jnp.where(missed, cfg.infinity, t), jnp.where(missed, 0, idx), missed


# ----------------------------------------------------------------------
# Deferred-cubemap forward kernel (photographic/user cubemaps)
# ----------------------------------------------------------------------

def supported_env(scene, cfg: RenderConfig) -> bool:
    """Can the deferred-cubemap split serve this (scene, cfg)?  Same
    class as `supported` except the cubemap is *photographic* — the
    kernel exports (weight, direction) records for every cubemap fetch
    (all terminal; see _build_bounce) and the host wrapper resolves them
    with full-resolution XLA bilinear gathers (index.js:302-331,
    raytracer.glsl:2059-2063, 1888-1897)."""
    return (
        _geometry_supported(scene)
        and not cfg.use_restir
        and cfg.use_cubemap
        and not scene.cubemap_is_procedural
        and cfg.use_biased_sampling
        and int(cfg.render_mode) == int(RenderMode.STATIC)
    )


def _env_kernel_body(meta, cfg: RenderConfig, slots, ft_ref, pp_ref,
                     ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                     pix_ref, *out_refs):
    sv = _load_scene_vals(ft_ref, len(meta[0]))
    pass_u = pp_ref[0, 0].astype(jnp.uint32)
    samp_u = pp_ref[0, 1].astype(jnp.uint32)
    env_refs = out_refs[3:]
    for r in env_refs:
        r[...] = jnp.zeros_like(r[...])
    acc = _trace_block(
        meta, cfg, sv, pix_ref[:], pass_u, samp_u,
        (ox_ref[:], oy_ref[:], oz_ref[:]),
        (dx_ref[:], dy_ref[:], dz_ref[:]),
        unroll=cfg.max_bounces < cfg.megakernel_unroll_below,
        env_slots=slots, env_refs=env_refs)
    out_refs[0][:] = acc[0]
    out_refs[1][:] = acc[1]
    out_refs[2][:] = acc[2]


def _env_forward(scene, cfg: RenderConfig, ro, rd, pix, pass_idx,
                 sample_idx):
    from raytracer0_tpu.ops import sky as sky_mod

    h, w = pix.shape
    assert supports_shape(h, w), (h, w)
    slots = min(cfg.max_diff_bounces, cfg.max_bounces)
    meta = (scene.mesh_types_static, scene.mat_types_static,
            scene.lights_static, scene.sdf_shapes_static,
            scene.num_analytic, scene.tex_types_static, scene.opts_static,
            0)  # photographic cubemap: pc_size = 0 engages the deferral
    ft = _scene_table(scene)
    pp = jnp.asarray([[pass_idx, sample_idx]], jnp.int32).reshape(1, 2)

    grid = (h // BLOCK_ROWS, w // BLOCK_COLS)
    row_spec = _row_spec()
    kernel = functools.partial(_env_kernel_body, meta, cfg, slots)
    interpret = os.environ.get("RT0_PALLAS_INTERPRET") == "1"
    n_rec = 1 + slots
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        interpret=interpret,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # ft
            pl.BlockSpec(memory_space=pltpu.SMEM),   # pp
            row_spec, row_spec, row_spec,            # o
            row_spec, row_spec, row_spec,            # d
            row_spec,                                # pix
        ],
        out_specs=[row_spec] * (3 + 6 * n_rec),
        out_shape=[jax.ShapeDtypeStruct((h, w), jnp.float32)] * (3 + 6 * n_rec),
    )(ft, pp, ro[..., 0], ro[..., 1], ro[..., 2],
      rd[..., 0], rd[..., 1], rd[..., 2], pix)

    radiance = jnp.stack(outs[0:3], axis=-1)
    # resolve the deferred fetches: full-res bilinear gathers in XLA,
    # all records batched into ONE sample_cubemap call (one gather op
    # per bilinear tap instead of n_rec) — zero-weight records contribute
    # nothing (dir may be the zero vector; sample_cubemap's axis floor
    # keeps it finite)
    wgt = jnp.stack([jnp.stack(outs[3 + 6 * r: 3 + 6 * r + 3], axis=-1)
                     for r in range(n_rec)])           # [n_rec, H, W, 3]
    dirv = jnp.stack([jnp.stack(outs[3 + 6 * r + 3: 3 + 6 * r + 6], axis=-1)
                      for r in range(n_rec)])
    env = jnp.sum(wgt * sky_mod.sample_cubemap(scene.cubemap, dirv), axis=0)
    radiance = radiance + env

    if cfg.use_spectral:
        from raytracer0_tpu.ops import spectral
        wl = spectral.sample_wavelength(
            rng_mod.uniform(pix, pass_idx, sample_idx,
                            rng_mod.Stream.WAVELENGTH))
        radiance = radiance * spectral.wavelength_to_rgb(wl)
    return radiance


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def trace_forward_env(scene, cfg: RenderConfig, ro, rd, pix, pass_idx,
                      sample_idx):
    """Megakernel radiance with a photographic cubemap, bit-compatible
    with `integrator.trace` (the deferred fetches use the same
    `sky.sample_cubemap` the XLA path uses).

    Backward recomputes through the XLA wavefront integrator: the fused
    Pallas adjoint does not model the env exports, and cubemap-scene
    gradients were XLA-routed before this fast path existed — forward
    speed comes from the kernel, gradient semantics stay exactly the
    XLA path's (including d/d(cubemap texels))."""
    return _env_forward(scene, cfg, ro, rd, pix, pass_idx, sample_idx)


def _env_fwd(scene, cfg, ro, rd, pix, pass_idx, sample_idx):
    out = _env_forward(scene, cfg, ro, rd, pix, pass_idx, sample_idx)
    return out, (scene, ro, rd, pix, pass_idx, sample_idx)


def _env_bwd(cfg, res, ct):
    scene, ro, rd, pix, pass_idx, sample_idx = res
    from raytracer0_tpu.render import integrator

    sdf_march = None
    if scene.num_sdfs > 0:
        from raytracer0_tpu.ops import sdf as sdf_ops
        sdf_march = sdf_ops.march

    def f(scene, ro, rd):
        return integrator.trace(scene, cfg, ro, rd, pix, pass_idx,
                                sample_idx, sdf_march=sdf_march)

    _, vjp = jax.vjp(f, scene, ro, rd)
    d_scene, d_ro, d_rd = vjp(ct)
    return d_scene, d_ro, d_rd, None, None, None


trace_forward_env.defvjp(_env_fwd, _env_bwd)


# ----------------------------------------------------------------------
# Deferred image-texture forward kernel (IMAGE0-3, incl. UV spheres)
# ----------------------------------------------------------------------

def supported_imgtex(scene, cfg: RenderConfig) -> bool:
    """Can the deferred image-texture split serve this (scene, cfg)?

    Image-textured rows must be DIFF analytic meshes with color-only
    blending (so the texel only scales throughput — no texel->direction
    coupling through emission-as-glossiness and no emissive-texture
    terms; raytracer.glsl:726-772, 1812, 2071-2077).  Other textured
    rows follow the in-kernel procedural rules.  A photographic cubemap
    would need group-tagged env records — that combination stays on the
    XLA path."""
    if not scene.tex_types_used:
        return False  # texture-free: the plain megakernel path serves it
    tts = scene.tex_types_static
    opts = scene.opts_static
    mts = scene.mesh_types_static
    mats = scene.mat_types_static
    if len(tts) != len(mts) or len(opts) != len(tts):
        return False
    has_img = False
    for i, tt in enumerate(tts):
        if tt == int(TexType.NONE) or not (opts[i][0] or opts[i][1]):
            continue
        if int(TexType.IMAGE0) <= tt <= int(TexType.IMAGE3):
            has_img = True
            analytic = mts[i] in (int(MeshType.SPHERE), int(MeshType.PLANE),
                                  int(MeshType.BOX))
            diff_ok = (mats[i] == int(MatType.DIFF)
                       and opts[i][0] and not opts[i][1])
            # LIGHT rows (round 4): the emissive hit is *terminal* and
            # linear in the texel, so it defers like a cubemap fetch —
            # any color/emission blending allowed (raytracer.glsl:
            # 2071-2090); NEE reads the untextured material on all paths
            light_ok = mats[i] == int(MatType.LIGHT)
            if not (analytic and (diff_ok or light_ok)):
                return False
        else:
            if tt not in _TEX_KERNEL_OK:
                return False
            if tt in _TEX_UV_TYPES and mts[i] == int(MeshType.SPHERE):
                return False
    return (
        has_img
        and _geometry_supported(scene, check_textures=False)
        and not cfg.use_restir
        and (not cfg.use_cubemap or scene.cubemap_is_procedural)
        and cfg.use_biased_sampling
        and int(cfg.render_mode) == int(RenderMode.STATIC)
    )


def _imgtex_kernel_body(meta, cfg: RenderConfig, slots, has_light,
                        ft_ref, pp_ref,
                        ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                        pix_ref, *out_refs):
    sv = _load_scene_vals(ft_ref, len(meta[0]))
    pass_u = pp_ref[0, 0].astype(jnp.uint32)
    samp_u = pp_ref[0, 1].astype(jnp.uint32)
    tex_acc_refs = out_refs[3:3 + 3 * slots]
    tex_refs = out_refs[3 + 3 * slots:3 + 8 * slots]
    texlight_refs = out_refs[3 + 8 * slots:] if has_light else None
    for r in out_refs[3:]:
        r[...] = jnp.zeros_like(r[...])
    acc = _trace_block(
        meta, cfg, sv, pix_ref[:], pass_u, samp_u,
        (ox_ref[:], oy_ref[:], oz_ref[:]),
        (dx_ref[:], dy_ref[:], dz_ref[:]),
        unroll=cfg.max_bounces < cfg.megakernel_unroll_below,
        tex_slots=slots, tex_refs=tex_refs, tex_acc_refs=tex_acc_refs,
        texlight_refs=texlight_refs)
    out_refs[0][:] = acc[0]
    out_refs[1][:] = acc[1]
    out_refs[2][:] = acc[2]


def _onehot_rows(idx, table):
    """Per-lane row select from a tiny [n, C] f32 table as a one-hot MXU
    contraction (the restir._row_select trick — a TPU gather costs ~ms
    per op at 512² regardless of table size)."""
    n = table.shape[0]
    oh = (idx[..., None] == jnp.arange(n, dtype=idx.dtype)).astype(jnp.float32)
    return jnp.einsum("...n,nc->...c", oh, table,
                      precision=jax.lax.Precision.HIGHEST)


def _imgtex_rho(scene, idx, pos, valid):
    """True/placeholder color ratio for one texture-vertex record.

    Recomputes the winner's normal and UV from (mesh idx, hit pos) with
    the exact `ops/intersect.parse_hit` formulas (spherical asin/atan2
    for spheres — raytracer.glsl:1055-1076), fetches the true texel with
    the same differentiable bilinear the XLA path uses, and divides out
    the kernel's 0.5-gray placeholder blend."""
    from raytracer0_tpu.ops import textures as tex_ops
    from raytracer0_tpu.ops import vecmath as vm

    table = jnp.concatenate([
        jnp.asarray(scene.mesh_type, jnp.float32)[:, None],   # 0
        scene.pos,                                            # 1:4
        scene.color,                                          # 4:7
        scene.tex_cmask,                                      # 7:10
        scene.opts[:, 0:1].astype(jnp.float32),               # 10
        jnp.asarray(scene.tex_type, jnp.float32)[:, None],    # 11
        scene.joker[:, 0:1],                                  # 12
    ], axis=1)
    row = _onehot_rows(idx, table)
    mesh_t = row[..., 0]
    center = row[..., 1:4]
    mat_c = row[..., 4:7]
    cm = row[..., 7:10]
    opt0 = row[..., 10]
    tex_t = row[..., 11]
    size = row[..., 12]

    is_sphere = mesh_t == float(MeshType.SPHERE)
    is_plane = mesh_t == float(MeshType.PLANE)
    n_sph = vm.normalize(pos - center)
    n_pln = vm.normalize(center)
    hp = pos - center
    half = (size * 0.5)[..., None]
    db = jnp.abs(hp) - half
    sx = jnp.where((db[..., 0] >= db[..., 1]) & (db[..., 0] >= db[..., 2]),
                   jnp.sign(hp[..., 0]), 0.0)
    sy = jnp.where((db[..., 1] >= db[..., 2]) & (db[..., 1] >= db[..., 0]),
                   jnp.sign(hp[..., 1]), 0.0)
    sz = jnp.where((db[..., 2] >= db[..., 0]) & (db[..., 2] >= db[..., 1]),
                   jnp.sign(hp[..., 2]), 0.0)
    n_box = vm.normalize(jnp.stack([sx, sy, sz], axis=-1))
    n = jnp.where(is_sphere[..., None], n_sph,
        jnp.where(is_plane[..., None], n_pln, n_box))

    # spherical UV from the *world* hit position (parse_hit)
    rho_l = vm.safe_length(pos)
    phi = jnp.arcsin(jnp.clip(pos[..., 1] / rho_l, -1.0 + 1e-6, 1.0 - 1e-6))
    theta = jnp.arctan2(pos[..., 2], pos[..., 0])
    uv_sph = jnp.stack([phi / PI, theta / (2.0 * PI)], axis=-1)
    na = jnp.abs(n)
    x_dom = (na[..., 0] > na[..., 1]) & (na[..., 0] > na[..., 2])
    y_dom = (na[..., 1] > na[..., 0]) & (na[..., 1] > na[..., 2])
    uv_x = jnp.stack([-pos[..., 2], -pos[..., 1]], axis=-1)
    uv_y = jnp.stack([pos[..., 0], pos[..., 2]], axis=-1)
    uv_z = jnp.stack([pos[..., 0], -pos[..., 1]], axis=-1)
    uv = jnp.where(is_sphere[..., None], uv_sph,
         jnp.where(x_dom[..., None], uv_x,
         jnp.where(y_dom[..., None], uv_y, uv_z)))

    present = set(scene.tex_types_static)
    texel = jnp.zeros(uv.shape[:-1] + (4,), jnp.float32)
    for k in range(4):
        if int(TexType.IMAGE0) + k in present:
            tx = tex_ops.bilinear_wrap(scene.images[k], uv)
            texel = jnp.where((tex_t == float(int(TexType.IMAGE0) + k))
                              [..., None], tx, texel)

    bc = (opt0 * texel[..., 3])[..., None]
    c_true = jnp.maximum(mat_c + (texel[..., :3] * cm - mat_c) * bc, 0.001)
    c0 = jnp.maximum(mat_c + (0.5 * cm - mat_c) * opt0[..., None], 0.001)
    return jnp.where(valid[..., None], c_true / c0, 1.0)


def _imgtex_light_ce(scene, idx, pos, valid):
    """True textured c*e for an exported emissive-hit record (image-
    textured LIGHT rows, round 4): recompute UV from (mesh idx, hit pos)
    exactly like _imgtex_rho, blend BOTH color and emission masks
    (integrator.py:193-205 formulas), return c*e."""
    from raytracer0_tpu.ops import textures as tex_ops
    from raytracer0_tpu.ops import vecmath as vm

    table = jnp.concatenate([
        jnp.asarray(scene.mesh_type, jnp.float32)[:, None],   # 0
        scene.pos,                                            # 1:4
        scene.color,                                          # 4:7
        scene.tex_cmask,                                      # 7:10
        scene.opts[:, 0:1].astype(jnp.float32),               # 10
        jnp.asarray(scene.tex_type, jnp.float32)[:, None],    # 11
        scene.emission,                                       # 12:15
        scene.tex_emask,                                      # 15:18
        scene.opts[:, 1:2].astype(jnp.float32),               # 18
        scene.joker[:, 0:1],                                  # 19
    ], axis=1)
    row = _onehot_rows(idx, table)
    mesh_t = row[..., 0]
    center = row[..., 1:4]
    mat_c = row[..., 4:7]
    cm = row[..., 7:10]
    opt0 = row[..., 10]
    tex_t = row[..., 11]
    mat_e = row[..., 12:15]
    em = row[..., 15:18]
    opt1 = row[..., 18]
    size = row[..., 19]

    is_sphere = mesh_t == float(MeshType.SPHERE)
    rho_l = vm.safe_length(pos)
    phi = jnp.arcsin(jnp.clip(pos[..., 1] / rho_l, -1.0 + 1e-6, 1.0 - 1e-6))
    theta = jnp.arctan2(pos[..., 2], pos[..., 0])
    uv_sph = jnp.stack([phi / PI, theta / (2.0 * PI)], axis=-1)
    # dominant-axis planar UV needs the normal — same recompute as
    # _imgtex_rho (plane/box lights are legal scene rows)
    is_plane = mesh_t == float(MeshType.PLANE)
    n_sph = vm.normalize(pos - center)
    n_pln = vm.normalize(center)
    hp = pos - center
    half = (size * 0.5)[..., None]
    db = jnp.abs(hp) - half
    sx = jnp.where((db[..., 0] >= db[..., 1]) & (db[..., 0] >= db[..., 2]),
                   jnp.sign(hp[..., 0]), 0.0)
    sy = jnp.where((db[..., 1] >= db[..., 2]) & (db[..., 1] >= db[..., 0]),
                   jnp.sign(hp[..., 1]), 0.0)
    sz = jnp.where((db[..., 2] >= db[..., 0]) & (db[..., 2] >= db[..., 1]),
                   jnp.sign(hp[..., 2]), 0.0)
    n_box = vm.normalize(jnp.stack([sx, sy, sz], axis=-1))
    n = jnp.where(is_sphere[..., None], n_sph,
        jnp.where(is_plane[..., None], n_pln, n_box))
    na = jnp.abs(n)
    x_dom = (na[..., 0] > na[..., 1]) & (na[..., 0] > na[..., 2])
    y_dom = (na[..., 1] > na[..., 0]) & (na[..., 1] > na[..., 2])
    uv_x = jnp.stack([-pos[..., 2], -pos[..., 1]], axis=-1)
    uv_y = jnp.stack([pos[..., 0], pos[..., 2]], axis=-1)
    uv_z = jnp.stack([pos[..., 0], -pos[..., 1]], axis=-1)
    uv = jnp.where(is_sphere[..., None], uv_sph,
         jnp.where(x_dom[..., None], uv_x,
         jnp.where(y_dom[..., None], uv_y, uv_z)))

    present = set(scene.tex_types_static)
    texel = jnp.zeros(uv.shape[:-1] + (4,), jnp.float32)
    for k in range(4):
        if int(TexType.IMAGE0) + k in present:
            tx = tex_ops.bilinear_wrap(scene.images[k], uv)
            texel = jnp.where((tex_t == float(int(TexType.IMAGE0) + k))
                              [..., None], tx, texel)

    bc = (opt0 * texel[..., 3])[..., None]
    be = (opt1 * texel[..., 3])[..., None]
    c = jnp.maximum(mat_c + (texel[..., :3] * cm - mat_c) * bc, 0.001)
    e = jnp.maximum(mat_e + (texel[..., :3] * em - mat_e) * be, 0.001)
    return jnp.where(valid[..., None], c * e, 0.0)


def _img_row_kinds(scene):
    """(has_diff, has_light): which deferred image-texture record kinds
    this scene needs (DIFF throughput groups / terminal emissive hits)."""
    tts = scene.tex_types_static
    opts = scene.opts_static
    mats = scene.mat_types_static
    has_diff = has_light = False
    for i, tt in enumerate(tts):
        if (int(TexType.IMAGE0) <= tt <= int(TexType.IMAGE3)
                and (opts[i][0] or opts[i][1])):
            if mats[i] == int(MatType.DIFF):
                has_diff = True
            elif mats[i] == int(MatType.LIGHT):
                has_light = True
    return has_diff, has_light


def _imgtex_forward(scene, cfg: RenderConfig, ro, rd, pix, pass_idx,
                    sample_idx):
    h, w = pix.shape
    assert supports_shape(h, w), (h, w)
    has_diff, has_light = _img_row_kinds(scene)
    slots = min(cfg.max_diff_bounces, cfg.max_bounces) if has_diff else 0
    meta = (scene.mesh_types_static, scene.mat_types_static,
            scene.lights_static, scene.sdf_shapes_static,
            scene.num_analytic, scene.tex_types_static, scene.opts_static,
            int(scene.cubemap.shape[1])
            if scene.cubemap_is_procedural else 0)
    ft = _scene_table(scene)
    pp = jnp.asarray([[pass_idx, sample_idx]], jnp.int32).reshape(1, 2)

    grid = (h // BLOCK_ROWS, w // BLOCK_COLS)
    row_spec = _row_spec()
    kernel = functools.partial(_imgtex_kernel_body, meta, cfg, slots,
                               has_light)
    interpret = os.environ.get("RT0_PALLAS_INTERPRET") == "1"
    rec_shapes = ([jax.ShapeDtypeStruct((h, w), jnp.float32)] * 3
                  + [jax.ShapeDtypeStruct((h, w), jnp.int32)]
                  + [jax.ShapeDtypeStruct((h, w), jnp.float32)])
    n_out = 3 + 3 * slots + 5 * slots + 8 * has_light
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        interpret=interpret,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # ft
            pl.BlockSpec(memory_space=pltpu.SMEM),   # pp
            row_spec, row_spec, row_spec,            # o
            row_spec, row_spec, row_spec,            # d
            row_spec,                                # pix
        ],
        out_specs=[row_spec] * n_out,
        out_shape=[jax.ShapeDtypeStruct((h, w), jnp.float32)] * (3 + 3 * slots)
        + rec_shapes * slots
        + [jax.ShapeDtypeStruct((h, w), jnp.float32)] * (8 * has_light),
    )(ft, pp, ro[..., 0], ro[..., 1], ro[..., 2],
      rd[..., 0], rd[..., 1], rd[..., 2], pix)

    radiance = jnp.stack(outs[0:3], axis=-1)
    # resolve ALL records' texel ratios in one batched _imgtex_rho call
    # (stacked [slots, H, W]): TPU gathers cost ~1 element/cycle, so 4
    # separate bilinear fetches were 4x the gather ops of one batched one
    rho_cum = [jnp.ones((h, w, 3), jnp.float32)]
    if slots:
        pos_all = jnp.stack([
            jnp.stack(outs[3 + 3 * slots + 5 * g: 3 + 3 * slots + 5 * g + 3],
                      axis=-1) for g in range(slots)])
        idx_all = jnp.stack([outs[3 + 3 * slots + 5 * g + 3]
                             for g in range(slots)])
        valid_all = jnp.stack([outs[3 + 3 * slots + 5 * g + 4]
                               for g in range(slots)]) > 0.5
        rho_all = _imgtex_rho(scene, idx_all, pos_all, valid_all)
        prod = jnp.ones((h, w, 3), jnp.float32)
        for g in range(1, slots + 1):
            grp = jnp.stack(outs[3 * g: 3 * g + 3], axis=-1)
            prod = prod * rho_all[g - 1]
            rho_cum.append(prod)
            radiance = radiance + prod * grp

    if has_light:
        # terminal emissive-hit records (image-textured LIGHT rows):
        # contribution = weight * true c*e * (throughput-ratio product of
        # the record's texture-vertex group)
        lo = outs[3 + 8 * slots:]
        wgt = jnp.stack(lo[0:3], axis=-1)
        posl = jnp.stack(lo[3:6], axis=-1)
        idxl = lo[6].astype(jnp.int32)
        tag = lo[7]
        validl = tag > 0.5
        ce = _imgtex_light_ce(scene, idxl, posl, validl)
        grp = jnp.clip(tag.astype(jnp.int32) - 1, 0, slots)
        rho_sel = rho_cum[0]
        for k in range(1, slots + 1):
            rho_sel = jnp.where((grp == k)[..., None], rho_cum[k], rho_sel)
        radiance = radiance + jnp.where(validl[..., None],
                                        wgt * ce * rho_sel, 0.0)

    if cfg.use_spectral:
        from raytracer0_tpu.ops import spectral
        wl = spectral.sample_wavelength(
            rng_mod.uniform(pix, pass_idx, sample_idx,
                            rng_mod.Stream.WAVELENGTH))
        radiance = radiance * spectral.wavelength_to_rgb(wl)
    return radiance


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def trace_forward_imgtex(scene, cfg: RenderConfig, ro, rd, pix, pass_idx,
                         sample_idx):
    """Megakernel radiance with deferred image textures, matching
    `integrator.trace` on the supported class (sole deviation: the
    luminance cutoff sees the 0.5-gray placeholder throughput — paths
    the XLA route kills at <1% throughput may differ; see PARITY.md).

    Backward recomputes through the XLA wavefront integrator (see
    trace_forward_env) — image-texture scenes were XLA-routed before
    this fast path existed, and texel gradients flow exactly as there."""
    return _imgtex_forward(scene, cfg, ro, rd, pix, pass_idx, sample_idx)


def _imgtex_fwd(scene, cfg, ro, rd, pix, pass_idx, sample_idx):
    out = _imgtex_forward(scene, cfg, ro, rd, pix, pass_idx, sample_idx)
    return out, (scene, ro, rd, pix, pass_idx, sample_idx)


trace_forward_imgtex.defvjp(_imgtex_fwd, _env_bwd)


# ----------------------------------------------------------------------
# Gloss-coupled image textures: suffix-resume split (round 5)
# ----------------------------------------------------------------------
#
# Emission-as-glossiness (raytracer.glsl:1812-1813) makes the image
# texel steer the bounce DIRECTION on SPEC surfaces, which no
# multiplicative deferral can express (PARITY #9) — such scenes
# previously dropped whole renders to the XLA wavefront (152.5 ms/pass
# at 512², BENCH_r04).  This split keeps them on the kernel:
#
#   launch 0   the megakernel traces primary paths; a lane hitting a
#              gloss row exports (hit pos, incoming dir, pre-albedo
#              throughput, idx, absolute depth, counters) and dies;
#   resolve    the host recomputes the normal/UV from (idx, pos)
#              (the _imgtex_rho machinery), fetches the TRUE texel,
#              reproduces the SPEC brdf commit exactly (ops/bsdf.sample:
#              rough = e_true*rand_dir with the lane's own BSDF_DIR
#              stream, mask *= c_true, nspec+1, cutoff/cap gates);
#   launch k   the megakernel RESUMES the suffixes: initial lane state
#              injected, RNG keyed on absolute depth via a per-lane
#              depth offset — the resumed path draws the exact randoms
#              the monolithic trace would.
#
# A lane can hit at most max_spec_bounces gloss vertices, so
# max_spec_bounces resume launches are exact (the last launch cannot
# export: its records would all be cap-killed by the resolve gates).

_GLOSS_CH = 15


def supported_gloss(scene, cfg: RenderConfig) -> bool:
    """Can the gloss suffix-resume split serve this (scene, cfg)?
    Image rows must ALL be gloss rows — analytic SPEC meshes with any
    color/emission blending.  (Mixing with DIFF/LIGHT image rows would
    need the throughput-group bookkeeping threaded through resumes —
    such combinations stay on the XLA path for now.)  Other textured
    rows follow the in-kernel procedural rules."""
    if not scene.tex_types_used:
        return False
    tts = scene.tex_types_static
    opts = scene.opts_static
    mts = scene.mesh_types_static
    mats = scene.mat_types_static
    if len(tts) != len(mts) or len(opts) != len(tts):
        return False
    has_gloss = False
    for i, tt in enumerate(tts):
        if tt == int(TexType.NONE) or not (opts[i][0] or opts[i][1]):
            continue
        if int(TexType.IMAGE0) <= tt <= int(TexType.IMAGE3):
            analytic = mts[i] in (int(MeshType.SPHERE), int(MeshType.PLANE),
                                  int(MeshType.BOX))
            if not (analytic and mats[i] == int(MatType.SPEC)):
                return False
            has_gloss = True
        elif tt not in _TEX_KERNEL_OK:
            return False
    return (
        has_gloss
        and _geometry_supported(scene, check_textures=False)
        and not cfg.use_restir
        and (not cfg.use_cubemap or scene.cubemap_is_procedural)
        and cfg.use_biased_sampling
        and int(cfg.render_mode) == int(RenderMode.STATIC)
    )


def _gloss_kernel_body(meta, cfg: RenderConfig, ft_ref, pp_ref,
                       ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                       pix_ref,
                       mr_ref, mg_ref, mb_ref, act_ref, spec_ref,
                       px_ref, py_ref, pz_ref,
                       nd_ref, ns_ref, nc_ref, doff_ref,
                       r_ref, g_ref, b_ref, *gloss_refs):
    sv = _load_scene_vals(ft_ref, len(meta[0]))
    pass_u = pp_ref[0, 0].astype(jnp.uint32)
    samp_u = pp_ref[0, 1].astype(jnp.uint32)
    for n, r in enumerate(gloss_refs):
        r[...] = jnp.zeros_like(r[...])
    o = (ox_ref[:], oy_ref[:], oz_ref[:])
    d = (dx_ref[:], dy_ref[:], dz_ref[:])
    st_init = (o, d,
               (mr_ref[:], mg_ref[:], mb_ref[:]),
               (jnp.zeros_like(mr_ref[:]),) * 3,
               act_ref[:], spec_ref[:],
               (px_ref[:], py_ref[:], pz_ref[:]),
               nd_ref[:].astype(jnp.int32), ns_ref[:].astype(jnp.int32),
               nc_ref[:].astype(jnp.int32))
    acc = _trace_block(
        meta, cfg, sv, pix_ref[:], pass_u, samp_u, o, d,
        unroll=cfg.max_bounces < cfg.megakernel_unroll_below,
        gloss_refs=gloss_refs, st_init=st_init,
        # f32 -> u32 has no Mosaic cast; hop through i32
        depth_off=doff_ref[:].astype(jnp.int32).astype(jnp.uint32))
    r_ref[:] = acc[0]
    g_ref[:] = acc[1]
    b_ref[:] = acc[2]


def _gloss_launch(scene, cfg: RenderConfig, state, pix, pass_idx,
                  sample_idx):
    """One megakernel launch over injected lane states; returns
    (radiance [H,W,3], gloss record channel list [_GLOSS_CH of H,W])."""
    (ro, rd, mask, active, specular, prev_nl, nd, ns, nc, doff) = state
    h, w = pix.shape
    meta = _fused_meta(scene)
    ft = _scene_table(scene)
    pp = jnp.asarray([[pass_idx, sample_idx]], jnp.int32).reshape(1, 2)
    grid = (h // BLOCK_ROWS, w // BLOCK_COLS)
    row_spec = _row_spec()
    kernel = functools.partial(_gloss_kernel_body, meta, cfg)
    interpret = os.environ.get("RT0_PALLAS_INTERPRET") == "1"
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        interpret=interpret,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
        + [row_spec] * 19,
        out_specs=[row_spec] * (3 + _GLOSS_CH),
        out_shape=[jax.ShapeDtypeStruct((h, w), jnp.float32)]
        * (3 + _GLOSS_CH),
    )(ft, pp, ro[..., 0], ro[..., 1], ro[..., 2],
      rd[..., 0], rd[..., 1], rd[..., 2], pix,
      mask[..., 0], mask[..., 1], mask[..., 2],
      active, specular,
      prev_nl[..., 0], prev_nl[..., 1], prev_nl[..., 2],
      nd, ns, nc, doff)
    radiance = jnp.stack(outs[0:3], axis=-1)
    return radiance, outs[3:]


def _gloss_resolve(scene, cfg: RenderConfig, rec, pix, pass_idx,
                   sample_idx):
    """Host-side brdf commit for exported gloss records → next launch's
    injected state (ops/bsdf.sample SPEC semantics with the true texel)."""
    from raytracer0_tpu import rng
    from raytracer0_tpu.ops import sampling as smp
    from raytracer0_tpu.ops import textures as tex_ops
    from raytracer0_tpu.ops import vecmath as vm

    pos = jnp.stack(rec[0:3], axis=-1)
    d_in = jnp.stack(rec[3:6], axis=-1)
    mask = jnp.stack(rec[6:9], axis=-1)
    idx = rec[9].astype(jnp.int32)
    depth_at = rec[10].astype(jnp.uint32)
    nd = rec[11]
    ns = rec[12]
    nc = rec[13]
    valid = rec[14] > 0.5

    table = jnp.concatenate([
        jnp.asarray(scene.mesh_type, jnp.float32)[:, None],   # 0
        scene.pos,                                            # 1:4
        scene.color,                                          # 4:7
        scene.tex_cmask,                                      # 7:10
        scene.opts[:, 0:1].astype(jnp.float32),               # 10
        jnp.asarray(scene.tex_type, jnp.float32)[:, None],    # 11
        scene.emission,                                       # 12:15
        scene.tex_emask,                                      # 15:18
        scene.opts[:, 1:2].astype(jnp.float32),               # 18
        scene.joker[:, 0:1],                                  # 19
    ], axis=1)
    row = _onehot_rows(idx, table)
    mesh_t, center = row[..., 0], row[..., 1:4]
    mat_c, cm, opt0 = row[..., 4:7], row[..., 7:10], row[..., 10]
    tex_t = row[..., 11]
    mat_e, em, opt1 = row[..., 12:15], row[..., 15:18], row[..., 18]
    size = row[..., 19]

    # normal (parse_hit formulas) + orientation
    is_sphere = mesh_t == float(MeshType.SPHERE)
    is_plane = mesh_t == float(MeshType.PLANE)
    hp = pos - center
    n_sph = vm.normalize(hp)
    n_pln = vm.normalize(center)
    half = (size * 0.5)[..., None]
    db = jnp.abs(hp) - half
    sx = jnp.where((db[..., 0] >= db[..., 1]) & (db[..., 0] >= db[..., 2]),
                   jnp.sign(hp[..., 0]), 0.0)
    sy = jnp.where((db[..., 1] >= db[..., 2]) & (db[..., 1] >= db[..., 0]),
                   jnp.sign(hp[..., 1]), 0.0)
    sz = jnp.where((db[..., 2] >= db[..., 0]) & (db[..., 2] >= db[..., 1]),
                   jnp.sign(hp[..., 2]), 0.0)
    n_box = vm.normalize(jnp.stack([sx, sy, sz], axis=-1))
    n = jnp.where(is_sphere[..., None], n_sph,
        jnp.where(is_plane[..., None], n_pln, n_box))
    inside = -jnp.sign(vm.vdot(d_in, n))
    inside = jnp.where(inside == 0.0, 1.0, inside)
    nl = n * inside[..., None]

    # true texel (spherical / dominant-axis UV, _imgtex_rho formulas)
    rho_l = vm.safe_length(pos)
    phi = jnp.arcsin(jnp.clip(pos[..., 1] / rho_l, -1.0 + 1e-6, 1.0 - 1e-6))
    theta = jnp.arctan2(pos[..., 2], pos[..., 0])
    uv_sph = jnp.stack([phi / PI, theta / (2.0 * PI)], axis=-1)
    na = jnp.abs(n)
    x_dom = (na[..., 0] > na[..., 1]) & (na[..., 0] > na[..., 2])
    y_dom = (na[..., 1] > na[..., 0]) & (na[..., 1] > na[..., 2])
    uv_x = jnp.stack([-pos[..., 2], -pos[..., 1]], axis=-1)
    uv_y = jnp.stack([pos[..., 0], pos[..., 2]], axis=-1)
    uv_z = jnp.stack([pos[..., 0], -pos[..., 1]], axis=-1)
    uv = jnp.where(is_sphere[..., None], uv_sph,
         jnp.where(x_dom[..., None], uv_x,
         jnp.where(y_dom[..., None], uv_y, uv_z)))

    present = set(scene.tex_types_static)
    texel = jnp.zeros(uv.shape[:-1] + (4,), jnp.float32)
    for k in range(4):
        if int(TexType.IMAGE0) + k in present:
            tx = tex_ops.bilinear_wrap(scene.images[k], uv)
            texel = jnp.where((tex_t == float(int(TexType.IMAGE0) + k))
                              [..., None], tx, texel)

    bc = (opt0 * texel[..., 3])[..., None]
    be = (opt1 * texel[..., 3])[..., None]
    c_true = jnp.maximum(mat_c + (texel[..., :3] * cm - mat_c) * bc, 0.001)
    e_true = jnp.maximum(mat_e + (texel[..., :3] * em - mat_e) * be, 0.001)

    # SPEC brdf commit (bsdf.sample: rough = e*rand_dir, mirror+perturb)
    u1, u2 = rng.uniform2(pix, pass_idx, sample_idx, depth_at,
                          rng.Stream.BSDF_DIR)
    rand_dir = smp.random_direction(nl, u1, u2, cfg.use_biased_sampling)
    refl = vm.normalize(e_true * rand_dir + vm.reflect(d_in, nl))
    new_o = pos + nl * cfg.epsilon
    new_mask = mask * c_true
    ns2 = ns + 1.0

    cutoff = jnp.max(new_mask, axis=-1) < 0.01
    capped = ((nd >= cfg.max_diff_bounces)
              | (ns2 >= cfg.max_spec_bounces)
              | (nc >= cfg.max_scattering_events))
    alive = valid & ~cutoff & ~capped

    state = (new_o, refl, new_mask,
             jnp.where(alive, 1.0, 0.0), jnp.ones_like(ns),  # specular
             nl, nd, ns2, nc,
             (depth_at + jnp.uint32(1)).astype(jnp.float32))
    return state, alive


def trace_forward_gloss(scene, cfg: RenderConfig, ro, rd, pix, pass_idx,
                        sample_idx):
    """Megakernel radiance for gloss-coupled image-texture scenes via
    the suffix-resume split, matching `integrator.trace` bit-for-bit on
    the supported class (the resume draws the monolithic trace's exact
    RNG; the only host math is the brdf commit at gloss vertices, in
    the XLA ops the integrator itself uses).  Forward-only dispatch —
    gradients route through the XLA wavefront like the other texture
    splits (`_env_bwd`)."""
    h, w = pix.shape
    assert supports_shape(h, w), (h, w)
    zero = jnp.zeros((h, w), jnp.float32)
    state = (ro, rd, jnp.ones((h, w, 3), jnp.float32),
             jnp.ones((h, w), jnp.float32), jnp.ones((h, w), jnp.float32),
             jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), (h, w, 3)),
             zero, zero, zero, zero)
    total = jnp.zeros((h, w, 3), jnp.float32)
    for it in range(cfg.max_spec_bounces + 1):
        rad, rec = _gloss_launch(scene, cfg, state, pix, pass_idx,
                                 sample_idx)
        total = total + rad
        if it == cfg.max_spec_bounces:
            break
        state, _ = _gloss_resolve(scene, cfg, rec, pix, pass_idx,
                                  sample_idx)
    if cfg.use_spectral:
        from raytracer0_tpu.ops import spectral
        wl = spectral.sample_wavelength(
            rng_mod.uniform(pix, pass_idx, sample_idx,
                            rng_mod.Stream.WAVELENGTH))
        total = total * spectral.wavelength_to_rgb(wl)
    return total
