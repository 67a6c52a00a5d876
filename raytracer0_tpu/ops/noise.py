"""Procedural noise kernels: gradient noise, LUT value noise, voronoi, fBm.

Vectorized equivalents of raytracer.glsl:363-433.  The reference's value
noise and voronoi read a 256^2 RGBA noise PNG (index.js:257-273); here the
LUT is generated deterministically from the framework RNG
(`rng.noise_lut`), so CPU and TPU agree exactly and no binary asset is
required.  Statistical character (not bit pattern) matches the reference.
"""

from __future__ import annotations

import jax.numpy as jnp

from raytracer0_tpu.ops import vecmath as vm


def _gradient_hash(p):
    """iq's sin-based gradient hash in [-1, 1]^3 (raytracer.glsl:363-368)."""
    d = jnp.stack([
        p[..., 0] * 127.1 + p[..., 1] * 311.7 + p[..., 2] * 74.7,
        p[..., 0] * 269.5 + p[..., 1] * 183.3 + p[..., 2] * 246.1,
        p[..., 0] * 113.5 + p[..., 1] * 271.9 + p[..., 2] * 124.6,
    ], axis=-1)
    s = jnp.sin(d) * 43758.5453
    return -1.0 + 2.0 * (s - jnp.floor(s))


def gradient_noise(p):
    """3D gradient (Perlin-style) noise (raytracer.glsl:371-385)."""
    i = jnp.floor(p)
    f = p - i
    u = f * f * (3.0 - 2.0 * f)

    def g(ox, oy, oz):
        off = jnp.asarray([ox, oy, oz], p.dtype)
        return vm.vdot(_gradient_hash(i + off), f - off)

    ux, uy, uz = u[..., 0], u[..., 1], u[..., 2]
    lerp = lambda a, b, t: a + (b - a) * t
    return lerp(
        lerp(lerp(g(0, 0, 0), g(1, 0, 0), ux), lerp(g(0, 1, 0), g(1, 1, 0), ux), uy),
        lerp(lerp(g(0, 0, 1), g(1, 0, 1), ux), lerp(g(0, 1, 1), g(1, 1, 1), ux), uy),
        uz,
    )


def _lut_bilinear(lut, x, y, ch0, ch1):
    """Bilinear fetch of two channels from the [256,256,4] LUT with REPEAT
    wrapping, mirroring `texture(u_rnd_tex, (uv+0.5)/256)` LINEAR sampling."""
    size = lut.shape[0]
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0
    fy = y - y0
    x0 = jnp.mod(x0, size)
    y0 = jnp.mod(y0, size)
    x1 = jnp.mod(x0 + 1, size)
    y1 = jnp.mod(y0 + 1, size)

    def fetch(ch):
        c00 = lut[y0, x0, ch]
        c01 = lut[y0, x1, ch]
        c10 = lut[y1, x0, ch]
        c11 = lut[y1, x1, ch]
        return (c00 * (1 - fx) + c01 * fx) * (1 - fy) + (c10 * (1 - fx) + c11 * fx) * fy

    return fetch(ch0), fetch(ch1)


def value_noise(lut, x):
    """LUT-backed 3D value noise (raytracer.glsl:393-401): two channels
    fetched at z-sheared 2D coords, lerped along z."""
    p = jnp.floor(x)
    f = x - p
    f = f * f * (3.0 - 2.0 * f)
    u = (p[..., 0] + 37.0 * p[..., 2]) + f[..., 0]
    v = (p[..., 1] + 17.0 * p[..., 2]) + f[..., 1]
    # .yx swizzle: rg = tex.yx -> mix(g, r, f.z)
    g_ch, r_ch = _lut_bilinear(lut, u, v, 1, 0)
    return g_ch + (r_ch - g_ch) * f[..., 2]


def voronoi(lut, x):
    """3D voronoi over the 3x3x3 neighborhood (raytracer.glsl:404-433).

    Returns [..., 3]: (sqrt(F1), sqrt(F2), |cell id|).  Cell jitter comes
    from the noise LUT at integer cell coords (z folded by (3,1)), exactly
    the reference's addressing scheme.
    """
    p = jnp.floor(x)
    f = x - p
    size = lut.shape[0]

    f1 = jnp.full(x.shape[:-1], 100.0, x.dtype)
    f2 = jnp.full(x.shape[:-1], 100.0, x.dtype)
    cid = jnp.zeros(x.shape[:-1], x.dtype)

    for k in (-1, 0, 1):
        for j in (-1, 0, 1):
            for i in (-1, 0, 1):
                b = jnp.asarray([i, j, k], x.dtype)
                hx = p + b
                # texel (hx.x + 3*hx.z, hx.y + 1*hx.z) — nearest fetch
                tx = jnp.mod(jnp.floor(hx[..., 0] + 3.0 * hx[..., 2]).astype(jnp.int32), size)
                ty = jnp.mod(jnp.floor(hx[..., 1] + 1.0 * hx[..., 2]).astype(jnp.int32), size)
                jitter = lut[ty, tx, :3]
                r = b - f + jitter
                d = vm.vdot(r, r)
                new_id = jnp.abs(hx[..., 0] + hx[..., 1] * 57.0 + hx[..., 2] * 113.0)
                closer = d < f1
                f2 = jnp.where(closer, f1, jnp.where(d < f2, d, f2))
                cid = jnp.where(closer, new_id, cid)
                f1 = jnp.where(closer, d, f1)

    return jnp.stack([jnp.sqrt(f1), jnp.sqrt(f2), cid], axis=-1)


def metal_fbm(lut, q):
    """3-octave anisotropic fBm used by TEX_METAL (raytracer.glsl:762-768)."""
    m = jnp.asarray([-1.2, 1.99, -1.6])
    f = 0.5 * value_noise(lut, q)
    q = m * q * 2.01
    f = f + 0.25 * value_noise(lut, q)
    q = m * q * 2.02
    f = f + 0.125 * value_noise(lut, q)
    return f
