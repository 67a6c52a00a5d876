"""Vector math over stacked `[..., 3]` arrays.

TPU-native replacement for the reference's scalar `Vector3` host class
(vector.js:2-95) and built-in GLSL vector ops: everything here is
elementwise over arbitrarily batched SoA arrays so the VPU sees wide,
fused element streams.  All routines are differentiable; divisions and
square roots are guarded so gradients stay finite (`safe_*` variants).
"""

from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-12


def vdot(a, b):
    """Batched dot product: [..., 3] x [..., 3] -> [...]."""
    return jnp.sum(a * b, axis=-1)


def vdot1(a, b):
    """Like vdot but keeps the trailing axis for broadcasting: -> [..., 1]."""
    return jnp.sum(a * b, axis=-1, keepdims=True)


def length(a):
    return jnp.sqrt(jnp.maximum(vdot(a, a), 0.0))


def safe_length(a, eps=EPS):
    """Length with a floor so the gradient at 0 is finite."""
    return jnp.sqrt(jnp.maximum(vdot(a, a), eps))


def normalize(a, eps=EPS):
    """Unit vector; returns a finite vector even for (near-)zero input."""
    return a * jnp.reciprocal(safe_length(a, eps))[..., None]


def cross(a, b):
    return jnp.cross(a, b)


def reflect(d, n):
    """GLSL reflect: d - 2*dot(d,n)*n (d incident, n unit normal)."""
    return d - 2.0 * vdot1(d, n) * n


def refract(d, n, eta):
    """GLSL refract semantics (used at raytracer.glsl:1839).

    Returns (t, tir_mask): the refracted direction and a bool mask that is
    True where total internal reflection occurred (GLSL returns the zero
    vector there; callers branch on it at raytracer.glsl:1844).
    `eta` is [..., ] (ratio n_incident / n_transmitted).
    """
    cos_i = vdot(d, n)
    k = 1.0 - eta * eta * (1.0 - cos_i * cos_i)
    tir = k < 0.0
    t = eta[..., None] * d - (eta * cos_i + safe_sqrt(k))[..., None] * n
    return jnp.where(tir[..., None], 0.0, t), tir


def mix(a, b, t):
    """GLSL mix/lerp; t may be scalar, [...] or [..., k]."""
    return a + (b - a) * t


def luminance(c):
    """ITU-R BT.709 luma (raytracer.glsl:1372)."""
    return c[..., 0] * 0.2126 + c[..., 1] * 0.7152 + c[..., 2] * 0.0722


def max3(c):
    """max(r, g, b) — the mask-cutoff test (raytracer.glsl:2097)."""
    return jnp.max(c, axis=-1)


def smoothstep(e0, e1, x):
    t = jnp.clip((x - e0) / (e1 - e0), 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)


def safe_sqrt(x):
    """sqrt(max(x, 0)) with a finite backward at and below 0.

    `sqrt(max(x, 0))` has an inf derivative at the clamp boundary which
    turns into NaN through `where`-masked lanes; this variant is exact in
    the forward pass and has zero gradient for x <= 0.
    """
    pos = x > 0.0
    r = jnp.sqrt(jnp.where(pos, x, 1.0))
    return jnp.where(pos, r, 0.0)


def safe_rsqrt(x, eps=EPS):
    return jnp.reciprocal(jnp.sqrt(jnp.maximum(x, eps)))


def safe_div(a, b, eps=EPS):
    """a / b with sign-preserving denominator floor (finite gradients)."""
    mag = jnp.maximum(jnp.abs(b), eps)
    return a / jnp.where(b < 0, -mag, mag)


def onb(n):
    """Branch-free orthonormal basis from a unit normal.

    Pixar/Frisvad revised construction (Duff et al., JCGT 2017), the role
    of the reference's `calc_binormals` (raytracer.glsl:1092-1107)
    including its degenerate |n.z|≈1 guard — but fully vectorized via
    `where`.  Deliberate deviation: the reference computes
    `a = 1/(sig - n.z)` which is a sign error in the published formula
    (`a = -1/(sig + n.z)`) producing a *non-orthonormal* frame that its
    samplers paper over with a trailing `normalize`; we use the correct
    construction so cone/cosine sampling has the intended distribution.
    Returns (u, v) with (u, v, n) spanning the tangent frame.
    """
    nx, ny, nz = n[..., 0], n[..., 1], n[..., 2]
    sig = jnp.where(nz < 0.0, -1.0, 1.0)
    a = -1.0 / jnp.where(jnp.abs(sig + nz) < EPS, EPS, sig + nz)
    b = nx * ny * a
    u = jnp.stack([1.0 + sig * nx * nx * a, sig * b, -sig * nx], axis=-1)
    v = jnp.stack([b, sig + ny * ny * a, -ny], axis=-1)
    # Degenerate pole: n ≈ (0, 0, ±1)
    degen = jnp.abs(nz) > 0.99999
    u = jnp.where(degen[..., None], jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), u.shape), u)
    v_deg = jnp.stack([jnp.zeros_like(sig), sig, jnp.zeros_like(sig)], axis=-1)
    v = jnp.where(degen[..., None], v_deg, v)
    return u, v


def where3(mask, a, b):
    """Select [..., 3] vectors by a [...] boolean mask."""
    return jnp.where(mask[..., None], a, b)
