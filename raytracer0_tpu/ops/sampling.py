"""Direction sampling and Fresnel models.

Vectorized equivalents of raytracer.glsl:1092-1172 and 480-492: cosine-
power-biased hemisphere sampling, uniform cone sampling, uniform sphere /
hemisphere, Henyey-Greenstein phase sampling, and the Schlick / full
unpolarized Fresnel reflectance models.  All samplers consume explicit
uniforms from `rng` streams instead of the reference's chained float
hashes, and are batched over [..., 3] arrays.
"""

from __future__ import annotations

import jax.numpy as jnp

from raytracer0_tpu.ops import vecmath as vm

PI = 3.14159265
TWO_PI = 6.28318531
ONE_OVER_PI = 0.31830989
FOUR_PI = 12.5663706


def sample_biased(w, power, u1, u2):
    """Cosine-power-weighted direction about `w` (raytracer.glsl:1109-1120).

    power=1 gives cosine-weighted hemisphere sampling (pdf = cosθ/π).
    """
    u, v = vm.onb(w)
    ang = u1 * TWO_PI
    r_y = jnp.power(jnp.maximum(u2, 1e-12), 1.0 / (power + 1.0))
    oneminus = vm.safe_sqrt(1.0 - r_y * r_y)
    d = (jnp.cos(ang) * oneminus)[..., None] * u \
        + (jnp.sin(ang) * oneminus)[..., None] * v \
        + r_y[..., None] * w
    return vm.normalize(d)


def sample_cone(w, extent, u1, u2):
    """Uniform direction in a cone of `extent = 1 - cosθ_max` about `w`
    (raytracer.glsl:1122-1133); extent=1 is the uniform hemisphere."""
    u, v = vm.onb(w)
    ang = u1 * TWO_PI
    r_y = 1.0 - u2 * extent
    oneminus = vm.safe_sqrt(1.0 - r_y * r_y)
    d = (jnp.cos(ang) * oneminus)[..., None] * u \
        + (jnp.sin(ang) * oneminus)[..., None] * v \
        + r_y[..., None] * w
    return vm.normalize(d)


def random_direction(n, u1, u2, biased: bool):
    """Bounce direction about normal `n` (raytracer.glsl:1135-1141):
    cosine-weighted when USE_BIASED_SAMPLING, else uniform hemisphere."""
    if biased:
        return sample_biased(n, 1.0, u1, u2)
    return sample_cone(n, 1.0, u1, u2)


def random_sphere_direction(u1, u2):
    """Uniform direction on the sphere.

    The reference's version (raytracer.glsl:1143-1147) maps two uniforms
    through sin/cos products, which is *not* area-uniform; we use the
    standard z = 1-2u, φ = 2πu' mapping (the distribution, not the bits,
    is the contract — SURVEY.md §7.2-5).
    """
    z = 1.0 - 2.0 * u1
    r = vm.safe_sqrt(1.0 - z * z)
    phi = TWO_PI * u2
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def random_hemisphere_direction(n, u1, u2):
    """Uniform hemisphere about n (raytracer.glsl:1149-1152)."""
    d = random_sphere_direction(u1, u2)
    flip = vm.vdot(d, n) < 0.0
    return jnp.where(flip[..., None], -d, d)


def sample_hg(w, g, u1, u2):
    """Henyey-Greenstein phase importance sampling (raytracer.glsl:1157-1171)."""
    g = jnp.asarray(g, jnp.float32)
    iso = jnp.abs(g) < 1e-3
    g_safe = jnp.where(iso, 0.5, g)
    sqr = (1.0 - g_safe * g_safe) / (1.0 - g_safe + 2.0 * g_safe * u1)
    cos_t = jnp.where(
        iso, 1.0 - 2.0 * u1, (1.0 + g_safe * g_safe - sqr * sqr) / (2.0 * g_safe)
    )
    sin_t = vm.safe_sqrt(1.0 - cos_t * cos_t)
    phi = TWO_PI * u2
    t_vec, b_vec = vm.onb(w)
    d = (jnp.cos(phi) * sin_t)[..., None] * t_vec \
        + (jnp.sin(phi) * sin_t)[..., None] * b_vec \
        + cos_t[..., None] * w
    return vm.normalize(d)


def hg_phase(cos_theta, g):
    """HG phase function value (raytracer.glsl:2032-2037)."""
    g2 = g * g
    denom = jnp.maximum(1.0 + g2 - 2.0 * g * cos_theta, 1e-6)
    return (1.0 - g2) / (FOUR_PI * denom * jnp.sqrt(denom))


def schlick(d, n, nc, nt):
    """Schlick reflectance approximation (raytracer.glsl:480-483).

    `d` is the incident ray direction, `n` the (oriented) surface normal.
    """
    r0 = ((nc - nt) / (nc + nt)) ** 2
    c = jnp.clip(1.0 + vm.vdot(n, d), 0.0, 1.0)
    return r0 + (1.0 - r0) * c ** 5


def fresnel(d, n, nc, nt, refr):
    """Full unpolarized Fresnel (Rs+Rp)/2 (raytracer.glsl:485-492)."""
    cos_i = vm.vdot(d, n)
    cos_t = vm.vdot(n, refr)
    rs_num = nc * cos_i - nt * cos_t
    rs_den = nc * cos_i + nt * cos_t
    rp_num = nc * cos_t - nt * cos_i
    rp_den = nc * cos_t + nt * cos_i
    rs = vm.safe_div(rs_num, rs_den) ** 2
    rp = vm.safe_div(rp_num, rp_den) ** 2
    return jnp.clip((rs + rp) * 0.5, 0.0, 1.0)


def power_heuristic(nf, f_pdf, ng, g_pdf):
    """Veach power heuristic, β=2 (raytracer.glsl:1233-1238)."""
    f = nf * f_pdf
    g = ng * g_pdf
    denom = f * f + g * g
    # Floor must satisfy floor^2 >= f32 min-normal: the division vjp
    # divides by floor^2, and a subnormal there flushes to 0 -> NaN.
    return jnp.where(denom > 0.0, jnp.maximum(f * f, 0.0) /
                     jnp.maximum(denom, 1e-12), 0.0)


def cosine_hemisphere_pdf(wi, n):
    """pdf = cosθ/π for cosine-weighted sampling (raytracer.glsl:1241-1243)."""
    return jnp.maximum(0.0, vm.vdot(wi, n)) * ONE_OVER_PI


def sphere_light_pdf(light_pos, light_r, x):
    """Solid-angle pdf of cone-sampling a sphere light from x
    (raytracer.glsl:1246-1262), with inside-sphere and tiny-angle guards."""
    d = light_pos - x
    d2 = vm.vdot(d, d)
    r2 = light_r * light_r
    inside = d2 <= r2
    cos_max = vm.safe_sqrt(1.0 - vm.safe_div(r2, d2))
    denom = 1.0 - cos_max
    degenerate = denom < 1e-6
    pdf = 1.0 / jnp.maximum(TWO_PI * denom, 1e-12)
    return jnp.where(inside | degenerate, 0.0, pdf)
