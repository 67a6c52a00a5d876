"""Hero-wavelength spectral transport (raytracer.glsl:320-359, 2122-2155).

One wavelength per pixel sample, drawn uniformly from [380, 720] nm; the
path's radiance is converted to RGB by the CIE 1931 XYZ color matching
functions (Wyman, Sloan & Shirley 2013 multi-Gaussian analytic fit) and
the D65 XYZ -> linear sRGB matrix, normalized by the reference's white
constants.  Dispersive materials use Cauchy's equation
n(λ) = A + B/λ² with B = 0.04 μm².
"""

from __future__ import annotations

import jax.numpy as jnp

LAMBDA_MIN = 380.0
LAMBDA_SPAN = 340.0


def sample_wavelength(u):
    """λ = u*340 + 380 nm (raytracer.glsl:2123)."""
    return u * LAMBDA_SPAN + LAMBDA_MIN


def _gauss(l, mu, s_lo, s_hi):
    t = (l - mu) * jnp.where(l < mu, s_lo, s_hi)
    return jnp.exp(-0.5 * t * t)


def cmf_x(l):
    return (0.362 * _gauss(l, 442.0, 0.0624, 0.0374)
            + 1.056 * _gauss(l, 599.8, 0.0264, 0.0323)
            - 0.065 * _gauss(l, 501.1, 0.0490, 0.0382))


def cmf_y(l):
    return (0.821 * _gauss(l, 568.8, 0.0213, 0.0247)
            + 0.286 * _gauss(l, 530.9, 0.0613, 0.0322))


def cmf_z(l):
    return (1.217 * _gauss(l, 437.0, 0.0845, 0.0278)
            + 0.681 * _gauss(l, 459.0, 0.0385, 0.0725))


def xyz_to_linear_srgb(xyz):
    """D65 XYZ -> linear sRGB (raytracer.glsl:342-348)."""
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    return jnp.stack([
        3.2404542 * x - 1.5371385 * y - 0.4985314 * z,
        -0.9692660 * x + 1.8760108 * y + 0.0415560 * z,
        0.0556434 * x - 0.2040259 * y + 1.0572252 * z,
    ], axis=-1)


_WHITE_NORM = jnp.array([0.378, 0.298, 0.285])


def wavelength_to_rgb(l):
    """λ (nm) -> normalized linear sRGB weight (raytracer.glsl:350-353)."""
    xyz = jnp.stack([cmf_x(l), cmf_y(l), cmf_z(l)], axis=-1)
    return jnp.maximum(xyz_to_linear_srgb(xyz), 0.0) / _WHITE_NORM


def cauchy_ior(lambda_nm, cauchy_a):
    """n(λ) = A + 0.04/λ_μm² (raytracer.glsl:355-358)."""
    lu = lambda_nm * 0.001
    return cauchy_a + 0.04 / jnp.maximum(lu * lu, 1e-6)
