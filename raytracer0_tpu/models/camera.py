"""Camera model and primary-ray generation.

Implements the reference camera exactly (raytracer.glsl:2126-2148):
look-direction basis with +Y up, vertical-FOV screen extents, tent-filter
antialiasing jitter, and thin-lens depth of field (random aperture-disk
point, focal point at `focal_length` along the jittered direction).

Camera parameters are traced (runtime) values — moving the camera never
recompiles, mirroring the reference's uniform-only camera updates
(index.js:384-440, index.html:475-482).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import struct

from raytracer0_tpu import rng
from raytracer0_tpu.ops import vecmath as vm

TWO_PI = 6.28318531
RAD = 0.01745329


@struct.dataclass
class Camera:
    """Pytree of camera parameters (reference defaults: index.js:89-95)."""

    origin: Any      # f32[3]
    lookat: Any      # f32[3] — a *direction*, as in the reference
    fov: Any         # f32[] vertical field of view, degrees
    aperture: Any    # f32[] lens radius (0 = pinhole)
    focal_length: Any  # f32[] focus distance

    @classmethod
    def make(cls, origin=(0.0, 0.0, 2.8), lookat=(0.0, 0.0, -1.0), fov=50.0,
             aperture=0.0, focal_length=3.5):
        return cls(
            origin=jnp.asarray(origin, jnp.float32),
            lookat=jnp.asarray(lookat, jnp.float32),
            fov=jnp.asarray(fov, jnp.float32),
            aperture=jnp.asarray(aperture, jnp.float32),
            focal_length=jnp.asarray(focal_length, jnp.float32),
        )

    def basis(self):
        """(u, v, w): right, up, forward — raytracer.glsl:2131-2133."""
        w = vm.normalize(self.lookat)
        u = vm.normalize(jnp.cross(w, jnp.array([0.0, 1.0, 0.0])))
        v = jnp.cross(u, w)
        return u, v, w


def tent_jitter(r):
    """Tent-filter inverse-CDF mapping a uniform in [0,1) to [-1, 1].

    Matches raytracer.glsl:2135-2138: `flip = step(0.5, r)`,
    `h = mix(r, 1-r, flip)`, `d = mix(sqrt(2h)-1, 1-sqrt(2h), flip)`.
    """
    flip = r >= 0.5
    h = jnp.where(flip, 1.0 - r, r)
    d = jnp.sqrt(jnp.maximum(2.0 * h, 0.0)) - 1.0
    return jnp.where(flip, -d, d)


def generate_rays(camera: Camera, height: int, width: int, pass_idx, sample_idx=0,
                  row0=0, full_height=None):
    """Primary rays for every pixel: returns (origin, direction) of shape
    [H, W, 3] each.

    Pixel convention matches gl_FragCoord: x right, y **up** (row 0 is the
    bottom of the image); `utils.image` flips on save.

    `row0`/`full_height` support tile sharding: a shard rendering rows
    [row0, row0+height) of a `full_height`-tall image generates exactly
    the rays the full render would.
    """
    full_height = height if full_height is None else full_height
    pix = rng.pixel_ids(height, width, row0=row0)
    r_aa_x = rng.uniform(pix, pass_idx, sample_idx, rng.Stream.AA)
    r_aa_y = rng.uniform(pix, pass_idx, sample_idx, rng.Stream.AA + 16)
    r_ap_ang, r_ap_rad = rng.uniform2(pix, pass_idx, sample_idx, rng.Stream.APERTURE)

    # Normalized screen coords in [-1, 1], pixel centers (gl_FragCoord = idx+0.5).
    rows = jnp.arange(height, dtype=jnp.float32) + row0
    ys = (2.0 * (rows + 0.5) / full_height - 1.0)[:, None]
    xs = (2.0 * (jnp.arange(width, dtype=jnp.float32) + 0.5) / width - 1.0)[None, :]
    aspect = width / full_height

    theta = camera.fov * RAD
    v_len = jnp.tan(theta * 0.5)
    u_len = aspect * v_len

    u, v, w = camera.basis()

    dx = xs + tent_jitter(r_aa_x) / (width * 0.5)
    dy = ys + tent_jitter(r_aa_y) / (full_height * 0.5)

    # Focal point along the jittered direction (raytracer.glsl:2140).
    d = vm.normalize(
        dx[..., None] * u * u_len + dy[..., None] * v * v_len + w
    )
    focal_point = d * camera.focal_length

    # Random point on the aperture disk (raytracer.glsl:2143-2145).
    ang = r_ap_ang * TWO_PI
    rad = r_ap_rad * camera.aperture
    aperture_pos = (jnp.cos(ang)[..., None] * u + jnp.sin(ang)[..., None] * v) * rad[..., None]

    origin = camera.origin + aperture_pos
    direction = vm.normalize(focal_point - aperture_pos)
    return origin, direction
