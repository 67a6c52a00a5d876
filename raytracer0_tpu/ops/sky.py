"""Environment: procedural sky and cubemap sampling.

Procedural sky matches the cosine-palette at raytracer.glsl:2062; the
cubemap path replaces GLSL `texture(u_cubemap, dir)` with a differentiable
face-select + bilinear gather over a `[6, H, W, 3]` array.
"""

from __future__ import annotations

import jax.numpy as jnp

from raytracer0_tpu.ops import vecmath as vm

TWO_PI = 6.28318531

_SKY_PHASE = jnp.array([0.525, 0.408, 0.409])
_SKY_FREQ = jnp.array([0.9, 0.97, 0.8])


def procedural_sky(rd):
    """Cosine-palette sky from ray direction (raytracer.glsl:2062)."""
    h = jnp.clip(rd[..., 1] * 0.6 + 0.5, 0.3, 1.0)
    return 0.5 + 0.5 * jnp.cos(TWO_PI * (_SKY_PHASE + _SKY_FREQ * h[..., None]))


def default_cubemap(size: int = 64):
    """Procedural fallback cubemap: the cosine-palette sky baked onto 6
    faces, f32[6, size, size, 3] numpy.

    The reference always ships a photographic cubemap (index.html:267-270);
    scenes built without one here get this instead of a black environment
    so `use_cubemap` presets render sensibly out of the box."""
    import numpy as np
    ax = (np.arange(size, dtype=np.float32) + 0.5) / size * 2.0 - 1.0
    t, s = np.meshgrid(ax, ax, indexing="ij")  # t = v (down), s = u
    one = np.ones_like(s)
    # direction per face from the GL (s, t) conventions in sample_cubemap
    dirs = {
        0: (one, -t, -s),   # +x
        1: (-one, -t, s),   # -x
        2: (s, one, t),     # +y
        3: (s, -one, -t),   # -y
        4: (s, -t, one),    # +z
        5: (-s, -t, -one),  # -z
    }
    faces = []
    for f in range(6):
        d = np.stack(dirs[f], axis=-1)
        d = d / np.linalg.norm(d, axis=-1, keepdims=True)
        h = np.clip(d[..., 1] * 0.6 + 0.5, 0.3, 1.0)
        phase = np.asarray([0.525, 0.408, 0.409], np.float32)
        freq = np.asarray([0.9, 0.97, 0.8], np.float32)
        faces.append(0.5 + 0.5 * np.cos(TWO_PI * (phase + freq * h[..., None])))
    return np.stack(faces).astype(np.float32)


def _bilinear_face(face_img, u, v):
    """Differentiable bilinear fetch on one face image [H, W, 3]; u, v in [0,1]."""
    h, w = face_img.shape[0], face_img.shape[1]
    x = jnp.clip(u * w - 0.5, 0.0, w - 1.0)
    y = jnp.clip(v * h - 0.5, 0.0, h - 1.0)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    c00 = face_img[y0, x0]
    c01 = face_img[y0, x1]
    c10 = face_img[y1, x0]
    c11 = face_img[y1, x1]
    return (c00 * (1 - fx) + c01 * fx) * (1 - fy) + (c10 * (1 - fx) + c11 * fx) * fy


def sample_cubemap(cubemap, rd):
    """Sample a [6, H, W, 3] cubemap by direction (GL face order:
    +x, -x, +y, -y, +z, -z)."""
    x, y, z = rd[..., 0], rd[..., 1], rd[..., 2]
    ax, ay, az = jnp.abs(x), jnp.abs(y), jnp.abs(z)

    x_major = (ax >= ay) & (ax >= az)
    y_major = (ay > ax) & (ay >= az)

    face = jnp.where(
        x_major, jnp.where(x > 0, 0, 1),
        jnp.where(y_major, jnp.where(y > 0, 2, 3), jnp.where(z > 0, 4, 5)),
    ).astype(jnp.int32)

    ma = jnp.where(x_major, ax, jnp.where(y_major, ay, az))
    ma = jnp.maximum(ma, 1e-9)

    # GL cubemap (s, t) conventions per face.
    sc = jnp.where(x_major, jnp.where(x > 0, -z, z),
         jnp.where(y_major, x, jnp.where(z > 0, x, -x)))
    tc = jnp.where(x_major, -y, jnp.where(y_major, jnp.where(y > 0, z, -z), -y))

    u = 0.5 * (sc / ma + 1.0)
    v = 0.5 * (tc / ma + 1.0)

    h, w = cubemap.shape[1], cubemap.shape[2]
    xpix = jnp.clip(u * w - 0.5, 0.0, w - 1.0)
    ypix = jnp.clip(v * h - 0.5, 0.0, h - 1.0)
    x0 = jnp.floor(xpix).astype(jnp.int32)
    y0 = jnp.floor(ypix).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    fx = (xpix - x0)[..., None]
    fy = (ypix - y0)[..., None]
    # flat row-take instead of (face, y, x) advanced indexing: gathering
    # contiguous RGB rows runs ~2x the multi-axis scalar gather on TPU
    # (measured 47.9 -> 24.8 ms for the env split's 4 taps x 5 records at
    # 512²; bit-identical values) — the deferred-cubemap resolution was
    # ~98% gather time (experiments/README.md, round 4)
    flat = cubemap.reshape(6 * h * w, 3)
    base = face * (h * w)
    c00 = jnp.take(flat, base + y0 * w + x0, axis=0)
    c01 = jnp.take(flat, base + y0 * w + x1, axis=0)
    c10 = jnp.take(flat, base + y1 * w + x0, axis=0)
    c11 = jnp.take(flat, base + y1 * w + x1, axis=0)
    return (c00 * (1 - fx) + c01 * fx) * (1 - fy) + (c10 * (1 - fx) + c11 * fx) * fy


def environment(scene, rd, cfg):
    """Environment radiance for escaped rays (raytracer.glsl:2059-2063)."""
    if cfg.use_cubemap:
        return sample_cubemap(scene.cubemap, rd)
    if cfg.use_procedural_sky:
        return procedural_sky(rd)
    return jnp.zeros(rd.shape[:-1] + (3,), rd.dtype)
