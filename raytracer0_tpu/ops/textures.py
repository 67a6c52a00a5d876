"""Texture evaluation — the reference's `getTexel` (raytracer.glsl:726-772).

Ten texture types: 4 image samplers (differentiable bilinear gathers over
the scene's `images` array — required for albedo/emission texture
gradients per BASELINE.json), CHECK / RIPPLE UV patterns, and 4 position-
based generative types (VORONOI, GRADIENT_NOISE, VALUE_NOISE, METAL fBm).

Only texture types actually present in the scene are evaluated (a static
property of the scene's `tex_type` array captured at build time), matching
the reference's dead-code elimination via GLSL constant folding.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from raytracer0_tpu.models.materials import TexType
from raytracer0_tpu.ops import noise as nz


def bilinear_wrap(img, uv):
    """Differentiable bilinear sample of [H, W, C] at uv in repeat-wrap
    texture space (GL REPEAT sampler semantics, mip level 0)."""
    h, w = img.shape[0], img.shape[1]
    u = uv[..., 0] - jnp.floor(uv[..., 0])
    v = uv[..., 1] - jnp.floor(uv[..., 1])
    x = u * w - 0.5
    y = v * h - 0.5
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    fx = (x - x0f)[..., None]
    fy = (y - y0f)[..., None]
    x0 = jnp.mod(x0f.astype(jnp.int32), w)
    y0 = jnp.mod(y0f.astype(jnp.int32), h)
    x1 = jnp.mod(x0 + 1, w)
    y1 = jnp.mod(y0 + 1, h)
    # flat row-take instead of (y, x) advanced indexing — contiguous
    # C-channel rows gather ~2x faster on TPU than multi-axis scalar
    # gathers, bit-identical values (see sky.sample_cubemap, round 4)
    flat = img.reshape(h * w, img.shape[2])
    c00 = jnp.take(flat, y0 * w + x0, axis=0)
    c01 = jnp.take(flat, y0 * w + x1, axis=0)
    c10 = jnp.take(flat, y1 * w + x0, axis=0)
    c11 = jnp.take(flat, y1 * w + x1, axis=0)
    return (c00 * (1 - fx) + c01 * fx) * (1 - fy) + (c10 * (1 - fx) + c11 * fx) * fy


def used_tex_types(scene) -> set[int]:
    """Static set of texture types present in the scene (recorded at build
    time so it is available under jit; see Scene.tex_types_used)."""
    return set(scene.tex_types_used)


def get_texel(scene, idx, uv, pos):
    """Evaluate the winning mesh's texture: returns f32[..., 4].

    `idx` i32[...] mesh index, `uv` f32[..., 2], `pos` f32[..., 3] hit
    position (for generative 3D textures).  Meshes with no texture yield
    zeros, whose alpha=0 makes every downstream `mix` a no-op — the same
    contract as the reference's NULL texel.
    """
    present = used_tex_types(scene)
    out = jnp.zeros(uv.shape[:-1] + (4,), jnp.float32)
    if not present:  # texture-free scene: no gathers at all
        return out
    ttype = scene.tex_type[idx]            # [...]
    params = scene.tex_params[idx]         # [..., 4]

    # Image textures 0-3 (raytracer.glsl:730-735).
    for k in range(4):
        if int(TexType.IMAGE0) + k in present:
            tex = bilinear_wrap(scene.images[k], uv)
            out = jnp.where((ttype == int(TexType.IMAGE0) + k)[..., None], tex, out)

    # CHECK (raytracer.glsl:738-740): mod(floor(px*u)+floor(py*v), pz).
    if int(TexType.CHECK) in present:
        val = jnp.mod(
            jnp.floor(params[..., 0] * uv[..., 0])
            + jnp.floor(params[..., 1] * uv[..., 1]),
            jnp.maximum(params[..., 2], 1e-6),
        )
        out = jnp.where((ttype == int(TexType.CHECK))[..., None], val[..., None], out)

    # RIPPLE (raytracer.glsl:742-744).
    if int(TexType.RIPPLE) in present:
        dist = jnp.sqrt(
            (uv[..., 0] - params[..., 0]) ** 2 + (uv[..., 1] - params[..., 1]) ** 2
        )
        val = jnp.mod(jnp.ceil(dist * params[..., 2]),
                      jnp.maximum(params[..., 3], 1e-6))
        out = jnp.where((ttype == int(TexType.RIPPLE))[..., None], val[..., None], out)

    # Generative 3D types share scaled_pos = params.xyz * hit_pos
    # (raytracer.glsl:747).
    scaled = params[..., :3] * pos

    if int(TexType.VORONOI) in present:
        v3 = nz.voronoi(scene.noise, scaled)
        tex = jnp.concatenate([v3, jnp.zeros_like(v3[..., :1])], axis=-1)
        out = jnp.where((ttype == int(TexType.VORONOI))[..., None], tex, out)

    if int(TexType.GRADIENT_NOISE) in present:
        f = nz.gradient_noise(scaled)
        t = jnp.clip((f + 0.7) / 1.4, 0.0, 1.0)
        val = t * t * (3.0 - 2.0 * t)  # smoothstep(-0.7, 0.7, f)
        out = jnp.where((ttype == int(TexType.GRADIENT_NOISE))[..., None],
                        val[..., None], out)

    if int(TexType.VALUE_NOISE) in present:
        val = nz.value_noise(scene.noise, scaled)
        out = jnp.where((ttype == int(TexType.VALUE_NOISE))[..., None],
                        val[..., None], out)

    if int(TexType.METAL) in present:
        val = nz.metal_fbm(scene.noise, scaled)
        out = jnp.where((ttype == int(TexType.METAL))[..., None],
                        val[..., None], out)

    return out
