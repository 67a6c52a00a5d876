"""Analytic (quadric/Euclidean) ray-primitive intersection.

TPU-native re-design of the reference's sequential per-mesh loop
(raytracer.glsl:997-1082): instead of iterating meshes with a running
`tmin` (iSphere 819-833, iPlane 812-815, iBox 836-859), every ray is
tested against every mesh of each primitive type in one broadcast
computation and the winner is an argmin-reduce — branch-free, fully
vectorized VPU work that XLA fuses into a single kernel.  The sequential
accept-if-closer loop and the global argmin are semantically identical.

Performance notes (measured on v5e):
* every formula is evaluated for every mesh and masked by type — a
  gather-based "only rows of this type" variant measured 5.7x SLOWER
  (13.4 vs 2.3 ms at 512^2): gathers break XLA fusion while full-width
  masked math stays one fused VPU kernel.  Compute-and-mask wins;
* hit parsing (normals, UVs) is work shadow rays don't need; `parse_hit`
  takes static `need_normal` / `need_uv` flags and the UV transcendentals
  are skipped entirely for texture-free scenes.

Hit `t` stays differentiable w.r.t. scene geometry; only the winner
index is discrete.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import struct

from raytracer0_tpu.models.materials import MeshType
from raytracer0_tpu.ops import vecmath as vm

PI = 3.14159265
TWO_PI = 6.28318531


@struct.dataclass
class Hit:
    """SoA hit record (the reference `Hit` struct, raytracer.glsl:99-105).

    `texel` is filled lazily by `ops.textures.get_texel` in the integrator
    (the reference prefetches it inside `intersection`, line 1078).
    """

    t: Any        # f32[...] distance (INFINITY on miss)
    idx: Any      # i32[...] winning mesh index (0 on miss, like HIT_MISS)
    pos: Any      # f32[..., 3]
    n: Any        # f32[..., 3] geometric normal
    uv: Any       # f32[..., 2]
    missed: Any   # bool[...]


def _sphere_t(oc, rd, radius, eps):
    """Closest valid sphere root (raytracer.glsl:818-833)."""
    b = vm.vdot(oc, rd)
    c = vm.vdot(oc, oc) - radius * radius
    disc = b * b - c
    # where-guard keeps sqrt's backward finite on the miss branch
    # (grad of sqrt at a clamped 0 is inf; 0*inf would poison the vjp).
    sq = jnp.sqrt(jnp.where(disc > 0.0, disc, 1.0))
    sq = jnp.where(disc > 0.0, sq, 0.0)
    t0 = -b - sq
    t1 = -b + sq
    t = jnp.where(t0 > eps, t0, t1)
    valid = (disc > 0.0) & (t > eps)
    return t, valid


def _plane_t(n, w, ro, rd, eps):
    """Plane n·x + w = 0 (raytracer.glsl:812-815): mesh.pos is the (unnormalized)
    normal, joker.x the offset."""
    denom = vm.vdot(n, rd)
    t = vm.safe_div(-w - vm.vdot(n, ro), denom)
    valid = (t > eps) & (jnp.abs(denom) > 1e-12)
    return t, valid


def _box_t(center, size, ro, rd, eps):
    """Axis-aligned cube of edge `size` centered at `center`
    (raytracer.glsl:836-851); normal is recomputed for the winner only."""
    m = vm.safe_div(jnp.ones_like(rd), rd)
    n_vec = m * (center - ro)
    k = jnp.abs(m) * (size * 0.5)[..., None]
    t1 = n_vec - k
    t2 = n_vec + k
    t_near = jnp.max(t1, axis=-1)
    t_far = jnp.min(t2, axis=-1)
    t = jnp.where(t_near > 0.0, t_near, t_far)
    valid = (t_near <= t_far) & (t_far >= 0.0) & (t > eps)
    return t, valid


def _box_normal(center, size, hit_pos):
    """Slab-test normal from the dominant penetration axis
    (raytracer.glsl:853-856)."""
    hp = hit_pos - center
    d = jnp.abs(hp) - (size * 0.5)[..., None]
    dy = jnp.roll(d, -1, axis=-1)  # d.yzx
    dz = jnp.roll(d, -2, axis=-1)  # d.zxy
    step_y = (d >= dy).astype(d.dtype)
    step_z = (d >= dz).astype(d.dtype)
    return vm.normalize(jnp.sign(hp) * step_y * step_z)


def analytic_min(scene, ro, rd, eps):
    """Closest analytic hit across all meshes: (tmin, idx, hit_any).

    All three formulas run over the full [..., N] mesh axis and are
    selected by type masks — one fused kernel, no gathers (see module
    docstring for the measurement justifying this over type grouping).
    Static `use_*` flags skip formulas for types absent from the scene
    (the reference's U_SPHERE/U_PLANE/U_BOX constant folding).
    """
    pos = scene.pos            # [N, 3]
    joker0 = scene.joker[:, 0]  # [N]
    mesh_type = scene.mesh_type

    ro_b = ro[..., None, :]
    rd_b = rd[..., None, :]

    t = jnp.full(ro.shape[:-1] + (pos.shape[0],), jnp.inf, jnp.float32)
    if scene.use_sphere:
        t_s, v_s = _sphere_t(ro_b - pos, rd_b, joker0, eps)
        t = jnp.where((mesh_type == MeshType.SPHERE) & v_s, t_s, t)
    if scene.use_plane:
        t_p, v_p = _plane_t(pos, joker0, ro_b, rd_b, eps)
        t = jnp.where((mesh_type == MeshType.PLANE) & v_p, t_p, t)
    if scene.use_box:
        t_b, v_b = _box_t(pos, joker0, ro_b, rd_b, eps)
        t = jnp.where((mesh_type == MeshType.BOX) & v_b, t_b, t)

    # degenerate-mesh skip: joker.x == 0 placeholders (raytracer.glsl:1009)
    t = jnp.where(joker0 == 0.0, jnp.inf, t)

    tmin = jnp.min(t, axis=-1)
    idx = jnp.argmin(t, axis=-1).astype(jnp.int32)
    return tmin, idx, jnp.isfinite(tmin)


def parse_hit(scene, ro, rd, tmin, idx, missed, infinity,
              need_normal=True, need_uv=True):
    """Fill the hit record for the winning mesh (raytracer.glsl:1048-1079).

    `need_normal=False` (shadow rays) and `need_uv=False` (texture-free
    scenes or shadow rays) skip the corresponding work statically.
    """
    t_eff = jnp.where(missed, infinity, tmin)
    hit_pos = ro + rd * t_eff[..., None]
    zero3 = jnp.zeros_like(hit_pos)

    w_type = scene.mesh_type[idx]
    is_sphere = w_type == MeshType.SPHERE

    if need_normal:
        w_pos = scene.pos[idx]
        w_size = scene.joker[idx][..., 0]
        n_sph = vm.normalize(hit_pos - w_pos)
        n_pln = vm.normalize(w_pos)
        n_box = _box_normal(w_pos, w_size, hit_pos)
        n = jnp.where(is_sphere[..., None], n_sph,
            jnp.where((w_type == MeshType.PLANE)[..., None], n_pln, n_box))
        n = jnp.where(missed[..., None], zero3, n)
    else:
        n = zero3

    if need_uv:
        # Spherical UV for spheres — computed from the *world* hit position,
        # matching the reference quirk (raytracer.glsl:1055-1059).
        rho = vm.safe_length(hit_pos)
        phi = jnp.arcsin(jnp.clip(hit_pos[..., 1] / rho, -1.0 + 1e-6, 1.0 - 1e-6))
        theta = jnp.arctan2(hit_pos[..., 2], hit_pos[..., 0])
        uv_sph = jnp.stack([phi / PI, theta / TWO_PI], axis=-1)

        # Dominant-normal-axis planar fallback (raytracer.glsl:1070-1076).
        na = jnp.abs(n)
        x_dom = (na[..., 0] > na[..., 1]) & (na[..., 0] > na[..., 2])
        y_dom = (na[..., 1] > na[..., 0]) & (na[..., 1] > na[..., 2])
        uv_x = jnp.stack([-hit_pos[..., 2], -hit_pos[..., 1]], axis=-1)
        uv_y = jnp.stack([hit_pos[..., 0], hit_pos[..., 2]], axis=-1)
        uv_z = jnp.stack([hit_pos[..., 0], -hit_pos[..., 1]], axis=-1)
        uv_fallback = jnp.where(x_dom[..., None], uv_x,
                      jnp.where(y_dom[..., None], uv_y, uv_z))
        uv = jnp.where(is_sphere[..., None], uv_sph, uv_fallback)
        uv = jnp.where(missed[..., None], -jnp.ones_like(uv), uv)
    else:
        uv = -jnp.ones(hit_pos.shape[:-1] + (2,), jnp.float32)

    return Hit(
        t=t_eff,
        idx=jnp.where(missed, 0, idx).astype(jnp.int32),
        pos=jnp.where(missed[..., None], zero3, hit_pos),
        n=n,
        uv=uv,
        missed=missed,
    )


def intersect(scene, ro, rd, cfg, sdf_march=None, need_normal=True,
              need_uv=None):
    """Top-level intersection (raytracer.glsl:997-1082).

    `sdf_march`: optional callable `(scene, ro, rd, tmin, cfg) ->
    (t_sdf, idx_sdf, n_sdf, valid)` supplied by `ops.sdf` when the scene
    contains SDF entries; analytic and SDF winners are merged exactly like
    the reference's tmin comparison (raytracer.glsl:1040-1046).
    """
    if need_uv is None:
        need_uv = bool(scene.tex_types_used)
    eps = cfg.epsilon
    tmin, idx, hit_any = analytic_min(scene, ro, rd, eps)
    missed = ~hit_any | ~(tmin < cfg.infinity)
    tmin = jnp.where(missed, cfg.infinity, tmin)

    if sdf_march is not None and scene.num_sdfs > 0:
        t_sdf, idx_sdf, n_sdf, sdf_valid = sdf_march(scene, ro, rd, tmin, cfg)
        sdf_wins = sdf_valid & (t_sdf < tmin)
        hit = parse_hit(scene, ro, rd,
                        jnp.where(sdf_wins, t_sdf, tmin),
                        jnp.where(sdf_wins, idx_sdf, idx),
                        missed & ~sdf_wins, cfg.infinity,
                        need_normal=need_normal, need_uv=need_uv)
        # SDF normals come from the tetrahedral gradient, not parse_hit.
        if need_normal:
            hit = hit.replace(n=vm.where3(sdf_wins, n_sdf, hit.n))
        return hit

    return parse_hit(scene, ro, rd, tmin, idx, missed, cfg.infinity,
                     need_normal=need_normal, need_uv=need_uv)
