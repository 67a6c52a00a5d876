"""Signed-distance-field subsystem: primitives, operators, fractals,
scene map, tetrahedral normals, and the differentiable sphere-tracing
marcher.

Device-side redesign of raytracer.glsl:496-722 and 974-993.  Key TPU
choices:

* shape selection per SDF entry is **static** (`scene.sdf_shapes_static`),
  specializing the traced program exactly like the reference's
  `#sdf_meshes` codegen (index.html:703-717) — no per-step dispatch;
* the march runs under `lax.while_loop` with a vectorized all-lanes-done
  early exit — divergence costs one wavefront iteration, not a recompile;
* gradients flow through the *implicit function theorem*, not the
  unrolled loop: the marched `t*` is reattached as
  `t = t* - (f(x*, θ) - stop_grad(f)) / stop_grad(∂f/∂t)`, giving the
  exact `dt/dθ = -f_θ / f_t` at the surface while the 128-step loop
  itself stays out of the autodiff graph and the forward value stays
  bit-identical to the raw march (SURVEY.md §7.2-4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from raytracer0_tpu.models.materials import SdfShape
from raytracer0_tpu.ops import noise as nz
from raytracer0_tpu.ops import vecmath as vm


# ---------------------------------------------------------------------------
# primitives (raytracer.glsl:496-576) — p is [..., 3], params broadcastable
# ---------------------------------------------------------------------------

def sd_box(p, b):
    d = jnp.abs(p) - b
    outside = vm.length(jnp.maximum(d, 0.0))
    inside = jnp.minimum(jnp.max(d, axis=-1), 0.0)
    return outside + inside


def ud_round_box(p, b, r):
    return vm.length(jnp.maximum(jnp.abs(p) - b, 0.0)) - r


def sd_sphere(p, s):
    return vm.length(p) - s


def sd_plane(p, n4):
    return vm.vdot(p, n4[..., :3]) + n4[..., 3]


def sd_cone(p, c):
    qx = jnp.sqrt(jnp.maximum(p[..., 0] ** 2 + p[..., 2] ** 2, 0.0))
    qy = p[..., 1]
    d1 = -qy - c[..., 2]
    d2 = jnp.maximum(qx * c[..., 0] + qy * c[..., 1], qy)
    dd = jnp.stack([d1, d2], axis=-1)
    outside = jnp.sqrt(jnp.maximum(jnp.sum(jnp.maximum(dd, 0.0) ** 2, -1), 0.0))
    return outside + jnp.minimum(jnp.maximum(d1, d2), 0.0)


def sd_tri_prism(p, h):
    q = jnp.abs(p)
    return jnp.maximum(
        q[..., 2] - h[..., 1],
        jnp.maximum(q[..., 0] * 0.866025 + p[..., 1] * 0.5, -p[..., 1]) - h[..., 0] * 0.5,
    )


def sd_ellipsoid(p, r):
    return (vm.safe_length(p / r) - 1.0) * jnp.min(r, axis=-1)


def sd_capsule(p, a, b, r):
    pa = p - a
    ba = b - a
    h = jnp.clip(vm.vdot(pa, ba) / jnp.maximum(vm.vdot(ba, ba), 1e-12), 0.0, 1.0)
    return vm.length(pa - ba * h[..., None]) - r


def _dot2(v):
    return vm.vdot(v, v)


def _edge_dist2(edge, pv):
    """Squared distance from pv to the segment 0→edge (the clamped-
    projection term shared by udTriangle/udQuad)."""
    h = jnp.clip(vm.vdot(edge, pv) / jnp.maximum(_dot2(edge), 1e-12), 0.0, 1.0)
    return _dot2(edge * h[..., None] - pv)


def ud_triangle(p, a, b, c):
    """Unsigned distance to triangle abc (raytracer.glsl:537-554):
    edge-region select via the sign-sum test, else plane distance."""
    ba, pa = b - a, p - a
    cb, pb = c - b, p - b
    ac, pc = a - c, p - c
    nor = vm.cross(ba, ac)
    edge_region = (jnp.sign(vm.vdot(vm.cross(ba, nor), pa))
                   + jnp.sign(vm.vdot(vm.cross(cb, nor), pb))
                   + jnp.sign(vm.vdot(vm.cross(ac, nor), pc))) < 2.0
    d_edge = jnp.minimum(jnp.minimum(_edge_dist2(ba, pa), _edge_dist2(cb, pb)),
                         _edge_dist2(ac, pc))
    dn = vm.vdot(nor, pa)
    d_face = dn * dn / jnp.maximum(_dot2(nor), 1e-12)
    return jnp.sqrt(jnp.maximum(jnp.where(edge_region, d_edge, d_face), 0.0))


def ud_quad(p, a, b, c, d):
    """Unsigned distance to quad abcd (raytracer.glsl:556-576)."""
    ba, pa = b - a, p - a
    cb, pb = c - b, p - b
    dc, pc = d - c, p - c
    ad, pd = a - d, p - d
    nor = vm.cross(ba, ad)
    edge_region = (jnp.sign(vm.vdot(vm.cross(ba, nor), pa))
                   + jnp.sign(vm.vdot(vm.cross(cb, nor), pb))
                   + jnp.sign(vm.vdot(vm.cross(dc, nor), pc))
                   + jnp.sign(vm.vdot(vm.cross(ad, nor), pd))) < 3.0
    d_edge = jnp.minimum(
        jnp.minimum(_edge_dist2(ba, pa), _edge_dist2(cb, pb)),
        jnp.minimum(_edge_dist2(dc, pc), _edge_dist2(ad, pd)))
    dn = vm.vdot(nor, pa)
    d_face = dn * dn / jnp.maximum(_dot2(nor), 1e-12)
    return jnp.sqrt(jnp.maximum(jnp.where(edge_region, d_edge, d_face), 0.0))


# ---------------------------------------------------------------------------
# operators (raytracer.glsl:582-624)
# ---------------------------------------------------------------------------

def op_union(d1, d2):
    return jnp.minimum(d1, d2)


def op_subtract(d1, d2):
    return jnp.maximum(-d2, d1)


def op_intersect(d1, d2):
    return jnp.maximum(d1, d2)


def op_repeat(p, c):
    return jnp.mod(p, c) - 0.5 * c


def op_twist(p):
    c = jnp.cos(20.0 * p[..., 1])
    s = jnp.sin(20.0 * p[..., 1])
    x = c * p[..., 0] - s * p[..., 2]
    z = s * p[..., 0] + c * p[..., 2]
    return jnp.stack([x, z, p[..., 1]], axis=-1)


def op_cheap_bend(p):
    """Domain bend in the XY plane (raytracer.glsl:605-610): rotate
    (x, y) by angle 20·y, keep z."""
    c = jnp.cos(20.0 * p[..., 1])
    s = jnp.sin(20.0 * p[..., 1])
    x = c * p[..., 0] - s * p[..., 1]
    y = s * p[..., 0] + c * p[..., 1]
    return jnp.stack([x, y, p[..., 2]], axis=-1)


def disp(p, phase, power):
    return jnp.power(
        0.5 + 0.5 * jnp.cos(p[..., 0] + 1.5 * phase)
        * jnp.sin(p[..., 1] + 2.0 * phase)
        * jnp.sin(p[..., 2] + 1.0 * phase),
        power,
    )


def snowball(lut, p, s):
    return sd_sphere(p, s) - nz.value_noise(lut, p * 8.0) * 0.04


def sd_sea_box(p, b, level):
    n4 = jnp.concatenate([
        jnp.broadcast_to(jnp.asarray([0.0, -1.0, 0.0]), p.shape),
        jnp.broadcast_to(level, p.shape[:-1] + (1,))], axis=-1)
    sea = sd_plane(p, n4) - disp(10.0 * p, 2.5, 1.0) * 0.07 - disp(15.0 * p, 4.5, 1.0) * 0.03
    return op_subtract(sd_box(p, b), sea)


def siggraph_obj(p):
    ax = jnp.asarray([-2.0, 2.0, 1.0]) / 3.0
    ce = jnp.asarray([0.0, -0.2, -0.2])
    d1 = vm.vdot(p, ax) - 0.1
    d2 = vm.length(p) - 1.0
    pc = p - ce
    d3 = vm.length(pc - ax * vm.vdot(pc, ax)[..., None]) - 1.0
    return jnp.maximum(jnp.maximum(d1, d2), -d3)


# ---------------------------------------------------------------------------
# fractals (raytracer.glsl:642-698)
# ---------------------------------------------------------------------------

def menger_sponge(p, scale):
    """4-iteration Menger sponge carved from a box."""
    d = sd_box(p, scale)
    s = 1.0
    for _ in range(4):
        a = jnp.mod(p * s, 2.0) - 1.0
        s = s * 3.0
        r = jnp.abs(1.0 - 3.0 * jnp.abs(a))
        da = jnp.maximum(r[..., 0], r[..., 1])
        db = jnp.maximum(r[..., 1], r[..., 2])
        dc = jnp.maximum(r[..., 2], r[..., 0])
        c = (jnp.minimum(da, jnp.minimum(db, dc)) - 1.0) / s
        d = jnp.maximum(c, d)
    return d


def mandelbulb(p):
    """Power-8 Mandelbulb, 3 iterations, DE = 0.25·log(m)·√m/dz; the
    GLSL early break at |w|² > 4 becomes a done-mask."""
    w = p
    m = vm.vdot(w, w)
    dz = jnp.ones_like(m)
    done = jnp.zeros_like(m, bool)
    for _ in range(3):
        m2 = m * m
        m4 = m2 * m2
        dz_new = 8.0 * jnp.sqrt(jnp.maximum(m4 * m2 * m, 1e-20)) * dz + 1.0

        x, y, z = w[..., 0], w[..., 1], w[..., 2]
        x2, y2, z2 = x * x, y * y, z * z
        x4, y4, z4 = x2 * x2, y2 * y2, z2 * z2
        k3 = x2 + z2
        k2 = jnp.reciprocal(jnp.sqrt(jnp.maximum(k3 ** 7, 1e-20)))
        k1 = x4 + y4 + z4 - 6.0 * y2 * z2 - 6.0 * x2 * y2 + 2.0 * z2 * x2
        k4 = x2 - y2 + z2

        wx = p[..., 0] + 64.0 * x * y * z * (x2 - z2) * k4 * (x4 - 6.0 * x2 * z2 + z4) * k1 * k2
        wy = p[..., 1] + -16.0 * y2 * k3 * k4 * k4 + k1 * k1
        wz = p[..., 2] + -8.0 * y * k4 * (x4 * x4 - 28.0 * x4 * x2 * z2 + 70.0 * x4 * z4
                                          - 28.0 * x2 * z2 * z4 + z4 * z4) * k1 * k2
        w_new = jnp.stack([wx, wy, wz], axis=-1)
        m_new = vm.vdot(w_new, w_new)

        w = vm.where3(done, w, w_new)
        dz = jnp.where(done, dz, dz_new)
        m = jnp.where(done, m, m_new)
        done = done | (m > 4.0)
    m_safe = jnp.maximum(m, 1e-12)
    return 0.25 * jnp.log(m_safe) * jnp.sqrt(m_safe) / dz


def _entry_distance(scene, k, p):
    """Distance of SDF entry k (static ordinal) at points p, using the
    statically selected shape (the #sdf_meshes codegen analogue)."""
    i = scene.num_analytic + k
    shape = scene.sdf_shapes_static[k]
    q = p - scene.pos[i]
    jk = scene.joker[i]
    if shape == SdfShape.BOX:
        return sd_box(q, jk[:3])
    if shape == SdfShape.ROUND_BOX:
        return ud_round_box(q, jk[:3], jk[3])
    if shape == SdfShape.SPHERE:
        return sd_sphere(q, jk[0])
    if shape == SdfShape.TRI_PRISM:
        return sd_tri_prism(q, jk[:2])
    if shape == SdfShape.CONE:
        return sd_cone(q, jk[:3])
    if shape == SdfShape.MENGER_SPONGE:
        return menger_sponge(q, jk[:3])
    if shape == SdfShape.MANDELBULB:
        return mandelbulb(q)
    if shape == SdfShape.ELLIPSOID:
        return sd_ellipsoid(q, jk[:3])
    if shape == SdfShape.CAPSULE:
        return sd_capsule(p, scene.pos[i], jk[:3], jk[3])
    if shape == SdfShape.SNOWBALL:
        return snowball(scene.noise, q, jk[0])
    if shape == SdfShape.SEA_BOX:
        return sd_sea_box(q, jk[:3], jk[3])
    if shape == SdfShape.SIGGRAPH:
        return siggraph_obj(q)
    if shape == SdfShape.TRIANGLE:
        ax = scene.aux[i]
        return ud_triangle(q, ax[0:3], ax[3:6], ax[6:9])
    if shape == SdfShape.QUAD:
        ax = scene.aux[i]
        return ud_quad(q, ax[0:3], ax[3:6], ax[6:9], ax[9:12])
    raise ValueError(f"unknown SDF shape {shape}")


def scene_map(scene, p):
    """min-fold over SDF entries → (distance [...], sdf ordinal i32 [...])
    (raytracer.glsl:700-712)."""
    best_d = _entry_distance(scene, 0, p)
    best_i = jnp.zeros(best_d.shape, jnp.int32)
    for k in range(1, scene.num_sdfs):
        d = _entry_distance(scene, k, p)
        closer = d < best_d
        best_i = jnp.where(closer, k, best_i)
        best_d = jnp.minimum(d, best_d)
    return best_d, best_i


def calc_normal(scene, p, eps):
    """Tetrahedral 4-tap finite-difference normal (raytracer.glsl:714-722)."""
    k = jnp.asarray([[1.0, -1.0, -1.0], [-1.0, -1.0, 1.0],
                     [-1.0, 1.0, -1.0], [1.0, 1.0, 1.0]])
    n = jnp.zeros_like(p)
    for j in range(4):
        n = n + k[j] * scene_map(scene, p + k[j] * eps)[0][..., None]
    return vm.normalize(n)


def _bound_radius(scene, k):
    """Conservative bounding-sphere radius of SDF entry `k` around its
    center, or None when no cheap bound exists (mirrors the megakernel's
    `_sdf_bound_radius`; rotation-invariant, bob pre-animated into pos)."""
    from raytracer0_tpu.models.materials import SdfShape

    s = int(scene.sdf_shapes_static[k])
    jk = scene.joker[scene.num_analytic + k]
    norm3 = jnp.sqrt(jk[0] * jk[0] + jk[1] * jk[1] + jk[2] * jk[2])
    if s in (int(SdfShape.BOX), int(SdfShape.MENGER_SPONGE)):
        return norm3 * 1.05 + 0.05
    if s == int(SdfShape.ROUND_BOX):
        return norm3 * 1.05 + jnp.abs(jk[3]) + 0.05
    if s == int(SdfShape.SPHERE):
        return jnp.abs(jk[0]) + 0.05
    if s == int(SdfShape.SNOWBALL):
        return jnp.abs(jk[0]) + 0.15
    if s == int(SdfShape.MANDELBULB):
        return jnp.asarray(2.5, jnp.float32)
    if s == int(SdfShape.ELLIPSOID):
        return jnp.abs(jk[0]) + jnp.abs(jk[1]) + jnp.abs(jk[2]) + 0.05
    return None


def _march_loop(scene, ro, rd, tmin, cfg):
    """Raw sphere trace (raytracer.glsl:974-993): not differentiated —
    `march` reattaches gradients implicitly."""
    t0 = jnp.full(ro.shape[:-1], cfg.epsilon * 4.0, jnp.float32)
    d0, i0 = scene_map(scene, ro + rd * t0[..., None])
    done0 = jnp.abs(d0) < cfg.epsilon

    # Bounding-sphere gate (bit-exact, same argument as the megakernel's
    # sdf_march): a lane whose ray cannot enter any entry's conservative
    # bound within [0, tmin] can never converge to |dist| < eps there —
    # mark it done at entry and force it invalid.
    bounds = [_bound_radius(scene, k) for k in range(scene.num_sdfs)]
    if bounds and all(b is not None for b in bounds):
        can_hit = jnp.zeros_like(done0)
        for k, rb in enumerate(bounds):
            pos = scene.pos[scene.num_analytic + k]
            oc = ro - pos
            b = vm.vdot(oc, rd)
            cq = vm.vdot(oc, oc) - rb * rb
            disc = b * b - cq
            sq = vm.safe_sqrt(disc)
            can_hit = can_hit | ((disc > 0.0) & (-b + sq > 0.0)
                                 & (-b - sq < tmin))
        bound_miss = ~can_hit
        done0 = done0 | bound_miss
    else:
        bound_miss = None

    def cond(state):
        step, t, res_i, done = state
        return (step < cfg.marching_steps - 1) & jnp.any(~done)

    def body(state):
        step, t, res_i, done = state
        dist, idx = scene_map(scene, ro + rd * t[..., None])
        h = jnp.abs(dist)
        hit_or_past = (h < cfg.epsilon) | (t > tmin)
        t_new = jnp.where(done | hit_or_past, t, t + h * cfg.fudge_factor)
        res_i = jnp.where(done, res_i, idx)
        return step + 1, t_new, res_i, done | hit_or_past

    _, t, res_i, _ = jax.lax.while_loop(
        cond, body, (jnp.zeros((), jnp.int32), t0, i0, done0))
    # Final evaluation at the settled t (the reference's post-loop state).
    dist, res_i = scene_map(scene, ro + rd * t[..., None])
    valid = t <= tmin
    if bound_miss is not None:
        valid = valid & ~bound_miss
    return t, res_i, valid


def march(scene, ro, rd, tmin, cfg):
    """Differentiable SDF intersection.

    Returns (t, mesh_idx, normal, valid) matching the `sdf_march` hook of
    `ops.intersect.intersect`.  The march itself is non-differentiable;
    t is reattached via the implicit function theorem (module docstring).
    """
    sg = jax.lax.stop_gradient
    scene_sg = jax.tree_util.tree_map(sg, scene)
    t_star, res_i, valid = _march_loop(scene_sg, sg(ro), sg(rd), sg(tmin), cfg)

    # Escaped lanes settle at t up to cfg.infinity; evaluating unbounded
    # fields (Mandelbulb) that far out overflows f32 to NaN, and a NaN
    # primal poisons reverse-mode even under a zero cotangent.  All
    # invalid-lane results are discarded by the caller (sdf_wins gate),
    # so pin their evaluation point to the ray origin.
    t_safe = jnp.where(valid, t_star, 0.0)

    # Implicit reattachment: t = t* - f(ro + t*·rd, θ) / ∂f/∂t|_sg
    x_star = ro + rd * t_safe[..., None]
    f_val, _ = scene_map(scene, x_star)  # differentiable w.r.t. scene, ro, rd
    h = cfg.epsilon
    f_fwd, _ = scene_map(scene_sg, sg(x_star) + sg(rd) * h)
    f_bwd, _ = scene_map(scene_sg, sg(x_star) - sg(rd) * h)
    dfdt = (f_fwd - f_bwd) / (2.0 * h)
    dfdt = jnp.where(jnp.abs(dfdt) < 0.05,
                     jnp.where(dfdt < 0, -0.05, 0.05), dfdt)
    t = jnp.where(valid, t_star - (f_val - sg(f_val)) / sg(dfdt), t_star)

    idx = (scene.num_analytic + res_i).astype(jnp.int32)
    n = calc_normal(scene, ro + rd * jnp.where(valid, t, 0.0)[..., None],
                    cfg.epsilon)
    return t, idx, n, valid
