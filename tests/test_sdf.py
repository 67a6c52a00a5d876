"""SDF subsystem: primitives, map, march, normals, gradients, golden."""

import numpy as np
import jax
import jax.numpy as jnp

from raytracer0_tpu.config import RenderConfig
from raytracer0_tpu.cpu_ref import tracer as cpu
from raytracer0_tpu.models.camera import Camera
from raytracer0_tpu.models.dsl import parse_scene
from raytracer0_tpu.models.materials import SdfShape
from raytracer0_tpu.ops import sdf
from raytracer0_tpu.render.renderer import Renderer

CFG = RenderConfig(max_bounces=3, marching_steps=96, use_procedural_sky=False)


def pts(n=64, seed=0, scale=2.0):
    r = np.random.default_rng(seed)
    return jnp.asarray(r.uniform(-scale, scale, (n, 3)).astype(np.float32))


def test_primitives_match_closed_form():
    p = pts()
    # sphere
    d = np.asarray(sdf.sd_sphere(p, 0.7))
    np.testing.assert_allclose(d, np.linalg.norm(np.asarray(p), axis=-1) - 0.7,
                               atol=1e-5)
    # box: outside distance for a point on an axis
    q = jnp.asarray([[2.0, 0.0, 0.0]])
    np.testing.assert_allclose(float(sdf.sd_box(q, jnp.asarray([0.5, 0.5, 0.5]))[0]),
                               1.5, atol=1e-6)
    # round box shrinks by r
    np.testing.assert_allclose(
        float(sdf.ud_round_box(q, jnp.asarray([0.5, 0.5, 0.5]), 0.1)[0]),
        1.4, atol=1e-6)


def test_primitives_match_cpu_ref():
    p = np.asarray(pts(128, 3))
    for jp, cp, args in [
        (sdf.sd_box, cpu._sd_box, (np.array([0.6, 0.4, 0.8], np.float32),)),
        (sdf.sd_sphere, cpu._sd_sphere, (0.9,)),
        (sdf.sd_tri_prism, cpu._sd_tri_prism, (np.array([0.7, 0.5], np.float32),)),
        (sdf.sd_cone, cpu._sd_cone, (np.array([0.8, 0.6, 0.3], np.float32),)),
        (sdf.menger_sponge, cpu._menger, (np.array([1.0, 1.0, 1.0], np.float32),)),
    ]:
        dev = np.asarray(jp(jnp.asarray(p), *[jnp.asarray(a) for a in args]))
        ref = np.array([cp(p[i], *args) for i in range(p.shape[0])])
        np.testing.assert_allclose(dev, ref, atol=2e-5)


def test_mandelbulb_matches_cpu_ref():
    p = np.asarray(pts(64, 7, scale=1.2))
    dev = np.asarray(sdf.mandelbulb(jnp.asarray(p)))
    ref = np.array([cpu._mandelbulb(p[i]) for i in range(p.shape[0])])
    np.testing.assert_allclose(dev, ref, atol=1e-3, rtol=1e-3)


def _sdf_scene():
    return parse_scene("""
        MAT_WHITE, PLANE, vec3(0.0, 1.0, 0.0), vec4(2.0)
        MAT_WHITE, PLANE, vec3(0.0, -1.0, 0.0), vec4(2.0)
        MAT_GREEN, PLANE, vec3(1.0, 0.0, 0.0), vec4(2.0)
        MAT_RED, PLANE, vec3(-1.0, 0.0, 0.0), vec4(2.0)
        MAT_WHITE, PLANE, vec3(0.0, 0.0, 1.0), vec4(2.0)
        MAT_WHITE, PLANE, vec3(0.0, 0.0, -1.0), vec4(2.0)
        MAT_LIGHT_4, SPHERE, vec3(0.0, 1.5, 0.5), vec4(0.4)
        MAT_YELLOW, SDF, vec3(0.0, -0.8, 0.0), vec4(0.5, 0.4, 0.5, 0.1)
        MAT_COAT_PURPLE, SDF, vec3(1.0, -1.2, -0.5), vec4(0.5)
    """, sdf_shapes=[SdfShape.ROUND_BOX, SdfShape.SPHERE])


def test_march_hits_shape():
    scene = _sdf_scene()
    o = jnp.asarray([[0.0, 1.0, 0.0]])
    d = jnp.asarray([[0.0, -1.0, 0.0]])
    t, idx, n, valid = sdf.march(scene, o, d, jnp.asarray([1e4]), CFG)
    assert bool(valid[0])
    # round box top: y = -0.8 + 0.4 + 0.1 = -0.3 -> t ≈ 1.3
    np.testing.assert_allclose(float(t[0]), 1.3, atol=5e-3)
    assert int(idx[0]) == 7
    np.testing.assert_allclose(np.asarray(n[0]), [0, 1, 0], atol=1e-2)


def test_march_matches_cpu_ref():
    scene = _sdf_scene()
    s_np = cpu.scene_to_np(scene)
    r = np.random.default_rng(11)
    for _ in range(40):
        o = r.uniform(-1.5, 1.5, 3).astype(np.float32)
        o[1] = abs(o[1])
        dd = r.normal(size=3).astype(np.float32)
        dd /= np.linalg.norm(dd)
        t_d, idx_d, n_d, valid_d = sdf.march(
            scene, jnp.asarray([o]), jnp.asarray([dd]), jnp.asarray([1e4]), CFG)
        res = cpu.sdf_march(s_np, o, dd, 1e4, CFG)
        if res is None:
            assert not bool(valid_d[0]) or float(t_d[0]) > 1e4 * 0.99
        else:
            assert bool(valid_d[0])
            np.testing.assert_allclose(float(t_d[0]), res[0], atol=2e-3, rtol=1e-3)
            assert int(idx_d[0]) == res[1]


def test_golden_mixed_scene():
    """BASELINE config 3: SDF + quadrics mixed scene vs CPU reference."""
    scene = _sdf_scene()
    cam = Camera.make(origin=(0, 0, 1.99), lookat=(0, 0, -1), fov=60.0)
    H = W = 16
    r = Renderer(scene, cam, CFG, H, W)
    r.step()
    dev = np.asarray(r.state.accum)
    ref = cpu.render(scene, cam, CFG, H, W, 1)
    err = np.abs(dev - ref).max(axis=-1)
    assert np.median(err) < 1e-3
    assert (err < 5e-2).mean() > 0.95
    assert dev.mean() > 0.01


def test_sdf_hit_distance_gradients():
    """The implicit-function reattachment must give the exact dt/dθ of the
    *continuous* hit-distance (silhouette/visibility boundary terms are
    deliberately absent from this estimator — SURVEY.md §7.2-1).

    Ray straight down onto the round box's top face: raising the half-
    height by dh raises the surface, so dt/d(joker[7,1]) = -1 and
    dt/d(pos[7,1]) = -1 exactly.
    """
    scene = _sdf_scene()
    o = jnp.asarray([[0.0, 1.0, 0.0]])
    d = jnp.asarray([[0.0, -1.0, 0.0]])

    def t_of_joker(joker):
        s = scene.replace(joker=joker)
        t, _, _, _ = sdf.march(s, o, d, jnp.asarray([1e4]), CFG)
        return jnp.sum(t)

    def t_of_pos(pos):
        s = scene.replace(pos=pos)
        t, _, _, _ = sdf.march(s, o, d, jnp.asarray([1e4]), CFG)
        return jnp.sum(t)

    gj = np.asarray(jax.grad(t_of_joker)(scene.joker))
    gp = np.asarray(jax.grad(t_of_pos)(scene.pos))
    assert np.all(np.isfinite(gj)) and np.all(np.isfinite(gp))
    np.testing.assert_allclose(gj[7, 1], -1.0, atol=2e-2)  # half-height
    np.testing.assert_allclose(gj[7, 3], -1.0, atol=2e-2)  # round radius
    np.testing.assert_allclose(gp[7, 1], -1.0, atol=2e-2)  # center y
    # other entries unaffected by this ray
    assert abs(gj[8, 0]) < 1e-3


def test_image_gradients_finite_with_sdf():
    """Full image gradients stay finite through the march + shading."""
    scene = _sdf_scene()
    cam = Camera.make(origin=(0, 0, 1.99), lookat=(0, 0, -1), fov=60.0)
    cfg = CFG.replace(max_bounces=2)
    from raytracer0_tpu.render.renderer import sample_radiance

    def img_sum(joker, pos, color):
        s = scene.replace(joker=joker, pos=pos, color=color)
        return jnp.sum(sample_radiance(s, cfg, cam, 12, 12, 0))

    g = jax.grad(img_sum, argnums=(0, 1, 2))(scene.joker, scene.pos, scene.color)
    for t in g:
        assert np.all(np.isfinite(np.asarray(t)))
    # color gradient of the SDF round box is nonzero (it is visible)
    assert np.abs(np.asarray(g[2])[7]).sum() > 0.0


# ---------------------------------------------------------------------------
# udTriangle / udQuad / opCheapBend (raytracer.glsl:537-610; VERDICT r1 #7)
# ---------------------------------------------------------------------------

TRI = np.asarray([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], np.float32)
QUAD = np.asarray([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0],
                   [1.0, 1.0, 0.0], [0.0, 1.0, 0.0]], np.float32)


def test_ud_triangle_matches_cpu_ref():
    p = np.asarray(pts(128, 21))
    a, b, c = (jnp.asarray(v) for v in TRI)
    dev = np.asarray(sdf.ud_triangle(jnp.asarray(p), a, b, c))
    ref = np.array([cpu._ud_triangle(p[i], *TRI) for i in range(p.shape[0])])
    np.testing.assert_allclose(dev, ref, atol=2e-5)
    # face region: directly above the centroid -> plane distance
    q = jnp.asarray([[0.25, 0.25, 0.5]])
    np.testing.assert_allclose(float(sdf.ud_triangle(q, a, b, c)[0]), 0.5, atol=1e-6)
    # edge region: beyond vertex b -> distance to b
    q = jnp.asarray([[2.0, 0.0, 0.0]])
    np.testing.assert_allclose(float(sdf.ud_triangle(q, a, b, c)[0]), 1.0, atol=1e-6)


def test_ud_quad_matches_cpu_ref():
    p = np.asarray(pts(128, 22))
    a, b, c, d = (jnp.asarray(v) for v in QUAD)
    dev = np.asarray(sdf.ud_quad(jnp.asarray(p), a, b, c, d))
    ref = np.array([cpu._ud_quad(p[i], *QUAD) for i in range(p.shape[0])])
    np.testing.assert_allclose(dev, ref, atol=2e-5)
    # interior above -> plane distance
    q = jnp.asarray([[0.5, 0.5, 0.7]])
    np.testing.assert_allclose(float(sdf.ud_quad(q, a, b, c, d)[0]), 0.7, atol=1e-6)


def test_op_cheap_bend_formula():
    p = pts(32, 23, scale=0.3)
    out = np.asarray(sdf.op_cheap_bend(p))
    pn = np.asarray(p)
    cth = np.cos(20.0 * pn[:, 1]); sth = np.sin(20.0 * pn[:, 1])
    np.testing.assert_allclose(out[:, 0], cth * pn[:, 0] - sth * pn[:, 1], atol=1e-5)
    np.testing.assert_allclose(out[:, 1], sth * pn[:, 0] + cth * pn[:, 1], atol=1e-5)
    np.testing.assert_allclose(out[:, 2], pn[:, 2], atol=1e-6)
    # bending preserves distance to the bend axis (it is a rotation in xy)
    np.testing.assert_allclose(np.hypot(out[:, 0], out[:, 1]),
                               np.hypot(pn[:, 0], pn[:, 1]), atol=1e-5)


def _triangle_scene():
    from raytracer0_tpu.models.scene import SceneBuilder
    from raytracer0_tpu.models.materials import MeshType
    sb = SceneBuilder()
    sb.add("MAT_WHITE", MeshType.PLANE, (0.0, 1.0, 0.0), (2.0,))
    sb.add("MAT_LIGHT_4", MeshType.SPHERE, (0.0, 1.5, 0.5), (0.4,))
    # triangle in the z=0 plane at pos (0,0,0)
    sb.add("MAT_YELLOW", MeshType.SDF, (0.0, 0.0, 0.0), (0.0,),
           sdf_shape=SdfShape.TRIANGLE, aux=tuple(TRI.reshape(-1)))
    # unit quad lifted to z=-1
    sb.add("MAT_GREEN", MeshType.SDF, (0.0, 0.0, -1.0), (0.0,),
           sdf_shape=SdfShape.QUAD, aux=tuple(QUAD.reshape(-1)))
    return sb.build()


def test_triangle_quad_march_and_cpu_parity():
    scene = _triangle_scene()
    s_np = cpu.scene_to_np(scene)
    # ray down the +z axis onto the triangle's face region
    o = jnp.asarray([[0.25, 0.25, 1.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    t, idx, n, valid = sdf.march(scene, o, d, jnp.asarray([1e4]), CFG)
    assert bool(valid[0])
    np.testing.assert_allclose(float(t[0]), 1.0, atol=5e-3)
    assert int(idx[0]) == 2  # first SDF entry (after 2 analytic rows)
    res = cpu.sdf_march(s_np, np.asarray(o[0]), np.asarray(d[0]), 1e4, CFG)
    assert res is not None
    np.testing.assert_allclose(float(t[0]), res[0], atol=2e-3)
    # continue through: next surface is the quad at z=-1 (ordinal 1)
    o2 = jnp.asarray([[0.5, 0.5, -0.2]])
    t2, idx2, _, valid2 = sdf.march(scene, o2, d, jnp.asarray([1e4]), CFG)
    assert bool(valid2[0]) and int(idx2[0]) == 3
    np.testing.assert_allclose(float(t2[0]), 0.8, atol=5e-3)


def test_triangle_aux_gradients():
    """IFT gradients flow into the aux vertex parameters: pushing the
    whole triangle along +z (all three vertex z's) moves the hit surface
    toward a ray marching in -z, so dt/d(aux_z) = -1 summed."""
    scene = _triangle_scene()
    o = jnp.asarray([[0.25, 0.25, 1.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])

    def t_of_aux(aux):
        s = scene.replace(aux=aux)
        t, _, _, _ = sdf.march(s, o, d, jnp.asarray([1e4]), CFG)
        return jnp.sum(t)

    g = np.asarray(jax.grad(t_of_aux)(scene.aux))
    assert np.all(np.isfinite(g))
    # row 2 is the triangle; z-components of its 3 vertices at aux cols 2,5,8
    np.testing.assert_allclose(g[2, 2] + g[2, 5] + g[2, 8], -1.0, atol=2e-2)
    assert np.abs(g[3]).sum() < 1e-3  # quad untouched by this ray
