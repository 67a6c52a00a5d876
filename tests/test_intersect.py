"""Analytic intersectors vs closed-form expectations."""

import numpy as np
import jax
import jax.numpy as jnp

from raytracer0_tpu.config import RenderConfig
from raytracer0_tpu.models.materials import MeshType
from raytracer0_tpu.models.scene import SceneBuilder
from raytracer0_tpu.ops import intersect as isect

CFG = RenderConfig()


def cornell_scene():
    sb = SceneBuilder()
    sb.add("MAT_CORNELL_WHITE", MeshType.PLANE, (0, 1, 0), (1.5,))
    sb.add("MAT_CORNELL_WHITE", MeshType.PLANE, (0, -1, 0), (1.5,))
    sb.add("MAT_CORNELL_WHITE", MeshType.PLANE, (0, 0, 1), (2.5,))
    sb.add("MAT_CORNELL_RED", MeshType.PLANE, (1, 0, 0), (1.5,))
    sb.add("MAT_CORNELL_GREEN", MeshType.PLANE, (-1, 0, 0), (1.5,))
    sb.add("MAT_LIGHT_4", MeshType.SPHERE, (0, 1.4, -1.2), (0.3,))
    sb.add("MAT_CORNELL_WHITE", MeshType.BOX, (0.5, -1.0, -1.8), (1.0,))
    sb.add("MAT_CORNELL_WHITE", MeshType.BOX, (-0.45, -1.15, -1.3), (0.7,))
    return sb.build()


def trace_one(scene, o, d):
    o = jnp.asarray([o], jnp.float32)
    d = jnp.asarray([d], jnp.float32)
    # need_uv forced on: these tests exercise the UV math even though the
    # texture-free scene would statically skip it.
    return isect.intersect(scene, o, d, CFG, need_uv=True)


def test_sphere_hit():
    scene = cornell_scene()
    # Ray straight at the light sphere center from below.
    hit = trace_one(scene, (0, 0, -1.2), (0, 1, 0))
    assert int(hit.idx[0]) == 5
    np.testing.assert_allclose(float(hit.t[0]), 1.4 - 0.3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(hit.n[0]), [0, -1, 0], atol=1e-5)


def test_plane_hit_floor():
    scene = cornell_scene()
    hit = trace_one(scene, (0, 0, 2.0), (0, -1, 0))
    assert int(hit.idx[0]) == 0  # floor plane y=-1.5
    np.testing.assert_allclose(float(hit.t[0]), 1.5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(hit.n[0]), [0, 1, 0], atol=1e-6)


def test_box_hit_and_normal():
    scene = cornell_scene()
    # Tall box: center (0.5,-1.0,-1.8), edge 1.0 -> +x face at x=1.0
    hit = trace_one(scene, (1.49, -1.0, -1.8), (-1, 0, 0))
    assert int(hit.idx[0]) == 6
    np.testing.assert_allclose(float(hit.t[0]), 0.49, atol=1e-5)
    np.testing.assert_allclose(np.asarray(hit.n[0]), [1, 0, 0], atol=1e-5)


def test_closest_wins():
    scene = cornell_scene()
    # Looking down -z from origin: should hit back wall at z=-2.5 unless a
    # box is in the way; at this height boxes top out below y=0.
    hit = trace_one(scene, (0, 0.9, 2.0), (0, 0, -1))
    assert int(hit.idx[0]) == 2
    np.testing.assert_allclose(float(hit.t[0]), 4.5, atol=1e-5)


def test_miss_reports_infinity():
    sb = SceneBuilder()
    sb.add("MAT_LIGHT_4", MeshType.SPHERE, (0, 0, -5), (0.5,))
    scene = sb.build()
    hit = trace_one(scene, (0, 0, 0), (0, 1, 0))
    assert bool(hit.missed[0])
    assert float(hit.t[0]) == CFG.infinity
    assert int(hit.idx[0]) == 0  # HIT_MISS convention (raytracer.glsl:105)


def test_degenerate_mesh_skipped():
    sb = SceneBuilder()
    sb.add("MAT_WHITE", MeshType.SPHERE, (0, 0, -2), (0.0,))  # joker.x == 0
    sb.add("MAT_WHITE", MeshType.SPHERE, (0, 0, -4), (0.5,))
    scene = sb.build()
    hit = trace_one(scene, (0, 0, 0), (0, 0, -1))
    assert int(hit.idx[0]) == 1
    np.testing.assert_allclose(float(hit.t[0]), 3.5, atol=1e-5)


def test_inside_sphere_second_root():
    sb = SceneBuilder()
    sb.add("MAT_WHITE", MeshType.SPHERE, (0, 0, 0), (1.0,))
    scene = sb.build()
    hit = trace_one(scene, (0, 0, 0), (0, 0, -1))
    np.testing.assert_allclose(float(hit.t[0]), 1.0, atol=1e-5)


def test_sphere_uv_and_fallback_uv():
    scene = cornell_scene()
    hit = trace_one(scene, (0, 0, -1.2), (0, 1, 0))  # sphere hit
    uv = np.asarray(hit.uv[0])
    assert np.all(np.isfinite(uv))
    hit2 = trace_one(scene, (0, 0, 2.0), (0, -1, 0))  # floor plane
    uv2 = np.asarray(hit2.uv[0])
    # y-dominant normal -> uv = pos.xz = (0, 2.0)
    np.testing.assert_allclose(uv2, [0.0, 2.0], atol=1e-5)


def test_t_differentiable_wrt_geometry():
    scene = cornell_scene()

    def f(pos):
        s = scene.replace(pos=pos)
        o = jnp.asarray([[0.0, 0.0, -1.2]])
        d = jnp.asarray([[0.0, 1.0, 0.0]])
        hit = isect.intersect(s, o, d, CFG)
        return jnp.sum(hit.t)

    g = jax.grad(f)(scene.pos)
    g = np.asarray(g)
    assert np.all(np.isfinite(g))
    # Moving the light sphere up by dy increases t by dy.
    np.testing.assert_allclose(g[5, 1], 1.0, atol=1e-4)


def test_batched_shapes():
    scene = cornell_scene()
    o = jnp.zeros((4, 8, 3))
    d = jnp.tile(jnp.asarray([0.0, 0.0, -1.0]), (4, 8, 1))
    hit = isect.intersect(scene, o, d, CFG)
    assert hit.t.shape == (4, 8)
    assert hit.n.shape == (4, 8, 3)
    assert hit.uv.shape == (4, 8, 2)
