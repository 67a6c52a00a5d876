"""Animated-mode (RENDER_MODE==1) coverage: K10 animation system + H12
animated-mode controller + K9 EMA accumulation.

The reference animates inside every intersector call
(`getAnimatedPosition`, raytracer.glsl:263-298); here positions are
animated once per frame on the scene pytree (models.scene.
animate_positions), which is semantically identical.  Parity is checked
against an independent scalar mirror in the CPU oracle
(cpu_ref.tracer.animate_positions_np), and end-to-end against the oracle
renderer at time_s > 0.
"""

import numpy as np
import jax.numpy as jnp

from raytracer0_tpu.config import ANIMATED_CONFIG, RenderMode
from raytracer0_tpu.cpu_ref import tracer as cpu
from raytracer0_tpu.models import scene as scene_mod
from raytracer0_tpu.models.presets import animated_restir
from raytracer0_tpu.render.renderer import Renderer, render_pass, sample_radiance
from raytracer0_tpu.render.state import RenderState


def test_animate_positions_parity():
    """Device animate_positions == oracle scalar mirror, several times.

    The animated_restir scene has 17 analytic rows (lights at indices
    6-14 take the orbit branch) and 1 SDF row (rotate-Y + bob branch,
    raytracer.glsl:281-295) — both branches are exercised."""
    scene, _, _ = animated_restir()
    assert scene.num_sdfs == 1  # the metal SDF box
    for t in (0.0, 0.37, 1.0, 2.75, 9.1):
        dev = np.asarray(
            scene_mod.animate_positions(scene, t, 1).pos)
        s = cpu.scene_to_np(scene)
        ref = cpu.animate_positions_np(s, t).pos
        np.testing.assert_allclose(dev, ref, atol=1e-5,
                                   err_msg=f"time_s={t}")


def test_animate_positions_sdf_rotates_about_origin():
    """The SDF branch rotates the *position about the Y axis* (not a
    local offset): at t where angle=pi/ (0.5 rad/s), an SDF at +x must
    move toward -x."""
    scene, _, _ = animated_restir()
    sdf_row = scene.num_analytic
    base = np.asarray(scene.pos)[sdf_row]
    # place the SDF off-axis so rotation visibly moves it
    pos = np.asarray(scene.pos).copy()
    pos[sdf_row] = [1.0, -0.2, 0.0]
    scene = scene.replace(pos=jnp.asarray(pos))
    t = 2.0 * np.pi  # angle = pi -> x -> -x
    out = np.asarray(scene_mod.animate_positions(scene, t, 1).pos)[sdf_row]
    np.testing.assert_allclose(out[0], -1.0, atol=1e-4)
    np.testing.assert_allclose(out[2], 0.0, atol=1e-4)
    # bob: y = -0.2 + sin(t*1.5)*0.05
    np.testing.assert_allclose(out[1], -0.2 + np.sin(t * 1.5) * 0.05,
                               atol=1e-5)
    del base


def test_animate_static_mode_is_identity():
    scene, _, _ = animated_restir()
    out = scene_mod.animate_positions(scene, 3.3, 0)
    np.testing.assert_array_equal(np.asarray(out.pos), np.asarray(scene.pos))


def test_animated_golden_vs_oracle():
    """End-to-end RENDER_MODE==1 golden at time_s > 0: device integrator
    vs the CPU oracle, both animating internally (ReSTIR off — the
    oracle has no ReSTIR path; this validates K10 inside the trace).

    Same layout as animated_restir but with an untextured SDF (the
    oracle deliberately has no procedural-noise texture path)."""
    from raytracer0_tpu.models.dsl import parse_scene
    from raytracer0_tpu.models.camera import Camera
    from raytracer0_tpu.models.materials import SdfShape

    scene = parse_scene("""
        MAT_WHITE, PLANE, vec3(0.0, 1.0, 0.0), vec4(2.0)
        MAT_WHITE, PLANE, vec3(0.0, -1.0, 0.0), vec4(2.0)
        MAT_GREEN, PLANE, vec3(1.0, 0.0, 0.0), vec4(2.0)
        MAT_RED, PLANE, vec3(-1.0, 0.0, 0.0), vec4(2.0)
        MAT_WHITE, PLANE, vec3(0.0, 0.0, 1.0), vec4(2.0)
        MAT_WHITE, PLANE, vec3(0.0, 0.0, -1.0), vec4(2.0)
        MAT_LIGHT_4, SPHERE, vec3(0.0, 1.7, 0.0), vec4(0.1)
        MAT_LIGHT_CANDLE_4, SPHERE, vec3(0.8, 1.5, 0.8), vec4(0.08)
        MAT_MIRROR, SPHERE, vec3(0.4, -0.3, -0.4), vec4(0.35)
        MAT_WHITE, SDF, vec3(0.0, -0.2, 0.3), vec4(0.3, 0.05, 0.3, 0.0)
    """, sdf_shapes=[SdfShape.ROUND_BOX])
    cam = Camera.make(origin=(0.0, 0.0, 1.99), lookat=(0.0, 0.0, -1.0),
                      fov=60.0)
    _, _, cfg = animated_restir()
    cfg = cfg.replace(use_restir=False, max_bounces=3, marching_steps=48)
    H = W = 12
    t = 0.9
    dev = np.asarray(sample_radiance(scene, cfg, cam, H, W, 0, time_s=t))
    ref = cpu.render(scene, cam, cfg, H, W, 1, time_s=t)
    err = np.abs(dev - ref).max(axis=-1)
    assert np.median(err) < 1e-3
    assert (err < 5e-2).mean() > 0.95
    assert dev.mean() > 0.001


def test_ema_accumulation():
    """Animated accumulation is EMA mix(prev, cur, 1/temporalFrames)
    (raytracer.glsl:2159-2165), not a running sum."""
    scene, cam, cfg = animated_restir()
    cfg = cfg.replace(use_restir=False, max_bounces=2, marching_steps=32)
    assert cfg.render_mode == RenderMode.ANIMATED
    H = W = 8
    alpha = 1.0 / cfg.temporal_frames

    rad0 = np.asarray(sample_radiance(scene, cfg, cam, H, W, 0, time_s=0.5))
    rad1 = np.asarray(sample_radiance(scene, cfg, cam, H, W, 1, time_s=0.5))

    st = RenderState.create(H, W)
    st = render_pass(scene, cam, cfg, st, H, W, time_s=0.5)
    expect = rad0 * alpha
    np.testing.assert_allclose(np.asarray(st.accum), expect, atol=1e-5)

    st = render_pass(scene, cam, cfg, st, H, W, time_s=0.5)
    expect = expect + (rad1 - expect) * alpha
    np.testing.assert_allclose(np.asarray(st.accum), expect, atol=1e-5)


def test_animated_restir_end_to_end():
    """The full animated_restir preset (preset 7 semantics: ReSTIR on,
    EMA, real-time budget) runs, stays finite, and produces signal."""
    scene, cam, cfg = animated_restir()
    cfg = cfg.replace(marching_steps=32, restir_samples=4)
    H = W = 16
    r = Renderer(scene, cam, cfg, H, W)
    for p in range(3):
        r.step(time_s=0.1 * p)
    img = np.asarray(r.image())
    assert np.all(np.isfinite(img))
    assert img.mean() > 1e-3
    res = r.state.restir_back
    assert np.all(np.isfinite(np.asarray(res.m)))
    assert int(r.state.passes) == 3
