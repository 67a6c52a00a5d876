"""Golden test: device integrator vs the independent CPU reference.

BASELINE config 1: Cornell box, quadric primitives, cosine-weighted
diffuse, 2 bounces, CPU-runnable.  Both tracers draw identical RNG
streams, so they follow the *same* paths; the comparison validates the
masked-wavefront re-design per pixel, not just statistically.

A small fraction of pixels may legitimately diverge when a discrete
branch comparison (u < Re, t < tmin) lands within float-ULP noise between
XLA and numpy; the test therefore requires near-exact agreement on >99 %
of pixels and a tight median error.
"""

import numpy as np
import jax

from raytracer0_tpu.config import RenderConfig
from raytracer0_tpu.cpu_ref import tracer as cpu
from raytracer0_tpu.models.presets import cornell_default, mis_demo
from raytracer0_tpu.render.renderer import Renderer

H = W = 24
PASSES = 2


def compare(scene, cam, cfg, tol=2e-3, frac=0.99):
    r = Renderer(scene, cam, cfg, H, W)
    for _ in range(PASSES):
        r.step()
    dev = np.asarray(r.state.accum) / PASSES
    ref = cpu.render(scene, cam, cfg, H, W, PASSES)
    err = np.abs(dev - ref).max(axis=-1)
    agree = (err < tol).mean()
    med = np.median(err)
    assert med < 1e-4, f"median err {med}"
    assert agree >= frac, f"only {agree:.3f} of pixels agree (tol {tol})"
    # images carry actual signal
    assert dev.mean() > 0.01


def test_config1_cornell_diffuse():
    scene, cam, cfg = cornell_default()
    cfg = cfg.replace(max_bounces=2, use_procedural_sky=False)
    compare(scene, cam, cfg)


def test_cornell_no_nee_bruteforce():
    scene, cam, cfg = cornell_default()
    cfg = cfg.replace(max_bounces=3, sample_lights=False, use_procedural_sky=False)
    compare(scene, cam, cfg)


def test_cornell_with_mis():
    scene, cam, cfg = cornell_default()
    cfg = cfg.replace(max_bounces=3, use_mis=True, use_procedural_sky=False)
    compare(scene, cam, cfg)


def test_config2_spec_refr_lights():
    """Specular + refractive + MIS on the MIS-demo-style scene (analytic
    part only: swap the SDF occluder for a BOX so the CPU/device paths
    exercise REFR/SPEC without SDF marching)."""
    from raytracer0_tpu.models.dsl import parse_scene
    from raytracer0_tpu.models.camera import Camera

    scene = parse_scene("""
        MAT_WHITE, PLANE, vec3(0.0, 1.0, 0.0), vec4(2.0)
        MAT_WHITE, PLANE, vec3(0.0, -1.0, 0.0), vec4(2.0)
        MAT_GREEN, PLANE, vec3(1.0, 0.0, 0.0), vec4(2.0)
        MAT_RED, PLANE, vec3(-1.0, 0.0, 0.0), vec4(2.0)
        MAT_WHITE, PLANE, vec3(0.0, 0.0, 1.0), vec4(2.0)
        MAT_WHITE, PLANE, vec3(0.0, 0.0, -1.0), vec4(2.0)
        MAT_LIGHT_4, SPHERE, vec3(0.0, 1.5, -1.0), vec4(0.3)
        MAT_REFR_CLEAR_2, SPHERE, vec3(-0.5, -0.6, 0.0), vec4(0.4)
        MAT_MIRROR, SPHERE, vec3(0.6, -0.6, -0.5), vec4(0.4)
        MAT_COAT_PURPLE, SPHERE, vec3(0.0, -1.4, 0.8), vec4(0.35)
    """)
    cam = Camera.make(origin=(0, 0, 1.99), lookat=(0, 0, -1), fov=60.0)
    cfg = RenderConfig(max_bounces=4, use_mis=True, use_procedural_sky=False)
    compare(scene, cam, cfg)


def test_gradients_match_finite_differences():
    """Pixel gradients w.r.t. light emission vs central differences on the
    CPU reference (the BASELINE 'pixel-grad max-abs-err' metric)."""
    scene, cam, cfg = cornell_default()
    cfg = cfg.replace(max_bounces=2, use_procedural_sky=False)

    import jax.numpy as jnp
    from raytracer0_tpu.render.renderer import render_pass
    from raytracer0_tpu.render.state import RenderState

    def image_sum(emission):
        s = scene.replace(emission=emission)
        st = RenderState.create(12, 12)
        st = render_pass(s, cam, cfg, st, 12, 12)
        return jnp.sum(st.accum)

    g = np.asarray(jax.grad(image_sum)(scene.emission))
    assert np.all(np.isfinite(g))

    # finite differences on the CPU reference, light sphere (idx 5) emission
    eps = 1e-2
    em = np.asarray(scene.emission).copy()
    em_p = em.copy(); em_p[5] += eps
    em_m = em.copy(); em_m[5] -= eps
    import jax.numpy as jnp2
    ref_p = cpu.render(scene.replace(emission=jnp2.asarray(em_p)), cam, cfg, 12, 12, 1).sum()
    ref_m = cpu.render(scene.replace(emission=jnp2.asarray(em_m)), cam, cfg, 12, 12, 1).sum()
    fd = (ref_p - ref_m) / (2 * eps)
    ad = g[5].sum()
    assert abs(ad - fd) / max(abs(fd), 1e-6) < 0.05, (ad, fd)
