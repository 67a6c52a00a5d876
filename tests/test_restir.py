"""ReSTIR: reservoir-op invariants + pipeline integration.

ReSTIR has no per-pixel scalar oracle (SURVEY.md §4 — the reference's own
test harness is its debug grid); correctness here is unit-level invariants
on the reservoir algebra plus statistical agreement of the final render
with plain NEE on the same scene.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from raytracer0_tpu.models.presets import restir_demo
from raytracer0_tpu.ops import restir
from raytracer0_tpu.render.renderer import Renderer
from raytracer0_tpu.render.state import RenderState


def test_update_reservoir_selects_and_accumulates():
    b = (4,)
    r = restir.empty_reservoir(b)
    lp = jnp.tile(jnp.asarray([1.0, 2.0, 3.0]), (4, 1))
    lc = jnp.tile(jnp.asarray([5.0, 5.0, 5.0]), (4, 1))
    w = jnp.asarray([1.0, 0.0, 2.0, 3.0])
    r = restir.update_reservoir(r, lp, lc, jnp.zeros(b, jnp.int32), w,
                                jnp.asarray([0.5, 0.5, 0.5, 0.5]))
    np.testing.assert_allclose(np.asarray(r["weight_sum"]), [1, 0, 2, 3])
    np.testing.assert_allclose(np.asarray(r["m"]), [1, 0, 1, 1])
    # first nonzero-weight sample is always selected (prob 1)
    assert int(r["light_index"][0]) == 0 and int(r["light_index"][1]) == -1


def test_update_reservoir_m_overflow_decay():
    b = (1,)
    r = restir.empty_reservoir(b)
    r["m"] = jnp.asarray([60.5])
    r["weight_sum"] = jnp.asarray([100.0])
    r2 = restir.update_reservoir(
        r, jnp.ones((1, 3)), jnp.ones((1, 3)), jnp.zeros(b, jnp.int32),
        jnp.asarray([1.0]), jnp.asarray([0.99]))
    # (60.5 + 1) * 0.95, (100 + 1) * 0.95
    np.testing.assert_allclose(float(r2["m"][0]), 61.5 * 0.95, rtol=1e-6)
    np.testing.assert_allclose(float(r2["weight_sum"][0]), 101 * 0.95, rtol=1e-6)


def test_validity_gates():
    b = (6,)
    r = restir.empty_reservoir(b)
    r["m"] = jnp.asarray([1.0, 0.0, 300.0, 5.0, 5.0, 5.0])
    r["weight_sum"] = jnp.asarray([1.0, 1.0, 1.0, 0.0, 1.0, 1.0])
    r["w"] = jnp.asarray([1.0, 1.0, 1.0, 1.0, 25.0, 1.0])
    r["light_color"] = jnp.tile(jnp.asarray([1.0, 1.0, 1.0]), (6, 1))
    r["light_pos"] = jnp.tile(jnp.asarray([0.0, 1.0, 0.0]), (6, 1))
    r["light_index"] = jnp.asarray([0, 0, 0, 0, 0, 0], jnp.int32)
    ok = np.asarray(restir.is_valid_reservoir(r, 9))
    assert list(ok) == [True, False, False, False, False, True]


def test_combine_caps_m_and_rescales():
    b = (1,)
    t = restir.empty_reservoir(b)
    t["m"] = jnp.asarray([30.0])
    t["weight_sum"] = jnp.asarray([10.0])
    s = restir.empty_reservoir(b)
    s["m"] = jnp.asarray([30.0])
    s["weight_sum"] = jnp.asarray([10.0])
    s["w"] = jnp.asarray([1.0])
    s["age"] = jnp.asarray([1.0])
    s["light_pos"] = jnp.asarray([[0.0, 1.0, 0.0]])
    s["light_color"] = jnp.asarray([[4.0, 4.0, 4.0]])
    s["light_index"] = jnp.asarray([0], jnp.int32)
    hit = jnp.asarray([[0.0, 0.0, 0.0]])
    n = jnp.asarray([[0.0, 1.0, 0.0]])
    out = restir.combine_reservoirs(
        t, s, hit, n, jnp.asarray([[0.8, 0.8, 0.8]]), jnp.zeros(1),
        jnp.asarray([2], jnp.int32), jnp.asarray([0.5]), 9)
    assert float(out["m"][0]) <= 40.0 + 1e-5
    assert np.isfinite(float(out["weight_sum"][0]))


def test_target_function_material_awareness():
    hit = jnp.zeros((3, 3))
    n = jnp.tile(jnp.asarray([0.0, 1.0, 0.0]), (3, 1))
    lp = jnp.tile(jnp.asarray([0.0, 2.0, 0.0]), (3, 1))
    lc = jnp.tile(jnp.asarray([4.0, 4.0, 4.0]), (3, 1))
    c = jnp.tile(jnp.asarray([0.8, 0.8, 0.8]), (3, 1))
    nt = jnp.asarray([0.0, 1.53, 1.4])
    ty = jnp.asarray([2, 4, 6], jnp.int32)  # DIFF, REFR_FRESNEL, COAT
    p = np.asarray(restir.evaluate_target(lp, lc, hit, n, c, nt, ty))
    assert np.all(p > 0)
    assert p[1] < p[0]  # glass weighted by R0 ≈ 0.044 < albedo lum


def test_restir_render_pipeline():
    """Preset 5 renders with ReSTIR end-to-end: reservoirs populate, image
    statistically matches plain per-light NEE on the same scene."""
    scene, cam, cfg = restir_demo()
    cfg = cfg.replace(max_bounces=3, restir_samples=8, marching_steps=32)
    H = W = 32

    r = Renderer(scene, cam, cfg, H, W)
    for _ in range(6):
        r.step()
    img_restir = np.asarray(r.state.accum) / 6
    res = r.state.restir_back
    assert np.isfinite(img_restir).all()
    assert float(jnp.max(res.m)) > 0.0           # reservoirs populated
    assert float(jnp.max(res.w)) <= 12.0 + 1e-5  # W clamp held
    assert float(jnp.min(res.age)) >= 0.0
    # some pixels selected a light
    assert int((np.asarray(res.light_index) >= 0).sum()) > 10

    cfg_nee = cfg.replace(use_restir=False)
    r2 = Renderer(scene, cam, cfg_nee, H, W)
    for _ in range(6):
        r2.step()
    img_nee = np.asarray(r2.state.accum) / 6

    # Means within 35% (ReSTIR is biased + few passes; this catches
    # catastrophic scaling errors, not noise).
    m1, m2 = img_restir.mean(), img_nee.mean()
    assert m2 > 0.003  # tiny lights (r=0.03) make a dim scene
    # The reference's RIS weights omit the 1/L uniform-candidate pdf
    # (raytracer.glsl:1652: weight = p̂, not L·p̂), so its ReSTIR estimates
    # the *mean* per-light contribution; temporal+spatial W growth then
    # recovers part of the scale.  We reproduce that estimator faithfully,
    # so ReSTIR sits between sum/L and the full NEE sum (L=9 here).
    assert 1.0 / 9.0 < m1 / m2 < 2.0, (m1, m2)


def test_restir_state_rotation():
    scene, cam, cfg = restir_demo()
    cfg = cfg.replace(max_bounces=2, restir_samples=4, marching_steps=16)
    r = Renderer(scene, cam, cfg, 16, 16)
    r.step()
    first_back = np.asarray(r.state.restir_back.m).copy()
    r.step()
    # previous back is now hist1
    np.testing.assert_array_equal(np.asarray(r.state.restir_hist1.m), first_back)


def _warm_state(scene, cam, cfg, H, W, passes=2):
    st = RenderState.create(H, W)
    for p in range(passes):
        _, nb = restir.render_sample(scene, cfg, cam, st, H, W,
                                     jnp.uint32(p))
        st = st.rotate_reservoirs(nb)
    return st


def test_restir_gradients_finite_nonzero():
    """The north star's differentiable reservoir state (BASELINE.json):
    jax.grad of a ReSTIR-enabled render w.r.t. scene emission must be
    finite and nonzero — on both the batch preset and the animated one.
    Regression for the round-2 NaN (divergent reparameterization gradient
    through the emission-as-glossiness bounce perturbation, bsdf.sample)."""
    import jax

    for preset, kw in ((restir_demo, {}),
                       (_animated_restir_small, {})):
        scene, cam, cfg = preset(**kw)
        cfg = cfg.replace(max_bounces=2, restir_samples=4,
                          marching_steps=16)
        H = W = 16
        st = _warm_state(scene, cam, cfg, H, W)

        def loss(emission):
            sc = scene.replace(emission=emission)
            rad, _ = restir.render_sample(sc, cfg, cam, st, H, W,
                                          jnp.uint32(3))
            return jnp.sum(rad)

        g = np.asarray(jax.grad(loss)(scene.emission))
        assert np.isfinite(g).all(), preset.__name__
        assert np.any(g != 0.0), preset.__name__


def _animated_restir_small():
    from raytracer0_tpu.models.presets import animated_restir
    return animated_restir()


def test_restir_emission_grad_matches_fd():
    """FD agreement on light emission through the full ReSTIR pipeline.

    Scaling every light's emission by s scales all RIS candidate weights,
    target values and shading linearly, leaving selection probabilities
    and W invariant — so radiance is exactly linear in s and
    d(loss)/ds must equal both the central difference AND loss(1) itself.
    Any wrongly-detached (or NaN-poisoned) linear emission path in
    candidates / temporal / spatial / finalize / shade breaks this."""
    import jax

    scene, cam, cfg = restir_demo()
    cfg = cfg.replace(max_bounces=2, restir_samples=4, marching_steps=16)
    H = W = 16
    st = _warm_state(scene, cam, cfg, H, W, passes=3)
    is_light = np.asarray(scene.mat_type) == 0  # MatType.LIGHT
    lmask = jnp.asarray(is_light[:, None].astype(np.float32))

    def loss(s):
        em = scene.emission * (1.0 + (s - 1.0) * lmask)
        sc = scene.replace(emission=em)
        rad, _ = restir.render_sample(sc, cfg, cam, st, H, W,
                                      jnp.uint32(4))
        return jnp.sum(rad)

    lf = jax.jit(loss)
    g = float(jax.grad(loss)(jnp.float32(1.0)))
    eps = 0.05
    fd = (float(lf(jnp.float32(1.0 + eps))) -
          float(lf(jnp.float32(1.0 - eps)))) / (2 * eps)
    assert np.isfinite(g) and g > 0.0
    assert abs(g - fd) <= 0.10 * abs(fd), (g, fd)


def test_cast_rays_matches_intersect_interpret():
    """The fused Pallas nearest-hit kernel (shadow rays for the ReSTIR
    fast path) vs the XLA intersector, identical (t, idx, missed)."""
    import os

    from raytracer0_tpu.models.camera import generate_rays
    from raytracer0_tpu.ops import intersect as isect
    from raytracer0_tpu.ops import megakernel

    scene, cam, cfg = restir_demo()
    H, W = 8, 128
    ro, rd = generate_rays(cam, H, W, 0)
    hit = isect.intersect(scene, ro, rd, cfg, need_normal=False,
                          need_uv=False)
    os.environ["RT0_PALLAS_INTERPRET"] = "1"
    try:
        t, idx, missed = megakernel.cast_rays(scene, cfg, ro, rd)
    finally:
        del os.environ["RT0_PALLAS_INTERPRET"]
    t, idx, missed = np.asarray(t), np.asarray(idx), np.asarray(missed)
    rt, ridx, rmiss = (np.asarray(hit.t), np.asarray(hit.idx),
                       np.asarray(hit.missed))
    # Silhouette-edge rays may resolve a different winner under f32
    # reassociation (the Pallas march reorders the SDF fold); everywhere
    # else (t, idx, missed) must agree exactly.
    agree = (idx == ridx) & (missed == rmiss)
    assert agree.mean() > 0.995, agree.mean()
    ok = np.abs(t - rt) < 1e-4
    assert (ok | rmiss | ~agree).all()


def test_restir_stress_many_lights():
    """Preset 6 (restir_stress, index.html:965-1014): 41 ceiling lights —
    the regime where the >10-light spatial-tap halving and the M-caps
    actually engage (VERDICT r2 next #4).  Asserts the render is finite,
    reservoir invariants hold at scale, and the selected-light set is
    genuinely diverse (ReSTIR's whole point at many lights)."""
    from raytracer0_tpu.models.presets import restir_stress

    scene, cam, cfg = restir_stress()
    assert scene.num_lights == 41  # 5x5 grid + 4x4 grid
    cfg = cfg.replace(max_bounces=2, marching_steps=16)
    # candidate clamp: min(RESTIR_SAMPLES=16, max(4, 41)) = 16
    assert min(cfg.restir_samples, max(4, scene.num_lights)) == 16
    H = W = 32

    r = Renderer(scene, cam, cfg, H, W)
    for _ in range(12):   # past the pass>=10 full-spatial-tap warmup
        r.step()
    img = np.asarray(r.state.accum) / 12
    res = r.state.restir_back
    assert np.isfinite(img).all() and img.mean() > 1e-4
    m = np.asarray(res.m)
    w = np.asarray(res.w)
    ws = np.asarray(res.weight_sum)
    assert np.isfinite(m).all() and np.isfinite(w).all() and np.isfinite(ws).all()
    # M-cap invariants: combine caps at 40, post-temporal clamp at 80/100
    assert m.max() <= 100.0 + 1e-4, m.max()
    assert w.max() <= 12.0 + 1e-5
    li = np.asarray(res.light_index)
    picked = li[li >= 0]
    assert picked.size > H * W // 4
    assert (picked < 41).all()
    # diversity: many distinct lights selected across the image
    assert len(np.unique(picked)) >= 15, len(np.unique(picked))


def test_fast_path_matches_wavefront_default_tier():
    """Small default-tier twin of test_fast_path_matches_wavefront
    (VERDICT r2 next #7): one 8x128 pass, 2 bounces, interpret mode —
    catches drift in the G-buffer split or its depth-keyed RNG plumbing
    without waiting for the slow tier."""
    import os

    scene, cam, cfg = restir_demo()
    cfg = cfg.replace(max_bounces=2, samples_per_pass=1, max_diff_bounces=2,
                      restir_samples=4, marching_steps=16)
    H, W = 8, 128

    def run(fn):
        st = RenderState.create(H, W)
        rad, _ = fn(scene, cfg, cam, st, H, W, 0)
        return np.asarray(rad)

    ref = run(restir.render_sample)
    os.environ["RT0_PALLAS_INTERPRET"] = "1"
    try:
        fast = run(restir.render_sample_fast)
    finally:
        del os.environ["RT0_PALLAS_INTERPRET"]
    err = np.abs(ref - fast)
    assert err.max() < 5e-3, err.max()
    assert np.median(err) < 1e-6


def test_fused_path_matches_wavefront_default_tier():
    """Fused in-kernel ReSTIR (trace + all reservoir phases + shading in
    one Pallas launch, VERDICT r3 next #1) vs the XLA wavefront
    semantics oracle: one 8x128 pass, 2 bounces, interpret mode."""
    import os

    scene, cam, cfg = restir_demo()
    cfg = cfg.replace(max_bounces=2, samples_per_pass=1, max_diff_bounces=2,
                      restir_samples=4, marching_steps=16)
    H, W = 8, 128

    def run(fn, st):
        rad, nb = fn(scene, cfg, cam, st, H, W, 0)
        return np.asarray(rad), nb

    ref, nb_ref = run(restir.render_sample, RenderState.create(H, W))
    os.environ["RT0_PALLAS_INTERPRET"] = "1"
    try:
        fast, nb_fast = run(restir.render_sample_fused,
                            RenderState.create(H, W))
    finally:
        del os.environ["RT0_PALLAS_INTERPRET"]
    err = np.abs(ref - fast)
    assert err.max() < 5e-3, err.max()
    assert np.median(err) < 1e-6
    # the exported reservoirs must agree too (incl. the re-derived
    # light_pos/light_color — pure functions of light_index)
    for k in ("weight_sum", "m", "w", "age"):
        np.testing.assert_allclose(np.asarray(getattr(nb_fast, k)),
                                   np.asarray(getattr(nb_ref, k)),
                                   atol=1e-4)
    li_ref = np.asarray(nb_ref.light_index)
    li_fast = np.asarray(nb_fast.light_index)
    assert (li_ref == li_fast).mean() > 0.995
    agree = li_ref == li_fast
    np.testing.assert_allclose(np.asarray(nb_fast.light_pos)[agree],
                               np.asarray(nb_ref.light_pos)[agree],
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(nb_fast.light_color)[agree],
                               np.asarray(nb_ref.light_color)[agree],
                               atol=1e-5)


def test_fused_path_matches_wavefront_volumetrics():
    """Fused in-kernel ReSTIR with participating media: the in-kernel
    reservoir *shade* applies Beer-Lambert fog to the shadow ray
    (restir._shade_selected, raytracer.glsl:1198-1202) and the medium
    in-scatter NEE runs independently — both must match the wavefront."""
    import os

    scene, cam, cfg = restir_demo()
    cfg = cfg.replace(max_bounces=2, samples_per_pass=1, max_diff_bounces=2,
                      restir_samples=4, marching_steps=16,
                      use_volumetrics=True, max_scattering_events=2)
    H, W = 8, 128

    st = RenderState.create(H, W)
    ref, _ = restir.render_sample(scene, cfg, cam, st, H, W, 0)
    os.environ["RT0_PALLAS_INTERPRET"] = "1"
    try:
        fast, _ = restir.render_sample_fused(scene, cfg, cam, st, H, W, 0)
    finally:
        del os.environ["RT0_PALLAS_INTERPRET"]
    err = np.abs(np.asarray(ref) - np.asarray(fast))
    assert err.max() < 5e-3, err.max()
    assert np.median(err) < 1e-6


@pytest.mark.slow
def test_fused_path_matches_wavefront_multiframe():
    """Fused path across 3 reservoir rotations (temporal reuse live from
    pass 3) + the 41-light stress preset single-frame.

    slow: several interpret-mode renders on 2 CPU cores."""
    import os

    from raytracer0_tpu.models.presets import restir_stress

    scene, cam, cfg = restir_demo()
    cfg = cfg.replace(max_bounces=2, samples_per_pass=1, max_diff_bounces=2,
                      restir_samples=4, marching_steps=16)
    H, W = 8, 128

    def run(fn):
        st = RenderState.create(H, W)
        outs = []
        for p in range(4):
            rad, nb = fn(scene, cfg, cam, st, H, W, p)
            st = st.rotate_reservoirs(nb)
            outs.append(np.asarray(rad))
        return outs

    ref = run(restir.render_sample)
    os.environ["RT0_PALLAS_INTERPRET"] = "1"
    try:
        fast = run(restir.render_sample_fused)
    finally:
        del os.environ["RT0_PALLAS_INTERPRET"]
    for a, b in zip(ref, fast):
        err = np.abs(a - b)
        assert err.max() < 5e-3, err.max()
        assert np.median(err) < 1e-6

    scene_s, cam_s, cfg_s = restir_stress()
    cfg_s = cfg_s.replace(max_bounces=2, restir_samples=8,
                          marching_steps=16)
    st = RenderState.create(H, W)
    ref_s, _ = restir.render_sample(scene_s, cfg_s, cam_s, st, H, W, 0)
    os.environ["RT0_PALLAS_INTERPRET"] = "1"
    try:
        fast_s, _ = restir.render_sample_fused(scene_s, cfg_s, cam_s, st,
                                               H, W, 0)
    finally:
        del os.environ["RT0_PALLAS_INTERPRET"]
    err = np.abs(np.asarray(ref_s) - np.asarray(fast_s))
    assert err.max() < 5e-3, err.max()
    assert np.median(err) < 1e-6


@pytest.mark.slow
def test_fast_path_matches_wavefront():
    """render_sample_fast (G-buffer megakernel + XLA reservoir phases +
    cast_rays shadows) vs render_sample (XLA wavefront), same RNG streams
    → per-pixel agreement to f32 reassociation, across reservoir
    rotation (VERDICT r1 next #1 done-criterion).

    slow: two full interpret-mode renders (~2 min on 2 CPU cores)."""
    import os

    from raytracer0_tpu.models.presets import restir_demo as _demo

    scene, cam, cfg = _demo()
    cfg = cfg.replace(max_bounces=2, samples_per_pass=1, max_diff_bounces=2)
    H, W = 8, 128

    def run(fn):
        st = RenderState.create(H, W)
        outs = []
        for p in range(2):
            rad, nb = fn(scene, cfg, cam, st, H, W, p)
            st = st.rotate_reservoirs(nb)
            outs.append(np.asarray(rad))
        return outs

    ref = run(restir.render_sample)
    os.environ["RT0_PALLAS_INTERPRET"] = "1"
    try:
        fast = run(restir.render_sample_fast)
    finally:
        del os.environ["RT0_PALLAS_INTERPRET"]
    for a, b in zip(ref, fast):
        err = np.abs(a - b)
        assert err.max() < 5e-3, err.max()
        assert np.median(err) < 1e-6


def test_candidates_only_matches_mean_light_nee():
    """Converged quantitative check of the RIS estimator (VERDICT r2 next
    #8, replacing the loose 1/9..2 band): with temporal+spatial ablated,
    the reference's RIS weights omit the 1/L uniform-candidate pdf
    (raytracer.glsl:1652 — weight = p̂, not L·p̂), so candidates-only
    ReSTIR estimates the *mean* per-light contribution.  On a scene
    built so p̂ ∝ the shading contribution (identical gray lights, same
    radius, diffuse-only), a converged render must sit at NEE/L within
    ±15%."""
    import os

    from raytracer0_tpu.models.camera import Camera
    from raytracer0_tpu.models.dsl import parse_scene

    L = 9
    lights = "\n".join(
        f"MAT_LIGHT_4, SPHERE, vec3({x}, 1.7, {z}), vec4(0.05)"
        for x in (-0.8, 0.0, 0.8) for z in (-0.8, 0.0, 0.8))
    text = """
        MAT_WHITE, PLANE, vec3(0.0, 1.0, 0.0), vec4(2.0)
        MAT_WHITE, PLANE, vec3(0.0, -1.0, 0.0), vec4(2.0)
        MAT_GREEN, PLANE, vec3(1.0, 0.0, 0.0), vec4(2.0)
        MAT_RED, PLANE, vec3(-1.0, 0.0, 0.0), vec4(2.0)
        MAT_WHITE, PLANE, vec3(0.0, 0.0, 1.0), vec4(2.0)
        MAT_WHITE, PLANE, vec3(0.0, 0.0, -1.0), vec4(2.0)
    """ + lights
    scene = parse_scene(text)
    assert scene.num_lights == L
    cam = Camera.make(origin=(0.0, 0.0, 1.9), lookat=(0.0, -0.2, -1.0),
                      fov=60.0)
    from raytracer0_tpu.models.presets import _cfg
    # use_mis=False: with MIS the NEE side down-weights by the power
    # heuristic while ReSTIR shading (faithfully) does not — without it
    # both sides estimate the same direct integral.
    cfg = _cfg(use_restir=True, use_procedural_sky=False, max_bounces=2,
               restir_samples=16, marching_steps=16, use_mis=False)
    H = W = 16
    PASSES = 48

    os.environ["RT0_RESTIR_ABLATE"] = "temporal,spatial"
    try:
        r = Renderer(scene, cam, cfg, H, W)
        for _ in range(PASSES):
            r.step()
        img_restir = np.asarray(r.state.accum) / PASSES
    finally:
        del os.environ["RT0_RESTIR_ABLATE"]

    r2 = Renderer(scene, cam, cfg.replace(use_restir=False), H, W)
    for _ in range(PASSES):
        r2.step()
    img_nee = np.asarray(r2.state.accum) / PASSES

    # Both images carry an identical non-NEE part (emissive spheres seen
    # directly / via bounces) that the 1/L scaling does not apply to —
    # measure and subtract it (sample_lights=False renders exactly that).
    r3 = Renderer(scene, cam,
                  cfg.replace(use_restir=False, sample_lights=False), H, W)
    for _ in range(PASSES):
        r3.step()
    img_e = np.asarray(r3.state.accum) / PASSES

    direct_restir = img_restir.mean() - img_e.mean()
    direct_nee = img_nee.mean() - img_e.mean()
    assert direct_nee > 1e-4
    ratio = direct_restir / (direct_nee / L)
    assert 0.85 < ratio < 1.15, ratio


def test_grad_safe_cast_gating():
    """`grad_safe_cast_fn` must be inert exactly where its exactness
    argument fails: CPU backends (no kernel), volumetric configs (the
    Beer-Lambert factor carries a real gradient through the cast's t),
    unsupported shapes, and the RT0_NO_GRAD_CAST A/B hook.  The
    gradient-equality half of the contract is measured on hardware
    (experiments/exp_grad_cast.py: max rel err 0.0)."""
    import os

    from raytracer0_tpu.ops import restir as restir_ops

    scene, _, cfg = restir_demo()
    # CPU backend (the test platform): always None
    assert restir_ops.grad_safe_cast_fn(scene, cfg, 512, 512) is None
    # volumetrics: None regardless of backend
    assert restir_ops.grad_safe_cast_fn(
        scene, cfg.replace(use_volumetrics=True), 512, 512) is None
    # unsupported (non-block-aligned) shape: None
    assert restir_ops.grad_safe_cast_fn(scene, cfg, 33, 100) is None
    # A/B hook: None
    os.environ["RT0_NO_GRAD_CAST"] = "1"
    try:
        assert restir_ops.grad_safe_cast_fn(scene, cfg, 512, 512) is None
    finally:
        del os.environ["RT0_NO_GRAD_CAST"]


@pytest.mark.slow
def test_fused_restir_emission_grad_matches_fd_interpret():
    """FD-linearity through the FUSED differentiable ReSTIR path (round
    5, VERDICT r4 next #1): `render_sample_fused` now differentiates
    through the in-kernel reservoir pipeline via the Pallas adjoint
    (`megakernel._fused_restir_call` custom_vjp) — scaling light
    emission must move the loss exactly linearly, as for the XLA route.

    slow: the interpret-mode vjp of the fused kernel takes tens of
    minutes on this 2-core host.  The same check ran compiled on the
    live v5e (rel err 2.2e-7 vs FD; fused-vs-XLA grads within 0.4%,
    f32 reassociation)."""
    import os

    import jax

    scene, cam, cfg = restir_demo()
    cfg = cfg.replace(max_bounces=2, restir_samples=4, marching_steps=16)
    H, W = 8, 128

    os.environ["RT0_PALLAS_INTERPRET"] = "1"
    try:
        st = RenderState.create(H, W)
        for p in range(2):
            _, nb = restir.render_sample_fused(scene, cfg, cam, st, H, W,
                                               jnp.uint32(p))
            st = st.rotate_reservoirs(nb)

        is_light = np.asarray(scene.mat_type) == 0
        lmask = jnp.asarray(is_light[:, None].astype(np.float32))

        def loss(s):
            em = scene.emission * (1.0 + (s - 1.0) * lmask)
            sc = scene.replace(emission=em)
            rad, _ = restir.render_sample_fused(sc, cfg, cam, st, H, W,
                                                jnp.uint32(4))
            return jnp.sum(rad)

        g = float(jax.grad(loss)(jnp.float32(1.0)))
        eps = 0.05
        fd = (float(loss(jnp.float32(1.0 + eps)))
              - float(loss(jnp.float32(1.0 - eps)))) / (2 * eps)
    finally:
        del os.environ["RT0_PALLAS_INTERPRET"]
    assert np.isfinite(g) and g > 0.0
    assert abs(g - fd) <= 0.10 * abs(fd), (g, fd)
