"""Wavefront path-tracing integrator.

The reference's `radiance()` megakernel loop (raytracer.glsl:1986-2105)
re-designed as a `lax.scan` over bounce depth with per-lane active masks:
one thread per pixel becomes one SIMD lane per pixel across SoA arrays
[H, W].  Breaks become mask clears; the scan body is traced once, so XLA
fuses intersect → shade → NEE into one fused device program per bounce.

Faithfully reproduced semantics (with reference citations inline):
  * homogeneous-medium free-path scattering before surface processing
    (1999-2053)
  * miss → environment, suppressed for non-specular paths under NEE (2055-2066)
  * emissive termination with BSDF-side MIS weight using the previous
    bounce's normal (2079-2090)
  * textured color/emission evaluation (2071, 2077)
  * BSDF dispatch + NEE / cubemap gathers (brdf, 1804-1980)
  * luminance cutoff and per-type bounce caps (2097-2101)

Differentiability: all discrete events (winner index, reflect/refract
choice, free-path binary, light validity) are boolean masks whose
*continuous integrands* carry gradients; `jnp.where` zeroes cotangents on
untaken branches (detached-decision estimator, SURVEY.md §7.2-1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from raytracer0_tpu import rng
from raytracer0_tpu.config import RenderConfig
from raytracer0_tpu.models.materials import MatType, MeshType
from raytracer0_tpu.ops import bsdf as bsdf_ops
from raytracer0_tpu.ops import intersect as isect
from raytracer0_tpu.ops import lighting
from raytracer0_tpu.ops import sampling as smp
from raytracer0_tpu.ops import sky
from raytracer0_tpu.ops import spectral
from raytracer0_tpu.ops import textures as tex
from raytracer0_tpu.ops import vecmath as vm

PI = 3.14159265


def _light_pdf_mesh(scene, idx, x):
    """Light-sampling pdf of the *hit* mesh, for BSDF-side MIS
    (raytracer.glsl:2083-2086 → lightSamplingPdf 1246-1262)."""
    is_sphere = scene.mesh_type[idx] == MeshType.SPHERE
    pdf_sphere = smp.sphere_light_pdf(scene.pos[idx], scene.joker[idx][..., 0], x)
    return jnp.where(is_sphere, pdf_sphere, 1.0 / smp.FOUR_PI)


def _volumetric_nee(scene, cfg, scatter_pos, rd, mask, pix, pass_idx,
                    sample_idx, depth, sdf_march):
    """In-scatter NEE at a medium event (raytracer.glsl:2011-2044)."""
    total = jnp.zeros_like(scatter_pos)
    for slot in range(scene.num_lights):
        li = scene.light_idx[slot]
        li_safe = jnp.maximum(li, 0)
        ok = (li >= 0) & (scene.mat_type[li_safe] == MatType.LIGHT) & \
             (scene.mesh_type[li_safe] == MeshType.SPHERE)

        l_pos = scene.pos[li_safe]
        l_r = scene.joker[li_safe, 0]
        dl = l_pos - scatter_pos
        dist = vm.safe_length(dl)
        r2 = l_r * l_r
        cos_a_max = vm.safe_sqrt(
            1.0 - jnp.clip(r2 / jnp.maximum(dist * dist, 1e-12), 0.0, 1.0))
        u1, u2 = rng.uniform2(pix, pass_idx, sample_idx, depth, slot,
                              rng.Stream.VOL_NEE)
        dir_l = smp.sample_cone(dl / dist[..., None], 1.0 - cos_a_max, u1, u2)

        sh = isect.intersect(scene, scatter_pos + dir_l * (cfg.epsilon * 20.0),
                             dir_l, cfg, sdf_march=sdf_march,
                             need_normal=False, need_uv=False)
        reached = (sh.idx == li_safe) & ~sh.missed  # must hit this light (2028)

        omega = 2.0 * (1.0 - cos_a_max)
        phase = smp.hg_phase(vm.vdot(rd, dir_l), cfg.vol_g)
        t_fog = jnp.exp(-cfg.vol_sigma_t * sh.t)

        contrib = (scene.color[li_safe] * scene.emission[li_safe]
                   * (phase * t_fog * PI * omega)[..., None])
        total = total + jnp.where((ok & reached)[..., None], contrib, 0.0)
    return mask * total


def trace(scene, cfg: RenderConfig, ro, rd, pix, pass_idx, sample_idx,
          sdf_march=None, restir_sampler=None):
    """Trace one radiance sample per lane.

    `ro`/`rd`: [..., 3] primary rays; `pix`: uint32 pixel ids matching the
    batch shape.  Returns radiance [..., 3] (already scaled by the hero-
    wavelength RGB weight when spectral).

    `restir_sampler`, when given, replaces per-light NEE on diffuse
    bounces per the reference's gating (raytracer.glsl:1899-1946).  It is
    called as `sampler(scene, cfg, hit, nl, mask, pix, pass, sample,
    depth)` and must return `(nee_radiance, reservoir_dict)`; the
    reservoir of the *last* diffuse bounce per lane is returned alongside
    the radiance (the reference's g_final_reservoir overwrite semantics,
    raytracer.glsl:1616, 1757) and trace returns a
    `(radiance, reservoir_dict)` tuple instead.
    """
    batch = ro.shape[:-1]
    f3 = lambda v: jnp.full(batch + (3,), v, jnp.float32)

    if cfg.use_spectral:
        hero_wl = spectral.sample_wavelength(
            rng.uniform(pix, pass_idx, sample_idx, rng.Stream.WAVELENGTH))
    else:
        hero_wl = jnp.full(batch, 550.0, jnp.float32)

    carry0 = dict(
        o=ro, d=rd,
        mask=f3(1.0), acc=f3(0.0),
        active=jnp.ones(batch, bool),
        specular=jnp.ones(batch, bool),   # primary rays count as specular
        prev_nl=jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0]), batch + (3,)),
        n_diff=jnp.zeros(batch, jnp.int32),
        n_spec=jnp.zeros(batch, jnp.int32),
        n_scat=jnp.zeros(batch, jnp.int32),
    )
    want_reservoir = restir_sampler is not None
    if want_reservoir:
        carry0["reservoir"] = dict(
            light_pos=jnp.zeros(batch + (3,), jnp.float32),
            light_color=jnp.zeros(batch + (3,), jnp.float32),
            weight_sum=jnp.zeros(batch, jnp.float32),
            m=jnp.zeros(batch, jnp.float32),
            w=jnp.zeros(batch, jnp.float32),
            age=jnp.zeros(batch, jnp.float32),
            light_index=jnp.full(batch, -1, jnp.int32),
        )

    def body(carry, depth):
        o, d = carry["o"], carry["d"]
        mask, acc = carry["mask"], carry["acc"]
        active, specular = carry["active"], carry["specular"]
        prev_nl = carry["prev_nl"]
        n_diff, n_spec, n_scat = carry["n_diff"], carry["n_spec"], carry["n_scat"]

        hit = isect.intersect(scene, o, d, cfg, sdf_march=sdf_march)

        # ---- participating medium event (raytracer.glsl:1999-2053) ----
        if cfg.use_volumetrics:
            u_fp = rng.uniform(pix, pass_idx, sample_idx, depth,
                               rng.Stream.VOL_FREEPATH)
            scatter_d = -jnp.log(jnp.maximum(u_fp, 1e-6)) / cfg.vol_sigma_t
            scatters = active & (scatter_d < jnp.minimum(cfg.infinity, hit.t))
            scatter_pos = o + scatter_d[..., None] * d

            mask = jnp.where(scatters[..., None],
                             mask * (cfg.vol_sigma_s / cfg.vol_sigma_t), mask)

            if cfg.sample_lights and scene.num_lights > 0:
                vol_light = _volumetric_nee(scene, cfg, scatter_pos, d, mask,
                                            pix, pass_idx, sample_idx, depth,
                                            sdf_march)
                acc = acc + jnp.where(scatters[..., None], vol_light, 0.0)

            hg1, hg2 = rng.uniform2(pix, pass_idx, sample_idx, depth,
                                    rng.Stream.VOL_PHASE)
            hg_dir = smp.sample_hg(d, cfg.vol_g, hg1, hg2)

            n_scat = n_scat + scatters.astype(jnp.int32)
            specular = jnp.where(scatters, False, specular)
            vol_done = scatters & (
                (n_scat >= cfg.max_scattering_events) | (vm.max3(mask) < 0.01))
            active = active & ~vol_done
        else:
            scatters = jnp.zeros(batch, bool)
            scatter_pos = o
            hg_dir = d

        surface = active & ~scatters

        # ---- miss: environment or NEE-suppressed break (2055-2066) ----
        missed = surface & hit.missed
        if cfg.sample_lights:
            env_allowed = specular  # non-specular env hits double-count NEE
        else:
            env_allowed = jnp.ones(batch, bool)
        env = sky.environment(scene, d, cfg)
        acc = acc + jnp.where((missed & env_allowed)[..., None], mask * env, 0.0)
        active = active & ~missed
        surface = surface & ~hit.missed

        # ---- textured color / emission (2071, 2077) ----
        mat_c = scene.color[hit.idx]
        mat_e = scene.emission[hit.idx]
        if scene.tex_types_used:
            texel = tex.get_texel(scene, hit.idx, hit.uv, hit.pos)
            opts = scene.opts[hit.idx]
            cmask = scene.tex_cmask[hit.idx]
            emask = scene.tex_emask[hit.idx]
            blend_c = opts[..., 0].astype(jnp.float32) * texel[..., 3]
            blend_e = opts[..., 1].astype(jnp.float32) * texel[..., 3]
            c = jnp.maximum(vm.mix(mat_c, texel[..., :3] * cmask, blend_c[..., None]), 0.001)
            e = jnp.maximum(vm.mix(mat_e, texel[..., :3] * emask, blend_e[..., None]), 0.001)
        else:
            # texture-free scene: the blend factor is identically zero
            c = jnp.maximum(mat_c, 0.001)
            e = jnp.maximum(mat_e, 0.001)

        inside = -jnp.sign(vm.vdot(d, hit.n))
        inside = jnp.where(inside == 0.0, 1.0, inside)

        # ---- emissive hit: MIS-weighted accumulate + terminate (2079-2090) ----
        mat_type = scene.mat_type[hit.idx]
        is_light = surface & (mat_type == MatType.LIGHT)
        if cfg.use_mis and cfg.sample_lights:
            light_dir = vm.normalize(hit.pos - o)
            l_pdf = _light_pdf_mesh(scene, hit.idx, o)
            b_pdf = smp.cosine_hemisphere_pdf(light_dir, prev_nl)
            mis_w = smp.power_heuristic(1.0, b_pdf, 1.0, l_pdf)
            mis_w = jnp.where(~specular & (depth > 0), mis_w, 1.0)
        else:
            mis_w = jnp.ones(batch, jnp.float32)
        acc = acc + jnp.where(is_light[..., None], mask * c * e * mis_w[..., None], 0.0)
        active = active & ~is_light
        surface = surface & ~is_light

        # DIR_LIGHT-material surfaces have no brdf case (the reference's
        # dispatch falls through, 1826-1884); terminate those lanes.
        is_dirlight = surface & (mat_type == MatType.DIR_LIGHT)
        active = active & ~is_dirlight
        surface = surface & ~is_dirlight

        # ---- BSDF sample (brdf, 1804-1884) ----
        new_prev_nl = hit.n * inside[..., None]
        u1, u2 = rng.uniform2(pix, pass_idx, sample_idx, depth, rng.Stream.BSDF_DIR)
        uc = rng.uniform(pix, pass_idx, sample_idx, depth, rng.Stream.BSDF_CHOICE)
        bs = bsdf_ops.sample(scene, cfg, hit, c, e, inside, d, hero_wl, u1, u2, uc)
        mask_after = mask * bs.mask_mult
        diffuse_lane = surface & ~bs.specular

        # ---- cubemap gather on diffuse bounces (1888-1897) ----
        if cfg.use_cubemap:
            eu1, eu2 = rng.uniform2(pix, pass_idx, sample_idx, depth,
                                    rng.Stream.ENV_DIR)
            env_dir = smp.random_direction(new_prev_nl, eu1, eu2,
                                           cfg.use_biased_sampling)
            env_hit = isect.intersect(scene, hit.pos + new_prev_nl * cfg.epsilon,
                                      env_dir, cfg, sdf_march=sdf_march,
                                      need_normal=False, need_uv=False)
            env_rad = sky.sample_cubemap(scene.cubemap, env_dir)
            acc = acc + jnp.where((diffuse_lane & env_hit.missed)[..., None],
                                  mask_after * env_rad, 0.0)

        # ---- NEE on diffuse bounces (1899-1976) ----
        if cfg.sample_lights and scene.num_lights > 0:
            use_restir_here = cfg.use_restir and restir_sampler is not None
            if use_restir_here and cfg.use_mis and scene.num_lights <= 8:
                use_restir_here = False  # stratified gate (1906-1911)
            if use_restir_here:
                nee, res_out = restir_sampler(scene, cfg, hit, new_prev_nl,
                                              mask_after, pix, pass_idx,
                                              sample_idx, depth)
                # last diffuse bounce wins (g_final_reservoir overwrite)
                new_res = {}
                for k, v in carry["reservoir"].items():
                    sel = diffuse_lane[..., None] if res_out[k].ndim > diffuse_lane.ndim else diffuse_lane
                    new_res[k] = jnp.where(sel, res_out[k], v)
                carry["reservoir"] = new_res
            else:
                nee = lighting.sample_lights_nee(
                    scene, cfg, hit.pos, new_prev_nl, mask_after,
                    pix, pass_idx, sample_idx, depth, sdf_march=sdf_march)
            acc = acc + jnp.where(diffuse_lane[..., None], nee, 0.0)

        # ---- commit per-lane ray state ----
        o = vm.where3(surface, bs.o, o)
        d = vm.where3(surface, bs.d, d)
        mask = vm.where3(surface, mask_after, mask)
        specular = jnp.where(surface, bs.specular, specular)
        prev_nl = vm.where3(surface, new_prev_nl, prev_nl)
        n_diff = n_diff + jnp.where(surface, bs.diff_inc, 0)
        n_spec = n_spec + jnp.where(surface, bs.spec_inc, 0)
        n_scat = n_scat + jnp.where(surface, bs.scatter_inc, 0)

        # ---- cutoff + per-type caps (2097-2101) ----
        cutoff = surface & (vm.max3(mask) < 0.01)
        capped = surface & (
            (n_diff >= cfg.max_diff_bounces) | (n_spec >= cfg.max_spec_bounces)
            | (n_scat >= cfg.max_scattering_events))
        active = active & ~(cutoff | capped)

        # volumetric lanes continue with the HG-scattered ray
        o = vm.where3(scatters, scatter_pos, o)
        d = vm.where3(scatters, hg_dir, d)

        out = dict(o=o, d=d, mask=mask, acc=acc, active=active,
                   specular=specular, prev_nl=prev_nl,
                   n_diff=n_diff, n_spec=n_spec, n_scat=n_scat)
        if want_reservoir:
            out["reservoir"] = carry["reservoir"]
        return out, None

    if cfg.remat_bounces:
        # Store only the inter-bounce carry; recompute intra-bounce
        # activations in the backward sweep (bandwidth-bound regime:
        # recompute is cheaper than the HBM round-trips of saved
        # residuals — measured ~1.9x faster fwd+bwd at 512^2).
        body = jax.checkpoint(body, prevent_cse=False)
    carry, _ = jax.lax.scan(body, carry0,
                            jnp.arange(cfg.max_bounces, dtype=jnp.uint32),
                            unroll=cfg.scan_unroll)
    radiance = carry["acc"]

    if cfg.use_spectral:
        radiance = radiance * spectral.wavelength_to_rgb(hero_wl)
    if want_reservoir:
        return radiance, carry["reservoir"]
    return radiance
