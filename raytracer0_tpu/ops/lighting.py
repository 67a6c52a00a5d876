"""Next-event estimation: explicit light sampling with shadow rays.

Implements `calcDirectLighting` (raytracer.glsl:1174-1230) and the MIS
machinery around it (1233-1262, 1899-1976): sphere lights via solid-angle
cone sampling, SDF lights via a random point on their bounding ellipsoid,
directional lights via occlusion-to-infinity, each verified by a full
shadow-ray re-trace.  The per-light loop is a static Python loop over
light slots (L is a static property of the scene), each slot a fully
vectorized shadow batch — the XLA analogue of the reference's unrolled
GLSL loop.
"""

from __future__ import annotations

import jax.numpy as jnp

from raytracer0_tpu import rng
from raytracer0_tpu.models.materials import MatType, MeshType
from raytracer0_tpu.ops import intersect as isect
from raytracer0_tpu.ops import sampling as smp
from raytracer0_tpu.ops import textures as tex
from raytracer0_tpu.ops import vecmath as vm


def direct_light_slot(scene, cfg, slot, x, nl, pix, pass_idx, sample_idx, depth,
                      sdf_march=None):
    """Direct lighting from light slot `slot` (static int) at shading points
    `x` with oriented normals `nl`.

    Returns (contribution f32[..., 3], light_dir f32[..., 3] toward the
    light center, valid bool[...]).  `light_dir` feeds the MIS pdfs
    (raytracer.glsl:1959-1962), which use the *center* direction, not the
    sampled cone direction.
    """
    li = scene.light_idx[slot]                       # traced scalar mesh index
    valid_slot = li >= 0
    li_safe = jnp.maximum(li, 0)

    l_mesh_type = scene.mesh_type[li_safe]
    l_mat_type = scene.mat_type[li_safe]
    l_pos = scene.pos[li_safe]                       # [3]
    l_joker = scene.joker[li_safe]                   # [4]
    l_color = scene.color[li_safe]
    l_emission = scene.emission[li_safe]

    is_area = l_mat_type == MatType.LIGHT
    is_dir = l_mat_type == MatType.DIR_LIGHT
    is_sphere = is_area & (l_mesh_type == MeshType.SPHERE)
    is_sdf = is_area & (l_mesh_type == MeshType.SDF)

    u1, u2 = rng.uniform2(pix, pass_idx, sample_idx, depth, slot, rng.Stream.NEE_CONE)

    # --- sphere light: uniform cone toward the center (raytracer.glsl:1182-1190)
    sw = l_pos - x                                   # [..., 3]
    d2 = vm.vdot(sw, sw)
    r2 = l_joker[0] * l_joker[0]
    cos_a_max = vm.safe_sqrt(1.0 - jnp.clip(vm.safe_div(r2, d2), 0.0, 1.0))
    dir_sphere = smp.sample_cone(vm.normalize(sw), 1.0 - cos_a_max, u1, u2)

    # --- SDF light: random point on the bounding ellipsoid (1205-1208)
    su1, su2 = rng.uniform2(pix, pass_idx, sample_idx, depth, slot,
                            rng.Stream.NEE_SDF_POINT)
    sphere_pt = smp.random_sphere_direction(su1, su2)
    ld = l_pos + sphere_pt * l_joker[:3]
    dir_sdf = vm.normalize(ld - x)

    # --- directional light: mesh.pos *is* the direction (1220-1225)
    dir_directional = vm.normalize(jnp.broadcast_to(l_pos, x.shape))

    sr_dir = vm.where3(is_sphere, dir_sphere,
             vm.where3(is_sdf, dir_sdf, dir_directional))

    # One shadow re-trace for whichever branch was selected (1193/1211/1222).
    # Shadow rays never consume the hit normal (contribution uses sr_dir).
    sr_o = x + nl * cfg.epsilon
    hit = isect.intersect(scene, sr_o, sr_dir, cfg, sdf_march=sdf_march,
                          need_normal=False)

    hit_mat = scene.mat_type[hit.idx]
    hit_c = scene.color[hit.idx]
    hit_e = scene.emission[hit.idx]
    hit_is_light = (hit_mat == MatType.LIGHT) & ~hit.missed

    # The reference blends the hit mesh's color with its texel by texel
    # alpha, unconditionally (raytracer.glsl:1203).
    if scene.tex_types_used:
        texel = tex.get_texel(scene, hit.idx, hit.uv, hit.pos)
        lit_c = jnp.maximum(vm.mix(hit_c, texel[..., :3], texel[..., 3:4]), 0.001)
    else:
        lit_c = jnp.maximum(hit_c, 0.001)

    cos_term = jnp.maximum(0.001, vm.vdot(sr_dir, nl))

    # Beer-Lambert fog attenuation of shadow rays (1198-1202).
    if cfg.use_volumetrics:
        t_fog = jnp.exp(-cfg.vol_sigma_t * hit.t)
    else:
        t_fog = jnp.ones_like(hit.t)

    weight = 2.0 * (1.0 - cos_a_max)
    contrib_sphere = lit_c * hit_e * (weight * cos_term * t_fog)[..., None]
    contrib_sdf = lit_c * hit_e * cos_term[..., None]
    contrib_dir = l_color * l_emission * jnp.maximum(0.001, vm.vdot(l_pos, nl))[..., None]

    contrib = jnp.where((is_sphere & hit_is_light)[..., None], contrib_sphere,
              jnp.where((is_sdf & hit_is_light)[..., None], contrib_sdf,
              jnp.where((is_dir & hit.missed)[..., None], contrib_dir, 0.0)))

    contrib = jnp.where(valid_slot, contrib, 0.0)
    light_dir = vm.normalize(sw)
    return contrib, light_dir, valid_slot


def light_pdf_slot(scene, slot, x, cfg):
    """Light-sampling pdf for MIS (raytracer.glsl:1246-1262)."""
    li = jnp.maximum(scene.light_idx[slot], 0)
    is_sphere_light = (scene.mat_type[li] == MatType.LIGHT) & \
                      (scene.mesh_type[li] == MeshType.SPHERE)
    pdf_sphere = smp.sphere_light_pdf(scene.pos[li], scene.joker[li, 0], x)
    # Uniform-sphere fallback for non-sphere area lights (1261).
    is_light = scene.mat_type[li] == MatType.LIGHT
    pdf = jnp.where(is_sphere_light, pdf_sphere,
                    jnp.where(is_light, 1.0 / smp.FOUR_PI, 0.0))
    return pdf


def sample_lights_nee(scene, cfg, x, nl, mask, pix, pass_idx, sample_idx, depth,
                      sdf_march=None):
    """The reference's non-ReSTIR NEE block inside `brdf`
    (raytracer.glsl:1947-1975): per-light contributions, with Veach
    power-heuristic MIS against the cosine BSDF pdf when `use_mis`.

    Returns the radiance to add to the accumulator (already multiplied by
    the path throughput `mask`).
    """
    total = jnp.zeros_like(x)
    for slot in range(scene.num_lights):
        contrib, light_dir, valid = direct_light_slot(
            scene, cfg, slot, x, nl, pix, pass_idx, sample_idx, depth,
            sdf_march=sdf_march)
        if cfg.use_mis:
            # Weight applied only when the sample carries energy (1958).
            has_energy = vm.vdot(contrib, contrib) > 1e-6
            l_pdf = light_pdf_slot(scene, slot, x, cfg)
            b_pdf = smp.cosine_hemisphere_pdf(light_dir, nl)
            w = smp.power_heuristic(1.0, l_pdf, 1.0, b_pdf)
            contrib = jnp.where(has_energy[..., None], contrib * w[..., None], 0.0)
        total = total + jnp.where(valid, 1.0, 0.0) * contrib
    return total * mask
