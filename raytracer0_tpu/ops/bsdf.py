"""BSDF sampling: the reference's `brdf` dispatch (raytracer.glsl:1804-1884).

Four surface behaviors selected per ray by material type, evaluated
branch-free over the whole wavefront:

* DIFF — cosine-weighted bounce, throughput *= albedo (1826-1831)
* SPEC — mirror with roughness perturbation from emission-as-glossiness
  (`_roughness = e * randomDir`, 1812-1813, 1832-1836)
* REFR_FRESNEL / REFR_SCHLICK — refraction with TIR fallback and a
  stochastic reflect/transmit choice by reflectance (1837-1868); spectral
  materials (negative IOR) get a wavelength-dependent Cauchy IOR
  (1820-1824)
* COAT — stochastic specular-vs-diffuse by Schlick (1869-1884)

Per-type bounce counters mirror the reference's globals; note that the
reference increments SCATTERING_EVENTS (not TRANS_BOUNCES) on
transmission — TRANS_BOUNCES is declared but never incremented (435-438,
1866) — which we reproduce faithfully.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from raytracer0_tpu.models.materials import MatType
from raytracer0_tpu.ops import sampling as smp
from raytracer0_tpu.ops import spectral as spec
from raytracer0_tpu.ops import vecmath as vm

IOR_AIR = 1.00029  # nc in brdf (raytracer.glsl:1815)


@struct.dataclass
class BsdfSample:
    o: Any             # f32[..., 3] next ray origin
    d: Any             # f32[..., 3] next ray direction
    mask_mult: Any     # f32[..., 3] throughput multiplier
    specular: Any      # bool[...] bounce is specular (NEE gating)
    diff_inc: Any      # i32[...] DIFF_BOUNCES increment
    spec_inc: Any      # i32[...] SPEC_BOUNCES increment
    scatter_inc: Any   # i32[...] SCATTERING_EVENTS increment


def sample(scene, cfg, hit, c, e, inside, rd, hero_wl,
           u_dir1, u_dir2, u_choice):
    """Sample the next ray for every lane of the wavefront.

    `c`, `e`: textured color/emission (raytracer.glsl:2071, 2077);
    `inside`: +1 entering / -1 exiting (2074); `rd`: current direction;
    `hero_wl`: hero wavelength in nm (spectral transport).
    """
    x = hit.pos
    n = hit.n
    nl = n * inside[..., None]

    mat_type = scene.mat_type[hit.idx]
    nt = scene.ior[hit.idx]

    rand_dir = smp.random_direction(nl, u_dir1, u_dir2, cfg.use_biased_sampling)
    # Emission doubles as glossiness (1812-1813).  The perturbation
    # magnitude is *detached*: it only bends the sampled direction, and
    # reparameterization gradients through a bounce direction cross
    # geometric discontinuities (|dt/dd| -> inf at sphere silhouettes as
    # the quadratic discriminant -> 0), yielding inf cotangents that
    # become NaN through indicator-multiplied max/min JVPs.  This is the
    # same detached-sampling estimator already used for the discrete
    # reflect/refract choice (module docstring; SURVEY.md §7.2-1): the
    # continuous integrand along the sampled path stays differentiable.
    roughness = jax.lax.stop_gradient(e) * rand_dir

    nc = IOR_AIR
    if cfg.use_spectral:
        nt_eff = jnp.where(nt < 0.0, spec.cauchy_ior(hero_wl, jnp.abs(nt)), nt)
    else:
        nt_eff = jnp.abs(nt)  # graceful non-spectral handling (1823)
    nt_eff = jnp.maximum(nt_eff, 1e-3)  # guard the NULL/light materials (nt=0)

    eps = cfg.epsilon
    o_out = x + nl * eps
    o_in = x - nl * eps

    refl_dir = vm.normalize(roughness + vm.reflect(rd, nl))

    # ---- refraction machinery (computed for all lanes, selected later) ----
    entering = inside > 0.0
    nnt = jnp.where(entering, nc / nt_eff, nt_eff / nc)
    tdir_raw, tir = vm.refract(rd, nl, nnt)
    tdir = vm.normalize(roughness + tdir_raw)

    re_schlick = smp.schlick(rd, nl, nc, nt_eff)
    re_fresnel = smp.fresnel(rd, nl, nc, nt_eff, tdir)
    is_fresnel = mat_type == MatType.REFR_FRESNEL
    re = jnp.where(is_fresnel, re_fresnel, re_schlick)

    reflect_choice = u_choice < re

    # ---- per-type outcomes ----
    is_diff = mat_type == MatType.DIFF
    is_spec = mat_type == MatType.SPEC
    is_refr = (mat_type == MatType.REFR_FRESNEL) | (mat_type == MatType.REFR_SCHLICK)
    is_coat = mat_type == MatType.COAT

    refr_reflects = tir | reflect_choice
    coat_spec = u_choice < re_schlick

    d = vm.where3(is_diff, rand_dir,
        vm.where3(is_spec, refl_dir,
        vm.where3(is_refr, vm.where3(refr_reflects, refl_dir, tdir),
        vm.where3(coat_spec, refl_dir, rand_dir))))

    o = vm.where3(is_refr & ~refr_reflects, o_in, o_out)

    attenuates = is_diff | is_spec | (is_refr & ~refr_reflects) | (is_coat & ~coat_spec)
    mask_mult = jnp.where(attenuates[..., None], c, 1.0)

    specular = is_spec | is_refr | (is_coat & coat_spec)

    diff_inc = (is_diff | (is_coat & ~coat_spec)).astype(jnp.int32)
    spec_inc = (is_spec | (is_refr & refr_reflects) | (is_coat & coat_spec)).astype(jnp.int32)
    scatter_inc = (is_refr & ~refr_reflects).astype(jnp.int32)

    return BsdfSample(o=o, d=d, mask_mult=mask_mult, specular=specular,
                      diff_inc=diff_inc, spec_inc=spec_inc,
                      scatter_inc=scatter_inc)
