"""raytracer0_tpu — a TPU-native differentiable path tracer.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
Mourtz/raytracer-0 WebGL2 path tracer (reference mounted read-only at
/root/reference): quadric/Euclidean intersection, SDF sphere tracing,
cosine-weighted BSDF sampling, multi-light NEE with Veach power-heuristic
MIS, ReSTIR spatiotemporal reservoir resampling, homogeneous participating
media, hero-wavelength spectral transport, procedural + image textures,
procedural sky / cubemap environment, thin-lens depth of field, tent-filter
AA, and tone-mapped display — all as a wavefront renderer over SoA ray
batches, differentiable w.r.t. scene parameters, and sharded across TPU
meshes with `shard_map`.

Layout:
  config.py    — RenderConfig static flags (the reference's defines/constants)
  rng.py       — counter-based stateless RNG (identical on TPU and CPU ref)
  models/      — scene pytree, materials, camera, presets, scene DSL
  ops/         — device math: intersect, sdf, bsdf, lighting, restir, ...
  render/      — integrator (bounce loop), renderer (frame/pass loop), state
  parallel/    — device meshes, tile sharding, halo exchange, checkpoints
  utils/       — image IO, profiling, ReSTIR diagnostics
  cpu_ref/     — numpy reference implementation sharing the same RNG
"""

from raytracer0_tpu.config import RenderConfig, OFFLINE_CONFIG, ANIMATED_CONFIG

__version__ = "0.1.0"
__all__ = ["RenderConfig", "OFFLINE_CONFIG", "ANIMATED_CONFIG", "__version__"]
