"""Isolate the gbuffer kernel's fixed cost: 2-bounce plain trace vs
2-bounce gbuffer (4 slots) on the no-SDF restir scene, plus a 1-slot
variant at full diff caps (slots only, not path caps)."""
import time
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from raytracer0_tpu.models.presets import restir_demo, _RESTIR_9_LIGHTS
from raytracer0_tpu.models.dsl import parse_scene
from raytracer0_tpu.models.camera import generate_rays
from raytracer0_tpu.ops import megakernel
from raytracer0_tpu.utils.profiling import sync
from raytracer0_tpu import rng

H = W = 512
ITERS = 20
_, cam, cfg = restir_demo()
txt = "\n".join(l for l in _RESTIR_9_LIGHTS.splitlines() if "SDF" not in l)
scene = parse_scene(txt)
pix = rng.pixel_ids(H, W)
ro, rd = generate_rays(cam, H, W, jnp.uint32(0), sample_idx=0)

def timeit(name, fn):
    f = jax.jit(fn)
    t0 = time.perf_counter(); sync(f(ro, rd)); comp = time.perf_counter() - t0
    sync(f(ro, rd))
    t0 = time.perf_counter()
    out = None
    for _ in range(ITERS):
        out = f(ro, rd)
    sync(out)
    print(f"{name:44s} {(time.perf_counter()-t0)/ITERS*1e3:8.2f} ms (compile {comp:.1f}s)", flush=True)

cfg2 = cfg.replace(max_bounces=2, use_restir=False, sample_lights=False)
timeit("plain trace 2 bounces (no NEE)", lambda ro, rd: megakernel.trace_forward(
    scene, cfg2, ro, rd, pix, jnp.uint32(0), 0))
cfgg = cfg.replace(max_bounces=2)
timeit("gbuffer 4 slots 2 bounces", lambda ro, rd: megakernel.trace_forward_gbuffer(
    scene, cfgg, ro, rd, pix, jnp.uint32(0), 0))
timeit("gbuffer 4 slots 12 bounces", lambda ro, rd: megakernel.trace_forward_gbuffer(
    scene, cfg, ro, rd, pix, jnp.uint32(0), 0))
cfgp = cfg.replace(use_restir=False, sample_lights=False)
timeit("plain trace 12 bounces (no NEE)", lambda ro, rd: megakernel.trace_forward(
    scene, cfgp, ro, rd, pix, jnp.uint32(0), 0))
