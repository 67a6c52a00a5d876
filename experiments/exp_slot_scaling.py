"""Slot-count scaling at FIXED path caps + unrolled-loop variant."""
import time
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from raytracer0_tpu.models.presets import restir_demo
from raytracer0_tpu.models import scene as scene_mod
from raytracer0_tpu.models.camera import generate_rays
from raytracer0_tpu.ops import megakernel
from raytracer0_tpu.utils.profiling import sync
from raytracer0_tpu import rng

H = W = 512
ITERS = 20
scene, cam, cfg = restir_demo()
scene_f = scene_mod.animate_positions(scene, 0.0, int(cfg.render_mode))
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
    print(f"{name:40s} {(time.perf_counter()-t0)/ITERS*1e3:8.2f} ms (compile {comp:.1f}s)", flush=True)

for slots in (1, 2, 4):
    timeit(f"gbuffer slots={slots} rolled", lambda ro, rd, s=slots: megakernel.trace_forward_gbuffer(
        scene_f, cfg, ro, rd, pix, jnp.uint32(0), 0, slots_override=s))
cfg_u = cfg.replace(megakernel_unroll_below=99)
timeit("gbuffer slots=4 UNROLLED", lambda ro, rd: megakernel.trace_forward_gbuffer(
    scene_f, cfg_u, ro, rd, pix, jnp.uint32(0), 0))
