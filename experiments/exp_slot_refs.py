"""Validate the direct-store slot refactor on hardware: gbuffer kernel +
full fast pass times."""
import time
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from raytracer0_tpu.models.presets import restir_demo
from raytracer0_tpu.models import scene as scene_mod
from raytracer0_tpu.models.camera import generate_rays
from raytracer0_tpu.ops import megakernel, restir
from raytracer0_tpu.render.state import RenderState
from raytracer0_tpu.utils.profiling import sync
from raytracer0_tpu import rng

H = W = 512
ITERS = 20
scene, cam, cfg = restir_demo()
scene_f = scene_mod.animate_positions(scene, 0.0, int(cfg.render_mode))
pix = rng.pixel_ids(H, W)
ro, rd = generate_rays(cam, H, W, jnp.uint32(0), sample_idx=0)
state = RenderState.create(H, W)

def timeit(name, fn, *args):
    f = jax.jit(fn)
    t0 = time.perf_counter(); sync(f(*args)); comp = time.perf_counter() - t0
    sync(f(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(ITERS):
        out = f(*args)
    sync(out)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:34s} {dt*1e3:8.2f} ms (compile {comp:.1f}s)", flush=True)

timeit("gbuffer 4 slots (ref stores)", lambda ro, rd: megakernel.trace_forward_gbuffer(
    scene_f, cfg, ro, rd, pix, jnp.uint32(0), 0), ro, rd)
timeit("render_sample_fast", lambda st: restir.render_sample_fast(
    scene, cfg, cam, st, H, W, jnp.uint32(3)), state)
