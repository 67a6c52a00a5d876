"""Per-phase timing of the ReSTIR fast path on the real chip (round-3
agenda #2: steer the 62 ms/pass optimization).  Not part of bench.py's
single-line contract; run manually."""
import json, time
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from raytracer0_tpu.models.presets import restir_demo
from raytracer0_tpu.models import scene as scene_mod
from raytracer0_tpu.models.camera import generate_rays
from raytracer0_tpu.ops import restir, megakernel
from raytracer0_tpu.render.state import RenderState
from raytracer0_tpu.utils.profiling import sync
from raytracer0_tpu import rng

H = W = 512
ITERS = 20

scene, cam, cfg = restir_demo()
state = RenderState.create(H, W)
pix = rng.pixel_ids(H, W)
scene_f = scene_mod.animate_positions(scene, 0.0, int(cfg.render_mode))

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
    print(f"{name:28s} {dt*1e3:8.2f} ms   (compile {comp:.1f}s)")
    return dt

ro, rd = generate_rays(cam, H, W, jnp.uint32(0), sample_idx=0)

# 1. G-buffer megakernel alone
timeit("gbuffer_trace", lambda ro, rd: megakernel.trace_forward_gbuffer(
    scene_f, cfg, ro, rd, pix, jnp.uint32(0), 0), ro, rd)

# 2. cast_rays alone
timeit("cast_rays(1x)", lambda ro, rd: megakernel.cast_rays(scene_f, cfg, ro, rd), ro, rd)

# 3. reservoir_direct for ONE slot, with cheap dummy cast (no intersections)
back = restir._res_tree(state.restir_back)
hist = [restir._res_tree(state.restir_hist1), restir._res_tree(state.restir_hist2)]
x = jnp.zeros((H, W, 3)); nl = jnp.tile(jnp.asarray([0.,1.,0.]), (H, W, 1))
midx = jnp.zeros((H, W), jnp.int32); dep = jnp.zeros((H, W), jnp.uint32)

def dummy_cast(o, d):
    t = jnp.full(o.shape[:-1], cfg.infinity)
    return t, jnp.zeros(o.shape[:-1], jnp.int32), jnp.ones(o.shape[:-1], bool)

def res_only(x, nl):
    out, res = restir.reservoir_direct(
        scene_f, cfg, back, hist, x, nl, midx, pix, jnp.uint32(3), 0, dep,
        height=H, width=W, cast_fn=dummy_cast)
    return out, res["w"]
timeit("reservoir_phases(1 slot)", res_only, x, nl)

# 4. reservoir_direct one slot WITH real casts
def res_cast(x, nl):
    out, res = restir.reservoir_direct(
        scene_f, cfg, back, hist, x, nl, midx, pix, jnp.uint32(3), 0, dep,
        height=H, width=W,
        cast_fn=lambda o, d: megakernel.cast_rays(scene_f, cfg, o, d))
    return out, res["w"]
timeit("reservoir+2casts(1 slot)", res_cast, x, nl)

# 5. full fast pass
def full(state):
    return restir.render_sample_fast(scene, cfg, cam, state, H, W, jnp.uint32(3))
timeit("render_sample_fast", full, state)

print("slots =", min(cfg.max_diff_bounces, cfg.max_bounces),
      "restir_samples =", cfg.restir_samples,
      "num_lights =", scene.num_lights)
