"""Round-3 perf checkpoint: march gate effect + deferred texture paths."""
import time
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from raytracer0_tpu.models import presets
from raytracer0_tpu.models import scene as scene_mod
from raytracer0_tpu.models.camera import generate_rays
from raytracer0_tpu.ops import megakernel, restir
from raytracer0_tpu.render.state import RenderState
from raytracer0_tpu.utils.profiling import sync
from raytracer0_tpu import rng

H = W = 512
ITERS = 20

def timeit(name, fn, *args):
    f = jax.jit(fn)
    t0 = time.perf_counter(); sync(f(*args)); comp = time.perf_counter() - t0
    sync(f(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(ITERS):
        out = f(*args)
    sync(out)
    print(f"{name:36s} {(time.perf_counter()-t0)/ITERS*1e3:8.2f} ms (compile {comp:.1f}s)", flush=True)

pix = rng.pixel_ids(H, W)

scene, cam, cfg = presets.restir_demo()
scene_f = scene_mod.animate_positions(scene, 0.0, int(cfg.render_mode))
ro, rd = generate_rays(cam, H, W, jnp.uint32(0), sample_idx=0)
timeit("gbuffer (march gate)", lambda ro, rd: megakernel.trace_forward_gbuffer(
    scene_f, cfg, ro, rd, pix, jnp.uint32(0), 0), ro, rd)
state = RenderState.create(H, W)
timeit("render_sample_fast", lambda st: restir.render_sample_fast(
    scene, cfg, cam, st, H, W, jnp.uint32(3)), state)

st, sc, cc = presets.textured_cornell()
ro2, rd2 = generate_rays(sc, H, W, jnp.uint32(0), sample_idx=0)
timeit("imgtex fast path", lambda ro, rd: megakernel.trace_forward_imgtex(
    st, cc, ro, rd, pix, jnp.uint32(0), 0), ro2, rd2)

se, ce, cfge = presets.cubemap_demo()
ro3, rd3 = generate_rays(ce, H, W, jnp.uint32(0), sample_idx=0)
timeit("cubemap fast path", lambda ro, rd: megakernel.trace_forward_env(
    se, cfge, ro, rd, pix, jnp.uint32(0), 0), ro3, rd3)

s5, c5cam, c5 = presets.spectral_caustics()
ro5, rd5 = generate_rays(c5cam, H, W, jnp.uint32(0), sample_idx=0)
timeit("config5 fwd (march gate n/a?)", lambda ro, rd: megakernel.trace_forward(
    s5, c5, ro, rd, pix, jnp.uint32(0), 0), ro5, rd5)
