"""A/B the MXU winner-select on hardware."""
import os, time
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from raytracer0_tpu.models.presets import restir_demo, cornell_default
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

gb = lambda ro, rd: megakernel.trace_forward_gbuffer(scene_f, cfg, ro, rd, pix, jnp.uint32(0), 0)
timeit("gbuffer MXU-select", gb, ro, rd)
# numerical parity MXU vs select chain
r1, g1 = jax.jit(gb)(ro, rd)
os.environ["RT0_NO_MXU_SELECT"] = "1"
r2, g2 = jax.jit(lambda ro, rd: megakernel.trace_forward_gbuffer(scene_f, cfg, ro, rd, pix, jnp.uint32(0), 0))(ro, rd)
import numpy as np
print("parity max err:", float(jnp.max(jnp.abs(r1 - r2))), flush=True)
timeit("gbuffer select-chain", lambda ro, rd: megakernel.trace_forward_gbuffer(scene_f, cfg, ro, rd, pix, jnp.uint32(0), 0), ro, rd)
del os.environ["RT0_NO_MXU_SELECT"]
