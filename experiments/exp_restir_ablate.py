"""Ablate the restir_demo gbuffer kernel cost: march steps, SDF presence,
mesh count, gbuf slots."""
import time
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from raytracer0_tpu.models.presets import restir_demo
from raytracer0_tpu.models import scene as scene_mod
from raytracer0_tpu.models.dsl import parse_scene
from raytracer0_tpu.models.camera import generate_rays
from raytracer0_tpu.ops import megakernel
from raytracer0_tpu.utils.profiling import sync
from raytracer0_tpu import rng

H = W = 512
ITERS = 20
scene, cam, cfg = restir_demo()
pix = rng.pixel_ids(H, W)
ro, rd = generate_rays(cam, H, W, jnp.uint32(0), sample_idx=0)

def timeit(name, sc, cf):
    scf = scene_mod.animate_positions(sc, 0.0, int(cf.render_mode))
    f = jax.jit(lambda ro, rd: megakernel.trace_forward_gbuffer(
        scf, cf, ro, rd, pix, jnp.uint32(0), 0))
    t0 = time.perf_counter(); sync(f(ro, rd)); comp = time.perf_counter() - t0
    sync(f(ro, rd))
    t0 = time.perf_counter()
    out = None
    for _ in range(ITERS):
        out = f(ro, rd)
    sync(out)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:34s} {dt*1e3:8.2f} ms (compile {comp:.1f}s)", flush=True)

timeit("baseline 12b march128", scene, cfg)
timeit("march=8", scene, cfg.replace(marching_steps=8))

# no-SDF variant of the same scene (drop the SDF line)
from raytracer0_tpu.models.presets import _RESTIR_9_LIGHTS
txt = "\n".join(l for l in _RESTIR_9_LIGHTS.splitlines() if "SDF" not in l)
scene_nosdf = parse_scene(txt)
timeit("no SDF", scene_nosdf, cfg)
timeit("no SDF 2 bounces", scene_nosdf, cfg.replace(max_bounces=2))

# fewer meshes: lights only + floor
txt2 = "\n".join(l for l in _RESTIR_9_LIGHTS.splitlines()
                 if ("LIGHT" in l) or ("PLANE" in l and "-1.0, 0.0" not in l and "1.0, 0.0" not in l))
scene_small = parse_scene(txt2)
timeit(f"small scene ({scene_small.num_analytic} meshes)", scene_small, cfg)

timeit("slots effect: 1 slot", scene, cfg.replace(max_diff_bounces=1))
