"""Perf experiment: where does the Cornell fwd+bwd step spend time?

Times the forward kernel, the backward (vjp) alone, and the full grad
step; counts pallas custom-calls in the compiled HLO to confirm whether
the unused forward kernel is DCE'd out of the grad step.
"""
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from raytracer0_tpu.models.presets import cornell_default
from raytracer0_tpu.render.renderer import sample_radiance
from raytracer0_tpu.utils.profiling import sync

H = W = 512
ITERS = 40

scene, camera, cfg = cornell_default(use_mis=True)


def timeit(fn, *args):
    t0 = time.perf_counter(); sync(fn(*args)); compile_s = time.perf_counter() - t0
    sync(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(ITERS):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / ITERS, compile_s


def loss_fn(color, emission, pos, joker, pass_idx):
    s = scene.replace(color=color, emission=emission, pos=pos, joker=joker)
    return jnp.sum(sample_radiance(s, cfg, camera, H, W, pass_idx))


a = (scene.color, scene.emission, scene.pos, scene.joker)

grad_step = jax.jit(jax.grad(loss_fn, argnums=(0, 1, 2, 3)))
vg_step = jax.jit(jax.value_and_grad(loss_fn, argnums=(0, 1, 2, 3)))
fwd = jax.jit(lambda p: sample_radiance(scene, cfg, camera, H, W, p))

for name, fn in [("grad", grad_step), ("value_and_grad", vg_step)]:
    txt = fn.lower(*a, 0).compile().as_text()
    n_cc = txt.count("custom_call_target=\"tpu_custom_call\"")
    print(f"{name}: {n_cc} tpu_custom_call(s) in HLO")

dt, cs = timeit(fwd, 0);            print(f"fwd           {dt*1e3:8.2f} ms  (compile {cs:.1f}s)")
dt, cs = timeit(grad_step, *a, 0);  print(f"grad          {dt*1e3:8.2f} ms  (compile {cs:.1f}s)")
dt, cs = timeit(vg_step, *a, 0);    print(f"value_and_grad{dt*1e3:8.2f} ms  (compile {cs:.1f}s)")
