"""A/B: Pallas cast kernel for the gradient-dead occlusion sweeps of the
DIFFERENTIABLE ReSTIR path (restir.grad_safe_cast_fn).

The XLA wavefront's restir pass does 3 full intersection sweeps per
bounce: the path trace (AD needed — geometry grads flow through hit
positions) plus two occlusion casts (finalize visibility + shade shadow)
whose outputs are booleans/ints when volumetrics is off.  Swapping the
two casts to `megakernel.cast_rays` under stop_gradient is
gradient-exact (see grad_safe_cast_fn docstring) and removes 2/3 of the
intersection work from both the fwd pass and the remat recompute of the
backward sweep.

Measures, on restir_demo at 512²:
  * fwd+bwd ms of jit(grad(loss)) with the swap ON and OFF,
  * fwd-only ms both ways,
  * max |grad_on - grad_off| / max|grad_off| (expected ~0: only
    shadow-threshold-edge visibility flips can differ).

Run on the TPU chip: python experiments/exp_grad_cast.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from raytracer0_tpu.models.presets import restir_demo
from raytracer0_tpu.ops import restir as restir_ops
from raytracer0_tpu.render.state import RenderState
from raytracer0_tpu.utils.profiling import sync

H = W = 512
ITERS = 5


def run(tag):
    scene, camera, cfg = restir_demo()
    st = RenderState.create(H, W)

    def loss(emission, pass_idx):
        s = scene.replace(emission=emission)
        rad, _ = restir_ops.render_sample(s, cfg, camera, st, H, W, pass_idx)
        return jnp.sum(rad)

    gstep = jax.jit(jax.grad(loss))
    fwd = jax.jit(loss)

    t0 = time.perf_counter()
    g = gstep(scene.emission, jnp.uint32(0))
    sync(g[0, 0])
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for p in range(ITERS):
        g = gstep(scene.emission, jnp.uint32(p))
    sync(g[0, 0])
    bwd_ms = (time.perf_counter() - t0) / ITERS * 1e3

    sync(fwd(scene.emission, jnp.uint32(0)))
    t0 = time.perf_counter()
    out = None
    for p in range(ITERS):
        out = fwd(scene.emission, jnp.uint32(p))
    sync(out)
    fwd_ms = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{tag}: fwd {fwd_ms:.1f} ms  fwd+bwd {bwd_ms:.1f} ms "
          f"(compile {compile_s:.0f}s)")
    return np.asarray(gstep(scene.emission, jnp.uint32(3)))


if __name__ == "__main__":
    os.environ["RT0_NO_GRAD_CAST"] = "1"
    g_off = run("XLA casts (old)")
    os.environ.pop("RT0_NO_GRAD_CAST")
    g_on = run("Pallas casts    ")
    denom = max(np.abs(g_off).max(), 1e-12)
    print(f"grad rel err: {np.abs(g_on - g_off).max() / denom:.3e}")
