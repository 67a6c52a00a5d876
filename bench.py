"""Benchmark: forward+backward rays/s/chip on the Cornell box at 1 spp.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "rays/s", "vs_baseline": N}

Metric definition (BASELINE.json: "forward+backward rays/s/chip (Cornell
1spp)"): one step = render 1 spp at HxW with the offline bounce budget
AND backpropagate d(sum(image))/d(scene params).  Rays counted = primary
ray segments per pixel times the bounce budget (the wavefront executes
every bounce slot for every lane, so this is the number of traced
segments the chip actually pays for), i.e. H*W*max_bounces per step.
Shadow rays from NEE are *not* counted (conservative).

vs_baseline: the reference publishes no numbers (BASELINE.md).  The
yardstick used here is a fixed documented estimate of the reference's
real-time throughput on its stated target GPU (RTX 3070 Mobile,
README.md:3): 600x600 px * 60 fps * 6 bounces ≈ 1.3e8 ray segments/s.
"""

import json
import time

import jax
import jax.numpy as jnp

BASELINE_RAYS_PER_S = 1.3e8  # see module docstring

H = W = 512
WARMUP = 2
ITERS = 5


def main():
    from raytracer0_tpu.models.presets import cornell_default
    from raytracer0_tpu.render.renderer import sample_radiance

    scene, camera, cfg = cornell_default(use_mis=True)

    def loss_fn(color, emission, pos, joker, pass_idx):
        s = scene.replace(color=color, emission=emission, pos=pos, joker=joker)
        img = sample_radiance(s, cfg, camera, H, W, pass_idx)
        return jnp.sum(img)

    step = jax.jit(jax.grad(loss_fn, argnums=(0, 1, 2, 3)))

    args = (scene.color, scene.emission, scene.pos, scene.joker)
    for i in range(WARMUP):
        g = step(*args, i)
    jax.block_until_ready(g)

    t0 = time.perf_counter()
    for i in range(ITERS):
        g = step(*args, WARMUP + i)
    jax.block_until_ready(g)
    dt = (time.perf_counter() - t0) / ITERS

    rays = H * W * cfg.max_bounces  # 1 spp
    value = rays / dt
    print(json.dumps({
        "metric": "fwd+bwd rays/s/chip (cornell 1spp)",
        "value": round(value),
        "unit": "rays/s",
        "vs_baseline": round(value / BASELINE_RAYS_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
