"""Re-measure the r3 "~8.4 ms/slot G-buffer export floor" honestly.

The r3 experiments (exp_slot_scaling et al.) ended their timing loops
with `sync(outputs)` — one ~25 ms tunnel round trip PER LEAF (12 leaves
per slot / 40 iters ≈ 7.5 ms/slot of phantom cost, suspiciously close to
the reported floor).  This script times the same kernels as on-device
lax.scan chains with a single-leaf barrier, which removes every host
artifact.

    PYTHONPATH=/root/repo:$PYTHONPATH python experiments/exp_export_floor_revisited.py
"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from raytracer0_tpu import rng
from raytracer0_tpu.models import scene as scene_mod
from raytracer0_tpu.models.camera import generate_rays
from raytracer0_tpu.models.presets import restir_demo
from raytracer0_tpu.ops import megakernel
from raytracer0_tpu.utils.profiling import sync

H = W = 512
N = 20
scene, cam, cfg = restir_demo()
scene_f = scene_mod.animate_positions(scene, 0.0, 0)
pix = rng.pixel_ids(H, W)
ro, rd = generate_rays(cam, H, W, jnp.uint32(0), sample_idx=0)


def scan_time(make_step, label):
    @jax.jit
    def run(x0):
        def body(c, p):
            return make_step(c, p), ()
        c, _ = jax.lax.scan(body, x0, jnp.arange(N, dtype=jnp.uint32))
        return c
    x0 = jnp.zeros((H, W, 3), jnp.float32)
    sync(run(x0)[0, 0, 0])
    t0 = time.perf_counter()
    sync(run(x0)[0, 0, 0])
    print(f"{label}: {(time.perf_counter()-t0)/N*1e3:6.2f} ms/pass")


# plain forward trace (no NEE deferral) on the same scene
scan_time(lambda c, p: c + megakernel.trace_forward(
    scene_f, cfg, ro, rd, pix, p, 0), "plain trace_forward      ")

# G-buffer split kernel at 1/2/4 slots (radiance + 12 ch/slot exports)
for s in (1, 2, 4):
    def step(c, p, s=s):
        rad, gbuf = megakernel.trace_forward_gbuffer(
            scene_f, cfg, ro, rd, pix, p, 0, slots_override=s)
        extra = sum(g["pos"].sum() + g["mask"].sum() for g in gbuf)
        return c + rad + extra * 1e-12
    scan_time(step, f"gbuffer slots={s}          ")
