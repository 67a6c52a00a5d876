"""A/B: fused in-kernel ReSTIR vs the round-3 split path (VERDICT r4).

Sequential state-chained timing (each pass consumes the previous pass's
reservoirs — the honest protocol; see the measurement caveat in
experiments/README.md).  Run on the TPU chip:

    PYTHONPATH=/root/repo:$PYTHONPATH python experiments/exp_fused_restir.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import numpy as np

from raytracer0_tpu.utils.profiling import sync

from raytracer0_tpu.models.presets import restir_demo, restir_stress, \
    animated_restir
from raytracer0_tpu.ops import restir as restir_ops
from raytracer0_tpu.render.state import RenderState

H = W = 512
FRAMES = 20


def chain(fn, scene, cam, cfg, frames=FRAMES, time_scale=0.0):
    st = RenderState.create(H, W)
    t0 = time.perf_counter()
    rad, nb = fn(scene, cfg, cam, st, H, W, 0, 0.0)
    sync(rad)
    compile_s = time.perf_counter() - t0
    st = st.rotate_reservoirs(nb)
    t0 = time.perf_counter()
    for p in range(1, frames + 1):
        rad, nb = fn(scene, cfg, cam, st, H, W, p, time_scale * p)
        st = st.rotate_reservoirs(nb)
    sync(rad)
    ms = (time.perf_counter() - t0) / frames * 1e3
    return ms, compile_s, np.asarray(rad)


def wrap(fn):
    import jax.numpy as jnp
    jitted = jax.jit(
        lambda scene, cfg, cam, st, h, w, p, t: fn(
            scene, cfg, cam, st, h, w, p, t),
        static_argnames=("cfg", "h", "w"))

    def run(scene, cfg, cam, st, h, w, p, t):
        return jitted(scene, cfg, cam, st, h, w, jnp.uint32(p),
                      jnp.float32(t))
    return run


def main():
    print("devices:", jax.devices())
    scene, cam, cfg = restir_demo()

    fused = wrap(restir_ops.render_sample_fused)
    split = wrap(restir_ops.render_sample_fast)

    ms_f, cs_f, img_f = chain(fused, scene, cam, cfg)
    print(f"fused   restir_demo: {ms_f:7.2f} ms/pass  (compile {cs_f:.1f}s)")
    ms_s, cs_s, img_s = chain(split, scene, cam, cfg)
    print(f"split   restir_demo: {ms_s:7.2f} ms/pass  (compile {cs_s:.1f}s)")
    err = np.abs(img_f - img_s)
    print(f"        fused-vs-split last-frame: max {err.max():.2e} "
          f"median {np.median(err):.2e}")

    s2, c2, g2 = restir_stress()
    ms_fs, cs_fs, _ = chain(fused, s2, c2, g2)
    print(f"fused  restir_stress: {ms_fs:7.2f} ms/pass (compile {cs_fs:.1f}s)")

    s3, c3, g3 = animated_restir()
    ms_fa, cs_fa, _ = chain(fused, s3, c3, g3, time_scale=1.0 / 60.0)
    print(f"fused  animated:      {ms_fa:7.2f} ms/frame (compile {cs_fa:.1f}s)"
          f"  [budget 16.0]")


if __name__ == "__main__":
    main()
