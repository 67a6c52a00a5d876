"""Device-true ReSTIR pass timing: N frames as ONE jitted lax.scan.

The tunneled axon platform adds per-dispatch latency that contaminates
host-side chained timings (~1-3 ms/step, /tmp chain-floor A/B); scanning
the frame loop on-device removes every host effect — the scan carries
(RenderState) through rotate_reservoirs exactly like the Renderer loop.

    PYTHONPATH=/root/repo:$PYTHONPATH python experiments/exp_fused_scan.py
"""
import sys, time
sys.path.insert(0, "/root/repo")
import functools
import jax, jax.numpy as jnp
import numpy as np
from raytracer0_tpu.models.presets import restir_demo, restir_stress, \
    animated_restir
from raytracer0_tpu.ops import restir as restir_ops
from raytracer0_tpu.render.state import RenderState
from raytracer0_tpu.utils.profiling import sync

H = W = 512
N = 20


def scan_ms(render_fn, scene, cam, cfg, label, time_scale=0.0):
    @functools.partial(jax.jit, static_argnames=())
    def run(state0):
        def body(st, p):
            rad, nb = render_fn(scene, cfg, cam, st, H, W, p,
                                jnp.float32(p) * time_scale)
            st2 = st.rotate_reservoirs(nb).replace(
                accum=st.accum + rad, passes=st.passes + 1)
            return st2, ()
        stN, _ = jax.lax.scan(body, state0,
                              jnp.arange(N, dtype=jnp.uint32))
        return stN.accum
    st0 = RenderState.create(H, W)
    t0 = time.perf_counter()
    sync(run(st0))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    sync(run(st0))
    dt = (time.perf_counter() - t0) / N * 1e3
    print(f"{label}: {dt:7.2f} ms/pass (compile {compile_s:.1f}s)")
    return dt


def main():
    print("devices:", jax.devices())
    scene, cam, cfg = restir_demo()
    scan_ms(restir_ops.render_sample_fused, scene, cam, cfg, "fused  demo   ")
    scan_ms(restir_ops.render_sample_fast, scene, cam, cfg, "split  demo   ")
    s2, c2, g2 = restir_stress()
    scan_ms(restir_ops.render_sample_fused, s2, c2, g2,     "fused  stress ")
    s3, c3, g3 = animated_restir()
    scan_ms(restir_ops.render_sample_fused, s3, c3, g3,     "fused  anim   ",
            time_scale=1.0 / 60.0)


if __name__ == "__main__":
    main()
