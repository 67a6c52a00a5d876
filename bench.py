"""Benchmark: forward+backward rays/s/chip on the Cornell box at 1 spp.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "rays/s", "vs_baseline": N, ...}

Metric definition (BASELINE.json: "forward+backward rays/s/chip (Cornell
1spp)"): one step = render 1 spp at HxW with the offline bounce budget
AND backpropagate d(sum(image))/d(scene params).  Rays counted = primary
ray segments per pixel times the bounce budget (the wavefront executes
every bounce slot for every lane, so this is the number of traced
segments the chip actually pays for), i.e. H*W*max_bounces per step.
Shadow rays from NEE are *not* counted (conservative).

Timing sync is a host transfer (`profiling.sync`): `block_until_ready`
returns before remote execution finishes on this container's tunneled
TPU platform, which silently inflates naive timings by orders of
magnitude.

vs_baseline: the reference publishes no numbers (BASELINE.md).  The
yardstick is the same fixed documented estimate as round 1 (for
cross-round comparability): the reference's real-time throughput on its
stated target GPU (RTX 3070 Mobile, README.md:3): 600x600 px * 60 fps *
6 bounces ~= 1.3e8 ray segments/s.

Speed-of-light (SURVEY.md §7.1-7): `sol` reports XLA's own flop count
for the *same math* on the XLA wavefront path (cost_analysis of the
compiled fwd+bwd step; the Pallas kernel is opaque to cost analysis, so
the XLA graph of identical semantics is the flop oracle), the achieved
TFLOP/s, and the fraction of the chip's f32 vector peak.  The path
tracer is VPU-bound (elementwise math, no matmuls): for TPU v5e
("TPU v5 lite") the f32 vector peak is 8x128 lanes x 4 ALUs x 0.94 GHz
~= 3.85 T f32 op/s per chip; MXU peaks (197 TF bf16) don't apply.
HBM roofline does not bind: the megakernel is block-resident in VMEM
and touches ~52 B/pixel/pass of HBM, far under 819 GB/s at these times.
"""

import json
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BASELINE_RAYS_PER_S = 1.3e8   # see module docstring
VPU_F32_PEAK = {              # f32 vector op/s per chip, by device_kind
    "TPU v5 lite": 3.85e12,   # 8*128*4 ALUs * 0.94 GHz
}

H = W = 512
WARMUP = 2
# Enough queued steps to amortize the tunneled-platform dispatch latency:
# at ITERS=10 the Cornell fwd+bwd step measured 14.8 ms/step, at ITERS=40
# the same binary measures ~8 ms/step — short runs time the dispatch
# pipeline, not the kernel.
ITERS = 40


def _one_leaf(tree):
    """A single leaf of a chained computation's output: transferring one
    element of it is a full barrier (execution N requires N-1's outputs;
    one executable's outputs complete together).  `sync` costs one
    tunnel ROUND TRIP per leaf (~25 ms on this container's remote
    platform), so syncing a whole RenderState (25 leaves) at the end of
    a timing loop silently added ~25·RTT/iters ms/pass to every
    round-1..3 bench number — measured and fixed in round 4
    (experiments/README.md)."""
    import jax as _jax
    return _jax.tree.leaves(tree)[0]


def _timeit(fn, *args_list):
    """Steady-state seconds/call over ITERS calls (host-transfer sync)."""
    from raytracer0_tpu.utils.profiling import sync

    t0 = time.perf_counter()
    sync(fn(*args_list[0]))
    compile_s = time.perf_counter() - t0
    for a in args_list[1:WARMUP]:
        fn(*a)
    sync(_one_leaf(fn(*args_list[WARMUP - 1])))
    t0 = time.perf_counter()
    out = None
    for a in args_list[WARMUP:WARMUP + ITERS]:
        out = fn(*a)
    sync(_one_leaf(out))
    return (time.perf_counter() - t0) / ITERS, compile_s


#: Approximate VPU issue-slot weights per HLO opcode (TPU v5e vector
#: unit).  1 = one lane-wide ALU slot; transcendentals and division are
#: multi-slot sequences.  Deliberately coarse — the point is an
#: *op-mix-aware* ceiling, not a cycle-exact model (VERDICT r3 next #8:
#: pure flop counts undercount select/compare-heavy shading code, which
#: pays full slots for ops cost_analysis counts as zero).
_VPU_OP_WEIGHTS = {
    "add": 1, "subtract": 1, "multiply": 1, "maximum": 1, "minimum": 1,
    "and": 1, "or": 1, "xor": 1, "not": 1, "negate": 1, "abs": 1,
    "compare": 1, "select": 1, "clamp": 1, "sign": 1, "floor": 1,
    "ceil": 1, "round-nearest-afz": 1, "convert": 1, "bitcast-convert": 1,
    "shift-left": 1, "shift-right-logical": 1, "shift-right-arithmetic": 1,
    "divide": 8, "sqrt": 8, "rsqrt": 8, "power": 16,
    "exponential": 8, "log": 8, "sine": 12, "cosine": 12, "atan2": 16,
    "tanh": 8, "is-finite": 1,
}


def _op_mix_ceiling(compiled, dt, peak_ops_per_s):
    """Parse the optimized HLO of the XLA-semantics-oracle step and build
    an op-mix-weighted VPU ceiling: every elementwise op line in every
    computation (fusion bodies included — they appear as their own
    computations in the module text), weighted by output element count
    and the issue-slot table above.  Returns the analysis dict."""
    import re

    txt = compiled.as_text()
    weighted = 0.0
    by_kind = {}
    for m in re.finditer(
            r"=\s+(?:f32|f16|bf16|s32|u32|pred|s8|u8)\[([\d,]*)\][^\s]*\s+"
            r"([a-z-]+)\(", txt):
        shape, op = m.group(1), m.group(2)
        w = _VPU_OP_WEIGHTS.get(op)
        if w is None:
            continue
        n = 1
        for d in shape.split(","):
            if d:
                n *= int(d)
        weighted += w * n
        by_kind[op] = by_kind.get(op, 0) + w * n
    ideal_s = weighted / peak_ops_per_s
    top = sorted(by_kind.items(), key=lambda kv: -kv[1])[:8]
    return {
        "weighted_vpu_ops": weighted,
        "ideal_ms": round(ideal_s * 1e3, 2),
        "of_op_mix_ceiling": round(ideal_s / dt, 3),
        "top_ops_pct": {k: round(100.0 * v / weighted, 1) for k, v in top},
        "note": "HLO of the XLA oracle graph; weights = approx VPU "
                "issue slots (transcendentals/div multi-slot); ceiling "
                "= weighted ops / f32 vector peak",
    }


def bench_cornell():
    """Headline: fwd+bwd on the Cornell megakernel path + XLA flop oracle."""
    from raytracer0_tpu.models.presets import cornell_default
    from raytracer0_tpu.render.renderer import sample_radiance

    scene, camera, cfg = cornell_default(use_mis=True)

    def loss_fn(color, emission, pos, joker, pass_idx, cfg=cfg):
        s = scene.replace(color=color, emission=emission, pos=pos, joker=joker)
        return jnp.sum(sample_radiance(s, cfg, camera, H, W, pass_idx))

    step = jax.jit(jax.grad(loss_fn, argnums=(0, 1, 2, 3)))
    a = (scene.color, scene.emission, scene.pos, scene.joker)
    dt, compile_s = _timeit(step, *[a + (i,) for i in range(WARMUP + ITERS)])

    fwd = jax.jit(lambda p: sample_radiance(scene, cfg, camera, H, W, p))
    dt_fwd, _ = _timeit(fwd, *[(i,) for i in range(WARMUP + ITERS)])

    # Flop oracle: the XLA wavefront path computes identical semantics;
    # its compiled cost analysis counts what the Pallas kernel hides.
    sol = {}
    try:
        cfg_xla = cfg.replace(use_megakernel=False)

        def loss_xla(color, emission, pos, joker, pass_idx):
            s = scene.replace(color=color, emission=emission,
                              pos=pos, joker=joker)
            return jnp.sum(sample_radiance(s, cfg_xla, camera, H, W,
                                           pass_idx))

        compiled = (jax.jit(jax.grad(loss_xla, argnums=(0, 1, 2, 3)))
                    .lower(*a, 0).compile())
        ca = compiled.cost_analysis()
        flops = float(ca.get("flops", 0.0))
        kind = jax.devices()[0].device_kind
        peak = VPU_F32_PEAK.get(kind)
        sol = {
            "xla_flops_per_step": flops,
            "achieved_tflops": round(flops / dt / 1e12, 3),
            "device_kind": kind,
            "vpu_f32_peak_tflops": peak and peak / 1e12,
            "sol_fraction": peak and round(flops / dt / peak, 3),
        }
        if peak:
            # op-mix ceiling (VERDICT r3 next #8): selects/compares pay
            # full VPU slots that the flop counter scores as zero
            sol["op_mix"] = _op_mix_ceiling(compiled, dt, peak)
    except Exception as e:  # cost analysis is best-effort observability
        sol = {"error": f"{type(e).__name__}: {e}"}

    return dt, dt_fwd, compile_s, sol, cfg


def _renderer_ms(scene, camera, cfg, iters=ITERS, time_fn=None):
    """ms/pass via `Renderer.render_scan` — the whole chain is ONE
    on-device lax.scan (round 5, VERDICT r4 next #7), so the tunneled
    platform's ~1-3 ms per-dispatch latency no longer contaminates the
    number (exp_fused_scan.py was the ground-truth protocol; it is now
    the production path).  `time_fn(i)` maps to the scan's linear time
    axis: time0 = time_fn(0), step = time_fn(1) - time_fn(0)."""
    from raytracer0_tpu.render.renderer import Renderer
    from raytracer0_tpu.utils.profiling import sync

    r = Renderer(scene, camera, cfg, H, W)
    tf = time_fn or (lambda i: 0.0)
    dt_time = tf(1) - tf(0)
    t0 = time.perf_counter()
    r.render_scan(iters, time_s=tf(0), time_step=dt_time)
    sync(r.state.passes)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    r.render_scan(iters, time_s=tf(iters), time_step=dt_time)
    # one-leaf barrier: `passes` is chained through every pass
    sync(r.state.passes)
    return (time.perf_counter() - t0) / iters, compile_s


def bench_restir():
    """ReSTIR (BASELINE config 4): ms/pass on restir_demo via the
    renderer dispatch (the fused in-kernel pipeline, VERDICT r3 next #1),
    the round-3 split path timed alongside as its A/B baseline, the
    41-light stress preset, and the fwd+bwd cost of the *differentiable*
    ReSTIR path (r3 next #5 — previously unmeasured)."""
    import jax as _jax
    import jax.numpy as jnp

    from raytracer0_tpu.models.presets import restir_demo, restir_stress
    from raytracer0_tpu.ops import restir as restir_ops
    from raytracer0_tpu.render.state import RenderState
    from raytracer0_tpu.utils.profiling import sync

    scene, camera, cfg = restir_demo()
    ms, compile_s = _renderer_ms(scene, camera, cfg)

    # round-3 split path (G-buffer kernel + XLA phases + cast_rays) as
    # the in-repo baseline for the fused kernel's win
    def _chain_ms(fn, frames=10):
        f = _jax.jit(lambda sc, cf, cm, st, p: fn(sc, cf, cm, st, H, W, p),
                     static_argnames=("cf",))
        st = RenderState.create(H, W)
        rad, nb = f(scene, cfg, camera, st, jnp.uint32(0))
        sync(_one_leaf(rad))
        st = st.rotate_reservoirs(nb)
        t0 = time.perf_counter()
        for p in range(1, frames + 1):
            rad, nb = f(scene, cfg, camera, st, jnp.uint32(p))
            st = st.rotate_reservoirs(nb)
        sync(_one_leaf(rad))
        return (time.perf_counter() - t0) / frames

    split_ms = _chain_ms(
        lambda sc, cf, cm, st, h, w, p: restir_ops.render_sample_fast(
            sc, cf, cm, st, h, w, p))

    s2, cam2, cfg2 = restir_stress()
    stress_ms, _ = _renderer_ms(s2, cam2, cfg2, iters=10)

    # differentiable ReSTIR: fwd+bwd through the FUSED kernel + its
    # Pallas adjoint (round 5, VERDICT r4 next #1 — production training
    # path), with the XLA-wavefront route timed alongside as its A/B
    # baseline
    st_g = RenderState.create(H, W)

    def _grad_ms(render_fn, iters=5):
        def loss(emission, pass_idx):
            s = scene.replace(emission=emission)
            rad, _ = render_fn(s, cfg, camera, st_g, H, W, pass_idx)
            return jnp.sum(rad)

        gstep = _jax.jit(_jax.grad(loss))
        t0 = time.perf_counter()
        sync(_one_leaf(gstep(scene.emission, jnp.uint32(0))))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = None
        for p in range(iters):
            out = gstep(scene.emission, jnp.uint32(p))
        sync(_one_leaf(out))
        return (time.perf_counter() - t0) / iters, compile_s

    fwd_bwd_ms, fb_compile = _grad_ms(restir_ops.render_sample_fused)
    fwd_bwd_xla_ms, _ = _grad_ms(restir_ops.render_sample)
    return (ms, compile_s, split_ms, stress_ms, fwd_bwd_ms,
            fwd_bwd_xla_ms, fb_compile)


def bench_animated_restir():
    """Real-time frame budget (VERDICT r2 next #5): animated_restir at
    512² under ANIMATED_CONFIG vs the reference's ~16 ms animation gate
    (index.js:996)."""
    from raytracer0_tpu.models.presets import animated_restir

    scene, camera, cfg = animated_restir()
    ms, compile_s = _renderer_ms(scene, camera, cfg,
                                 time_fn=lambda i: 0.033 * i)
    return ms, compile_s


def bench_deferred_textures():
    """Deferred image-texture and photographic-cubemap fast paths
    (VERDICT r2 next #3): ms/pass at 512², plus the XLA-wavefront route
    on the same scenes as the in-JSON baseline the split kernels are
    measured against (VERDICT r3 weak #2 — the ~20x claim must be
    bench-verifiable, not a commit-message artifact)."""
    from raytracer0_tpu.models.presets import (cubemap_demo,
                                               textured_cornell,
                                               textured_gloss)

    s, cam, cfg = textured_cornell()
    tex_ms, _ = _renderer_ms(s, cam, cfg, iters=10)
    tex_xla_ms, _ = _renderer_ms(s, cam, cfg.replace(use_megakernel=False),
                                 iters=3)
    s2, cam2, cfg2 = cubemap_demo()
    env_ms, _ = _renderer_ms(s2, cam2, cfg2, iters=10)
    env_xla_ms, _ = _renderer_ms(s2, cam2,
                                 cfg2.replace(use_megakernel=False), iters=3)
    # gloss-coupled rows (round 5): suffix-resume split vs the XLA route
    # that served these scenes through round 4 (VERDICT r4 missing #1)
    s3, cam3, cfg3 = textured_gloss()
    gloss_ms, _ = _renderer_ms(s3, cam3, cfg3, iters=10)
    gloss_xla_ms, _ = _renderer_ms(s3, cam3,
                                   cfg3.replace(use_megakernel=False),
                                   iters=3)
    return tex_ms, env_ms, tex_xla_ms, env_xla_ms, gloss_ms, gloss_xla_ms


def bench_adjoint_sweep():
    """Fresh adjoint sweep (VERDICT r3 weak #3 / next #5): the shipped
    whole-graph-vjp megakernel adjoint at bounces {2, 6, 12} — fwd and
    fwd+bwd ms measured by THIS run (the round-2 alternative
    implementations lost their A/Bs and were deleted; their numbers live
    in experiments/README.md, not here)."""
    from raytracer0_tpu.models.presets import cornell_default
    from raytracer0_tpu.render.renderer import sample_radiance

    out = {}
    for b in (2, 6, 12):
        scene, camera, cfg = cornell_default(use_mis=True)
        cfg = cfg.replace(max_bounces=b)

        def loss_fn(color, emission, pass_idx, cfg=cfg, scene=scene,
                    camera=camera):
            s = scene.replace(color=color, emission=emission)
            return jnp.sum(sample_radiance(s, cfg, camera, H, W, pass_idx))

        step = jax.jit(jax.grad(loss_fn, argnums=(0, 1)))
        a = (scene.color, scene.emission)
        dt, _ = _timeit(step, *[a + (i,) for i in range(WARMUP + ITERS)])
        fwd = jax.jit(
            lambda p, scene=scene, cfg=cfg, camera=camera: sample_radiance(
                scene, cfg, camera, H, W, p))
        dt_f, _ = _timeit(fwd, *[(i,) for i in range(WARMUP + ITERS)])
        out[f"bounces_{b}"] = {
            "fwd_ms": round(dt_f * 1e3, 2),
            "fwd_bwd_ms": round(dt * 1e3, 2),
            "bwd_over_fwd": round(dt / dt_f, 2),
        }
    return out


def bench_config5():
    """Spectral + volumetrics (BASELINE config 5): ms/pass."""
    from raytracer0_tpu.models.presets import spectral_caustics
    from raytracer0_tpu.render.renderer import Renderer
    from raytracer0_tpu.utils.profiling import sync

    scene, camera, cfg = spectral_caustics()
    r = Renderer(scene, camera, cfg, H, W)
    t0 = time.perf_counter()
    sync(r.step().passes)
    compile_s = time.perf_counter() - t0
    sync(r.step().passes)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        r.step()
    sync(r.state.passes)
    return (time.perf_counter() - t0) / ITERS, compile_s


def main():
    dt, dt_fwd, compile_s, sol, cfg = bench_cornell()
    (restir_ms, restir_compile, restir_split_ms, stress_ms,
     restir_fwd_bwd_ms, restir_fwd_bwd_xla_ms,
     restir_fwd_bwd_compile) = bench_restir()
    anim_ms, anim_compile = bench_animated_restir()
    (tex_ms, env_ms, tex_xla_ms, env_xla_ms, gloss_ms,
     gloss_xla_ms) = bench_deferred_textures()
    c5_ms, c5_compile = bench_config5()
    adjoint_sweep = bench_adjoint_sweep()

    rays = H * W * cfg.max_bounces  # 1 spp
    value = rays / dt
    sol = dict(sol or {})
    sol["bwd_over_fwd"] = round(dt / dt_fwd, 2)
    # Fresh per-bounce sweep of the shipped whole-graph-vjp adjoint
    # (VERDICT r3 weak #3: no more stamped round-2 numbers — the losing
    # alternatives were deleted; their A/Bs live in experiments/README.md)
    sol["adjoint_sweep"] = adjoint_sweep
    print(json.dumps({
        "metric": "fwd+bwd rays/s/chip (cornell 1spp)",
        "value": round(value),
        "unit": "rays/s",
        "vs_baseline": round(value / BASELINE_RAYS_PER_S, 3),
        "detail": {
            "size": f"{H}x{W}",
            "bounces": cfg.max_bounces,
            "fwd_bwd_ms": round(dt * 1e3, 2),
            "fwd_ms": round(dt_fwd * 1e3, 2),
            "fwd_rays_per_s": round(rays / dt_fwd),
            "compile_s": round(compile_s, 1),
            "restir_ms_per_pass": round(restir_ms * 1e3, 2),
            "restir_split_ms_per_pass": round(restir_split_ms * 1e3, 2),
            "restir_fwd_bwd_ms": round(restir_fwd_bwd_ms * 1e3, 2),
            "restir_fwd_bwd_xla_ms": round(restir_fwd_bwd_xla_ms * 1e3, 2),
            "restir_fwd_bwd_compile_s": round(restir_fwd_bwd_compile, 1),
            "restir_compile_s": round(restir_compile, 1),
            "restir_stress_ms_per_pass": round(stress_ms * 1e3, 2),
            "restir_stress_lights": 41,
            "animated_restir_ms_per_frame": round(anim_ms * 1e3, 2),
            "animated_budget_ms": 16.0,
            "imgtex_ms_per_pass": round(tex_ms * 1e3, 2),
            "imgtex_xla_ms_per_pass": round(tex_xla_ms * 1e3, 2),
            "cubemap_ms_per_pass": round(env_ms * 1e3, 2),
            "cubemap_xla_ms_per_pass": round(env_xla_ms * 1e3, 2),
            "gloss_ms_per_pass": round(gloss_ms * 1e3, 2),
            "gloss_xla_ms_per_pass": round(gloss_xla_ms * 1e3, 2),
            "config5_ms_per_pass": round(c5_ms * 1e3, 2),
            "config5_compile_s": round(c5_compile, 1),
            "sol": sol,
        },
    }))


if __name__ == "__main__":
    main()
