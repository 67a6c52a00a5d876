"""Isolate Pallas output-count overhead: plain trace (restir_slots=0)
with 48 extra outputs written ONCE after the loop (constant values)."""
import functools, os, time
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.experimental.pallas as pl
from jax.experimental.pallas import tpu as pltpu
from raytracer0_tpu.models.presets import restir_demo
from raytracer0_tpu.models import scene as scene_mod
from raytracer0_tpu.models.camera import generate_rays
from raytracer0_tpu.ops import megakernel as mk
from raytracer0_tpu.utils.profiling import sync
from raytracer0_tpu import rng

H = W = 512
ITERS = 20
scene, cam, cfg = restir_demo()
scene_f = scene_mod.animate_positions(scene, 0.0, int(cfg.render_mode))
pix = rng.pixel_ids(H, W)
ro, rd = generate_rays(cam, H, W, jnp.uint32(0), sample_idx=0)

def body(meta, cfg, nextra, ft_ref, pp_ref, ox, oy, oz, dx, dy, dz, pixr, *outs):
    sv = mk._load_scene_vals(ft_ref, len(meta[0]))
    pass_u = pp_ref[0, 0].astype(jnp.uint32)
    samp_u = pp_ref[0, 1].astype(jnp.uint32)
    acc = mk._trace_block(meta, cfg, sv, pixr[:], pass_u, samp_u,
                          (ox[:], oy[:], oz[:]), (dx[:], dy[:], dz[:]),
                          unroll=False)
    outs[0][:] = acc[0]; outs[1][:] = acc[1]; outs[2][:] = acc[2]
    for r in outs[3:]:
        r[...] = acc[0] * 0.5

def run(nextra, tag):
    meta = (scene_f.mesh_types_static, scene_f.mat_types_static,
            scene_f.lights_static, scene_f.sdf_shapes_static,
            scene_f.num_analytic, scene_f.tex_types_static,
            scene_f.opts_static, 0)
    ft = mk._scene_table(scene_f)
    grid = (H // mk.BLOCK_ROWS, W // mk.BLOCK_COLS)
    rs = mk._row_spec()
    kern = functools.partial(body, meta, cfg, nextra)
    def f(ro, rd):
        pp = jnp.asarray([[0, 0]], jnp.int32).reshape(1, 2)
        return pl.pallas_call(
            kern, grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 2 + [rs] * 7,
            out_specs=[rs] * (3 + nextra),
            out_shape=[jax.ShapeDtypeStruct((H, W), jnp.float32)] * (3 + nextra),
        )(ft, pp, ro[..., 0], ro[..., 1], ro[..., 2],
          rd[..., 0], rd[..., 1], rd[..., 2], pix)
    fj = jax.jit(f)
    t0 = time.perf_counter(); sync(fj(ro, rd)); comp = time.perf_counter() - t0
    sync(fj(ro, rd))
    t0 = time.perf_counter()
    out = None
    for _ in range(ITERS):
        out = fj(ro, rd)
    sync(out)
    print(f"{tag:34s} {(time.perf_counter()-t0)/ITERS*1e3:8.2f} ms (compile {comp:.1f}s)", flush=True)

run(0, "trace + 0 extra outputs")
run(48, "trace + 48 extra outputs (post-loop)")
