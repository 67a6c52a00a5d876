"""Command-line interface: render / benchmark / grad-check / presets.

The framework's "UI layer" — what index.html's controls and render loop
are to the reference (SURVEY.md L5).  Examples:

    python -m raytracer0_tpu.cli render --preset cornell_default \\
        --size 512 --passes 64 --out cornell.png
    python -m raytracer0_tpu.cli render --scene-file scene.txt --mis
    python -m raytracer0_tpu.cli benchmark --size 512 --passes 8
    python -m raytracer0_tpu.cli grad-check --preset cornell_default
    python -m raytracer0_tpu.cli presets
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _build(args):
    from raytracer0_tpu.models.presets import PRESETS
    from raytracer0_tpu.models.dsl import parse_scene
    from raytracer0_tpu.models.camera import Camera
    from raytracer0_tpu.config import OFFLINE_CONFIG

    overrides = {}
    if args.mis:
        overrides["use_mis"] = True
    if args.restir:
        overrides["use_restir"] = True
    if getattr(args, "adhoc_motion", False):
        overrides["restir_adhoc_motion"] = True
    if args.spectral:
        overrides["use_spectral"] = True
    if args.volumetrics:
        overrides["use_volumetrics"] = True
    if args.bounces:
        overrides["max_bounces"] = args.bounces
    if args.spp:
        overrides["samples_per_pass"] = args.spp

    if args.scene_file:
        scene = parse_scene(open(args.scene_file).read())
        camera = Camera.make()
        cfg = OFFLINE_CONFIG.replace(**overrides)
    else:
        if args.preset not in PRESETS:
            sys.exit(f"error: unknown preset {args.preset!r}; "
                     f"available: {', '.join(PRESETS)}")
        scene, camera, cfg = PRESETS[args.preset](**overrides)

    # user image assets (index.js:257-340): --tex a.png [b.png ...] fills
    # the u_tex0..3 slots; --cubemap DIR loads right/left/top/bottom/
    # front/back faces
    if getattr(args, "tex", None):
        from raytracer0_tpu.utils.image import load_texture_stack
        import jax.numpy as jnp
        scene = scene.replace(images=jnp.asarray(load_texture_stack(args.tex)))
    if getattr(args, "cubemap", None):
        from raytracer0_tpu.utils.image import load_cubemap_dir
        import jax.numpy as jnp
        scene = scene.replace(cubemap=jnp.asarray(load_cubemap_dir(args.cubemap)),
                              cubemap_is_procedural=False)
    return scene, camera, cfg


def cmd_render(args):
    from raytracer0_tpu.render.renderer import Renderer
    from raytracer0_tpu.utils.image import write_png, write_npy
    from raytracer0_tpu.utils.profiling import RenderTimer
    import numpy as np

    scene, camera, cfg = _build(args)
    h = w = args.size

    if args.tiled:
        from raytracer0_tpu.render import tiles
        from raytracer0_tpu.ops import tonemap
        import jax.numpy as jnp
        rad = tiles.render_tiled(scene, camera, cfg, h, w, args.passes,
                                 band_rows=args.band_rows)
        img = np.asarray(tonemap.display(jnp.asarray(rad), 1.0, cfg))
    else:
        r = Renderer(scene, camera, cfg, h, w)
        if args.resume:
            from raytracer0_tpu.parallel import checkpoint
            r.state = checkpoint.load(args.resume, scene=scene, cfg=cfg)
            print(f"resumed at pass {int(r.state.passes)}", file=sys.stderr)
        timer = RenderTimer(h, w, cfg.samples_per_pass, cfg.max_bounces)
        from raytracer0_tpu.utils.profiling import sync
        # On-device frame chains (render_scan, round 5): one dispatch +
        # one barrier per chunk instead of per pass — the per-pass host
        # dispatch and state sync cost ~25 ms/leaf RTT on the tunneled
        # platform.  Checkpointing bounds the chunk so state still
        # reaches the host every `checkpoint_every` passes.
        chunk = args.checkpoint_every if args.checkpoint else args.passes
        done = 0
        # First pass via render_pass: XLA compiles the scan-wrapped
        # kernel ~2.5x slower than pass + scan sequentially (66 vs
        # 27+2 s cold at 64² — the persistent cache reuses the Mosaic
        # kernel for the scan compile).
        timer.block_passes = 1
        with timer:
            r.step(time_s=args.time)
            sync(r.state.passes)
        done += 1
        while done < args.passes:
            n = min(chunk, args.passes - done)
            timer.block_passes = n
            with timer:
                r.render_scan(n, time_s=args.time)
                sync(r.state.passes)  # one-leaf barrier = full barrier
            done += n
            if args.checkpoint:
                from raytracer0_tpu.parallel import checkpoint
                checkpoint.save(args.checkpoint, r.state, scene=scene, cfg=cfg)
        print(json.dumps(timer.report()), file=sys.stderr)
        if args.checkpoint:
            from raytracer0_tpu.parallel import checkpoint
            checkpoint.save(args.checkpoint, r.state, scene=scene, cfg=cfg)
        img = np.asarray(r.image())
        if args.debug_grid:
            from raytracer0_tpu.utils import diagnostics
            img = np.asarray(diagnostics.debug_grid(r.state, cfg,
                                                    scene.num_lights))

    if args.out.endswith(".npy"):
        write_npy(args.out, img)
    else:
        write_png(args.out, img)
    print(f"wrote {args.out}")


def cmd_benchmark(args):
    import jax
    import jax.numpy as jnp
    from raytracer0_tpu.render.renderer import sample_radiance

    scene, camera, cfg = _build(args)
    h = w = args.size

    def loss(color, emission, pos, joker, p):
        s = scene.replace(color=color, emission=emission, pos=pos, joker=joker)
        return jnp.sum(sample_radiance(s, cfg, camera, h, w, p))

    fwd = jax.jit(lambda p: sample_radiance(scene, cfg, camera, h, w, p))
    bwd = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))
    a = (scene.color, scene.emission, scene.pos, scene.joker)

    from raytracer0_tpu.utils.profiling import sync

    out = {}
    for name, fn, fargs in [("forward", fwd, lambda i: (i,)),
                            ("fwd+bwd", bwd, lambda i: a + (i,))]:
        sync(fn(*fargs(0)))
        t0 = time.perf_counter()
        for i in range(args.passes):
            r = fn(*fargs(i + 1))
        sync(r)
        dt = (time.perf_counter() - t0) / args.passes
        rays = h * w * cfg.samples_per_pass * cfg.max_bounces
        out[name] = {"ms": round(dt * 1e3, 2), "rays_per_s": round(rays / dt)}
    print(json.dumps(out))


def cmd_grad_check(args):
    """Pixel-gradient check: AD vs central differences on the CPU oracle."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from raytracer0_tpu.cpu_ref import tracer as cpu
    from raytracer0_tpu.render.renderer import sample_radiance

    scene, camera, cfg = _build(args)
    cfg = cfg.replace(max_bounces=min(cfg.max_bounces, 3))
    h = w = min(args.size, 16)

    def img_sum(emission):
        s = scene.replace(emission=emission)
        return jnp.sum(sample_radiance(s, cfg, camera, h, w, 0))

    g = np.asarray(jax.grad(img_sum)(scene.emission))
    li = int(np.asarray(scene.light_idx)[0])
    eps = 1e-2
    em = np.asarray(scene.emission)
    ep = em.copy(); ep[li] += eps
    emn = em.copy(); emn[li] -= eps
    fp = cpu.render(scene.replace(emission=jnp.asarray(ep)), camera, cfg, h, w, 1).sum()
    fm = cpu.render(scene.replace(emission=jnp.asarray(emn)), camera, cfg, h, w, 1).sum()
    fd = (fp - fm) / (2 * eps)
    ad = g[li].sum()
    rel = abs(ad - fd) / max(abs(fd), 1e-9)
    print(json.dumps({"ad": float(ad), "fd": float(fd),
                      "rel_err": round(float(rel), 5),
                      "pass": bool(rel < 0.05)}))
    sys.exit(0 if rel < 0.05 else 1)


def cmd_presets(args):
    from raytracer0_tpu.models.presets import PRESETS
    for name in PRESETS:
        print(name)


def cmd_fit(args):
    """Inverse rendering demo: perturb the light emission, recover it by
    gradient descent against the unperturbed render (optimize.fit)."""
    import numpy as np
    import jax.numpy as jnp
    from raytracer0_tpu import optimize

    scene, camera, cfg = _build(args)
    cfg = cfg.replace(max_bounces=min(cfg.max_bounces, 3))
    h = w = min(args.size, 48)
    target = optimize.render_linear(scene, cfg, camera, h, w, passes=2)

    is_light = np.asarray(scene.mat_type) == 0
    mask = jnp.asarray(is_light[:, None].astype(np.float32))
    start = scene.replace(emission=scene.emission * (1.0 + args.perturb * mask))
    fitted, losses = optimize.fit(
        start, cfg, camera, target, ("emission",), steps=args.steps,
        learning_rate=args.lr, passes=2, param_mask={"emission": mask})
    err = float(np.abs(np.asarray(fitted.emission - scene.emission)).max())
    print(json.dumps({"loss_first": losses[0], "loss_last": losses[-1],
                      "max_abs_param_err": round(err, 5),
                      "steps": args.steps}))


def main(argv=None):
    import os
    import jax
    if os.environ.get("RT0_PLATFORM"):
        # Some environments pre-import JAX with a pinned platform before
        # user code runs; this override still works because backends
        # initialize lazily.
        jax.config.update("jax_platforms", os.environ["RT0_PLATFORM"])
    # Persistent compile cache: repeat renders of the same (scene shape,
    # config) skip XLA/Mosaic compilation entirely.
    cache = os.environ.get("RT0_JAX_CACHE",
                           os.path.expanduser("~/.cache/rt0_jax"))
    if cache != "0":
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    p = argparse.ArgumentParser(prog="raytracer0_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("--preset", default="cornell_default")
        sp.add_argument("--scene-file")
        sp.add_argument("--size", type=int, default=256)
        sp.add_argument("--passes", type=int, default=8)
        sp.add_argument("--bounces", type=int)
        sp.add_argument("--spp", type=int)
        sp.add_argument("--mis", action="store_true")
        sp.add_argument("--restir", action="store_true")
        sp.add_argument("--adhoc-motion", action="store_true",
                        help="reference's ad-hoc temporal reprojection "
                             "offset instead of identity (PARITY.md #11)")
        sp.add_argument("--spectral", action="store_true")
        sp.add_argument("--volumetrics", action="store_true")
        sp.add_argument("--tex", nargs="+", metavar="PNG",
                        help="up to 4 image textures for u_tex0..3")
        sp.add_argument("--cubemap", metavar="DIR",
                        help="directory with right/left/top/bottom/front/"
                             "back.{png,jpg} cubemap faces")

    r = sub.add_parser("render")
    common(r)
    r.add_argument("--out", default="render.png")
    r.add_argument("--time", type=float, default=0.0)
    r.add_argument("--tiled", action="store_true")
    r.add_argument("--band-rows", type=int, default=256)
    r.add_argument("--checkpoint")
    r.add_argument("--checkpoint-every", type=int, default=16)
    r.add_argument("--resume")
    r.add_argument("--debug-grid", action="store_true")
    r.set_defaults(fn=cmd_render)

    b = sub.add_parser("benchmark")
    common(b)
    b.set_defaults(fn=cmd_benchmark)

    g = sub.add_parser("grad-check")
    common(g)
    g.set_defaults(fn=cmd_grad_check)

    pr = sub.add_parser("presets")
    pr.set_defaults(fn=cmd_presets)

    f = sub.add_parser("fit")
    common(f)
    f.add_argument("--steps", type=int, default=40)
    f.add_argument("--lr", type=float, default=0.08)
    f.add_argument("--perturb", type=float, default=0.5)
    f.set_defaults(fn=cmd_fit)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
