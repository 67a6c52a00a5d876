"""Scaling-efficiency report: the sharded render at mesh sizes 1-8.

Runs the identical total workload (a fixed HxW Cornell render + the
fwd+bwd+psum train step) over tile meshes of 1, 2, 4 and 8 devices and
prints a wall-clock table with parallel efficiency t1 / (n * tn) ... on
whatever platform is active.

On real multi-chip hardware this measures ICI scaling (BASELINE.md's
>=80 % north star).  On this CI container there is ONE TPU chip, so the
table is produced on the 8-virtual-device CPU mesh
(--xla_force_host_platform_device_count=8): it validates that the
sharded program — shard_map, replicated scene, psum gradient reduction,
row-sharded outputs — runs at every mesh size with the same numerical
result, and measures the *structural* overhead of sharding.  CAVEAT: the
host has 2 physical cores, so virtual-device wall-clock CANNOT show
linear speedup; treat efficiency numbers here as a lower bound on
program-structure quality, not as chip-scaling evidence (that requires a
pod slice; see tests/test_multihost.py for the executed multi-process
protocol).
"""

import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402


def main():
    if len(jax.devices()) < 8:
        # single-chip TPU (or plain CPU): force the virtual CPU mesh
        # (clear first — the boot hook already initialized a backend)
        import jax.extend.backend as jeb

        jeb.clear_backends()
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 8)

    from jax.sharding import NamedSharding, PartitionSpec as P

    from raytracer0_tpu.models.presets import cornell_default
    from raytracer0_tpu.parallel import sharding
    from raytracer0_tpu.utils.profiling import sync

    scene, camera, cfg = cornell_default(use_mis=True)
    cfg = cfg.replace(max_bounces=4)
    H, W = 64, 64
    rng = np.random.RandomState(0)
    target = rng.rand(H, W, 3).astype(np.float32) * 0.1

    rows = []
    base = None
    ref_loss = None
    for n in (1, 2, 4, 8):
        mesh = sharding.make_tile_mesh(n)
        tgt = jax.device_put(target, NamedSharding(mesh, P(sharding.AXIS)))
        step = sharding.make_train_step(cfg, mesh, H, W)
        loss, grads = step(scene, camera, tgt, 0)
        sync((loss, grads))
        t0 = time.perf_counter()
        iters = 5
        for i in range(iters):
            loss, grads = step(scene, camera, tgt, i + 1)
        sync((loss, grads))
        dt = (time.perf_counter() - t0) / iters
        if base is None:
            base = dt
            ref_loss = float(loss)
        eff = base / (dt * 1.0)  # same total work: ideal is tn == t1
        rows.append(dict(devices=n, ms_per_step=round(dt * 1e3, 1),
                         efficiency_vs_1dev=round(eff, 3),
                         loss=float(loss)))
        assert abs(float(loss) - ref_loss) < 1e-6 * max(abs(ref_loss), 1e-9), \
            "sharded result diverged from 1-device result"

    print(json.dumps({
        "workload": f"cornell {H}x{W} fwd+bwd+psum, fixed total work",
        "platform": jax.devices()[0].platform,
        "physical_cores_caveat": "2-core host; see module docstring",
        "rows": rows,
    }, indent=2))


if __name__ == "__main__":
    main()
