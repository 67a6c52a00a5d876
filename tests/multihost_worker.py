"""Worker process for tests/test_multihost.py.

Each OS process is one "host" of a 2-host run: it owns 2 virtual CPU
devices (XLA_FLAGS set by the spawning test), handshakes with the
coordinator via `jax.distributed.initialize`, and participates in a
global 4-device tile mesh — the exact pattern a TPU pod-slice run uses
over DCN (parallel/distributed.py), executed for real on localhost.

Writes a JSON result file; the parent test asserts cross-process
agreement and equality with the single-process reference.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    coord = sys.argv[1]
    nproc = int(sys.argv[2])
    pid = int(sys.argv[3])
    out_path = sys.argv[4]

    # The DCN handshake (parallel/distributed.initialize wraps this).
    from raytracer0_tpu.parallel import distributed

    assert distributed.initialize(coordinator_address=coord,
                                  num_processes=nproc, process_id=pid)

    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from raytracer0_tpu.models.presets import cornell_default
    from raytracer0_tpu.parallel import sharding

    info = distributed.process_info()
    assert info["process_count"] == nproc, info
    assert info["global_devices"] == info["local_devices"] * nproc, info

    scene, camera, cfg = cornell_default()
    cfg = cfg.replace(max_bounces=2, samples_per_pass=1)
    H, W = 16, 32

    mesh = sharding.make_tile_mesh()  # global: spans both processes

    # Replicated inputs must be global jax.Arrays in multi-controller mode.
    from jax.experimental import multihost_utils

    scene_g, camera_g = multihost_utils.host_local_array_to_global_array(
        (scene, camera), mesh, P())

    # Target rows: every process holds the full host value; the global
    # array takes each shard from the owning process's copy.
    rng = np.random.RandomState(0)
    target_full = rng.rand(H, W, 3).astype(np.float32) * 0.1
    tgt = jax.make_array_from_callback(
        (H, W, 3), NamedSharding(mesh, P(sharding.AXIS)),
        lambda idx: target_full[idx])

    # Forward + backward + cross-process psum (the DCN all-reduce).
    step = sharding.make_train_step(cfg, mesh, H, W)
    loss, grads = step(scene_g, camera_g, tgt, 0)

    # Row-sharded forward render + image assembly on every host.
    img = sharding.sharded_render_pass(scene_g, camera_g, cfg, mesh, H, W, 0)
    full = distributed.gather_image(img)

    result = dict(
        process_index=info["process_index"],
        process_count=info["process_count"],
        local_devices=info["local_devices"],
        global_devices=info["global_devices"],
        loss=float(loss),
        g_emission=np.asarray(grads["emission"]).astype(float).tolist(),
        img_shape=list(np.asarray(full).shape),
        img_sum=float(np.asarray(full).sum()),
    )
    with open(out_path, "w") as f:
        json.dump(result, f)


if __name__ == "__main__":
    main()
