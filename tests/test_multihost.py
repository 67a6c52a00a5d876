"""Multi-host runtime, executed (VERDICT r1 next #2 / SURVEY §2.5 P8).

Spawns 2 OS processes ("hosts", 2 virtual CPU devices each) that
handshake via `jax.distributed.initialize` over a local TCP coordinator
and run a global 4-device tile mesh: row-sharded render, forward +
backward + cross-process `psum` gradient all-reduce, and
`process_allgather` image assembly — the pod-slice DCN pattern minus the
DCN.  Results must agree across hosts and match a single-process
4-virtual-device run of the identical computation.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _single_process_reference(n_devices=4):
    """The same computation on this process's own n-device view."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    import jax

    from raytracer0_tpu.models.presets import cornell_default
    from raytracer0_tpu.parallel import sharding

    scene, camera, cfg = cornell_default()
    cfg = cfg.replace(max_bounces=2, samples_per_pass=1)
    H, W = 16, 32
    mesh = sharding.make_tile_mesh(n_devices)
    rng = np.random.RandomState(0)
    target_full = rng.rand(H, W, 3).astype(np.float32) * 0.1
    tgt = jax.device_put(target_full, NamedSharding(mesh, P(sharding.AXIS)))
    step = sharding.make_train_step(cfg, mesh, H, W)
    loss, grads = step(scene, camera, tgt, 0)
    img = sharding.sharded_render_pass(scene, camera, cfg, mesh, H, W, 0)
    return (float(loss), np.asarray(grads["emission"]).astype(float),
            float(np.asarray(img).sum()))


@pytest.mark.slow
def test_two_process_distributed_matches_single_process(tmp_path):
    """slow: two concurrent CPU compiles of the sharded step (~2-3 min
    on this container's 2 cores)."""
    _run_multihost(tmp_path, nproc=2)


@pytest.mark.slow
def test_four_process_distributed_matches_single_process(tmp_path):
    """4 processes x 2 devices = an 8-shard global mesh (VERDICT r2 next
    #10): catches process-count assumptions in the mesh/allgather code
    (2 is a degenerate ring).  slow: four concurrent CPU compiles."""
    _run_multihost(tmp_path, nproc=4)


def _run_multihost(tmp_path, nproc):
    port = _free_port()
    coord = f"127.0.0.1:{port}"

    env = dict(os.environ)
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=2").strip()
    env["JAX_PLATFORMS"] = "cpu"
    env.setdefault("JAX_COMPILATION_CACHE_DIR",
                   os.path.join(REPO, ".jax_cache"))

    procs, outs = [], []
    for pid in range(nproc):
        out = tmp_path / f"worker{pid}.json"
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, WORKER, coord, str(nproc), str(pid), str(out)],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    logs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=600)
        logs.append(stdout.decode(errors="replace"))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-4000:]}"

    results = [json.load(open(o)) for o in outs]
    for pid, r in enumerate(results):
        assert r["process_count"] == nproc
        assert r["global_devices"] == 2 * nproc
        assert r["img_shape"] == [16, 32, 3]
    # all hosts computed (and psum-agreed on) identical results
    for r in results[1:]:
        assert results[0]["loss"] == r["loss"]
        assert results[0]["g_emission"] == r["g_emission"]
        assert results[0]["img_sum"] == r["img_sum"]

    # and they equal the single-process run on the same global mesh
    # bit-for-bit (same mesh shape, same RNG streams, same reductions)
    ref_loss, ref_g, ref_img_sum = _single_process_reference(2 * nproc)
    assert np.isclose(results[0]["loss"], ref_loss, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(results[0]["g_emission"]), ref_g, rtol=1e-6)
    assert np.isclose(results[0]["img_sum"], ref_img_sum, rtol=1e-6)
