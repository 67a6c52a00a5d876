"""Multi-chip equivalence on the 8-virtual-device CPU mesh (SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp

from raytracer0_tpu.models.presets import cornell_default
from raytracer0_tpu.parallel import sharding
from raytracer0_tpu.render.renderer import sample_radiance

H, W = 16, 16


def setup():
    scene, cam, cfg = cornell_default()
    cfg = cfg.replace(max_bounces=2, use_procedural_sky=False)
    return scene, cam, cfg


def test_sharded_render_matches_single_device():
    scene, cam, cfg = setup()
    single = np.asarray(sample_radiance(scene, cfg, cam, H, W, 0))

    mesh = sharding.make_tile_mesh(8)
    assert mesh.devices.size == 8
    sharded = np.asarray(sharding.sharded_render_pass(scene, cam, cfg, mesh, H, W))
    # RNG is counter-based on absolute pixel ids -> identical rays; the only
    # difference can be float reduction order (none here: no cross-pixel math).
    np.testing.assert_allclose(sharded, single, atol=1e-6)


def test_sharded_render_various_mesh_sizes():
    scene, cam, cfg = setup()
    single = np.asarray(sample_radiance(scene, cfg, cam, H, W, 0))
    for n in (1, 2, 4):
        mesh = sharding.make_tile_mesh(n)
        out = np.asarray(sharding.sharded_render_pass(scene, cam, cfg, mesh, H, W))
        np.testing.assert_allclose(out, single, atol=1e-6)


def test_distributed_train_step():
    scene, cam, cfg = setup()
    mesh = sharding.make_tile_mesh(8)
    target = jnp.zeros((H, W, 3), jnp.float32)
    step = sharding.make_train_step(cfg, mesh, H, W)
    loss, grads = step(scene, cam, target, 0)
    loss = float(loss)
    assert np.isfinite(loss) and loss > 0.0
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
    # emission gradient on the light must be nonzero (light drives the image)
    assert np.abs(np.asarray(grads["emission"])[5]).sum() > 0.0


def test_train_step_grads_match_single_device():
    scene, cam, cfg = setup()
    target = jnp.zeros((H, W, 3), jnp.float32)

    def loss_single(emission):
        s = scene.replace(emission=emission)
        rad = sample_radiance(s, cfg, cam, H, W, 0)
        return jnp.sum((rad - target) ** 2) / (H * W * 3)

    g_single = np.asarray(jax.grad(loss_single)(scene.emission))

    mesh = sharding.make_tile_mesh(4)
    step = sharding.make_train_step(cfg, mesh, H, W)
    _, grads = step(scene, cam, target, 0)
    np.testing.assert_allclose(np.asarray(grads["emission"]), g_single,
                               rtol=1e-4, atol=1e-6)
