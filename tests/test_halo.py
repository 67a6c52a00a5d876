"""Halo exchange: sharded ReSTIR must match the single-device render
exactly (taps never exceed the 16-row halo; RNG is global-coordinate)."""

import numpy as np
import jax
import jax.numpy as jnp

from raytracer0_tpu.models.presets import restir_demo
from raytracer0_tpu.ops import restir as restir_ops
from raytracer0_tpu.parallel import halo, sharding
from raytracer0_tpu.render.state import RenderState


def test_exchange_halo_rows_layout():
    mesh = sharding.make_tile_mesh(4)
    x = jnp.arange(32.0).reshape(32, 1)  # 8 rows per shard

    import functools
    from jax.sharding import PartitionSpec as P

    @functools.partial(jax.shard_map, mesh=mesh, in_specs=P(sharding.AXIS),
                       out_specs=P(sharding.AXIS), check_vma=False)
    def pad(x):
        return halo.exchange_halo_rows(x, 2)[None]  # [1, 12, 1] per shard

    out = np.asarray(pad(x))  # [4, 12, 1]
    # shard 1 owns rows 8..15; its padded band = rows 6..17
    np.testing.assert_array_equal(out[1, :, 0],
                                  np.arange(6, 18, dtype=np.float32))
    # shard 0's top halo is zeros (no neighbor above)
    np.testing.assert_array_equal(out[0, :2, 0], [0.0, 0.0])
    np.testing.assert_array_equal(out[0, 2:, 0], np.arange(0, 10, dtype=np.float32))
    # shard 3's bottom halo is zeros
    np.testing.assert_array_equal(out[3, -2:, 0], [0.0, 0.0])


def test_sharded_restir_matches_single_device():
    scene, cam, cfg = restir_demo()
    cfg = cfg.replace(max_bounces=2, restir_samples=4, marching_steps=16)
    H, W = 64, 32

    state = RenderState.create(H, W)
    # two frames to populate back + hist1 so all phases engage
    for p in range(2):
        rad_s, back_s = restir_ops.render_sample(scene, cfg, cam, state, H, W, p)
        state = state.rotate_reservoirs(back_s)

    mesh = sharding.make_tile_mesh(2)
    state_m = RenderState.create(H, W)
    for p in range(2):
        rad_m, back_m = halo.sharded_restir_render_pass(
            scene, cam, cfg, mesh, state_m, H, W, p)
        state_m = state_m.rotate_reservoirs(back_m)

    np.testing.assert_allclose(np.asarray(rad_m), np.asarray(rad_s), atol=1e-5)
    np.testing.assert_allclose(np.asarray(state_m.restir_back.m),
                               np.asarray(state.restir_back.m), atol=1e-5)
    np.testing.assert_allclose(np.asarray(state_m.restir_back.w),
                               np.asarray(state.restir_back.w), atol=1e-4)
