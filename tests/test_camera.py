import numpy as np
import jax.numpy as jnp

from raytracer0_tpu.models.camera import Camera, generate_rays, tent_jitter


def test_ray_shapes_and_norm():
    cam = Camera.make()
    o, d = generate_rays(cam, 32, 48, pass_idx=0)
    assert o.shape == (32, 48, 3) and d.shape == (32, 48, 3)
    np.testing.assert_allclose(np.asarray(jnp.linalg.norm(d, axis=-1)), 1.0, atol=1e-5)
    # pinhole: all origins equal camera origin
    np.testing.assert_allclose(
        np.asarray(o), np.broadcast_to(np.asarray(cam.origin), o.shape), atol=1e-6
    )


def test_center_ray_points_forward():
    cam = Camera.make(origin=(0, 0, 2.8), lookat=(0, 0, -1.0), fov=50.0)
    o, d = generate_rays(cam, 65, 65, pass_idx=0)
    center = np.asarray(d)[32, 32]
    assert center[2] < -0.99  # looking down -z (within AA jitter)


def test_fov_extent():
    cam = Camera.make(lookat=(0, 0, -1.0), fov=90.0)
    o, d = generate_rays(cam, 256, 256, pass_idx=0)
    d = np.asarray(d)
    # At fov=90 the top edge ray should be ~45 degrees off axis.
    top = d[-1, 128]
    angle = np.degrees(np.arctan2(abs(top[1]), abs(top[2])))
    assert abs(angle - 45.0) < 1.5


def test_aperture_spreads_origins():
    cam = Camera.make(aperture=0.2)
    o, _ = generate_rays(cam, 64, 64, pass_idx=0)
    spread = np.asarray(o).reshape(-1, 3).std(axis=0)
    assert spread[0] > 1e-3 and spread[1] > 1e-3


def test_tent_jitter_distribution():
    r = jnp.linspace(0.001, 0.999, 10001)
    t = np.asarray(tent_jitter(r))
    assert t.min() >= -1.0 and t.max() <= 1.0
    assert abs(t.mean()) < 5e-3  # symmetric around 0


def test_y_up_convention():
    cam = Camera.make(lookat=(0, 0, -1.0), fov=60.0)
    _, d = generate_rays(cam, 64, 64, pass_idx=0)
    d = np.asarray(d)
    # row 0 is the image bottom (gl_FragCoord convention): rays point down.
    assert d[0, 32, 1] < 0 and d[-1, 32, 1] > 0
