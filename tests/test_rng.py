"""RNG: determinism, uniformity, and exact CPU (numpy) / JAX agreement."""

import numpy as np
import jax.numpy as jnp

from raytracer0_tpu import rng


def test_uniform_range_and_determinism():
    pix = rng.pixel_ids(16, 16)
    u1 = np.asarray(rng.uniform(pix, 3, 0, rng.Stream.AA))
    u2 = np.asarray(rng.uniform(pix, 3, 0, rng.Stream.AA))
    assert u1.shape == (16, 16)
    assert np.all(u1 >= 0.0) and np.all(u1 < 1.0)
    np.testing.assert_array_equal(u1, u2)


def test_streams_decorrelated():
    pix = rng.pixel_ids(64, 64)
    a = np.asarray(rng.uniform(pix, 0, 0, rng.Stream.AA))
    b = np.asarray(rng.uniform(pix, 0, 0, rng.Stream.BSDF_DIR))
    assert abs(np.corrcoef(a.ravel(), b.ravel())[0, 1]) < 0.05
    assert not np.allclose(a, b)


def test_uniformity():
    pix = rng.pixel_ids(128, 128)
    u = np.asarray(rng.uniform(pix, 1, 0, rng.Stream.BSDF_DIR))
    hist, _ = np.histogram(u, bins=16, range=(0, 1))
    expect = u.size / 16
    assert np.all(np.abs(hist - expect) < 6 * np.sqrt(expect))


def test_numpy_jax_bit_identical():
    """The CPU reference must draw the *same* numbers as the device path."""
    pix_np = rng.pixel_ids(32, 32, xp=np)
    pix_j = rng.pixel_ids(32, 32, xp=jnp)
    for stream in (rng.Stream.AA, rng.Stream.NEE_CONE, rng.Stream.VOL_FREEPATH):
        a = rng.uniform(pix_np, 7, 2, stream, xp=np)
        b = np.asarray(rng.uniform(pix_j, 7, 2, stream, xp=jnp))
        np.testing.assert_array_equal(a, b)
    a2 = rng.uniform2(pix_np, 0, 0, rng.Stream.APERTURE, xp=np)
    b2 = rng.uniform2(pix_j, 0, 0, rng.Stream.APERTURE, xp=jnp)
    np.testing.assert_array_equal(a2[0], np.asarray(b2[0]))
    np.testing.assert_array_equal(a2[1], np.asarray(b2[1]))


def test_pass_decorrelation():
    pix = rng.pixel_ids(64, 64)
    a = np.asarray(rng.uniform(pix, 0, 0, rng.Stream.AA))
    b = np.asarray(rng.uniform(pix, 1, 0, rng.Stream.AA))
    assert abs(np.corrcoef(a.ravel(), b.ravel())[0, 1]) < 0.05


def test_noise_lut_deterministic():
    l1 = rng.noise_lut()
    l2 = rng.noise_lut()
    assert l1.shape == (256, 256, 4)
    np.testing.assert_array_equal(l1, l2)
    assert l1.std() > 0.2  # actually noisy
