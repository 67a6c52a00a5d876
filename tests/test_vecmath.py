import numpy as np
import jax
import jax.numpy as jnp

from raytracer0_tpu.ops import vecmath as vm


def rand_vecs(n, seed=0):
    r = np.random.default_rng(seed)
    return jnp.asarray(r.normal(size=(n, 3)).astype(np.float32))


def test_normalize_and_length():
    v = rand_vecs(128)
    n = vm.normalize(v)
    np.testing.assert_allclose(np.asarray(vm.length(n)), 1.0, atol=1e-5)
    # zero vector stays finite
    z = vm.normalize(jnp.zeros((4, 3)))
    assert np.all(np.isfinite(np.asarray(z)))


def test_reflect():
    d = vm.normalize(jnp.asarray([[1.0, -1.0, 0.0]]))
    n = jnp.asarray([[0.0, 1.0, 0.0]])
    r = vm.reflect(d, n)
    np.testing.assert_allclose(np.asarray(r), [[2**-0.5, 2**-0.5, 0.0]], atol=1e-6)


def test_refract_matches_snell():
    d = vm.normalize(jnp.asarray([[1.0, -1.0, 0.0]]))
    n = jnp.asarray([[0.0, 1.0, 0.0]])
    eta = jnp.asarray([1.0 / 1.5])
    t, tir = vm.refract(d, n, eta)
    assert not bool(tir[0])
    t = np.asarray(t)[0]
    # Snell: sin(theta_t) = eta * sin(theta_i)
    sin_i = 2**-0.5
    np.testing.assert_allclose(t[0], float(eta[0]) * sin_i, atol=1e-6)
    np.testing.assert_allclose(np.linalg.norm(t), 1.0, atol=1e-6)


def test_refract_tir():
    # From dense to thin medium at a grazing angle -> TIR
    d = vm.normalize(jnp.asarray([[1.0, -0.1, 0.0]]))
    n = jnp.asarray([[0.0, 1.0, 0.0]])
    t, tir = vm.refract(d, n, jnp.asarray([1.5]))
    assert bool(tir[0])
    np.testing.assert_array_equal(np.asarray(t), 0.0)


def test_onb_orthonormal():
    n = vm.normalize(rand_vecs(256, seed=3))
    # include the degenerate poles
    n = jnp.concatenate([n, jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, -1.0]])])
    u, v = vm.onb(n)
    for a, b in [(u, v), (u, n), (v, n)]:
        np.testing.assert_allclose(np.asarray(vm.vdot(a, b)), 0.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(vm.length(u)), 1.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(vm.length(v)), 1.0, atol=1e-4)


def test_grads_finite():
    def f(v):
        n = vm.normalize(v)
        u, w = vm.onb(n)
        return jnp.sum(u * w) + jnp.sum(vm.safe_length(v))

    g = jax.grad(f)(jnp.asarray([1e-8, 0.0, 1e-9]))
    assert np.all(np.isfinite(np.asarray(g)))
