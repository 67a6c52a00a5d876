"""Inverse rendering (optimize.fit): gradient descent on scene params
must actually recover perturbed values against a rendered target."""

import numpy as np
import jax.numpy as jnp

from raytracer0_tpu.models.presets import cornell_default
from raytracer0_tpu import optimize


def test_fit_recovers_light_emission():
    """Perturb the light's emission, fit it back to the target render:
    the loss must drop by >10x and the recovered emission land within
    10% of the truth (masked update — only light rows move)."""
    scene, cam, cfg = cornell_default()
    cfg = cfg.replace(max_bounces=2, samples_per_pass=1)
    H = W = 24

    target = optimize.render_linear(scene, cfg, cam, H, W, passes=2)

    is_light = np.asarray(scene.mat_type) == 0  # MatType.LIGHT
    mask = jnp.asarray(is_light[:, None].astype(np.float32))
    true_em = np.asarray(scene.emission).copy()

    start = scene.replace(emission=scene.emission * (1.0 + 0.6 * mask))
    fitted, losses = optimize.fit(
        start, cfg, cam, target, ("emission",), steps=60,
        learning_rate=0.08, passes=2, param_mask={"emission": mask})

    assert losses[-1] < losses[0] / 10.0, (losses[0], losses[-1])
    got = np.asarray(fitted.emission)[is_light]
    want = true_em[is_light]
    np.testing.assert_allclose(got, want, rtol=0.10)
    # frozen rows untouched
    np.testing.assert_array_equal(np.asarray(fitted.emission)[~is_light],
                                  true_em[~is_light])
