"""Native C++ oracle vs Python oracle vs device integrator."""

import numpy as np
import pytest

from raytracer0_tpu.cpu_ref import native
from raytracer0_tpu.cpu_ref import tracer as cpu
from raytracer0_tpu.models.presets import cornell_default, spectral_caustics
from raytracer0_tpu.render.renderer import Renderer

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def test_native_matches_python_oracle():
    scene, cam, cfg = cornell_default(use_mis=True)
    cfg = cfg.replace(max_bounces=3)
    img_n = native.render(scene, cam, cfg, 16, 16, 2)
    img_p = cpu.render(scene, cam, cfg, 16, 16, 2)
    err = np.abs(img_n - img_p).max(axis=-1)
    # same paths, float32 vs float64-promoted scalars
    assert np.median(err) < 1e-5
    assert (err < 2e-3).mean() > 0.99


def test_native_matches_device():
    scene, cam, cfg = cornell_default()
    cfg = cfg.replace(max_bounces=2, use_procedural_sky=False)
    H = W = 24
    r = Renderer(scene, cam, cfg, H, W)
    r.step(); r.step()
    dev = np.asarray(r.state.accum) / 2
    ref = native.render(scene, cam, cfg, H, W, 2)
    err = np.abs(dev - ref).max(axis=-1)
    assert np.median(err) < 1e-4
    assert (err < 2e-3).mean() > 0.99


def test_native_spectral_volumetrics():
    scene, cam, cfg = spectral_caustics()
    cfg = cfg.replace(max_bounces=3)
    H = W = 12
    r = Renderer(scene, cam, cfg, H, W)
    r.step()
    dev = np.asarray(r.state.accum)
    ref = native.render(scene, cam, cfg, H, W, 1)
    err = np.abs(dev - ref).max(axis=-1)
    assert np.median(err) < 5e-3
    assert (err < 0.1).mean() > 0.9
