"""Spectral transport + participating media (BASELINE config 5)."""

import numpy as np
import jax.numpy as jnp

from raytracer0_tpu.cpu_ref import tracer as cpu
from raytracer0_tpu.models.presets import spectral_caustics
from raytracer0_tpu.ops import spectral
from raytracer0_tpu.render.renderer import Renderer


def test_cmf_peaks():
    lams = jnp.linspace(380.0, 720.0, 341)
    x = np.asarray(spectral.cmf_x(lams))
    y = np.asarray(spectral.cmf_y(lams))
    z = np.asarray(spectral.cmf_z(lams))
    # CIE 1931 peaks: x-bar ~599 nm (main lobe), y-bar ~555 nm, z-bar ~449 nm
    assert abs(float(lams[x.argmax()]) - 599.0) < 6.0
    assert abs(float(lams[y.argmax()]) - 555.0) < 8.0
    assert abs(float(lams[z.argmax()]) - 449.0) < 10.0
    assert x.min() > -0.1 and y.min() >= 0.0


def test_wavelength_to_rgb_roughly_white_balanced():
    """The reference's 0.378/0.298/0.285 normalizers (raytracer.glsl:352)
    keep the hero-wavelength average loosely white: channels within ~25 %
    of each other (exact whiteness is not a property of the reference
    constants either — its average is (1.37, 1.14, 1.13))."""
    lams = jnp.linspace(380.0, 720.0, 1000)
    rgb = np.asarray(spectral.wavelength_to_rgb(lams)).mean(axis=0)
    assert np.all(rgb > 0.8) and np.all(rgb < 1.6)
    assert rgb.max() / rgb.min() < 1.3


def test_cauchy_dispersion():
    n_blue = float(spectral.cauchy_ior(420.0, 1.7167))
    n_red = float(spectral.cauchy_ior(680.0, 1.7167))
    assert n_blue > n_red  # normal dispersion
    assert 0.1 < n_blue - n_red < 0.25  # Δn ≈ 0.19 per the comment


def test_spectral_matches_cpu_ref():
    scene, cam, cfg = spectral_caustics()
    cfg = cfg.replace(max_bounces=3, use_volumetrics=False)
    H = W = 12
    r = Renderer(scene, cam, cfg, H, W)
    r.step(); r.step()
    dev = np.asarray(r.state.accum) / 2
    ref = cpu.render(scene, cam, cfg, H, W, 2)
    err = np.abs(dev - ref).max(axis=-1)
    assert np.median(err) < 2e-3
    assert (err < 5e-2).mean() > 0.95
    assert dev.mean() > 0.005


def test_volumetrics_matches_cpu_ref():
    scene, cam, cfg = spectral_caustics()
    cfg = cfg.replace(max_bounces=3, use_spectral=False)
    H = W = 12
    r = Renderer(scene, cam, cfg, H, W)
    r.step(); r.step()
    dev = np.asarray(r.state.accum) / 2
    ref = cpu.render(scene, cam, cfg, H, W, 2)
    err = np.abs(dev - ref).max(axis=-1)
    assert np.median(err) < 2e-3
    assert (err < 5e-2).mean() > 0.92
    assert dev.mean() > 0.005


def test_full_config5_spectral_and_media():
    """vol_cornell_spectral: both features together, device vs CPU."""
    scene, cam, cfg = spectral_caustics()
    cfg = cfg.replace(max_bounces=4)
    H = W = 12
    r = Renderer(scene, cam, cfg, H, W)
    r.step()
    dev = np.asarray(r.state.accum)
    ref = cpu.render(scene, cam, cfg, H, W, 1)
    err = np.abs(dev - ref).max(axis=-1)
    assert np.median(err) < 5e-3
    assert (err < 0.1).mean() > 0.9
    assert np.isfinite(dev).all()
