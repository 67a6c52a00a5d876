"""ReSTIR diagnostic views — the reference's 3x3 debug grid (K12).

`debug_display.glsl` (612 LoC) is effectively the reference's test
harness: nine panels visualizing reservoir health.  This module produces
the same panels as [H, W, 3] arrays from a `RenderState`, assembled into
one 3x3 grid image (reference panels at debug_display.glsl:86-613):

  0 main render              1 ReSTIR effectiveness   2 temporal benefit
  3 M evolution (t-2/t-1/t)  4 reservoir age          5 light diversity
  6 spatial coherence        7 W (contribution wt)    8 frame stability
"""

from __future__ import annotations

import jax.numpy as jnp

from raytracer0_tpu.config import RenderConfig
from raytracer0_tpu.ops import tonemap
from raytracer0_tpu.ops import vecmath as vm
from raytracer0_tpu.render.state import RenderState

_MAX_AGE = 30.0


def _gray(x):
    return jnp.repeat(jnp.clip(x, 0.0, 1.0)[..., None], 3, axis=-1)


def _heat(x):
    """Blue→green→red heat map of x in [0,1] (the grid's quality ramps)."""
    x = jnp.clip(x, 0.0, 1.0)
    r = jnp.clip(2.0 * x - 1.0, 0.0, 1.0)
    g = 1.0 - jnp.abs(2.0 * x - 1.0)
    b = jnp.clip(1.0 - 2.0 * x, 0.0, 1.0)
    return jnp.stack([r, g, b], axis=-1)


def panel_main(state: RenderState, cfg: RenderConfig):
    from raytracer0_tpu.render.renderer import display_image
    return display_image(state, cfg)


def panel_effectiveness(state: RenderState):
    """Reservoir quality: W x normalized M (debug grid panel 2)."""
    r = state.restir_back
    return _heat((r.w / 12.0) * jnp.clip(r.m / 40.0, 0.0, 1.0))


def panel_temporal_benefit(state: RenderState):
    """How much history contributes: M growth vs the candidate-only M."""
    m_now = state.restir_back.m
    m_prev = state.restir_hist1.m
    gain = jnp.where(m_prev > 0, jnp.clip((m_now - m_prev) / 40.0 + 0.5, 0, 1),
                     0.0)
    return _heat(gain)


def panel_m_evolution(state: RenderState):
    """RGB = M at t-2 / t-1 / t (debug_display.glsl:524-580)."""
    return jnp.stack([
        jnp.clip(state.restir_hist2.m / 40.0, 0, 1),
        jnp.clip(state.restir_hist1.m / 40.0, 0, 1),
        jnp.clip(state.restir_back.m / 40.0, 0, 1),
    ], axis=-1)


def panel_age(state: RenderState):
    return _gray(state.restir_back.age / _MAX_AGE)


def panel_light_diversity(state: RenderState, num_lights: int):
    """Selected light index as hue-ish coloring (panel 6)."""
    idx = state.restir_back.light_index.astype(jnp.float32)
    t = jnp.where(idx >= 0, (idx + 1.0) / max(num_lights, 1), 0.0)
    return _heat(t)


def panel_spatial_coherence(state: RenderState):
    """4-neighborhood quality ratio (debug_display.glsl:432-485)."""
    w = state.restir_back.w
    neigh = (jnp.roll(w, 1, 0) + jnp.roll(w, -1, 0)
             + jnp.roll(w, 1, 1) + jnp.roll(w, -1, 1)) / 4.0
    ratio = jnp.where(neigh > 1e-4, jnp.clip(w / jnp.maximum(neigh, 1e-4), 0, 2) / 2.0,
                      0.0)
    return _heat(ratio)


def panel_w(state: RenderState):
    return _gray(state.restir_back.w / 12.0)


def panel_stability(state: RenderState):
    """Frame-to-frame W stability (panel 9)."""
    dw = jnp.abs(state.restir_back.w - state.restir_hist1.w)
    return _heat(1.0 - jnp.clip(dw / 6.0, 0, 1))


def debug_grid(state: RenderState, cfg: RenderConfig, num_lights: int):
    """Assemble the 3x3 grid: returns [3H, 3W, 3]."""
    panels = [
        panel_main(state, cfg), panel_effectiveness(state),
        panel_temporal_benefit(state),
        panel_m_evolution(state), panel_age(state),
        panel_light_diversity(state, num_lights),
        panel_spatial_coherence(state), panel_w(state), panel_stability(state),
    ]
    rows = [jnp.concatenate(panels[i * 3:(i + 1) * 3], axis=1) for i in range(3)]
    return jnp.concatenate(rows, axis=0)
