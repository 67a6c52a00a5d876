"""Display transform: exposure scaling + selectable tone operator + gamma.

The reference's shipped display is `pow(accum * u_cont, 1/2.2)`
(tonemapper.glsl:30-32) with `u_cont = 1/passes` (index.js:1089, or 1.0
in animated mode, index.js:1083).  An ACESFilm curve is defined but dead
(tonemapper.glsl:17-26) and the README names Reinhard; all three are
selectable here via `RenderConfig.tonemap` (see SURVEY.md K11).
"""

from __future__ import annotations

import jax.numpy as jnp

from raytracer0_tpu.config import RenderConfig, TonemapOp


def reinhard(x):
    return x / (1.0 + x)


def aces_film(x):
    """Narkowicz ACES filmic fit (tonemapper.glsl:17-26)."""
    a, b, c, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
    return jnp.clip((x * (a * x + b)) / (x * (c * x + d) + e), 0.0, 1.0)


def display(accum, cont, cfg: RenderConfig):
    """Map an accumulated HDR buffer to display-referred sRGB in [0, 1].

    `accum`: f32[..., 3] accumulated radiance sum; `cont`: contribution
    scale (1/passes for static accumulation, 1.0 for animated EMA).
    """
    col = jnp.maximum(accum * cont, 0.0)
    if cfg.tonemap == TonemapOp.REINHARD:
        col = reinhard(col)
    elif cfg.tonemap == TonemapOp.ACES:
        col = aces_film(col)
    return jnp.clip(jnp.power(jnp.maximum(col, 1e-12), 1.0 / cfg.gamma), 0.0, 1.0)
