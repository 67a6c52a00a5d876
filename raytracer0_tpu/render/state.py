"""Render state pytrees: progressive accumulator + ReSTIR reservoir rings.

The reference's state lives in 12+ RGBA32F textures ping-ponged by hand
(index.js:125-221, 795-820, 1100-1104).  Here it is one explicit pytree
threaded functionally through the frame loop — the accumulation buffer is
a sharded device array, the reservoir history a 3-deep ring of unpacked
SoA fields (no lossy alpha-packing; see SURVEY.md §2.4 / §7.0), and all of
it is differentiable carried state.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class Reservoirs:
    """Per-pixel ReSTIR reservoir SoA (reference struct at
    raytracer.glsl:1275-1283, texture packing at 1417-1468 — unpacked
    here because TPU arrays have no 4-channel constraint)."""

    light_pos: Any    # f32[H, W, 3]
    light_color: Any  # f32[H, W, 3]
    weight_sum: Any   # f32[H, W]
    m: Any            # f32[H, W]
    w: Any            # f32[H, W]
    age: Any          # f32[H, W]
    light_index: Any  # i32[H, W] (slot into scene.light_idx, -1 = none)

    @classmethod
    def empty(cls, height: int, width: int):
        z = jnp.zeros((height, width), jnp.float32)
        z3 = jnp.zeros((height, width, 3), jnp.float32)
        return cls(light_pos=z3, light_color=z3, weight_sum=z, m=z, w=z,
                   age=z, light_index=jnp.full((height, width), -1, jnp.int32))


@struct.dataclass
class RenderState:
    """Carried frame state (accumulator + 3-frame reservoir ring +
    pass counter).  `restir_*` mirror the reference's back/history1/
    history2 rotation (index.js:795-820)."""

    accum: Any          # f32[H, W, 3] radiance sum (or EMA in animated mode)
    passes: Any         # i32[] completed passes
    restir_back: Reservoirs      # previous frame (spatial-reuse source)
    restir_hist1: Reservoirs     # one frame back (temporal level 0)
    restir_hist2: Reservoirs     # two frames back (temporal level 1)

    @classmethod
    def create(cls, height: int, width: int):
        return cls(
            accum=jnp.zeros((height, width, 3), jnp.float32),
            passes=jnp.zeros((), jnp.int32),
            restir_back=Reservoirs.empty(height, width),
            restir_hist1=Reservoirs.empty(height, width),
            restir_hist2=Reservoirs.empty(height, width),
        )

    def rotate_reservoirs(self, new_back: Reservoirs) -> "RenderState":
        """The per-frame buffer rotation back→hist1→hist2 (index.js:795-820),
        as a pure functional update."""
        return self.replace(
            restir_back=new_back,
            restir_hist1=self.restir_back,
            restir_hist2=self.restir_hist1,
        )
