"""Checkpoint / resume for long progressive renders.

The reference has no persistence — its "checkpoint" is the accumulation
texture surviving until `clear()` (SURVEY.md §5).  Long TPU batch renders
need real checkpoints: (accumulator, pass counter, 3-frame reservoir
ring) fully captures a render in progress because the RNG is stateless
counter-based — resuming at pass N draws exactly the numbers pass N
would have drawn.

Plain .npz is the storage format (zero extra dependencies, portable);
`orbax` users can wrap the same pytree with their own checkpointer.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from raytracer0_tpu.render.state import RenderState, Reservoirs

_RES_FIELDS = ("light_pos", "light_color", "weight_sum", "m", "w", "age",
               "light_index")


def save(path: str, state: RenderState) -> None:
    arrs = {"accum": np.asarray(state.accum),
            "passes": np.asarray(state.passes)}
    for name in ("restir_back", "restir_hist1", "restir_hist2"):
        res = getattr(state, name)
        for f in _RES_FIELDS:
            arrs[f"{name}.{f}"] = np.asarray(getattr(res, f))
    np.savez_compressed(path, **arrs)


def load(path: str) -> RenderState:
    with np.load(path) as z:
        def res(name):
            return Reservoirs(**{f: jnp.asarray(z[f"{name}.{f}"])
                                 for f in _RES_FIELDS})
        return RenderState(
            accum=jnp.asarray(z["accum"]),
            passes=jnp.asarray(z["passes"]),
            restir_back=res("restir_back"),
            restir_hist1=res("restir_hist1"),
            restir_hist2=res("restir_hist2"),
        )
