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

import hashlib

import numpy as np
import jax.numpy as jnp

from raytracer0_tpu.render.state import RenderState, Reservoirs

_RES_FIELDS = ("light_pos", "light_color", "weight_sum", "m", "w", "age",
               "light_index")


def fingerprint(scene=None, cfg=None, height=None, width=None) -> str:
    """Identity of a render-in-progress: scene structure + values, config,
    and image shape.  Resuming a checkpoint into a different render would
    silently blend two images — the fingerprint makes `load` refuse.

    Scene *values* (positions/colors/...) are hashed too: a progressive
    accumulator is only valid for the exact scene that produced it.
    """
    h = hashlib.sha256()
    if scene is not None:
        import jax
        for leaf in jax.tree_util.tree_leaves(scene):
            h.update(np.ascontiguousarray(np.asarray(leaf)).tobytes())
        h.update(repr((scene.num_analytic, scene.num_sdfs,
                       scene.mesh_types_static, scene.mat_types_static,
                       scene.lights_static, scene.sdf_shapes_static,
                       scene.tex_types_used)).encode())
    if cfg is not None:
        h.update(repr(cfg).encode())
    h.update(repr((height, width)).encode())
    return h.hexdigest()[:16]


def save(path: str, state: RenderState, scene=None, cfg=None) -> None:
    ht, wd = state.accum.shape[:2]
    arrs = {"accum": np.asarray(state.accum),
            "passes": np.asarray(state.passes),
            "fingerprint": np.frombuffer(
                fingerprint(scene, cfg, ht, wd).encode(), np.uint8)}
    for name in ("restir_back", "restir_hist1", "restir_hist2"):
        res = getattr(state, name)
        for f in _RES_FIELDS:
            arrs[f"{name}.{f}"] = np.asarray(getattr(res, f))
    np.savez_compressed(path, **arrs)


def load(path: str, scene=None, cfg=None) -> RenderState:
    """Load a checkpoint.  When `scene`/`cfg` are given, their fingerprint
    must match the one stored at save time (mismatched resumes raise)."""
    with np.load(path) as z:
        if "fingerprint" in z and (scene is not None or cfg is not None):
            stored = bytes(z["fingerprint"]).decode()
            ht, wd = z["accum"].shape[:2]
            now = fingerprint(scene, cfg, ht, wd)
            if stored != now:
                raise ValueError(
                    f"checkpoint fingerprint mismatch: saved={stored} "
                    f"current={now} — refusing to resume a different "
                    f"scene/config/size into this accumulator")

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
