"""ctypes binding for the native C++ CPU-reference renderer.

`native/rt0_cpu.cpp` implements the same rendering math as
`cpu_ref/tracer.py` in pure float32 (matching device numerics more
closely than the Python oracle's float64 scalar promotions) and runs
~100x faster — it is the oracle used for larger golden comparisons.

Build: `make -C native` (done on demand by `ensure_built()`).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

from raytracer0_tpu.config import RenderConfig

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SO = os.path.join(_REPO, "native", "librt0_cpu.so")

_lib: Optional[ctypes.CDLL] = None


def ensure_built() -> str:
    """Compile the shared library if missing; returns its path."""
    if not os.path.exists(_SO):
        subprocess.run(["make", "-C", os.path.join(_REPO, "native")],
                       check=True, capture_output=True)
    return _SO


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(ensure_built())
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C")
        lib.rt0_render.restype = None
        lib.rt0_render.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.c_int,           # n, analytic, sdfs
            f32p, f32p, f32p, i32p, i32p, i32p, f32p, f32p, f32p,  # scene arrays
            i32p, ctypes.c_int,                                 # lights, L
            f32p, f32p, ctypes.c_float, ctypes.c_float, ctypes.c_float,  # camera
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,      # bounce caps
            ctypes.c_int, ctypes.c_float, ctypes.c_float, ctypes.c_float,  # march/eps
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,      # flags
            ctypes.c_int, ctypes.c_int,                                  # spectral, vol
            ctypes.c_float, ctypes.c_float, ctypes.c_float,              # vol params
            ctypes.c_int,                                                # spp
            ctypes.c_int, ctypes.c_int, ctypes.c_int, f32p,              # image
        ]
        _lib = lib
    return _lib


def available() -> bool:
    try:
        _load()
        return True
    except (OSError, subprocess.CalledProcessError, FileNotFoundError):
        return False


def render(scene, camera, cfg: RenderConfig, height: int, width: int,
           passes: int) -> np.ndarray:
    """Mean radiance image [H, W, 3] (pre-tonemap), bottom-up rows —
    the same contract as `cpu_ref.tracer.render`."""
    lib = _load()

    def f32(x):
        return np.ascontiguousarray(np.asarray(x), np.float32)

    def i32(x):
        return np.ascontiguousarray(np.asarray(x), np.int32)

    out = np.zeros((height, width, 3), np.float32)
    lib.rt0_render(
        scene.pos.shape[0], scene.num_analytic, scene.num_sdfs,
        f32(scene.pos), f32(scene.joker), f32(scene.aux), i32(scene.mesh_type),
        i32(scene.sdf_shape), i32(scene.mat_type), f32(scene.color),
        f32(scene.emission), f32(scene.ior),
        i32(scene.light_idx), int(scene.light_idx.shape[0]),
        f32(camera.origin), f32(camera.lookat), float(camera.fov),
        float(camera.aperture), float(camera.focal_length),
        cfg.max_bounces, cfg.max_diff_bounces, cfg.max_spec_bounces,
        cfg.max_scattering_events,
        cfg.marching_steps, cfg.fudge_factor, cfg.epsilon, cfg.infinity,
        int(cfg.sample_lights), int(cfg.use_mis), int(cfg.use_biased_sampling),
        int(cfg.use_procedural_sky),
        int(cfg.use_spectral), int(cfg.use_volumetrics),
        cfg.vol_sigma_t, cfg.vol_sigma_s, cfg.vol_g,
        cfg.samples_per_pass,
        height, width, passes, out,
    )
    return out
