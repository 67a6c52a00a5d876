"""Counter-based stateless RNG, identical bit-for-bit on TPU and CPU.

The reference derives all randomness from float-bit hashes seeded by
fragment coordinates and the frame index (raytracer.glsl:300-318, 2120) —
stateless, but float-fragile.  Here every random draw is a pure function of
integer coordinates `(pixel_id, pass, depth, stream)` using the integer
PCG output hash (Jarzynski & Olano, "Hash Functions for GPU Rendering",
JCGT 2020 — public domain).  Properties this buys:

* deterministic across sharding: a pixel draws the same numbers no matter
  which device/tile owns it, so 1-chip and N-chip renders are bit-identical;
* replayable on the CPU reference: `cpu_ref/` uses the same uint32 math in
  numpy, so CPU and TPU trace *identical* paths (SURVEY.md §4);
* no carried RNG state through the bounce `scan` — just counters.

Every routine works on either jax.numpy or numpy arrays (module passed as
`xp`), which is how the CPU reference shares this file.
"""

from __future__ import annotations

import enum

import numpy as np
import jax.numpy as jnp

_M1 = np.uint32(747796405)
_A1 = np.uint32(2891336453)
_M2 = np.uint32(277803737)
# Multipliers for combining coordinates into one counter (odd constants
# from Weyl-sequence / splitmix-style stream separation).
_CK = (
    np.uint32(0x9E3779B9),
    np.uint32(0x85EBCA6B),
    np.uint32(0xC2B2AE35),
    np.uint32(0x27D4EB2F),
    np.uint32(0x165667B1),
)

_INV_2_24 = np.float32(1.0 / (1 << 24))


def pcg(x, xp=jnp):
    """PCG-RXS-M-XS output hash on uint32 (Jarzynski & Olano 2020).

    uint32 wraparound is the intended semantics; errstate silences numpy's
    scalar-overflow warnings on the CPU-reference path.
    """
    with np.errstate(over="ignore"):
        x = x.astype(xp.uint32) if hasattr(x, "astype") else xp.uint32(x)
        x = x * _M1 + _A1
        x = ((x >> ((x >> np.uint32(28)) + np.uint32(4))) ^ x) * _M2
        return (x >> np.uint32(22)) ^ x


def fold(*coords, xp=jnp):
    """Mix integer coordinates into one well-distributed uint32 state.

    Each coordinate is weighted by a distinct odd constant and the running
    state is re-hashed, so permuted/equal coordinates do not collide.
    """
    h = xp.asarray(np.uint32(0x5BD1E995))
    with np.errstate(over="ignore"):
        for i, c in enumerate(coords):
            c = xp.asarray(c, dtype=xp.uint32)
            h = pcg(h + c * _CK[i % len(_CK)] + np.uint32(i), xp=xp)
    return h


def uniform_from_bits(bits, xp=jnp):
    """uint32 → f32 uniform in [0, 1) with exactly-representable mantissas."""
    return (bits >> np.uint32(8)).astype(xp.float32) * _INV_2_24


def uniform(*coords, xp=jnp):
    """One f32 uniform in [0,1) per broadcast element of the coordinates."""
    return uniform_from_bits(fold(*coords, xp=xp), xp=xp)


def uniform2(*coords, xp=jnp):
    """Two independent uniforms (returned as a tuple, not stacked)."""
    h = fold(*coords, xp=xp)
    return uniform_from_bits(h, xp=xp), uniform_from_bits(pcg(h, xp=xp), xp=xp)


def uniform3(*coords, xp=jnp):
    h = fold(*coords, xp=xp)
    h2 = pcg(h, xp=xp)
    h3 = pcg(h2, xp=xp)
    return (
        uniform_from_bits(h, xp=xp),
        uniform_from_bits(h2, xp=xp),
        uniform_from_bits(h3, xp=xp),
    )


class Stream(enum.IntEnum):
    """Named decorrelated streams, replacing the reference's ad-hoc float
    seed offsets (kSeedA..D, raytracer.glsl:77-80 and the many literal
    nudges like `seed + 23.1656`)."""

    AA = 0                 # tent-filter jitter (raytracer.glsl:2135-2138)
    APERTURE = 1           # thin-lens disk sample (2143-2145)
    WAVELENGTH = 2         # hero wavelength (2122-2124)
    BSDF_DIR = 3           # hemisphere/cone direction in brdf (1810)
    BSDF_CHOICE = 4        # reflect-vs-refract / coat choice (1858, 1873)
    NEE_CONE = 5           # light cone sample (1190)
    NEE_SDF_POINT = 6      # point on SDF light bound (1207)
    ENV_DIR = 7            # cubemap gather direction (1889)
    VOL_FREEPATH = 8       # free-path distance (2003)
    VOL_PHASE = 9          # HG phase direction (2046)
    VOL_NEE = 10           # per-light cone sample at scatter point (2023)
    RESTIR_CANDIDATE = 11  # candidate light picks (1636)
    RESTIR_TEMPORAL = 12   # temporal combine rand + jitter (1495, 1697)
    RESTIR_SPATIAL = 13    # spatial combine rand (1726)
    LIGHT_INDEX = 14       # stratified light selection
    RR = 15                # (reserved) russian roulette


def pixel_ids(height: int, width: int, xp=jnp, row0=0):
    """uint32 pixel counter grid of shape [H, W] (row-major).

    `row0` offsets the row index — used by tile sharding so a shard
    owning rows [row0, row0+H) draws the same numbers it would in a
    single-device render (determinism across sharding).
    """
    r = xp.arange(height, dtype=xp.uint32)[:, None] + xp.uint32(row0)
    c = xp.arange(width, dtype=xp.uint32)[None, :]
    return r * xp.uint32(width) + c


def noise_lut(size: int = 256, channels: int = 4, seed: int = 7):
    """Deterministic replacement for the reference's rgba_noise256 texture
    (index.js:257-273): a [size, size, channels] f32 LUT in [0,1) used by
    value noise and voronoi (raytracer.glsl:399, 417).  Built from the same
    counter hash, so the CPU reference sees identical values."""
    r = np.arange(size, dtype=np.uint32)[:, None, None]
    c = np.arange(size, dtype=np.uint32)[None, :, None]
    k = np.arange(channels, dtype=np.uint32)[None, None, :]
    return np.asarray(
        uniform(r, c, k, np.uint32(seed), xp=np), dtype=np.float32
    )
