"""Tile renderer for very large resolutions.

The reference renders up to 8192² by sweeping a sequential 32x32 viewport
tile cursor (index.js:97-103, 762-793; driver index.html:1226).  The TPU
analogue renders horizontal row bands sequentially — each band is a full
wavefront launch using global pixel coordinates (`row0`/`full_height`),
so the assembled image is bit-identical to a monolithic render while
device memory stays bounded by the band size.

(Across *chips* the same axis is sharded in parallel instead —
`parallel.sharding`; this module is the single-device out-of-memory
escape hatch, like the reference's tile mode.)
"""

from __future__ import annotations

import numpy as np

from raytracer0_tpu.config import RenderConfig
from raytracer0_tpu.render.renderer import sample_radiance


def render_tiled(scene, camera, cfg: RenderConfig, height: int, width: int,
                 passes: int, band_rows: int = 256, progress=None):
    """Render `passes` spp in row bands; returns mean radiance [H, W, 3]
    as host numpy (the accumulator of a huge render lives host-side)."""
    if cfg.use_restir:
        raise ValueError("tile rendering does not support ReSTIR "
                         "(spatial reuse needs the full frame; shard across "
                         "chips with parallel.halo instead)")
    band_rows = min(band_rows, height)
    out = np.zeros((height, width, 3), np.float32)
    n_bands = (height + band_rows - 1) // band_rows
    for p in range(passes):
        for b in range(n_bands):
            r0 = b * band_rows
            rows = min(band_rows, height - r0)
            band = sample_radiance(scene, cfg, camera, rows, width, p,
                                   row0=r0, full_height=height)
            out[r0:r0 + rows] += np.asarray(band)
            if progress is not None:
                progress(p, b, n_bands)
    return out / passes
