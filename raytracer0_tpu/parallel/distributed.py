"""Multi-host runtime helpers.

The reference is a single browser tab; the TPU framework scales across
hosts of a pod slice (SURVEY.md §2.5 P8).  Pattern:

* every host calls `initialize()` (jax.distributed handshake over DCN);
* the tile mesh spans *all* devices (`jax.devices()`, global);
* scene + camera are replicated; each host feeds its addressable shards;
* gradient `psum` rides ICI within a slice and DCN across slices —
  sharding only the tile axis keeps collectives on ICI for the hot path;
* image assembly: `jax.experimental.multihost_utils.process_allgather`
  (or fetch only host-0's rows).

Single-process by default — every helper degrades gracefully so the same
script runs on a laptop CPU, one chip, or a pod slice.
"""

from __future__ import annotations

import jax


def initialize(coordinator_address=None, num_processes=None, process_id=None):
    """Initialize the multi-host runtime (no-op when single-process)."""
    if num_processes is None or num_processes <= 1:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def process_info():
    return dict(
        process_index=jax.process_index(),
        process_count=jax.process_count(),
        local_devices=len(jax.local_devices()),
        global_devices=len(jax.devices()),
    )


def gather_image(image):
    """Assemble a row-sharded image on every host as host numpy."""
    try:
        from jax.experimental import multihost_utils
        if jax.process_count() > 1:
            return multihost_utils.process_allgather(image, tiled=True)
    except ImportError:
        pass
    import numpy as np
    return np.asarray(image)
