"""Profiling and metrics: rays/s counters, stage timers, trace capture.

The reference's observability is a stats.js FPS panel and console logs
(SURVEY.md §5).  TPU equivalents here:

* `RenderTimer` — wall-clock per-pass timing with rays/s derived from the
  static work budget (pixels x spp x bounce slots, the number of traced
  wavefront segments actually paid for);
* `profile_trace` — context manager around `jax.profiler.trace` for
  XProf/TensorBoard captures;
* `StageTimer` — named host-side stage timings (compile vs steady-state).
"""

from __future__ import annotations

import contextlib
import json
import time
from dataclasses import dataclass, field
from typing import Optional

import jax


def sync(tree):
    """Wait for the device work producing `tree` by host-fetching one
    element per leaf.  `jax.block_until_ready` returns before remote
    execution finishes on tunneled-TPU platforms (measured on this
    container's "axon" backend: a 10 x 500 ms chain "completed" in
    1.2 ms), so every timer in the framework syncs via transfer — a
    few bytes per leaf, negligible against any timed pass."""
    import numpy as np
    for leaf in jax.tree.leaves(tree):
        if hasattr(leaf, "ndim"):
            np.asarray(leaf[(slice(0, 1),) * leaf.ndim])
    return tree


@dataclass
class RenderTimer:
    """Per-pass wall-clock timing.

    The first timed pass includes jit tracing + XLA compilation (tens of
    seconds for the big configs) and would swamp the throughput estimate
    if averaged in; it is tracked separately as `compile_s` and the
    headline `rays_per_s` is computed from steady-state passes only.
    """

    height: int
    width: int
    spp: int
    bounces: int
    passes: int = 0
    total_s: float = 0.0
    compile_s: float = 0.0   # wall time of the first (compiling) block
    steady_s: float = 0.0    # wall time of all subsequent blocks
    block_passes: int = 1    # passes per timed block (render_scan chunks)
    compile_passes: int = 0  # passes inside the first (compiling) block
    _t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self.total_s += dt
        if self.passes == 0:
            self.compile_s = dt
            self.compile_passes = self.block_passes
        else:
            self.steady_s += dt
        self.passes += self.block_passes

    @property
    def rays_per_pass(self) -> int:
        return self.height * self.width * self.spp * self.bounces

    @property
    def rays_per_s(self) -> float:
        """Steady-state throughput (excludes the compiling first pass).
        Falls back to the all-passes average when only one pass ran."""
        steady = self.passes - self.compile_passes
        if steady > 0 and self.steady_s > 0:
            return self.rays_per_pass * steady / self.steady_s
        if self.total_s == 0:
            return 0.0
        return self.rays_per_pass * self.passes / self.total_s

    def report(self) -> dict:
        steady_passes = max(self.passes - self.compile_passes, 0)
        return {
            "passes": self.passes,
            "total_s": round(self.total_s, 4),
            "compile_s": round(self.compile_s, 4),
            "steady_s": round(self.steady_s, 4),
            "rays_per_s": round(self.rays_per_s),
            "ms_per_pass": round(
                1e3 * self.steady_s / steady_passes, 3) if steady_passes
            else round(1e3 * self.total_s / max(self.passes, 1), 3),
        }


@dataclass
class StageTimer:
    stages: dict = field(default_factory=dict)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.stages[name] = self.stages.get(name, 0.0) + time.perf_counter() - t0

    def report(self) -> str:
        return json.dumps({k: round(v, 4) for k, v in self.stages.items()})


@contextlib.contextmanager
def profile_trace(logdir: str):
    """Capture a device trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
