"""
Profiling and diagnostics hooks.

The reference's observability is diagnostics printers + windowed sensor
statistics (SURVEY.md 5.1/5.5). Here:

- ``diagnostics()``: a pure metrics pytree (jit-safe, runnable in-graph);
- ``trace()``: a context manager around ``jax.profiler`` for TPU traces;
- ``StepTimer``: lightweight host-side rate/latency tracking for the serving
  loop (real-time-factor accounting).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict

import jax

from ics_wt_physicsengine_tpu.core import reactor as R
from ics_wt_physicsengine_tpu.core import transport as transport_mod


def diagnostics(params: R.ReactorParams, state: R.ReactorState) -> Dict:
    """Metrics pytree: conservation + mixing quality + per-variable spreads.
    Pure function — composable into jitted rollouts."""
    import jax.numpy as jnp

    cons = R.conservation_metrics(params, state)
    ph_cv, ph_seg = transport_mod.mixing_quality(state.pH)
    cl_cv, cl_seg = transport_mod.mixing_quality(state.chlorine)
    return {
        **cons,
        "pH_cv": ph_cv, "pH_segregation": ph_seg,
        "chlorine_cv": cl_cv, "chlorine_segregation": cl_seg,
        "pH_range": jnp.max(state.pH, axis=-1) - jnp.min(state.pH, axis=-1),
        "temperature_range": jnp.max(state.temperature, axis=-1)
        - jnp.min(state.temperature, axis=-1),
    }


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """Capture a jax.profiler trace (view with TensorBoard/XProf)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Host-side step timing for the HIL loop: rolling rate and the
    achieved real-time factor."""

    def __init__(self, window: int = 256):
        self.window = window
        self._stamps = []
        self._sim_times = []

    def tick(self, sim_time: float):
        now = time.monotonic()
        self._stamps.append(now)
        self._sim_times.append(sim_time)
        if len(self._stamps) > self.window:
            self._stamps.pop(0)
            self._sim_times.pop(0)

    @property
    def steps_per_second(self) -> float:
        if len(self._stamps) < 2:
            return 0.0
        span = self._stamps[-1] - self._stamps[0]
        return (len(self._stamps) - 1) / span if span > 0 else 0.0

    @property
    def real_time_factor(self) -> float:
        if len(self._stamps) < 2:
            return 0.0
        wall = self._stamps[-1] - self._stamps[0]
        sim = self._sim_times[-1] - self._sim_times[0]
        return sim / wall if wall > 0 else 0.0
