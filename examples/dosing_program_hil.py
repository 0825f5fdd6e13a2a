"""
Offline HIL replay: a scripted dosing program against the fully
instrumented plant, in ONE kernel launch.

This is the reference's HIL loop shape — mutate boundary conditions every
step, advance the physics, read all seven instruments
(reference __main__.py:398-457) — executed offline at
kernel speed via ``ops.fused_plant.plant_rollout_fused`` with a
BoundaryConditions *schedule*. A day of plant time with per-second forcing
and per-minute measured-value extraction takes under a second on a v5e.

What an operator gets out of it: what the SCADA screens *would have shown*
(delayed, noisy, drifting, occasionally faulted instrument readings) for a
candidate dosing program, before committing it to the real plant.

Usage:
  python examples/dosing_program_hil.py [--hours 24] [--cpu]
  (--cpu runs a scaled-down interpreter-mode version; the kernel's
   hardware PRNG path needs a TPU)
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--hours", type=float, default=24.0)
    parser.add_argument("--cpu", action="store_true",
                        help="CPU interpreter mode (scaled down)")
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        args.hours = min(args.hours, 0.05)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

    import numpy as np
    import jax.numpy as jnp

    from ics_wt_physicsengine_tpu.core import reactor as R
    from ics_wt_physicsengine_tpu.models.plant import make_plant
    from ics_wt_physicsengine_tpu.ops.fused_plant import (
        N_WORDS, plant_rollout_fused)
    from ics_wt_physicsengine_tpu.ops.fused_rollout import _LANES

    n_steps = int(args.hours * 3600)
    config = R.ReactorConfiguration(volume=1000, height=2.0, diameter=0.798,
                                    n_zones=20)
    substeps = R.default_substeps(config, 1.0)
    params, plant = make_plant(config, seed=42, dtype=jnp.float32)

    # The dosing program: morning acid pulse train, midday chlorine boost,
    # diurnal inlet temperature, demand-driven flow.
    t = np.arange(n_steps, dtype=np.float64)
    hours = t / 3600.0
    schedule = R.BoundaryConditions(
        inlet_flow_rate=(5.0 + 2.0 * np.sin(2 * np.pi * (hours - 7) / 24.0)
                         ).astype(np.float32),
        inlet_pH=7.4,
        inlet_chlorine=0.3,
        inlet_temperature=(18.0 + 5.0 * np.sin(2 * np.pi * (hours - 14)
                                               / 24.0)).astype(np.float32),
        acid_flow_rate=np.where((hours % 1.0) < 0.1, 0.25, 0.0
                                ).astype(np.float32),
        chlorine_flow_rate=np.where((hours > 11) & (hours < 13), 0.3, 0.05
                                    ).astype(np.float32),
        ambient_temperature=15.0, heat_loss_coefficient=50.0)

    # Hourly segments: one compile serves every segment, and instruments
    # get recalibrated between segments (the orchestrator's --recal-hours
    # maintenance model — without it, the reference's fault latch takes
    # every channel dark within hours of unattended running).
    seg_steps = min(n_steps, 3600)
    n_segments = max(1, n_steps // seg_steps)
    record_every = max(1, seg_steps // 60)

    kwargs = dict(dt=1.0, substeps=substeps, n_steps=seg_steps,
                  record_every=record_every)
    if args.cpu:
        rng = np.random.default_rng(0)
        kwargs.update(rng="bits", interpret=True,
                      bits=rng.integers(-2**31, 2**31,
                                        size=(seg_steps, N_WORDS, 8,
                                              _LANES), dtype=np.int32))

    from dataclasses import replace as dc_replace

    # Power faults latch permanently in the reference model (calibration
    # resets status but not the failed supply, base_sensor.py:701-755 +
    # :553-577) — field maintenance means *replacing* the instrument, as
    # the orchestrator's --recal-hours does via sensor reset.
    SENSOR_ATTRS = ("ph_inlet", "ph_outlet", "chlorine_inlet",
                    "chlorine_outlet", "flow_main", "temp_inlet",
                    "temp_outlet")

    def maintain(p, hour):
        """Swap any faulted instrument for a fresh calibrated unit."""
        replaced = []
        updates = {}
        _, fresh = make_plant(config, seed=9000 + hour, dtype=jnp.float32)
        for attr in SENSOR_ATTRS:
            carry = getattr(p, attr)
            v = float(np.ravel(np.asarray(carry.base.supply_voltage))[0])
            dead = not (20.0 < v < 28.0) or \
                not np.isfinite(np.ravel(np.asarray(
                    carry.base.current_value))[0])
            if dead:
                updates[attr] = getattr(fresh, attr)
                replaced.append(attr)
        if replaced:
            print(f"  hour {hour:>2}: replaced faulted "
                  f"{', '.join(replaced)}")
        return dc_replace(p, **updates) if updates else p

    def seg_schedule(s):
        lo, hi = s * seg_steps, (s + 1) * seg_steps
        return jax.tree_util.tree_map(
            lambda x: x[lo:hi] if np.ndim(x) else x, schedule)

    series = {}
    elapsed = 0.0
    for s in range(n_segments):
        t0 = time.perf_counter()
        # fresh PRNG stream per segment (the seed is runtime data — no
        # recompile; reusing one seed would replay identical fault rolls)
        plant, readings = plant_rollout_fused(params, plant,
                                              seg_schedule(s), seed=7 + s,
                                              **kwargs)
        np.asarray(plant.reactor.pH)
        seg_elapsed = time.perf_counter() - t0
        if s == 0:
            print(f"first segment (incl. compile): {seg_elapsed:.1f} s")
        else:
            elapsed += seg_elapsed
        for k, v in readings.items():
            series.setdefault(k, []).append(np.asarray(v).ravel())
        plant = maintain(plant, s + 1)

    new_plant = plant
    series = {k: np.concatenate(v) for k, v in series.items()}
    steady = n_steps - seg_steps
    if n_segments > 1:
        print(f"replayed {steady} further plant-seconds (physics + 7 "
              f"instruments/step, hourly maintenance checks) in "
              f"{elapsed:.2f} s -> {steady / elapsed:,.0f} steps/s")

    names = ("pH_outlet", "chlorine_outlet", "flow_main", "temp_outlet")
    series = {k: series[k] for k in names}
    print(f"\nmeasured-value extract (every {record_every} s):")
    header = f"{'t[min]':>7} " + " ".join(f"{k:>16}" for k in names)
    print(header)
    print("-" * len(header))
    n_rec = len(series[names[0]])
    for frac in (0.0, 0.25, 0.5, 0.75, 1.0):
        i = min(n_rec - 1, int(frac * n_rec))
        t_min = (i + 1) * record_every / 60.0
        row = " ".join(f"{series[k][i]:>16.3f}" for k in names)
        print(f"{t_min:>7.1f} {row}")

    print("\ninstrument health after the program:")
    for k in names:
        v = series[k]
        finite = np.isfinite(v)
        msg = "OK" if finite[-1] else "FAULT-LATCHED (needs recalibration)"
        print(f"  {k:<18} finite {100 * finite.mean():5.1f}% of readings"
              f"  final: {msg}")
    print("\n(power-fault latching is reference-inherited: only instrument "
          "replacement recovers a failed supply — modeled above and by the "
          "orchestrator's --recal-hours)")


if __name__ == "__main__":
    main()
