"""
Sensor-suite smoke demo: ``python -m ics_wt_physicsengine_tpu.sensors``.

Mirrors the reference's per-module demo mains (e.g. reference
sensors/base_sensor.py ``__main__``): builds the canonical 7-sensor suite
on a 5-zone plant, runs a few simulated minutes with acid dosing, prints
measured-vs-true tables, then demonstrates calibration, electrode cleaning,
and consumable replacement.
"""

from __future__ import annotations

import os

import jax

# Per-tick host loop (one step + seven reads per simulated second): CPU is
# the right backend regardless of the session default — on the tunneled-TPU
# backend every call pays ~30-100 ms of relay latency and the demo takes
# minutes instead of seconds (same policy as core/__main__ and the
# orchestrator's --backend default). Override with WT_DEMO_BACKEND=tpu.
jax.config.update("jax_platforms",
                  os.environ.get("WT_DEMO_BACKEND", "cpu"))


def main() -> None:
    import numpy as np

    from ics_wt_physicsengine_tpu.core import reactor as R
    from ics_wt_physicsengine_tpu.sensors import (
        create_realistic_sensor_suite)

    config = R.ReactorConfiguration(n_zones=5, initial_pH=7.2,
                                    initial_chlorine=1.5)
    reactor = R.IntegratedCSTR(config)
    suite = create_realistic_sensor_suite(config, seed=42)
    bc = R.BoundaryConditions(inlet_flow_rate=5.0, inlet_pH=7.5,
                              acid_flow_rate=0.2, acid_concentration=0.1)

    # Sensor clocks are independent of simulation time. Calibration restarts
    # warm-up (reference base_sensor.py:741), so calibrate at t=0 and start
    # reads past the longest warm-up window (pH: 30 min) — steady-state
    # behavior for the demo; warm-up NaNs are exercised in
    # tests/test_sensors.py.
    # Note: calibrating a cold sensor against the process value bakes the
    # startup error into the offset (offset = ref - current_value, and e.g.
    # the flow sensor powers on reading 0) — reference-inherited behavior
    # (reference base_sensor.py:701-755, flow_sensor.py:96); the flow and
    # chlorine channels therefore read high by that startup offset below.
    for name, sensor in suite.items():
        ref = {"pH": 7.2, "chlorine": 1.5, "temp": 20.0,
               "flow": config.flow_rate}[name.split("_")[0]]
        sensor.calibrate(ref, current_time=0.0, operator_id="demo_init")
    t0 = 1801.0

    print("=" * 72)
    print("SENSOR SUITE DEMO — 7 instruments on a 5-zone dosed reactor")
    print("=" * 72)
    header = (f"{'t[s]':>6} {'pH true':>8} {'pH meas':>8} "
              f"{'Cl true':>8} {'Cl meas':>8} {'T true':>7} {'T meas':>7} "
              f"{'Q meas':>7}")
    print(header)
    print("-" * len(header))

    for step in range(180):
        state = reactor.step(1.0, bc)
        t = t0 + float(state.time)
        readings = {name: s.read(state, current_time=t)
                    for name, s in suite.items()}
        if step % 30 == 29:
            print(f"{float(state.time):>6.0f} "
                  f"{float(state.pH[-1]):>8.3f} "
                  f"{readings['pH_outlet'].value:>8.3f} "
                  f"{float(state.chlorine[-1]):>8.3f} "
                  f"{readings['chlorine_outlet'].value:>8.3f} "
                  f"{float(state.temperature[-1]):>7.2f} "
                  f"{readings['temp_outlet'].value:>7.2f} "
                  f"{readings['flow_main'].value:>7.2f}")

    print("\nPer-sensor summary (last reading, 60 s statistics):")
    for name, sensor in suite.items():
        r = sensor.reading_history[-1]
        stats = sensor.get_statistics(window_seconds=60.0)
        print(f"  {name:<18} value={r.value:>8.3f} noise={r.noise:>+8.5f} "
              f"drift={r.drift:>+9.6f} sigma={stats['std']:>7.4f} "
              f"status={r.status.name}")

    t = t0 + float(reactor.state.time)

    # Two-point calibration + slope health on the outlet pH electrode
    ph = suite["pH_outlet"]
    health = ph.check_slope_health()
    rec = ph.calibrate_two_point(4.0, 7.0, 4.02, 6.97, current_time=t + 1)
    print(f"\npH_outlet slope health: {health['slope_percentage']:.1f}% "
          f"({health['health']})")
    print(f"Two-point calibration:  offset={rec.offset:+.4f} "
          f"(slope {float(ph.slope_percentage):.1f}%)")
    ph.clean_electrode("water_rinse", current_time=t + 2)
    print(f"Electrode cleaned: fouling={ph.membrane_fouling:.4f}")

    # Consumable replacement on the DPD chlorine analyzer
    cl = suite["chlorine_outlet"]
    cl.replace_reagent(current_time=t + 3)
    print(f"DPD reagent replaced: potency={cl.reagent_potency:.3f}")

    r = suite["flow_main"].read_flow(float(reactor.state.flow_rate),
                                     current_time=t + 4)
    print(f"Direct flow read:     {r.value:.2f} L/min "
          f"(true {float(reactor.state.flow_rate):.2f})")
    assert np.isfinite(r.value)
    print("\nDemo complete.")


if __name__ == "__main__":
    main()
