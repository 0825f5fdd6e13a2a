"""
Fleet-mode scaling: serving-loop tick cost vs fleet size.

Measures the headless fleet tick (one jitted batched device step + the
per-unit host work of publishing 9 input registers + 3 fault bits and
reading back 5 commands + 3 coils per unit) at increasing N, and reports
the largest fleet that still meets real time at dt=1 s. Run with
``--backend tpu`` on the device the fleet would serve from; the default
CPU backend measures the host-loop ceiling (the device step is microseconds
either way — the host-side Modbus bookkeeping is the scaling axis).

Prints one JSON line: {"fleet_sizes": [...], "tick_ms": [...],
"max_realtime_units_dt1s": N}.
"""

import argparse
import json
import os
import sys
import time
from dataclasses import replace as dc_replace
from types import SimpleNamespace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(n, n_ticks, zones):
    import numpy as np
    import jax

    import ics_wt_physicsengine_tpu.__main__ as M
    from ics_wt_physicsengine_tpu.core.reactor import (
        BoundaryConditions, IntegratedCSTR, ReactorConfiguration)
    from ics_wt_physicsengine_tpu.fleet import _stack_boundaries
    from ics_wt_physicsengine_tpu.modbus import (
        ModbusRegisterMap, ModbusServerConfig, ModbusSlave)
    from ics_wt_physicsengine_tpu.models.plant import (
        make_plant_batch, plant_step_batched)

    units = list(range(1, n + 1))
    config = ReactorConfiguration(volume=1000.0, n_zones=zones,
                                  flow_rate=5.0, initial_pH=7.2,
                                  initial_chlorine=2.0, temperature=20.0)
    m, s = IntegratedCSTR(config, integrator="rk4")._plan_for(1.0)
    params, plant = make_plant_batch(config, n, seed=1, warmed_up=True)
    dtype = plant.reactor.pH.dtype
    step = jax.jit(lambda pl, bc: plant_step_batched(
        params, pl, bc, 1.0, m, stages=s, boundary_axes=0))

    slave = ModbusSlave(ModbusRegisterMap(),
                        ModbusServerConfig(host="127.0.0.1", port=0),
                        units=units)
    slave.start(blocking=False)
    boundaries = [BoundaryConditions(inlet_flow_rate=5.0, inlet_pH=7.5)
                  for _ in units]
    try:
        # warm the jit
        plant, outputs = step(plant, _stack_boundaries(boundaries, dtype))
        jax.device_get(outputs)

        t0 = time.perf_counter()
        for tick in range(n_ticks):
            plant, outputs = step(plant, _stack_boundaries(boundaries,
                                                           dtype))
            host_out = jax.device_get(outputs)
            pH_np = np.asarray(plant.reactor.pH)
            for i, u in enumerate(units):
                readings = M._readings_from_outputs(host_out, lane=i)
                M.update_modbus_inputs(slave, readings,
                                       SimpleNamespace(pH=pH_np[i]),
                                       float(tick), unit=u)
            for i, u in enumerate(units):
                commands = M.read_modbus_commands(slave, unit=u)
                boundaries[i] = M.apply_boundary_conditions(boundaries[i],
                                                            commands)
        return (time.perf_counter() - t0) / n_ticks
    finally:
        slave.stop()


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sizes", type=int, nargs="*",
                    default=[4, 16, 64, 254])   # 254 = Modbus unit-id space
    ap.add_argument("--ticks", type=int, default=20)
    ap.add_argument("--zones", type=int, default=5)
    ap.add_argument("--backend", default=None, choices=[None, "cpu", "tpu"])
    args = ap.parse_args()

    if args.backend:
        import jax
        jax.config.update("jax_platforms", args.backend)

    tick_ms = []
    for n in args.sizes:
        t = measure(n, args.ticks, args.zones)
        tick_ms.append(round(t * 1e3, 2))
        print(f"# {n:5d} units: {t * 1e3:8.2f} ms/tick "
              f"({t * 1e6 / n:7.1f} us/unit)", file=sys.stderr)

    # linear fit tick(N) = a + b*N -> largest N with tick <= 1 s
    import numpy as np
    ns, ts = np.asarray(args.sizes, float), np.asarray(tick_ms) / 1e3
    b, a = np.polyfit(ns, ts, 1)
    max_rt = int((1.0 - a) / b) if b > 0 else 10 ** 6
    print(json.dumps({"fleet_sizes": args.sizes, "tick_ms": tick_ms,
                      "max_realtime_units_dt1s": max_rt,
                      "backend": __import__("jax").default_backend()}))


if __name__ == "__main__":
    main()
