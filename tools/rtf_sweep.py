"""
Real-time-factor sweep (BASELINE config 5).

Runs the full HIL serving stack (physics + 7 sensors + Modbus registers) at
a ladder of requested real-time factors and reports the achieved RTF at each
point, plus the unpaced ceiling. Prints one JSON document.

Usage:  python tools/rtf_sweep.py [--steps 120] [--dt 1.0] [--native]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_point(rtf: float, n_steps: int, dt: float, native: bool,
              seed: int = 0, integrator: str = "rk4"):
    import jax
    from ics_wt_physicsengine_tpu.core import (
        BoundaryConditions, IntegratedCSTR, ReactorConfiguration)
    from ics_wt_physicsengine_tpu.modbus import (
        ModbusRegisterMap, ModbusServerConfig, ModbusSlave)
    from ics_wt_physicsengine_tpu.sensors import create_realistic_sensor_suite
    from ics_wt_physicsengine_tpu.utils import StepTimer
    import ics_wt_physicsengine_tpu.__main__ as orch

    config = ReactorConfiguration()
    reactor = IntegratedCSTR(config, integrator=integrator)
    sensors = create_realistic_sensor_suite(config, seed=seed)
    for name, s in sensors.items():
        ref = {"pH": 7.0, "ch": 2.0, "fl": 5.0, "te": 20.0}[name[:2]]
        s.calibrate(ref, 0.0)

    if native:
        from ics_wt_physicsengine_tpu.modbus import NativeModbusSlave
        slave = NativeModbusSlave(ModbusRegisterMap(),
                                  ModbusServerConfig(host="127.0.0.1",
                                                     port=0))
    else:
        slave = ModbusSlave(ModbusRegisterMap(),
                            ModbusServerConfig(host="127.0.0.1", port=0))
    slave.start()

    bc = BoundaryConditions(inlet_flow_rate=5.0, acid_flow_rate=0.1)
    timer = StepTimer()
    sim_time = 0.0
    t_start = time.monotonic()
    for i in range(n_steps):
        step_start = time.monotonic()
        state = reactor.step(dt, bc)
        readings = orch.read_all_sensors(sensors, state, 2000.0 + sim_time)
        orch.update_modbus_inputs(slave, readings, state, sim_time)
        sim_time += dt
        timer.tick(sim_time)
        if rtf > 0:
            sleep = max(0.0, dt / rtf - (time.monotonic() - step_start))
            if sleep > 0:
                time.sleep(sleep)
    wall = time.monotonic() - t_start
    slave.stop()
    return {
        "requested_rtf": rtf,
        "achieved_rtf": sim_time / wall,
        "steps_per_s": n_steps / wall,
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=120)
    parser.add_argument("--dt", type=float, default=1.0)
    parser.add_argument("--native", action="store_true")
    parser.add_argument("--rtfs", type=float, nargs="*",
                        default=[1.0, 10.0, 100.0, 0.0])
    parser.add_argument("--integrator", choices=["rk4", "rkc-strict",
                                                 "rkc-fast"], default="rk4")
    args = parser.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))

    results = [run_point(rtf, args.steps, args.dt, args.native, seed=i,
                         integrator=args.integrator)
               for i, rtf in enumerate(args.rtfs)]
    print(json.dumps({
        "sweep": results,
        "dt": args.dt,
        "steps_per_point": args.steps,
        "modbus": "native" if args.native else "python",
        "integrator": args.integrator,
    }, indent=2))


if __name__ == "__main__":
    main()
