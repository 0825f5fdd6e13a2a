"""
Controller regression farm over a plant fleet — the fleet-mode demo.

One simulator process serves N independently controlled plants from a
single Modbus/TCP endpoint (``--fleet N``: unit id u = lane u-1 of the
batched device ensemble, fleet.py). This script plays the SCADA side: one
PI chlorine-residual controller **per unit**, each with a different
setpoint, all talking to the same endpoint — the workload shape of
controller regression farms and operator training ranges. At the end it
reports each unit's measured residual against its own setpoint.

The reference can serve exactly one plant per process (its physics cannot
batch, SURVEY.md section 2); here the marginal cost of another plant is one
more lane in the batched step.

Usage:
  # self-contained: spawns the fleet simulator in-process, free-running
  python examples/fleet_farm.py --units 6 --iterations 150

  # against an already-running fleet simulator
  python examples/fleet_farm.py --host 127.0.0.1 --port 5020 --units 6
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ics_wt_physicsengine_tpu.modbus import ModbusTcpClient  # noqa: E402
from examples.pid_controller import PID, free_port, shutdown_sim  # noqa: E402


def farm(host, port, n_units, iterations, period=0.2, verbose=True):
    """One PI residual controller per unit, round-robin over one endpoint.

    The controller dt is the *simulated* time elapsed since each unit's
    previous iteration (read from its simulation_time register) — under
    ``--rtf 0`` the fleet free-runs at host speed, so wall-clock period
    bears no relation to simulated elapsed time."""
    setpoints = [0.5 + 0.25 * u for u in range(n_units)]     # mg/L, distinct
    pids = [PID(kp=0.4, ki=0.004, kd=0.0, setpoint=sp,
                out_min=0.0, out_max=1.0) for sp in setpoints]
    clients = [ModbusTcpClient(host, port, unit_id=u + 1,
                               timeout=10).connect()
               for u in range(n_units)]
    last_t = [None] * n_units
    live = [False] * n_units     # first nonzero reading = sensor is live
    try:
        for i in range(iterations):
            for u, (c, pid) in enumerate(zip(clients, pids)):
                t_sim = c.read_float32(100)           # this unit's sim clock
                cl_out = c.read_float32(8)            # chlorine_outlet
                dt_sim = (t_sim - last_t[u]) if last_t[u] is not None else 0.0
                last_t[u] = t_sim
                # A register of exactly 0.0 before any nonzero reading is
                # the warm-up/NaN placeholder; once the sensor has reported
                # a real value, 0.0 is a legitimate measurement (fully
                # decayed residual) the controller must respond to.
                live[u] = live[u] or cl_out > 0.0
                if live[u] and dt_sim > 0.0:
                    c.write_float32(2, pid.update(cl_out, dt_sim))
            if verbose and i % 25 == 0:
                print(f"[farm] iter {i:4d} t={last_t[0]:7.0f}s", flush=True)
            time.sleep(period)

        results = []
        for u, (c, sp) in enumerate(zip(clients, setpoints)):
            measured = c.read_float32(8)
            results.append({"unit": u + 1, "setpoint_mg_L": round(sp, 3),
                            "measured_mg_L": round(measured, 3),
                            "error_mg_L": round(measured - sp, 3)})
        return results
    finally:
        for c in clients:
            c.close()


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=5020)
    ap.add_argument("--units", type=int, default=4)
    ap.add_argument("--iterations", type=int, default=150)
    ap.add_argument("--spawn", action="store_true",
                    help="run the fleet simulator in-process (implied when "
                         "no server is reachable)")
    args = ap.parse_args()

    spawn = args.spawn
    if not spawn:
        try:
            socket.create_connection((args.host, args.port),
                                     timeout=1).close()
        except OSError:
            spawn = True

    sim_thread = None
    if spawn:
        import ics_wt_physicsengine_tpu.__main__ as orch

        args.port = free_port(args.host)
        orch.running = True
        sim_thread = threading.Thread(
            target=orch.main,
            args=(["--port", str(args.port), "--host", args.host,
                   "--dt", "15", "--duration", "1000000", "--rtf", "0",
                   "--fleet", str(args.units), "--zones", "5",
                   "--seed", "4", "--recal-hours", "2"],),
            daemon=True)
        sim_thread.start()
        deadline = time.time() + 120   # 1-core host: startup JIT under load
        while time.time() < deadline:
            try:
                socket.create_connection((args.host, args.port),
                                         timeout=1).close()
                break
            except OSError:
                time.sleep(0.3)

    try:
        results = farm(args.host, args.port, args.units, args.iterations)
        print(json.dumps({"fleet_units": args.units,
                          "per_unit_residual_control": results}, indent=2))
    finally:
        if sim_thread is not None:
            shutdown_sim(sim_thread)


if __name__ == "__main__":
    main()
