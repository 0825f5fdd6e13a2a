"""
Soft sensor over the HIL wire: an EKF reconstructs the plant's hidden
interior from the four boundary measurements a SCADA master can read.

The plant serves only boundary-zone instruments over Modbus (pH
inlet/outlet, chlorine outlet, temperature outlet); everything between
is invisible on the wire. This client runs the full-state extended
Kalman filter (control/ekf.py) host-side against those readings — the
physics model IS the process model — and prints the reconstructed
per-zone chlorine profile with its 1-sigma confidence, turning four
instruments into a whole-reactor soft sensor.

Usage:
  # against an already-running simulator
  python examples/ekf_soft_sensor.py --host 127.0.0.1 --port 5020

  # self-contained demo (spawns the simulator in-process)
  python examples/ekf_soft_sensor.py --spawn --ticks 30
"""

from __future__ import annotations

import argparse
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")   # latency-bound host loop

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from ics_wt_physicsengine_tpu.control import (  # noqa: E402
    make_ekf,
    make_ekf_carry,
)
from ics_wt_physicsengine_tpu.core import reactor as R  # noqa: E402
from ics_wt_physicsengine_tpu.modbus import ModbusTcpClient  # noqa: E402

# input-register addresses (modbus/register_map.py)
ADDR = {"pH_inlet": 0, "pH_outlet": 4, "chlorine_outlet": 8,
        "temperature_outlet": 14, "simulation_time": 100}
HOLDING = {"acid_flow_rate": 0, "chlorine_flow_rate": 2,
           "inlet_flow_rate": 4, "acid_concentration": 6,
           "chlorine_concentration": 8}
TAPS = [("pH", 0), ("pH", -1), ("chlorine", -1), ("temperature", -1)]


def free_port(host="127.0.0.1"):
    import socket

    s = socket.socket()
    s.bind((host, 0))
    port = s.getsockname()[1]
    s.close()
    return port


def run(host, port, ticks, zones, dt, verbose=True):
    config = R.ReactorConfiguration(
        volume=1000.0, n_zones=zones, flow_rate=5.0, initial_pH=7.2,
        initial_chlorine=2.0, temperature=20.0)
    params = R.make_params(config, dtype=jnp.float64)
    substeps = R.default_substeps(config, dt)
    ekf_step = jax.jit(make_ekf(
        params, zones, TAPS, dt, substeps,
        measurement_noise=(4e-4, 4e-4, 2.5e-3, 1e-2)))
    carry = make_ekf_carry(
        R.make_initial_state(config, dtype=jnp.float64),
        p0=(0.05, 1.0, 4.0), n_zones=zones)

    with ModbusTcpClient(host, port, timeout=10) as c:
        last_t = c.read_float32(ADDR["simulation_time"])
        done = 0
        while done < ticks:
            t = c.read_float32(ADDR["simulation_time"])
            if t <= last_t:          # no new plant tick yet
                time.sleep(0.05)
                continue
            last_t = t
            # the commands currently applied = the boundary that drives
            # the plant's next transitions (zero-trust validated on both
            # sides of the wire)
            cmd = {n: c.read_float32(a, input_register=False)
                   for n, a in HOLDING.items()}
            boundary = R.BoundaryConditions(
                inlet_flow_rate=cmd["inlet_flow_rate"],
                acid_flow_rate=cmd["acid_flow_rate"],
                chlorine_flow_rate=cmd["chlorine_flow_rate"],
                acid_concentration=cmd["acid_concentration"],
                chlorine_concentration=cmd["chlorine_concentration"])
            z = jnp.asarray([c.read_float32(ADDR["pH_inlet"]),
                             c.read_float32(ADDR["pH_outlet"]),
                             c.read_float32(ADDR["chlorine_outlet"]),
                             c.read_float32(ADDR["temperature_outlet"])],
                            jnp.float64)
            # warming-up instruments publish 0.0 — treat as dropouts
            z = jnp.where(z == 0.0, jnp.nan, z)
            carry, x = ekf_step(carry, z, boundary)
            done += 1
            if verbose:
                cl = np.asarray(x[zones:2 * zones])
                sig = np.sqrt(np.asarray(
                    jnp.diagonal(carry.P)[zones:2 * zones]))
                profile = " ".join(
                    f"{v:.2f}±{s:.2f}" for v, s in zip(cl, sig))
                print(f"t={t:8.0f}s  estimated Cl profile [mg/L]: "
                      f"{profile}")
    return carry


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=None)
    parser.add_argument("--ticks", type=int, default=30,
                        help="plant ticks to assimilate")
    parser.add_argument("--zones", type=int, default=5,
                        help="must match the plant's --zones")
    parser.add_argument("--dt", type=float, default=30.0,
                        help="must match the plant's --dt")
    parser.add_argument("--spawn", action="store_true")
    args = parser.parse_args()
    if args.port is None:
        args.port = free_port(args.host) if args.spawn else 5020

    sim_thread = None
    if args.spawn:
        import ics_wt_physicsengine_tpu.__main__ as orch
        orch.running = True
        sim_thread = threading.Thread(
            target=orch.main,
            args=(["--port", str(args.port), "--host", args.host,
                   "--dt", str(args.dt), "--zones", str(args.zones),
                   "--rtf", "300", "--seed", "2",
                   "--recal-hours", "6"],),
            daemon=True)
        sim_thread.start()
        deadline = time.time() + 120   # 1-core host: startup JIT under load
        while time.time() < deadline:
            try:
                ModbusTcpClient(args.host, args.port,
                                timeout=5).connect().close()
                break
            except OSError:
                time.sleep(0.3)
        else:
            raise SystemExit("simulator did not start")

    try:
        run(args.host, args.port, args.ticks, args.zones, args.dt)
        print(f"soft sensor assimilated {args.ticks} ticks")
    finally:
        if sim_thread is not None:
            from examples.pid_controller import shutdown_sim
            shutdown_sim(sim_thread)


if __name__ == "__main__":
    main()
