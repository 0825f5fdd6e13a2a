"""
External PID controller over Modbus/TCP — BASELINE config 5 demo.

This script is the *controller* the plant deliberately does not contain
(reference README.md:22): a discrete PI(D) loop that reads measured values
from the simulator's input registers and writes actuator commands to its
holding registers, exactly like a PLC/SCADA master would.

Two loops:
  - chlorine residual control: chlorine_outlet -> chlorine_flow_rate
  - pH control:               pH_inlet        -> acid_flow_rate

Usage:
  # against an already-running simulator
  python examples/pid_controller.py --host 127.0.0.1 --port 5020

  # self-contained demo (spawns the simulator in-process, free-running)
  python examples/pid_controller.py --spawn --iterations 120
"""

from __future__ import annotations

import argparse
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ics_wt_physicsengine_tpu.modbus import ModbusTcpClient  # noqa: E402


def free_port(host: str = "127.0.0.1") -> int:
    """Bind-then-release an ephemeral port (shared by the self-spawning
    demos; a fixed default port collides with concurrent simulators)."""
    import socket

    s = socket.socket()
    s.bind((host, 0))
    port = s.getsockname()[1]
    s.close()
    return port


def shutdown_sim(sim_thread, timeout: float = 60.0) -> None:
    """Stop an in-process simulator thread and, if it will not die,
    end the interpreter without finalization.

    The self-spawning demos run the orchestrator in a *daemon* thread
    that spends long stretches inside native XLA code (a cold JIT on a
    loaded 1-core host can outlast any polite join timeout). If that
    thread is still alive when CPython starts finalizing, the daemon is
    torn down at an arbitrary point inside C++ and glibc aborts the
    whole process ("terminate called ... FATAL: exception not
    rethrown"). The demo's own work is already done and printed by the
    time this runs, so when the join times out the safe exit is
    os._exit: flush the std streams and leave without racing
    interpreter finalization against a native thread."""
    import ics_wt_physicsengine_tpu.__main__ as orch

    orch.running = False
    sim_thread.join(timeout=timeout)
    if sim_thread.is_alive():
        sys.stdout.flush()
        sys.stderr.flush()
        os._exit(0)


class PID:
    """Discrete PID with anti-windup clamping."""

    def __init__(self, kp, ki, kd, setpoint, out_min, out_max):
        self.kp, self.ki, self.kd = kp, ki, kd
        self.setpoint = setpoint
        self.out_min, self.out_max = out_min, out_max
        self.integral = 0.0
        self.prev_error = None

    def update(self, measurement, dt):
        error = self.setpoint - measurement
        self.integral += error * dt
        derivative = 0.0 if self.prev_error is None \
            else (error - self.prev_error) / dt
        self.prev_error = error
        out = self.kp * error + self.ki * self.integral + self.kd * derivative
        clamped = min(max(out, self.out_min), self.out_max)
        if clamped != out:                      # anti-windup
            self.integral -= error * dt
        return clamped


def control_loop(host, port, iterations, period, cl_setpoint, ph_setpoint,
                 verbose=True, feedforward=False,
                 chlorine_stock_mg_L=50.0):
    """PI(D) loops; ``feedforward=True`` adds mass-balance ratio
    compensation to the chlorine loop (the reference roadmap's
    'feedforward compensation' item, README.md:436): the dosing needed to
    hold ``cl_setpoint`` at the measured throughput is
    Q_dose = setpoint * Q_in / C_stock, fed forward from the flow sensor so
    the PI only trims decay/measurement error instead of integrating its
    way to the whole operating point after every flow disturbance."""
    cl_pid = PID(kp=0.4, ki=0.02, kd=0.0, setpoint=cl_setpoint,
                 out_min=0.0, out_max=1.0)
    if feedforward:
        # the PI handles the +/- trim around the feedforward term
        cl_pid.out_min, cl_pid.out_max = -0.5, 0.5
    ph_pid = PID(kp=-0.8, ki=-0.05, kd=0.0, setpoint=ph_setpoint,
                 out_min=0.0, out_max=2.0)

    with ModbusTcpClient(host, port, timeout=10) as client:
        history = []
        for i in range(iterations):
            sim_t = client.read_float32(100)
            cl_out = client.read_float32(8)       # chlorine_outlet
            ph_in = client.read_float32(0)        # pH_inlet

            # sensors read 0.0 while warming up — hold outputs at zero
            if cl_out > 0.0:
                cl_cmd = cl_pid.update(cl_out, period)
                if feedforward:
                    flow = client.read_float32(10)    # flow_rate register
                    if flow > 0.0:
                        cl_cmd += cl_setpoint * flow / chlorine_stock_mg_L
                cl_cmd = min(max(cl_cmd, 0.0), 1.0)
                client.write_float32(2, cl_cmd)   # chlorine_flow_rate
            else:
                cl_cmd = 0.0
            if ph_in > 0.0:
                acid_cmd = ph_pid.update(ph_in, period)
                client.write_float32(0, acid_cmd)  # acid_flow_rate
            else:
                acid_cmd = 0.0

            history.append((sim_t, cl_out, ph_in, cl_cmd, acid_cmd))
            if verbose and i % 10 == 0:
                print(f"t={sim_t:8.0f}s  Cl_out={cl_out:5.2f} mg/L "
                      f"(sp {cl_setpoint})  pH_in={ph_in:5.2f} "
                      f"(sp {ph_setpoint})  ClCmd={cl_cmd:.2f}  "
                      f"AcidCmd={acid_cmd:.2f}")
            time.sleep(period)
        return history


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=None,
                        help="simulator port (default 5020; --spawn picks "
                             "a free ephemeral port unless one is given)")
    parser.add_argument("--iterations", type=int, default=120)
    parser.add_argument("--period", type=float, default=0.5,
                        help="controller period [wall seconds]")
    parser.add_argument("--cl-setpoint", type=float, default=2.5)
    parser.add_argument("--ph-setpoint", type=float, default=7.0)
    parser.add_argument("--spawn", action="store_true",
                        help="spawn the simulator in-process (demo mode)")
    parser.add_argument("--feedforward", action="store_true",
                        help="mass-balance ratio feedforward on the "
                             "chlorine loop (dose = setpoint * Q / C_stock "
                             "from the measured flow; PI trims the rest)")
    args = parser.parse_args()

    if args.port is None:
        args.port = free_port(args.host) if args.spawn else 5020

    sim_thread = None
    if args.spawn:
        import ics_wt_physicsengine_tpu.__main__ as orch
        orch.running = True
        # Bounded real-time factor so the controller's wall-clock period
        # matches a sensible number of simulation steps (free-running would
        # race through days of simulated time — and of stochastic sensor
        # mortality — between control actions).
        sim_thread = threading.Thread(
            target=orch.main,
            args=(["--port", str(args.port), "--host", args.host,
                   "--dt", "30", "--rtf", "300", "--seed", "1",
                   "--recal-hours", "6"],),
            daemon=True)
        sim_thread.start()
        deadline = time.time() + 120   # 1-core host: startup JIT under load
        while time.time() < deadline:
            try:
                ModbusTcpClient(args.host, args.port, timeout=2) \
                    .connect().close()
                break
            except OSError:
                time.sleep(0.5)

    try:
        history = control_loop(args.host, args.port, args.iterations,
                               args.period, args.cl_setpoint,
                               args.ph_setpoint,
                               feedforward=args.feedforward)
    except OSError as e:
        raise SystemExit(
            f"Could not reach the simulator at {args.host}:{args.port} "
            f"({e}). Start one with `python -m ics_wt_physicsengine_tpu "
            f"--port {args.port}` or pass --spawn.") from e

    final = history[-1]
    print(f"\nfinal: Cl_out={final[1]:.2f} mg/L (setpoint "
          f"{args.cl_setpoint}), pH_in={final[2]:.2f} "
          f"(setpoint {args.ph_setpoint})")

    if args.spawn:
        shutdown_sim(sim_thread)


if __name__ == "__main__":
    main()
