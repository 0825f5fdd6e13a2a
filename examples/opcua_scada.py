"""
Event-driven SCADA controller over OPC UA subscriptions.

The OPC UA twin of examples/pid_controller.py: instead of polling Modbus
registers every period, this client subscribes to the plant's measured
values (MonitoredItems + Publish — the push path real SCADA packages
use) and runs its PI loops *on data changes*. Dosing commands are
written back over the same OPC UA session; they land in the identical
validated holding registers the Modbus path serves
(opcua/server.py bridges both planes onto one store).

Two loops, same structure as the Modbus demo:
  - chlorine residual control: chlorine_outlet -> chlorine_flow_rate
  - pH control:               pH_inlet        -> acid_flow_rate

Usage:
  # against an already-running `python -m ics_wt_physicsengine_tpu --opcua 4840`
  python examples/opcua_scada.py --host 127.0.0.1 --port 4840

  # self-contained demo (spawns the simulator in-process)
  python examples/opcua_scada.py --spawn --publishes 40
"""

from __future__ import annotations

import argparse
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ics_wt_physicsengine_tpu.opcua import OPCUAClient  # noqa: E402

H_SIM_TIME, H_CL_OUT, H_PH_IN, H_FLOW = 0, 1, 2, 3
MONITORED = {
    H_SIM_TIME: "u1.simulation_time",
    H_CL_OUT: "u1.chlorine_outlet",
    H_PH_IN: "u1.pH_inlet",
    H_FLOW: "u1.flow_rate",
}


class PID:
    """Discrete PID with anti-windup clamping (pid_controller.PID)."""

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
        out = self.kp * error + self.ki * self.integral \
            + self.kd * derivative
        clamped = min(max(out, self.out_min), self.out_max)
        if clamped != out:                      # anti-windup
            self.integral -= error * dt
        return clamped


def scada_loop(host, port, publishes, interval, cl_setpoint, ph_setpoint,
               verbose=True):
    """Subscribe to the four measured values and drive both PI loops
    from the pushed data changes; returns the (t, Cl, pH) history."""
    cl_pid = PID(kp=0.4, ki=0.02, kd=0.0, setpoint=cl_setpoint,
                 out_min=0.0, out_max=1.0)
    ph_pid = PID(kp=-0.8, ki=-0.05, kd=0.0, setpoint=ph_setpoint,
                 out_min=0.0, out_max=2.0)
    latest = {h: 0.0 for h in MONITORED}
    history = []

    with OPCUAClient(host, port, timeout=30.0) as c:
        sub_id, rev_interval = c.create_subscription(
            publishing_interval=interval, max_keepalive_count=10)
        # Absolute deadband: sensor-noise-scale jitter (< 0.005 units)
        # is suppressed at the server's sampler, so pushes carry only
        # operationally meaningful changes (round 4, Part 4 §7.22.2).
        results = c.create_monitored_items(
            sub_id, list(MONITORED.values()),
            client_handles=list(MONITORED.keys()), deadband=0.005)
        bad = [r.status for r in results if r.status != 0]
        if bad:
            raise RuntimeError(f"monitored-item failures: {bad}")
        if verbose:
            print(f"subscribed: id={sub_id} "
                  f"interval={rev_interval * 1e3:.0f} ms "
                  f"items={len(results)}")

        acks = []
        changes_total = 0
        for i in range(publishes):
            rsp = c.publish(acks=acks, timeout=60.0)
            acks = [(sub_id, rsp.notification_message.sequence_number)]
            changes = OPCUAClient.data_changes(rsp)
            changes_total += len(changes)
            for handle, dv in changes:
                if dv.value is not None:
                    latest[handle] = float(dv.value.value)
            if not changes:
                continue            # keepalive — nothing new to act on

            # control on the freshest pushed measurements
            cl_out, ph_in = latest[H_CL_OUT], latest[H_PH_IN]
            if cl_out > 0.0:        # sensors publish 0.0 while warming up
                cl_cmd = cl_pid.update(cl_out, rev_interval)
                c.write_double("u1.chlorine_flow_rate", cl_cmd)
            else:
                cl_cmd = 0.0
            if ph_in > 0.0:
                acid_cmd = ph_pid.update(ph_in, rev_interval)
                c.write_double("u1.acid_flow_rate", acid_cmd)
            else:
                acid_cmd = 0.0
            history.append((latest[H_SIM_TIME], cl_out, ph_in))
            if verbose and i % 10 == 0:
                print(f"t={latest[H_SIM_TIME]:8.0f}s  "
                      f"Cl_out={cl_out:5.2f} mg/L (sp {cl_setpoint})  "
                      f"pH_in={ph_in:5.2f} (sp {ph_setpoint})  "
                      f"ClCmd={cl_cmd:.2f}  AcidCmd={acid_cmd:.2f}")
        c.delete_subscriptions([sub_id])
        if verbose:
            print(f"done: {publishes} publishes, "
                  f"{changes_total} pushed data changes")
    return history


def free_port(host="127.0.0.1"):
    import socket

    s = socket.socket()
    s.bind((host, 0))
    port = s.getsockname()[1]
    s.close()
    return port


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=None,
                        help="OPC UA port (default 4840; --spawn picks a "
                             "free ephemeral port unless one is given)")
    parser.add_argument("--publishes", type=int, default=60,
                        help="number of Publish round-trips to run")
    parser.add_argument("--interval", type=float, default=0.25,
                        help="requested publishing interval [s]")
    parser.add_argument("--cl-setpoint", type=float, default=2.5)
    parser.add_argument("--ph-setpoint", type=float, default=7.0)
    parser.add_argument("--spawn", action="store_true",
                        help="spawn the simulator in-process (demo mode)")
    args = parser.parse_args()

    if args.port is None:
        args.port = free_port(args.host) if args.spawn else 4840

    sim_thread = None
    if args.spawn:
        import ics_wt_physicsengine_tpu.__main__ as orch
        orch.running = True
        # rtf bounds simulated time per control action, as in
        # pid_controller.py --spawn
        sim_thread = threading.Thread(
            target=orch.main,
            args=(["--port", str(free_port(args.host)), "--host",
                   args.host, "--opcua", str(args.port), "--dt", "30",
                   "--rtf", "300", "--seed", "1", "--recal-hours", "6"],),
            daemon=True)
        sim_thread.start()
        deadline = time.time() + 120   # 1-core host: startup JIT under load
        while time.time() < deadline:
            try:
                OPCUAClient(args.host, args.port, timeout=5).connect() \
                    .close()
                break
            except OSError:
                time.sleep(0.3)
        else:
            raise SystemExit("simulator did not start")

    try:
        scada_loop(args.host, args.port, args.publishes, args.interval,
                   args.cl_setpoint, args.ph_setpoint)
    finally:
        if sim_thread is not None:
            from examples.pid_controller import shutdown_sim
            shutdown_sim(sim_thread)


if __name__ == "__main__":
    main()
