"""
Relay (Åström–Hägglund) autotuning of the chlorine loop over Modbus.

The reference's roadmap lists "Control tuning utilities (Ziegler-Nichols,
Lambda)" as Phase 2 future work (reference README.md:438). Control stays
external by design ("this is the plant, not the controller"), so the
utility lives here as a SCADA-side script: it excites the plant with relay
feedback on the chlorine dosing pump, measures the induced limit cycle
(ultimate period Tu and amplitude), derives the ultimate gain
Ku = 4d / (pi * a), converts to Ziegler–Nichols PI gains, then closes the
loop with the tuned controller and reports tracking.

Everything happens over the real Modbus/TCP interface against the free-
running simulator — the same experiment an engineer would run against the
physical plant.

Usage:
  python examples/relay_autotune.py                  # self-spawning
  python examples/relay_autotune.py --host H --port P
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ics_wt_physicsengine_tpu.modbus import ModbusTcpClient  # noqa: E402
from examples.pid_controller import PID, free_port, shutdown_sim  # noqa: E402

CL_OUT_REG = 8          # chlorine_outlet input register
SIM_TIME_REG = 100      # simulation_time input register
CL_CMD_REG = 2          # chlorine_flow_rate holding register


def relay_experiment(client, setpoint, lo, hi, n_switches, poll_s=0.05,
                     timeout_s=240.0, verbose=True):
    """Drive the dosing pump as a relay around ``setpoint``; return the
    limit cycle's switch times [sim s] and the output amplitude."""
    switches = []            # (sim_time, direction) at each relay flip
    values = []
    state_hi = True
    client.write_float32(CL_CMD_REG, hi)
    deadline = time.time() + timeout_s
    while len(switches) < n_switches and time.time() < deadline:
        t_sim = client.read_float32(SIM_TIME_REG)
        cl = client.read_float32(CL_OUT_REG)
        if cl > 0.0:          # past warm-up placeholder
            values.append(cl)
            if state_hi and cl > setpoint:
                state_hi = False
                client.write_float32(CL_CMD_REG, lo)
                switches.append(t_sim)
                if verbose:
                    print(f"[relay] switch LO at t={t_sim:8.0f}s "
                          f"cl={cl:.3f}", flush=True)
            elif not state_hi and cl < setpoint:
                state_hi = True
                client.write_float32(CL_CMD_REG, hi)
                switches.append(t_sim)
                if verbose:
                    print(f"[relay] switch HI at t={t_sim:8.0f}s "
                          f"cl={cl:.3f}", flush=True)
        time.sleep(poll_s)
    if len(switches) < n_switches:
        raise RuntimeError(f"relay produced only {len(switches)} switches "
                           f"within {timeout_s}s wall")
    return switches, values


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=None)
    ap.add_argument("--setpoint", type=float, default=1.0,
                    help="chlorine residual setpoint [mg/L]")
    ap.add_argument("--switches", type=int, default=8,
                    help="relay switches to record (>= 6 for a stable Tu)")
    ap.add_argument("--verify-iterations", type=int, default=150,
                    help="closed-loop iterations with the tuned PI")
    args = ap.parse_args()

    import numpy as np

    spawn = args.port is None
    sim_thread = None
    if spawn:
        import ics_wt_physicsengine_tpu.__main__ as orch

        args.port = free_port(args.host)
        orch.running = True
        sim_thread = threading.Thread(
            target=orch.main,
            args=(["--port", str(args.port), "--host", args.host,
                   "--dt", "30", "--duration", "10000000", "--rtf", "0",
                   "--seed", "2", "--zones", "5", "--recal-hours", "2"],),
            daemon=True)
        sim_thread.start()

    try:
        client = None
        deadline = time.time() + 120   # 1-core host: startup JIT under load
        while time.time() < deadline:
            try:
                client = ModbusTcpClient(args.host, args.port,
                                         timeout=10).connect()
                break
            except OSError:
                time.sleep(0.3)
        if client is None:
            raise SystemExit("simulator unreachable")

        # wait for the chlorine sensor to report
        while client.read_float32(CL_OUT_REG) <= 0.0:
            time.sleep(0.2)

        # --- relay experiment -> Tu, Ku ------------------------------------
        lo, hi = 0.0, 0.5                   # [L/min] dosing relay levels
        switches, values = relay_experiment(
            client, args.setpoint, lo, hi, args.switches)
        # steady cycle: use the last switches; one full period = 2 switches
        periods = np.diff(switches)[-(args.switches - 2):]
        tu = 2.0 * float(np.mean(periods))
        tail = np.array(values[len(values) // 2:])
        a = float((tail.max() - tail.min()) / 2.0)
        d = (hi - lo) / 2.0
        ku = 4.0 * d / (np.pi * a)
        # Ziegler-Nichols PI
        kp = 0.45 * ku
        ti = tu / 1.2
        ki = kp / ti

        # --- verify: close the loop with the tuned PI ----------------------
        pid = PID(kp=kp, ki=ki, kd=0.0, setpoint=args.setpoint,
                  out_min=lo, out_max=2 * hi)
        errors = []
        t_last = client.read_float32(SIM_TIME_REG)
        for _ in range(args.verify_iterations):
            t_sim = client.read_float32(SIM_TIME_REG)
            cl = client.read_float32(CL_OUT_REG)
            dt_sim = t_sim - t_last
            t_last = t_sim
            if cl > 0.0 and dt_sim > 0.0:
                client.write_float32(CL_CMD_REG, pid.update(cl, dt_sim))
                errors.append(cl - args.setpoint)
            time.sleep(0.05)
        settled = np.array(errors[len(errors) // 2:])

        print(json.dumps({
            "relay": {"lo_L_min": lo, "hi_L_min": hi,
                      "switches": len(switches)},
            "ultimate_period_Tu_s": round(tu, 1),
            "oscillation_amplitude_mg_L": round(a, 4),
            "ultimate_gain_Ku": round(ku, 4),
            "ziegler_nichols_PI": {"kp": round(kp, 4),
                                   "ki_per_s": round(ki, 6)},
            "closed_loop_settled_rms_error_mg_L": round(
                float(np.sqrt(np.mean(settled ** 2))), 4)
            if len(settled) else None,
        }, indent=2))
        client.close()
    finally:
        if sim_thread is not None:
            shutdown_sim(sim_thread)


if __name__ == "__main__":
    main()
