"""
Measured fast-time HIL serving benchmark (VERDICT r3 item 4).

Runs the REAL orchestrator (`python -m ics_wt_physicsengine_tpu`) with
--serve-chunk fast-time serving and a LIVE Modbus/TCP client attached that
polls the register plane and periodically rewrites an actuator command
(so the loop is genuinely closed over the wire), then measures the served
real-time factor as d(simulation_time register)/d(wall clock).

The reference's serving ceiling is ~31 steps/s at 20 zones (one physics
step per host tick, reference __main__.py:453-457). Target here:
>= 1,000x real time on the served plane.

Usage:  python tools/serve_bench.py [--chunk 1024] [--zones 20]
        [--window 20] [--out SERVE_r04.json]
"""

import argparse
import json
import os
import socket
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=1024)
    ap.add_argument("--zones", type=int, default=20)
    ap.add_argument("--window", type=float, default=20.0,
                    help="measurement window [wall seconds]")
    ap.add_argument("--backend", default="cpu",
                    choices=["cpu", "tpu", "default"])
    ap.add_argument("--fleet", type=int, default=1,
                    help="measure the FLEET serving plane: N independently "
                         "controlled plants on one endpoint, each advancing "
                         "chunk steps per exchange in one batched device "
                         "call (unit ids 1..N)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    port = _free_port()
    cmd = [sys.executable, "-m", "ics_wt_physicsengine_tpu",
           "--port", str(port), "--host", "127.0.0.1", "--dt", "1.0",
           "--duration", "1e18", "--rtf", "0", "--seed", "7",
           "--zones", str(args.zones),
           "--serve-chunk", str(args.chunk), "--backend", args.backend]
    cmd += (["--fleet", str(args.fleet)] if args.fleet > 1
            else ["--fused-sensors"])
    sim = subprocess.Popen(cmd, cwd=REPO, stdout=subprocess.DEVNULL,
                           stderr=subprocess.DEVNULL)
    result = {"ok": False, "chunk": args.chunk, "zones": args.zones,
              "fleet": args.fleet, "backend": args.backend, "dt": 1.0}
    try:
        from ics_wt_physicsengine_tpu.modbus import ModbusTcpClient

        client = None
        deadline = time.time() + 120
        while time.time() < deadline:
            try:
                client = ModbusTcpClient("127.0.0.1", port,
                                         timeout=5).connect()
                break
            except OSError:
                time.sleep(0.3)
        if client is None:
            result["reason"] = "orchestrator Modbus server did not start"
            print(json.dumps(result))
            return 1

        # Wait out the first (compiling) chunk, then let it free-run a bit.
        deadline = time.time() + 600
        while time.time() < deadline:
            if client.read_float32(100) >= args.chunk:
                break
            time.sleep(0.5)

        # Live closed loop during measurement: poll registers and rewrite
        # the acid command every 100 ms, like a SCADA scan cycle.
        t_sim0 = client.read_float32(100)
        t_wall0 = time.monotonic()
        polls = 0
        ph_samples = []
        while time.monotonic() - t_wall0 < args.window:
            ph_samples.append(client.read_float32(0))      # pH_inlet
            client.read_float32(4)                         # pH_outlet
            client.write_float32(0, 0.05 if polls % 2 else 0.0)
            polls += 1
            time.sleep(0.1)
        t_sim1 = client.read_float32(100)
        t_wall1 = time.monotonic()
        client.write_float32(0, 0.0)
        client.close()

        wall = t_wall1 - t_wall0
        served_steps = t_sim1 - t_sim0     # dt = 1 s -> steps == sim seconds
        rtf = served_steps / wall          # per-lane real-time factor
        # In-range pH polls: at >=10,000x real time, whole sim-DAYS pass per
        # wall-minute, so latched sensor faults legitimately park the
        # register at the 0.0 fault placeholder between the 24h-recal
        # maintenances — liveness means the plane answers and SOME polls
        # catch a healthy reading, not that every poll does.
        finite = [p for p in ph_samples if p == p and 0.0 < p < 14.0]
        result.update({
            "ok": rtf >= 1000.0 and polls > 0 and len(finite) >= 1,
            "served_steps_per_sec": round(rtf * args.fleet, 1),
            "served_rtf": round(rtf, 1),
            "vs_reference_serving": round(rtf * args.fleet / 31.0, 1),
            "wall_window_s": round(wall, 2),
            "client_polls": polls,
            "live_ph_samples_ok": len(finite),
        })
        print(json.dumps(result))
        return 0 if result["ok"] else 1
    finally:
        sim.terminate()
        try:
            sim.wait(timeout=15)
        except subprocess.TimeoutExpired:
            sim.kill()
        if args.out:
            with open(os.path.join(REPO, args.out), "w") as f:
                json.dump(result, f, indent=1)


if __name__ == "__main__":
    sys.exit(main())
