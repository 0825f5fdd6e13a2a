"""
Modbus data-plane load test: many concurrent masters hammering one server.

The reference's roadmap lists "Load testing (1000+ Modbus clients)" as
Phase 4 future work (reference README.md:454); this tool delivers the
measurement for both planes. N worker threads each hold one connection and
issue back-to-back read-input-register requests for a fixed duration;
reports aggregate requests/s, per-request latency percentiles, and error
counts. Connections beyond the server's cap are expected to be refused
(that is the hardening working, not a failure) — the tool reports how many
workers got slots.

Usage:
  python tools/load_modbus.py [--clients 32] [--seconds 5] [--native]
"""

import argparse
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ics_wt_physicsengine_tpu.modbus import (  # noqa: E402
    ModbusRegisterMap,
    ModbusServerConfig,
    ModbusSlave,
    ModbusTcpClient,
)


def worker(port, stop, stats, idx):
    lat = []
    n = err = 0
    try:
        with ModbusTcpClient("127.0.0.1", port, timeout=5) as c:
            # one probe read proves we actually hold a slot
            c.read_input_registers(0, 2)
            stats["connected"][idx] = True
            while not stop.is_set():
                t0 = time.perf_counter()
                try:
                    c.read_input_registers(0, 2)
                    lat.append(time.perf_counter() - t0)
                    n += 1
                except Exception:  # noqa: BLE001
                    err += 1
                    break
    except Exception:  # noqa: BLE001
        pass   # refused at the connection cap: reported via `connected`
    stats["requests"][idx] = n
    stats["errors"][idx] = err
    stats["latencies"][idx] = lat


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--clients", type=int, default=32)
    ap.add_argument("--seconds", type=float, default=5.0)
    ap.add_argument("--native", action="store_true",
                    help="load the C++ data plane instead of the Python "
                         "asyncio server")
    ap.add_argument("--max-connections", type=int, default=None,
                    help="server-side cap (default: fit the client count; "
                         "the C++ plane is compile-time capped at 64)")
    args = ap.parse_args()

    cap = args.max_connections or max(32, args.clients + 4)
    config = ModbusServerConfig(host="127.0.0.1", port=0,
                                max_connections=cap)
    if args.native:
        from ics_wt_physicsengine_tpu.modbus import native_slave

        if not native_slave.is_available():
            raise SystemExit("native library unavailable")
        slave = native_slave.NativeModbusSlave(ModbusRegisterMap(), config)
    else:
        slave = ModbusSlave(ModbusRegisterMap(), config)
    slave.start(blocking=False)
    slave.update_input_register("pH_inlet", 7.2)

    stop = threading.Event()
    stats = {"requests": [0] * args.clients,
             "errors": [0] * args.clients,
             "latencies": [[] for _ in range(args.clients)],
             "connected": [False] * args.clients}
    threads = [threading.Thread(target=worker,
                                args=(slave.port, stop, stats, i),
                                daemon=True)
               for i in range(args.clients)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    time.sleep(args.seconds)
    stop.set()
    for t in threads:
        t.join(timeout=10)
    wall = time.perf_counter() - t0
    slave.stop()

    import numpy as np
    total = sum(stats["requests"])
    lats = np.array([x for ls in stats["latencies"] for x in ls])
    print(json.dumps({
        "plane": "native-c++" if args.native else "python-asyncio",
        "clients_requested": args.clients,
        "clients_served": int(sum(stats["connected"])),
        "seconds": round(wall, 2),
        "total_requests": total,
        "requests_per_s": round(total / wall, 1),
        "latency_ms": {
            "p50": round(float(np.percentile(lats, 50)) * 1e3, 3),
            "p95": round(float(np.percentile(lats, 95)) * 1e3, 3),
            "p99": round(float(np.percentile(lats, 99)) * 1e3, 3),
        } if len(lats) else None,
        "errors": int(sum(stats["errors"])),
    }))


if __name__ == "__main__":
    main()
