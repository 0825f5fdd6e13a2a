"""Wire-level fuzzing of both Modbus/TCP data planes.

An ICS-facing server must survive arbitrary garbage on the wire: malformed
MBAP headers, truncated PDUs, illegal function codes, oversized counts,
random bytes mid-stream. After every fuzz barrage the server must still
answer a well-formed request correctly on a fresh connection — no crash, no
wedged poll loop, no corrupted register state. Deterministic RNG so any
failure reproduces.

(The reference delegates framing to pymodbus and never tests this; both
from-scratch planes here get the same barrage.)
"""

import socket
import struct

import numpy as np
import pytest

from ics_wt_physicsengine_tpu.modbus import (
    ModbusRegisterMap,
    ModbusServerConfig,
    ModbusSlave,
    ModbusTcpClient,
)

N_FRAMES = 300


def _random_frames(rng):
    """A mix of structurally valid frames with hostile PDUs and raw noise."""
    frames = []
    for _ in range(N_FRAMES):
        kind = rng.integers(0, 4)
        if kind == 0:
            # valid MBAP, random PDU (random fc + random payload)
            pdu = bytes(rng.integers(0, 256, rng.integers(1, 40),
                                     dtype=np.uint8))
            frames.append(struct.pack(">HHHB", int(rng.integers(0, 65536)),
                                      0, len(pdu) + 1, 1) + pdu)
        elif kind == 1:
            # valid fc, hostile address/count (overflow, zero, max)
            fc = int(rng.choice([1, 2, 3, 4, 5, 6, 15, 16]))
            addr = int(rng.choice([0, 1, 9, 100, 0xFFFE, 0xFFFF]))
            cnt = int(rng.choice([0, 1, 125, 126, 2000, 2001, 0xFFFF]))
            pdu = struct.pack(">BHH", fc, addr, cnt)
            frames.append(struct.pack(">HHHB", 7, 0, len(pdu) + 1, 1) + pdu)
        elif kind == 2:
            # corrupt MBAP: wrong protocol id / absurd length field
            proto = int(rng.choice([0, 1, 0xFFFF]))
            length = int(rng.choice([0, 1, 2, 254, 255, 0xFFFF]))
            frames.append(struct.pack(">HHHB", 7, proto, length, 1)
                          + bytes(rng.integers(0, 256, 4, dtype=np.uint8)))
        else:
            # raw noise, not even a header
            frames.append(bytes(rng.integers(
                0, 256, rng.integers(1, 64), dtype=np.uint8)))
    return frames


def _barrage(port, frames):
    """Fire the frames over several short-lived connections, ignoring any
    responses/disconnects (a hostile client doesn't read)."""
    chunk = max(1, len(frames) // 8)
    for i in range(0, len(frames), chunk):
        try:
            with socket.create_connection(("127.0.0.1", port),
                                          timeout=2) as s:
                s.settimeout(0.2)
                for f in frames[i:i + chunk]:
                    s.sendall(f)
                try:
                    while s.recv(4096):
                        pass
                except (socket.timeout, OSError):
                    pass
        except OSError:
            pass   # server may drop hostile connections mid-send: fine


def _assert_alive_and_correct(slave, port):
    slave.update_input_register("pH_inlet", 7.25)
    with ModbusTcpClient("127.0.0.1", port) as c:
        assert c.read_float32(0) == pytest.approx(7.25, abs=1e-5)
        c.write_float32(0, 0.75)
    assert slave.read_holding_register("acid_flow_rate") == \
        pytest.approx(0.75)


def test_python_slave_survives_fuzz():
    rng = np.random.default_rng(1234)
    slave = ModbusSlave(ModbusRegisterMap(),
                        ModbusServerConfig(host="127.0.0.1", port=0))
    slave.start(blocking=False)
    try:
        _assert_alive_and_correct(slave, slave.port)
        _barrage(slave.port, _random_frames(rng))
        _assert_alive_and_correct(slave, slave.port)
        assert slave.is_running
    finally:
        slave.stop()


def test_native_slave_survives_fuzz():
    from ics_wt_physicsengine_tpu.modbus import native_slave

    if not native_slave.is_available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(4321)
    slave = native_slave.NativeModbusSlave(
        ModbusRegisterMap(), ModbusServerConfig(host="127.0.0.1", port=0))
    slave.start(blocking=False)
    try:
        _assert_alive_and_correct(slave, slave.port)
        _barrage(slave.port, _random_frames(rng))
        _assert_alive_and_correct(slave, slave.port)
    finally:
        slave.stop()


def test_fuzz_multi_unit_isolation():
    """Garbage aimed at unit 1 never corrupts unit 2's register space."""
    rng = np.random.default_rng(77)
    slave = ModbusSlave(ModbusRegisterMap(),
                        ModbusServerConfig(host="127.0.0.1", port=0),
                        units=[1, 2])
    slave.start(blocking=False)
    try:
        slave.update_input_register("pH_inlet", 6.66, unit=2)
        _barrage(slave.port, _random_frames(rng))
        with ModbusTcpClient("127.0.0.1", slave.port, unit_id=2) as c:
            assert c.read_float32(0) == pytest.approx(6.66, abs=1e-5)
    finally:
        slave.stop()


def test_connection_cap_rejects_excess_masters():
    """config.max_connections caps live connections: the (max+1)th client
    is closed immediately, and capacity frees when a client disconnects."""
    import time

    slave = ModbusSlave(ModbusRegisterMap(),
                        ModbusServerConfig(host="127.0.0.1", port=0,
                                           max_connections=2))
    slave.start(blocking=False)
    try:
        slave.update_input_register("pH_inlet", 7.0)
        c1 = ModbusTcpClient("127.0.0.1", slave.port).connect()
        c2 = ModbusTcpClient("127.0.0.1", slave.port).connect()
        assert c1.read_float32(0) == pytest.approx(7.0, abs=1e-5)
        assert c2.read_float32(0) == pytest.approx(7.0, abs=1e-5)

        # third connection: accepted at TCP level but closed by the server
        c3 = ModbusTcpClient("127.0.0.1", slave.port, timeout=2).connect()
        with pytest.raises((OSError, IOError)):
            c3.read_float32(0)
        c3.close()

        # capacity frees on disconnect (poll: the event loop must
        # process the EOF before a slot opens)
        c2.close()
        deadline = time.time() + 10.0
        value = None
        while time.time() < deadline:
            try:
                with ModbusTcpClient("127.0.0.1", slave.port,
                                     timeout=1.0) as c4:
                    value = c4.read_float32(0)
                break
            except (OSError, IOError):
                time.sleep(0.1)
        assert value == pytest.approx(7.0, abs=1e-5)
        c1.close()
    finally:
        slave.stop()


def test_drip_feeding_slow_loris_is_dropped():
    """A peer that keeps the socket warm with a byte-drip but never
    completes a frame must still lose its cap slot: activity is stamped
    on COMPLETED frames only, so to the reaper this connection is idle
    (the chunk-level stamp would have made byte-drips immortal)."""
    import threading
    import time

    slave = ModbusSlave(ModbusRegisterMap(),
                        ModbusServerConfig(host="127.0.0.1", port=0,
                                           max_connections=1,
                                           idle_timeout_seconds=2.0))
    slave.start(blocking=False)
    try:
        slave.update_input_register("pH_inlet", 7.5)
        loris = socket.create_connection(("127.0.0.1", slave.port))
        stop = threading.Event()

        def drip():
            # one header byte per 0.4 s: never enough for a 7-byte MBAP
            # header within any window, socket never goes byte-silent
            while not stop.is_set():
                try:
                    loris.sendall(b"\x00")
                except OSError:
                    return
                stop.wait(0.4)

        t = threading.Thread(target=drip, daemon=True)
        t.start()
        # the dripper holds the only slot right now
        time.sleep(0.2)
        with ModbusTcpClient("127.0.0.1", slave.port, timeout=1.0) as c:
            with pytest.raises((OSError, IOError)):
                c.read_float32(0)
        # ...but the reaper drops it despite the drip
        deadline = time.time() + 10.0
        value = None
        while time.time() < deadline:
            try:
                with ModbusTcpClient("127.0.0.1", slave.port,
                                     timeout=1.0) as c:
                    value = c.read_float32(0)
                break
            except (OSError, IOError):
                time.sleep(0.1)
        assert value == pytest.approx(7.5, abs=1e-5), \
            "drip-feeding connection was never reaped"
        stop.set()
        loris.close()
    finally:
        slave.stop()


def test_idle_connections_are_dropped():
    """A connection that sends nothing is dropped after idle_timeout_seconds
    (slow-loris defense), freeing its cap slot for a real master."""
    import time

    slave = ModbusSlave(ModbusRegisterMap(),
                        ModbusServerConfig(host="127.0.0.1", port=0,
                                           max_connections=1,
                                           idle_timeout_seconds=2.0))
    slave.start(blocking=False)
    try:
        slave.update_input_register("pH_inlet", 7.5)
        idle = socket.create_connection(("127.0.0.1", slave.port))
        # the idle holder occupies the only slot...
        time.sleep(0.1)
        with ModbusTcpClient("127.0.0.1", slave.port, timeout=1.0) as c:
            with pytest.raises((OSError, IOError)):
                c.read_float32(0)
        # ...until the idle timeout drops it
        deadline = time.time() + 10.0
        value = None
        while time.time() < deadline:
            try:
                with ModbusTcpClient("127.0.0.1", slave.port,
                                     timeout=1.0) as c:
                    value = c.read_float32(0)
                break
            except (OSError, IOError):
                time.sleep(0.1)
        assert value == pytest.approx(7.5, abs=1e-5)
        idle.close()
    finally:
        slave.stop()


def test_slow_reader_is_dropped():
    """A client that pipelines requests but never reads responses must be
    dropped once drain() exceeds idle_timeout_seconds (write-side
    slow-loris: the read-side idle defense never fires because requests
    keep arriving), freeing its cap slot for a real master. Mirrors the
    C++ plane's kMaxOutBuffer slow-reader drop."""
    import struct
    import time

    slave = ModbusSlave(ModbusRegisterMap(),
                        ModbusServerConfig(host="127.0.0.1", port=0,
                                           max_connections=1,
                                           idle_timeout_seconds=2.0))
    slave.start(blocking=False)
    try:
        slave.update_input_register("pH_inlet", 6.25)
        hog = socket.create_connection(("127.0.0.1", slave.port))
        hog.setsockopt(socket.SOL_SOCKET, socket.SO_RCVBUF, 4096)
        # FC 4 read of 125 input registers -> ~260-byte responses; flood
        # until the server's socket buffer fills and drain() blocks.
        req = struct.pack(">HHHBBHH", 1, 0, 6, 1, 4, 0, 125)
        hog.settimeout(0.5)
        dropped = False
        deadline = time.time() + 8.0
        try:
            while time.time() < deadline:
                try:
                    hog.sendall(req * 64)
                except socket.timeout:
                    # our own send buffer is full too: the server stopped
                    # reading (it is parked in drain) — now wait out the
                    # drain timeout
                    time.sleep(0.1)
                    continue
        except (BrokenPipeError, ConnectionResetError, OSError):
            dropped = True
        # Whether or not the send raised, the cap slot must come free.
        deadline = time.time() + 15.0
        value = None
        while time.time() < deadline:
            try:
                with ModbusTcpClient("127.0.0.1", slave.port,
                                     timeout=1.0) as c:
                    value = c.read_float32(0)
                break
            except (OSError, IOError):
                time.sleep(0.2)
        assert value == pytest.approx(6.25, abs=1e-5), \
            f"slot never freed (dropped={dropped})"
        hog.close()
    finally:
        slave.stop()
