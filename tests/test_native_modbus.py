"""Native C++ Modbus data plane: same contract as the Python server, driven
over a real TCP socket."""

import struct
import socket

import numpy as np
import pytest

from ics_wt_physicsengine_tpu.modbus import (
    ModbusRegisterMap,
    ModbusServerConfig,
    ModbusTcpClient,
)
from ics_wt_physicsengine_tpu.modbus.native_slave import (
    NativeModbusSlave,
    is_available,
)

pytestmark = pytest.mark.skipif(not is_available(),
                                reason="native library unavailable")


@pytest.fixture()
def slave():
    s = NativeModbusSlave(ModbusRegisterMap(),
                          ModbusServerConfig(host="127.0.0.1", port=0))
    s.start()
    yield s
    s.stop()


def test_round_trip_over_tcp(slave):
    slave.update_input_register("pH_inlet", 7.31)
    slave.update_input_register("system_status", 2)
    slave.update_discrete_input("sensor_fault_chlorine", True)
    with ModbusTcpClient("127.0.0.1", slave.port) as c:
        assert c.read_float32(0) == pytest.approx(7.31, rel=1e-6)
        assert c.read_input_registers(102, 1) == [2]
        assert c.read_discrete_inputs(0, 3) == [False, False, True]
        c.write_float32(0, 0.9)
        c.write_coil(2, True)
    assert slave.read_holding_register("acid_flow_rate") == \
        pytest.approx(0.9, rel=1e-6)
    assert slave.read_coil("simulation_running") is True
    assert slave.request_count >= 5
    assert slave.error_count == 0


def test_nan_round_trip(slave):
    slave.update_input_register("pH_outlet", float("nan"))
    with ModbusTcpClient("127.0.0.1", slave.port) as c:
        assert np.isnan(c.read_float32(4))


def test_exceptions(slave):
    with ModbusTcpClient("127.0.0.1", slave.port) as c:
        with pytest.raises(IOError):
            c.read_input_registers(5000, 2)     # illegal address
        with pytest.raises(IOError):
            c.read_input_registers(0, 0)        # illegal count
    assert slave.error_count >= 2


def test_illegal_function(slave):
    with socket.create_connection(("127.0.0.1", slave.port), 5) as sock:
        sock.sendall(struct.pack(">HHHB", 1, 0, 2, 1) + bytes([0x2B]))
        resp = sock.recv(64)
    assert resp[7] == 0x2B | 0x80 and resp[8] == 0x01


def test_garbage_disconnects_only_that_client(slave):
    with socket.create_connection(("127.0.0.1", slave.port), 5) as sock:
        sock.sendall(b"\xff" * 64)              # invalid protocol id
        # server drops the connection
        sock.settimeout(2.0)
        assert sock.recv(64) == b""
    # still serving others
    slave.update_input_register("flow_rate", 5.5)
    with ModbusTcpClient("127.0.0.1", slave.port) as c:
        assert c.read_float32(10) == pytest.approx(5.5, rel=1e-6)


def _connect_retry(port, attempts=5, timeout=30):
    import time as _time
    last = None
    for _ in range(attempts):
        try:
            return ModbusTcpClient("127.0.0.1", port, timeout=timeout) \
                .connect()
        except OSError as e:      # scheduling noise on the shared 1-core host
            last = e
            _time.sleep(0.5)
    raise last


def test_many_clients(slave):
    slave.update_input_register("pH_inlet", 7.0)
    clients = [_connect_retry(slave.port) for _ in range(12)]
    try:
        for c in clients:
            assert c.read_float32(0) == pytest.approx(7.0)
    finally:
        for c in clients:
            c.close()


def test_restart(slave):
    slave.stop()
    assert not slave.is_running
    slave.start()
    assert slave.is_running
    with ModbusTcpClient("127.0.0.1", slave.port) as c:
        c.read_input_registers(0, 2)


def test_write_multiple_coils_fc15_native(slave):
    with ModbusTcpClient("127.0.0.1", slave.port) as client:
        client.write_coils(0, [False, True, True])
        assert client.read_coils(0, 3) == [False, True, True]


def test_device_identification_fc43_native(slave):
    with ModbusTcpClient("127.0.0.1", slave.port) as client:
        basic = client.read_device_identification(read_code=0x01)
        assert basic[0x00] == "ICS-WT-PhysicsEngine-TPU"
        assert basic[0x01] == "WTS-TPU"
        assert basic[0x02] == "1.0"
        regular = client.read_device_identification(read_code=0x02)
        assert regular[0x04] == "Water Treatment Simulator (TPU)"
        assert regular[0x05] == "CSTR-MultiZone"
        one = client.read_device_identification(read_code=0x04,
                                                object_id=0x01)
        assert one == {0x01: "WTS-TPU"}
        with pytest.raises(IOError, match="exception 2"):
            client.read_device_identification(read_code=0x04,
                                              object_id=0x63)
        with pytest.raises(IOError, match="exception 3"):
            client.read_device_identification(read_code=0x07)


def test_unit_id_mismatch_ignored_native(slave):
    slave.update_input_register("pH_inlet", 7.5)
    with ModbusTcpClient("127.0.0.1", slave.port, unit_id=9) as client:
        client._sock.settimeout(0.5)
        pdu = struct.pack(">BHH", 0x04, 0, 2)
        req = struct.pack(">HHHB", 1, 0, len(pdu) + 1, 9) + pdu
        client._sock.sendall(req)
        with pytest.raises(socket.timeout):
            client._sock.recv(16)
    for unit in (1, 0xFF):
        with ModbusTcpClient("127.0.0.1", slave.port, unit_id=unit) as c:
            assert c.read_float32(0) == pytest.approx(7.5, rel=1e-6)


def test_fc15_count_zero_illegal_value_native(slave):
    with ModbusTcpClient("127.0.0.1", slave.port) as client:
        pdu = struct.pack(">BHHB", 0x0F, 0, 0, 0)
        client._transaction += 1
        req = struct.pack(">HHHB", client._transaction, 0, len(pdu) + 1,
                          1) + pdu
        client._sock.sendall(req)
        client._recv_exact(7)
        resp = client._recv_exact(2)
        assert resp[0] == 0x8F and resp[1] == 3


def test_slow_reader_does_not_stall_others_native(slave):
    """A client that stops reading its responses must not freeze the poll
    thread: other masters keep getting sub-second service (non-blocking
    accepted sockets + per-connection write buffering)."""
    slave.update_input_register("pH_inlet", 7.0)
    # Stuffer: fire many requests without ever reading responses, so the
    # server's send path backs up on this connection.
    stuffer = socket.create_connection(("127.0.0.1", slave.port))
    stuffer.setsockopt(socket.SOL_SOCKET, socket.SO_RCVBUF, 2048)
    pdu = struct.pack(">BHH", 0x04, 0, 125)
    req = struct.pack(">HHHB", 1, 0, len(pdu) + 1, 1) + pdu
    try:
        stuffer.setblocking(False)
        sent_any = True
        for _ in range(5000):
            try:
                stuffer.sendall(req * 8)
            except (BlockingIOError, InterruptedError):
                break
        # Meanwhile a well-behaved master must still be served promptly.
        with ModbusTcpClient("127.0.0.1", slave.port) as client:
            client._sock.settimeout(2.0)
            for _ in range(20):
                assert client.read_float32(0) == pytest.approx(7.0,
                                                               rel=1e-6)
        assert sent_any
    finally:
        stuffer.close()


def test_mask_write_and_read_write_multiple_native(slave):
    """FC 22 / FC 23 on the C++ data plane — same semantics as the
    Python plane (mask math, write-before-read ordering, value faults)."""
    with ModbusTcpClient("127.0.0.1", slave.port, timeout=5) as client:
        client.write_registers(10, [0x12FF])
        client.mask_write_register(10, 0xFFF0, 0x0004)
        assert client.read_holding_registers(10, 1) == [0x12F4]

        out = client.read_write_registers(20, 2, 20, [0xAAAA, 0xBBBB])
        assert out == [0xAAAA, 0xBBBB]
        assert client.read_holding_registers(20, 2) == [0xAAAA, 0xBBBB]

        import struct as _struct
        with pytest.raises(IOError):
            client._transact(_struct.pack(">BHHHHB", 0x17, 0, 1, 0, 0, 0))


def test_diagnostics_fc08_native(slave):
    """FC 08 Diagnostics on the C++ data plane: wire counters match the
    mb_diag_counters C API, exceptions are counted, clear resets."""
    from ics_wt_physicsengine_tpu.modbus import ModbusTcpClient

    with ModbusTcpClient("127.0.0.1", slave.port, timeout=5) as client:
        assert client.diagnostics(0x0000, 0xBEEF) == 0xBEEF

        client.read_input_registers(0, 2)
        d = client.diagnostic_counters()
        assert d["bus_message_count"] >= 2
        assert d["slave_message_count"] >= 2
        assert d["bus_comm_error_count"] == 0

        before = d["bus_exception_count"]
        import pytest as _pytest
        with _pytest.raises(IOError):
            client.read_input_registers(60000, 10)
        assert client.diagnostics(0x0D) == before + 1

        with _pytest.raises(IOError):
            client.diagnostics(0x0063)

        # host-side accessor agrees with the wire (within the in-flight
        # requests this very read adds)
        host = slave.diagnostics()
        assert host["bus_exception_count"] == before + 2  # + illegal sub
        assert set(host) == {
            "bus_message_count", "bus_comm_error_count",
            "bus_exception_count", "slave_message_count",
            "slave_no_response_count"}

        client.diagnostics(0x000A)
        assert client.diagnostics(0x0D) == 0
