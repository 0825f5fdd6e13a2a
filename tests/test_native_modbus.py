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
