"""Modbus layer tests: register map invariants, encoding round-trips, and
live TCP server integration over a real socket (reference strategy:
protocols.py:266-330 validation + slave.py:400-438 live demo)."""

import numpy as np
import pytest

from ics_wt_physicsengine_tpu.modbus import (
    ModbusDecoder,
    ModbusEncoder,
    ModbusRegisterMap,
    ModbusServerConfig,
    ModbusSlave,
    ModbusTcpClient,
    RegisterType,
    validate_encoding,
)


# ---------------------------------------------------------------------------
# Register map
# ---------------------------------------------------------------------------

def test_register_map_layout_matches_reference():
    m = ModbusRegisterMap()
    # addresses per reference register_map.py:119-401
    assert m.get_register_by_name("pH_inlet").address == 0
    assert m.get_register_by_name("pH_middle").address == 2
    assert m.get_register_by_name("pH_outlet").address == 4
    assert m.get_register_by_name("chlorine_inlet").address == 6
    assert m.get_register_by_name("chlorine_outlet").address == 8
    assert m.get_register_by_name("flow_rate").address == 10
    assert m.get_register_by_name("temperature_inlet").address == 12
    assert m.get_register_by_name("temperature_outlet").address == 14
    assert m.get_register_by_name("simulation_time").address == 100
    assert m.get_register_by_name("system_status").address == 102
    assert m.get_register_by_name("acid_flow_rate").address == 0
    assert m.get_register_by_name("inlet_flow_rate").address == 4
    assert m.get_register_by_name("simulation_timestep").address == 100
    assert m.get_register_by_name("acid_pump_enable").address == 0
    assert m.get_register_by_name("sensor_fault_chlorine").address == 2
    assert len(m.input_registers) == 10
    assert len(m.holding_registers) == 6
    assert len(m.coils) == 3
    assert len(m.discrete_inputs) == 3


def test_register_lookup_by_address():
    m = ModbusRegisterMap()
    # float32 spans two words; either word resolves (register_map.py:496)
    assert m.get_register_by_address(0, RegisterType.INPUT_REGISTER).name \
        == "pH_inlet"
    assert m.get_register_by_address(1, RegisterType.INPUT_REGISTER).name \
        == "pH_inlet"
    assert m.get_register_by_address(2, RegisterType.INPUT_REGISTER).name \
        == "pH_middle"
    assert m.get_register_by_address(999, RegisterType.INPUT_REGISTER) is None


# ---------------------------------------------------------------------------
# Encoding
# ---------------------------------------------------------------------------

def test_float32_round_trip():
    for v in (0.0, 7.25, -273.15, 1e-6, 3.4e38):
        high, low = ModbusEncoder.float32_to_registers(v)
        assert 0 <= high <= 65535 and 0 <= low <= 65535
        back = ModbusDecoder.registers_to_float32(high, low)
        assert back == pytest.approx(v, rel=1e-6)


def test_big_endian_word_order():
    # 7.25f = 0x40E80000: high word first (reference protocols.py:52-57)
    high, low = ModbusEncoder.float32_to_registers(7.25)
    assert high == 0x40E8
    assert low == 0x0000


def test_int16_two_complement():
    assert ModbusEncoder.int16_to_register(-1) == 0xFFFF
    assert ModbusDecoder.register_to_int16(0xFFFF) == -1
    with pytest.raises(ValueError):
        ModbusEncoder.int16_to_register(40000)


def test_validation_suite():
    validate_encoding()


# ---------------------------------------------------------------------------
# Live server over TCP
# ---------------------------------------------------------------------------

@pytest.fixture()
def slave():
    s = ModbusSlave(ModbusRegisterMap(),
                    ModbusServerConfig(host="127.0.0.1", port=0))
    s.start(blocking=False)
    yield s
    s.stop()


def test_server_lifecycle(slave):
    assert slave.is_running
    assert slave.port > 0


def test_sensor_value_visible_to_tcp_client(slave):
    slave.update_input_register("pH_inlet", 7.18)
    slave.update_input_register("chlorine_outlet", 1.44)
    slave.update_input_register("system_status", 3)
    with ModbusTcpClient("127.0.0.1", slave.port) as client:
        assert client.read_float32(0) == pytest.approx(7.18, rel=1e-6)
        assert client.read_float32(8) == pytest.approx(1.44, rel=1e-6)
        assert client.read_input_registers(102, 1) == [3]


def test_client_command_visible_to_plant(slave):
    with ModbusTcpClient("127.0.0.1", slave.port) as client:
        client.write_float32(0, 0.75)      # acid_flow_rate
        client.write_float32(4, 6.5)       # inlet_flow_rate
        client.write_coil(0, True)         # acid_pump_enable
    assert slave.read_holding_register("acid_flow_rate") == \
        pytest.approx(0.75, rel=1e-6)
    assert slave.read_holding_register("inlet_flow_rate") == \
        pytest.approx(6.5, rel=1e-6)
    assert slave.read_coil("acid_pump_enable") is True


def test_discrete_inputs_over_tcp(slave):
    slave.update_discrete_input("sensor_fault_pH_inlet", True)
    slave.update_discrete_input("sensor_fault_chlorine", False)
    with ModbusTcpClient("127.0.0.1", slave.port) as client:
        bits = client.read_discrete_inputs(0, 3)
    assert bits == [True, False, False]


def test_nan_sensor_value_round_trips(slave):
    slave.update_input_register("pH_outlet", float("nan"))
    with ModbusTcpClient("127.0.0.1", slave.port) as client:
        assert np.isnan(client.read_float32(4))


def test_illegal_address_gets_exception(slave):
    with ModbusTcpClient("127.0.0.1", slave.port) as client:
        with pytest.raises(IOError):
            client.read_input_registers(5000, 2)


def test_illegal_function_gets_exception(slave):
    import socket
    import struct
    with socket.create_connection(("127.0.0.1", slave.port), 5) as sock:
        sock.sendall(struct.pack(">HHHB", 1, 0, 2, 1) + bytes([0x2B]))
        resp = sock.recv(1024)
    assert resp[7] == 0x2B | 0x80
    assert resp[8] == 0x01            # illegal function


def test_value_range_validation(slave):
    with pytest.raises(ValueError):
        slave.write_holding_register("acid_flow_rate", 1e12)
    with pytest.raises(KeyError):
        slave.update_input_register("nonexistent", 1.0)


def test_multiple_clients(slave):
    slave.update_input_register("flow_rate", 5.0)
    clients = [ModbusTcpClient("127.0.0.1", slave.port).connect()
               for _ in range(3)]
    try:
        for c in clients:
            assert c.read_float32(10) == pytest.approx(5.0)
    finally:
        for c in clients:
            c.close()


def test_bulk_getters(slave):
    slave.update_input_register("pH_inlet", 7.0)
    all_ir = slave.get_all_input_registers()
    assert all_ir["pH_inlet"] == pytest.approx(7.0)
    assert set(all_ir) == {r.name for r in
                           slave.register_map.input_registers}


def test_write_multiple_coils_fc15(slave):
    with ModbusTcpClient("127.0.0.1", slave.port) as client:
        client.write_coils(0, [True, False, True])
        assert client.read_coils(0, 3) == [True, False, True]
    assert slave.read_coil("acid_pump_enable") is True
    assert slave.read_coil("chlorine_pump_enable") is False
    assert slave.read_coil("simulation_running") is True


def test_all_holding_registers_bulk(slave):
    slave.write_holding_register("acid_flow_rate", 0.25)
    slave.write_holding_register("simulation_timestep", 2.0)
    hr = slave.get_all_holding_registers()
    assert hr["acid_flow_rate"] == pytest.approx(0.25, rel=1e-6)
    assert hr["simulation_timestep"] == pytest.approx(2.0, rel=1e-6)
    assert set(hr) == {r.name for r in
                       slave.register_map.holding_registers}


# ---------------------------------------------------------------------------
# Protocol fidelity: FC 43 identity, unit-id filtering, malformed frames
# ---------------------------------------------------------------------------

def test_device_identification_fc43(slave):
    with ModbusTcpClient("127.0.0.1", slave.port) as client:
        basic = client.read_device_identification(read_code=0x01)
        assert basic[0x00] == "ICS-WT-PhysicsEngine-TPU"
        assert basic[0x01] == "WTS-TPU"
        assert basic[0x02] == "1.0"
        regular = client.read_device_identification(read_code=0x02)
        assert regular[0x04] == "Water Treatment Simulator (TPU)"
        assert regular[0x05] == "CSTR-MultiZone"
        # specific object
        one = client.read_device_identification(read_code=0x04,
                                                object_id=0x05)
        assert one == {0x05: "CSTR-MultiZone"}
        # unknown specific object -> ILLEGAL_DATA_ADDRESS
        with pytest.raises(IOError, match="exception 2"):
            client.read_device_identification(read_code=0x04,
                                              object_id=0x63)
        # bad read code -> ILLEGAL_DATA_VALUE
        with pytest.raises(IOError, match="exception 3"):
            client.read_device_identification(read_code=0x07)


def test_unit_id_mismatch_is_ignored(slave):
    import socket
    import struct as _struct

    slave.update_input_register("pH_inlet", 7.5)
    with ModbusTcpClient("127.0.0.1", slave.port, unit_id=9) as client:
        # request addressed to unit 9; server serves unit 1 -> no response
        client._sock.settimeout(0.5)
        pdu = _struct.pack(">BHH", 0x04, 0, 2)
        req = _struct.pack(">HHHB", 1, 0, len(pdu) + 1, 9) + pdu
        client._sock.sendall(req)
        with pytest.raises(socket.timeout):
            client._sock.recv(16)
    # unit 0xFF (TCP "any") and the configured unit both answer
    for unit in (1, 0xFF):
        with ModbusTcpClient("127.0.0.1", slave.port, unit_id=unit) as c:
            assert c.read_float32(0) == pytest.approx(7.5, rel=1e-6)


def test_malformed_fc15_gets_illegal_value(slave):
    import struct as _struct

    with ModbusTcpClient("127.0.0.1", slave.port) as client:
        # byte count inconsistent with coil count
        pdu = _struct.pack(">BHHB", 0x0F, 0, 9, 1) + b"\xff"
        client._transaction += 1
        req = _struct.pack(">HHHB", client._transaction, 0, len(pdu) + 1,
                           1) + pdu
        client._sock.sendall(req)
        header = client._recv_exact(7)
        _, _, length, _ = _struct.unpack(">HHHB", header)
        resp = client._recv_exact(length - 1)
        assert resp[0] == 0x8F and resp[1] == 3    # ILLEGAL_DATA_VALUE
        # count = 0 is also ILLEGAL_DATA_VALUE
        pdu = _struct.pack(">BHHB", 0x0F, 0, 0, 0)
        client._transaction += 1
        req = _struct.pack(">HHHB", client._transaction, 0, len(pdu) + 1,
                           1) + pdu
        client._sock.sendall(req)
        client._recv_exact(7)
        resp = client._recv_exact(2)
        assert resp[0] == 0x8F and resp[1] == 3


def test_empty_pdu_gets_exception_not_disconnect(slave):
    import struct as _struct

    with ModbusTcpClient("127.0.0.1", slave.port) as client:
        # MBAP length = 1: unit id only, empty PDU
        client._sock.sendall(_struct.pack(">HHHB", 5, 0, 1, 1))
        header = client._recv_exact(7)
        _, _, length, _ = _struct.unpack(">HHHB", header)
        resp = client._recv_exact(length - 1)
        assert resp == bytes([0x80, 3])
        # connection still alive and serving
        slave.update_input_register("pH_inlet", 6.5)
        assert client.read_float32(0) == pytest.approx(6.5, rel=1e-6)


def test_broken_mbap_length_drops_connection(slave):
    import struct as _struct

    with ModbusTcpClient("127.0.0.1", slave.port) as client:
        client._sock.sendall(_struct.pack(">HHHB", 5, 0, 1000, 1))
        with pytest.raises((ConnectionError, IOError)):
            client.read_input_registers(0, 1)


def test_mask_write_and_read_write_multiple(slave):
    """FC 22 Mask Write Register and FC 23 Read/Write Multiple Registers
    (spec 6.16/6.17): masked bit updates land, and FC 23's write executes
    BEFORE its read so the response reflects the new values."""
    with ModbusTcpClient("127.0.0.1", slave.port, timeout=5) as client:
        client.write_registers(10, [0x12FF])
        # clear the low nibble, set bit 0x0004:
        # (0x12FF & 0xFFF0) | (0x0004 & ~0xFFF0) = 0x12F4
        client.mask_write_register(10, 0xFFF0, 0x0004)
        assert client.read_holding_registers(10, 1) == [0x12F4]

        # FC 23: write [0xAAAA, 0xBBBB] at 20, read back the same range
        # in one transaction — the response must show the NEW values
        out = client.read_write_registers(20, 2, 20, [0xAAAA, 0xBBBB])
        assert out == [0xAAAA, 0xBBBB]
        assert client.read_holding_registers(20, 2) == [0xAAAA, 0xBBBB]

        # bad write count faults with ILLEGAL DATA VALUE
        import struct as _struct
        with pytest.raises(IOError):
            client._transact(_struct.pack(">BHHHHB", 0x17, 0, 1, 0, 0, 0))


def test_diagnostics_fc08(slave):
    """FC 08 Diagnostics: echo, the five standard counters, exception
    counting, and Clear Counters — the reference's own listed limitation
    ('No diagnostics counters', reference README.md:537) closed on the
    wire."""
    with ModbusTcpClient("127.0.0.1", slave.port, timeout=5) as client:
        # 0x0000 Return Query Data echoes the data field
        assert client.diagnostics(0x0000, 0x1234) == 0x1234

        client.read_input_registers(0, 2)
        client.read_holding_registers(0, 2)
        d = client.diagnostic_counters()
        assert d["bus_message_count"] >= 3       # echo + 2 reads + ...
        assert d["slave_message_count"] >= 3
        assert d["bus_comm_error_count"] == 0

        # an illegal read raises client-side AND bumps the exception counter
        before = d["bus_exception_count"]
        with pytest.raises(IOError):
            client.read_input_registers(60000, 10)
        assert client.diagnostics(0x0D) == before + 1

        # unsupported sub-function -> ILLEGAL FUNCTION exception
        with pytest.raises(IOError):
            client.diagnostics(0x0063)

        # 0x000A Clear Counters resets everything
        client.diagnostics(0x000A)
        assert client.diagnostics(0x0B) <= 2     # just the clear + this read
        assert client.diagnostics(0x0D) == 0

    # the host-side accessor mirrors the wire counters
    keys = {"bus_message_count", "bus_comm_error_count",
            "bus_exception_count", "slave_message_count",
            "slave_no_response_count"}
    assert set(slave.diagnostics()) == keys
