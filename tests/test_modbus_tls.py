"""Modbus/TCP Security (TLS) tests — closes the reference's own
"No authentication or encryption" limitation (reference README.md:536):
mutual-TLS handshake, RoleOID extraction, and role-based write
authorization over a real TLS socket (MB-TCP-Security-v21 semantics)."""

import socket
import ssl
import struct

import pytest

from ics_wt_physicsengine_tpu.modbus import (
    ModbusRegisterMap,
    ModbusServerConfig,
    ModbusSlave,
    ModbusTcpClient,
    ModbusTLSConfig,
    make_client_ssl_context,
)
from ics_wt_physicsengine_tpu.modbus.security import (
    MODBUS_ROLE_OID,
    extract_role,
    generate_test_pki,
    pdu_requires_write,
)


@pytest.fixture(scope="module")
def pki(tmp_path_factory):
    """Throwaway PKI: operator (rw role), viewer (ro role), intruder
    (role mapped to deny), anon (no role extension)."""
    return generate_test_pki(
        str(tmp_path_factory.mktemp("pki")),
        roles={"operator": "Operator", "viewer": "Viewer",
               "intruder": "Blocked", "anon": None})


def _tls_config(pki, **overrides):
    kwargs = dict(
        certfile=pki["server"]["cert"], keyfile=pki["server"]["key"],
        cafile=pki["ca"]["cert"],
        role_permissions={"Operator": "rw", "Viewer": "ro",
                          "Blocked": "deny"},
        default_permission="ro")
    kwargs.update(overrides)
    return ModbusTLSConfig(**kwargs)


@pytest.fixture(scope="module")
def tls_server(pki):
    slave = ModbusSlave(
        ModbusRegisterMap(),
        ModbusServerConfig(host="127.0.0.1", port=0,
                           tls=_tls_config(pki)))
    slave.start(blocking=False)
    slave.write_holding_register("inlet_flow_rate", 5.0)
    yield slave
    slave.stop()


def _client(pki, name, port, **kw):
    ctx = make_client_ssl_context(
        pki[name]["cert"], pki[name]["key"], pki["ca"]["cert"])
    return ModbusTcpClient("127.0.0.1", port, ssl_context=ctx, **kw)


# ---------------------------------------------------------------------------
# Unit: role extension parsing + write-FC classification
# ---------------------------------------------------------------------------

def test_extract_role_from_generated_certs(pki):
    for name, expected in (("operator", "Operator"), ("viewer", "Viewer"),
                           ("anon", None)):
        with open(pki[name]["cert"], "rb") as f:
            der = ssl.PEM_cert_to_DER_cert(f.read().decode())
        assert extract_role(der) == expected
    assert extract_role(None) is None
    assert extract_role(b"not a certificate") is None


def test_role_oid_is_the_spec_arc():
    # MB-TCP-Security-v21 section 4.1.2 — Modbus Organization PEN 50316,
    # arc .802 (the mbaps port), .1 the client role.
    assert MODBUS_ROLE_OID == "1.3.6.1.4.1.50316.802.1"


def test_pdu_write_classification():
    # reads
    assert not pdu_requires_write(struct.pack(">BHH", 0x03, 0, 2))
    assert not pdu_requires_write(struct.pack(">BHH", 0x04, 0, 2))
    assert not pdu_requires_write(struct.pack(">BHH", 0x01, 0, 1))
    # FC 08 counters are read-like; Clear Counters is a write
    assert not pdu_requires_write(struct.pack(">BHH", 0x08, 0x000B, 0))
    assert pdu_requires_write(struct.pack(">BHH", 0x08, 0x000A, 0))
    # writes
    for fc in (0x05, 0x06, 0x0F, 0x10, 0x16, 0x17):
        assert pdu_requires_write(bytes([fc]) + b"\x00" * 8)
    assert not pdu_requires_write(b"")


def test_permission_validation():
    with pytest.raises(ValueError):
        ModbusTLSConfig("c", "k", "ca", role_permissions={"X": "admin"})
    with pytest.raises(ValueError):
        ModbusTLSConfig("c", "k", "ca", default_permission="yes")


# ---------------------------------------------------------------------------
# Live TLS server
# ---------------------------------------------------------------------------

def test_rw_role_full_round_trip(pki, tls_server):
    with _client(pki, "operator", tls_server.port) as c:
        c.write_float32(0, 7.5)           # acid_flow_rate
        assert abs(c.read_float32(0, input_register=False) - 7.5) < 1e-6
        c.write_coil(0, True)
        assert c.read_coils(0, 1) == [True]
        assert tls_server.read_holding_register("acid_flow_rate") \
            == pytest.approx(7.5, abs=1e-6)


def test_ro_role_reads_but_cannot_write(pki, tls_server):
    with _client(pki, "viewer", tls_server.port) as c:
        # reads pass
        assert abs(c.read_float32(4, input_register=False) - 5.0) < 1e-6
        assert isinstance(c.diagnostic_counters(), dict)
        # all write shapes refused with ILLEGAL FUNCTION
        before = tls_server.read_holding_register("inlet_flow_rate")
        for attempt in (lambda: c.write_register(4, 1),
                        lambda: c.write_registers(4, [1, 2]),
                        lambda: c.write_coil(0, False),
                        lambda: c.mask_write_register(4, 0, 1),
                        lambda: c.read_write_registers(0, 1, 4, [1, 2])):
            with pytest.raises(IOError, match="exception 1"):
                attempt()
        assert tls_server.read_holding_register("inlet_flow_rate") \
            == before
    assert tls_server.unauthorized_count >= 5
    assert tls_server.diagnostics()["unauthorized_count"] >= 5


def test_no_role_gets_default_permission(pki, tls_server):
    # anon cert has no RoleOID extension → default_permission="ro"
    with _client(pki, "anon", tls_server.port) as c:
        assert c.read_holding_registers(4, 2)
        with pytest.raises(IOError, match="exception 1"):
            c.write_register(4, 99)


def test_deny_role_connection_is_closed(pki, tls_server):
    with pytest.raises((ConnectionError, IOError)):
        with _client(pki, "intruder", tls_server.port,
                     timeout=5.0) as c:
            c.read_holding_registers(4, 2)


def test_plaintext_client_rejected(tls_server):
    """A non-TLS master cannot talk to the secure port."""
    with socket.create_connection(("127.0.0.1", tls_server.port),
                                  timeout=5.0) as sock:
        sock.settimeout(5.0)
        # MBAP frame bytes are not a TLS ClientHello — the handshake
        # fails server-side and the connection drops without an answer.
        sock.sendall(struct.pack(">HHHB", 1, 0, 6, 1)
                     + struct.pack(">BHH", 0x03, 0, 2))
        try:
            data = sock.recv(16)
        except (socket.timeout, ConnectionError):
            data = b""
        # whatever comes back, it is not a well-formed MBAP response
        assert not data.startswith(struct.pack(">HH", 1, 0))


def test_client_without_certificate_rejected(pki, tls_server):
    """mTLS is mandatory (spec): no client cert ⇒ handshake failure."""
    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_CLIENT)
    ctx.minimum_version = ssl.TLSVersion.TLSv1_2
    ctx.load_verify_locations(cafile=pki["ca"]["cert"])
    client = ModbusTcpClient("127.0.0.1", tls_server.port,
                             ssl_context=ctx, timeout=5.0)
    with pytest.raises((ssl.SSLError, ConnectionError, IOError)):
        with client as c:
            c.read_holding_registers(4, 2)


def test_untrusted_ca_rejected(pki, tmp_path, tls_server):
    """A client cert from a different CA fails the server's verify."""
    rogue = generate_test_pki(str(tmp_path / "rogue"),
                              roles={"mallory": "Operator"})
    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_CLIENT)
    ctx.minimum_version = ssl.TLSVersion.TLSv1_2
    ctx.load_cert_chain(rogue["mallory"]["cert"], rogue["mallory"]["key"])
    ctx.load_verify_locations(cafile=pki["ca"]["cert"])
    client = ModbusTcpClient("127.0.0.1", tls_server.port,
                             ssl_context=ctx, timeout=5.0)
    with pytest.raises((ssl.SSLError, ConnectionError, IOError)):
        with client as c:
            c.read_holding_registers(4, 2)


def test_orchestrator_serves_tls(pki):
    """End-to-end: the orchestrator CLI brings up the secure plane
    (--tls-cert/--tls-key/--tls-ca/--tls-role) and a role-carrying TLS
    master closes the loop; a read-only master cannot write."""
    import threading
    import time

    import ics_wt_physicsengine_tpu.__main__ as orchestrator

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    orchestrator.running = True
    thread = threading.Thread(
        target=orchestrator.main,
        args=(["--port", str(port), "--host", "127.0.0.1", "--dt", "30",
               "--duration", "100000", "--rtf", "0", "--seed", "7",
               "--tls-cert", pki["server"]["cert"],
               "--tls-key", pki["server"]["key"],
               "--tls-ca", pki["ca"]["cert"],
               "--tls-role", "Operator=rw",
               "--tls-default-permission", "ro"],),
        daemon=True)
    thread.start()
    try:
        client = None
        deadline = time.time() + 60
        while time.time() < deadline:
            try:
                client = _client(pki, "operator", port,
                                 timeout=5).connect()
                break
            except OSError:
                time.sleep(0.3)
        assert client is not None, "TLS orchestrator did not come up"
        try:
            # operator (rw): full closed-loop access
            client.write_float32(0, 2.0)      # acid_flow_rate
            assert abs(client.read_float32(0, input_register=False)
                       - 2.0) < 1e-6
            deadline = time.time() + 60
            while time.time() < deadline:
                if client.read_float32(100) > 0:   # simulation_time
                    break
                time.sleep(0.2)
            assert client.read_float32(100) > 0
        finally:
            client.close()
        # anon (no role ⇒ default ro): reads ok, writes refused
        with _client(pki, "anon", port) as viewer:
            assert viewer.read_float32(100) >= 0
            with pytest.raises(IOError, match="exception 1"):
                viewer.write_register(4, 1)
    finally:
        orchestrator.running = False
        thread.join(timeout=30)


def test_tls_multi_unit(pki):
    """TLS composes with the fleet's multi-unit-id serving."""
    slave = ModbusSlave(
        ModbusRegisterMap(),
        ModbusServerConfig(host="127.0.0.1", port=0, tls=_tls_config(pki)),
        units=[1, 2])
    slave.start(blocking=False)
    try:
        slave.update_input_register("pH_inlet", 6.5, unit=1)
        slave.update_input_register("pH_inlet", 8.5, unit=2)
        for unit, expected in ((1, 6.5), (2, 8.5)):
            with _client(pki, "operator", slave.port, unit_id=unit) as c:
                assert abs(c.read_float32(0) - expected) < 1e-5
    finally:
        slave.stop()
