"""
OPC UA plane tests: wire-format golden bytes, encode/decode round-trips,
and a live client <-> server session bridged onto a ModbusSlave.

The golden byte strings pin the UA Binary layouts (OPC 10000-6 §5.1-5.2)
independently of our own round-trip consistency: String length prefixes,
NodeId encoding bytes, Variant masks, DataValue masks, and the 8-byte
transport header.
"""

import threading
import time
import uuid

import pytest

from ics_wt_physicsengine_tpu.modbus.register_map import (
    ModbusRegisterMap,
    RegisterType,
)
from ics_wt_physicsengine_tpu.modbus.slave import (
    ModbusServerConfig,
    ModbusSlave,
)
from ics_wt_physicsengine_tpu.opcua import messages as M
from ics_wt_physicsengine_tpu.opcua.client import OPCUAClient, OPCUAError
from ics_wt_physicsengine_tpu.opcua.encoding import (
    DataValue,
    Decoder,
    Encoder,
    LocalizedText,
    NodeId,
    QualifiedName,
    Variant,
    VT_BOOLEAN,
    VT_DOUBLE,
    VT_INT32,
    VT_STRING,
    filetime_to_unix,
    unix_to_filetime,
)
from ics_wt_physicsengine_tpu.opcua.server import OPCUAServer


# ---------------------------------------------------------------------------
# Golden wire bytes (hand-computed from OPC 10000-6)
# ---------------------------------------------------------------------------

def test_golden_string():
    # Int32 LE length + UTF-8; null string is length -1
    assert Encoder().string("ab").data() == b"\x02\x00\x00\x00ab"
    assert Encoder().string(None).data() == b"\xff\xff\xff\xff"
    assert Encoder().string("").data() == b"\x00\x00\x00\x00"


def test_golden_node_id():
    # TwoByte: 0x00 + id byte
    assert Encoder().node_id(NodeId(0, 85)).data() == b"\x00\x55"
    # FourByte: 0x01 + ns byte + uint16 LE id
    assert Encoder().node_id(NodeId(1, 631)).data() == \
        b"\x01\x01\x77\x02"
    # Numeric: 0x02 + uint16 ns + uint32 id
    assert Encoder().node_id(NodeId(300, 70000)).data() == \
        b"\x02\x2c\x01\x70\x11\x01\x00"
    # String: 0x03 + uint16 ns + String
    assert Encoder().node_id(NodeId(1, "u1.pH")).data() == \
        b"\x03\x01\x00\x05\x00\x00\x00u1.pH"


def test_golden_variant_and_datavalue():
    # Scalar Double: mask 0x0B + 8-byte LE double (1.0 = 0x3FF0...)
    assert Encoder().variant(Variant(VT_DOUBLE, 1.0)).data() == \
        b"\x0b\x00\x00\x00\x00\x00\x00\xf0\x3f"
    # Boolean array [T, F]: mask 0x81 + Int32 len + bytes
    assert Encoder().variant(
        Variant(VT_BOOLEAN, [True, False], is_array=True)).data() == \
        b"\x81\x02\x00\x00\x00\x01\x00"
    # DataValue with value only: mask 0x01 then variant
    assert Encoder().data_value(
        DataValue(value=Variant(VT_BOOLEAN, True))).data() == \
        b"\x01\x01\x01"
    # Null variant
    assert Encoder().variant(Variant()).data() == b"\x00"


def test_golden_transport_header():
    # "HEL" + "F" + uint32 LE total size (8 header + 4 body)
    framed = M.frame("HEL", b"\x01\x02\x03\x04")
    assert framed == b"HELF\x0c\x00\x00\x00\x01\x02\x03\x04"
    parsed = M.read_exact_message(framed + b"rest")
    assert parsed == ("HEL", "F", b"\x01\x02\x03\x04", b"rest")
    assert M.read_exact_message(framed[:7]) is None    # incomplete


def test_golden_datetime_epoch():
    # 1970-01-01 in FILETIME ticks
    assert unix_to_filetime(0.0) == 116444736000000000
    assert filetime_to_unix(116444736000000000) == 0.0


# ---------------------------------------------------------------------------
# Round-trips
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("node", [
    NodeId(0, 0), NodeId(0, 255), NodeId(5, 1000), NodeId(300, 70000),
    NodeId(1, "u3.pH_outlet"), NodeId(2, b"\x00\x01"),
    NodeId(4, uuid.uuid4()),
])
def test_node_id_roundtrip(node):
    data = Encoder().node_id(node).data()
    assert Decoder(data).node_id() == node


@pytest.mark.parametrize("variant", [
    Variant(VT_DOUBLE, 3.14159), Variant(VT_BOOLEAN, False),
    Variant(VT_INT32, -42), Variant(VT_STRING, "héllo"),
    Variant(VT_DOUBLE, [1.0, 2.0, 3.0], is_array=True),
    Variant(VT_STRING, ["a", None, "c"], is_array=True),
    Variant(0, None),
])
def test_variant_roundtrip(variant):
    data = Encoder().variant(variant).data()
    out = Decoder(data).variant()
    assert out == variant


def test_data_value_roundtrip():
    dv = DataValue(value=Variant(VT_DOUBLE, 7.25), status=None,
                   source_timestamp=unix_to_filetime(1e9),
                   server_timestamp=unix_to_filetime(1e9 + 1))
    data = Encoder().data_value(dv).data()
    out = Decoder(data).data_value()
    assert out.value == dv.value
    assert out.source_timestamp == dv.source_timestamp
    assert out.server_timestamp == dv.server_timestamp


def test_localized_text_qualified_name_roundtrip():
    lt = LocalizedText("Water", "en")
    qn = QualifiedName(1, "inlet_flow_rate")
    data = Encoder().localized_text(lt).qualified_name(qn).data()
    d = Decoder(data)
    assert d.localized_text() == lt
    assert d.qualified_name() == qn


@pytest.mark.parametrize("cls,kwargs", [
    (M.ReadRequest, dict(nodes=[M.ReadValueId(NodeId(1, "u1.pH"), 13)])),
    (M.WriteRequest, dict(nodes=[M.WriteValue(
        NodeId(1, "u1.x"), 13, DataValue(value=Variant(VT_DOUBLE, 2.0)))])),
    (M.BrowseRequest, dict(max_references=10,
                           nodes=[M.BrowseDescription()])),
    (M.CreateSessionRequest, dict(endpoint_url="opc.tcp://x:1/plant",
                                  session_name="s")),
    (M.ActivateSessionRequest, {}),
    (M.GetEndpointsRequest, dict(endpoint_url="opc.tcp://x:1/plant")),
    (M.OpenSecureChannelRequest, dict(requested_lifetime_ms=60000)),
    (M.CloseSessionRequest, {}),
])
def test_service_struct_roundtrip(cls, kwargs):
    req = cls(M.RequestHeader(request_handle=9), **kwargs)
    e = Encoder()
    req.encode(e)
    out = cls.decode(Decoder(e.data()))
    assert out.header.request_handle == 9
    e2 = Encoder()
    out.encode(e2)
    assert e2.data() == e.data()   # stable re-encode


def test_response_struct_roundtrip():
    rsp = M.ReadResponse(
        M.ResponseHeader(request_handle=4, service_result=M.GOOD),
        results=[DataValue(value=Variant(VT_DOUBLE, 6.5)),
                 DataValue(status=M.BAD_NODE_ID_UNKNOWN)])
    e = Encoder()
    rsp.encode(e)
    out = M.ReadResponse.decode(Decoder(e.data()))
    assert out.header.request_handle == 4
    assert out.results[0].value.value == 6.5
    assert out.results[1].status == M.BAD_NODE_ID_UNKNOWN


# ---------------------------------------------------------------------------
# Live client <-> server over a real socket
# ---------------------------------------------------------------------------

@pytest.fixture()
def plant_server():
    """OPC UA server bridged onto a two-unit ModbusSlave (no Modbus
    listener needed — the OPC UA plane reads the shared store)."""
    slave = ModbusSlave(ModbusRegisterMap(),
                        ModbusServerConfig(host="127.0.0.1", port=0),
                        units=[1, 2])
    slave.update_input_register("pH_outlet", 7.2, unit=1)
    slave.update_input_register("pH_outlet", 6.9, unit=2)
    slave.update_input_register("chlorine_outlet", 0.85, unit=1)
    slave.write_holding_register("chlorine_flow_rate", 0.0, unit=1)
    slave.write_coil("acid_pump_enable", True, unit=1)
    slave.update_discrete_input("sensor_fault_pH_outlet", False, unit=1)
    server = OPCUAServer(slave, host="127.0.0.1", port=0)
    server.start()
    yield server, slave
    server.stop()


def test_session_read_write_browse(plant_server):
    server, slave = plant_server
    with OPCUAClient("127.0.0.1", server.actual_port) as c:
        # Reads see the values the orchestrator pushed into the store
        assert c.read_double("u1.pH_outlet") == pytest.approx(7.2, 1e-5)
        assert c.read_double("u2.pH_outlet") == pytest.approx(6.9, 1e-5)
        assert c.read_double("u1.chlorine_outlet") == pytest.approx(
            0.85, 1e-5)
        assert c.read_bool("u1.acid_pump_enable") is True
        assert c.read_bool("u1.sensor_fault_pH_outlet") is False

        # Writes land in the SAME store a Modbus master would read
        c.write_double("u1.chlorine_flow_rate", 0.75)
        assert slave.read_holding_register(
            "chlorine_flow_rate", unit=1) == pytest.approx(0.75, 1e-5)
        c.write_bool("u2.acid_pump_enable", True)
        assert slave.read_coil("acid_pump_enable", unit=2) is True

        # And Modbus-side writes are visible over OPC UA
        slave.write_holding_register("inlet_flow_rate", 9.5, unit=2)
        assert c.read_double("u2.inlet_flow_rate") == pytest.approx(
            9.5, 1e-5)

        # Browse: Objects -> units -> registers
        units = c.browse(M.OBJECTS_FOLDER)
        assert units == ["Unit1", "Unit2"]
        names = c.browse("u1")
        assert "pH_outlet" in names
        assert "chlorine_flow_rate" in names
        assert "acid_pump_enable" in names

        # Non-Value attributes: units ride in the Description
        dv = c.read(["u1.chlorine_outlet"], M.ATTR_DESCRIPTION)[0]
        assert "[mg/L]" in dv.value.value.text


def test_error_statuses(plant_server):
    server, _ = plant_server
    with OPCUAClient("127.0.0.1", server.actual_port) as c:
        # Unknown node
        dv = c.read(["u1.no_such_register"])[0]
        assert dv.status == M.BAD_NODE_ID_UNKNOWN
        with pytest.raises(OPCUAError):
            c.read_double("u9.pH_outlet")       # unit not served
        # Read-only: input registers and discrete inputs reject writes
        status = c.write([("u1.pH_outlet",
                           Variant(VT_DOUBLE, 5.0))])[0]
        assert status == M.BAD_NOT_WRITABLE
        # Type mismatch: boolean into a float register
        status = c.write([("u1.chlorine_flow_rate",
                           Variant(VT_BOOLEAN, True))])[0]
        assert status == M.BAD_TYPE_MISMATCH
        # Range: the +-1e9 register validation surfaces as OutOfRange
        status = c.write([("u1.chlorine_flow_rate",
                           Variant(VT_DOUBLE, 1e12))])[0]
        assert status == M.BAD_OUT_OF_RANGE


def test_get_endpoints_and_policy(plant_server):
    server, _ = plant_server
    with OPCUAClient("127.0.0.1", server.actual_port) as c:
        eps = c.get_endpoints()
        assert len(eps) == 1
        assert eps[0].security_policy_uri == M.SECURITY_POLICY_NONE
        assert eps[0].security_mode == 1
        tokens = eps[0].user_identity_tokens
        assert any(t.token_type == 0 for t in tokens)   # anonymous


def test_read_requires_activated_session(plant_server):
    """A Read sent before ActivateSession must fault, not answer."""
    import socket as socket_mod
    from ics_wt_physicsengine_tpu.opcua.encoding import (
        Decoder as Dec, Encoder as Enc)

    server, _ = plant_server
    c = OPCUAClient("127.0.0.1", server.actual_port)
    c._sock = socket_mod.create_connection(
        ("127.0.0.1", server.actual_port), timeout=5)
    c._sock.sendall(M.Hello(endpoint_url="opc.tcp://x/plant").encode())
    msg_type, _, _ = c._recv()
    assert msg_type == "ACK"
    c._open_channel()
    with pytest.raises(OPCUAError) as err:
        c.read(["u1.pH_outlet"])
    assert err.value.status == M.BAD_SESSION_NOT_ACTIVATED
    c._sock.close()


def test_concurrent_clients(plant_server):
    """16 concurrent sessions reading + writing distinct registers."""
    server, slave = plant_server
    errors = []

    def worker(i):
        try:
            with OPCUAClient("127.0.0.1", server.actual_port) as c:
                for _ in range(5):
                    c.write_double("u1.acid_flow_rate", 7.0 + i * 0.01)
                    c.read_double("u1.pH_outlet")
                    c.browse("u1")
        except Exception as e:   # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(16)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    assert not errors
    # last write from some worker is in range
    v = slave.read_holding_register("acid_flow_rate", unit=1)
    assert 7.0 <= v <= 7.16


def test_malformed_frames_do_not_kill_server(plant_server):
    """Garbage, truncated frames and bogus types get ERR or a drop — and
    the server keeps serving well-formed clients afterwards."""
    import socket as socket_mod

    server, _ = plant_server
    for payload in (b"\x00" * 16,
                    b"HELF\xff\xff\xff\xff",         # absurd size
                    b"XXXF\x0c\x00\x00\x00\x00\x00\x00\x00",
                    M.frame("MSG", b"\x01\x02")):    # MSG before HEL
        s = socket_mod.create_connection(
            ("127.0.0.1", server.actual_port), timeout=5)
        try:
            s.sendall(payload)
            s.settimeout(2.0)
            try:
                s.recv(4096)
            except (TimeoutError, ConnectionError, OSError):
                pass
        finally:
            s.close()
    time.sleep(0.2)
    with OPCUAClient("127.0.0.1", server.actual_port) as c:
        assert c.read_double("u1.pH_outlet") == pytest.approx(7.2, 1e-5)


def test_connection_cap_and_idle_drop():
    """Abuse posture matches the Modbus planes: excess connections are
    refused immediately, and idle cap-slot holders are dropped."""
    import socket as socket_mod

    slave = ModbusSlave(ModbusRegisterMap(),
                        ModbusServerConfig(host="127.0.0.1", port=0))
    server = OPCUAServer(slave, host="127.0.0.1", port=0,
                         max_connections=2, idle_timeout_seconds=0.5)
    server.start()
    try:
        held = [socket_mod.create_connection(
            ("127.0.0.1", server.actual_port), timeout=5)
            for _ in range(2)]
        time.sleep(0.1)
        # Third connection: accepted at the TCP level but closed by the
        # handler without serving anything.
        s3 = socket_mod.create_connection(
            ("127.0.0.1", server.actual_port), timeout=5)
        s3.settimeout(3.0)
        assert s3.recv(4096) == b""
        s3.close()
        # The held (idle) connections get dropped after the idle timeout,
        # freeing their slots for a real client.
        for s in held:
            s.settimeout(3.0)
            assert s.recv(4096) == b""
            s.close()
        with OPCUAClient("127.0.0.1", server.actual_port) as c:
            assert c.browse(M.OBJECTS_FOLDER) == ["Unit1"]
    finally:
        server.stop()


def test_oversized_frame_rejected_before_buffering():
    """A declared frame size beyond the advertised max_message_size is
    refused at the header, not buffered toward it."""
    from ics_wt_physicsengine_tpu.opcua.messages import (
        DecodeError as DE, read_exact_message)
    hdr = b"MSGF" + (17 * 1024 * 1024).to_bytes(4, "little")
    with pytest.raises(DE):
        read_exact_message(hdr + b"\x00" * 16)


# ---------------------------------------------------------------------------
# Subscriptions (Publish / MonitoredItems push path)
# ---------------------------------------------------------------------------

def test_subscription_struct_roundtrips():
    from ics_wt_physicsengine_tpu.opcua.encoding import (
        Encoder as Enc, Decoder as Dec)

    req = M.CreateSubscriptionRequest(
        requested_publishing_interval_ms=250.0,
        requested_lifetime_count=30,
        requested_max_keepalive_count=7,
        max_notifications_per_publish=5,
        publishing_enabled=False, priority=3)
    e = Enc()
    req.encode(e)
    out = M.CreateSubscriptionRequest.decode(Dec(e.data()))
    assert out.requested_publishing_interval_ms == 250.0
    assert out.requested_max_keepalive_count == 7
    assert out.publishing_enabled is False
    assert out.priority == 3

    items = M.CreateMonitoredItemsRequest(
        subscription_id=9,
        items=[M.MonitoredItemCreateRequest(
            item_to_monitor=M.ReadValueId(NodeId(1, "u1.pH_outlet")),
            monitoring_mode=2,
            requested_parameters=M.MonitoringParameters(
                client_handle=42, queue_size=4, discard_oldest=False))])
    e = Enc()
    items.encode(e)
    out = M.CreateMonitoredItemsRequest.decode(Dec(e.data()))
    assert out.subscription_id == 9
    assert out.items[0].requested_parameters.client_handle == 42
    assert out.items[0].requested_parameters.discard_oldest is False

    dcn = M.DataChangeNotification([M.MonitoredItemNotification(
        7, DataValue(value=Variant(VT_DOUBLE, 7.25), status=0))])
    rsp = M.PublishResponse(
        subscription_id=3, available_sequence_numbers=[1, 2],
        more_notifications=True,
        notification_message=M.NotificationMessage(
            sequence_number=2, publish_time=5,
            notification_data=[dcn.to_extension_object()]),
        results=[M.GOOD, M.BAD_SEQUENCE_NUMBER_UNKNOWN])
    e = Enc()
    rsp.encode(e)
    out = M.PublishResponse.decode(Dec(e.data()))
    assert out.subscription_id == 3
    assert out.available_sequence_numbers == [1, 2]
    assert out.more_notifications is True
    assert out.results[1] == M.BAD_SEQUENCE_NUMBER_UNKNOWN
    got = M.DataChangeNotification.from_extension_object(
        out.notification_message.notification_data[0])
    assert got.monitored_items[0].client_handle == 7
    assert got.monitored_items[0].value.value.value == 7.25


def test_subscription_data_change_push(plant_server):
    """The full SCADA push path: initial values arrive on the first
    Publish, only changes arrive afterwards, acks trim the
    retransmission queue, and Republish replays unacked messages."""
    server, slave = plant_server
    with OPCUAClient("127.0.0.1", server.actual_port) as c:
        sub_id, interval = c.create_subscription(
            publishing_interval=0.1, max_keepalive_count=50)
        assert interval >= 0.05
        results = c.create_monitored_items(
            sub_id, ["u1.pH_outlet", "u1.chlorine_outlet"],
            client_handles=[10, 11])
        assert [r.status for r in results] == [M.GOOD, M.GOOD]
        assert results[0].revised_sampling_interval_ms == \
            pytest.approx(interval * 1000.0)

        # First publish: initial values for both items
        rsp = c.publish(timeout=5.0)
        changes = dict(OPCUAClient.data_changes(rsp))
        assert changes[10].value.value == pytest.approx(7.2, 1e-5)
        assert changes[11].value.value == pytest.approx(0.85, 1e-5)
        seq1 = rsp.notification_message.sequence_number

        # Change ONE value server-side; only that item is notified
        slave.update_input_register("pH_outlet", 7.5, unit=1)
        rsp = c.publish(acks=[(sub_id, seq1)], timeout=5.0)
        changes = OPCUAClient.data_changes(rsp)
        assert len(changes) == 1
        assert changes[0][0] == 10
        assert changes[0][1].value.value == pytest.approx(7.5, 1e-5)
        seq2 = rsp.notification_message.sequence_number
        assert seq2 == seq1 + 1
        # seq1 was acked; only seq2 remains available
        assert rsp.results == [M.GOOD]
        assert rsp.available_sequence_numbers == [seq2]

        # Republish replays the unacked message
        msg = c.republish(sub_id, seq2)
        replay = M.DataChangeNotification.from_extension_object(
            msg.notification_data[0])
        assert replay.monitored_items[0].value.value.value == \
            pytest.approx(7.5, 1e-5)
        # Acking it makes it unavailable
        slave.update_input_register("pH_outlet", 7.6, unit=1)
        rsp = c.publish(acks=[(sub_id, seq2)], timeout=5.0)
        assert rsp.results == [M.GOOD]
        with pytest.raises(OPCUAError) as err:
            c.republish(sub_id, seq2)
        assert err.value.status == M.BAD_MESSAGE_NOT_AVAILABLE
        # Unknown ack sequence is reported per-ack, not as a fault
        slave.update_input_register("pH_outlet", 7.7, unit=1)
        rsp = c.publish(acks=[(sub_id, 999)], timeout=5.0)
        assert rsp.results == [M.BAD_SEQUENCE_NUMBER_UNKNOWN]

        c.delete_subscriptions([sub_id])


def test_modify_subscription_revises_interval(plant_server):
    """ModifySubscription (Part 4 §5.13.3): a slow subscription revised
    to a fast interval starts publishing at the new cadence immediately
    (the pending sample deadline is re-anchored), the response carries
    the revised values, and an unknown id faults."""
    server, slave = plant_server
    with OPCUAClient("127.0.0.1", server.actual_port) as c:
        sub_id, interval = c.create_subscription(publishing_interval=30.0)
        assert interval == pytest.approx(30.0)
        c.create_monitored_items(sub_id, ["u2.pH_outlet"],
                                 client_handles=[1])
        revised = c.modify_subscription(sub_id, publishing_interval=0.1)
        assert revised == pytest.approx(0.1)
        t0 = time.monotonic()
        rsp = c.publish(timeout=5.0)      # initial value at the NEW rate
        assert OPCUAClient.data_changes(rsp)
        assert time.monotonic() - t0 < 5.0
        slave.update_input_register("pH_outlet", 6.4, unit=2)
        rsp = c.publish(timeout=5.0)
        changes = OPCUAClient.data_changes(rsp)
        assert changes and changes[0][1].value.value == pytest.approx(
            6.4, 1e-5)
        slave.update_input_register("pH_outlet", 6.9, unit=2)  # restore
        with pytest.raises(OPCUAError) as err:
            c.modify_subscription(sub_id + 999, publishing_interval=0.1)
        assert err.value.status == M.BAD_SUBSCRIPTION_ID_INVALID


def test_modify_subscription_resets_lifetime(plant_server):
    """The modify proves client liveness: a nearly-expired subscription
    revised to a fast interval must NOT expire on the stale counter
    (Part 4 lifetime semantics — the counter resets on modify)."""
    server, slave = plant_server
    with OPCUAClient("127.0.0.1", server.actual_port) as c:
        # distinctive lifetime_count: gc-based reach-in must not match a
        # dead subscription from an earlier test with the same id
        sub_id, _ = c.create_subscription(publishing_interval=0.2,
                                          lifetime_count=77)
        c.create_monitored_items(sub_id, ["u2.pH_outlet"])
        # Age the subscription to the brink of expiry server-side; the
        # per-connection state is private to the handler task, so reach
        # the live _Subscription object via gc.
        import gc

        from ics_wt_physicsengine_tpu.opcua.server import _Subscription
        live = [o for o in gc.get_objects()
                if isinstance(o, _Subscription) and o.id == sub_id
                and o.lifetime_count == 77]
        assert len(live) == 1, "live subscription object not found"
        # brink of expiry, with margin for sample ticks that land between
        # this poke and the modify (the publisher increments the counter
        # on every no-publish-queued tick)
        live[0].lifetime_elapsed = live[0].lifetime_count - 10

        revised = c.modify_subscription(sub_id, publishing_interval=0.1,
                                        lifetime_count=77)
        assert revised == pytest.approx(0.1)
        # reset by the modify; a few post-modify ticks may already have
        # re-incremented it, but without the reset it would still be
        # near lifetime_count - 10
        assert live[0].lifetime_elapsed < 30
        # the subscription still answers (no BAD_NO_SUBSCRIPTION)
        rsp = c.publish(timeout=5.0)
        assert rsp.subscription_id == sub_id


def test_register_unregister_nodes_roundtrip(plant_server):
    """RegisterNodes/UnregisterNodes (Part 4 §5.8.5): the optimization
    hint answers with usable ids (echoed here) instead of a ServiceFault,
    the registered ids read correctly, and empty requests fault."""
    server, slave = plant_server
    with OPCUAClient("127.0.0.1", server.actual_port) as c:
        ids = c.register_nodes(["u1.pH_outlet", "u2.pH_outlet"])
        assert len(ids) == 2
        vals = c.read(ids)
        assert vals[0].value.value == pytest.approx(7.2, 1e-5)
        assert vals[1].value.value == pytest.approx(6.9, 1e-5)
        c.unregister_nodes(ids)          # no-op, must not fault
        with pytest.raises(OPCUAError) as err:
            c.register_nodes([])
        assert err.value.status == M.BAD_NOTHING_TO_DO


def test_data_change_filter_absolute_deadband(plant_server):
    """Absolute-deadband DataChangeFilter (Part 4 §7.22.2): numeric
    changes inside the band vs the last REPORTED value are suppressed,
    out-of-band changes report, and the percent variant on a node
    WITHOUT an EURange is refused with Bad_FilterNotAllowed (Part 8)."""
    server, slave = plant_server
    with OPCUAClient("127.0.0.1", server.actual_port) as c:
        sub_id, _ = c.create_subscription(publishing_interval=0.1,
                                          max_keepalive_count=50)
        res = c.create_monitored_items(sub_id, ["u2.pH_outlet"],
                                       deadband=0.5)
        assert res[0].status == M.GOOD
        rsp = c.publish(timeout=5.0)        # initial value (6.9)
        seq = rsp.notification_message.sequence_number
        assert OPCUAClient.data_changes(rsp)

        # in-band change: several sample ticks pass, nothing queues
        slave.update_input_register("pH_outlet", 7.1, unit=2)   # d=0.2
        time.sleep(0.5)
        # out-of-band change vs the last REPORTED 6.9: next publish
        # carries ONLY the 8.0 (the 7.1 was never a data change)
        slave.update_input_register("pH_outlet", 8.0, unit=2)   # d=1.1
        rsp = c.publish(acks=[(sub_id, seq)], timeout=5.0)
        changes = OPCUAClient.data_changes(rsp)
        assert len(changes) == 1
        assert changes[0][1].value.value == pytest.approx(8.0, 1e-5)

        # percent deadband on a node with NO EURange (simulation_time
        # is an unbounded counter): Bad_FilterNotAllowed per Part 8
        filt = M.DataChangeFilter(trigger=1, deadband_type=2,
                                  deadband_value=10.0
                                  ).to_extension_object()
        req = M.CreateMonitoredItemsRequest(
            c._request_header(), subscription_id=sub_id,
            items=[M.MonitoredItemCreateRequest(
                item_to_monitor=M.ReadValueId(c._node("u2.simulation_time")),
                requested_parameters=M.MonitoringParameters(
                    client_handle=9, filter=filt))])
        rsp2 = c._service(M.ID_CREATE_MONITORED_ITEMS_REQ, req,
                          M.ID_CREATE_MONITORED_ITEMS_RSP,
                          M.CreateMonitoredItemsResponse.decode)
        assert rsp2.results[0].status == M.BAD_FILTER_NOT_ALLOWED

        # negative absolute deadband: invalid
        filt = M.DataChangeFilter(trigger=1, deadband_type=1,
                                  deadband_value=-1.0
                                  ).to_extension_object()
        req = M.CreateMonitoredItemsRequest(
            c._request_header(), subscription_id=sub_id,
            items=[M.MonitoredItemCreateRequest(
                item_to_monitor=M.ReadValueId(c._node("u2.chlorine_outlet")),
                requested_parameters=M.MonitoringParameters(
                    client_handle=10, filter=filt))])
        rsp3 = c._service(M.ID_CREATE_MONITORED_ITEMS_REQ, req,
                          M.ID_CREATE_MONITORED_ITEMS_RSP,
                          M.CreateMonitoredItemsResponse.decode)
        assert rsp3.results[0].status == M.BAD_DEADBAND_FILTER_INVALID


def test_eu_range_property_and_percent_deadband(plant_server):
    """Part 8 AnalogItem semantics: analog variables expose an EURange
    property (browseable + readable as a Range structure), and percent
    deadbands convert to absolute bands over the EURange span."""
    server, slave = plant_server
    with OPCUAClient("127.0.0.1", server.actual_port) as c:
        # EURange property readable: chlorine 0-10 mg/L, pH 0-14
        assert c.read_eu_range("u1.chlorine_outlet") == (0.0, 10.0)
        assert c.read_eu_range("u1.pH_inlet") == (0.0, 14.0)
        # browse of the variable surfaces the property
        assert "EURange" in c.browse("u1.chlorine_outlet")
        # folders don't list properties as children
        assert "EURange" not in c.browse("u1")

        # percent deadband: 10 % of (0,10) = 1.0 mg/L absolute band
        sub_id, _ = c.create_subscription(publishing_interval=0.1,
                                          max_keepalive_count=50)
        res = c.create_monitored_items(sub_id, ["u1.chlorine_outlet"],
                                       deadband=10.0,
                                       deadband_percent=True)
        assert res[0].status == M.GOOD
        rsp = c.publish(timeout=5.0)          # initial value (0.85)
        seq = rsp.notification_message.sequence_number
        assert OPCUAClient.data_changes(rsp)

        # in-band: |1.5 - 0.85| = 0.65 < 1.0 — suppressed
        slave.update_input_register("chlorine_outlet", 1.5, unit=1)
        time.sleep(0.5)
        # out-of-band: |2.5 - 0.85| = 1.65 > 1.0 — reported
        slave.update_input_register("chlorine_outlet", 2.5, unit=1)
        rsp = c.publish(acks=[(sub_id, seq)], timeout=5.0)
        changes = OPCUAClient.data_changes(rsp)
        assert len(changes) == 1
        assert changes[0][1].value.value == pytest.approx(2.5, 1e-5)

        # out-of-range percentage: invalid
        filt = M.DataChangeFilter(trigger=1, deadband_type=2,
                                  deadband_value=150.0
                                  ).to_extension_object()
        req = M.CreateMonitoredItemsRequest(
            c._request_header(), subscription_id=sub_id,
            items=[M.MonitoredItemCreateRequest(
                item_to_monitor=M.ReadValueId(c._node("u1.pH_outlet")),
                requested_parameters=M.MonitoringParameters(
                    client_handle=4, filter=filt))])
        rsp2 = c._service(M.ID_CREATE_MONITORED_ITEMS_REQ, req,
                          M.ID_CREATE_MONITORED_ITEMS_RSP,
                          M.CreateMonitoredItemsResponse.decode)
        assert rsp2.results[0].status == M.BAD_DEADBAND_FILTER_INVALID


def test_subscription_keepalive_and_publishing_mode(plant_server):
    server, slave = plant_server
    with OPCUAClient("127.0.0.1", server.actual_port) as c:
        sub_id, _ = c.create_subscription(publishing_interval=0.1,
                                          max_keepalive_count=2)
        c.create_monitored_items(sub_id, ["u2.pH_outlet"],
                                 client_handles=[1])
        rsp = c.publish(timeout=5.0)   # initial value
        assert OPCUAClient.data_changes(rsp)
        # Nothing changes: the next response is a keepalive after
        # ~max_keepalive_count intervals, with no payload and the NEXT
        # (unconsumed) sequence number.
        next_seq = rsp.notification_message.sequence_number + 1
        rsp = c.publish(timeout=5.0)
        assert OPCUAClient.data_changes(rsp) == []
        assert rsp.notification_message.sequence_number == next_seq

        # Publishing disabled: data changes queue but only keepalives
        # are delivered; re-enabling delivers the queued change.
        assert c.set_publishing_mode(False, [sub_id]) == [M.GOOD]
        slave.update_input_register("pH_outlet", 6.5, unit=2)
        rsp = c.publish(timeout=5.0)
        assert OPCUAClient.data_changes(rsp) == []
        assert c.set_publishing_mode(True, [sub_id]) == [M.GOOD]
        rsp = c.publish(timeout=5.0)
        changes = OPCUAClient.data_changes(rsp)
        assert len(changes) == 1
        assert changes[0][1].value.value == pytest.approx(6.5, 1e-5)


def test_subscription_expires_without_publishes(plant_server):
    """A client that stops sending PublishRequests cannot pin server
    state: the subscription expires after its (clamped) lifetime."""
    server, _ = plant_server
    with OPCUAClient("127.0.0.1", server.actual_port) as c:
        sub_id, interval = c.create_subscription(
            publishing_interval=0.1, lifetime_count=1,
            max_keepalive_count=1)
        # lifetime is clamped to >= 3 x keepalive intervals
        c.create_monitored_items(sub_id, ["u1.pH_outlet"])
        time.sleep(interval * 8)
        with pytest.raises(OPCUAError) as err:
            c.publish(timeout=3.0)
        assert err.value.status == M.BAD_NO_SUBSCRIPTION


def test_subscription_error_paths(plant_server):
    server, _ = plant_server
    with OPCUAClient("127.0.0.1", server.actual_port) as c:
        # Publish with no subscription at all
        with pytest.raises(OPCUAError) as err:
            c.publish(timeout=3.0)
        assert err.value.status == M.BAD_NO_SUBSCRIPTION
        # Monitored items against a bad subscription id
        with pytest.raises(OPCUAError) as err:
            c.create_monitored_items(777, ["u1.pH_outlet"])
        assert err.value.status == M.BAD_SUBSCRIPTION_ID_INVALID
        sub_id, _ = c.create_subscription(publishing_interval=0.1)
        # Unknown node: per-item status, not a fault
        res = c.create_monitored_items(sub_id, ["u1.nope"])
        assert res[0].status == M.BAD_NODE_ID_UNKNOWN
        # Empty delete: Bad_NothingToDo
        with pytest.raises(OPCUAError) as err:
            c.delete_monitored_items(sub_id, [])
        assert err.value.status == M.BAD_NOTHING_TO_DO
        # Delete a real item
        res = c.create_monitored_items(sub_id, ["u1.pH_outlet"])
        ok = c.delete_monitored_items(
            sub_id, [res[0].monitored_item_id, 999])
        assert ok == [M.GOOD, M.BAD_MONITORED_ITEM_ID_INVALID]
        assert c.delete_subscriptions([sub_id, sub_id]) == \
            [M.GOOD, M.BAD_SUBSCRIPTION_ID_INVALID]


# ---------------------------------------------------------------------------
# Bridge over the C++ Modbus data plane
# ---------------------------------------------------------------------------

def test_bridge_over_native_slave():
    """The OPC UA plane serves the C++ store too — both data planes expose
    one set of registers (gated on the built native library)."""
    from ics_wt_physicsengine_tpu.modbus.native_slave import (
        NativeModbusSlave, is_available)
    if not is_available():
        pytest.skip("native Modbus library not built")
    slave = NativeModbusSlave(ModbusRegisterMap(),
                              ModbusServerConfig(host="127.0.0.1", port=0))
    slave.update_input_register("pH_outlet", 7.33)
    slave.update_discrete_input("sensor_fault_pH_outlet", True)
    server = OPCUAServer(slave, host="127.0.0.1", port=0)
    server.start()
    try:
        with OPCUAClient("127.0.0.1", server.actual_port) as c:
            assert c.read_double("u1.pH_outlet") == pytest.approx(7.33, 1e-5)
            assert c.read_bool("u1.sensor_fault_pH_outlet") is True
            c.write_double("u1.acid_flow_rate", 3.25)
        assert slave.read_holding_register("acid_flow_rate") == \
            pytest.approx(3.25, 1e-5)
    finally:
        server.stop()
        slave.stop()


def test_bridge_over_native_slave_multi_unit():
    """Fleet shape on the C++ plane: per-unit folders, per-unit banks,
    subscription push from one unit's bank only."""
    from ics_wt_physicsengine_tpu.modbus.native_slave import (
        NativeModbusSlave, is_available)
    if not is_available():
        pytest.skip("native Modbus library not built")
    slave = NativeModbusSlave(ModbusRegisterMap(),
                              ModbusServerConfig(host="127.0.0.1",
                                                 port=0),
                              units=[1, 2, 3])
    for u, v in ((1, 7.1), (2, 7.2), (3, 7.3)):
        slave.update_input_register("pH_outlet", v, unit=u)
    server = OPCUAServer(slave, host="127.0.0.1", port=0)
    server.start()
    try:
        with OPCUAClient("127.0.0.1", server.actual_port) as c:
            assert c.browse(M.OBJECTS_FOLDER) == \
                ["Unit1", "Unit2", "Unit3"]
            for u, v in ((1, 7.1), (2, 7.2), (3, 7.3)):
                assert c.read_double(f"u{u}.pH_outlet") == \
                    pytest.approx(v, 1e-5)
            # write isolation across C++ banks
            c.write_double("u2.acid_flow_rate", 1.5)
            assert slave.read_holding_register(
                "acid_flow_rate", unit=2) == pytest.approx(1.5, 1e-5)
            assert slave.read_holding_register(
                "acid_flow_rate", unit=1) == pytest.approx(0.0, abs=1e-6)
            # subscription on unit 3 sees only unit 3's changes
            sub_id, _ = c.create_subscription(publishing_interval=0.1,
                                              max_keepalive_count=50)
            c.create_monitored_items(sub_id, ["u3.pH_outlet"],
                                     client_handles=[33])
            rsp = c.publish(timeout=5.0)
            changes = dict(OPCUAClient.data_changes(rsp))
            assert changes[33].value.value == pytest.approx(7.3, 1e-5)
            slave.update_input_register("pH_outlet", 9.9, unit=1)
            slave.update_input_register("pH_outlet", 7.35, unit=3)
            rsp = c.publish(
                acks=[(sub_id,
                       rsp.notification_message.sequence_number)],
                timeout=5.0)
            changes = OPCUAClient.data_changes(rsp)
            assert len(changes) == 1
            assert changes[0][1].value.value == pytest.approx(7.35, 1e-5)
            c.delete_subscriptions([sub_id])
    finally:
        server.stop()
        slave.stop()


def test_translate_browse_paths(plant_server):
    """Discovery stacks resolve Objects/UnitN/<register> paths to node
    ids with TranslateBrowsePathsToNodeIds instead of browsing."""
    server, _ = plant_server
    with OPCUAClient("127.0.0.1", server.actual_port) as c:
        nid = c.translate_path("Unit1", "pH_outlet")
        assert nid == NodeId(1, "u1.pH_outlet")
        # the resolved id reads directly
        dv = c.read([nid])[0]
        assert dv.value.value == pytest.approx(7.2, 1e-5)
        nid = c.translate_path("Unit2")
        assert nid == NodeId(1, "u2")
        with pytest.raises(OPCUAError) as err:
            c.translate_path("Unit1", "no_such_register")
        assert err.value.status == M.BAD_NO_MATCH
        with pytest.raises(OPCUAError) as err:
            c.translate_path("Unit9")
        assert err.value.status == M.BAD_NO_MATCH


def test_set_monitoring_mode(plant_server):
    """Disabled items stop reporting (their queue is dropped);
    re-enabling reports the current value again."""
    server, slave = plant_server
    with OPCUAClient("127.0.0.1", server.actual_port) as c:
        sub_id, _ = c.create_subscription(publishing_interval=0.1,
                                          max_keepalive_count=2)
        res = c.create_monitored_items(sub_id, ["u1.pH_outlet"],
                                       client_handles=[5])
        item_id = res[0].monitored_item_id
        assert OPCUAClient.data_changes(c.publish(timeout=5.0))
        # disable: a change must NOT be reported (keepalives only)
        assert c.set_monitoring_mode(sub_id, 0, [item_id]) == [M.GOOD]
        slave.update_input_register("pH_outlet", 8.1, unit=1)
        rsp = c.publish(timeout=5.0)
        assert OPCUAClient.data_changes(rsp) == []
        # re-enable: the current value is reported as a fresh initial
        assert c.set_monitoring_mode(sub_id, 2, [item_id]) == [M.GOOD]
        rsp = c.publish(timeout=5.0)
        changes = OPCUAClient.data_changes(rsp)
        assert len(changes) == 1
        assert changes[0][1].value.value == pytest.approx(8.1, 1e-5)
        assert c.set_monitoring_mode(sub_id, 0, [999]) == \
            [M.BAD_MONITORED_ITEM_ID_INVALID]


# ---------------------------------------------------------------------------
# Protocol-flow regressions (code-review findings)
# ---------------------------------------------------------------------------

def test_late_publish_response_does_not_desync_client(plant_server):
    """A Publish whose wait times out client-side leaves the request
    outstanding server-side; when its response eventually arrives, the
    request-id correlation discards it instead of corrupting the next
    service call."""
    server, slave = plant_server
    with OPCUAClient("127.0.0.1", server.actual_port) as c:
        sub_id, _ = c.create_subscription(publishing_interval=0.1,
                                          max_keepalive_count=500)
        c.create_monitored_items(sub_id, ["u1.pH_outlet"])
        c.publish(timeout=5.0)                      # initial value
        # no data changes now: the next publish has nothing to answer
        # with for 500 intervals — time out the wait client-side
        with pytest.raises(OPCUAError) as err:
            c.publish(timeout=0.5)
        assert err.value.status == M.BAD_TIMEOUT
        # the queued publish answers as soon as data changes — while we
        # are awaiting a READ response. Correlation must skip it.
        slave.update_input_register("pH_outlet", 7.9, unit=1)
        time.sleep(0.3)
        for _ in range(5):
            assert c.read_double("u1.pH_outlet") == \
                pytest.approx(7.9, 1e-5)
        c.delete_subscriptions([sub_id])


def test_orphaned_publish_faults_after_delete_subscriptions(plant_server):
    """A PublishRequest queued when the last subscription is deleted is
    answered with Bad_NoSubscription, not stranded forever."""
    from ics_wt_physicsengine_tpu.opcua.encoding import (
        Decoder as Dec, Encoder as Enc)

    server, _ = plant_server
    with OPCUAClient("127.0.0.1", server.actual_port) as c:
        sub_id, _ = c.create_subscription(publishing_interval=0.1,
                                          max_keepalive_count=500)
        c.create_monitored_items(sub_id, ["u1.pH_outlet"])
        c.publish(timeout=5.0)                      # initial value
        # hand-roll a Publish we do NOT wait for (a pipelined request)
        c._seq += 1
        c._req_id += 1
        publish_req_id = c._req_id
        e = Enc()
        e.uint32(c._channel_id)
        e.uint32(c._token_id)
        M.SequenceHeader(c._seq, c._req_id).encode(e)
        e.raw(M.encode_service(M.ID_PUBLISH_REQ,
                               M.PublishRequest(c._request_header())))
        c._sock.sendall(M.frame("MSG", e.data()))
        # deleting the only subscription must fault that queued publish
        assert c.delete_subscriptions([sub_id]) == [M.GOOD]
        deadline = time.time() + 5
        fault = None
        while time.time() < deadline and fault is None:
            msg_type, _, body = c._recv(timeout=5.0)
            assert msg_type == "MSG"
            d = Dec(body)
            d.uint32()
            d.uint32()
            seq = M.SequenceHeader.decode(d)
            if seq.request_id != publish_req_id:
                continue
            assert M.decode_service_id(d) == M.ID_SERVICE_FAULT
            fault = M.ServiceFault.decode(d)
        assert fault is not None
        assert fault.header.service_result == M.BAD_NO_SUBSCRIPTION


def test_array_variant_writes_rejected(plant_server):
    """Array variants must not be coerced onto the scalar address space
    (bool([False, False]) is True!) — they are a type mismatch."""
    server, slave = plant_server
    with OPCUAClient("127.0.0.1", server.actual_port) as c:
        before = slave.read_coil("acid_pump_enable", unit=1)
        status = c.write([("u1.acid_pump_enable",
                           Variant(VT_BOOLEAN, [False, False],
                                   is_array=True))])[0]
        assert status == M.BAD_TYPE_MISMATCH
        assert slave.read_coil("acid_pump_enable", unit=1) is before
        status = c.write([("u1.chlorine_flow_rate",
                           Variant(VT_DOUBLE, [1.0], is_array=True))])[0]
        assert status == M.BAD_TYPE_MISMATCH


def test_oversized_response_faults_not_oversized_chunk(plant_server):
    """A client with a small declared receive buffer gets a
    Bad_ResponseTooLarge fault, never a chunk beyond its buffer."""
    import socket as socket_mod

    server, _ = plant_server
    c = OPCUAClient("127.0.0.1", server.actual_port)
    c._sock = socket_mod.create_connection(
        ("127.0.0.1", server.actual_port), timeout=5)
    c._sock.sendall(M.Hello(receive_buffer_size=4096,
                            endpoint_url="opc.tcp://x/plant").encode())
    msg_type, _, body = c._recv()
    assert msg_type == "ACK"
    ack = M.Acknowledge.decode(body)
    assert ack.send_buffer_size == 4096    # server honors our buffer
    c._open_channel()
    c._create_session("opc.tcp://x/plant")
    # small responses still work
    assert c.read_double("u1.pH_outlet") == pytest.approx(7.2, 1e-5)
    # a read large enough to overflow 4096 bytes faults cleanly
    with pytest.raises(OPCUAError) as err:
        c.read(["u1.pH_outlet"] * 200)
    assert err.value.status == M.BAD_RESPONSE_TOO_LARGE
    # and the channel is still usable afterwards
    assert c.read_double("u1.pH_outlet") == pytest.approx(7.2, 1e-5)
    c._sock.close()


def test_client_reconnect_after_close(plant_server):
    """One client object can connect/close/connect again: per-connection
    state (buffer, ids, tokens) resets on connect()."""
    server, _ = plant_server
    c = OPCUAClient("127.0.0.1", server.actual_port)
    with c:
        sub_id, _ = c.create_subscription(publishing_interval=0.1)
        c.create_monitored_items(sub_id, ["u1.pH_outlet"])
        c.publish(timeout=5.0)
    with c:   # reconnect the SAME object
        assert c.read_double("u1.pH_outlet") == pytest.approx(7.2, 1e-5)


def test_start_error_reports_cause():
    """A bind failure surfaces the underlying OSError, not a generic
    10-second timeout."""
    import socket as socket_mod

    blocker = socket_mod.socket()
    blocker.bind(("127.0.0.1", 0))
    blocker.listen(1)
    port = blocker.getsockname()[1]
    slave = ModbusSlave(ModbusRegisterMap(),
                        ModbusServerConfig(host="127.0.0.1", port=0))
    server = OPCUAServer(slave, host="127.0.0.1", port=port)
    try:
        t0 = time.time()
        with pytest.raises(RuntimeError) as err:
            server.start()
        assert time.time() - t0 < 5.0          # no 10 s hang
        assert "failed to start:" in str(err.value)
    finally:
        blocker.close()


def test_wildcard_bind_advertises_connectable_endpoint():
    """host=0.0.0.0 must not leak into the advertised endpointUrl —
    discovery-driven clients dial what GetEndpoints returns."""
    slave = ModbusSlave(ModbusRegisterMap(),
                        ModbusServerConfig(host="127.0.0.1", port=0))
    server = OPCUAServer(slave, host="0.0.0.0", port=0)
    server.start()
    try:
        with OPCUAClient("127.0.0.1", server.actual_port) as c:
            url = c.get_endpoints()[0].endpoint_url
        assert "0.0.0.0" not in url
    finally:
        server.stop()


def test_duplicate_register_names_fail_fast():
    """A register map whose names collide across register types would
    silently alias two registers onto one node — refuse at startup."""
    from types import SimpleNamespace

    reg = SimpleNamespace(name="pump", register_type=RegisterType.COIL,
                          units="", description="")
    reg2 = SimpleNamespace(name="pump",
                           register_type=RegisterType.HOLDING_REGISTER,
                           units="", description="")
    fake_slave = SimpleNamespace(
        units=[1],
        register_map=SimpleNamespace(
            input_registers=[], holding_registers=[reg2],
            coils=[reg], discrete_inputs=[]))
    with pytest.raises(ValueError, match="unique"):
        OPCUAServer(fake_slave, host="127.0.0.1", port=0)


def test_fleet_serves_opcua_per_unit():
    """`--fleet N --opcua` serves every unit as its own folder on one
    OPC UA endpoint, with per-unit writes landing in the right lane."""
    import socket as socket_mod

    import ics_wt_physicsengine_tpu.__main__ as orchestrator

    def free_port():
        s = socket_mod.socket()
        s.bind(("127.0.0.1", 0))
        p = s.getsockname()[1]
        s.close()
        return p

    mb_port, ua_port = free_port(), free_port()
    orchestrator.running = True
    thread = threading.Thread(
        target=orchestrator.main,
        args=(["--port", str(mb_port), "--host", "127.0.0.1", "--dt",
               "30", "--duration", "1000000", "--rtf", "0", "--seed",
               "13", "--fleet", "2", "--zones", "4",
               "--opcua", str(ua_port)],),
        daemon=True)
    thread.start()
    try:
        deadline = time.time() + 60
        client = None
        while time.time() < deadline:
            try:
                client = OPCUAClient("127.0.0.1", ua_port).connect()
                break
            except OSError:
                time.sleep(0.3)
        assert client is not None, "fleet OPC UA server did not start"
        with client as c:
            assert c.browse(M.OBJECTS_FOLDER) == ["Unit1", "Unit2"]
            # both lanes advance
            deadline = time.time() + 120
            while time.time() < deadline:
                t1 = c.read_double("u1.simulation_time")
                t2 = c.read_double("u2.simulation_time")
                if t1 > 60.0 and t2 > 60.0:
                    break
                time.sleep(0.2)
            assert t1 > 60.0 and t2 > 60.0
            # a write to unit 2 does not leak into unit 1
            c.write_double("u2.chlorine_flow_rate", 0.42)
            assert c.read_double("u2.chlorine_flow_rate") == \
                pytest.approx(0.42, 1e-5)
            assert c.read_double("u1.chlorine_flow_rate") != \
                pytest.approx(0.42, 1e-5)
    finally:
        orchestrator.running = False
        thread.join(timeout=30)


# ---------------------------------------------------------------------------
# Orchestrator CLI end-to-end (--opcua)
# ---------------------------------------------------------------------------

def test_orchestrator_serves_opcua():
    """`--opcua PORT` serves the live plant: published measurements are
    readable, and an OPC UA dosing write lands in the same validated
    holding registers the control loop consumes."""
    import contextlib
    import socket as socket_mod

    import ics_wt_physicsengine_tpu.__main__ as orchestrator

    def free_port():
        s = socket_mod.socket()
        s.bind(("127.0.0.1", 0))
        p = s.getsockname()[1]
        s.close()
        return p

    mb_port, ua_port = free_port(), free_port()
    orchestrator.running = True
    thread = threading.Thread(
        target=orchestrator.main,
        args=(["--port", str(mb_port), "--host", "127.0.0.1", "--dt", "30",
               "--duration", "100000", "--rtf", "0", "--seed", "11",
               "--opcua", str(ua_port)],),
        daemon=True)
    thread.start()
    try:
        deadline = time.time() + 60
        client = None
        while time.time() < deadline:
            try:
                client = OPCUAClient("127.0.0.1", ua_port).connect()
                break
            except OSError:
                time.sleep(0.3)
        assert client is not None, "OPC UA server did not start"
        with contextlib.closing(client) as c:
            # Simulation time advances (plant is live behind the bridge)
            deadline = time.time() + 120
            t0 = c.read_double("u1.simulation_time")
            while time.time() < deadline:
                t1 = c.read_double("u1.simulation_time")
                if t1 > t0 + 30.0:
                    break
                time.sleep(0.2)
            assert t1 > t0 + 30.0
            # Plant measurements become plausible once sensors warm up
            deadline = time.time() + 120
            ph = c.read_double("u1.pH_outlet")
            while time.time() < deadline and not 6.0 < ph < 9.0:
                time.sleep(0.2)
                ph = c.read_double("u1.pH_outlet")
            assert 6.0 < ph < 9.0
            # A write lands in the orchestrator's validated command path
            c.write_double("u1.chlorine_flow_rate", 2.5)
            assert c.read_double("u1.chlorine_flow_rate") == \
                pytest.approx(2.5, 1e-5)
    finally:
        orchestrator.running = False
        thread.join(timeout=30)


def test_adaptive_publish_load_shedding():
    """Load-adaptive publishing-interval revision: past the server's
    aggregate sample-tick budget, CreateSubscription/ModifySubscription
    revise intervals up (Part 4 §5.13.2 server-revision semantics), and
    once the budget is exhausted new subscriptions get the 60 s FLOOR
    cadence instead of a refusal — the subscribe plane sheds cadence,
    never sessions (the round-5 1000-session load test caught the old
    refusal branch turning away 687 of 1000 sessions while the first
    312 kept full cadence; LOADTEST_r05_opcua_subscribe now shows 0
    errors)."""
    slave = ModbusSlave(ModbusRegisterMap(),
                        ModbusServerConfig(host="127.0.0.1", port=0),
                        units=[1])
    server = OPCUAServer(slave, host="127.0.0.1", port=0,
                         adaptive_tick_budget_per_s=2.5)
    server.start()
    try:
        with OPCUAClient("127.0.0.1", server.actual_port) as c:
            # Within budget: served at the requested cadence.
            s1, r1 = c.create_subscription(publishing_interval=1.0)
            s2, r2 = c.create_subscription(publishing_interval=1.0)
            assert r1 == pytest.approx(1.0) and r2 == pytest.approx(1.0)
            # Third 1 Hz subscription would take the aggregate to 3.0
            # ticks/s > 2.5: revised up to the remaining headroom
            # (0.5 ticks/s -> 2 s cadence).
            s3, r3 = c.create_subscription(publishing_interval=1.0)
            assert r3 == pytest.approx(2.0, rel=1e-6)
            # Budget exhausted: floor-granted at 60 s, never refused.
            s_floor, r_floor = c.create_subscription(
                publishing_interval=1.0)
            assert r_floor == pytest.approx(60.0, rel=1e-6)
            c.delete_subscriptions([s_floor])
            # Modify frees its own old rate first: re-pacing s3 to 2 s is
            # a no-op revision, and slowing s1 to 5 s frees headroom...
            assert c.modify_subscription(s3, publishing_interval=2.0) \
                == pytest.approx(2.0, rel=1e-6)
            assert c.modify_subscription(s1, publishing_interval=5.0) \
                == pytest.approx(5.0, rel=1e-6)
            # ...that a new subscription can then use (0.8 ticks/s free).
            s4, r4 = c.create_subscription(publishing_interval=1.25)
            assert r4 == pytest.approx(1.25, rel=1e-6)
            # Deleting releases the rate: drop s2 (1 Hz) and the next
            # 1 Hz create is served unrevised again.
            c.delete_subscriptions([s2])
            s5, r5 = c.create_subscription(publishing_interval=1.0)
            assert r5 == pytest.approx(1.0, rel=1e-6)
            # The aggregate ledger matches the live set: 1/5 + 1/2 +
            # 1/1.25 + 1 ticks/s.
            assert server._sub_ticks_per_s == pytest.approx(
                0.2 + 0.5 + 0.8 + 1.0, rel=1e-9)
        # Connection teardown releases everything.
        deadline = time.time() + 10
        while time.time() < deadline and server._sub_ticks_per_s > 1e-9:
            time.sleep(0.05)
        assert server._sub_ticks_per_s == pytest.approx(0.0, abs=1e-9)
    finally:
        server.stop()
