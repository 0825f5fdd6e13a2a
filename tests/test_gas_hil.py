"""Closed-loop HIL for the gas-exchange extension: orchestrator with
--enable-gas serving the extended register map; an external client reads
dissolved-O2/carbonate telemetry and drives the aeration actuator
(aeration_kla holding register) — the gas analogue of
tests/test_orchestrator.py's acid-dosing loop."""

import socket
import threading
import time

import pytest

from ics_wt_physicsengine_tpu.modbus import ModbusTcpClient

IR_PH_OUTLET = 4
IR_SIM_TIME = 100
IR_OXYGEN = 28
IR_CARBONATE = 30
HR_AERATION = 16


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def gas_sim():
    import ics_wt_physicsengine_tpu.__main__ as orchestrator

    port = _free_port()
    orchestrator.running = True
    thread = threading.Thread(
        target=orchestrator.main,
        args=(["--port", str(port), "--host", "127.0.0.1", "--dt", "30",
               "--duration", "100000", "--rtf", "0", "--seed", "11",
               "--enable-gas"],),
        daemon=True)
    thread.start()

    deadline = time.time() + 60
    client = None
    while time.time() < deadline:
        try:
            client = ModbusTcpClient("127.0.0.1", port, timeout=5).connect()
            break
        except OSError:
            time.sleep(0.3)
    if client is None:
        orchestrator.running = False
        pytest.fail("Orchestrator Modbus server did not start")

    yield client

    client.close()
    orchestrator.running = False
    thread.join(timeout=30)


def _wait_sim_time(client, target, timeout=120):
    deadline = time.time() + timeout
    while time.time() < deadline:
        t = client.read_float32(IR_SIM_TIME)
        if t >= target:
            return t
        time.sleep(0.2)
    pytest.fail(f"simulation did not reach t={target}")


def test_oxygen_telemetry_reads_saturation(gas_sim):
    """The DO register publishes the measured dissolved oxygen — near the
    Benson-Krause saturation (9.09 mg/L at 20 C) for the default plant."""
    client = gas_sim
    # optical DO warm-up is 60 s sim time; wait until the register is live
    deadline = time.time() + 120
    o2 = 0.0
    while time.time() < deadline:
        o2 = client.read_float32(IR_OXYGEN)
        if o2 > 1.0:
            break
        time.sleep(0.3)
    assert 7.5 < o2 < 10.5, f"DO register implausible: {o2}"
    ct = client.read_float32(IR_CARBONATE)
    assert 1.5 < ct < 2.5, f"carbonate register implausible: {ct}"


def test_aeration_actuator_strips_co2_and_raises_ph(gas_sim):
    """Write the aeration command: bubbling air strips dissolved CO2, so
    the carbonate register falls and outlet pH rises — the full physics
    chain exercised over the wire."""
    client = gas_sim
    # wait for the pH sensor's 1800 s warm-up (register reads 0 until then)
    deadline = time.time() + 120
    ph_before = 0.0
    while time.time() < deadline:
        ph_before = client.read_float32(IR_PH_OUTLET)
        if ph_before > 1.0:
            break
        time.sleep(0.3)
    ct_before = client.read_float32(IR_CARBONATE)
    assert ph_before > 5.0, f"pH sensor not warmed up: {ph_before}"
    assert ct_before > 1.5

    client.write_float32(HR_AERATION, 0.02)      # blowers on
    t_now = client.read_float32(IR_SIM_TIME)
    _wait_sim_time(client, t_now + 2400.0)

    ct_after = client.read_float32(IR_CARBONATE)
    ph_after = client.read_float32(IR_PH_OUTLET)
    assert ct_after < ct_before - 0.05, \
        f"carbonate did not fall: {ct_before} -> {ct_after}"
    assert ph_after > ph_before + 0.05, \
        f"pH did not rise under aeration: {ph_before} -> {ph_after}"
    client.write_float32(HR_AERATION, 0.0)


def test_aeration_command_is_clamped(gas_sim):
    """Zero-trust validation: an insane aeration command (1e6 1/s) must be
    clamped to the register's 0.1 1/s ceiling before touching physics —
    the plant stays finite and well-behaved."""
    client = gas_sim
    client.write_float32(HR_AERATION, 1e6)
    t_now = client.read_float32(IR_SIM_TIME)
    _wait_sim_time(client, t_now + 300.0)
    o2 = client.read_float32(IR_OXYGEN)
    ph = client.read_float32(IR_PH_OUTLET)
    assert 0.0 < o2 < 20.0 and 4.0 < ph < 10.0
    client.write_float32(HR_AERATION, 0.0)
