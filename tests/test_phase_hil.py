"""Closed-loop HIL for the phase-change extension: orchestrator with
--enable-phase serving the extended register map under arctic forcing; an
external client watches the ice-fraction telemetry grow and then commands a
thaw by writing the ambient-temperature holding register — the weather
analogue of tests/test_gas_hil.py's aeration loop."""

import socket
import threading
import time

import pytest

from ics_wt_physicsengine_tpu.modbus import ModbusTcpClient

IR_TEMP_OUTLET = 14
IR_SIM_TIME = 100
IR_ICE_TOP = 58
IR_ICE_MAX = 60
HR_AMBIENT_HUMIDITY = 32
HR_WIND_SPEED = 34
HR_AMBIENT_TEMPERATURE = 36


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def phase_sim():
    import ics_wt_physicsengine_tpu.__main__ as orchestrator

    port = _free_port()
    orchestrator.running = True
    thread = threading.Thread(
        target=orchestrator.main,
        args=(["--port", str(port), "--host", "127.0.0.1", "--dt", "300",
               "--duration", "10000000", "--rtf", "0", "--seed", "13",
               "--enable-phase", "--ambient-temperature", "-30",
               "--ambient-humidity", "0.8",
               "--heat-loss-coefficient", "2000"],),
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


def _wait(client, pred, timeout=180, what="condition"):
    deadline = time.time() + timeout
    while time.time() < deadline:
        if pred():
            return
        time.sleep(0.3)
    pytest.fail(f"timed out waiting for {what}")


def test_weather_registers_round_trip(phase_sim):
    client = phase_sim
    assert abs(client.read_float32(HR_AMBIENT_HUMIDITY,
                                   input_register=False) - 0.8) < 1e-6
    assert abs(client.read_float32(HR_AMBIENT_TEMPERATURE,
                                   input_register=False) - (-30.0)) < 1e-6
    client.write_float32(HR_WIND_SPEED, 4.0)
    assert abs(client.read_float32(HR_WIND_SPEED,
                                   input_register=False) - 4.0) < 1e-6


def test_arctic_forcing_freezes_then_thaw_command_melts(phase_sim):
    """Ice telemetry: the -30 C / U=2000 W/K forcing drives the tank into
    the mushy band (ice_fraction registers rise from 0); writing a warm
    ambient temperature over the wire melts it back."""
    client = phase_sim

    # freeze: ice fraction appears and the outlet temperature pins near 0
    _wait(client, lambda: client.read_float32(IR_ICE_MAX) > 0.3,
          timeout=240, what="ice formation")
    t_out = client.read_float32(IR_TEMP_OUTLET)
    assert t_out < 3.0            # measured near/below the freeze plateau
    ice_top = client.read_float32(IR_ICE_TOP)
    assert 0.0 <= ice_top <= 1.0

    # thaw: command +50 C ambient through the holding register
    client.write_float32(HR_AMBIENT_TEMPERATURE, 50.0)
    _wait(client,
          lambda: abs(client.read_float32(HR_AMBIENT_TEMPERATURE,
                                          input_register=False) - 50.0)
          < 1e-6, what="ambient command latched")
    peak = client.read_float32(IR_ICE_MAX)
    _wait(client,
          lambda: client.read_float32(IR_ICE_MAX) < max(peak - 0.2, 0.05),
          timeout=240, what="thaw")


def test_zero_trust_clamps_weather_garbage(phase_sim):
    """A hostile master writing an insane ambient temperature gets clamped
    by the orchestrator's validator before it reaches the physics: the
    register holds the raw write (wire parity), but the plant never sees
    more than +60 C — the ice keeps melting rather than flash-boiling."""
    client = phase_sim
    client.write_float32(HR_AMBIENT_TEMPERATURE, 1.0e6)
    time.sleep(2.0)
    # the simulation is still alive and temperatures stay physical
    t_out = client.read_float32(IR_TEMP_OUTLET)
    assert -60.0 <= t_out <= 110.0
    client.write_float32(HR_AMBIENT_TEMPERATURE, 20.0)
