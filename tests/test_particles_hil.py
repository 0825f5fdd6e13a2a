"""Closed-loop HIL for the particle-dynamics extension: orchestrator with
--enable-particles serving the extended register map; an external client
reads turbidity/TSS/sludge telemetry and drives the coagulant and blowdown
actuators over a real TCP socket."""

import socket
import threading
import time

import pytest

from ics_wt_physicsengine_tpu.modbus import ModbusTcpClient

IR_SIM_TIME = 100
IR_TURBIDITY = 32
IR_TSS = 34
IR_SLUDGE = 36
HR_COAGULANT = 18
HR_FILTER = 20
HR_BLOWDOWN = 22


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def particle_sim():
    import ics_wt_physicsengine_tpu.__main__ as orchestrator

    port = _free_port()
    orchestrator.running = True
    thread = threading.Thread(
        target=orchestrator.main,
        args=(["--port", str(port), "--host", "127.0.0.1", "--dt", "30",
               "--duration", "100000", "--rtf", "0", "--seed", "13",
               "--enable-particles", "--initial-tss", "25.0"],),
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


def test_particle_telemetry_is_live(particle_sim):
    client = particle_sim
    deadline = time.time() + 120
    ntu = 0.0
    while time.time() < deadline:
        ntu = client.read_float32(IR_TURBIDITY)
        if ntu > 1.0:
            break
        time.sleep(0.3)
    assert 5.0 < ntu < 100.0, f"turbidity implausible: {ntu}"
    tss = client.read_float32(IR_TSS)
    assert 1.0 < tss < 50.0, f"TSS implausible: {tss}"
    # sludge accumulates as the coarse class settles
    _wait_sim_time(client, 600.0)
    assert client.read_float32(IR_SLUDGE) > 0.0


def test_coagulant_command_clears_turbidity(particle_sim):
    """Write the coagulant dose: mass aggregates into fast-settling
    classes, outlet turbidity falls — the jar test over the wire."""
    client = particle_sim
    _wait_sim_time(client, 90.0)
    ntu_before = client.read_float32(IR_TURBIDITY)
    assert ntu_before > 5.0

    client.write_float32(HR_COAGULANT, 40.0)
    client.write_float32(HR_FILTER, 30.0)
    t_now = client.read_float32(IR_SIM_TIME)
    _wait_sim_time(client, t_now + 2400.0)

    ntu_after = client.read_float32(IR_TURBIDITY)
    assert ntu_after < 0.8 * ntu_before, \
        f"turbidity did not fall: {ntu_before} -> {ntu_after}"
    client.write_float32(HR_COAGULANT, 0.0)
    client.write_float32(HR_FILTER, 0.0)


def test_blowdown_command_wastes_sludge(particle_sim):
    client = particle_sim
    # let sludge accumulate, then waste it
    sludge_before = client.read_float32(IR_SLUDGE)
    if sludge_before <= 0.0:
        _wait_sim_time(client, client.read_float32(IR_SIM_TIME) + 600.0)
        sludge_before = client.read_float32(IR_SLUDGE)
    assert sludge_before > 0.0

    client.write_float32(HR_BLOWDOWN, 0.005)
    t_now = client.read_float32(IR_SIM_TIME)
    _wait_sim_time(client, t_now + 1800.0)
    sludge_after = client.read_float32(IR_SLUDGE)
    assert sludge_after < 0.6 * sludge_before, \
        f"sludge not wasted: {sludge_before} -> {sludge_after}"
    client.write_float32(HR_BLOWDOWN, 0.0)
