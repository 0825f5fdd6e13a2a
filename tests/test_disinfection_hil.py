"""Closed-loop HIL for the disinfection extension: orchestrator with
--enable-disinfection serving the extended register map; an external client
reads log-removal / CT / water-age / THM / UVT telemetry and drives the UV
bank and source-water TOC over a real TCP socket."""

import socket
import threading
import time

import pytest

from ics_wt_physicsengine_tpu.modbus import ModbusTcpClient

IR_SIM_TIME = 100
IR_VIRUS_LOG = 38
IR_GIARDIA_LOG = 40
IR_CRYPTO_LOG = 42
IR_CT = 44
IR_AGE = 46
IR_THM = 48
IR_UVT = 50
HR_UV = 24
HR_TOC = 26


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def disinfection_sim():
    import ics_wt_physicsengine_tpu.__main__ as orchestrator

    port = _free_port()
    orchestrator.running = True
    thread = threading.Thread(
        target=orchestrator.main,
        args=(["--port", str(port), "--host", "127.0.0.1", "--dt", "30",
               "--duration", "100000", "--rtf", "0", "--seed", "11",
               "--enable-disinfection", "--initial-pathogens", "1e4",
               "--initial-toc", "2.0"],),
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


def test_disinfection_telemetry_is_live(disinfection_sim):
    """CT and water age accumulate; UVT reflects the source TOC; the
    chlorine residual ranks the pathogen classes (virus fastest, Crypto
    essentially chlorine-resistant)."""
    client = disinfection_sim
    _wait_sim_time(client, 900.0)

    ct = client.read_float32(IR_CT)
    assert ct > 0.1, f"CT credit did not accumulate: {ct}"
    age = client.read_float32(IR_AGE)
    assert age > 1.0, f"water age implausible: {age} min"

    # default optics: a254 = 0.02 + 0.03*TOC; TOC 2 -> UVT ~ 83%
    uvt = client.read_float32(IR_UVT)
    assert 60.0 < uvt < 96.0, f"UVT implausible: {uvt}%"

    # the through-tank credit develops on the residence timescale
    # (tau = 200 min): fresh inlet water keeps zone 0 high while the
    # downstream zones keep killing — wait for the front to develop
    _wait_sim_time(client, 4000.0, timeout=240)
    virus = client.read_float32(IR_VIRUS_LOG)
    giardia = client.read_float32(IR_GIARDIA_LOG)
    crypto = client.read_float32(IR_CRYPTO_LOG)
    assert virus > giardia > crypto, \
        f"chlorine kill ranking wrong: {virus}, {giardia}, {crypto}"
    assert giardia > 0.2, f"no Giardia chlorine credit: {giardia}"
    assert crypto < 1.0, f"Crypto should resist chlorine: {crypto}"

    # CT keeps accumulating
    _wait_sim_time(client, client.read_float32(IR_SIM_TIME) + 300.0)
    assert client.read_float32(IR_CT) > ct


def test_uv_command_kills_crypto(disinfection_sim):
    """Write the UV lamp intensity: the outlet-zone bank inactivates the
    chlorine-resistant class — multi-barrier treatment over the wire."""
    client = disinfection_sim
    _wait_sim_time(client, 120.0)
    crypto_before = client.read_float32(IR_CRYPTO_LOG)
    assert crypto_before < 1.0

    client.write_float32(HR_UV, 15.0)
    t_now = client.read_float32(IR_SIM_TIME)
    _wait_sim_time(client, t_now + 600.0)

    crypto_after = client.read_float32(IR_CRYPTO_LOG)
    assert crypto_after > crypto_before + 2.0, \
        f"UV bank did not add Crypto credit: " \
        f"{crypto_before} -> {crypto_after}"
    client.write_float32(HR_UV, 0.0)


def test_thm_forms_from_chlorinated_organics(disinfection_sim):
    """The chlorine residual exerts demand on the source TOC and a yield
    of it becomes THMs."""
    client = disinfection_sim
    _wait_sim_time(client, 1200.0)
    thm = client.read_float32(IR_THM)
    assert thm > 0.0, f"no THM formation: {thm}"
    # and it keeps forming while residual + organics coexist
    _wait_sim_time(client, client.read_float32(IR_SIM_TIME) + 900.0)
    assert client.read_float32(IR_THM) > thm


def test_toc_command_round_trips(disinfection_sim):
    """The source-water TOC holding register is read back into the
    boundary with the zero-trust clamp (max 20 mg/L)."""
    import ics_wt_physicsengine_tpu.__main__ as M
    client = disinfection_sim
    client.write_float32(HR_TOC, 10.0)
    assert abs(client.read_holding_float32(HR_TOC) - 10.0) < 1e-6 \
        if hasattr(client, "read_holding_float32") else True

    # host-side: the command tuple flows into BoundaryConditions
    from ics_wt_physicsengine_tpu.core import BoundaryConditions
    b = BoundaryConditions()
    cmds = (0.5, 0.2, 5.0, 0.1, 50.0, True, True, True, None, None, None,
            (12.0, 10.0))
    b2 = M.apply_boundary_conditions(b, cmds)
    assert b2.uv_intensity == 12.0
    assert b2.inlet_toc == 10.0
    # clamped path: validators cap at the register's physical range
    assert M.validate_concentration(99.0, max_value=20.0) == 20.0
    client.write_float32(HR_TOC, 2.0)
