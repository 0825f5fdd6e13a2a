"""Closed-loop HIL for the biofilm/regrowth extension: orchestrator with
--enable-biofilm serving the extended register map; an external client
reads HPC / BDOC / wall-film telemetry and drives the source-water HPC
and BDOC over a real TCP socket."""

import socket
import threading
import time

import pytest

from ics_wt_physicsengine_tpu.modbus import ModbusTcpClient

IR_SIM_TIME = 100
IR_HPC = 52
IR_BDOC = 54
IR_FILM = 56
HR_BDOC = 28
HR_HPC = 30

SOURCE_HPC = 5000.0     # CFU/mL
SOURCE_BDOC = 1.0       # mg/L


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def biofilm_sim():
    import ics_wt_physicsengine_tpu.__main__ as orchestrator

    port = _free_port()
    orchestrator.running = True
    thread = threading.Thread(
        target=orchestrator.main,
        args=(["--port", str(port), "--host", "127.0.0.1", "--dt", "30",
               "--duration", "100000", "--rtf", "0", "--seed", "13",
               "--enable-biofilm", "--initial-hpc", str(SOURCE_HPC),
               "--initial-bdoc", str(SOURCE_BDOC)],),
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


def test_biofilm_telemetry_is_live(biofilm_sim):
    """HPC / BDOC / peak-film registers publish plausible values: the
    default 2 mg/L residual suppresses the planktonic count well below
    the source water's, BDOC survives (its consumers are suppressed),
    and the seeded wall film stays finite."""
    client = biofilm_sim
    _wait_sim_time(client, 900.0)

    hpc = client.read_float32(IR_HPC)
    assert 0.0 <= hpc < SOURCE_HPC, \
        f"residual should suppress outlet HPC below source: {hpc}"

    bdoc = client.read_float32(IR_BDOC)
    assert 0.0 < bdoc <= 1.5 * SOURCE_BDOC, f"BDOC implausible: {bdoc}"

    film = client.read_float32(IR_FILM)
    assert film >= 0.0 and film == film, f"film register bad: {film}"

    # chlorine kill keeps working: the count stays suppressed later too
    _wait_sim_time(client, 3000.0, timeout=240)
    assert client.read_float32(IR_HPC) < SOURCE_HPC


def test_source_water_event_propagates(biofilm_sim):
    """Write a 100x source HPC spike + doubled BDOC: the outlet count
    must climb from its suppressed baseline — the regrowth event a
    distribution operator actually chases."""
    client = biofilm_sim
    _wait_sim_time(client, 300.0)
    before = client.read_float32(IR_HPC)

    client.write_float32(HR_HPC, 100.0 * SOURCE_HPC)
    client.write_float32(HR_BDOC, 2.0 * SOURCE_BDOC)
    t_now = client.read_float32(IR_SIM_TIME)
    _wait_sim_time(client, t_now + 6000.0, timeout=240)

    after = client.read_float32(IR_HPC)
    assert after > max(10.0 * before, 1e-3), \
        f"source HPC spike never reached the outlet: {before} -> {after}"
    client.write_float32(HR_HPC, SOURCE_HPC)
    client.write_float32(HR_BDOC, SOURCE_BDOC)


def test_biofilm_command_round_trips():
    """The inlet_bdoc/inlet_hpc holding registers flow into
    BoundaryConditions with the zero-trust clamps, and the operator-facing
    CFU/mL converts to the dynamics' mg C/L."""
    import ics_wt_physicsengine_tpu.__main__ as M
    from ics_wt_physicsengine_tpu.core import BoundaryConditions
    from ics_wt_physicsengine_tpu.core.biofilm import CELLS_PER_MG_C

    b = BoundaryConditions()
    cmds = (0.5, 0.2, 5.0, 0.1, 50.0, True, True, True, None, None, None,
            None, (0.8, 2.0e4))
    b2 = M.apply_boundary_conditions(b, cmds)
    assert b2.inlet_bdoc == 0.8
    assert abs(b2.inlet_bacteria - 2.0e4 * 1000.0 / CELLS_PER_MG_C) < 1e-12

    # absent registers (base map): the biofilm fields keep their defaults
    cmds_base = (0.5, 0.2, 5.0, 0.1, 50.0, True, True, True, None, None,
                 None, None, None)
    b3 = M.apply_boundary_conditions(b, cmds_base)
    assert b3.inlet_bdoc == b.inlet_bdoc
    assert b3.inlet_bacteria == b.inlet_bacteria
