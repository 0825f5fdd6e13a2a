"""Closed-loop HIL integration: the full orchestrator (physics + sensors +
Modbus server) driven by an external controller over a real TCP socket —
BASELINE config 5."""

import socket
import threading
import time

import numpy as np
import pytest

from ics_wt_physicsengine_tpu.modbus import ModbusTcpClient


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def running_sim():
    """Run the orchestrator main loop in a thread, free-running (rtf=0)."""
    import ics_wt_physicsengine_tpu.__main__ as orchestrator

    port = _free_port()
    orchestrator.running = True
    thread = threading.Thread(
        target=orchestrator.main,
        args=(["--port", str(port), "--host", "127.0.0.1", "--dt", "30",
               "--duration", "100000", "--rtf", "0", "--seed", "7"],),
        daemon=True)
    thread.start()

    # wait for the Modbus server to come up
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
        t = client.read_float32(100)     # simulation_time input register
        if t >= target:
            return t
        time.sleep(0.2)
    pytest.fail(f"simulation did not reach t={target}")


def test_simulation_advances(running_sim):
    client = running_sim
    t1 = _wait_sim_time(client, 60.0)
    t2 = _wait_sim_time(client, t1 + 60.0)
    assert t2 > t1


def test_ph_middle_register_is_wired(running_sim):
    """Gap-fix check: the reference never updates pH_middle
    (SURVEY.md 2.2); we do."""
    client = running_sim
    _wait_sim_time(client, 90.0)
    ph_mid = client.read_float32(2)
    assert 6.0 < ph_mid < 9.0


def test_closed_loop_acid_dosing(running_sim):
    """External 'controller' writes an acid command; the measured inlet-zone
    pH (pH_inlet register, fed by the pH sensor) must fall in response.

    Acid enters zone 0 only; the middle zone barely moves on this timescale
    (H-space mixing through the buffering chain is slow — verified identical
    to the reference's trajectory)."""
    client = running_sim
    # wait until the pH sensor is out of warm-up (register becomes nonzero)
    deadline = time.time() + 120
    while time.time() < deadline:
        if abs(client.read_float32(0)) > 1.0:
            break
        time.sleep(0.3)
    ph_before = client.read_float32(0)
    assert ph_before > 5.0, f"sensor not warmed up: {ph_before}"

    client.write_float32(0, 0.5)        # acid_flow_rate = 0.5 L/min
    t_now = client.read_float32(100)
    _wait_sim_time(client, t_now + 1200.0)

    ph_after = client.read_float32(0)
    assert ph_after < ph_before - 0.5, \
        f"pH did not fall: {ph_before} -> {ph_after}"
    client.write_float32(0, 0.0)        # stop dosing


def test_zero_trust_clamp(running_sim):
    """A hostile 50 L/min acid command is clamped to 2.0 by the
    orchestrator's validators (reference __main__.py:244-246)."""
    import ics_wt_physicsengine_tpu.__main__ as orch

    # the validators themselves (pure functions)
    assert orch.validate_flow_rate(50.0, max_value=2.0) == 2.0
    assert orch.validate_flow_rate(float("nan"), max_value=2.0) == 0.0
    assert orch.validate_flow_rate(-3.0, max_value=2.0) == 0.0
    assert orch.validate_flow_rate("attack", max_value=2.0) == 0.0
    cmds = (50.0, 0.0, 5.0, 0.1, 50.0, True, True, True)
    from ics_wt_physicsengine_tpu.core import BoundaryConditions
    bc = orch.apply_boundary_conditions(BoundaryConditions(), cmds)
    assert bc.acid_flow_rate == 2.0

    # end to end: the register holds the raw write, the plant stays physical
    client = running_sim
    client.write_float32(0, 50.0)
    time.sleep(2.0)
    assert client.read_float32(0, input_register=False) == \
        pytest.approx(50.0)
    t_now = client.read_float32(100)
    _wait_sim_time(client, t_now + 300.0)
    ph_mid = client.read_float32(2)
    assert np.isfinite(ph_mid) and 0.0 <= ph_mid <= 14.0
    client.write_float32(0, 0.0)


def test_pump_enable_coil_gates_dosing(running_sim):
    """Gap-fix check: pump-enable coils gate dosing flows."""
    client = running_sim
    client.write_float32(0, 1.0)        # command acid flow
    client.write_coil(0, False)         # but disable the pump
    t_now = client.read_float32(100)
    _wait_sim_time(client, t_now + 120.0)
    ph_a = client.read_float32(2)
    t_now = client.read_float32(100)
    _wait_sim_time(client, t_now + 600.0)
    ph_b = client.read_float32(2)
    # without dosing the pH drift over 10 min is tiny
    assert abs(ph_b - ph_a) < 0.05
    client.write_coil(0, True)
    client.write_float32(0, 0.0)


def test_pause_resume_via_coil(running_sim):
    client = running_sim
    client.write_coil(2, False)         # simulation_running = False
    time.sleep(1.5)
    t1 = client.read_float32(100)
    time.sleep(2.0)
    t2 = client.read_float32(100)
    assert t2 == pytest.approx(t1)      # paused: time frozen
    client.write_coil(2, True)
    _wait_sim_time(client, t2 + 60.0)   # resumes


def test_fused_sensor_loop_headless():
    """--fused-sensors: physics + instruments in one jitted step per tick."""
    import ics_wt_physicsengine_tpu.__main__ as orchestrator

    orchestrator.running = True
    rc = orchestrator.main(["--no-modbus", "--duration", "30", "--rtf", "0",
                            "--fused-sensors", "--seed", "4", "--dt", "1.0"])
    assert rc == 0


def test_csv_history_logging(tmp_path):
    """--log-csv writes a well-formed per-step history file (the reference
    lists historical logging as unimplemented future work, README.md:441)."""
    import csv as csv_module

    import ics_wt_physicsengine_tpu.__main__ as orchestrator

    path = tmp_path / "history.csv"
    orchestrator.running = True
    rc = orchestrator.main(["--no-modbus", "--duration", "15", "--rtf", "0",
                            "--fused-sensors", "--seed", "4",
                            "--log-csv", str(path)])
    assert rc == 0
    with open(path) as f:
        rows = list(csv_module.DictReader(f))
    assert len(rows) == 15
    assert float(rows[-1]["sim_time"]) == 14.0
    assert 5.0 < float(rows[-1]["pH_inlet"]) < 9.0
    assert rows[0]["any_fault"] in ("0", "1")


def test_checkpoint_resume_via_cli(tmp_path):
    """--checkpoint-file: stop/resume continuity through the serving loop."""
    import ics_wt_physicsengine_tpu.__main__ as orchestrator

    ckpt = str(tmp_path / "sim.npz")
    orchestrator.running = True
    rc = orchestrator.main(["--no-modbus", "--duration", "50", "--rtf", "0",
                            "--seed", "5", "--dt", "10",
                            "--checkpoint-file", ckpt])
    assert rc == 0

    orchestrator.running = True
    rc = orchestrator.main(["--no-modbus", "--duration", "100", "--rtf", "0",
                            "--seed", "5", "--dt", "10",
                            "--checkpoint-file", ckpt])
    assert rc == 0
    from ics_wt_physicsengine_tpu.utils import load_metadata
    assert load_metadata(ckpt)["sim_time"] == pytest.approx(100.0)


def test_sensors_demo_main(capsys):
    """The sensors module demo runs end-to-end (per-module runnable demos,
    reference-style)."""
    from ics_wt_physicsengine_tpu.sensors.__main__ import main
    main()
    out = capsys.readouterr().out
    assert "SENSOR SUITE DEMO" in out
    assert "Demo complete." in out


def test_modbus_demo_main(capsys):
    from ics_wt_physicsengine_tpu.modbus.__main__ import main
    main()
    out = capsys.readouterr().out
    assert "FC 43 device identification" in out
    assert "Demo complete." in out


def test_actuator_dynamics_first_order_lag():
    """apply_actuator_dynamics: flows approach the command exponentially
    with the configured tau; tau=0 is the reference's instant actuation;
    non-actuator fields always jump."""
    import math

    import ics_wt_physicsengine_tpu.__main__ as orch
    from ics_wt_physicsengine_tpu.core import BoundaryConditions

    applied = BoundaryConditions(acid_flow_rate=0.0, inlet_flow_rate=5.0,
                                 acid_concentration=0.1)
    commanded = BoundaryConditions(acid_flow_rate=1.0, inlet_flow_rate=10.0,
                                   acid_concentration=0.5)

    # tau=0: instant (reference parity)
    out = orch.apply_actuator_dynamics(applied, commanded, dt=1.0, tau=0.0)
    assert out.acid_flow_rate == 1.0

    # one step of first-order lag: alpha = 1 - exp(-dt/tau)
    out = orch.apply_actuator_dynamics(applied, commanded, dt=1.0, tau=10.0)
    alpha = 1.0 - math.exp(-1.0 / 10.0)
    assert out.acid_flow_rate == pytest.approx(alpha * 1.0)
    assert out.inlet_flow_rate == pytest.approx(5.0 + alpha * 5.0)
    # concentrations are tank properties, not actuator positions: jump
    assert out.acid_concentration == 0.5

    # iterating converges to the command
    b = applied
    for _ in range(200):
        b = orch.apply_actuator_dynamics(b, commanded, dt=1.0, tau=10.0)
    assert b.acid_flow_rate == pytest.approx(1.0, abs=1e-6)
