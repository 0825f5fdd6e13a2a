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


def test_backend_tpu_falls_back_to_cpu_when_probe_fails(monkeypatch):
    """--backend tpu on an unusable accelerator must fall back to CPU and
    serve, not hang (the wedged-tunnel failure mode: the first backend
    touch blocks forever inside PJRT init, so the check has to happen
    before it — via the deadline-bounded subprocess probe)."""
    import ics_wt_physicsengine_tpu.__main__ as orchestrator
    from ics_wt_physicsengine_tpu.utils import backend_select as bs

    calls = {}

    def fake_probe(deadline=45.0, retries=2, log=None, **kw):
        calls["probed"] = True
        return bs.ProbeResult(False, None, 0, "probe timed out (test)")

    real_pin = bs.pin_cpu

    def fake_pin(n, log=None):
        calls.setdefault("pinned", n)
        real_pin(n)          # actually restore cpu for the serving loop

    monkeypatch.setattr(bs, "backends_initialized", lambda: False)
    monkeypatch.setattr(bs, "probe_default_backend", fake_probe)
    monkeypatch.setattr(bs, "pin_cpu", fake_pin)

    orchestrator.running = True
    rc = orchestrator.main(["--no-modbus", "--duration", "3", "--rtf", "0",
                            "--backend", "tpu", "--seed", "4"])
    assert rc == 0
    assert calls.get("probed") and calls.get("pinned") == 1


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


def test_chunk_schedule_matches_per_tick_slew():
    """build_chunk_schedule's closed-form actuator trajectory is exactly the
    per-tick apply_actuator_dynamics recursion: step j of a chunk uses the
    same boundary the per-tick loop would have used, and the end boundary
    equals the per-tick loop's boundary after the chunk."""
    import ics_wt_physicsengine_tpu.__main__ as orch
    from ics_wt_physicsengine_tpu.core import BoundaryConditions

    applied = BoundaryConditions(acid_flow_rate=0.0, chlorine_flow_rate=0.5,
                                 inlet_flow_rate=5.0, acid_concentration=0.1)
    commanded = BoundaryConditions(acid_flow_rate=1.0,
                                   chlorine_flow_rate=0.1,
                                   inlet_flow_rate=8.0,
                                   acid_concentration=0.4)
    dt, tau, n = 2.0, 30.0, 16
    sched, end = orch.build_chunk_schedule(applied, commanded, n, dt, tau)

    b = applied
    for j in range(n):
        for f in orch._ACTUATOR_FIELDS:
            assert float(np.asarray(getattr(sched, f))[j]) == pytest.approx(
                getattr(b, f), rel=1e-5), (f, j)
        b = orch.apply_actuator_dynamics(b, commanded, dt, tau)
    for f in orch._ACTUATOR_FIELDS:
        assert getattr(end, f) == pytest.approx(getattr(b, f), rel=1e-6)
    # non-actuator command fields are zero-order-held at the command
    # (scalar leaves; plant_rollout_serve broadcasts them to [n_steps])
    assert float(np.asarray(sched.acid_concentration)) == pytest.approx(0.4)

    # tau=0: instant actuation — every step uses the command
    sched0, end0 = orch.build_chunk_schedule(applied, commanded, 4, 1.0, 0.0)
    for f in orch._ACTUATOR_FIELDS:
        assert np.allclose(np.asarray(getattr(sched0, f)),
                           getattr(commanded, f))
        assert getattr(end0, f) == pytest.approx(getattr(commanded, f))


def test_serve_chunk_headless_and_history(tmp_path):
    """--serve-chunk N: the headless fast-time loop advances N steps per
    host iteration and writes a correctly decimated, correctly timestamped
    history."""
    import csv as csv_module

    import ics_wt_physicsengine_tpu.__main__ as orchestrator

    path = tmp_path / "chunk.csv"
    orchestrator.running = True
    rc = orchestrator.main(["--no-modbus", "--duration", "64", "--rtf", "0",
                            "--fused-sensors", "--serve-chunk", "16",
                            "--seed", "4", "--dt", "1.0",
                            "--log-csv", str(path), "--log-decimate", "4"])
    assert rc == 0
    with open(path) as f:
        rows = list(csv_module.DictReader(f))
    assert len(rows) == 16                       # 64 steps / decimate 4
    assert float(rows[0]["sim_time"]) == pytest.approx(4.0)
    assert float(rows[-1]["sim_time"]) == pytest.approx(64.0)
    assert 5.0 < float(rows[-1]["pH_outlet"]) < 9.0


def test_serve_chunk_requires_fused_sensors():
    import ics_wt_physicsengine_tpu.__main__ as orchestrator

    with pytest.raises(SystemExit):
        orchestrator.main(["--no-modbus", "--serve-chunk", "8",
                           "--duration", "1"])


@pytest.fixture(scope="module")
def serving_sim():
    """Fast-time serving loop (--serve-chunk) with a live Modbus server."""
    import ics_wt_physicsengine_tpu.__main__ as orchestrator

    port = _free_port()
    orchestrator.running = True
    thread = threading.Thread(
        target=orchestrator.main,
        args=(["--port", str(port), "--host", "127.0.0.1", "--dt", "1.0",
               "--duration", "10000000", "--rtf", "0", "--seed", "7",
               "--fused-sensors", "--serve-chunk", "32"],),
        daemon=True)
    thread.start()

    deadline = time.time() + 120
    client = None
    while time.time() < deadline:
        try:
            client = ModbusTcpClient("127.0.0.1", port, timeout=5).connect()
            break
        except OSError:
            time.sleep(0.3)
    if client is None:
        orchestrator.running = False
        pytest.fail("Serving orchestrator Modbus server did not start")

    yield client

    client.close()
    orchestrator.running = False
    thread.join(timeout=30)


def test_serve_chunk_fast_time_with_live_client(serving_sim):
    """The served plane runs far faster than real time while a live Modbus
    client polls it — the reference's serving ceiling is ~31 steps/s
    (reference __main__.py:453-457, one step per tick)."""
    client = serving_sim
    _wait_sim_time(client, 32.0, timeout=180)   # first chunk done (compiled)
    t1 = client.read_float32(100)
    w1 = time.monotonic()
    time.sleep(3.0)
    t2 = client.read_float32(100)
    ratio = (t2 - t1) / (time.monotonic() - w1)
    assert ratio > 100.0, f"served plane only {ratio:.0f}x real time"


def test_serve_chunk_closed_loop_command(serving_sim):
    """Commands written by the client are picked up at the next register
    exchange (zero-order hold) and drive the chunked physics."""
    client = serving_sim
    # measured inlet pH before dosing (sensor is pre-warmed on this path)
    deadline = time.time() + 60
    ph_before = 0.0
    while time.time() < deadline:
        ph_before = client.read_float32(0)
        if ph_before > 5.0:
            break
        time.sleep(0.3)
    assert ph_before > 5.0, f"pH sensor not live: {ph_before}"

    t0 = client.read_float32(100)
    client.write_float32(0, 1.5)        # acid_flow_rate command
    _wait_sim_time(client, t0 + 2000.0, timeout=120)
    ph_after = client.read_float32(0)
    assert ph_after < ph_before - 0.4, \
        f"chunked dosing had no effect: {ph_before} -> {ph_after}"
    client.write_float32(0, 0.0)
