"""Fleet serving: one Modbus/TCP endpoint, N plants behind unit ids.

Covers the multi-unit slave (per-unit register spaces, broadcast routing,
unknown-unit silence) and the closed-loop fleet orchestrator: an external
master doses acid into ONE unit of a 3-plant fleet over a real socket and
must see that unit's measured pH fall while its neighbours hold steady.
No reference counterpart (SURVEY.md section 2: the reference serves one
plant on one unit id and its physics cannot batch)."""

import socket
import threading
import time

import numpy as np
import pytest

from ics_wt_physicsengine_tpu.modbus import (
    ModbusRegisterMap,
    ModbusServerConfig,
    ModbusSlave,
    ModbusTcpClient,
)


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


# ---------------------------------------------------------------------------
# Multi-unit slave
# ---------------------------------------------------------------------------

def test_multi_unit_register_spaces_are_independent():
    slave = ModbusSlave(ModbusRegisterMap(),
                        ModbusServerConfig(host="127.0.0.1", port=0),
                        units=[1, 2, 5])
    slave.start(blocking=False)
    try:
        for u, ph in ((1, 7.1), (2, 6.5), (5, 8.2)):
            slave.update_input_register("pH_inlet", ph, unit=u)
        for u, ph in ((1, 7.1), (2, 6.5), (5, 8.2)):
            with ModbusTcpClient("127.0.0.1", slave.port, unit_id=u) as c:
                assert c.read_float32(0) == pytest.approx(ph, abs=1e-5)
        # holding-register writes land in the addressed unit only
        with ModbusTcpClient("127.0.0.1", slave.port, unit_id=2) as c:
            c.write_float32(0, 1.25)     # acid_flow_rate
        assert slave.read_holding_register("acid_flow_rate",
                                           unit=2) == pytest.approx(1.25)
        assert slave.read_holding_register("acid_flow_rate", unit=1) == 0.0
        assert slave.read_holding_register("acid_flow_rate", unit=5) == 0.0
    finally:
        slave.stop()


def test_unknown_unit_is_silent_and_broadcast_hits_primary():
    slave = ModbusSlave(ModbusRegisterMap(),
                        ModbusServerConfig(host="127.0.0.1", port=0,
                                           unit_id=2),
                        units=[1, 2])
    slave.start(blocking=False)
    try:
        slave.update_input_register("pH_inlet", 6.8, unit=2)
        # 0xFF broadcast resolves to the primary unit (config.unit_id=2)
        with ModbusTcpClient("127.0.0.1", slave.port, unit_id=0xFF) as c:
            assert c.read_float32(0) == pytest.approx(6.8, abs=1e-5)
        # an unserved unit id gets no response at all (gateway semantics)
        with ModbusTcpClient("127.0.0.1", slave.port, unit_id=9,
                             timeout=1.0) as c:
            with pytest.raises((socket.timeout, TimeoutError, OSError)):
                c.read_float32(0)
    finally:
        slave.stop()


def test_native_multi_unit_register_spaces():
    """The C++ data plane serves the same multi-unit semantics: per-unit
    banks, broadcast to primary, unserved ids silent."""
    from ics_wt_physicsengine_tpu.modbus import native_slave

    if not native_slave.is_available():
        pytest.skip("native library unavailable")
    slave = native_slave.NativeModbusSlave(
        ModbusRegisterMap(), ModbusServerConfig(host="127.0.0.1", port=0),
        units=[1, 2, 5])
    slave.start(blocking=False)
    try:
        for u, ph in ((1, 7.1), (2, 6.5), (5, 8.2)):
            slave.update_input_register("pH_inlet", ph, unit=u)
        for u, ph in ((1, 7.1), (2, 6.5), (5, 8.2)):
            with ModbusTcpClient("127.0.0.1", slave.port, unit_id=u) as c:
                assert c.read_float32(0) == pytest.approx(ph, abs=1e-5)
        with ModbusTcpClient("127.0.0.1", slave.port, unit_id=2) as c:
            c.write_float32(0, 1.25)
        assert slave.read_holding_register("acid_flow_rate",
                                           unit=2) == pytest.approx(1.25)
        assert slave.read_holding_register("acid_flow_rate", unit=1) == 0.0
        # broadcast resolves to the primary unit's bank
        slave.update_input_register("pH_outlet", 7.77, unit=1)
        with ModbusTcpClient("127.0.0.1", slave.port, unit_id=0xFF) as c:
            assert c.read_float32(4) == pytest.approx(7.77, abs=1e-5)
        # unserved unit id: silence (gateway semantics)
        with ModbusTcpClient("127.0.0.1", slave.port, unit_id=9,
                             timeout=1.0) as c:
            with pytest.raises((socket.timeout, TimeoutError, OSError)):
                c.read_float32(0)
        with pytest.raises(KeyError):
            slave.read_holding_register("acid_flow_rate", unit=7)
    finally:
        slave.stop()


def test_unit_api_validation():
    slave = ModbusSlave(ModbusRegisterMap(), units=[1, 2])
    with pytest.raises(KeyError):
        slave.read_holding_register("acid_flow_rate", unit=7)
    with pytest.raises(ValueError):
        ModbusSlave(ModbusRegisterMap(), units=[1, 1])
    with pytest.raises(ValueError):
        ModbusSlave(ModbusRegisterMap(), units=[300])
    # single-unit default keeps the reference-compatible behavior
    assert ModbusSlave(ModbusRegisterMap()).units == (1,)


def test_maintenance_t0_resets_calibration_age():
    """make_plant_batch(t0=T) anchors calibration age and warm-up at T —
    the maintenance rebuild contract (regression: t0 was pinned to 0, so
    'recalibrated' carries read calibration-expired immediately whenever
    sim time exceeded the 24 h validity)."""
    import dataclasses

    import jax.numpy as jnp

    from ics_wt_physicsengine_tpu.core import reactor as R
    from ics_wt_physicsengine_tpu.models.plant import (
        make_plant_batch, plant_step_batched)
    from ics_wt_physicsengine_tpu.sensors.types import (
        STATUS_FROM_CODE, SensorStatus)

    T = 200_000.0      # ~55 h of sim time, past the 24 h validity
    bc = R.BoundaryConditions(inlet_flow_rate=5.0, inlet_pH=7.2,
                              inlet_chlorine=0.5)

    def read_status_at(t0):
        params, plant = make_plant_batch(R.ReactorConfiguration(n_zones=4),
                                         2, seed=1, dtype=jnp.float64,
                                         t0=t0)
        # maintenance keeps the aged reactor: clock sits at T
        plant = dataclasses.replace(
            plant, reactor=dataclasses.replace(
                plant.reactor, time=jnp.full_like(plant.reactor.time, T)))
        _, readings = plant_step_batched(params, plant, bc, 1.0, 4)
        return STATUS_FROM_CODE[int(np.asarray(
            readings["pH_inlet"].status)[0])]

    assert float(make_plant_batch(
        R.ReactorConfiguration(n_zones=4), 2, seed=1, dtype=jnp.float64,
        t0=T)[1].ph_inlet.base.last_calibration_time[0]) == T
    assert read_status_at(T) == SensorStatus.NORMAL
    assert read_status_at(0.0) == SensorStatus.CALIBRATION_EXPIRED


def test_fleet_checkpoint_resume_bitexact(tmp_path):
    """Fleet checkpoint/resume: 10 steps + resume to 20 must equal a
    straight 20-step run bit for bit (physics + every sensor carry incl.
    PRNG keys ride the checkpoint)."""
    import ics_wt_physicsengine_tpu.__main__ as orchestrator

    def run(ckpt, duration):
        orchestrator.running = True
        orchestrator.main(["--no-modbus", "--fleet", "3", "--zones", "4",
                           "--dt", "1", "--duration", str(duration),
                           "--rtf", "0", "--seed", "5",
                           "--checkpoint-file", str(ckpt)])

    two_phase = tmp_path / "two_phase.npz"
    straight = tmp_path / "straight.npz"
    run(two_phase, 10)
    run(two_phase, 20)      # resumes from t=10
    run(straight, 20)

    a, b = np.load(two_phase), np.load(straight)
    keys = [k for k in a.files if k.startswith("leaf_")]
    assert keys and set(keys) == {k for k in b.files
                                  if k.startswith("leaf_")}
    for k in keys:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)


# ---------------------------------------------------------------------------
# Closed-loop fleet orchestrator
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def running_fleet():
    """Run the fleet orchestrator (3 plants) in a thread, free-running."""
    import ics_wt_physicsengine_tpu.__main__ as orchestrator

    port = _free_port()
    orchestrator.running = True
    thread = threading.Thread(
        target=orchestrator.main,
        args=(["--port", str(port), "--host", "127.0.0.1", "--dt", "30",
               "--duration", "1000000", "--rtf", "0", "--seed", "11",
               "--fleet", "3", "--zones", "4"],),
        daemon=True)
    thread.start()

    deadline = time.time() + 60
    client = None
    while time.time() < deadline:
        try:
            client = ModbusTcpClient("127.0.0.1", port, unit_id=1,
                                     timeout=5).connect()
            break
        except OSError:
            time.sleep(0.3)
    if client is None:
        orchestrator.running = False
        pytest.fail("Fleet Modbus server did not start")

    yield port, client

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
    pytest.fail(f"fleet did not reach t={target}")


def test_fleet_units_report_independent_plants(running_fleet):
    port, c1 = running_fleet
    _wait_sim_time(c1, 60.0)
    values = {}
    for u in (1, 2, 3):
        with ModbusTcpClient("127.0.0.1", port, unit_id=u) as c:
            values[u] = c.read_float32(6)     # chlorine_inlet register
    # parameter-randomized lanes + independent sensor noise: the three
    # plants' measured values are real numbers and not all identical
    assert all(np.isfinite(v) for v in values.values()), values
    assert len({round(v, 6) for v in values.values()}) > 1, values


def test_fleet_closed_loop_single_unit_dosing(running_fleet):
    """Acid into unit 2 only: unit 2's measured inlet pH falls; unit 1's
    holds (the fleet lanes are physically independent)."""
    port, c1 = running_fleet

    with ModbusTcpClient("127.0.0.1", port, unit_id=2) as c2:
        ph1_before = c1.read_float32(0)
        ph2_before = c2.read_float32(0)
        assert ph1_before > 5.0 and ph2_before > 5.0

        c2.write_float32(0, 0.5)         # acid_flow_rate, unit 2 only
        t_now = c1.read_float32(100)
        _wait_sim_time(c1, t_now + 1200.0)

        ph2_after = c2.read_float32(0)
        ph1_after = c1.read_float32(0)
        c2.write_float32(0, 0.0)

    assert ph2_after < ph2_before - 0.5, \
        f"unit 2 pH did not fall: {ph2_before} -> {ph2_after}"
    assert abs(ph1_after - ph1_before) < 0.3, \
        f"unit 1 pH moved without dosing: {ph1_before} -> {ph1_after}"


def test_per_unit_pause_coil_freezes_one_lane(running_fleet):
    """Clearing unit 3's simulation_running coil freezes ONLY lane 3: its
    simulation_time register stops while unit 1 keeps advancing; setting
    the coil again resumes it (per-unit generalization of the reference's
    pause semantics)."""
    port, c1 = running_fleet
    with ModbusTcpClient("127.0.0.1", port, unit_id=3) as c3:
        try:
            c3.write_coil(2, False)          # simulation_running, unit 3
            time.sleep(1.0)                  # let in-flight ticks drain
            t3_frozen = c3.read_float32(100)
            t1_a = c1.read_float32(100)
            _wait_sim_time(c1, t1_a + 120.0)
            assert c3.read_float32(100) == pytest.approx(t3_frozen), \
                "paused unit advanced"
        finally:
            c3.write_coil(2, True)
        t3_resumed = c3.read_float32(100)
        _wait_sim_time(c1, c1.read_float32(100) + 120.0)
        assert c3.read_float32(100) > t3_resumed, "unit did not resume"


def test_fleet_serve_chunk_serves_and_freezes():
    """--serve-chunk on the fleet plane: every lane advances chunk steps
    per register exchange in ONE device call (registers only ever show
    chunk-boundary times), per-unit pause still freezes exactly one lane,
    and a dosing command written to one unit takes effect at the next
    chunk boundary while the other lanes hold."""
    import ics_wt_physicsengine_tpu.__main__ as orchestrator

    chunk = 40
    port = _free_port()
    orchestrator.running = True
    thread = threading.Thread(
        target=orchestrator.main,
        args=(["--port", str(port), "--host", "127.0.0.1", "--dt", "1",
               "--duration", "100000000", "--rtf", "0", "--seed", "5",
               "--fleet", "3", "--zones", "4",
               "--serve-chunk", str(chunk)],),
        daemon=True)
    thread.start()

    deadline = time.time() + 60
    c1 = None
    while time.time() < deadline:
        try:
            c1 = ModbusTcpClient("127.0.0.1", port, unit_id=1,
                                 timeout=5).connect()
            break
        except OSError:
            time.sleep(0.3)
    if c1 is None:
        orchestrator.running = False
        pytest.fail("fleet Modbus server did not start")

    try:
        with ModbusTcpClient("127.0.0.1", port, unit_id=2) as c2:
            # first chunk includes the scan jit compile — generous wait
            deadline = time.time() + 240
            while time.time() < deadline and c1.read_float32(100) < chunk:
                time.sleep(0.5)
            t1 = c1.read_float32(100)
            assert t1 >= chunk, "no chunk landed"
            # registers only ever expose chunk-boundary instants
            assert t1 % float(chunk) == 0.0, t1

            # per-unit pause at chunk granularity
            c2.write_coil(2, False)
            time.sleep(1.0)
            t2_frozen = c2.read_float32(100)
            ta = c1.read_float32(100)
            _wait_sim_time(c1, ta + 10 * chunk)
            assert c2.read_float32(100) == pytest.approx(t2_frozen), \
                "paused unit advanced in chunk mode"
            c2.write_coil(2, True)
            _wait_sim_time(c1, c1.read_float32(100) + 10 * chunk)
            assert c2.read_float32(100) > t2_frozen, "unit did not resume"

            # zero-order-held command: acid into unit 2 only
            ph1_before = c1.read_float32(0)
            ph2_before = c2.read_float32(0)
            c2.write_float32(0, 0.5)          # acid_flow_rate, unit 2
            _wait_sim_time(c1, c1.read_float32(100) + 1200.0)
            ph2_after = c2.read_float32(0)
            ph1_after = c1.read_float32(0)
            assert ph2_after < ph2_before - 0.5, \
                f"unit 2 pH did not fall: {ph2_before} -> {ph2_after}"
            assert abs(ph1_after - ph1_before) < 0.3, \
                f"unit 1 pH moved without dosing: {ph1_before} -> {ph1_after}"
    finally:
        c1.close()
        orchestrator.running = False
        thread.join(timeout=30)


def test_fleet_headless_with_rkc_integrator():
    """Fleet mode composes with the RKC2-fast integrator plan (the
    batched step uses the same _plan_for policy as single-plant mode)."""
    import ics_wt_physicsengine_tpu.__main__ as orchestrator

    orchestrator.running = True
    orchestrator.main(["--no-modbus", "--fleet", "2", "--zones", "4",
                       "--dt", "1", "--duration", "3", "--rtf", "0",
                       "--integrator", "rkc-fast", "--seed", "8"])


def test_parquet_history_logging(tmp_path):
    """--log-parquet streams valid columnar history in both serving modes
    (the reference roadmap's 'historical data logging (Parquet format)')."""
    pq = pytest.importorskip("pyarrow.parquet")
    import ics_wt_physicsengine_tpu.__main__ as orchestrator

    single = tmp_path / "single.parquet"
    orchestrator.running = True
    orchestrator.main(["--no-modbus", "--zones", "4", "--dt", "1",
                       "--duration", "5", "--rtf", "0",
                       "--log-parquet", str(single)])
    t = pq.read_table(str(single))
    assert t.num_rows == 5
    assert "pH_outlet" in t.column_names and "any_fault" in t.column_names

    fleet = tmp_path / "fleet.parquet"
    orchestrator.running = True
    orchestrator.main(["--no-modbus", "--fleet", "2", "--zones", "4",
                       "--dt", "1", "--duration", "5", "--rtf", "0",
                       "--log-parquet", str(fleet)])
    t = pq.read_table(str(fleet))
    assert t.num_rows == 10
    assert sorted(set(t.column("unit").to_pylist())) == [1, 2]


def test_fleet_checkpoint_preserves_operator_intent(tmp_path):
    """A fleet checkpointed with a disabled pump and a raw commanded rate
    must resume with the coil still cleared and the commanded register
    intact (unit_io metadata) — not coils forced True with the gated-0.0
    flow in the register (ADVICE r2)."""
    import ics_wt_physicsengine_tpu.__main__ as orchestrator

    ckpt = tmp_path / "fleet_io.npz"
    port = _free_port()

    def run_fleet(duration):
        orchestrator.running = True
        orchestrator.main(["--port", str(port), "--host", "127.0.0.1",
                           "--dt", "5", "--duration", str(duration),
                           "--rtf", "0", "--seed", "3", "--fleet", "2",
                           "--zones", "4", "--checkpoint-file", str(ckpt)])

    # Phase 1: run with an operator clearing unit 2's acid pump enable
    # while leaving a commanded rate in the register.
    thread = threading.Thread(target=run_fleet, args=(1_000_000,),
                              daemon=True)
    thread.start()
    client = None
    deadline = time.time() + 60
    while time.time() < deadline:
        try:
            client = ModbusTcpClient("127.0.0.1", port, unit_id=2,
                                     timeout=5).connect()
            break
        except OSError:
            time.sleep(0.3)
    assert client is not None, "fleet server did not start"
    try:
        client.write_float32(0, 1.5)          # acid_flow_rate command
        client.write_coil(0, False)           # acid_pump_enable off
        time.sleep(1.0)                       # let a tick observe it
    finally:
        client.close()
    orchestrator.running = False
    thread.join(timeout=30)
    assert ckpt.exists()

    # Phase 2: resume; unit 2's intent must be back verbatim.
    thread = threading.Thread(target=run_fleet, args=(1_000_000,),
                              daemon=True)
    thread.start()
    client = None
    deadline = time.time() + 60
    while time.time() < deadline:
        try:
            client = ModbusTcpClient("127.0.0.1", port, unit_id=2,
                                     timeout=5).connect()
            break
        except OSError:
            time.sleep(0.3)
    assert client is not None, "fleet server did not restart"
    try:
        assert client.read_coils(0, 1)[0] is False    # still disabled
        assert client.read_float32(0, input_register=False) == \
            pytest.approx(1.5, abs=1e-5)              # raw command intact
        # unit 1 untouched: enabled as configured
        with ModbusTcpClient("127.0.0.1", port, unit_id=1,
                             timeout=5) as c1:
            assert c1.read_coils(0, 1)[0] is True
    finally:
        client.close()
        orchestrator.running = False
        thread.join(timeout=30)


def test_fleet_sharded_bitexact(tmp_path):
    """Sharding the fleet's lane axis across the 8-device virtual mesh must
    not change a single bit of any lane's trajectory vs single-device
    (pure data parallelism — per-lane arithmetic untouched). Compared via
    the full checkpoint pytree (physics + every sensor carry)."""
    import ics_wt_physicsengine_tpu.__main__ as orchestrator

    def run(ckpt, extra):
        orchestrator.running = True
        orchestrator.main(["--no-modbus", "--fleet", "4", "--zones", "4",
                           "--dt", "1", "--duration", "12", "--rtf", "0",
                           "--seed", "9", "--checkpoint-file", str(ckpt)]
                          + extra)

    sharded = tmp_path / "sharded.npz"
    single = tmp_path / "single.npz"
    run(sharded, [])                      # 8 virtual devices -> 4-way shard
    run(single, ["--fleet-no-shard"])

    a, b = np.load(sharded), np.load(single)
    keys = [k for k in a.files if k.startswith("leaf_")]
    assert keys and set(keys) == {k for k in b.files
                                  if k.startswith("leaf_")}
    for k in keys:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def _run_fleet(ckpt, duration, fleet, extra=()):
    import ics_wt_physicsengine_tpu.__main__ as orchestrator

    orchestrator.running = True
    orchestrator.main(["--no-modbus", "--fleet", str(fleet), "--zones", "4",
                       "--dt", "1", "--duration", str(duration),
                       "--rtf", "0", "--seed", "9",
                       "--checkpoint-file", str(ckpt)] + list(extra))


def test_fleet_checkpoint_cross_device_resume(tmp_path):
    """A checkpoint written by a SHARDED fleet (4-way over the virtual
    mesh) must resume bit-exactly on a single device and vice versa —
    checkpoints are device-topology-agnostic (saved gathered to host,
    re-placed per the resuming process's mesh)."""
    import shutil

    straight = tmp_path / "straight.npz"
    _run_fleet(straight, 20, 4, ["--fleet-no-shard"])

    # sharded 10 -> single-device resume to 20
    cross = tmp_path / "cross.npz"
    _run_fleet(cross, 10, 4)                      # sharded phase
    _run_fleet(cross, 20, 4, ["--fleet-no-shard"])  # 1-device resume

    # single-device 10 -> sharded resume to 20
    cross2 = tmp_path / "cross2.npz"
    _run_fleet(cross2, 10, 4, ["--fleet-no-shard"])
    _run_fleet(cross2, 20, 4)

    a = np.load(straight)
    for other in (cross, cross2):
        b = np.load(other)
        keys = [k for k in a.files if k.startswith("leaf_")]
        assert keys
        for k in keys:
            np.testing.assert_array_equal(a[k], b[k],
                                          err_msg=f"{other.name}:{k}")
    del a
    shutil.rmtree(tmp_path, ignore_errors=True)


def test_fleet_checkpoint_resize(tmp_path):
    """Explicit fleet-size resharding (--checkpoint-resize): saved lanes
    restore exactly into a smaller or larger fleet; extra lanes start
    fresh; without the flag a size mismatch aborts with a clear error and
    leaves the checkpoint untouched."""
    import shutil

    straight = tmp_path / "straight3.npz"
    _run_fleet(straight, 20, 3)
    base = tmp_path / "base3.npz"
    _run_fleet(base, 10, 3)

    # shrink 3 -> 2: surviving lanes must match the straight 3-fleet run
    shrink = tmp_path / "shrink.npz"
    shutil.copy(base, shrink)
    _run_fleet(shrink, 20, 2, ["--checkpoint-resize"])
    a, s = np.load(straight), np.load(shrink)
    keys = [k for k in a.files if k.startswith("leaf_")]
    assert keys
    for k in keys:
        av = a[k]
        assert av.ndim >= 1 and av.shape[0] == 3, k
        np.testing.assert_array_equal(av[:2], s[k], err_msg=k)

    # grow 3 -> 5: saved lanes exact, new lanes fresh and finite
    grow = tmp_path / "grow.npz"
    shutil.copy(base, grow)
    _run_fleet(grow, 20, 5, ["--checkpoint-resize"])
    g = np.load(grow)
    for k in keys:
        np.testing.assert_array_equal(a[k], g[k][:3], err_msg=k)
        assert g[k].shape[0] == 5, k     # two fresh lanes actually exist

    # without the flag: abort, checkpoint preserved
    import hashlib
    abort = tmp_path / "abort.npz"
    shutil.copy(base, abort)
    digest = hashlib.sha256(abort.read_bytes()).hexdigest()
    with pytest.raises(SystemExit):
        _run_fleet(abort, 20, 2)
    assert hashlib.sha256(abort.read_bytes()).hexdigest() == digest


# ---------------------------------------------------------------------------
# Connected-network serving (--network, core/network.py over Modbus units)
# ---------------------------------------------------------------------------

def _write_topo(tmp_path, n=3):
    import json
    W = [[0.0] * n for _ in range(n)]
    for i in range(n - 1):
        W[i + 1][i] = 1.0
    f = tmp_path / "topo.json"
    f.write_text(json.dumps({
        "routing": W,
        "external_inlet_flow": [8.0] + [0.0] * (n - 1)}))
    return str(f)


def test_network_serve_chunk_advances_all_stages(tmp_path):
    """--serve-chunk composes with --network: the whole train advances
    chunk steps per device call (the pipe ring is a scan carry), every
    stage's clock stays in lock-step at chunk-boundary instants, and the
    routed hydraulics still propagate the head stage's external flow."""
    import ics_wt_physicsengine_tpu.__main__ as orchestrator

    chunk = 25
    topo = _write_topo(tmp_path)
    port = _free_port()
    orchestrator.running = True
    thread = threading.Thread(
        target=orchestrator.main,
        args=(["--port", str(port), "--host", "127.0.0.1", "--dt", "60",
               "--duration", "10000000", "--rtf", "0", "--seed", "7",
               "--zones", "4", "--network", topo,
               "--serve-chunk", str(chunk)],),
        daemon=True)
    thread.start()

    deadline = time.time() + 90
    c1 = None
    while time.time() < deadline:
        try:
            c1 = ModbusTcpClient("127.0.0.1", port, unit_id=1,
                                 timeout=5).connect()
            break
        except OSError:
            time.sleep(0.3)
    if c1 is None:
        orchestrator.running = False
        pytest.fail("network Modbus server did not start")

    try:
        with ModbusTcpClient("127.0.0.1", port, unit_id=2) as c2, \
                ModbusTcpClient("127.0.0.1", port, unit_id=3) as c3:
            deadline = time.time() + 240
            while time.time() < deadline and \
                    c1.read_float32(100) < chunk * 60.0:
                time.sleep(0.5)
            t1 = c1.read_float32(100)
            assert t1 >= chunk * 60.0, "no chunk landed"
            assert t1 % (chunk * 60.0) == 0.0, t1
            # all stages advance in lock-step (one batched scan)
            assert c2.read_float32(100) == pytest.approx(t1, abs=chunk * 60)
            assert c3.read_float32(100) == pytest.approx(t1, abs=chunk * 60)
            # routed hydraulics settle to the head stage's 8 L/min source
            dl = time.time() + 120
            while time.time() < dl and not all(
                    abs(c.read_float32(10) - 8.0) <= 0.5
                    for c in (c1, c2, c3)):
                time.sleep(0.3)
            for c in (c1, c2, c3):
                assert c.read_float32(10) == pytest.approx(8.0, abs=0.5)
    finally:
        c1.close()
        orchestrator.running = False
        thread.join(timeout=30)


def test_network_serving_closed_loop(tmp_path):
    """--network serves a connected 3-stage train as Modbus units 1..3:
    the hydraulics solve propagates the head stage's external flow to
    every downstream flow sensor, and a chlorine dose commanded into
    stage 1's registers arrives (decayed) in stages 2 and 3 — over a real
    socket, exactly as a SCADA master would drive it."""
    import ics_wt_physicsengine_tpu.__main__ as orchestrator

    topo = _write_topo(tmp_path)
    port = _free_port()
    orchestrator.running = True
    thread = threading.Thread(
        target=orchestrator.main,
        args=(["--port", str(port), "--host", "127.0.0.1", "--dt", "60",
               "--duration", "10000000", "--rtf", "0", "--seed", "7",
               "--zones", "4", "--network", topo],),
        daemon=True)
    thread.start()

    deadline = time.time() + 90
    c1 = None
    while time.time() < deadline:
        try:
            c1 = ModbusTcpClient("127.0.0.1", port, unit_id=1,
                                 timeout=5).connect()
            break
        except OSError:
            time.sleep(0.3)
    if c1 is None:
        orchestrator.running = False
        pytest.fail("network Modbus server did not start")

    def wait_t(target, timeout=240):
        dl = time.time() + timeout
        while time.time() < dl:
            if c1.read_float32(100) >= target:
                return
            time.sleep(0.2)
        pytest.fail(f"network fleet did not reach t={target}")

    try:
        with ModbusTcpClient("127.0.0.1", port, unit_id=2) as c2, \
                ModbusTcpClient("127.0.0.1", port, unit_id=3) as c3:
            wait_t(120.0)
            # routed hydraulics: every stage's flow sensor converges to
            # the head stage's 8 L/min external source (within sensor
            # noise). The sensor carries a first-order lag from its
            # warmed-up 5 L/min state, so poll until it settles instead
            # of asserting a fixed tick count.
            dl = time.time() + 120
            while time.time() < dl and not all(
                    abs(c.read_float32(10) - 8.0) <= 0.5
                    for c in (c1, c2, c3)):
                time.sleep(0.3)
            for c in (c1, c2, c3):
                assert c.read_float32(10) == pytest.approx(8.0, abs=0.5)

            # let the initial 2.0 mg/L charge decay toward the undosed
            # steady state before taking the baseline (the inlet source
            # carries no chlorine, so the train drains)
            wait_t(40000.0)
            cl2_before = c2.read_float32(6)
            cl3_before = c3.read_float32(6)
            c1.write_float32(2, 0.8)          # chlorine_flow_rate, stage 1
            wait_t(c1.read_float32(100) + 40000.0)
            cl1 = c1.read_float32(6)
            cl2 = c2.read_float32(6)
            cl3 = c3.read_float32(6)
            c1.write_float32(2, 0.0)
        # the dose loads stage 1 hard and reaches both downstream stages,
        # monotonically attenuated by per-stage decay + residence
        assert cl1 > 3.0, cl1
        assert cl2 > cl2_before + 0.5, (cl2_before, cl2)
        assert cl3 > cl3_before + 0.1, (cl3_before, cl3)
        assert cl1 > cl2 > cl3, (cl1, cl2, cl3)
    finally:
        orchestrator.running = False
        thread.join(timeout=30)


def test_network_particles_clarifier_train(tmp_path):
    """--network + --enable-particles: the train's pipes carry the
    CLASS-RESOLVED solids (BoundaryConditions.inlet_tss_classes from the
    blender), so coagulant dosed into stage 1's registers clarifies not
    just its own effluent but the downstream stages' turbidity too —
    observed through each unit's nephelometer registers over a real
    socket."""
    import ics_wt_physicsengine_tpu.__main__ as orchestrator

    IR_TURBIDITY, IR_SLUDGE, HR_COAGULANT = 32, 36, 18

    topo = _write_topo(tmp_path)
    port = _free_port()
    orchestrator.running = True
    thread = threading.Thread(
        target=orchestrator.main,
        args=(["--port", str(port), "--host", "127.0.0.1", "--dt", "60",
               "--duration", "10000000", "--rtf", "0", "--seed", "11",
               "--zones", "4", "--network", topo,
               "--enable-particles", "--initial-tss", "25.0"],),
        daemon=True)
    thread.start()

    deadline = time.time() + 90
    c1 = None
    while time.time() < deadline:
        try:
            c1 = ModbusTcpClient("127.0.0.1", port, unit_id=1,
                                 timeout=5).connect()
            break
        except OSError:
            time.sleep(0.3)
    if c1 is None:
        orchestrator.running = False
        pytest.fail("network Modbus server did not start")

    def wait_t(target, timeout=240):
        dl = time.time() + timeout
        while time.time() < dl:
            if c1.read_float32(100) >= target:
                return
            time.sleep(0.2)
        pytest.fail(f"network fleet did not reach t={target}")

    try:
        with ModbusTcpClient("127.0.0.1", port, unit_id=2) as c2, \
                ModbusTcpClient("127.0.0.1", port, unit_id=3) as c3:
            # let the train load from the 25 mg/L raw source and the
            # sensors warm up
            wait_t(30000.0)

            def settled_ntu(c, lo=0.5, timeout=60):
                """Poll past transient NaN/dropout reads (a nephelometer
                bubble spike or momentary fault pushes 0.0/NaN into the
                register for one tick)."""
                dl = time.time() + timeout
                while time.time() < dl:
                    v = c.read_float32(IR_TURBIDITY)
                    if np.isfinite(v) and v > lo:
                        return v
                    time.sleep(0.3)
                pytest.fail(f"turbidity register never settled (last {v})")

            ntu1_before = settled_ntu(c1)
            ntu2_before = settled_ntu(c2)
            settled_ntu(c3)
            sl1_before = c1.read_float32(IR_SLUDGE)
            c1.write_float32(HR_COAGULANT, 40.0)   # jar-test dose, stage 1
            wait_t(c1.read_float32(100) + 60000.0)
            ntu1 = settled_ntu(c1, lo=0.02)
            ntu2 = settled_ntu(c2, lo=0.02)
            sl1 = c1.read_float32(IR_SLUDGE)
            c1.write_float32(HR_COAGULANT, 0.0)

        # stage 1 clarified hard; the CLARIFIED, class-shifted effluent
        # reached stage 2 through the pipe and clarified it too
        assert ntu1 < 0.6 * ntu1_before, (ntu1_before, ntu1)
        assert ntu2 < 0.8 * ntu2_before, (ntu2_before, ntu2)
        # the flocs the dose built settled into stage 1's sludge inventory
        assert sl1 > sl1_before + 1.0, (sl1_before, sl1)
    finally:
        orchestrator.running = False
        thread.join(timeout=30)


def test_network_checkpoint_roundtrip(tmp_path):
    """A network fleet checkpoint carries the pipe-delay ring: resuming at
    t=20 and running to t=40 is bit-exact vs a straight t=40 run, and a
    non-network run refuses a network checkpoint (and vice versa)."""
    topo = _write_topo(tmp_path)

    straight = tmp_path / "straight.npz"
    _run_fleet(straight, 40, 3, ["--network", topo])

    resumed = tmp_path / "resumed.npz"
    _run_fleet(resumed, 20, 3, ["--network", topo])
    _run_fleet(resumed, 40, 3, ["--network", topo])

    a, b = np.load(straight), np.load(resumed)
    keys = [k for k in a.files if k.startswith("leaf_")]
    assert keys
    for k in keys:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)

    # mode mixing is refused, checkpoint left intact
    with pytest.raises(SystemExit):
        _run_fleet(resumed, 60, 3)                       # plain fleet
    plain = tmp_path / "plain.npz"
    _run_fleet(plain, 10, 3)
    with pytest.raises(SystemExit):
        _run_fleet(plain, 20, 3, ["--network", topo])    # network resume


def test_fleet_disinfection_unit_resolved_uv():
    """--enable-disinfection in fleet mode: the UV lamp command into ONE
    unit raises that unit's Crypto log-removal credit; its neighbour's
    stays at the chlorine-resistant floor (the lanes are independent)."""
    import ics_wt_physicsengine_tpu.__main__ as orchestrator

    port = _free_port()
    orchestrator.running = True
    thread = threading.Thread(
        target=orchestrator.main,
        args=(["--port", str(port), "--host", "127.0.0.1", "--dt", "30",
               "--duration", "1000000", "--rtf", "0", "--seed", "7",
               "--fleet", "2", "--zones", "4", "--enable-disinfection",
               "--initial-pathogens", "1e4"],),
        daemon=True)
    thread.start()
    try:
        deadline = time.time() + 60
        c1 = None
        while time.time() < deadline:
            try:
                c1 = ModbusTcpClient("127.0.0.1", port, unit_id=1,
                                     timeout=5).connect()
                break
            except OSError:
                time.sleep(0.3)
        assert c1 is not None, "fleet Modbus server did not start"
        _wait_sim_time(c1, 60.0)

        with ModbusTcpClient("127.0.0.1", port, unit_id=2) as c2:
            # lamp on in unit 2 only (holding register 24)
            c2.write_float32(24, 15.0)
            t0 = c1.read_float32(100)
            _wait_sim_time(c1, t0 + 900.0, timeout=240)
            crypto_2 = c2.read_float32(42)   # crypto_log_removal
            crypto_1 = c1.read_float32(42)
        assert crypto_2 > crypto_1 + 1.0, (crypto_1, crypto_2)
        assert crypto_1 < 1.0, crypto_1
        # the lit unit's CT/age telemetry is live too
        with ModbusTcpClient("127.0.0.1", port, unit_id=2) as c2:
            assert c2.read_float32(44) > 0.0     # ct_outlet
            assert c2.read_float32(46) > 0.0     # water_age_outlet
    finally:
        orchestrator.running = False
        thread.join(timeout=30)

def test_fleet_biofilm_unit_resolved_source_event():
    """--enable-biofilm in fleet mode: a 100x source-water HPC spike
    written into ONE unit raises that unit's outlet plate count; its
    neighbour's stays at the suppressed baseline (lanes independent)."""
    import ics_wt_physicsengine_tpu.__main__ as orchestrator

    port = _free_port()
    orchestrator.running = True
    thread = threading.Thread(
        target=orchestrator.main,
        args=(["--port", str(port), "--host", "127.0.0.1", "--dt", "30",
               "--duration", "1000000", "--rtf", "0", "--seed", "9",
               "--fleet", "2", "--zones", "4", "--enable-biofilm",
               "--initial-hpc", "5000", "--initial-bdoc", "1.0"],),
        daemon=True)
    thread.start()
    try:
        deadline = time.time() + 60
        c1 = None
        while time.time() < deadline:
            try:
                c1 = ModbusTcpClient("127.0.0.1", port, unit_id=1,
                                     timeout=5).connect()
                break
            except OSError:
                time.sleep(0.3)
        assert c1 is not None, "fleet Modbus server did not start"
        _wait_sim_time(c1, 60.0)

        with ModbusTcpClient("127.0.0.1", port, unit_id=2) as c2:
            # spike the SOURCE water of unit 2 only (holding register 30)
            c2.write_float32(30, 5.0e5)
            t0 = c1.read_float32(100)
            _wait_sim_time(c1, t0 + 6000.0, timeout=240)
            hpc_2 = c2.read_float32(52)      # hpc_outlet
            hpc_1 = c1.read_float32(52)
            bdoc_2 = c2.read_float32(54)     # bdoc telemetry live
        assert hpc_2 > 10.0 * max(hpc_1, 1e-6), (hpc_1, hpc_2)
        assert bdoc_2 > 0.0
    finally:
        orchestrator.running = False
        thread.join(timeout=30)
