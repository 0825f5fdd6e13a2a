"""Nitrogen / biological chemistry (core/nitrogen.py): nitrification,
denitrification, chloramine interaction — the reference's roadmap
"Advanced chemistry" item (reference README.md:448; it lists "no
biological processes" as a limitation at :304,521)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ics_wt_physicsengine_tpu.core import nitrogen as N
from ics_wt_physicsengine_tpu.core import reactor as R

F64 = jnp.float64


def _config(**kw):
    base = dict(n_zones=4, enable_nitrogen=True, initial_ammonia=2.0,
                initial_chlorine=0.0, flow_rate=0.0, volume=1000.0,
                height=2.0, diameter=0.798)
    base.update(kw)
    return R.ReactorConfiguration(**base)


def _run(config, bc, n_steps, dt=1.0, substeps=None, dtype=F64):
    params = R.make_params(config, dtype=dtype)
    state = R.make_initial_state(config, dtype=dtype)
    if substeps is None:
        substeps = R.default_substeps(config, dt)
    state, _ = R.rollout(params, state, bc, dt=dt, substeps=substeps,
                         n_steps=n_steps, record=False)
    return params, state


def test_validation_suite():
    assert N.validate_nitrogen(verbose=False)


def test_closed_batch_nitrogen_conserved():
    """Q=0, no chlorine, no denitrification: NH -> NO2 -> NO3 cascade
    conserves total N to integrator accuracy."""
    config = _config()
    bc = R.BoundaryConditions(inlet_flow_rate=0.0)
    params, s = _run(config, bc, n_steps=3600)   # one hour
    tot0 = 2.0
    tot = np.asarray(N.total_nitrogen_mgN(s.ammonia, s.nitrite, s.nitrate,
                                          s.chloramine))
    np.testing.assert_allclose(tot, tot0, rtol=1e-9)
    # the cascade actually progressed
    assert float(s.ammonia[0]) < 2.0
    assert float(s.nitrite[0]) > 0.0
    assert float(s.nitrate[0]) > 0.0


def test_denitrification_removes_nitrogen():
    config = _config(initial_ammonia=0.0, initial_nitrate=5.0,
                     nitrogen_kinetics={"k_denit": 20.0})
    bc = R.BoundaryConditions(inlet_flow_rate=0.0)
    _, s = _run(config, bc, n_steps=3600)
    tot = np.asarray(N.total_nitrogen_mgN(s.ammonia, s.nitrite, s.nitrate,
                                          s.chloramine))
    assert float(tot[0]) < 5.0          # N left the water as N2
    assert float(s.nitrate[0]) < 5.0


def test_nitrification_lowers_ph():
    """2 H+ per N oxidized consume alkalinity: pH must fall during active
    nitrification (a fast-kinetics config so the hour shows it)."""
    config = _config(initial_ammonia=20.0,
                     nitrogen_kinetics={"k_nitrif": 200.0})
    bc = R.BoundaryConditions(inlet_flow_rate=0.0)
    _, s = _run(config, bc, n_steps=3600)
    assert float(s.pH[0]) < 7.0 - 0.01
    # denitrification recovers alkalinity: same N flux through denit raises
    config2 = _config(initial_ammonia=0.0, initial_nitrate=20.0,
                      nitrogen_kinetics={"k_denit": 200.0})
    _, s2 = _run(config2, bc, n_steps=3600)
    assert float(s2.pH[0]) > 7.0 + 0.005


def test_chloramination_stoichiometry_and_breakpoint():
    """Free chlorine + ammonia react 5.06:1 (Cl2:N mass); with N in excess
    the free residual is consumed and combined chlorine (monochloramine)
    appears in its place."""
    config = _config(initial_ammonia=2.0, initial_chlorine=2.0)
    bc = R.BoundaryConditions(inlet_flow_rate=0.0)
    params, s = _run(config, bc, n_steps=600)
    cl = float(s.chlorine[0])
    nhcl = float(s.chloramine[0])
    nh = float(s.ammonia[0])
    assert cl < 1e-6                          # free residual consumed
    # combined chlorine formed ~ the 2.0 mg/L consumed (minus slow decay)
    assert 1.9 < nhcl <= 2.0
    # ammonia consumed = formed / 5.06 (plus nitrification's bite)
    consumed_by_cm = nhcl * N.MW_N / N.MW_CL2
    assert abs((2.0 - nh) - consumed_by_cm) < 0.05
    # total N conserved up to the slow monochloramine auto-decomposition
    # (whose N leaves as N2: ~k_cm_decay * NHCl * t ~ 3e-4 as Cl2 here)
    tot = float(N.total_nitrogen_mgN(s.ammonia, s.nitrite, s.nitrate,
                                     s.chloramine)[0])
    assert 2.0 - 1e-3 < tot <= 2.0


def test_chloramination_extent_matches_ode():
    """The analytic second-order extent (the operator split) matches a
    brute-force fine-substep ODE integration of dC/dt = -k_eff C N at
    frozen speciation fractions."""
    p = N.make_nitrogen_params(dtype=F64)
    pH, T_C, Ka = F64(7.4), F64(18.0), F64(10 ** -7.5)
    k_eff = float(N.chloramination_rate_constant(T_C, p)
                  * N.hocl_fraction(pH, Ka)
                  * N.ammonia_fraction_nh3(pH, T_C))
    C0, N0 = 1.5 / N._CL2_MGL_PER_MOL, 0.8 / N._N_MGL_PER_MOL
    dt, h = 1.0, 1e-4
    c, n = C0, N0
    for _ in range(int(dt / h)):
        r = k_eff * c * n
        c, n = c - h * r, n - h * r
    x_ode = C0 - c
    x = float(N.chloramination_extent(F64(1.5), F64(0.8), pH, T_C, Ka, p,
                                      dt))
    np.testing.assert_allclose(x, x_ode, rtol=1e-4)


def test_split_vs_fine_dt_rollout():
    """End-to-end: the dt=1 s operator-split trajectory matches a dt=0.05 s
    reference rollout (where the split error is 20x smaller) to ~1e-3."""
    config = _config(initial_ammonia=1.0, initial_chlorine=2.0,
                     flow_rate=5.0)
    bc = R.BoundaryConditions(inlet_flow_rate=5.0, inlet_ammonia=1.0,
                              inlet_chlorine=0.5)
    _, coarse = _run(config, bc, n_steps=60, dt=1.0)
    _, fine = _run(config, bc, n_steps=1200, dt=0.05, substeps=1)
    for name in ("chlorine", "ammonia", "chloramine", "pH"):
        a = np.asarray(getattr(coarse, name))
        b = np.asarray(getattr(fine, name))
        np.testing.assert_allclose(a, b, rtol=0, atol=5e-3, err_msg=name)


def test_inlet_ammonia_washes_in():
    config = _config(initial_ammonia=0.0, flow_rate=10.0,
                     nitrogen_kinetics={"k_nitrif": 0.0})
    bc = R.BoundaryConditions(inlet_flow_rate=10.0, inlet_ammonia=3.0)
    _, s = _run(config, bc, n_steps=3600)
    # filling toward the inlet concentration with the same Q/V_total
    # inlet convention the pH/Cl/T equations use (reference
    # reactor.py:362-368): effective tau = n_zones * V/Q, so one hour in
    # the 4-zone tank is ~14% of the way to 3.0
    assert 0.2 < float(s.ammonia[0]) < 1.0
    assert float(s.ammonia[0]) > float(s.ammonia[-1])  # gradient to outlet


def test_disabled_leaves_everything_unchanged():
    """enable_nitrogen=False: no species leaves, identical pytree
    structure, and the step dispatches through the original 3-species
    path (exact reference parity preserved)."""
    config = R.ReactorConfiguration(n_zones=4)
    params = R.make_params(config, dtype=F64)
    state = R.make_initial_state(config, dtype=F64)
    assert params.nitrogen is None
    assert state.ammonia is None and state.chloramine is None
    s2 = R.step(params, state, R.BoundaryConditions(), dt=1.0, substeps=2)
    assert s2.ammonia is None
    # leaf count unchanged vs a nitrogen-carrying state
    n_plain = len(jax.tree_util.tree_leaves(state))
    cfg_n = R.ReactorConfiguration(n_zones=4, enable_nitrogen=True)
    n_bio = len(jax.tree_util.tree_leaves(
        R.make_initial_state(cfg_n, dtype=F64)))
    assert n_bio == n_plain + 4


def test_batched_nitrogen():
    """The species ride the native batch axis like everything else."""
    config = _config(initial_ammonia=1.0, initial_chlorine=1.0)
    params = R.make_params(config, dtype=jnp.float32)
    state = R.make_initial_state(config, dtype=jnp.float32)
    batched = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (8,) + x.shape), state)
    bc = R.BoundaryConditions(inlet_flow_rate=0.0)
    out, _ = R.rollout(params, batched, bc, dt=1.0, substeps=2,
                       n_steps=20, record=False)
    assert out.ammonia.shape == (8, 4)
    assert np.isfinite(np.asarray(out.chloramine)).all()
    # lanes identical (same plant broadcast)
    np.testing.assert_array_equal(np.asarray(out.ammonia[0]),
                                  np.asarray(out.ammonia[5]))


def test_instrumented_plant_with_nitrogen():
    """The seven instruments read a nitrogen-enabled plant unchanged
    (they observe pH/Cl/T; the chloramine bite on free chlorine shows up
    in the chlorine sensors)."""
    from ics_wt_physicsengine_tpu.models.plant import make_plant, plant_step

    config = _config(initial_ammonia=2.0, initial_chlorine=2.0,
                     flow_rate=5.0)
    params, plant = make_plant(config, seed=3, dtype=jnp.float32)
    bc = R.BoundaryConditions(inlet_flow_rate=5.0, inlet_ammonia=1.0)
    for _ in range(3):
        plant, readings = plant_step(params, plant, bc, 1.0, 2)
    assert np.isfinite(np.asarray(plant.reactor.chloramine)).all()
    # free chlorine collapses under ammonia: the sensor must see it
    assert float(readings["chlorine_outlet"].value) < 1.5


def test_fused_paths_reject_nitrogen():
    from ics_wt_physicsengine_tpu.models.plant import make_plant
    from ics_wt_physicsengine_tpu.ops.fused_plant import plant_rollout_fused
    from ics_wt_physicsengine_tpu.ops.fused_rollout import rollout_fused

    config = _config()
    params = R.make_params(config, dtype=jnp.float32)
    state = R.make_initial_state(config, dtype=jnp.float32)
    with pytest.raises(ValueError, match="nitrogen"):
        rollout_fused(params, state, R.BoundaryConditions(), dt=1.0,
                      substeps=1, n_steps=4)
    pparams, plant = make_plant(config, seed=0, dtype=jnp.float32)
    with pytest.raises(ValueError, match="nitrogen"):
        plant_rollout_fused(pparams, plant, R.BoundaryConditions(),
                            dt=1.0, substeps=1, n_steps=4, rng="bits",
                            bits=np.zeros((4, 1, 8, 128), np.int32),
                            interpret=True)


def test_nitrogen_over_modbus():
    """--enable-nitrogen serves the extension registers over a real
    socket: ammonia/chloramine outlet input registers update and the
    inlet_ammonia holding register feeds the boundary."""
    import socket
    import threading
    import time

    import ics_wt_physicsengine_tpu.__main__ as orch
    from ics_wt_physicsengine_tpu.modbus import ModbusTcpClient

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()

    orch.running = True
    thread = threading.Thread(
        target=orch.main,
        args=(["--port", str(port), "--host", "127.0.0.1", "--dt", "30",
               "--duration", "1000000", "--rtf", "0", "--zones", "4",
               "--seed", "4", "--enable-nitrogen",
               "--initial-ammonia", "1.0"],),
        daemon=True)
    thread.start()
    client = None
    deadline = time.time() + 60
    while time.time() < deadline:
        try:
            client = ModbusTcpClient("127.0.0.1", port, timeout=5).connect()
            break
        except OSError:
            time.sleep(0.3)
    assert client is not None, "server did not start"
    try:
        # wait past the ammonia ISE's 600 s warm-up (readings are NaN ->
        # published 0.0 until then)
        deadline = time.time() + 90
        while time.time() < deadline:
            if client.read_float32(100) > 700.0:
                break
            time.sleep(0.2)
        ammonia = client.read_float32(20)       # ammonia_outlet
        chloramine = client.read_float32(26)    # chloramine_outlet
        # the register carries the MEASURED value (ISE instrument):
        # includes the faithful init-calibration-from-cold offset quirk
        # (PARITY.md) and K+ interference on top of the chloramination
        # bite, so bound loosely — finite, positive, plausible
        assert 0.0 < ammonia < 2.5
        assert chloramine > 0.5                 # combined chlorine formed
        # the inlet_ammonia holding register is live
        assert client.read_float32(14, input_register=False) == \
            pytest.approx(1.0, abs=1e-5)
        client.write_float32(14, 5.0)
        time.sleep(1.0)
        assert client.read_float32(14, input_register=False) == \
            pytest.approx(5.0, abs=1e-5)
    finally:
        client.close()
        orch.running = False
        thread.join(timeout=30)


def test_total_chlorine_measurement():
    """A measurement_type='total' chlorine sensor responds to free +
    combined chlorine (the DPD total test); 'free' sensors ignore the
    chloramine — the reference's ChlorineMeasurementType made physically
    meaningful by the chloramine species."""
    from ics_wt_physicsengine_tpu.sensors import chlorine as SC

    key = jax.random.key(0)
    free_p = SC.make_chlorine_params(sensor_type=SC.DPD,
                                     measurement_type="free",
                                     dtype=jnp.float64)
    total_p = SC.make_chlorine_params(sensor_type=SC.DPD,
                                      measurement_type="total",
                                      dtype=jnp.float64)

    def read(params, combined):
        import dataclasses
        c = SC.make_chlorine_carry(params, key, dtype=jnp.float64)
        c = dataclasses.replace(c, base=dataclasses.replace(
            c.base, power_on_time=jnp.float64(-4000.0),
            last_calibration_time=jnp.float64(0.0),
            has_calibration=jnp.asarray(True)))
        n = jnp.zeros((SC.N_NORMALS,), jnp.float64)
        u = jnp.full((SC.N_UNIFORMS,), 0.5, jnp.float64)
        _, out = SC.chlorine_read(params, c, jnp.float64(1.0),
                                  jnp.float64(7.0), jnp.float64(10.0),
                                  combined_zone=combined, rand=(n, u))
        return float(out.value)

    v_free = read(free_p, jnp.float64(1.5))
    v_total = read(total_p, jnp.float64(1.5))
    v_total0 = read(total_p, jnp.float64(0.0))
    # free sensor ignores the combined 1.5; the total sensor's FIRST read
    # shows it through the full pipeline: first-order lag alpha=0.5 from a
    # 0 initial value x DPD 95% reaction completeness -> 1.5*0.475=0.712
    assert abs(v_total - v_free - 1.5 * 0.5 * 0.95) < 0.05
    assert abs(v_total0 - v_free) < 1e-9
    # and None (no nitrogen chemistry) behaves like 0
    assert abs(read(total_p, None) - v_free) < 1e-9


def test_total_chlorine_wrapper_probes_state():
    """The ChlorineSensor wrapper duck-probes `chloramine` off the state
    (like the reference's hasattr cross-sensitivity probing)."""
    from ics_wt_physicsengine_tpu.sensors import ChlorineSensor

    class MockState:
        chlorine = np.full(4, 1.0)
        pH = np.full(4, 7.0)
        chloramine = np.full(4, 2.0)

    class MockStateFree:
        chlorine = np.full(4, 1.0)
        pH = np.full(4, 7.0)

    import dataclasses

    def fresh_sensor():
        s = ChlorineSensor("cl_total", zone_index=0, sensor_type="dpd",
                           measurement_type="total", seed=1)
        s.carry = dataclasses.replace(
            s.carry, base=dataclasses.replace(
                s.carry.base, power_on_time=np.float64(-4000.0),
                last_calibration_time=np.float64(0.0),
                has_calibration=np.asarray(True)))
        return s

    # two identical fresh sensors (same seed): only the probed state
    # differs, so the reading gap is the chloramine response
    r_with = fresh_sensor().read(MockState(), 10.0)
    r_without = fresh_sensor().read(MockStateFree(), 10.0)
    # first-read lag halves the step; combined 2.0 -> ~0.95 difference
    assert r_with.value - r_without.value > 0.6


def test_ammonia_sensor_validation():
    from ics_wt_physicsengine_tpu.sensors.ammonia import (
        validate_ammonia_sensor)

    assert validate_ammonia_sensor(verbose=False)


def test_ammonia_sensor_in_suite_and_plant():
    """enable_nitrogen grows the sensor suite to 8 (outlet ammonia ISE)
    and the integrated plant reads it; the canonical 7-sensor layout and
    seed streams are untouched when disabled."""
    from ics_wt_physicsengine_tpu.models.plant import make_plant, plant_step
    from ics_wt_physicsengine_tpu.sensors import (
        create_realistic_sensor_suite)

    cfg_n = _config(initial_ammonia=2.0, initial_chlorine=0.0,
                    flow_rate=5.0)
    suite = create_realistic_sensor_suite(cfg_n, seed=1)
    assert len(suite) == 8 and "ammonia_outlet" in suite
    base = create_realistic_sensor_suite(
        R.ReactorConfiguration(n_zones=4), seed=1)
    assert len(base) == 7

    # seed streams of the legacy 7 are bit-identical either way
    for name in base:
        a = suite[name].carry.base.key
        b = base[name].carry.base.key
        np.testing.assert_array_equal(
            np.asarray(jax.random.key_data(a)),
            np.asarray(jax.random.key_data(b)), err_msg=name)

    params, plant = make_plant(cfg_n, seed=2, dtype=jnp.float32)
    plant, readings = plant_step(params, plant,
                                 R.BoundaryConditions(), 1.0, 2)
    assert "ammonia_outlet" in readings
    v = float(readings["ammonia_outlet"].value)
    assert 0.0 <= v < 5.0 and np.isfinite(v)

    # ISE pH dependence end-to-end: high-pH plant under-reads TAN
    cfg_hi = _config(initial_ammonia=2.0, initial_chlorine=0.0,
                     initial_pH=9.2, flow_rate=5.0)
    p2, pl2 = make_plant(cfg_hi, seed=2, dtype=jnp.float32)
    pl2, r2 = plant_step(p2, pl2, R.BoundaryConditions(), 1.0, 2)
    # first reads carry the 0.5 lag from a 0 initial value: compare ratios
    assert r2["ammonia_outlet"].value < readings["ammonia_outlet"].value


def test_monte_carlo_nitrogen_kinetics_randomized():
    """Monte-Carlo batches sample the biological kinetics per plant when
    nitrogen is enabled (site-to-site nitrifier variability); explicit
    overrides stay fixed; disabled configs are untouched."""
    from ics_wt_physicsengine_tpu.models.monte_carlo import (
        make_monte_carlo_batch)

    cfg = _config(initial_ammonia=2.0, initial_chlorine=0.0,
                  flow_rate=5.0)
    params, states = make_monte_carlo_batch(cfg, 16, seed=1,
                                            dtype=jnp.float32)
    k = np.asarray(params.nitrogen.k_nitrif)
    assert k.shape == (16,) and len(np.unique(k)) > 1
    assert (k >= 1.0).all() and (k <= 4.0).all()
    # theta not ranged: broadcast constant
    th = np.asarray(params.nitrogen.theta_aob)
    assert len(np.unique(th)) == 1

    # explicit override pins the value across the batch
    cfg2 = _config(initial_ammonia=2.0, initial_chlorine=0.0,
                   nitrogen_kinetics={"k_nitrif": 2.5})
    p2, _ = make_monte_carlo_batch(cfg2, 8, seed=1, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(p2.nitrogen.k_nitrif), 2.5)

    # a batched rollout with per-plant kinetics runs and diverges by lane
    bc = R.BoundaryConditions(inlet_flow_rate=0.0)
    out, _ = R.rollout(params, states, bc, dt=1.0, substeps=3,
                       n_steps=300, record=False)
    nh = np.asarray(out.ammonia[:, 0])
    assert np.isfinite(nh).all()
    assert nh.std() > 1e-4      # kinetics spread shows in the trajectories

    # disabled: no nitrogen params in the batch
    p0, _ = make_monte_carlo_batch(R.ReactorConfiguration(n_zones=4), 4,
                                   seed=1, dtype=jnp.float32)
    assert p0.nitrogen is None


def test_zone_sharded_nitrogen_matches_single_device():
    """The zone-sharded SPMD path supports the nitrogen species
    (halo-exchanged like pH/Cl/T, nitrogen=True): trajectories match the
    single-device engine on the virtual 8-device mesh."""
    from ics_wt_physicsengine_tpu.parallel import (
        make_zone_mesh, shard_state_zones, zone_sharded_rollout)

    n_zones = 16
    cfg = R.ReactorConfiguration(
        volume=1000, height=2.0, diameter=0.798, n_zones=n_zones,
        enable_nitrogen=True, initial_ammonia=1.5, initial_chlorine=2.0)
    params = R.make_params(cfg, dtype=jnp.float64)
    state = R.make_initial_state(cfg, dtype=jnp.float64)
    bc = R.BoundaryConditions(inlet_flow_rate=5.0, inlet_ammonia=1.0,
                              inlet_chlorine=0.5, acid_flow_rate=0.1)
    dt, substeps, n_steps = 1.0, 3, 50

    ref, _ = R.rollout(params, state, bc, dt=dt, substeps=substeps,
                       n_steps=n_steps, record=False)

    mesh = make_zone_mesh(8)
    fn = zone_sharded_rollout(mesh, n_zones=n_zones, dt=dt,
                              substeps=substeps, n_steps=n_steps,
                              nitrogen=True)
    out = fn(params, shard_state_zones(state, mesh), bc)

    for name in ("pH", "chlorine", "ammonia", "nitrite", "nitrate",
                 "chloramine", "temperature"):
        np.testing.assert_allclose(np.asarray(getattr(out, name)),
                                   np.asarray(getattr(ref, name)),
                                   rtol=0, atol=1e-9, err_msg=name)

    # without nitrogen=True the clear error fires
    fn_plain = zone_sharded_rollout(mesh, n_zones=n_zones, dt=dt,
                                    substeps=substeps, n_steps=n_steps)
    with pytest.raises(Exception):
        fn_plain(params, shard_state_zones(state, mesh), bc)
