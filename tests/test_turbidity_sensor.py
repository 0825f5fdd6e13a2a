"""Turbidity sensor (sensors/turbidity.py): nephelometer physics, wrapper
API, suite/plant integration — the instrument for the particle axis."""

import numpy as np

import jax
import jax.numpy as jnp

from ics_wt_physicsengine_tpu.core import particles as P
from ics_wt_physicsengine_tpu.core import reactor as R
from ics_wt_physicsengine_tpu.sensors import turbidity as TB


def test_validation_suite():
    assert TB.validate_turbidity_sensor(verbose=False)


def test_wrapper_reads_mock_state():
    """Duck-typed contract: any object with a .tss [C, Z] array."""
    from ics_wt_physicsengine_tpu.sensors import TurbiditySensor

    class MockState:
        # class mix whose weighted NTU is 1.0 — matching the carry's
        # initial lagged value so the calibration offset lands near zero
        # (the wrapper calibrates against its own current measurement)
        tss = np.broadcast_to(
            np.array([0.2, 0.3, 0.4])[:, None], (3, 5)).copy()

    true_ntu = float(np.sum(np.array(P.DEFAULT_NTU_PER_MGL)
                            * MockState.tss[:, -1]))
    assert abs(true_ntu - 1.0) < 1e-9
    s = TurbiditySensor(name="ntu_test", zone_index=-1, seed=3)
    s.calibrate(true_ntu, 0.0)
    vals = [s.read(MockState(), current_time=60.0 + 20.0 * i).value
            for i in range(40)]
    finite = [v for v in vals if np.isfinite(v)]
    assert len(finite) > 30
    # converged mean near the true class-weighted NTU (within fouling+2%)
    assert abs(np.mean(finite[-10:]) - true_ntu) < 0.3 * true_ntu


def test_window_fouling_biases_high_and_wiper_resets():
    from ics_wt_physicsengine_tpu.sensors import TurbiditySensor
    from dataclasses import replace
    s = TurbiditySensor(name="ntu_foul", seed=4)
    s.carry = replace(
        s.carry, window_fouling_ntu=jnp.asarray(
            3.0, s.carry.window_fouling_ntu.dtype))
    assert s.window_fouling_ntu == 3.0
    s.wipe_window()
    assert s.window_fouling_ntu == 0.0


def test_suite_factory_adds_nephelometer():
    from ics_wt_physicsengine_tpu.sensors import create_realistic_sensor_suite
    cfg = R.ReactorConfiguration(n_zones=4, enable_particles=True)
    suite = create_realistic_sensor_suite(cfg, seed=1)
    assert "turbidity_outlet" in suite and len(suite) == 8
    base = create_realistic_sensor_suite(
        R.ReactorConfiguration(n_zones=4), seed=1)
    assert "turbidity_outlet" not in base and len(base) == 7


def test_integrated_plant_reads_turbidity_and_coagulation_clears_it():
    from ics_wt_physicsengine_tpu.models import plant as PL
    cfg = R.ReactorConfiguration(n_zones=4, enable_particles=True,
                                 initial_tss=20.0, flow_rate=0.0)
    params, st0 = PL.make_plant(cfg, seed=2)

    def run(dose, st):
        bc = R.BoundaryConditions(inlet_flow_rate=0.0, coagulant_dose=dose)
        st, traj = PL.plant_rollout(params, st, bc, dt=1.0, substeps=4,
                                    n_steps=600)
        return float(np.asarray(traj["turbidity_outlet"])[-1])

    ntu_plain = run(0.0, st0)
    ntu_dosed = run(40.0, st0)
    assert ntu_plain > 10.0
    assert ntu_dosed < 0.75 * ntu_plain


def test_plant_seed_streams_unchanged_by_particle_axis():
    """The 10th instrument's fold-in key must leave the legacy streams
    bit-identical (particles are passive — the core trajectory is
    unchanged, so any difference is a PRNG perturbation)."""
    from ics_wt_physicsengine_tpu.models import plant as PL
    bc = R.BoundaryConditions()
    outs = {}
    for particles in (False, True):
        cfg = R.ReactorConfiguration(n_zones=4,
                                     enable_particles=particles)
        params, st = PL.make_plant(cfg, seed=7)
        st, rd = jax.jit(
            lambda s, p=params: PL.plant_step(p, s, bc, 1.0, 4))(st)
        outs[particles] = rd
    for name in ("pH_inlet", "chlorine_outlet", "flow_main",
                 "temp_outlet"):
        a = float(outs[False][name].value)
        b = float(outs[True][name].value)
        assert a == b, f"{name} stream perturbed by enable_particles"
