"""
Trajectory regression against the reference implementation.

The reference (scipy Radau, float64, /root/reference) is imported directly as
the oracle and run side-by-side with our jitted fixed-step RK4 on the CPU
x64 backend. Matching tolerance is set by Radau's own integration accuracy
(rtol=1e-6, atol=1e-8 — reference core/reactor.py:476-484): calibration
(tools/compare_vs_reference.py) shows the two integrators agree to ~1e-6 and
the residual is Radau's error floor, not ours.

Skipped automatically if the reference mount is absent.
"""

import numpy as np
import pytest

wt_ref = pytest.importorskip("wt_simulator.core.reactor")

from ics_wt_physicsengine_tpu.core import reactor as R  # noqa: E402

TOL_PH = 1e-8
TOL_CL = 2e-6
TOL_T = 5e-6


def _run_pair(config_kwargs, schedule, dt, n_steps):
    ref_reactor = wt_ref.IntegratedCSTR(
        wt_ref.ReactorConfiguration(**config_kwargs))
    our_reactor = R.IntegratedCSTR(R.ReactorConfiguration(**config_kwargs))

    ref_traj, our_traj = [], []
    for i in range(n_steps):
        bc_kwargs = schedule(i)
        ref_state = ref_reactor.step(dt, wt_ref.BoundaryConditions(**bc_kwargs))
        our_state = our_reactor.step(dt, R.BoundaryConditions(**bc_kwargs))
        ref_traj.append(np.concatenate(
            [ref_state.pH, ref_state.chlorine, ref_state.temperature]))
        our_traj.append(np.concatenate(
            [np.asarray(our_state.pH), np.asarray(our_state.chlorine),
             np.asarray(our_state.temperature)]))
    return np.array(ref_traj), np.array(our_traj)


def _check(ref, ours, n, tol_ph=TOL_PH, tol_cl=TOL_CL, tol_t=TOL_T):
    err_ph = np.abs(ours[:, :n] - ref[:, :n]).max()
    err_cl = np.abs(ours[:, n:2 * n] - ref[:, n:2 * n]).max()
    err_t = np.abs(ours[:, 2 * n:] - ref[:, 2 * n:]).max()
    assert err_ph < tol_ph, f"pH deviation {err_ph:.2e}"
    assert err_cl < tol_cl, f"Cl deviation {err_cl:.2e}"
    assert err_t < tol_t, f"T deviation {err_t:.2e}"


def test_config1_two_zone_cstr():
    """BASELINE config 1: 2-zone CSTR, fixed dt, chlorine + pH buffer."""
    diameter = 2 * np.sqrt(1.0 / (np.pi * 2.0))
    cfg = dict(volume=1000, height=2.0, diameter=diameter, n_zones=2,
               flow_rate=5.0, initial_pH=7.0, initial_chlorine=2.0,
               temperature=20.0)

    def schedule(i):
        return dict(inlet_flow_rate=5.0, inlet_pH=7.5, inlet_chlorine=0.5,
                    inlet_temperature=20.0)

    ref, ours = _run_pair(cfg, schedule, dt=1.0, n_steps=60)
    _check(ref, ours, 2)


def test_config1_dosing_transient():
    """5-zone default with acid + chlorine dosing switched mid-run."""
    cfg = dict(volume=1000, height=2.0, diameter=0.798, n_zones=5,
               flow_rate=5.0, initial_pH=7.5, initial_chlorine=2.0,
               temperature=20.0)

    def schedule(i):
        base = dict(inlet_flow_rate=5.0, inlet_pH=8.0, inlet_chlorine=0.0,
                    inlet_temperature=22.0)
        if i < 30:
            base.update(acid_flow_rate=0.5, acid_concentration=0.1,
                        chlorine_flow_rate=0.2, chlorine_concentration=50.0)
        return base

    ref, ours = _run_pair(cfg, schedule, dt=1.0, n_steps=60)
    _check(ref, ours, 5)


def test_config2_stratified_20_zone():
    """BASELINE config 2: 20-zone stratified CSTR, Richardson buoyancy +
    temperature-dependent kinetics, warm inlet + heat loss."""
    cfg = dict(volume=1000, height=2.0, diameter=0.798, n_zones=20,
               flow_rate=5.0, initial_pH=7.0, initial_chlorine=2.0,
               temperature=20.0)

    def schedule(i):
        return dict(inlet_flow_rate=5.0, inlet_pH=7.2, inlet_chlorine=0.5,
                    inlet_temperature=26.0, acid_flow_rate=0.1,
                    acid_concentration=0.1, ambient_temperature=15.0,
                    heat_loss_coefficient=50.0)

    ref, ours = _run_pair(cfg, schedule, dt=1.0, n_steps=60)
    _check(ref, ours, 20)


def test_scalar_oracles_match_reference():
    """Point-check thermo/chemistry scalar functions against the reference."""
    from wt_simulator.core.thermodynamics import TemperatureDependentKinetics
    from wt_simulator.core.chemistry import AqueousChemistry, BufferSystem

    from ics_wt_physicsengine_tpu.core import thermodynamics as our_thermo
    from ics_wt_physicsengine_tpu.core import chemistry as our_chem

    ref_kin = TemperatureDependentKinetics()
    for t in (0.0, 5.0, 20.0, 25.0, 37.5):
        assert float(our_thermo.chlorine_decay_rate(t)) == pytest.approx(
            ref_kin.chlorine_decay_rate(t), rel=1e-14)
        assert float(our_thermo.water_ionization_constant(t)) == pytest.approx(
            ref_kin.water_ionization_constant(t), rel=1e-14)
        assert float(our_thermo.neutral_pH(t)) == pytest.approx(
            ref_kin.neutral_pH(t), rel=1e-14)

    ref_chem = AqueousChemistry(BufferSystem(100, 2.0, 20))
    our = our_chem.AqueousChemistry(our_chem.BufferSystem(100, 2.0, 20))
    assert our.calculate_pH() == pytest.approx(ref_chem.calculate_pH(),
                                               abs=2e-6)
    for ph in (5.0, 6.35, 7.0, 8.5, 10.0):
        assert float(our.buffering_capacity(ph)) == pytest.approx(
            float(ref_chem.buffering_capacity(ph)), rel=1e-12)
        assert float(our.pH_dependent_chlorine_decay_factor(ph)) == \
            pytest.approx(
                float(ref_chem.pH_dependent_chlorine_decay_factor(ph)),
                rel=1e-12)


def test_dt_extremes_match_reference():
    """Published timestep envelope: min stable dt = 0.1 s (reference
    README.md:541) and large dt = 10 s both track Radau."""
    cfg = dict(volume=1000, height=2.0, diameter=0.798, n_zones=5,
               flow_rate=5.0, initial_pH=7.2, initial_chlorine=2.0,
               temperature=20.0)

    def schedule(i):
        return dict(inlet_flow_rate=5.0, inlet_pH=7.6, inlet_chlorine=0.3,
                    acid_flow_rate=0.2)

    # Radau's per-step error accumulates over 100 tiny steps; 1e-7 is its
    # own floor here, not ours.
    ref_fast, ours_fast = _run_pair(cfg, schedule, dt=0.1, n_steps=100)
    _check(ref_fast, ours_fast, 5, tol_ph=1e-7, tol_cl=5e-5)

    ref_slow, ours_slow = _run_pair(cfg, schedule, dt=10.0, n_steps=30)
    _check(ref_slow, ours_slow, 5, tol_ph=1e-7, tol_cl=5e-5)


def test_randomized_boundaries_match_reference():
    """Fuzz: random boundary sequences (switching dosing, variable inlet)
    must track Radau step-for-step."""
    rng = np.random.default_rng(123)
    cfg = dict(volume=1000, height=2.0, diameter=0.798, n_zones=8,
               flow_rate=5.0, initial_pH=7.0, initial_chlorine=2.0,
               temperature=20.0)

    seq = [dict(inlet_flow_rate=float(rng.uniform(1.0, 10.0)),
                inlet_pH=float(rng.uniform(6.8, 8.2)),
                inlet_chlorine=float(rng.uniform(0.0, 1.0)),
                inlet_temperature=float(rng.uniform(15.0, 28.0)),
                acid_flow_rate=float(rng.choice([0.0, 0.2, 0.6])),
                chlorine_flow_rate=float(rng.choice([0.0, 0.3])),
                ambient_temperature=15.0,
                heat_loss_coefficient=float(rng.choice([0.0, 80.0])))
           for _ in range(40)]

    # Sharp square-wave dosing at dt=2 is the integrator's worst case:
    # truncation differences reach ~1e-4 mg/L absolute (1e-4 relative) —
    # two orders of magnitude below the chlorine sensor noise floor of
    # 0.01 mg/L (reference chlorine_sensor.py:129).
    ref, ours = _run_pair(cfg, lambda i: seq[i], dt=2.0, n_steps=40)
    _check(ref, ours, 8, tol_ph=1e-6, tol_cl=5e-4, tol_t=1e-3)


def test_batch_mode_fixed_not_replicated():
    """Batch mode (flow_rate = 0): the reference *crashes at construction*
    — IntegratedCSTR's init log formats the None residence time
    (reference reactor.py:224-227 f-string), despite TransportModel
    explicitly supporting batch mode (transport.py:213-218). Our engine runs
    it; this test documents both the defect and our behavior."""
    cfg = dict(volume=1000, height=2.0, diameter=0.798, n_zones=5,
               flow_rate=0.0, initial_pH=7.2, initial_chlorine=2.0,
               temperature=20.0)

    with pytest.raises(TypeError):
        wt_ref.IntegratedCSTR(wt_ref.ReactorConfiguration(**cfg))

    ours = R.IntegratedCSTR(R.ReactorConfiguration(**cfg))
    bc = R.BoundaryConditions(inlet_flow_rate=0.0, acid_flow_rate=0.1,
                              acid_concentration=0.1)
    for _ in range(30):
        ours.step(1.0, bc)
    ph = np.asarray(ours.state.pH)
    assert np.all(np.isfinite(ph))
    assert ph[0] < 7.2                      # acid dosing lowers zone 0
    cl = np.asarray(ours.state.chlorine)
    assert np.all(cl < 2.0) and np.all(cl > 1.9)   # pure slow decay
