"""Dissolved-oxygen sensor (sensors/oxygen.py): principle physics, wrapper
API, suite/plant integration — the instrument for the gas-exchange axis."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ics_wt_physicsengine_tpu.core import reactor as R
from ics_wt_physicsengine_tpu.sensors import oxygen as OX


def test_validation_suite():
    assert OX.validate_oxygen_sensor(verbose=False)


def test_wrapper_reads_mock_state():
    """Duck-typed state contract (the reference's MockReactorState
    pattern): any object with .oxygen/.temperature/.flow_rate arrays."""
    from ics_wt_physicsengine_tpu.sensors import OxygenSensor

    class MockState:
        # 8.0 matches the carry's initial lagged value so the calibration
        # offset lands near zero (the wrapper calibrates against its own
        # current measurement, like the reference)
        oxygen = np.full(4, 8.0)
        temperature = np.full(4, 20.0)
        flow_rate = np.asarray(5.0)

    s = OxygenSensor(name="do_test", zone_index=-1, seed=5)
    t0 = 0.0
    s.calibrate(8.0, t0)
    # past warm-up (optical: 60 s); spaced reads so the 40 s first-order
    # lag converges
    vals = [s.read(MockState(), current_time=t0 + 100.0 + 30.0 * i).value
            for i in range(40)]
    finite = [v for v in vals if np.isfinite(v)]
    assert len(finite) > 30
    assert abs(np.mean(finite[-10:]) - 8.0) < 0.3


def test_clark_wrapper_flow_dependence():
    from ics_wt_physicsengine_tpu.sensors import OxygenSensor

    class Stagnant:
        oxygen = np.full(4, 8.0)
        temperature = np.full(4, 20.0)
        flow_rate = np.asarray(0.001)

    class Flowing(Stagnant):
        flow_rate = np.asarray(5.0)

    def mean_read(state):
        s = OxygenSensor(name="clark", sensor_type="clark", seed=9)
        s.calibrate(8.0, 0.0)
        vals = [s.read(state, current_time=1000.0 + i).value
                for i in range(30)]
        return float(np.nanmean([v for v in vals if np.isfinite(v)]))

    assert mean_read(Stagnant()) < 0.3 * mean_read(Flowing())


def test_replace_cap_resets_aging():
    from dataclasses import replace
    from ics_wt_physicsengine_tpu.sensors import OxygenSensor
    s = OxygenSensor(name="ldo", seed=1)
    s.carry = replace(s.carry,
                      cap_age_days=jnp.asarray(300.0, s.carry.cap_age_days.dtype),
                      slope_percentage=jnp.asarray(80.0, s.carry.slope_percentage.dtype))
    assert s.slope_percentage == 80.0
    s.replace_cap()
    assert s.slope_percentage == 100.0 and s.cap_age_days == 0.0


def test_suite_factory_adds_do_probe():
    from ics_wt_physicsengine_tpu.sensors import create_realistic_sensor_suite
    cfg = R.ReactorConfiguration(n_zones=4, enable_gas=True)
    suite = create_realistic_sensor_suite(cfg, seed=1)
    assert "oxygen_outlet" in suite and len(suite) == 8
    # and the canonical 7-sensor layout is untouched when gas is off
    base = create_realistic_sensor_suite(
        R.ReactorConfiguration(n_zones=4), seed=1)
    assert "oxygen_outlet" not in base and len(base) == 7


def test_integrated_plant_reads_oxygen():
    from ics_wt_physicsengine_tpu.models import plant as PL
    cfg = R.ReactorConfiguration(n_zones=4, enable_gas=True)
    params, st = PL.make_plant(cfg, seed=2)
    bc = R.BoundaryConditions(aeration_kla=1e-3)
    step = jax.jit(lambda s: PL.plant_step(params, s, bc, 1.0, 4))
    for _ in range(5):
        st, rd = step(st)
    assert "oxygen_outlet" in rd
    v = float(rd["oxygen_outlet"].value)
    assert 7.0 < v < 11.0

    # batched: per-lane keys give decorrelated noise
    bp, bs = PL.make_plant_batch(cfg, n_plants=4, seed=3)
    bs2, brd = PL.plant_step_batched(bp, bs, bc, 1.0, 4)
    vals = np.asarray(brd["oxygen_outlet"].value)
    assert vals.shape == (4,)
    assert len(np.unique(vals)) == 4


def test_plant_seed_streams_unchanged_by_gas_axis():
    """Adding the optional 9th instrument must not perturb the seven legacy
    sensor streams (same fold-in discipline as the ammonia instrument)."""
    from ics_wt_physicsengine_tpu.models import plant as PL
    bc = R.BoundaryConditions()
    outs = {}
    for gas in (False, True):
        # kl_surface=0 makes the gas species inert tracers so the physics
        # trajectory is bit-exact (tests/test_gas.py) — any difference in
        # the legacy readings could then only come from perturbed PRNG
        # streams, which is exactly what this test polices
        cfg = R.ReactorConfiguration(
            n_zones=4, enable_gas=gas,
            gas_params={"kl_surface": 0.0} if gas else None)
        params, st = PL.make_plant(cfg, seed=7)
        st, rd = jax.jit(
            lambda s, p=params: PL.plant_step(p, s, bc, 1.0, 4))(st)
        outs[gas] = rd
    for name in ("pH_inlet", "chlorine_outlet", "flow_main", "temp_outlet"):
        a = float(outs[False][name].value)
        b = float(outs[True][name].value)
        assert a == b, f"{name} stream perturbed by enable_gas: {a} vs {b}"
