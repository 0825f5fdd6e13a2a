"""Integrated reactor behavior (reference strategy:
validate_integrated_reactor, core/reactor.py:648-700) plus TPU-design tests:
batched broadcasting, rollout-vs-loop equivalence, conservation in-graph."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ics_wt_physicsengine_tpu.core import reactor as R


CONFIG = dict(volume=1000, height=2.0, diameter=0.798, n_zones=5,
              flow_rate=5.0, initial_pH=7.5, initial_chlorine=2.0,
              temperature=20.0)


@pytest.fixture(scope="module")
def reactor():
    return R.IntegratedCSTR(R.ReactorConfiguration(**CONFIG))


def test_config_validation():
    with pytest.raises(ValueError):
        R.ReactorConfiguration(volume=500.0, diameter=0.798).validate()
    with pytest.raises(ValueError):
        R.ReactorConfiguration(initial_pH=15.0).validate()
    R.ReactorConfiguration(**CONFIG).validate()


def test_closed_system_is_stable():
    reactor = R.IntegratedCSTR(R.ReactorConfiguration(**CONFIG))
    bc = R.BoundaryConditions(inlet_flow_rate=0.0, acid_flow_rate=0.0,
                              chlorine_flow_rate=0.0)
    for _ in range(10):
        reactor.step(1.0, bc)
    assert 6.0 < float(np.mean(np.asarray(reactor.state.pH))) < 9.0
    assert 0.0 < float(np.mean(np.asarray(reactor.state.chlorine))) < 5.0
    # Uniform closed system: pH should not move at all
    np.testing.assert_allclose(np.asarray(reactor.state.pH), 7.5, atol=1e-9)


def test_acid_dosing_decreases_pH():
    reactor = R.IntegratedCSTR(R.ReactorConfiguration(**CONFIG))
    bc = R.BoundaryConditions(inlet_flow_rate=0.0, acid_flow_rate=0.5,
                              acid_concentration=0.1, chlorine_flow_rate=0.0)
    pH0 = float(reactor.state.pH[0])
    for _ in range(20):
        reactor.step(1.0, bc)
    assert float(reactor.state.pH[0]) < pH0


def test_chlorine_decays_in_closed_system():
    reactor = R.IntegratedCSTR(R.ReactorConfiguration(**CONFIG))
    bc = R.BoundaryConditions(inlet_flow_rate=0.0)
    cl0 = float(np.mean(np.asarray(reactor.state.chlorine)))
    reactor.rollout(1.0, bc, n_steps=600, record=False)
    cl1 = float(np.mean(np.asarray(reactor.state.chlorine)))
    assert cl1 < cl0
    # First-order decay at ~20 C, pH 7.5: effective k = k(T) * f(pH) < 1e-4
    assert cl1 > cl0 * np.exp(-1.2e-4 * 600)


def test_warm_inlet_heats_zone0_first():
    reactor = R.IntegratedCSTR(R.ReactorConfiguration(**CONFIG))
    bc = R.BoundaryConditions(inlet_flow_rate=5.0, inlet_temperature=30.0)
    for _ in range(30):
        reactor.step(1.0, bc)
    t = np.asarray(reactor.state.temperature)
    # Zone 0 heats first; the outlet zone initially dips below 20 C because
    # the outlet advection term removes mass before the warmth diffuses there
    # (same behavior as the reference exchange matrix, transport.py:316).
    assert t[0] > 20.0
    assert t[0] > t[-1]


def test_heat_loss_cools_toward_ambient():
    reactor = R.IntegratedCSTR(R.ReactorConfiguration(**CONFIG))
    bc = R.BoundaryConditions(inlet_flow_rate=0.0, ambient_temperature=10.0,
                              heat_loss_coefficient=100.0)
    reactor.rollout(1.0, bc, n_steps=300, record=False)
    t = np.asarray(reactor.state.temperature)
    assert np.all(t < 20.0)
    assert np.all(t > 10.0)


def test_conservation_metrics(reactor):
    cons = reactor.validate_conservation()
    assert cons["total_chlorine_mg"] > 0
    assert cons["zones"] == 5
    # closed fresh reactor: chlorine mass = 2 mg/L * 1000 L
    fresh = R.IntegratedCSTR(R.ReactorConfiguration(**CONFIG))
    assert fresh.validate_conservation()["total_chlorine_mg"] == \
        pytest.approx(2000.0, rel=1e-12)


def test_mass_conservation_through_stencil():
    """With no inflow/outflow/decay, total mass through the exchange operator
    is conserved to float64 roundoff over many steps (the reference's 1e-12
    K-matrix row-sum discipline, transport.py:320-334)."""
    config = R.ReactorConfiguration(**{**CONFIG, "flow_rate": 0.0,
                                       "initial_chlorine": 0.0})
    reactor = R.IntegratedCSTR(config)
    # hand the reactor a non-uniform temperature profile (pure mixing problem)
    state = reactor.state
    t_profile = np.linspace(25.0, 15.0, 5)
    reactor.state = R.ReactorState(
        time=state.time, pH=state.pH, chlorine=state.chlorine,
        temperature=jnp.asarray(t_profile), flow_rate=state.flow_rate,
        H_concentration=state.H_concentration, density=state.density,
        chlorine_decay_rate=state.chlorine_decay_rate)
    bc = R.BoundaryConditions(inlet_flow_rate=0.0)
    e0 = float(np.sum(t_profile))
    reactor.rollout(1.0, bc, n_steps=200, record=False)
    e1 = float(np.sum(np.asarray(reactor.state.temperature)))
    assert abs(e1 - e0) < 1e-9
    # and it homogenizes
    assert np.ptp(np.asarray(reactor.state.temperature)) < np.ptp(t_profile)


def test_rollout_equals_stepping():
    config = R.ReactorConfiguration(**CONFIG)
    bc = R.BoundaryConditions(inlet_flow_rate=5.0, inlet_pH=8.0,
                              acid_flow_rate=0.2)
    r1 = R.IntegratedCSTR(config)
    for _ in range(10):
        r1.step(1.0, bc)
    r2 = R.IntegratedCSTR(config)
    r2.rollout(1.0, bc, n_steps=10, record=False)
    np.testing.assert_allclose(np.asarray(r1.state.pH),
                               np.asarray(r2.state.pH), rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(r1.state.chlorine),
                               np.asarray(r2.state.chlorine),
                               rtol=0, atol=1e-12)


def test_batched_leading_axis_matches_single():
    """The derivative/step code is natively batched: a [B, Z] state with
    per-plant params must reproduce B independent single-plant runs."""
    config = R.ReactorConfiguration(**CONFIG)
    params = R.make_params(config, dtype=jnp.float64)
    state = R.make_initial_state(config, dtype=jnp.float64)
    bc = R.BoundaryConditions(acid_flow_rate=0.3)

    B = 3
    batched_params = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(jnp.asarray(x), (B,) + jnp.shape(x))
        if not isinstance(x, int) else x, params)
    batched_state = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(jnp.asarray(x), (B,) + jnp.shape(x)), state)

    step1 = jax.jit(lambda p, s, b: R.step(p, s, b, dt=1.0, substeps=2))
    single = step1(params, state, bc)
    batched = step1(batched_params, batched_state, bc)
    for b in range(B):
        np.testing.assert_allclose(np.asarray(batched.pH)[b],
                                   np.asarray(single.pH), rtol=0, atol=1e-12)


def test_get_state_at_location(reactor):
    assert reactor.get_state_at_location(0, "pH") == \
        pytest.approx(float(reactor.state.pH[0]))
    with pytest.raises(ValueError):
        reactor.get_state_at_location(99, "pH")
    with pytest.raises(ValueError):
        reactor.get_state_at_location(0, "entropy")


def test_bounds_enforced():
    """Extreme dosing cannot push state out of physical bounds
    (reference reactor.py:526-541)."""
    config = R.ReactorConfiguration(**CONFIG)
    reactor = R.IntegratedCSTR(config)
    bc = R.BoundaryConditions(inlet_flow_rate=0.0, acid_flow_rate=50.0,
                              acid_concentration=10.0)
    for _ in range(50):
        reactor.step(1.0, bc)
    pH = np.asarray(reactor.state.pH)
    assert np.all(pH >= 0.0) and np.all(pH <= 14.0)
    assert np.all(np.asarray(reactor.state.chlorine) >= 0.0)


def test_validation_suite():
    R.validate_integrated_reactor()


def test_rollout_records_trajectory():
    reactor = R.IntegratedCSTR(R.ReactorConfiguration(**CONFIG))
    bc = R.BoundaryConditions(inlet_flow_rate=5.0, acid_flow_rate=0.3)
    final, traj = reactor.rollout(1.0, bc, n_steps=25, record=True)
    assert traj["pH"].shape == (25, 5)
    assert traj["chlorine"].shape == (25, 5)
    # the recorded last row equals the final state
    np.testing.assert_allclose(np.asarray(traj["pH"])[-1],
                               np.asarray(final.pH), rtol=0, atol=0)
    # dosing transient is monotone in zone 0 over this window
    ph0 = np.asarray(traj["pH"])[:, 0]
    assert np.all(np.diff(ph0) < 0)


def test_exchange_conservation_random_configs():
    """Property: for random geometries/flows, the exchange matrix conserves
    mass to 1e-12 (reference transport.py:320-334 discipline)."""
    import math
    from ics_wt_physicsengine_tpu.core import transport as tr

    rng = np.random.default_rng(7)
    for _ in range(25):
        volume = float(rng.uniform(100.0, 5000.0))
        height = float(rng.uniform(0.5, 5.0))
        diameter = 2 * math.sqrt((volume / 1000) / (math.pi * height))
        n_zones = int(rng.integers(2, 30))
        flow = float(rng.uniform(0.0, 50.0))
        geom = tr.GeometryParameters(volume=volume, height=height,
                                     diameter=diameter, n_zones=n_zones)
        fp = tr.FlowParameters(flow_rate=flow,
                               impeller_speed=float(rng.uniform(10, 120)),
                               impeller_diameter=float(rng.uniform(0.1, 0.6)))
        model = tr.TransportModel(geom, fp)
        row_sums = model.K_matrix.sum(axis=1)
        assert np.all(np.abs(row_sums[:-1]) < 1e-12)
        assert abs(row_sums[-1] + model.q_per_v) < 1e-12


def test_rollout_scheduled_matches_stepping():
    """A time-varying BC schedule scanned in one jit must equal manual
    per-step calls with the same forcing sequence."""
    import numpy as np

    from ics_wt_physicsengine_tpu.core.reactor import (
        BoundaryConditions, ReactorConfiguration, make_initial_state,
        make_params, rollout_scheduled, stack_boundary_schedule, step)

    cfg = ReactorConfiguration(n_zones=8)
    params = make_params(cfg, dtype=jnp.float64)
    state0 = make_initial_state(cfg, dtype=jnp.float64)

    bcs = [BoundaryConditions(inlet_flow_rate=5.0 + i % 3,
                              acid_flow_rate=0.1 * (i % 2),
                              inlet_pH=7.2 + 0.1 * (i % 4),
                              inlet_temperature=18.0 + i)
           for i in range(12)]

    s_manual = state0
    fn = jax.jit(lambda p, s, b: step(p, s, b, dt=1.0, substeps=2))
    for bc in bcs:
        s_manual = fn(params, s_manual, bc)

    schedule = stack_boundary_schedule(bcs)
    final, traj = jax.jit(lambda p, s, sch: rollout_scheduled(
        p, s, sch, dt=1.0, substeps=2))(params, state0, schedule)
    np.testing.assert_array_equal(np.asarray(final.pH),
                                  np.asarray(s_manual.pH))
    assert traj["pH"].shape == (12, 8)
    np.testing.assert_array_equal(np.asarray(traj["pH"][-1]),
                                  np.asarray(final.pH))


def test_rollout_scheduled_rkc():
    import numpy as np

    from ics_wt_physicsengine_tpu.core.reactor import (
        BoundaryConditions, ReactorConfiguration, make_initial_state,
        make_params, rollout_scheduled, stack_boundary_schedule)

    cfg = ReactorConfiguration(n_zones=8)
    params = make_params(cfg, dtype=jnp.float64)
    state0 = make_initial_state(cfg, dtype=jnp.float64)
    schedule = stack_boundary_schedule(
        [BoundaryConditions(inlet_flow_rate=4.0 + i) for i in range(5)])
    final, traj = rollout_scheduled(params, state0, schedule, dt=1.0,
                                    substeps=1, stages=3, record=False)
    assert traj is None
    assert np.all(np.isfinite(np.asarray(final.pH)))


def test_rollout_jit_cached_and_scheduled_on_wrapper():
    """IntegratedCSTR.rollout reuses one jitted callable across calls with
    identical statics (no per-call retrace), and the wrapper surfaces
    rollout_scheduled / rollout_fused."""
    config = R.ReactorConfiguration(n_zones=3)
    reactor = R.IntegratedCSTR(config, dtype=jnp.float64)
    bc = R.BoundaryConditions(acid_flow_rate=0.1)

    reactor.rollout(1.0, bc, n_steps=4, record=False)
    fn1 = next(iter(reactor._rollout_cache.values()))
    reactor.rollout(1.0, bc, n_steps=4, record=False)
    assert len(reactor._rollout_cache) == 1
    assert next(iter(reactor._rollout_cache.values())) is fn1

    # scheduled rollout through the wrapper matches stepping the schedule
    sched = R.stack_boundary_schedule(
        [R.BoundaryConditions(acid_flow_rate=0.1 * i) for i in range(4)])
    r2 = R.IntegratedCSTR(config, dtype=jnp.float64)
    state, traj = r2.rollout_scheduled(1.0, sched)
    assert traj["pH"].shape[0] == 4

    r3 = R.IntegratedCSTR(config, dtype=jnp.float64)
    for i in range(4):
        r3.step(1.0, R.BoundaryConditions(acid_flow_rate=0.1 * i))
    np.testing.assert_allclose(np.asarray(state.pH),
                               np.asarray(r3.state.pH), rtol=1e-12)

    # fused rollout through the wrapper (interpret path on CPU)
    r4 = R.IntegratedCSTR(config, dtype=jnp.float32)
    out = r4.rollout_fused(1.0, bc, n_steps=4)
    assert np.all(np.isfinite(np.asarray(out.pH)))
