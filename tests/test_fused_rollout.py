"""Fused Pallas rollout kernel vs the XLA scan rollout — same trajectories.

On the CPU test backend the kernel runs in interpreter mode; physics
equivalence transfers to the compiled Mosaic kernel on TPU (same program).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ics_wt_physicsengine_tpu.core import reactor as R
from ics_wt_physicsengine_tpu.ops.fused_rollout import rollout_fused


def _xla_final(params, state, bc, dt, substeps, n_steps):
    final, _ = jax.jit(lambda p, s, b: R.rollout(
        p, s, b, dt=dt, substeps=substeps, n_steps=n_steps,
        record=False))(params, state, bc)
    return final


BC = R.BoundaryConditions(
    inlet_flow_rate=5.0, inlet_pH=7.2, inlet_chlorine=0.5,
    inlet_temperature=26.0, acid_flow_rate=0.1, acid_concentration=0.1,
    chlorine_flow_rate=0.2, chlorine_concentration=50.0,
    ambient_temperature=15.0, heat_loss_coefficient=50.0)


@pytest.mark.parametrize("n_zones", [2, 5, 20])
def test_fused_matches_xla_single(n_zones):
    config = R.ReactorConfiguration(n_zones=n_zones)
    params = R.make_params(config, dtype=jnp.float64)
    state = R.make_initial_state(config, dtype=jnp.float64)
    substeps = R.default_substeps(config, 1.0)

    xla = _xla_final(params, state, BC, 1.0, substeps, 50)
    fused = rollout_fused(params, state, BC, dt=1.0, substeps=substeps,
                          n_steps=50, interpret=True)

    np.testing.assert_allclose(np.asarray(fused.pH), np.asarray(xla.pH),
                               rtol=0, atol=1e-10)
    np.testing.assert_allclose(np.asarray(fused.chlorine),
                               np.asarray(xla.chlorine), rtol=0, atol=1e-10)
    np.testing.assert_allclose(np.asarray(fused.temperature),
                               np.asarray(xla.temperature),
                               rtol=0, atol=1e-10)
    assert float(fused.time) == pytest.approx(50.0)


def test_fused_matches_xla_batched():
    from ics_wt_physicsengine_tpu.models.monte_carlo import (
        make_monte_carlo_batch)

    base = R.ReactorConfiguration(n_zones=5)
    params, state = make_monte_carlo_batch(base, 11, seed=7,
                                           dtype=jnp.float64)
    xla = _xla_final(params, state, BC, 1.0, 4, 30)
    fused = rollout_fused(params, state, BC, dt=1.0, substeps=4, n_steps=30,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(fused.pH), np.asarray(xla.pH),
                               rtol=0, atol=1e-10)
    np.testing.assert_allclose(np.asarray(fused.chlorine),
                               np.asarray(xla.chlorine), rtol=0, atol=1e-10)


def test_fused_rejects_too_many_zones():
    config = R.ReactorConfiguration(n_zones=5)
    params = R.make_params(config, dtype=jnp.float64)
    params = R.ReactorParams(**{**params.__dict__, "n_zones": 200})
    state = R.make_initial_state(config, dtype=jnp.float64)
    with pytest.raises(ValueError):
        rollout_fused(params, state, BC, dt=1.0, substeps=1, n_steps=1,
                      interpret=True)


@pytest.mark.parametrize("mode", ["strict", "fast"])
def test_fused_rkc_matches_xla_rkc(mode):
    """The in-kernel RKC2 stage recurrence must reproduce the XLA
    integrate_rkc path (same scheme, same coefficients)."""
    config = R.ReactorConfiguration(n_zones=20)
    params = R.make_params(config, dtype=jnp.float64)
    state = R.make_initial_state(config, dtype=jnp.float64)
    m, s = R.default_rkc_plan(config, 1.0, mode=mode)

    xla, _ = jax.jit(lambda p, st, b: R.rollout(
        p, st, b, dt=1.0, substeps=m, stages=s, n_steps=50,
        record=False))(params, state, BC)
    fused = rollout_fused(params, state, BC, dt=1.0, substeps=m, stages=s,
                          n_steps=50, interpret=True)
    np.testing.assert_allclose(np.asarray(fused.pH), np.asarray(xla.pH),
                               rtol=0, atol=1e-10)
    np.testing.assert_allclose(np.asarray(fused.chlorine),
                               np.asarray(xla.chlorine), rtol=0, atol=1e-10)
    np.testing.assert_allclose(np.asarray(fused.temperature),
                               np.asarray(xla.temperature), rtol=0,
                               atol=1e-10)


def test_fused_recorded_trajectory_matches_xla():
    """record_every=k: in-kernel trajectory equals the XLA scan's recorded
    trajectory subsampled at every k-th step, and the last record equals the
    final state."""
    config = R.ReactorConfiguration(n_zones=20)
    params = R.make_params(config, dtype=jnp.float64)
    state = R.make_initial_state(config, dtype=jnp.float64)

    final, traj = rollout_fused(params, state, BC, dt=1.0, substeps=2,
                                n_steps=40, record_every=4, interpret=True)
    assert traj["pH"].shape == (10, 20)
    ref_final, ref_traj = jax.jit(lambda p, s, b: R.rollout(
        p, s, b, dt=1.0, substeps=2, n_steps=40, record=True))(
            params, state, BC)
    for key in ("pH", "chlorine", "temperature"):
        np.testing.assert_allclose(
            np.asarray(traj[key]), np.asarray(ref_traj[key])[3::4],
            rtol=0, atol=1e-10)
    np.testing.assert_array_equal(np.asarray(traj["pH"][-1]),
                                  np.asarray(final.pH))


def test_fused_recorded_trajectory_batched():
    from ics_wt_physicsengine_tpu.models.monte_carlo import (
        make_monte_carlo_batch)

    base = R.ReactorConfiguration(n_zones=5)
    params, state = make_monte_carlo_batch(base, 7, seed=3,
                                           dtype=jnp.float64)
    final, traj = rollout_fused(params, state, BC, dt=1.0, substeps=4,
                                n_steps=20, record_every=5, interpret=True)
    assert traj["chlorine"].shape == (4, 7, 5)
    _, ref_traj = jax.jit(lambda p, s, b: R.rollout(
        p, s, b, dt=1.0, substeps=4, n_steps=20, record=True))(
            params, state, BC)
    np.testing.assert_allclose(
        np.asarray(traj["chlorine"]),
        np.asarray(ref_traj["chlorine"])[4::5], rtol=0, atol=1e-10)


def test_fused_record_every_must_divide():
    config = R.ReactorConfiguration(n_zones=5)
    params = R.make_params(config, dtype=jnp.float64)
    state = R.make_initial_state(config, dtype=jnp.float64)
    with pytest.raises(ValueError, match="multiple of"):
        rollout_fused(params, state, BC, dt=1.0, substeps=1, n_steps=10,
                      record_every=3, interpret=True)


# ---------------------------------------------------------------------------
# Scheduled (time-varying forcing) fused kernel
# ---------------------------------------------------------------------------

def _square_wave_schedule(n_steps):
    """Per-step square-wave dosing + drifting inlet conditions."""
    t = np.arange(n_steps)
    return R.BoundaryConditions(
        inlet_flow_rate=5.0 + 2.0 * np.sin(2 * np.pi * t / 17.0),
        inlet_pH=7.2,
        inlet_chlorine=np.where(t % 10 < 5, 0.5, 1.5).astype(float),
        inlet_temperature=26.0 - 0.05 * t,
        acid_flow_rate=np.where(t % 8 < 4, 0.0, 0.3).astype(float),
        acid_concentration=0.1,
        chlorine_flow_rate=0.2,
        chlorine_concentration=50.0,
        ambient_temperature=15.0,
        heat_loss_coefficient=50.0)


@pytest.mark.parametrize("n_zones,stages", [(5, None), (20, None), (20, 6)])
def test_scheduled_fused_matches_xla(n_zones, stages):
    from ics_wt_physicsengine_tpu.ops.fused_rollout import (
        rollout_scheduled_fused)

    config = R.ReactorConfiguration(n_zones=n_zones)
    params = R.make_params(config, dtype=jnp.float64)
    state = R.make_initial_state(config, dtype=jnp.float64)
    substeps = R.default_substeps(config, 1.0)
    n_steps = 60
    sched = _square_wave_schedule(n_steps)

    xla_final, xla_traj = jax.jit(lambda p, s, b: R.rollout_scheduled(
        p, s, b, dt=1.0, substeps=substeps, stages=stages))(
            params, state, sched)
    fused, traj = rollout_scheduled_fused(
        params, state, sched, dt=1.0, substeps=substeps, stages=stages,
        record_every=1, interpret=True)

    np.testing.assert_allclose(np.asarray(fused.pH), np.asarray(xla_final.pH),
                               rtol=0, atol=1e-10)
    np.testing.assert_allclose(np.asarray(fused.chlorine),
                               np.asarray(xla_final.chlorine),
                               rtol=0, atol=1e-10)
    np.testing.assert_allclose(np.asarray(fused.temperature),
                               np.asarray(xla_final.temperature),
                               rtol=0, atol=1e-10)
    np.testing.assert_allclose(np.asarray(traj["pH"]),
                               np.asarray(xla_traj["pH"]),
                               rtol=0, atol=1e-10)
    assert float(fused.time) == pytest.approx(n_steps * 1.0)
    assert float(fused.flow_rate) == pytest.approx(
        float(np.asarray(sched.inlet_flow_rate)[-1])
        + float(np.asarray(sched.acid_flow_rate)[-1]) + 0.2)


def test_scheduled_fused_constant_schedule_matches_constant_kernel():
    """A schedule whose rows are all identical must reproduce the
    constant-BC kernel bit-for-bit (same arithmetic path)."""
    from ics_wt_physicsengine_tpu.ops.fused_rollout import (
        rollout_scheduled_fused)

    config = R.ReactorConfiguration(n_zones=20)
    params = R.make_params(config, dtype=jnp.float32)
    state = R.make_initial_state(config, dtype=jnp.float32)
    substeps = R.default_substeps(config, 1.0)
    n_steps = 30

    sched = jax.tree_util.tree_map(
        lambda x: np.full(n_steps, x, np.float64), BC)
    const = rollout_fused(params, state, BC, dt=1.0, substeps=substeps,
                          n_steps=n_steps, interpret=True)
    scheduled = rollout_scheduled_fused(params, state, sched, dt=1.0,
                                        substeps=substeps, interpret=True)
    assert np.array_equal(np.asarray(const.pH), np.asarray(scheduled.pH))
    assert np.array_equal(np.asarray(const.chlorine),
                          np.asarray(scheduled.chlorine))
    assert np.array_equal(np.asarray(const.temperature),
                          np.asarray(scheduled.temperature))


def test_scheduled_fused_batched():
    """A Monte-Carlo batch under a shared schedule matches the XLA scan."""
    from ics_wt_physicsengine_tpu.models.monte_carlo import (
        make_monte_carlo_batch)
    from ics_wt_physicsengine_tpu.ops.fused_rollout import (
        rollout_scheduled_fused)

    base = R.ReactorConfiguration(n_zones=5)
    params, state = make_monte_carlo_batch(base, 13, seed=4,
                                           dtype=jnp.float64)
    n_steps = 25
    sched = _square_wave_schedule(n_steps)

    xla_final, _ = jax.jit(lambda p, s, b: R.rollout_scheduled(
        p, s, b, dt=1.0, substeps=4))(params, state, sched)
    fused = rollout_scheduled_fused(params, state, sched, dt=1.0,
                                    substeps=4, interpret=True)
    np.testing.assert_allclose(np.asarray(fused.pH),
                               np.asarray(xla_final.pH), rtol=0, atol=1e-10)
    np.testing.assert_allclose(np.asarray(fused.chlorine),
                               np.asarray(xla_final.chlorine),
                               rtol=0, atol=1e-10)


def test_scheduled_fused_spans_chunks():
    """n_steps > one SMEM chunk (512): state carries across time chunks."""
    from ics_wt_physicsengine_tpu.ops.fused_rollout import (
        rollout_scheduled_fused)

    config = R.ReactorConfiguration(n_zones=2)
    params = R.make_params(config, dtype=jnp.float64)
    state = R.make_initial_state(config, dtype=jnp.float64)
    n_steps = 700            # crosses the 512-step chunk boundary
    sched = _square_wave_schedule(n_steps)

    xla_final, _ = jax.jit(lambda p, s, b: R.rollout_scheduled(
        p, s, b, dt=1.0, substeps=2))(params, state, sched)
    fused = rollout_scheduled_fused(params, state, sched, dt=1.0,
                                    substeps=2, interpret=True)
    np.testing.assert_allclose(np.asarray(fused.pH),
                               np.asarray(xla_final.pH), rtol=0, atol=1e-10)
