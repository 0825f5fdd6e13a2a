"""Particle dynamics (core/particles.py): settling, coagulation,
filtration, sludge — closes the reference's "No particle dynamics
(settling, filtration)" limitation (reference README.md:522)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ics_wt_physicsengine_tpu.core import particles as P
from ics_wt_physicsengine_tpu.core import reactor as R

F64 = jnp.float64


def _config(**kw):
    base = dict(n_zones=5, enable_particles=True, initial_tss=20.0,
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
    assert P.validate_particles(verbose=False)


def test_disabled_axis_leaves_state_untouched():
    config = R.ReactorConfiguration(n_zones=4)
    s = R.make_initial_state(config)
    assert s.tss is None and s.sludge is None
    assert R.make_params(config).particles is None


def test_initial_state_shapes_and_split():
    config = _config()
    s = R.make_initial_state(config, dtype=F64)
    assert s.tss.shape == (P.N_CLASSES, 5)
    assert s.sludge.shape == (P.N_CLASSES,)
    np.testing.assert_allclose(np.asarray(s.tss).sum(axis=0), 20.0,
                               rtol=1e-12)


def test_closed_batch_conserves_total_mass():
    """Q=0: settling moves mass from the column to the sludge inventory;
    the sum (both in zone-volume mg/L) is exactly conserved."""
    config = _config()
    bc = R.BoundaryConditions(inlet_flow_rate=0.0)
    _, s = _run(config, bc, n_steps=3600)
    total = float(jnp.sum(s.tss)) + float(jnp.sum(s.sludge))
    np.testing.assert_allclose(total, 20.0 * 5, rtol=1e-9)
    assert float(jnp.sum(s.sludge)) > 1.0          # settling happened


def test_coarse_settles_fastest():
    """Stokes d^2 scaling: the 50 um class reaches the sludge first,
    the 2 um clay barely moves in an hour."""
    config = _config()
    bc = R.BoundaryConditions(inlet_flow_rate=0.0)
    # short horizon: by an hour the coarse class is EXHAUSTED into the
    # sludge and the ratio saturates — 10 minutes shows the kinetics
    _, s = _run(config, bc, n_steps=600)
    sl = np.asarray(s.sludge)
    assert sl[2] > 5.0 * sl[1] > 0.0
    assert sl[0] < 0.1 * sl[2]


def test_quiescent_column_develops_vertical_gradient():
    """With mixing suppressed (quiescent, stratification-stable), settling
    builds a bottom-heavy profile for the coarse class — the clarifier
    emerges from the physics."""
    config = _config(particle_params={"k_resuspension": 0.0},
                     impeller_speed=1.0)   # near-quiescent (0 rpm is a
    #                                        division-by-zero in the
    #                                        reference's Corrsin formula)
    bc = R.BoundaryConditions(inlet_flow_rate=0.0)
    _, s = _run(config, bc, n_steps=1800)
    coarse = np.asarray(s.tss)[2]
    assert coarse[0] >= coarse[-1]       # bottom >= top
    assert coarse[-1] < 3.0              # top clears (initial 3.0)


def test_coagulation_clears_turbidity():
    """Dosing coagulant shifts mass into fast-settling classes: outlet
    turbidity falls vs the undosed plant (the jar-test control axis)."""
    config = _config()
    bc0 = R.BoundaryConditions(inlet_flow_rate=0.0)
    bc1 = R.BoundaryConditions(inlet_flow_rate=0.0, coagulant_dose=30.0)
    p, s0 = _run(config, bc0, n_steps=600)
    _, s1 = _run(config, bc1, n_steps=600)
    ntu0 = float(P.turbidity_ntu(s0.tss, p.particles)[-1])
    ntu1 = float(P.turbidity_ntu(s1.tss, p.particles)[-1])
    assert ntu1 < 0.7 * ntu0
    # coagulation itself conserves mass (settling is the only sink)
    t0 = float(jnp.sum(s1.tss)) + float(jnp.sum(s1.sludge))
    np.testing.assert_allclose(t0, 100.0, rtol=1e-9)


def test_filtration_strips_solids():
    """A recirculating filter flow removes solids at the outlet zone:
    steady-state effluent TSS drops vs the unfiltered plant."""
    config = _config(flow_rate=5.0)
    bc0 = R.BoundaryConditions(inlet_flow_rate=5.0, inlet_tss=20.0)
    bc1 = R.BoundaryConditions(inlet_flow_rate=5.0, inlet_tss=20.0,
                               filter_flow_rate=20.0)
    _, s0 = _run(config, bc0, n_steps=600)
    _, s1 = _run(config, bc1, n_steps=600)
    out0 = float(P.total_solids_mgl(s0.tss)[-1])
    out1 = float(P.total_solids_mgl(s1.tss)[-1])
    assert out1 < 0.95 * out0
    # fines pass the media preferentially: the filtered effluent is
    # relatively finer
    f0 = np.asarray(s0.tss)[:, -1] / out0
    f1 = np.asarray(s1.tss)[:, -1] / out1
    assert f1[0] > f0[0] and f1[2] < f0[2]


def test_sludge_blowdown_wastes_inventory():
    config = _config()
    bc0 = R.BoundaryConditions(inlet_flow_rate=0.0)
    _, s0 = _run(config, bc0, n_steps=3600)
    bc1 = R.BoundaryConditions(inlet_flow_rate=0.0, sludge_blowdown=1e-3)
    _, s1 = _run(config, bc1, n_steps=3600)
    assert float(jnp.sum(s1.sludge)) < 0.3 * float(jnp.sum(s0.sludge))


def test_resuspension_returns_mass_to_bottom_zone():
    """With a fast resuspension rate the sludge inventory equilibrates far
    below the no-resuspension level, and mass still audits exactly."""
    bc = R.BoundaryConditions(inlet_flow_rate=0.0)
    _, s_fast = _run(_config(particle_params={"k_resuspension": 1e-2}),
                     bc, n_steps=3600)
    _, s_none = _run(_config(particle_params={"k_resuspension": 0.0}),
                     bc, n_steps=3600)
    assert float(jnp.sum(s_fast.sludge)) < 0.3 * float(jnp.sum(s_none.sludge))
    total = float(jnp.sum(s_fast.tss)) + float(jnp.sum(s_fast.sludge))
    np.testing.assert_allclose(total, 100.0, rtol=1e-9)


def test_core_trajectory_bit_exact_with_disabled():
    """The particle axis must not perturb pH/Cl/T at all (particles are
    passive scalars here — no feedback to the core physics)."""
    bc = R.BoundaryConditions(inlet_flow_rate=0.0, acid_flow_rate=1e-6,
                              chlorine_flow_rate=1e-6)
    on = _config()
    off = R.ReactorConfiguration(
        **{**on.__dict__, "enable_particles": False,
           "particle_params": None})
    _, s_on = _run(on, bc, n_steps=600)
    _, s_off = _run(off, bc, n_steps=600)
    for f in ("pH", "chlorine", "temperature"):
        assert np.array_equal(np.asarray(getattr(s_on, f)),
                              np.asarray(getattr(s_off, f))), f


def test_all_three_extensions_coexist():
    """nitrogen + gas + particles in one plant: species tuple layout
    (3 core | 4 N | 2 gas | tss+sludge) integrates and stays finite."""
    config = _config(enable_nitrogen=True, enable_gas=True,
                     initial_ammonia=1.0)
    params = R.make_params(config, dtype=F64)
    s = R.make_initial_state(config, dtype=F64)
    bc = R.BoundaryConditions(inlet_flow_rate=5.0, aeration_kla=1e-3,
                              coagulant_dose=10.0, inlet_tss=15.0)
    step = jax.jit(lambda st: R.step(params, st, bc, 1.0, 4))
    for _ in range(50):
        s = step(s)
    for leaf in (s.pH, s.ammonia, s.oxygen, s.tss, s.sludge):
        assert bool(jnp.all(jnp.isfinite(leaf)))
    assert float(jnp.sum(s.sludge)) >= 0.0


def test_batched_and_jitted():
    config = _config(initial_pH=np.full(8, 7.0))
    params = R.make_params(config)
    state = R.make_initial_state(config)
    assert state.tss.shape == (8, P.N_CLASSES, 5)
    assert state.sludge.shape == (8, P.N_CLASSES)
    bc = R.BoundaryConditions(coagulant_dose=20.0)
    out = jax.jit(lambda s: R.step(params, s, bc, 1.0, 4))(state)
    assert out.tss.shape == (8, P.N_CLASSES, 5)
    assert bool(jnp.all(jnp.isfinite(out.tss)))


def test_gradient_flows_through_coagulant_dose():
    """d(outlet turbidity)/d(coagulant dose) < 0 — the dosing actuator is
    differentiable end-to-end for control/estimation."""
    config = _config()
    params = R.make_params(config, dtype=F64)
    state = R.make_initial_state(config, dtype=F64)

    def outlet_ntu(dose):
        bc = R.BoundaryConditions(inlet_flow_rate=0.0, coagulant_dose=dose)
        s, _ = R.rollout(params, state, bc, dt=1.0, substeps=4,
                         n_steps=200, record=False)
        return P.turbidity_ntu(s.tss, params.particles)[-1]

    g = float(jax.grad(outlet_ntu)(jnp.float64(20.0)))
    assert np.isfinite(g) and g < 0.0


def test_fused_kernels_reject_particles():
    from ics_wt_physicsengine_tpu.ops import fused_rollout as FR
    config = _config()
    params = R.make_params(config)
    state = R.make_initial_state(config)
    bc = R.BoundaryConditions()
    with pytest.raises(ValueError, match="particle"):
        FR.rollout_fused(params, state, bc, dt=1.0, substeps=4, n_steps=8)


def test_sharded_deriv_path_rejects_particles():
    config = _config()
    params = R.make_params(config)
    state = R.make_initial_state(config)
    bc = R.BoundaryConditions()
    with pytest.raises(ValueError, match="particle-capable"):
        R.step(params, state, bc, 1.0, 4,
               deriv_fn=lambda y: y, deriv_fn_nitrogen=True,
               deriv_fn_gas=True)
