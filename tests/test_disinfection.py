"""Disinfection axis (core/disinfection.py): pathogen inactivation, CT
credit, water age, UV dose, THM/DBP formation — delivers the reference's
roadmap row "Disinfection byproduct (DBP) formation" (reference
README.md:449) plus the inactivation physics the chlorine residual exists
for.

Reactor-level oracles: batch Chick-Watson kill is internally consistent
with the simulated CT state (survivors = 10^(-3 CT / CT_3log) exactly at
the pH-7/20 C calibration point); a single-zone flow-through reactor
reproduces the steady-CSTR CT/age values; the UV operator split matches
the analytic survival; THM/TOC accounting is stoichiometric.
"""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ics_wt_physicsengine_tpu.core import disinfection as D
from ics_wt_physicsengine_tpu.core import reactor as R

F64 = jnp.float64


def _config(**kw):
    base = dict(n_zones=5, enable_disinfection=True, initial_pathogens=1e4,
                initial_chlorine=2.0, initial_toc=2.0, flow_rate=0.0,
                volume=1000.0, height=2.0, diameter=0.798)
    base.update(kw)
    return R.ReactorConfiguration(**base)


def _run(config, bc, n_steps, dt=60.0, substeps=None, dtype=F64):
    params = R.make_params(config, dtype=dtype)
    state = R.make_initial_state(config, dtype=dtype)
    if substeps is None:
        substeps = R.default_substeps(config, dt)
    state, _ = R.rollout(params, state, bc, dt=dt, substeps=substeps,
                         n_steps=n_steps, record=False)
    return params, state


def test_validation_suite():
    assert D.validate_disinfection(verbose=False)


def test_disabled_axis_leaves_state_untouched():
    config = R.ReactorConfiguration(n_zones=4)
    s = R.make_initial_state(config)
    for leaf in (s.pathogens, s.ct, s.age, s.toc, s.thm):
        assert leaf is None
    assert R.make_params(config).disinfection is None


def test_initial_state_shapes():
    s = R.make_initial_state(_config(), dtype=F64)
    assert s.pathogens.shape == (D.N_PATHOGENS, 5)
    assert s.ct.shape == s.age.shape == s.toc.shape == s.thm.shape == (5,)
    np.testing.assert_allclose(np.asarray(s.pathogens), 1e4)
    np.testing.assert_allclose(np.asarray(s.toc), 2.0)
    assert float(jnp.max(s.ct)) == 0.0 and float(jnp.max(s.age)) == 0.0


def test_batch_kill_consistent_with_ct_state():
    """Q=0 batch at pH 7 / 20 C: survivors = 10^(-3 CT / CT_3log) per
    class, with CT the simulated advected credit — the kill law and the
    credit accounting must agree exactly (both integrate the same Cl(t))."""
    bc = R.BoundaryConditions(inlet_flow_rate=0.0)
    _, s = _run(_config(initial_toc=0.0), bc, n_steps=10)
    ct = float(s.ct[0])
    assert 18.0 < ct < 20.0  # ~2 mg/L x 10 min, less wall decay
    for i, ct3 in enumerate(D.CT_3LOG_20C_PH7):
        logs = 3.0 * ct / ct3
        if logs < 25:  # virus saturates past the survivor floor
            np.testing.assert_allclose(
                float(D.log_inactivation(s.pathogens[i, 0], 1e4)), logs,
                rtol=1e-3)
    # ordering: virus >> giardia >> crypto susceptibility to chlorine
    assert float(s.pathogens[0, 0]) < float(s.pathogens[1, 0]) \
        < float(s.pathogens[2, 0])


def test_steady_cstr_ct_and_age():
    """Flow-through steady-state balance identities (exact regardless of
    the mixing profile). The flow semantics are the reference's (reference
    reactor.py:336,362): the inlet exchange q(c_in - x_0) at zone 0 and
    the outlet sink -q x_out both drain at q = Q/V, so the steady totals
    are  q (age_0 + age_out) = Z  and  q (ct_0 + ct_out) = sum(Cl)/60."""
    config = _config(n_zones=5, flow_rate=50.0, initial_pathogens=0.0)
    bc = R.BoundaryConditions(inlet_flow_rate=50.0, inlet_chlorine=2.0,
                              inlet_toc=2.0)
    q = 50.0 / 60.0 / 1000.0  # [1/s]
    _, s = _run(config, bc, n_steps=3000)  # >> any mixing/flow timescale
    np.testing.assert_allclose(
        q * (float(s.age[0]) + float(s.age[-1])), 5.0, rtol=1e-4)
    np.testing.assert_allclose(
        q * (float(s.ct[0]) + float(s.ct[-1])),
        float(jnp.sum(s.chlorine)) / 60.0, rtol=1e-4)
    # single-zone closed form under the same semantics: age = 1/(2q)
    _, s1 = _run(_config(n_zones=1, flow_rate=50.0, initial_pathogens=0.0),
                 bc, n_steps=600)
    np.testing.assert_allclose(float(s1.age[0]), 1.0 / (2.0 * q),
                               rtol=1e-4)


def test_uv_split_matches_analytic_survival():
    """Q=0, no chlorine, clear water: one step kills the outlet zone by
    exactly exp(-k_uv E_avg dt) per class (exact operator split)."""
    config = _config(initial_chlorine=0.0, initial_toc=0.0)
    params = R.make_params(config, dtype=F64)
    state = R.make_initial_state(config, dtype=F64)
    bc = R.BoundaryConditions(inlet_flow_rate=0.0, uv_intensity=0.2)
    dt = 1.0
    s1 = R.step(params, state, bc, dt=dt,
                substeps=R.default_substeps(config, dt))
    p = D.make_disinfection_params(dtype=F64)
    a254 = D.absorbance_254(jnp.float64(0.0), jnp.float64(0.0), p)
    e_avg = float(D.average_fluence(jnp.float64(0.2), a254, p))
    for i in range(D.N_PATHOGENS):
        expected = 1e4 * np.exp(-float(p.k_uv[i]) * e_avg * dt)
        np.testing.assert_allclose(float(s1.pathogens[i, -1]), expected,
                                   rtol=1e-6)
    # UV acts ONLY at the outlet zone: zone 0 sees mixing but no kill in
    # a single step from a uniform field (mixing of equals is a no-op)
    np.testing.assert_allclose(np.asarray(s1.pathogens[:, 0]), 1e4,
                               rtol=1e-9)


def test_turbidity_shades_the_uv_bank():
    """Particle coupling: the same UV bank kills less in turbid water
    (Beer-Lambert absorbance includes the TSS term)."""
    bc = R.BoundaryConditions(inlet_flow_rate=0.0, uv_intensity=2.0)
    kw = dict(initial_chlorine=0.0, initial_toc=0.0, enable_particles=True)
    _, clear = _run(_config(initial_tss=0.0, **kw), bc, n_steps=5, dt=1.0)
    _, turbid = _run(_config(initial_tss=200.0, **kw), bc, n_steps=5,
                     dt=1.0)
    assert float(turbid.pathogens[2, -1]) > 2.0 * float(
        clear.pathogens[2, -1])


def test_thm_toc_stoichiometry():
    """Q=0 at fixed pH 7 / 20 C: dTHM/dTOC = -y 10^(b(7-7.5)) / s_toc
    exactly (both are yields on the same exerted chlorine demand)."""
    config = _config(initial_pathogens=0.0, initial_toc=4.0)
    bc = R.BoundaryConditions(inlet_flow_rate=0.0)
    _, s = _run(config, bc, n_steps=60)
    p = D.make_disinfection_params(dtype=F64)
    d_toc = float(s.toc[0]) - 4.0
    d_thm = float(s.thm[0])
    assert d_toc < 0 and d_thm > 0
    expected = -float(p.y_thm) * 10.0 ** (float(p.b_ph_thm) * -0.5) \
        / float(p.s_toc)
    np.testing.assert_allclose(d_thm / d_toc, expected, rtol=1e-4)
    # the exerted demand also consumed chlorine beyond the wall decay
    _, s_clean = _run(_config(initial_pathogens=0.0, initial_toc=0.0),
                      bc, n_steps=60)
    assert float(s.chlorine[0]) < float(s_clean.chlorine[0])


def test_inlet_pathogen_classes_override():
    """Class-resolved inlet (network routing): only the seeded class
    enters."""
    config = _config(initial_pathogens=0.0, initial_chlorine=0.0,
                     flow_rate=5.0)
    seed = jnp.asarray([0.0, 1e4, 0.0], F64)
    bc = R.BoundaryConditions(inlet_flow_rate=5.0, inlet_chlorine=0.0,
                              inlet_pathogens=777.0,  # overridden
                              inlet_pathogen_classes=seed)
    _, s = _run(config, bc, n_steps=30)
    assert float(s.pathogens[1, 0]) > 1.0
    np.testing.assert_allclose(float(s.pathogens[0, 0]), 0.0, atol=1e-9)
    np.testing.assert_allclose(float(s.pathogens[2, 0]), 0.0, atol=1e-9)


def test_batched_monte_carlo_configuration():
    """Array-valued config fields produce [B, ...] leaves and the batch
    rolls out (parameter uncertainty is data, not code)."""
    config = _config(initial_pH=np.asarray([6.8, 7.0, 7.4]))
    params = R.make_params(config, dtype=F64)
    state = R.make_initial_state(config, dtype=F64)
    assert state.pathogens.shape == (3, D.N_PATHOGENS, 5)
    assert state.ct.shape == (3, 5)
    bc = R.BoundaryConditions(inlet_flow_rate=0.0)
    s, _ = R.rollout(params, state, bc, dt=60.0,
                     substeps=R.default_substeps(config, 60.0),
                     n_steps=5, record=False)
    # high pH shifts chlorine toward OCl- (less biocidal): weakest kill
    # in the pH-7.4 lane
    surv = np.asarray(s.pathogens[:, 1, 0])  # giardia
    assert surv[2] > surv[1] > surv[0]


def test_scheduled_rollout_uv_pulse():
    """rollout_scheduled drives the UV actuator: lamp on for the second
    half only."""
    config = _config(initial_chlorine=0.0, initial_toc=0.0)
    params = R.make_params(config, dtype=F64)
    state = R.make_initial_state(config, dtype=F64)
    n = 20
    uv = jnp.concatenate([jnp.zeros(10), jnp.full((10,), 5.0)])
    schedule = R.BoundaryConditions(inlet_flow_rate=jnp.zeros(n),
                                    uv_intensity=uv)
    s, traj = R.rollout_scheduled(
        params, state, schedule, dt=60.0,
        substeps=R.default_substeps(config, 60.0))
    assert float(s.pathogens[2, -1]) < 1.0  # crypto killed once lamp is on


def test_grad_through_disinfection_rollout():
    """The axis is differentiable: d(outlet crypto)/d(uv_intensity) < 0."""
    config = _config(initial_chlorine=0.0, initial_toc=0.0)
    params = R.make_params(config, dtype=F64)
    state = R.make_initial_state(config, dtype=F64)
    substeps = R.default_substeps(config, 60.0)

    def outlet_crypto(uv):
        bc = R.BoundaryConditions(inlet_flow_rate=0.0, uv_intensity=uv)
        s, _ = R.rollout(params, state, bc, dt=60.0, substeps=substeps,
                         n_steps=3, record=False)
        return s.pathogens[2, -1]

    g = jax.grad(outlet_crypto)(jnp.float64(0.05))
    assert np.isfinite(float(g)) and float(g) < 0.0


def test_conservation_of_age_in_batch():
    """Q=0: every zone ages at exactly 1 s/s regardless of mixing."""
    bc = R.BoundaryConditions(inlet_flow_rate=0.0)
    _, s = _run(_config(initial_pathogens=0.0), bc, n_steps=7)
    np.testing.assert_allclose(np.asarray(s.age), 7 * 60.0, rtol=1e-10)
