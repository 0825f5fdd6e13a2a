"""Biofilm / bacterial regrowth axis (core/biofilm.py): wall-attached
biomass, planktonic bacteria (HPC proxy) and BDOC substrate — closes the
reference's "No biological processes (bacteria, biofilms)" limitation
(reference core/README.md:98, README.md:304,521), whose nitrification half
shipped in round 3 (core/nitrogen.py).

Rate-law oracles here; reactor-level oracles (regrowth bloom without a
residual, suppression with one, closed-batch carbon conservation, wall
demand on the chlorine residual) follow the wiring into core/reactor.py.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ics_wt_physicsengine_tpu.core import biofilm as B

F64 = jnp.float64


def test_validation_suite():
    assert B.validate_biofilm(verbose=False)


def test_monod_monotone_and_bounded():
    p = B.make_biofilm_params(dtype=F64)
    s = jnp.linspace(0.0, 10.0, 101, dtype=F64)
    m = np.asarray(B.monod(s, p.K_s))
    assert np.all(np.diff(m) > 0.0)
    assert np.all((m >= 0.0) & (m < 1.0))
    # negative substrate is floored, not extrapolated
    assert float(B.monod(jnp.float64(-1.0), p.K_s)) == 0.0


def test_growth_rates_vectorize_over_zones():
    """Rate laws are pure [..., Z] maps — shapes broadcast like every other
    axis's (core/nitrogen.py pattern)."""
    p = B.make_biofilm_params(dtype=F64)
    s = jnp.full((3, 5), 0.3, F64)
    cl = jnp.full((3, 5), 0.2, F64)
    T = jnp.full((3, 5), 15.0, F64)
    b = jnp.full((3, 5), 50.0, F64)
    assert B.specific_growth_bulk(s, cl, T, p).shape == (3, 5)
    assert B.specific_growth_film(s, cl, T, b, p).shape == (3, 5)
    assert B.kill_rate_bulk(cl, p).shape == (3, 5)
    assert B.wall_demand_rate(cl, b, 0.01, p).shape == (3, 5)


def test_film_protection_orders_growth_and_kill():
    """At any residual the film grows faster and dies slower than the bulk
    (matrix protection) — the inequality that makes biofilm the hard
    problem."""
    p = B.make_biofilm_params(dtype=F64)
    s = jnp.float64(1.0)
    for cl in (0.05, 0.2, 1.0):
        cl = jnp.float64(cl)
        g_bulk = float(B.specific_growth_bulk(s, cl, 20.0, p))
        g_film = float(B.specific_growth_film(s, cl, 20.0,
                                              jnp.float64(0.0), p))
        assert g_film > g_bulk
        assert float(B.kill_rate_film(cl, p)) < float(B.kill_rate_bulk(cl, p))


def test_carbon_pool_closure_conservative_limit():
    """yield_c=1, f_lysis=1: one explicit-Euler step of the full coupled
    tendencies moves carbon between S, X and B*a_v without creating or
    destroying any."""
    p = B.make_biofilm_params(yield_c=1.0, f_lysis=1.0, dtype=F64)
    a_v = 0.01
    x, s, b = jnp.float64(0.05), jnp.float64(0.5), jnp.float64(20.0)
    cl, T, u = jnp.float64(0.3), jnp.float64(20.0), jnp.float64(0.0)

    mu_x = B.specific_growth_bulk(s, cl, T, p)
    mu_b = B.specific_growth_film(s, cl, T, b, p)
    kx = B.kill_rate_bulk(cl, p)
    kb = B.kill_rate_film(cl, p)
    det = B.detachment_rate(u, p)

    dx = mu_x * x - kx * x - p.k_att * x + det * b * a_v
    db = mu_b * b - kb * b + p.k_att * x / a_v - det * b
    ds = (-mu_x * x / p.yield_c - mu_b * b * a_v / p.yield_c
          + p.f_lysis * (kx * x + kb * b * a_v))
    dt = 1.0
    tot0 = float(B.total_biomass_carbon(x, s, b, a_v))
    tot1 = float(B.total_biomass_carbon(x + dx * dt, s + ds * dt,
                                        b + db * dt, a_v))
    np.testing.assert_allclose(tot1, tot0, rtol=1e-12)


def test_kill_ct_matches_construction():
    """Survivors after CT = ct_3log_hpc mg min/L are exactly 1e-3 (same
    table construction as the disinfection axis)."""
    p = B.make_biofilm_params(ct_3log_hpc=10.0, dtype=F64)
    lam = float(B.kill_rate_bulk(jnp.float64(1.0), p))   # 1/s at 1 mg/L
    surv = np.exp(-lam * 10.0 * 60.0)
    np.testing.assert_allclose(surv, 1e-3, rtol=1e-9)


def test_params_are_a_pytree():
    """Params batch like ReactorParams — parameter uncertainty is data."""
    p = B.make_biofilm_params(dtype=F64)
    leaves = jax.tree_util.tree_leaves(p)
    assert len(leaves) == 14
    doubled = jax.tree_util.tree_map(lambda v: v * 2.0, p)
    assert float(doubled.mu_max) == 2.0 * float(p.mu_max)


def test_grad_through_growth():
    """The rate laws are differentiable in the params (parameter
    estimation rides jax.grad like the rest of the framework)."""
    def loss(mu_max):
        p = B.make_biofilm_params(dtype=F64)
        p = jax.tree_util.tree_map(lambda v: v, p)
        p = B.BiofilmParams(**{**{f.name: getattr(p, f.name)
                                  for f in p.__dataclass_fields__.values()},
                               "mu_max": mu_max})
        return B.specific_growth_bulk(jnp.float64(0.5), 0.1, 20.0, p)
    g = jax.grad(loss)(jnp.float64(2.0))
    assert float(g) > 0.0


# ---------------------------------------------------------------------------
# Reactor-level oracles (axis wired through core/reactor.py)
# ---------------------------------------------------------------------------

from ics_wt_physicsengine_tpu.core import reactor as R  # noqa: E402


def _config(**kw):
    base = dict(n_zones=5, enable_biofilm=True, flow_rate=0.0,
                volume=1000.0, height=2.0, diameter=0.798,
                initial_chlorine=0.0, initial_bacteria=1e-3,
                initial_bdoc=0.5, initial_biofilm=0.0)
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


def _a_v(params):
    return float(params.heat_area_m2
                 / (params.n_zones * params.zone_volume_L))


def test_disabled_axis_leaves_state_untouched():
    config = R.ReactorConfiguration(n_zones=4)
    s = R.make_initial_state(config)
    for leaf in (s.bacteria, s.bdoc, s.biofilm):
        assert leaf is None
    assert R.make_params(config).biofilm is None


def test_initial_state_shapes():
    s = R.make_initial_state(_config(), dtype=F64)
    assert s.bacteria.shape == s.bdoc.shape == s.biofilm.shape == (5,)
    np.testing.assert_allclose(np.asarray(s.bacteria), 1e-3)
    np.testing.assert_allclose(np.asarray(s.bdoc), 0.5)
    assert float(jnp.max(s.biofilm)) == 0.0


def test_regrowth_bloom_without_residual():
    """Chlorine-free batch with substrate: planktonic biomass grows, BDOC
    is consumed, and a wall film colonizes from nothing — the regrowth
    event a dead-leg tank actually produces."""
    cfg = _config(biofilm_params=dict(mu_max=10.0))
    bc = R.BoundaryConditions(inlet_flow_rate=0.0)
    _, s = _run(cfg, bc, n_steps=600)   # 10 h
    assert float(s.bacteria[0]) > 5e-3          # >5x bloom
    assert float(s.bdoc[0]) < 0.5               # substrate consumed
    assert float(s.biofilm[0]) > 0.0            # wall colonized


def test_residual_suppresses_regrowth():
    """The same tank holding a 0.5 mg/L free-chlorine residual: the bulk
    is inactivated orders of magnitude below its start (CT kill), and the
    end state carries far less biomass than the unchlorinated bloom."""
    cfg = _config(biofilm_params=dict(mu_max=10.0), initial_chlorine=0.5)
    bc = R.BoundaryConditions(inlet_flow_rate=0.0)
    _, s = _run(cfg, bc, n_steps=60)    # 1 h is plenty at CT ~ 30
    assert float(s.bacteria[0]) < 1e-4  # >1 log below the 1e-3 start


def test_closed_batch_carbon_conservation():
    """yield_c=1, f_lysis=1, Q=0: the zone-mean organic-carbon pool
    X + S + B a_v is exactly conserved through a full rollout — growth,
    kill/lysis, attachment and detachment only move carbon between
    compartments (the audit core/biofilm.py promises)."""
    cfg = _config(biofilm_params=dict(yield_c=1.0, f_lysis=1.0,
                                      mu_max=20.0, k_att=1e-4),
                  initial_chlorine=0.3, initial_biofilm=10.0)
    params = R.make_params(cfg, dtype=F64)
    s0 = R.make_initial_state(cfg, dtype=F64)
    bc = R.BoundaryConditions(inlet_flow_rate=0.0)
    a_v = _a_v(params)
    import ics_wt_physicsengine_tpu.core.biofilm as B_
    pool0 = float(jnp.mean(B_.total_biomass_carbon(
        s0.bacteria, s0.bdoc, s0.biofilm, a_v)))
    _, s = _run(cfg, bc, n_steps=200)
    pool1 = float(jnp.mean(B_.total_biomass_carbon(
        s.bacteria, s.bdoc, s.biofilm, a_v)))
    np.testing.assert_allclose(pool1, pool0, rtol=1e-10)
    # and carbon actually moved (the test is not vacuous)
    assert abs(float(s.biofilm[0]) - 10.0) > 1e-3


def test_wall_demand_depletes_residual():
    """A biofouled tank (500 mg C/m2 film) loses its chlorine residual
    measurably faster than a clean one — the operational signature."""
    bc = R.BoundaryConditions(inlet_flow_rate=0.0)
    _, clean = _run(_config(initial_chlorine=1.0, initial_biofilm=0.0),
                    bc, n_steps=120)
    _, fouled = _run(_config(initial_chlorine=1.0, initial_biofilm=500.0),
                     bc, n_steps=120)
    assert float(fouled.chlorine[0]) < 0.97 * float(clean.chlorine[0])


def test_flow_through_washout_vs_film_persistence():
    """Flow-through tank with clean inlet water: planktonic bacteria wash
    out toward the inlet concentration, but the attached film persists
    (it is not advected) — why distribution systems can't flush biofilm
    away."""
    cfg = _config(flow_rate=20.0, initial_bacteria=1e-2,
                  initial_biofilm=100.0,
                  biofilm_params=dict(mu_max=0.0, k_att=0.0, k_det=0.0))
    bc = R.BoundaryConditions(inlet_flow_rate=20.0, inlet_bacteria=0.0,
                              inlet_bdoc=0.0)
    params, s = _run(cfg, bc, n_steps=300)  # 5 h ~ 6 residence times
    assert float(jnp.max(s.bacteria)) < 2e-3      # washed out
    np.testing.assert_allclose(np.asarray(s.biofilm), 100.0, rtol=1e-12)
    # with detachment back on, the film reseeds the bulk: the tank can
    # never be flushed below the det*B*a_v / (Q/V) balance
    cfg2 = _config(flow_rate=20.0, initial_bacteria=1e-2,
                   initial_biofilm=100.0,
                   biofilm_params=dict(mu_max=0.0))
    _, s2 = _run(cfg2, bc, n_steps=300)
    assert float(jnp.min(s2.bacteria)) > 2e-3     # film-sustained floor


def test_batched_monte_carlo_configuration():
    cfg = _config(initial_pH=np.asarray([7.0, 7.4, 7.8]))
    params = R.make_params(cfg, dtype=F64)
    s = R.make_initial_state(cfg, dtype=F64)
    assert s.bacteria.shape == (3, 5)
    bc = R.BoundaryConditions(inlet_flow_rate=0.0)
    s, _ = R.rollout(params, s, bc, dt=60.0,
                     substeps=R.default_substeps(cfg, 60.0),
                     n_steps=5, record=False)
    assert s.biofilm.shape == (3, 5)
    assert bool(jnp.all(jnp.isfinite(s.bacteria)))


def test_grad_through_biofilm_rollout():
    """End-state biomass is differentiable in mu_max (parameter estimation
    from HPC counts rides jax.grad)."""
    cfg = _config()
    state0 = R.make_initial_state(cfg, dtype=F64)
    params = R.make_params(cfg, dtype=F64)
    bc = R.BoundaryConditions(inlet_flow_rate=0.0)
    substeps = R.default_substeps(cfg, 60.0)

    def loss(mu_max):
        import dataclasses as dc
        p = dc.replace(params, biofilm=dc.replace(
            params.biofilm, mu_max=mu_max))
        s, _ = R.rollout(p, state0, bc, dt=60.0, substeps=substeps,
                         n_steps=20, record=False)
        return jnp.mean(s.bacteria)

    g = jax.grad(loss)(jnp.float64(2.0))
    assert float(g) > 0.0


def test_zone_sharded_biofilm_matches_single_device():
    """Biofilm axis through the halo-exchanged SPMD step: bulk biomass and
    substrate ride the advected-scalar layout; the attached film is purely
    zone-local (no halo term) — the sharded trajectory reproduces the
    single-device one to f64 tolerance."""
    from ics_wt_physicsengine_tpu.parallel import (
        make_zone_mesh, shard_state_zones, zone_sharded_step)
    cfg = _config(n_zones=16, flow_rate=5.0, initial_chlorine=0.5,
                  initial_biofilm=50.0,
                  biofilm_params=dict(mu_max=10.0, k_det_shear=1e-3))
    params = R.make_params(cfg, dtype=F64)
    state0 = R.make_initial_state(cfg, dtype=F64)
    bc = R.BoundaryConditions(inlet_flow_rate=5.0, inlet_bacteria=1e-3,
                              inlet_bdoc=1.0)

    ref = state0
    step1 = jax.jit(lambda p, s, b: R.step(p, s, b, dt=1.0, substeps=4))
    for _ in range(10):
        ref = step1(params, ref, bc)

    mesh = make_zone_mesh(8)
    st = shard_state_zones(state0, mesh)
    fn = zone_sharded_step(mesh, n_zones=16, dt=1.0, substeps=4,
                           biofilm=True)
    for _ in range(10):
        st = fn(params, st, bc)

    for f in ("pH", "chlorine", "temperature", "bacteria", "bdoc",
              "biofilm"):
        np.testing.assert_allclose(
            np.asarray(getattr(st, f)), np.asarray(getattr(ref, f)),
            rtol=1e-13, atol=1e-13, err_msg=f)
