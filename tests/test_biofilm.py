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
