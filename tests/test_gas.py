"""Gas exchange (core/gas.py): dissolved O2 / CO2 <-> atmosphere — closes
the reference's "No gas exchange (O2, CO2 dissolution)" limitation
(reference README.md:521). Tests mirror tests/test_nitrogen.py's structure:
literature oracles via the validate suite, then end-to-end behavioral
physics through the integrated reactor."""

import numpy as np

import jax
import jax.numpy as jnp

from ics_wt_physicsengine_tpu.core import gas as G
from ics_wt_physicsengine_tpu.core import reactor as R
from ics_wt_physicsengine_tpu.core import chemistry as chem

F64 = jnp.float64


def _config(**kw):
    base = dict(n_zones=4, enable_gas=True, initial_chlorine=0.0,
                flow_rate=0.0, volume=1000.0, height=2.0, diameter=0.798)
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
    assert G.validate_gas(verbose=False)


def test_initial_oxygen_defaults_to_saturation():
    config = _config(temperature=20.0)
    s = R.make_initial_state(config, dtype=F64)
    sat = float(G.oxygen_saturation(np.float64(20.0)))
    np.testing.assert_allclose(np.asarray(s.oxygen), sat, rtol=1e-6)
    assert abs(sat - 9.09) < 0.05          # APHA table value


def test_disabled_axis_leaves_state_untouched():
    """enable_gas=False (the default) carries no gas leaves at all —
    reference parity is structural, not numerical."""
    config = R.ReactorConfiguration(n_zones=4)
    s = R.make_initial_state(config)
    assert s.oxygen is None and s.carbonate is None
    assert R.make_params(config).gas is None


def test_zero_transfer_is_bit_exact_with_disabled():
    """Closed batch with kl_surface=0 and no aeration: the gas axis adds
    inert tracers whose C_T stays exactly at the configured value, so the
    pH/Cl/T trajectory must be BIT-EXACT against the gas-disabled plant
    (the dynamic-carbonate rebuild sees the same C_T). Under flow the
    carbonate pool is advected and the dynamic-C_T buffering legitimately
    diverges in the last bits — that case is covered behaviorally below."""
    bc = R.BoundaryConditions(inlet_flow_rate=0.0, acid_flow_rate=1e-6,
                              chlorine_flow_rate=1e-6)
    on = _config(gas_params={"kl_surface": 0.0})
    off = R.ReactorConfiguration(
        **{**on.__dict__, "enable_gas": False, "gas_params": None})
    _, s_on = _run(on, bc, n_steps=600)
    _, s_off = _run(off, bc, n_steps=600)
    assert np.array_equal(np.asarray(s_on.pH), np.asarray(s_off.pH))
    assert np.array_equal(np.asarray(s_on.chlorine),
                          np.asarray(s_off.chlorine))
    assert np.array_equal(np.asarray(s_on.temperature),
                          np.asarray(s_off.temperature))


def test_closed_batch_conserves_gas_species_without_transfer():
    """Q=0, kl=0, no aeration: O2 and C_T are pure transported tracers —
    zone mixing conserves their totals to integrator accuracy."""
    config = _config(initial_oxygen=5.0, gas_params={"kl_surface": 0.0})
    bc = R.BoundaryConditions(inlet_flow_rate=0.0)
    _, s = _run(config, bc, n_steps=3600)
    np.testing.assert_allclose(np.asarray(s.oxygen), 5.0, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(s.carbonate),
                               config.total_carbonate, rtol=1e-9)


def test_relaxes_to_henry_equilibrium():
    """Hard aeration drives the plant to the atmospheric equilibrium: O2 at
    the Benson-Krause saturation, dissolved CO2 (the alpha0 fraction of the
    carbonate pool) at the Henry value, pH stationary — the equilibrium is
    REACHED by the dynamics, not constructed by the test."""
    T = 20.0
    config = _config(temperature=T, alkalinity=50.0, total_carbonate=3.0,
                     initial_pH=6.8, initial_oxygen=4.0)
    bc = R.BoundaryConditions(inlet_flow_rate=0.0, ambient_temperature=T,
                              aeration_kla=0.02)
    params = R.make_params(config, dtype=F64)
    s = R.make_initial_state(config, dtype=F64)
    m = R.default_substeps(config, 1.0)
    s1, _ = R.rollout(params, s, bc, dt=1.0, substeps=m, n_steps=5400,
                      record=False)
    s2, _ = R.rollout(params, s1, bc, dt=1.0, substeps=m, n_steps=1800,
                      record=False)
    sat = float(G.oxygen_saturation(np.float64(T)))
    np.testing.assert_allclose(np.asarray(s2.oxygen), sat, rtol=1e-3)
    # dissolved CO2 fraction sits at the Henry equilibrium
    k = params.chem
    a0, _, _ = chem.alpha_carbonate(s2.pH, k.Ka1, k.Ka2)
    co2_mol = np.asarray(a0 * s2.carbonate * 1e-3)
    co2_sat = float(G.co2_saturation_mol(np.float64(T), 420e-6))
    np.testing.assert_allclose(co2_mol, co2_sat, rtol=0.05)
    # pH is stationary at the equilibrium
    assert abs(float(s2.pH[0]) - float(s1.pH[0])) < 1e-3


def test_reaeration_recovers_oxygen_sag():
    """Undersaturated water re-aerates through the free surface: O2 climbs
    monotonically toward saturation, fastest in the TOP zone."""
    config = _config(temperature=20.0, initial_oxygen=2.0,
                     gas_params={"kl_surface": 5e-5})
    params = R.make_params(config, dtype=F64)
    s = R.make_initial_state(config, dtype=F64)
    bc = R.BoundaryConditions(inlet_flow_rate=0.0)
    m = R.default_substeps(config, 1.0)
    s1, _ = R.rollout(params, s, bc, dt=1.0, substeps=m, n_steps=600,
                      record=False)
    s2, _ = R.rollout(params, s1, bc, dt=1.0, substeps=m, n_steps=3000,
                      record=False)
    sat = float(G.oxygen_saturation(np.float64(20.0)))
    o1, o2 = np.asarray(s1.oxygen), np.asarray(s2.oxygen)
    assert np.all(o1 > 2.0) and np.all(o2 > o1) and np.all(o2 < sat + 1e-6)
    # surface (top = last zone) leads the recovery
    assert o1[-1] > o1[0]


def test_aeration_strips_co2_and_raises_pH():
    """The classic side effect: bubbling air through high-CO2 water strips
    dissolved CO2 and RAISES pH (toward the atmospheric equilibrium)."""
    config = _config(initial_pH=6.5, alkalinity=50.0, total_carbonate=3.0)
    bc_off = R.BoundaryConditions(inlet_flow_rate=0.0)
    bc_on = R.BoundaryConditions(inlet_flow_rate=0.0, aeration_kla=2e-3)
    _, s_off = _run(config, bc_off, n_steps=1800)
    _, s_on = _run(config, bc_on, n_steps=1800)
    assert float(s_on.pH[0]) > 6.6                      # pH rose
    assert float(s_on.pH[0]) > float(s_off.pH[0]) + 0.05
    assert float(s_on.carbonate[0]) < 3.0               # C_T stripped
    # and O2 is driven to saturation much faster than surface-only
    sat = float(G.oxygen_saturation(np.float64(config.temperature)))
    assert abs(float(s_on.oxygen[0]) - sat) < 0.2


def test_co2_dissolution_acidifies_soft_water():
    """Low-C_T (CO2-undersaturated) soft water absorbs atmospheric CO2
    through the surface and its pH falls — thermodynamically consistent
    with the dosing chemistry's buffering capacity."""
    config = _config(initial_pH=9.0, alkalinity=10.0, total_carbonate=0.05,
                     gas_params={"kl_surface": 2e-4})
    bc = R.BoundaryConditions(inlet_flow_rate=0.0)
    _, s = _run(config, bc, n_steps=7200)
    assert float(s.carbonate[-1]) > 0.05     # CO2 entered (top zone most)
    assert float(s.pH[-1]) < 9.0             # and acidified


def test_nitrification_consumes_oxygen():
    """Coupled nitrogen+gas: nitrifying 2 mg/L NH3-N demands ~4.57 g O2/g N;
    with the surface sealed the O2 budget must close stoichiometrically."""
    config = _config(enable_nitrogen=True, initial_ammonia=2.0,
                     initial_oxygen=9.0, gas_params={"kl_surface": 0.0},
                     nitrogen_kinetics={"k_nitrif": 50.0, "k_nitrat": 50.0})
    bc = R.BoundaryConditions(inlet_flow_rate=0.0)
    _, s = _run(config, bc, n_steps=7200)
    nh, no2, no3 = (np.asarray(x)[0] for x in (s.ammonia, s.nitrite,
                                               s.nitrate))
    o2 = np.asarray(s.oxygen)[0]
    assert nh < 2.0 and o2 < 9.0
    # O2 consumed = 3.43*(N nitrified past step 1) + 1.14*(N past step 2)
    demand = G.O2_PER_N_AOB * (2.0 - nh) + G.O2_PER_N_NOB * (no3 + 0.0 * no2)
    np.testing.assert_allclose(9.0 - o2, demand, rtol=0.05)


def test_anoxia_enables_denitrification():
    """Denitrification is O2-inhibited: with O2 held near zero nitrate is
    consumed; at saturation it is not — anoxic zones emerge from physics."""
    base = dict(enable_nitrogen=True, initial_ammonia=0.0,
                initial_nitrate=5.0, gas_params={"kl_surface": 0.0},
                nitrogen_kinetics={"k_denit": 20.0})
    bc = R.BoundaryConditions(inlet_flow_rate=0.0)
    _, s_anox = _run(_config(initial_oxygen=0.0, **base), bc, n_steps=3600)
    _, s_oxic = _run(_config(initial_oxygen=9.0, **base), bc, n_steps=3600)
    assert float(s_anox.nitrate[0]) < 4.5          # denitrified
    assert float(s_oxic.nitrate[0]) > 4.9          # inhibited (K_I/(K_I+9))


def test_oxygen_limits_nitrification():
    """Monod O2 limitation: zero-O2 water cannot nitrify."""
    base = dict(enable_nitrogen=True, initial_ammonia=2.0,
                gas_params={"kl_surface": 0.0},
                nitrogen_kinetics={"k_nitrif": 50.0})
    bc = R.BoundaryConditions(inlet_flow_rate=0.0)
    _, s0 = _run(_config(initial_oxygen=0.0, **base), bc, n_steps=3600)
    _, s9 = _run(_config(initial_oxygen=9.0, **base), bc, n_steps=3600)
    assert float(s0.ammonia[0]) > 1.99             # stalled
    assert float(s9.ammonia[0]) < 1.5              # proceeding


def test_batched_and_jitted():
    """The gas leaves ride the batch axis and jit like every other species."""
    config = _config(enable_nitrogen=True, initial_ammonia=1.0,
                     initial_pH=np.full(8, 7.0))   # array field -> [B, Z]
    params = R.make_params(config)
    state = R.make_initial_state(config)
    assert state.oxygen.shape == (8, 4)
    bc = R.BoundaryConditions(aeration_kla=1e-3)
    fn = jax.jit(lambda s: R.step(params, s, bc, 1.0, 4))
    out = fn(state)
    assert out.oxygen.shape == (8, 4)
    assert np.all(np.isfinite(np.asarray(out.oxygen)))
    assert np.all(np.isfinite(np.asarray(out.pH)))


def test_gradients_flow_through_gas_coupling():
    """d(final pH)/d(aeration_kla) > 0 — the aeration actuator is
    differentiable end-to-end for control/estimation use."""
    config = _config(initial_pH=6.5, alkalinity=50.0, total_carbonate=3.0)
    params = R.make_params(config, dtype=F64)
    state = R.make_initial_state(config, dtype=F64)

    def final_pH(kla):
        bc = R.BoundaryConditions(inlet_flow_rate=0.0, aeration_kla=kla)
        s, _ = R.rollout(params, state, bc, dt=1.0, substeps=4,
                         n_steps=200, record=False)
        return s.pH[0]

    g = float(jax.grad(final_pH)(jnp.float64(1e-3)))
    assert np.isfinite(g) and g > 0.0


def test_fused_kernels_reject_gas():
    import pytest
    from ics_wt_physicsengine_tpu.ops import fused_rollout as FR
    config = _config()
    params = R.make_params(config)
    state = R.make_initial_state(config)
    bc = R.BoundaryConditions()
    with pytest.raises(ValueError, match="nitrogen/gas"):
        FR.rollout_fused(params, state, bc, dt=1.0, substeps=4, n_steps=8)
