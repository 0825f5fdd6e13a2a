"""Chemistry oracles + device/host solver agreement (reference strategy:
validate_chemistry, core/chemistry.py:526-565)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ics_wt_physicsengine_tpu.core import chemistry as chem


@pytest.fixture(scope="module")
def chem_obj():
    return chem.AqueousChemistry(
        chem.BufferSystem(alkalinity=100, total_carbonate=2.0, temperature=20))


def test_alphas_sum_to_one(chem_obj):
    for pH in (4.0, 6.35, 7.0, 8.0, 10.33, 12.0):
        a0, a1, a2 = chem_obj.alpha_carbonate(pH)
        assert abs(float(a0 + a1 + a2) - 1.0) < 1e-12


def test_newton_converges(chem_obj):
    pH = chem_obj.calculate_pH()
    assert 6.0 < pH < 9.0
    # Residual at the solution is ~0
    assert abs(float(chem_obj.charge_balance_error(pH))) < 1e-9


def test_acid_base_addition(chem_obj):
    pH0 = chem_obj.calculate_pH()
    assert chem_obj.add_acid(1000, 0.001, pH0) < pH0
    assert chem_obj.add_base(1000, 0.001, pH0) > pH0


def test_buffering_capacity_peaks_near_pKa(chem_obj):
    assert float(chem_obj.buffering_capacity(6.35)) > \
        float(chem_obj.buffering_capacity(8.0))


def test_chlorine_speciation_balances(chem_obj):
    spec = chem_obj.chlorine_speciation(2.0, 7.0)
    assert abs(float(spec["HOCl"] + spec["OCl"]) - 2.0) < 1e-12
    # At pH << pKa, almost all HOCl
    assert float(chem_obj.chlorine_speciation(2.0, 5.0)["HOCl_fraction"]) > 0.99


def test_decay_factor_monotone_in_pH(chem_obj):
    f6 = float(chem_obj.pH_dependent_chlorine_decay_factor(6.0))
    f9 = float(chem_obj.pH_dependent_chlorine_decay_factor(9.0))
    assert f6 > f9
    assert 0.02 <= f9 <= 1.0


def test_device_solver_matches_host(chem_obj):
    """The jittable masked-update Newton must agree with the host early-exit
    loop to the solver tolerance."""
    k_host = chem_obj.constants
    k_dev = jax.tree_util.tree_map(lambda x: jnp.asarray(x, jnp.float64),
                                   k_host)
    pH_host = chem.solve_pH_host(k_host)
    pH_dev = float(jax.jit(chem.solve_pH)(k_dev))
    # Both are Newton roots to |delta| < 1e-6; pow ULP differences between
    # backends shift the final iterate by up to the solver tolerance.
    assert abs(pH_host - pH_dev) < 2e-6


def test_batched_solve():
    """Constants batched over plants solve elementwise in one call.

    Alkalinity stays within the carbonate system's capacity (~<= 65*C_T for
    C_T in mmol/L) — beyond it the water is chemically inconsistent and the
    charge balance has no physical root (see models/monte_carlo.py).
    """
    alks = np.linspace(20.0, 130.0, 16)
    ks = chem.make_chemistry_constants(
        jnp.asarray(alks), jnp.full(16, 2.0), jnp.full(16, 20.0))
    pH = np.asarray(jax.jit(chem.solve_pH)(ks, jnp.full(16, 7.0)))
    # pH rises with alkalinity (up to solver tolerance), within range
    assert np.all(np.diff(pH) > -2e-6)
    assert pH[-1] > pH[0] + 0.5
    assert np.all((pH > 5.0) & (pH < 11.0))
    # each matches the host solve for the same constants
    for i in (0, 7, 15):
        k_host = chem.make_chemistry_constants(alks[i], 2.0, 20.0)
        assert abs(pH[i] - chem.solve_pH_host(k_host)) < 2e-6


def test_validation_suite():
    chem.validate_chemistry()
