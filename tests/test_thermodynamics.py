"""Literature-value oracles for thermodynamics (reference strategy:
validate_thermodynamics, core/thermodynamics.py:386-450)."""

import numpy as np
import pytest

from ics_wt_physicsengine_tpu.core import constants as c
from ics_wt_physicsengine_tpu.core import thermodynamics as thermo


def test_chlorine_decay_at_reference_temperature():
    # EPA value: k(20 C) = 1e-4 1/s (reference README.md:291)
    assert abs(float(thermo.chlorine_decay_rate(20.0)) - 1e-4) < 1e-10


def test_q10_in_physical_range():
    q10 = float(thermo.chlorine_decay_rate(30.0)
                / thermo.chlorine_decay_rate(20.0))
    assert 1.5 < q10 < 2.5
    # SURVEY/BASELINE quote ~1.8 for Ea = 45 kJ/mol
    assert abs(q10 - 1.8) < 0.05


def test_kw_at_25C():
    # CRC: Kw(25 C) = 1e-14 (reference README.md:293)
    assert abs(float(thermo.water_ionization_constant(25.0)) - 1e-14) < 1e-20


def test_neutral_pH():
    assert abs(float(thermo.neutral_pH(25.0)) - 7.0) < 1e-4
    # Literature: neutral pH at 0 C ~= 7.47 (reference README.md:295); the
    # constant-enthalpy Van't Hoff model (same as the reference's code,
    # thermodynamics.py:195-226) yields 7.448.
    assert abs(float(thermo.neutral_pH(0.0)) - 7.47) < 0.03


def test_carbonate_pKa():
    # Stumm & Morgan: pKa1(25 C) = 6.35 (reference README.md:294)
    assert abs(float(thermo.carbonate_pKa1(25.0)) - 6.35) < 1e-9
    assert abs(float(thermo.carbonate_pKa2(25.0)) - 10.33) < 1e-9
    # dpKa/dT = -0.008 / C
    assert abs(float(thermo.carbonate_pKa1(35.0)) - (6.35 - 0.08)) < 1e-9


def test_monotone_decay_rate():
    temps = np.array([0.0, 10.0, 20.0, 30.0, 40.0])
    rates = np.asarray(thermo.chlorine_decay_rate(temps))
    assert np.all(np.diff(rates) > 0)


def test_diffusion_increases_with_temperature():
    assert float(thermo.diffusion_coefficient(30.0)) > \
        float(thermo.diffusion_coefficient(20.0))
    assert abs(float(thermo.diffusion_coefficient(20.0))
               - c.D_MOLECULAR_REF) < 1e-15


def test_temperature_gate_raises():
    kin = thermo.TemperatureDependentKinetics()
    with pytest.raises(ValueError):
        kin.celsius_to_kelvin(-10.0)
    with pytest.raises(ValueError):
        kin.celsius_to_kelvin(110.0)


def test_vectorized_matches_scalar():
    temps = np.linspace(0.0, 40.0, 9)
    vec = np.asarray(thermo.chlorine_decay_rate(temps))
    scalar = np.array([float(thermo.chlorine_decay_rate(t)) for t in temps])
    np.testing.assert_allclose(vec, scalar, rtol=0, atol=0)


def test_validation_suite():
    thermo.validate_thermodynamics()
