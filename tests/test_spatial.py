"""Spatial/stratification oracles (reference strategy: validate_spatial,
core/spatial.py:548-600)."""

import numpy as np
import pytest

from ics_wt_physicsengine_tpu.core import spatial as sp


@pytest.fixture()
def model():
    return sp.SpatialModel(n_zones=5, height=2.0)


def test_density_anomaly(model):
    # CRC: maximum density at 4 C (reference spatial.py:561-575)
    assert abs(model.calculate_water_density(4.0) - 999.97) < 0.5
    assert model.calculate_water_density(3.0) < model.calculate_water_density(4.0)
    assert model.calculate_water_density(5.0) < model.calculate_water_density(4.0)
    assert model.calculate_water_density(5.0) > model.calculate_water_density(20.0)


def test_density_salinity(model):
    assert model.calculate_water_density(20.0, 1.0) == pytest.approx(
        model.calculate_water_density(20.0) + 0.7)


def test_richardson_sign(model):
    model.update_density_profile(np.array([25, 23, 21, 19, 17]))
    assert model.calculate_richardson_number(0, 0.01) > 0
    model.update_density_profile(np.array([17, 19, 21, 23, 25]))
    assert model.calculate_richardson_number(0, 0.01) < 0


def test_no_flow_gives_infinite_ri(model):
    model.update_density_profile(np.array([25, 23, 21, 19, 17]))
    assert model.calculate_richardson_number(0, 0.0) == np.inf


def test_mixing_suppression(model):
    model.update_density_profile(np.array([25.0, 24.0, 23.0, 22.0, 21.0]))
    supp = model.calculate_mixing_suppression(0.001)  # slow flow -> stratified
    assert np.all(supp == 0.5)
    supp_fast = model.calculate_mixing_suppression(10.0)  # fast -> mixed
    assert np.all(supp_fast == 1.0)


def test_suppression_disabled():
    model = sp.SpatialModel(
        5, 2.0, sp.StratificationParameters(
            enable_thermal_stratification=False))
    model.update_density_profile(np.array([25.0, 24.0, 23.0, 22.0, 21.0]))
    assert np.all(model.calculate_mixing_suppression(0.001) == 1.0)


def test_brunt_vaisala(model):
    # Sign convention matches the reference (spatial.py:322-350): N^2 =
    # -(g/rho) drho/dz with z = zone index upward; the profile [25..17]
    # (warm at zone 0) has density increasing with index -> N^2 < 0.
    model.update_density_profile(np.array([25, 23, 21, 19, 17]))
    assert model.calculate_brunt_vaisala_frequency(0) < 0
    model.update_density_profile(np.array([17, 19, 21, 23, 25]))
    assert model.calculate_brunt_vaisala_frequency(0) > 0


def test_thermocline(model):
    model.update_density_profile(np.array([20.0, 20.1, 24.0, 24.1, 24.2]))
    depth = model.identify_thermocline()
    assert depth is not None
    assert 0 < depth < 2.0
    model.update_density_profile(np.full(5, 20.0))
    assert model.identify_thermocline() is None


def test_jet_penetration(model):
    z = model.calculate_inlet_jet_penetration(1.0, 0.05)
    assert 0 < z <= 2.0


def test_interpolation_matches_scipy(model):
    from scipy.interpolate import interp1d

    param = np.array([7.0, 7.1, 7.2, 7.1, 7.0])
    f = interp1d(model.zone_centers, param, kind="linear",
                 fill_value="extrapolate")
    for depth in (0.0, 0.3, 1.0, 1.7, 2.0):
        ours = model.interpolate_to_depth(param, depth)
        ref = float(f(model.height - depth))
        assert ours == pytest.approx(ref, abs=1e-12)


def test_gradient_stats(model):
    stats = model.calculate_spatial_gradients(
        np.array([7.0, 7.1, 7.2, 7.1, 7.0]), "pH")
    assert stats["mean_value"] == pytest.approx(7.08)
    assert stats["max_gradient"] == pytest.approx(0.1 / 0.4)


def test_validation_suite():
    sp.validate_spatial()
