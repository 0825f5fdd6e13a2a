"""Physical sample-line model tests — closes the reference's "Sample
line heat transfer simplified (exponential model)" limitation
(reference README.md:531): Nusselt correlations, derived NTU, in-line
sample decay, and drop-in compatibility with the SampleLine contract."""

import math

import numpy as np
import pytest

from ics_wt_physicsengine_tpu.sensors.sampleline import (
    CP_WATER,
    PR_WATER,
    RHO_WATER,
    LineThermalConfig,
    PhysicalSampleLine,
    line_ntu,
    nusselt,
    outlet_temperature,
    outlet_value,
    overall_U,
    reynolds,
    validate_sample_line,
)
from ics_wt_physicsengine_tpu.sensors.types import SampleLine


def test_validation_suite():
    assert validate_sample_line()


def test_reynolds_number():
    # 0.5 m/s in a 4.8 mm bore: Re = rho v d / mu ~ 2390
    re = reynolds(0.5, 4.8e-3)
    assert re == pytest.approx(RHO_WATER * 0.5 * 4.8e-3 / 1.002e-3)


def test_nusselt_regimes():
    assert nusselt(100.0) == 3.66                    # deep laminar
    assert nusselt(2300.0) == 3.66                   # laminar edge
    nu_db = 0.023 * 5e4 ** 0.8 * PR_WATER ** 0.3     # turbulent
    assert nusselt(5e4) == pytest.approx(nu_db)
    # transition blend is monotonic between the endpoints
    lo, hi = nusselt(2300.0), nusselt(4000.0)
    mid = nusselt(3150.0)
    assert lo < mid < hi


def test_overall_U_series_resistances():
    cfg = LineThermalConfig()
    u = overall_U(cfg, 0.5)
    # dominated by the external natural-convection film: U must be
    # below h_ext referenced to the outer diameter
    d_i, d_o = cfg.inner_diameter_m, cfg.inner_diameter_m + 2 * cfg.wall_thickness_m
    assert 0 < u < cfg.external_h_w_m2k * d_o / d_i
    # a conductive wall beats an insulating wall
    copper = LineThermalConfig(wall_conductivity_w_mk=400.0)
    assert overall_U(copper, 0.5) > u


def test_ntu_limits_and_outlet_temperature():
    cfg = LineThermalConfig()
    assert line_ntu(cfg, 5.0, 0.0) == float("inf")    # stagnant
    ntu = line_ntu(cfg, 5.0, 500.0 / 1000.0 / 60.0)
    assert 0 < ntu < 10
    assert outlet_temperature(30.0, 20.0, ntu) == pytest.approx(
        20.0 + 10.0 * math.exp(-ntu))
    # doubling the length doubles the NTU (same flow)
    assert line_ntu(cfg, 10.0, 0.00833) == pytest.approx(
        2 * line_ntu(cfg, 5.0, 0.00833))


def test_insulation_suppresses_heat_loss():
    bare = PhysicalSampleLine(flow_rate_mL_min=500.0, length_m=10.0,
                              ambient_temp=5.0)
    insulated = PhysicalSampleLine(
        flow_rate_mL_min=500.0, length_m=10.0, ambient_temp=5.0,
        thermal=LineThermalConfig(insulation_thickness_m=0.02))
    # steady state: pump the same 30 degC sample through both
    for t in np.arange(0.0, 300.0, 1.0):
        _, temp_bare = bare.transport_sample(1.0, 30.0, float(t))
        _, temp_ins = insulated.transport_sample(1.0, 30.0, float(t))
    assert temp_ins > temp_bare            # insulation keeps it warmer
    assert 5.0 < temp_bare < 30.0          # partial approach, not magic


def test_in_line_chlorine_decay():
    """A decaying species loses concentration during line residence; a
    conservative one doesn't — the reference transports both unchanged."""
    k = 5e-3                               # 1/s in-line demand
    line = PhysicalSampleLine(flow_rate_mL_min=250.0, length_m=5.0,
                              line_decay_rate_per_s=k)
    conservative = PhysicalSampleLine(flow_rate_mL_min=250.0, length_m=5.0)
    assert line.transport_delay_s > 10     # meaningful residence
    for t in np.arange(0.0, 200.0, 1.0):
        v_decay, _ = line.transport_sample(2.0, 20.0, float(t))
        v_cons, _ = conservative.transport_sample(2.0, 20.0, float(t))
    assert v_cons == pytest.approx(2.0)
    expected = 2.0 * math.exp(-k * line.transport_delay_s)
    assert v_decay == pytest.approx(expected, rel=0.1)
    assert v_decay < 2.0 * 0.95            # visibly less than injected


def test_outlet_value_units():
    assert outlet_value(1.0, 0.01, 100.0) == pytest.approx(math.exp(-1.0))


def test_drop_in_for_sampleline_contract():
    """Same transport_sample contract; same delay semantics as the
    parity SampleLine; only the thermal/decay provenance differs."""
    phys = PhysicalSampleLine(flow_rate_mL_min=500.0, length_m=5.0)
    base = SampleLine(volume_mL=phys.volume_mL, flow_rate_mL_min=500.0)
    assert phys.transport_delay_s == pytest.approx(base.transport_delay_s)
    # values transported identically when no decay is configured
    for t in np.arange(0.0, 120.0, 1.0):
        v_p, _ = phys.transport_sample(float(np.sin(t / 9.0)), 25.0,
                                       float(t))
        v_b, _ = base.transport_sample(float(np.sin(t / 9.0)), 25.0,
                                       float(t))
        assert v_p == pytest.approx(v_b)
    # derived thermal rate for the canonical bare 1/4" line is ~0.003/s
    # — the reference's assumed 0.1/s overstates line heat loss >30x
    assert 0.001 < phys.thermal_rate_per_s < 0.02


def test_sensor_wrapper_accepts_physical_line():
    """PhysicalSampleLine slots into the wrapper/suite plumbing exactly
    where types.SampleLine does."""
    from ics_wt_physicsengine_tpu.sensors import pHSensor

    line = PhysicalSampleLine(flow_rate_mL_min=500.0, length_m=5.0)
    s = pHSensor("pH_line", zone_index=0, sample_line=line, seed=5)
    s.calibrate(7.0, 0.0)

    class State:
        pH = np.full(5, 7.0)
        temperature = np.full(5, 20.0)

    vals = [s.read(State(), float(t)).value
            for t in np.arange(2000.0, 2100.0, 1.0)]
    finite = np.array([v for v in vals if np.isfinite(v)])
    assert len(finite) > 50
    assert abs(finite.mean() - 7.0) < 0.5
