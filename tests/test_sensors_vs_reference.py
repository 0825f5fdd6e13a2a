"""Statistical cross-validation of our sensors against the reference's.

Both implementations read the same frozen reactor state many times past
warm-up; their reading distributions (bias and scatter) must agree. RNG
streams differ by construction, so the comparison is statistical — matching
the reference's own validation style (envelopes, not bit-equality).

Skipped when the reference mount is absent.
"""

import numpy as np
import pytest

ref_sensors = pytest.importorskip("wt_simulator.sensors")

from ics_wt_physicsengine_tpu import sensors as our_sensors  # noqa: E402


class MockState:
    def __init__(self):
        self.pH = np.array([7.2, 7.1, 7.0, 6.9, 6.8])
        self.chlorine = np.array([2.0, 1.9, 1.8, 1.7, 1.6])
        self.temperature = np.full(5, 22.0)
        self.flow_rate = 5.0


N_READS = 150


def _series(sensor, t0, state=None, dt=1.0):
    state = state or MockState()
    vals = np.array([sensor.read(state, t0 + (i + 1) * dt).value
                     for i in range(N_READS)])
    return vals[np.isfinite(vals)]


def test_ph_distribution_matches():
    ref = ref_sensors.pHSensor(name="ref", zone_index=0)
    ref.calibrate(7.2, ref.power_on_time)
    # reference warm-up runs from power-on; read after it
    ref_vals = _series(ref, ref.power_on_time + 1800.0)

    ours = our_sensors.pHSensor(name="ours", zone_index=0, seed=11)
    ours.calibrate(7.2, 0.0)
    our_vals = _series(ours, 1800.0)

    assert abs(np.mean(our_vals) - np.mean(ref_vals)) < 0.08, \
        f"pH bias differs: ours {np.mean(our_vals):.3f} " \
        f"vs ref {np.mean(ref_vals):.3f}"
    # scatter same order of magnitude
    assert 0.2 < np.std(our_vals) / max(np.std(ref_vals), 1e-9) < 5.0


def test_chlorine_distribution_matches():
    ref = ref_sensors.ChlorineSensor(
        name="ref", zone_index=0,
        sensor_type=ref_sensors.ChlorineSensorType.AMPEROMETRIC)
    ref.calibrate(2.0, ref.power_on_time)
    ref_vals = _series(ref, ref.power_on_time + 300.0)

    ours = our_sensors.ChlorineSensor(
        name="ours", zone_index=0,
        sensor_type=our_sensors.ChlorineSensorType.AMPEROMETRIC, seed=12)
    ours.calibrate(2.0, 0.0)
    our_vals = _series(ours, 300.0)

    assert abs(np.mean(our_vals) - np.mean(ref_vals)) < 0.15, \
        f"Cl bias differs: ours {np.mean(our_vals):.3f} " \
        f"vs ref {np.mean(ref_vals):.3f}"


def test_temperature_distribution_matches():
    ref = ref_sensors.TemperatureSensor(
        name="ref", zone_index=0,
        sensor_type=ref_sensors.TemperatureSensorType.RTD_PT100)
    ref.calibrate(22.0, ref.power_on_time)
    ref_vals = _series(ref, ref.power_on_time + 30.0)

    ours = our_sensors.TemperatureSensor(
        name="ours", zone_index=0,
        sensor_type=our_sensors.TemperatureSensorType.RTD_PT100, seed=13)
    ours.calibrate(22.0, 0.0)
    our_vals = _series(ours, 30.0)

    # both models share the RTD lead-resistance bias + lag accumulation
    assert abs(np.mean(our_vals) - np.mean(ref_vals)) < 0.5, \
        f"T bias differs: ours {np.mean(our_vals):.3f} " \
        f"vs ref {np.mean(ref_vals):.3f}"


def test_flow_distribution_matches():
    ref = ref_sensors.FlowSensor(
        name="ref", sensor_type=ref_sensors.FlowSensorType.MAGNETIC,
        full_scale=10.0)
    ref.calibrate(5.0, ref.power_on_time)
    ref_vals = _series(ref, ref.power_on_time + 10.0)

    ours = our_sensors.FlowSensor(
        name="ours", sensor_type=our_sensors.FlowSensorType.MAGNETIC,
        full_scale=10.0, seed=14)
    ours.calibrate(5.0, 0.0)
    our_vals = _series(ours, 10.0)

    assert abs(np.mean(our_vals) - np.mean(ref_vals)) < 0.5, \
        f"flow bias differs: ours {np.mean(our_vals):.3f} " \
        f"vs ref {np.mean(ref_vals):.3f}"


def test_sample_line_delay_matches_reference():
    """Step-change propagation through a 30 s sample line: both
    implementations deliver the old value until the delay elapses."""
    line_ref = ref_sensors.SampleLine(volume_mL=250, flow_rate_mL_min=500,
                                      ambient_temp=25.0)
    line_ours = our_sensors.SampleLine(volume_mL=250, flow_rate_mL_min=500,
                                       ambient_temp=25.0)
    assert line_ours.transport_delay_s == pytest.approx(
        line_ref.transport_delay_s)

    ref = ref_sensors.TemperatureSensor(name="ref", zone_index=0,
                                        sample_line=line_ref)
    ref.calibrate(22.0, ref.power_on_time)
    ours = our_sensors.TemperatureSensor(name="ours", zone_index=0,
                                         sample_line=line_ours, seed=15)
    ours.calibrate(22.0, 0.0)

    state = MockState()
    t0_ref = ref.power_on_time + 31.0
    for i in range(40):
        ref.read(state, t0_ref + i)
        ours.read(state, 31.0 + i)
    state.temperature = np.full(5, 30.0)    # step at t=+40
    # the REFERENCE sensor's crypto-seeded RNG draws open/short faults at
    # 1e-4/read (base_sensor.py:402-407): a faulted read returns NaN, so
    # retry a couple of times rather than flaking ~0.4% of runs
    for k in range(3):
        r_ref = ref.read(state, t0_ref + 40 + 0.1 * k)
        if np.isfinite(r_ref.raw_value):
            break
    r_ours = ours.read(state, 71.0)
    # both still deliver the pre-step sample through the line
    assert r_ref.raw_value == pytest.approx(22.0, abs=0.01)
    assert r_ours.raw_value == pytest.approx(22.0, abs=0.01)


def test_transport_sample_matches_reference():
    """Host-side (value, temp) SampleLine transport matches the reference's
    delayed + temperature-relaxed semantics sample-for-sample
    (reference base_sensor.py:177-216)."""
    from wt_simulator.sensors.base_sensor import SampleLine as RefLine
    from ics_wt_physicsengine_tpu.sensors.types import SampleLine

    ref = RefLine(volume_mL=250, flow_rate_mL_min=500, ambient_temp=25.0)
    ours = SampleLine(volume_mL=250, flow_rate_mL_min=500, ambient_temp=25.0)
    assert ours.transport_delay_s == ref.transport_delay_s

    rng = np.random.default_rng(7)
    t = 0.0
    for _ in range(120):
        t += float(rng.uniform(0.5, 3.0))
        value = float(rng.uniform(6.0, 9.0))
        temp = float(rng.uniform(15.0, 30.0))
        rv, rt = ref.transport_sample(value, temp, t)
        ov, ot = ours.transport_sample(value, temp, t)
        assert rv == ov
        assert abs(rt - ot) < 1e-12
